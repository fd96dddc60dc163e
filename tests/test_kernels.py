"""M0 kernel tests (SURVEY.md §5.2 rows 1–2): the vectorized banded DP must
agree exactly with the naive recursive oracles — the reference's own
test-oracle pattern (transducer-vs-brute-force + distance-function
properties)."""

from __future__ import annotations

import random

import numpy as np
import pytest

from liblevenshtein_spark.kernels.banded import banded_distance, batch_banded_distance
from liblevenshtein_spark.kernels import oracles

ALGOS = list(oracles.ALGORITHMS)


def _rand_strings(seed: int, count: int, alphabet: str, max_len: int) -> list[str]:
    rng = random.Random(seed)
    out = [""]
    for _ in range(count):
        out.append("".join(rng.choice(alphabet) for _ in range(rng.randint(1, max_len))))
    return out


@pytest.mark.parametrize("algorithm", ALGOS)
@pytest.mark.parametrize("n", [0, 1, 2, 3])
def test_banded_matches_oracle_random(algorithm, n):
    rng = random.Random(100 + n)
    strs = _rand_strings(5, 200, "abc", 9)  # small alphabet -> dense near-pairs
    pairs = [(rng.choice(strs), rng.choice(strs)) for _ in range(3000)]
    got = batch_banded_distance([p[0] for p in pairs], [p[1] for p in pairs], n, algorithm)
    for (a, b), g in zip(pairs, got):
        true = oracles.distance(a, b, algorithm)
        assert g == (true if true <= n else n + 1), (a, b, algorithm, n)


EDGE_PAIRS = [
    ("", ""), ("", "abc"), ("abc", ""), ("a", "a"), ("a", "b"),
    ("ab", "ba"), ("ca", "abc"), ("cl", "d"), ("d", "cl"),
    ("abcd", "abdc"), ("aaaa", "aaa"), ("xy", "z"), ("z", "xy"),
    ("abcdef", "abc"), ("abc", "abcdef"),  # band-boundary lengths
    ("ab", "abcd"), ("abcd", "ab"),
    ("日本語", "日本誤"), ("naïve", "naive"),  # unicode codepoint semantics
]


@pytest.mark.parametrize("algorithm", ALGOS)
@pytest.mark.parametrize("n", [0, 1, 2, 3, 4])
def test_banded_matches_oracle_edges(algorithm, n):
    a = [p[0] for p in EDGE_PAIRS]
    b = [p[1] for p in EDGE_PAIRS]
    got = batch_banded_distance(a, b, n, algorithm)
    for (x, y), g in zip(EDGE_PAIRS, got):
        true = oracles.distance(x, y, algorithm)
        assert g == (true if true <= n else n + 1), (x, y, algorithm, n)


def test_restricted_transposition_trap():
    """FIXTURES.md F7: 'ca'/'abc' — restricted Damerau = 3 (unrestricted
    would be 2). Schulz–Mihov transposition is restricted."""
    assert oracles.distance("ca", "abc", "transposition") == 3
    assert banded_distance("ca", "abc", 3, "transposition") == 3
    assert banded_distance("ab", "ba", 2, "transposition") == 1
    # merge-and-split: two chars <-> one char at unit cost
    assert banded_distance("cl", "d", 2, "merge_and_split") == 1
    assert banded_distance("d", "cl", 2, "merge_and_split") == 1


@pytest.mark.parametrize("algorithm", ALGOS)
def test_identity_symmetry_nonnegativity(algorithm):
    strs = _rand_strings(17, 60, "abcd", 8)
    rng = random.Random(3)
    for _ in range(400):
        a, b = rng.choice(strs), rng.choice(strs)
        dab = oracles.distance(a, b, algorithm)
        assert dab >= 0
        assert (dab == 0) == (a == b)
        assert dab == oracles.distance(b, a, algorithm)


def test_triangle_inequality_standard():
    """Standard Levenshtein is a metric. (The restricted-transposition
    variant famously violates the triangle inequality — e.g. ca/ac/abc — so
    the axiom is asserted for standard only, matching the reference's
    distance duality note, README.md:18-21.)"""
    strs = _rand_strings(23, 40, "abc", 7)
    rng = random.Random(4)
    for _ in range(300):
        a, b, c = rng.choice(strs), rng.choice(strs), rng.choice(strs)
        assert oracles.distance(a, c) <= oracles.distance(a, b) + oracles.distance(b, c)


def test_sentinel_and_band():
    out = batch_banded_distance(["abcdef"], ["uvwxyz"], 2, "standard")
    assert out[0] == 3  # sentinel n+1
    # length-band pre-filter: |len diff| > n short-circuits to sentinel
    out = batch_banded_distance(["abcdefgh"], ["ab"], 2, "standard")
    assert out[0] == 3


def test_batch_shapes():
    assert batch_banded_distance([], [], 2).shape == (0,)
    got = batch_banded_distance(["kitten"], ["sitting"], 3)
    assert got.dtype == np.int32 and got[0] == 3


def test_long_strings_banded():
    base = "the quick brown fox jumps over the lazy dog " * 30
    mutated = base[:100] + "X" + base[101:]  # one substitution
    assert banded_distance(base, mutated, 2) == 1
    ins = base[:500] + "zz" + base[500:]
    assert banded_distance(base, ins, 2) == 2
    assert banded_distance(base, ins[:-1] + "qqq", 2) == 3  # > n -> sentinel


def test_chunk_boundary_parity():
    """Edits placed around the lazy-transposition chunk boundary (row 128)
    must score identically to the naive oracle for every variant."""
    import random
    from liblevenshtein_spark.kernels.banded import _CHUNK, batch_banded_distance
    from liblevenshtein_spark.kernels.oracles import distance as naive_distance

    rng = random.Random(7)
    base = "".join(rng.choice("abcd") for _ in range(_CHUNK * 2 + 17))
    cases = []
    for pos in (_CHUNK - 2, _CHUNK - 1, _CHUNK, _CHUNK + 1, _CHUNK + 2):
        cases.append((base, base[:pos] + base[pos + 1:]))              # deletion
        cases.append((base, base[:pos] + "z" + base[pos:]))            # insertion
        cases.append((base, base[:pos] + "z" + base[pos + 1:]))        # substitution
        cases.append((base, base[:pos] + base[pos + 1] + base[pos] + base[pos + 2:]))  # transposition
    for algo in ("standard", "transposition", "merge_and_split"):
        got = batch_banded_distance([c[0] for c in cases], [c[1] for c in cases], 2, algo)
        for (a, b), d in zip(cases, got):
            want = min(naive_distance(a, b, algo), 3)
            assert d == want, (algo, a[:8], want, d)


def test_arrow_entry_matches_list_entry():
    import pyarrow as pa
    from liblevenshtein_spark.kernels.banded import (
        batch_banded_distance, batch_banded_distance_arrow)

    a = ["kitten", "", "abc", "x" * 300, "hello world", "café"]
    b = ["sitten", "a", "abcd", "x" * 299 + "y", "hello_world", "cafe"]
    for algo in ("standard", "transposition", "merge_and_split"):
        want = batch_banded_distance(a, b, 2, algo).tolist()
        got = batch_banded_distance_arrow(pa.array(a), pa.array(b), 2, algo).tolist()
        assert got == want
    # large_string + sliced array paths
    la_ = pa.array(a, type=pa.large_string())
    lb_ = pa.array(b, type=pa.large_string())
    assert batch_banded_distance_arrow(la_, lb_, 1, "standard").tolist() == \
        batch_banded_distance(a, b, 1, "standard").tolist()
    sl_a, sl_b = pa.array(a).slice(2, 3), pa.array(b).slice(2, 3)
    assert batch_banded_distance_arrow(sl_a, sl_b, 2, "standard").tolist() == \
        batch_banded_distance(a[2:5], b[2:5], 2, "standard").tolist()


def test_arrow_entry_null_fallback():
    """Nulls take the list fallback with None -> '' (the pandas-UDF
    fillna('') semantics) instead of crashing (round-2 ADVICE fix)."""
    import pyarrow as pa
    from liblevenshtein_spark.kernels.banded import (
        batch_banded_distance, batch_banded_distance_arrow)

    a = pa.array(["kitten", None, "abc", None])
    b = pa.array(["sitten", "ab", None, None])
    got = batch_banded_distance_arrow(a, b, 2, "standard").tolist()
    want = batch_banded_distance(["kitten", "", "abc", ""],
                                 ["sitten", "ab", "", ""], 2, "standard").tolist()
    assert got == want


def test_config_rejects_kernel_overflow_distance():
    """max_distance beyond the uint8 kernel cap fails at config time, not
    deep inside an executor task (round-2 ADVICE fix)."""
    import pytest as _pytest
    from liblevenshtein_spark.config import LinkConfig

    with _pytest.raises(ValueError, match="200"):
        LinkConfig(max_distance=201)
    LinkConfig(max_distance=200)  # boundary accepted
