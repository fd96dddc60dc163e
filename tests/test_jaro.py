"""Jaro-Winkler kernel vs the DuckDB jaro_winkler_similarity oracle.

DuckDB vendors the rapidfuzz-lineage implementation, which pins the exact
conventions the kernel must reproduce: empty string -> 0.0, window
max(la,lb)//2 - 1 clamped at 0, transpositions = mismatched matched
positions FLOOR-halved, Winkler boost only when jaro > 0.7 with prefix <= 4.
"""

from __future__ import annotations

import random

import duckdb
import numpy as np
import pytest

from liblevenshtein_spark.kernels.jaro import batch_jaro_winkler

HAND_CASES = [
    ("MARTHA", "MARHTA", 0.9611111111111111),  # classic worked example
    ("CRATE", "TRACE", 0.7333333333333334),    # jaro > 0.7 but prefix 0
    ("abc", "abc", 1.0),
    ("", "abc", 0.0),
    ("", "", 0.0),                              # DuckDB convention, not 1.0
    ("ab", "ba", 0.0),                          # window 0: no cross match
    ("a", "a", 1.0),
]


def test_hand_cases():
    got = batch_jaro_winkler([a for a, _, _ in HAND_CASES],
                             [b for _, b, _ in HAND_CASES])
    for (a, b, want), g in zip(HAND_CASES, got):
        assert abs(g - want) < 1e-9, (a, b, want, g)


def test_floor_halved_transpositions():
    # fcbc/cbfcfff: m=4, 3 mismatched matched positions -> t = 3//2 = 1
    # (a naive t = 1.5 reads 0.7321; DuckDB reads 0.7738)
    (got,) = batch_jaro_winkler(["fcbc"], ["cbfcfff"])
    assert abs(got - 0.7738095238095237) < 1e-9


def test_boost_threshold():
    # common prefix but jaro <= 0.7: the Winkler boost must NOT apply
    (got,) = batch_jaro_winkler(["abxxxxxxxx"], ["abyyyyyyyy"])
    assert abs(got - 0.4666666666666667) < 1e-9


@pytest.mark.parametrize("seed", [7, 99])
def test_fuzz_vs_duckdb(seed):
    rng = random.Random(seed)
    pairs = []
    alpha = "abcdef"
    for _ in range(800):
        pairs.append((
            "".join(rng.choice(alpha) for _ in range(rng.randint(0, 12))),
            "".join(rng.choice(alpha) for _ in range(rng.randint(0, 12))),
        ))
    alpha2 = "abcdefghijklmnop"
    for _ in range(400):
        base = "".join(rng.choice(alpha2) for _ in range(rng.randint(3, 20)))
        mut = list(base)
        for _ in range(rng.randint(0, 4)):
            p = rng.randrange(max(len(mut), 1))
            op = rng.choice("sdit")
            if op == "s" and mut:
                mut[p] = rng.choice(alpha2)
            elif op == "d" and mut:
                del mut[p]
            elif op == "i":
                mut.insert(p, rng.choice(alpha2))
            elif op == "t" and p < len(mut) - 1:
                mut[p], mut[p + 1] = mut[p + 1], mut[p]
        pairs.append((base, "".join(mut)))
    con = duckdb.connect()
    con.execute("create table t(a varchar, b varchar)")
    con.executemany("insert into t values (?, ?)", pairs)
    want = np.array([r[0] for r in con.execute(
        "select jaro_winkler_similarity(a,b) from t").fetchall()])
    got = batch_jaro_winkler([p[0] for p in pairs], [p[1] for p in pairs])
    assert np.max(np.abs(want - got)) < 1e-9
