"""Blocking-completeness gate (SURVEY.md §4.3 / §5.2 row 3): for every
algorithm variant and n, the blocked candidate-pair set must have recall 1.0
against the O(N^2) brute-force oracle — the reference returns ALL terms
within distance n (README.md:13-14,23), so any blocking miss is a
correctness bug, not a tuning issue."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from liblevenshtein_spark.config import LinkConfig
from liblevenshtein_spark.kernels.banded import batch_banded_distance
from liblevenshtein_spark.operators.candidates import block_keys, candidate_pairs
from liblevenshtein_spark.testdata_gen import gen_dictionary, gen_transcript_rows

ALGOS = ["standard", "transposition", "merge_and_split"]


def brute_force_pairs(items: list[tuple[str, str]], n: int, algorithm: str) -> set:
    """All unordered id pairs with distance <= n (banded kernel as oracle —
    itself gated against naive recursion in test_kernels)."""
    ids = [i for i, _ in items]
    texts = [t for _, t in items]
    a_idx, b_idx = zip(*itertools.combinations(range(len(items)), 2))
    d = batch_banded_distance(
        [texts[i] for i in a_idx], [texts[j] for j in b_idx], n, algorithm
    )
    return {
        tuple(sorted((ids[i], ids[j])))
        for i, j, dist in zip(a_idx, b_idx, d)
        if dist <= n
    }


def _spark_pairs(spark, items, conf):
    df = spark.createDataFrame(items, ["conv_id", "fingerprint"])
    build, probe = block_keys(df, conf)
    return {
        (r.id_a, r.id_b)
        for r in candidate_pairs(build, probe, conf).collect()
    }


@pytest.mark.parametrize("algorithm", ALGOS)
@pytest.mark.parametrize("n", [1, 2])
def test_segments_recall_words(spark, algorithm, n):
    terms = gen_dictionary(150)
    items = [(f"t{i:04d}", t) for i, t in enumerate(terms)]
    conf = LinkConfig(algorithm=algorithm, max_distance=n, blocking_scheme="segments",
                      hot_key_threshold=100)
    got = _spark_pairs(spark, items, conf)
    want = brute_force_pairs(items, n, algorithm)
    assert want <= got, f"missed {sorted(want - got)[:10]}"


@pytest.mark.parametrize("algorithm", ALGOS)
@pytest.mark.parametrize("n", [1, 2])
def test_deletions_recall_words(spark, algorithm, n):
    terms = gen_dictionary(150)
    items = [(f"t{i:04d}", t) for i, t in enumerate(terms)]
    conf = LinkConfig(algorithm=algorithm, max_distance=n, blocking_scheme="deletions")
    got = _spark_pairs(spark, items, conf)
    want = brute_force_pairs(items, n, algorithm)
    assert want <= got, f"missed {sorted(want - got)[:10]}"


@pytest.mark.parametrize("algorithm", ALGOS)
def test_segments_recall_fingerprints(spark, algorithm):
    """Long-string case: planted near-duplicate conversation fingerprints."""
    from liblevenshtein_spark.config import FINGERPRINT_SEP

    rows, _ = gen_transcript_rows(40, dup_fraction=0.6, max_edits=2, algorithm=algorithm)
    convs: dict[str, list] = {}
    for conv_id, turn_idx, _role, text, _tool, _ts in rows:
        convs.setdefault(conv_id, []).append((turn_idx, text))
    items = [
        (cid, FINGERPRINT_SEP.join(t for _, t in sorted(ts)))
        for cid, ts in sorted(convs.items())
    ]
    conf = LinkConfig(algorithm=algorithm, max_distance=2, blocking_scheme="segments",
                      hot_key_threshold=50)
    got = _spark_pairs(spark, items, conf)
    want = brute_force_pairs(items, 2, algorithm)
    assert len(want) > 5, "fixture must contain planted near-dup pairs"
    assert want <= got, f"missed {sorted(want - got)[:10]}"


def test_hot_key_salting_equivalence(spark):
    """Salted decomposition must produce exactly the same pair set as the
    plain join (threshold low enough to force the hot path)."""
    terms = gen_dictionary(120)
    items = [(f"t{i:04d}", t) for i, t in enumerate(terms)]
    base = LinkConfig(algorithm="standard", max_distance=1, blocking_scheme="segments",
                      hot_key_threshold=1_000_000)
    salted = LinkConfig(algorithm="standard", max_distance=1, blocking_scheme="segments",
                        hot_key_threshold=5)
    assert _spark_pairs(spark, items, base) == _spark_pairs(spark, items, salted)


def test_skew_probe_off_equivalence(spark):
    """conf.skew_probe=False (the streaming micro-batch latency path) skips
    hot-key detection entirely; on a corpus below the hot threshold the
    plain equi-join must produce the identical pair set."""
    terms = gen_dictionary(120)
    items = [(f"t{i:04d}", t) for i, t in enumerate(terms)]
    probed = LinkConfig(algorithm="standard", max_distance=1, blocking_scheme="segments")
    unprobed = LinkConfig(algorithm="standard", max_distance=1, blocking_scheme="segments",
                          skew_probe=False)
    assert _spark_pairs(spark, items, probed) == _spark_pairs(spark, items, unprobed)


@pytest.mark.parametrize("n", [1, 2, 3])
def test_multi_match_aware_window_boundaries(spark, n):
    """Adversarial gate for the PassJoin multi-match-aware probe window:
    pairs built by editing exactly at segment boundaries (where an
    off-by-one in the d-window silently loses recall) across many lengths,
    including inserts/deletes that shift every later segment."""
    import random

    rng = random.Random(13)
    items = []
    pid = 0
    for L in list(range(3, 40)) + [63, 64, 65, 100, 101]:
        base = "".join(rng.choice("abcdef") for _ in range(L))
        items.append((f"b{pid:04d}", base))
        k = n + 1  # segments for the standard scheme
        bounds = sorted({(i * L) // k for i in range(k)} | {L - 1, 0})
        for which, pos in enumerate(bounds):
            s = base
            for e in range(n):
                p = min(pos + e, len(s) - 1)
                op = rng.choice(["del", "ins", "sub"])
                if op == "del" and len(s) > 1:
                    s = s[:p] + s[p + 1:]
                elif op == "ins":
                    s = s[:p] + rng.choice("xyz") + s[p:]
                else:
                    s = s[:p] + rng.choice("xyz") + s[p + 1:]
            items.append((f"e{pid:04d}_{which}", s))
        pid += 1

    conf = LinkConfig(algorithm="standard", max_distance=n,
                      blocking_scheme="segments", hot_key_threshold=10_000)
    got = _spark_pairs(spark, items, conf)
    want = brute_force_pairs(items, n, "standard")
    assert len(want) > 50
    assert want <= got, f"missed {sorted(want - got)[:10]}"
