"""P8/P10 unit tests: block stats, score distribution, reduction ratio,
per-query top-k ranking."""

from __future__ import annotations

from liblevenshtein_spark.operators.metrics import (
    block_stats, hot_keys, reduction_ratio, score_distribution, summarize,
)
from liblevenshtein_spark.operators.topk import topk_candidates


def test_block_stats_and_hot_keys(spark):
    keys = spark.createDataFrame(
        [("a", "k1"), ("b", "k1"), ("c", "k1"), ("d", "k2"), ("e", "k2"), ("f", "k3")],
        ["conv_id", "block_key"],
    )
    stats = {r.block_key: (r.n_records, r.pair_mass) for r in block_stats(keys).collect()}
    assert stats == {"k1": (3, 3), "k2": (2, 1), "k3": (1, 0)}
    hot = hot_keys(keys, top=1).collect()
    assert hot[0].block_key == "k1"


def test_score_distribution_and_reduction(spark):
    scored = spark.createDataFrame(
        [("a", "b", 0), ("a", "c", 1), ("b", "c", 1), ("d", "e", 3)],
        ["id_a", "id_b", "distance"],
    )
    dist = {r.distance: r.n_pairs for r in score_distribution(scored).collect()}
    assert dist == {0: 1, 1: 2, 3: 1}
    assert reduction_ratio(10, 45) == 0.0
    assert reduction_ratio(10, 0) == 1.0
    assert reduction_ratio(0, 0) == 1.0


def test_summarize(spark):
    keys = spark.createDataFrame([("a", "k1"), ("b", "k1")], ["conv_id", "block_key"])
    pairs = spark.createDataFrame([("a", "b")], ["id_a", "id_b"])
    scored = spark.createDataFrame([("a", "b", 2)], ["id_a", "id_b", "distance"])
    s = summarize(keys, pairs, scored, n_entities=2)
    assert s["n_candidate_pairs"] == 1
    assert s["reduction_ratio"] == 0.0
    assert s["distance_histogram"] == {2: 1}


def test_topk_candidates(spark):
    scored = spark.createDataFrame(
        [
            ("q1", "aa", 2), ("q1", "ab", 1), ("q1", "ac", 1), ("q1", "ad", 3),
            ("q2", "zz", 0),
        ],
        ["query_id", "candidate", "distance"],
    )
    got = {
        (r.query_id, r.candidate, r.rank)
        for r in topk_candidates(scored, k=2).collect()
    }
    # ties broken by candidate asc: ab(1) then ac(1)
    assert got == {("q1", "ab", 1), ("q1", "ac", 2), ("q2", "zz", 1)}


def test_pairwise_confusion_planted_misses(spark):
    """The eval operator itself must detect degraded predictions: one
    missed truth pair (fn), one spurious prediction (fp), two hits (tp)."""
    from liblevenshtein_spark.operators.metrics import pairwise_confusion

    truth = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("d", "e")], ["id_a", "id_b"])
    preds = spark.createDataFrame(
        [("a", "b"), ("d", "e"), ("x", "y")], ["id_a", "id_b"])
    row = pairwise_confusion(truth, preds).collect()[0]
    assert (row.tp, row.fp, row.fn) == (2, 1, 1)
    assert row.precision_1e4 == 6667  # 2/3 rounded
    assert row.recall_1e4 == 6667
    assert row.f1_1e4 == 6667


def test_pairwise_confusion_perfect_and_empty(spark):
    from liblevenshtein_spark.operators.metrics import pairwise_confusion

    t = spark.createDataFrame([("a", "b")], ["id_a", "id_b"])
    perfect = pairwise_confusion(t, t).collect()[0]
    assert (perfect.tp, perfect.fp, perfect.fn) == (1, 0, 0)
    assert perfect.f1_1e4 == 10000
    empty = spark.createDataFrame([], "id_a string, id_b string")
    zero = pairwise_confusion(empty, empty).collect()[0]
    assert (zero.tp, zero.fp, zero.fn) == (0, 0, 0)
    assert (zero.precision_1e4, zero.recall_1e4, zero.f1_1e4) == (0, 0, 0)
