"""P8/P10 unit tests: block stats, score distribution, reduction ratio,
per-query top-k ranking."""

from __future__ import annotations

from liblevenshtein_spark.operators.metrics import (
    bcubed, block_stats, hot_keys, rand_stats, reduction_ratio,
    score_distribution, summarize,
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


def test_bcubed_hand_computed(spark):
    # gold G1={a,b,c,d} G2={e,f} G3={g}; pred C1={a,b,e} C2={c,d,f} C3={g}
    # P = (4*(2/3) + 2*(1/3) + 1)/7 = 13/21; R = (4+2)*(1/2 resp.)+1 = 4/7
    rows = [("a", "C1", "G1"), ("b", "C1", "G1"), ("e", "C1", "G2"),
            ("c", "C2", "G1"), ("d", "C2", "G1"), ("f", "C2", "G2"),
            ("g", "C3", "G3")]
    df = spark.createDataFrame(rows, "rec string, cluster_id string, gold_id string")
    r = bcubed(df).collect()[0]
    assert r.n_entities == 7
    assert r.bcubed_precision == round(13 / 21 + 1e-9, 4)       # 0.6190
    assert r.bcubed_recall == round(4 / 7 + 1e-9, 4)            # 0.5714
    p, rr = 13 / 21, 4 / 7
    assert r.bcubed_f1 == round(2 * p * rr / (p + rr) + 1e-9, 4)  # 0.5943


def test_bcubed_perfect_and_degenerate(spark):
    perfect = spark.createDataFrame(
        [("a", "C1", "G1"), ("b", "C1", "G1"), ("c", "C2", "G2")],
        "rec string, cluster_id string, gold_id string")
    r = bcubed(perfect).collect()[0]
    assert (r.bcubed_precision, r.bcubed_recall, r.bcubed_f1) == (1.0, 1.0, 1.0)
    # all-singleton prediction against one 4-member gold group: P=1, R=1/4
    shattered = spark.createDataFrame(
        [(f"r{i}", f"C{i}", "G1") for i in range(4)],
        "rec string, cluster_id string, gold_id string")
    r = bcubed(shattered).collect()[0]
    assert r.bcubed_precision == 1.0
    assert r.bcubed_recall == 0.25
    assert r.bcubed_f1 == 0.4


def test_rand_stats_hand_computed(spark):
    # Hubert & Arabie's worked-style example: gold G1={a,b,c,d} G2={e,f}
    # G3={g}; pred C1={a,b,e} C2={c,d,f} C3={g}. Contingency n_cg:
    # (C1,G1)=2 (C1,G2)=1 (C2,G1)=2 (C2,G2)=1 (C3,G3)=1.
    # tp = C(2,2)+C(2,2) = 2; sum_c = 3+3+0 = 6; sum_g = 6+1+0 = 7;
    # total = C(7,2) = 21; fp = 4, fn = 5, tn = 21-6-7+2 = 10.
    rows = [("a", "C1", "G1"), ("b", "C1", "G1"), ("e", "C1", "G2"),
            ("c", "C2", "G1"), ("d", "C2", "G1"), ("f", "C2", "G2"),
            ("g", "C3", "G3")]
    df = spark.createDataFrame(rows, "rec string, cluster_id string, gold_id string")
    r = rand_stats(df).collect()[0]
    assert (r.n_entities, r.pair_tp, r.pair_fp, r.pair_fn, r.pair_tn) == (7, 2, 4, 5, 10)
    assert r.rand_index == round(12 / 21 + 1e-9, 4)
    expected = 6 * 7 / 21
    ari = (2 - expected) / ((6 + 7) / 2 - expected)
    assert r.adjusted_rand == round(ari + 1e-9, 4)


def test_rand_stats_perfect_and_degenerate(spark):
    perfect = spark.createDataFrame(
        [("a", "C1", "G1"), ("b", "C1", "G1"), ("c", "C2", "G2")],
        "rec string, cluster_id string, gold_id string")
    r = rand_stats(perfect).collect()[0]
    assert (r.pair_fp, r.pair_fn) == (0, 0)
    assert (r.rand_index, r.adjusted_rand) == (1.0, 1.0)
    # single record: zero pairs -> total=0 branch, both indices defined as 1
    single = spark.createDataFrame(
        [("a", "C1", "G1")], "rec string, cluster_id string, gold_id string")
    r = rand_stats(single).collect()[0]
    assert (r.rand_index, r.adjusted_rand) == (1.0, 1.0)


def test_fs_model_hand_computed(spark):
    from liblevenshtein_spark.operators.metrics import fs_model
    import math

    # matches: 3 pairs, 'name' agrees on 2; random: 4 pairs, agrees on 1.
    mg = spark.createDataFrame([(1,), (1,), (0,)], "name long")
    ug = spark.createDataFrame([(1,), (0,), (0,), (0,)], "name long")
    r = fs_model(mg, ug, ["name"]).collect()[0]
    assert (r.field, r.n_m, r.m_agree, r.n_u, r.u_agree) == ("name", 3, 2, 4, 1)
    m, u = 3 / 5, 2 / 6
    assert r.m == round(m + 1e-9, 4)
    assert r.u == round(u + 1e-9, 4)
    assert r.w_agree == round(math.log2(m / u) + 1e-9, 4)
    assert r.w_disagree == round(math.log2((1 - m) / (1 - u)) + 1e-9, 4)


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


def test_match_provenance(spark):
    """Per-match scheme provenance: sorted comma-joined names, distinct
    counting, and the schemes='' hole for a match no scheme proposed."""
    from liblevenshtein_spark.operators.metrics import match_provenance

    matches = spark.createDataFrame(
        [("a", "b", 1), ("c", "d", 2), ("x", "y", 0)],
        "id_a string, id_b string, distance int",
    )
    schemes = spark.createDataFrame(
        [("a", "b", "qgrams"), ("a", "b", "deletions"), ("a", "b", "qgrams"),
         ("c", "d", "snm"), ("m", "n", "deletions")],
        "id_a string, id_b string, scheme string",
    )
    out = {(r.id_a, r.id_b): r for r in
           match_provenance(matches, schemes).collect()}
    assert len(out) == 3  # left join keeps all matches, no row for (m,n)
    assert out[("a", "b")].schemes == "deletions,qgrams"
    assert out[("a", "b")].n_schemes == 2
    assert out[("c", "d")].schemes == "snm" and out[("c", "d")].n_schemes == 1
    assert out[("x", "y")].schemes == "" and out[("x", "y")].n_schemes == 0


def _vm(spark, rows):
    from liblevenshtein_spark.operators.metrics import vmeasure

    df = spark.createDataFrame(rows, ["conv_id", "cluster_id", "gold_id"])
    r = vmeasure(df).collect()[0]
    return r.homogeneity, r.completeness, r.v_measure


def _vm_reference(rows):
    """Independent entropy-by-hand V-measure."""
    import math
    from collections import Counter

    n = len(rows)
    cg = Counter((c, g) for _, c, g in rows)
    cs = Counter(c for _, c, _ in rows)
    gs = Counter(g for _, _, g in rows)
    hg = -sum(v / n * math.log(v / n) for v in gs.values())
    hc = -sum(v / n * math.log(v / n) for v in cs.values())
    hgc = -sum(v / n * math.log(v / cs[c]) for (c, g), v in cg.items())
    hcg = -sum(v / n * math.log(v / gs[g]) for (c, g), v in cg.items())
    hom = 1.0 if hg <= 0 else 1.0 - hgc / hg
    com = 1.0 if hc <= 0 else 1.0 - hcg / hc
    v = 0.0 if hom + com == 0 else 2 * hom * com / (hom + com)
    rnd = lambda x: round(x + 1e-9, 4)
    return rnd(hom), rnd(com), rnd(v)


def test_vmeasure_perfect(spark):
    rows = [("a", "k1", "g1"), ("b", "k1", "g1"), ("c", "k2", "g2")]
    assert _vm(spark, rows) == (1.0, 1.0, 1.0)


def test_vmeasure_all_merged_and_all_split(spark):
    # one giant cluster over two gold entities: completeness 1, homogeneity 0
    merged = [("a", "k", "g1"), ("b", "k", "g1"), ("c", "k", "g2"), ("d", "k", "g2")]
    hom, com, v = _vm(spark, merged)
    assert (hom, com, v) == (0.0, 1.0, 0.0)
    # all singleton clusters: homogeneity 1, completeness 0
    split = [("a", "k1", "g"), ("b", "k2", "g"), ("c", "k3", "g")]
    hom, com, v = _vm(spark, split)
    assert (hom, com, v) == (1.0, 0.0, 0.0)


def test_vmeasure_matches_reference_and_label_permutation(spark):
    import random

    rng = random.Random(5)
    rows = [
        (f"r{i}", f"k{rng.randrange(4)}", f"g{rng.randrange(3)}")
        for i in range(40)
    ]
    assert _vm(spark, rows) == _vm_reference(rows)
    # invariant under cluster-label permutation
    perm = {f"k{i}": f"z{9 - i}" for i in range(4)}
    rows2 = [(r, perm[c], g) for r, c, g in rows]
    assert _vm(spark, rows2) == _vm(spark, rows)
