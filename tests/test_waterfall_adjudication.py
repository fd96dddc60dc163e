"""Round-4 operators: waterfall exact-contraction linkage
(operators/waterfall.py), clerical-adjudication loop closure
(clustering.apply_adjudications), and the trigram-LM quality scorer
(corpus_quality.trigram_lm_scores)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from liblevenshtein_spark.operators.clustering import apply_adjudications
from liblevenshtein_spark.operators.corpus_quality import trigram_lm_scores
from liblevenshtein_spark.operators.waterfall import (exact_groups,
                                                      exact_pairs,
                                                      expand_rep_matches)


def _canon_df(spark, rows):
    return spark.createDataFrame(rows, "conv_id string, fingerprint string")


def test_exact_groups_min_id_rep(spark):
    canon = _canon_df(spark, [
        ("c3", "hello"), ("c1", "hello"), ("c2", "hello"),
        ("c9", "world"), ("c5", "unique"),
    ])
    got = {r["conv_id"]: r["rep"] for r in exact_groups(canon).collect()}
    assert got == {"c1": "c1", "c2": "c1", "c3": "c1", "c9": "c9", "c5": "c5"}


def test_exact_pairs_within_group_only(spark):
    canon = _canon_df(spark, [
        ("a", "x"), ("b", "x"), ("c", "x"), ("d", "y"), ("e", "y"), ("f", "z"),
    ])
    pairs = {(r["id_a"], r["id_b"])
             for r in exact_pairs(exact_groups(canon)).collect()}
    assert pairs == {("a", "b"), ("a", "c"), ("b", "c"), ("d", "e")}


def test_expand_rep_matches_exact_parity(spark):
    # groups {a1,a2} (fp=AAA) and {b1,b2,b3} (fp=AAB); rep match (a1,b1,d=1)
    # must expand to all 2x3 member pairs with the SAME distance, normalized
    canon = _canon_df(spark, [
        ("a1", "AAA"), ("a2", "AAA"),
        ("b1", "AAB"), ("b2", "AAB"), ("b3", "AAB"),
    ])
    mapping = exact_groups(canon)
    rep_matches = spark.createDataFrame(
        [("a1", "b1", 1)], "id_a string, id_b string, distance int")
    got = {(r["id_a"], r["id_b"], r["distance"])
           for r in expand_rep_matches(rep_matches, mapping).collect()}
    assert got == {("a1", "b1", 1), ("a1", "b2", 1), ("a1", "b3", 1),
                   ("a2", "b1", 1), ("a2", "b2", 1), ("a2", "b3", 1)}


def test_expand_rep_matches_renormalizes_order(spark):
    # member id 'z9' of rep 'a1' sorts AFTER member 'b1': expansion must
    # re-normalize to id_a < id_b even though rep ids were ordered
    canon = _canon_df(spark, [("a1", "AAA"), ("z9", "AAA"), ("b1", "AAB")])
    mapping = exact_groups(canon)
    rep_matches = spark.createDataFrame(
        [("a1", "b1", 2)], "id_a string, id_b string, distance int")
    got = {(r["id_a"], r["id_b"]) for r in
           expand_rep_matches(rep_matches, mapping).collect()}
    assert got == {("a1", "b1"), ("b1", "z9")}
    assert all(a < b for a, b in got)


def _entities(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "conv_id string")


def _edges(spark, pairs):
    return spark.createDataFrame(list(pairs), "id_a string, id_b string")


def _adj(spark, rows):
    return spark.createDataFrame(rows, "id_a string, id_b string, decision string")


def _clusters(df):
    return {r["conv_id"]: r["cluster_id"] for r in df.collect()}


def test_adjudication_reject_splits_cluster(spark):
    ents = _entities(spark, ["a", "b", "c"])
    matches = _edges(spark, [("a", "b"), ("b", "c")])
    adj = _adj(spark, [("b", "c", "reject")])
    got = _clusters(apply_adjudications(ents, matches, adj))
    assert got == {"a": "a", "b": "a", "c": "c"}


def test_adjudication_accept_merges_and_reject_is_orientation_free(spark):
    ents = _entities(spark, ["a", "b", "c", "d"])
    matches = _edges(spark, [("a", "b"), ("c", "d")])
    # reviewer labeled the reject as (b, a) — must still kill edge (a, b);
    # the accept bridges the two remaining singletons' components
    adj = _adj(spark, [("b", "a", "reject"), ("b", "c", "accept")])
    got = _clusters(apply_adjudications(ents, matches, adj))
    assert got == {"a": "a", "b": "b", "c": "b", "d": "b"}


def test_adjudication_conflict_resolves_to_reject(spark):
    ents = _entities(spark, ["a", "b"])
    matches = _edges(spark, [("a", "b")])
    adj = _adj(spark, [("a", "b", "accept"), ("a", "b", "reject")])
    got = _clusters(apply_adjudications(ents, matches, adj))
    assert got == {"a": "a", "b": "b"}


def test_adjudication_duplicate_accept_harmless(spark):
    ents = _entities(spark, ["a", "b"])
    matches = _edges(spark, [("a", "b")])
    adj = _adj(spark, [("a", "b", "accept")])
    got = _clusters(apply_adjudications(ents, matches, adj))
    assert got == {"a": "a", "b": "a"}


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_trigram_lm_flags_anomalous_doc(spark):
    normal = [(i, "the quick brown fox jumps over the lazy dog again and again")
              for i in range(8)]
    weird = [(99, "zzqxj zzqxj qqqzx jjjqz xqzjq")]
    out = {r["doc_id"]: r for r in
           trigram_lm_scores(_docs_df(spark, normal + weird)).collect()}
    assert set(out) == {*range(8), 99}
    normal_ppl = max(out[i]["lm_ppl"] for i in range(8))
    assert out[99]["lm_ppl"] > normal_ppl * 2


def test_trigram_lm_counts_and_short_docs(spark):
    # "abcd" -> trigrams abc, bcd; "x!" normalizes to "x " (len 2) -> dropped
    out = {r["doc_id"]: r for r in
           trigram_lm_scores(_docs_df(spark, [(1, "abcd"), (2, "x!")])).collect()}
    assert set(out) == {1}
    assert out[1]["n_trigrams"] == 2
    # model: abc, bcd each count 1; T=2, V=2 -> p = 2/4 = 0.5 each
    expected = -math.log(0.5)
    assert abs(out[1]["lm_logprob_avg"] - (-expected)) < 1e-3
    assert abs(out[1]["lm_ppl"] - 2.0) < 1e-3


def test_waterfall_matches_single_pass(spark):
    """Contraction parity on a hand-built corpus: exact pass + rep-level
    fuzzy pass expanded == all-pairs distance<=1 matches."""
    rows = [
        ("a1", "kitten"), ("a2", "kitten"), ("a3", "kitten"),
        ("b1", "sitten"), ("b2", "sitten"),
        ("c1", "london"),
    ]
    canon = _canon_df(spark, rows)
    mapping = exact_groups(canon)
    exact = {(r["id_a"], r["id_b"], 0) for r in exact_pairs(mapping).collect()}
    # fuzzy stage stand-in: rep-level distances computed exactly here
    reps = {r["rep"] for r in mapping.collect()}
    fp = dict(rows)
    import itertools

    def lev(s, t):
        if s == t:
            return 0
        prev = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            cur = [i]
            for j, ct in enumerate(t, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (cs != ct)))
            prev = cur
        return prev[-1]

    rep_matches = [(min(x, y), max(x, y), lev(fp[x], fp[y]))
                   for x, y in itertools.combinations(sorted(reps), 2)
                   if 0 < lev(fp[x], fp[y]) <= 1]
    rep_df = spark.createDataFrame(rep_matches,
                                   "id_a string, id_b string, distance int")
    fuzzy = {(r["id_a"], r["id_b"], r["distance"])
             for r in expand_rep_matches(rep_df, mapping).collect()}
    got = exact | fuzzy
    want = {(min(x, y), max(x, y), lev(fp[x], fp[y]))
            for x, y in itertools.combinations(sorted(fp), 2)
            if lev(fp[x], fp[y]) <= 1}
    assert got == want
