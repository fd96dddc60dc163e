"""Tests for operators/analytics.py (TF-IDF top-k, event gap stats,
corpus rollup) and the quality-preferred / semantic dedup group selectors."""

from __future__ import annotations

import datetime
import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from liblevenshtein_spark.operators.analytics import (
    IDF_SCALE, corpus_rollup, event_gap_stats, tfidf_topk,
)
from liblevenshtein_spark.operators.ann import semantic_dedup
from liblevenshtein_spark.operators.dedup import keep_best_groups


# ---------------------------------------------------------------------------
# tfidf_topk
# ---------------------------------------------------------------------------

def test_tfidf_hand_computed(spark):
    docs = spark.createDataFrame([
        (1, "apple banana apple"),
        (2, "banana cherry"),
        (3, "cherry cherry durian"),
    ], "doc_id long, text string")
    out = tfidf_topk(docs, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)

    def idf(df_count):
        return round(math.log((3 + 1) / (df_count + 1)) * IDF_SCALE)

    # doc 1: apple tf=2 df=1, banana tf=1 df=2
    top1 = sorted(by_doc[1], key=lambda r: r.rank)
    assert top1[0].term == "apple"
    assert top1[0].tf == 2
    assert top1[0].idf_1e4 == idf(1)
    assert top1[0].tfidf_1e4 == 2 * idf(1)
    assert top1[1].term == "banana"
    # every doc emits at most k rows, ranks are 1..k
    for rows in by_doc.values():
        assert sorted(r.rank for r in rows) == list(range(1, len(rows) + 1))
        assert len(rows) <= 2


def test_tfidf_tie_breaks_lexicographically(spark):
    docs = spark.createDataFrame(
        [(1, "zeta alpha"), (2, "unrelated")],
        "doc_id long, text string")
    out = {r.rank: r.term for r in tfidf_topk(docs, k=2).filter(
        F.col("doc_id") == 1).collect()}
    # equal tf and df -> equal score; alpha must outrank zeta
    assert out == {1: "alpha", 2: "zeta"}


# ---------------------------------------------------------------------------
# event_gap_stats
# ---------------------------------------------------------------------------

def test_event_gap_stats(spark):
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def ts(seconds, micros=0):
        return t0 + datetime.timedelta(seconds=seconds, microseconds=micros)

    events = spark.createDataFrame([
        Row(event_id=1, ts=ts(0), user_id=1, value=1.0),
        Row(event_id=2, ts=ts(10, 500), user_id=1, value=2.5),
        Row(event_id=3, ts=ts(25), user_id=1, value=0.0),
        Row(event_id=4, ts=ts(0), user_id=2, value=7.0),  # singleton user
    ])
    rows = {r.user_id: r for r in event_gap_stats(events).collect()}
    u1 = rows[1]
    assert u1.n_events == 3
    # gaps: 10.0005 s and 14.9995 s -> sum 25 s exactly, max 14.9995 s
    assert u1.sum_gap_us == 25_000_000
    assert u1.max_gap_us == 14_999_500
    assert u1.sum_value_cents == 350
    u2 = rows[2]
    assert u2.n_events == 1
    assert u2.sum_gap_us == 0 and u2.max_gap_us == 0


def test_event_gap_ordering_uses_event_id_for_ties(spark):
    t0 = datetime.datetime(2024, 1, 1)
    events = spark.createDataFrame([
        Row(event_id=2, ts=t0 + datetime.timedelta(seconds=5), user_id=1, value=0.0),
        Row(event_id=1, ts=t0 + datetime.timedelta(seconds=5), user_id=1, value=0.0),
        Row(event_id=3, ts=t0 + datetime.timedelta(seconds=9), user_id=1, value=0.0),
    ])
    r = event_gap_stats(events).collect()[0]
    # ties on ts are ordered by event_id -> gaps 0 and 4 s
    assert r.sum_gap_us == 4_000_000
    assert r.max_gap_us == 4_000_000


# ---------------------------------------------------------------------------
# corpus_rollup
# ---------------------------------------------------------------------------

def test_corpus_rollup_levels(spark):
    docs = spark.createDataFrame([
        (1, "en", "web", 10),
        (2, "en", "web", 20),
        (3, "en", "books", 5),
        (4, "de", "web", 7),
    ], "doc_id long, lang string, source string, n_chars long")
    rows = corpus_rollup(docs).collect()
    by_key = {(r.lang, r.source): r for r in rows}
    # leaf level
    leaf = by_key[("en", "web")]
    assert leaf.grouping_lvl == 0 and leaf.n_docs == 2 and leaf.sum_chars == 30
    # per-lang subtotal
    en = by_key[("en", "<all>")]
    assert en.grouping_lvl == 1 and en.n_docs == 3 and en.sum_chars == 35
    # grand total
    total = by_key[("<all>", "<all>")]
    assert total.grouping_lvl == 3 and total.n_docs == 4 and total.sum_chars == 42
    # rollup (not cube): no (<all>, web) row
    assert ("<all>", "web") not in by_key


# ---------------------------------------------------------------------------
# keep_best_groups / semantic_dedup
# ---------------------------------------------------------------------------

def test_keep_best_groups_prefers_quality(spark):
    docs = spark.createDataFrame([
        (1, 0.4), (2, 0.9), (3, 0.9), (4, 0.5),
    ], "doc_id long, quality_score double")
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    rows = {r.doc_id: r for r in keep_best_groups(docs, pairs).collect()}
    # {1,2,3} one group: 2 and 3 tie on quality 0.9 -> min id 2 survives
    assert rows[2].is_kept and not rows[1].is_kept and not rows[3].is_kept
    assert rows[1].dup_group == rows[2].dup_group == rows[3].dup_group
    # singleton keeps itself
    assert rows[4].is_kept


def test_semantic_dedup_groups_near_identical_vectors(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    dim = 64
    base = rng.standard_normal(dim)
    rows = [
        (0, [float(x) for x in base]),
        (1, [float(x) for x in base * 1.001]),        # same direction
        (2, [float(x) for x in base + 0.001 * rng.standard_normal(dim)]),
        (3, [float(x) for x in rng.standard_normal(dim)]),  # unrelated
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r.vec_id: r for r in
           semantic_dedup(emb, threshold=0.99, dim=dim).collect()}
    assert got[0].dup_group == got[1].dup_group == got[2].dup_group == 0
    assert got[0].is_kept and not got[1].is_kept and not got[2].is_kept
    assert got[3].dup_group == 3 and got[3].is_kept


def test_event_running_totals(spark):
    import datetime
    from liblevenshtein_spark.operators.analytics import event_running_totals

    t0 = datetime.datetime(2024, 1, 1)
    events = spark.createDataFrame([
        Row(event_id=1, ts=t0 + datetime.timedelta(seconds=1), user_id=1, value=1.00),
        Row(event_id=2, ts=t0 + datetime.timedelta(seconds=2), user_id=1, value=3.00),
        Row(event_id=3, ts=t0 + datetime.timedelta(seconds=3), user_id=1, value=2.00),
        Row(event_id=4, ts=t0, user_id=2, value=5.00),
    ])
    rows = {r.event_id: r for r in event_running_totals(events, buckets=2).collect()}
    assert [rows[i].running_cents for i in (1, 2, 3)] == [100, 400, 600]
    assert [rows[i].running_n for i in (1, 2, 3)] == [1, 2, 3]
    # value order: e2 (300) -> tile 1, e3 (200) -> tile 1, e1 (100) -> tile 2
    assert rows[2].value_quartile == 1
    assert rows[3].value_quartile == 1
    assert rows[1].value_quartile == 2
    assert rows[4].running_cents == 500 and rows[4].value_quartile == 1


# ---------------------------------------------------------------------------
# corpus_cube / event_hop_windows / event_props_map
# ---------------------------------------------------------------------------

def test_corpus_cube_all_grouping_sets(spark):
    from liblevenshtein_spark.operators.analytics import corpus_cube

    docs = spark.createDataFrame([
        (1, "en", "s1", 10), (2, "en", "s2", 20), (3, "de", "s1", 30),
    ], "doc_id long, lang string, source string, n_chars long")
    rows = {(r.lang, r.source): r for r in corpus_cube(docs).collect()}
    # grand total
    assert rows[("<all>", "<all>")].n_docs == 3
    assert rows[("<all>", "<all>")].sum_chars == 60
    assert rows[("<all>", "<all>")].grouping_lvl == 3
    # per-lang (source rolled up)
    assert rows[("en", "<all>")].n_docs == 2
    # per-source slice — the grouping set ROLLUP does not produce
    assert rows[("<all>", "s1")].n_docs == 2
    assert rows[("<all>", "s1")].sum_chars == 40
    assert rows[("<all>", "s1")].grouping_lvl == 2
    # leaf cells
    assert rows[("de", "s1")].n_docs == 1
    # 4 grouping sets: 3 leaves + 2 langs + 2 sources + 1 total
    assert len(rows) == 8


def test_event_hop_windows_fanout_and_alignment(spark):
    import datetime

    from liblevenshtein_spark.operators.analytics import event_hop_windows

    ts = datetime.datetime(2024, 1, 1, 0, 25, 0)
    ev = spark.createDataFrame(
        [(1, ts, 7, "click", 1.25, '{"k": 3}')],
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    rows = sorted(event_hop_windows(ev).collect(), key=lambda r: r.window_start_us)
    starts = [r.window_start_us for r in rows]
    # one event -> exactly window/slide = 3 overlapping windows, and every
    # start is epoch-aligned to the 10-minute slide grid spanning 20 minutes
    assert len(rows) == 3
    assert [s % 600_000_000 for s in starts] == [0, 0, 0]
    assert starts[2] - starts[0] == 1_200_000_000
    # each window contains the event (ts = last start + 5 min):
    # start <= ts < start + 30 min
    for s in starts:
        assert s <= starts[2] + 5 * 60 * 1_000_000 < s + 1_800_000_000
    for r in rows:
        assert r.n_events == 1 and r.sum_value_cents == 125


def test_event_props_map_per_key(spark):
    from liblevenshtein_spark.operators.analytics import event_props_map

    ev = spark.createDataFrame(
        [
            (1, None, 1, "a", 0.0, '{"k": 3, "j": -2}'),
            (2, None, 1, "a", 0.0, '{"k": 5}'),
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    rows = {r.key: r for r in event_props_map(ev).collect()}
    assert rows["k"].n_events == 2 and rows["k"].sum_val == 8
    assert rows["k"].min_val == 3 and rows["k"].max_val == 5
    assert rows["j"].n_events == 1 and rows["j"].sum_val == -2


# ---------------------------------------------------------------------------
# event_funnel
# ---------------------------------------------------------------------------

def _ev(uid, typ, sec):
    return Row(user_id=uid, event_type=typ,
               ts=datetime.datetime(2026, 1, 1, 0, 0, sec))


def test_event_funnel_stages_and_strict_ordering(spark):
    from liblevenshtein_spark.operators.analytics import event_funnel

    rows = [
        # u1 completes in order
        _ev(1, "view", 1), _ev(1, "click", 5), _ev(1, "purchase", 9),
        # u2: purchase BEFORE click -> stage 2 only
        _ev(2, "view", 1), _ev(2, "purchase", 2), _ev(2, "click", 3),
        # u3: click before any view -> stage 1 only (strictly-after rule)
        _ev(3, "click", 1), _ev(3, "view", 2),
        # u4 never views -> excluded
        _ev(4, "click", 1), _ev(4, "purchase", 2),
        # u5: earliest view counts, later duplicate stages ignored
        _ev(5, "view", 1), _ev(5, "view", 8), _ev(5, "click", 2),
        _ev(5, "click", 9), _ev(5, "purchase", 4),
    ]
    out = {r["user_id"]: r for r in event_funnel(
        spark.createDataFrame(rows), ["view", "click", "purchase"]).collect()}
    assert set(out) == {1, 2, 3, 5}
    assert out[1]["stage"] == 3
    assert out[2]["stage"] == 2 and out[2]["purchase_us"] is None
    assert out[3]["stage"] == 1 and out[3]["click_us"] is None
    assert out[5]["stage"] == 3
    base = out[5]["view_us"]
    assert out[5]["click_us"] - base == 1_000_000
    assert out[5]["purchase_us"] - base == 3_000_000


def test_event_funnel_validates_stages(spark):
    from liblevenshtein_spark.operators.analytics import event_funnel

    df = spark.createDataFrame([_ev(1, "view", 1)])
    with pytest.raises(ValueError):
        event_funnel(df, [])
    with pytest.raises(ValueError):
        event_funnel(df, ["view", "view"])


# ---------------------------------------------------------------------------
# bpe_merge_pairs
# ---------------------------------------------------------------------------

def test_bpe_merge_pairs_hand_computed(spark):
    from liblevenshtein_spark.operators.analytics import bpe_merge_pairs

    docs = spark.createDataFrame([
        (1, "low low lower"),
        (2, "newest widest"),
    ], "doc_id long, text string")
    out = {r.pair: (r.pair_count, r.rank)
           for r in bpe_merge_pairs(docs, top_n=10).collect()}
    # vocab: low(2) lower(1) newest(1) widest(1); weighted bigrams:
    # lo=3 ow=3 es=2 st=2 we=2 de=1 er=1 ew=1 id=1 ne=1 wi=1 -> top 10 drops wi
    assert out == {
        "lo": (3, 1), "ow": (3, 2), "es": (2, 3), "st": (2, 4), "we": (2, 5),
        "de": (1, 6), "er": (1, 7), "ew": (1, 8), "id": (1, 9), "ne": (1, 10),
    }


def test_bpe_merge_pairs_case_and_punct(spark):
    from liblevenshtein_spark.operators.analytics import bpe_merge_pairs

    docs = spark.createDataFrame(
        [(1, "Ab-AB! cd9ab")], "doc_id long, text string")
    out = {r.pair: r.pair_count for r in bpe_merge_pairs(docs).collect()}
    # lowercased + split on non-letters: ab(2 as distinct word... 'ab','ab','cd','ab')
    # vocab: ab wc=3, cd wc=1 -> pairs ab=3, cd=1
    assert out == {"ab": 3, "cd": 1}


def test_event_transitions_hand_computed(spark):
    from datetime import datetime

    from liblevenshtein_spark.operators.analytics import event_transitions

    rows = [
        # user 1: a -> b -> a ; user 2: a -> b
        (1, datetime(2024, 1, 1, 0, 0), 10, "a"),
        (2, datetime(2024, 1, 1, 0, 1), 10, "b"),
        (3, datetime(2024, 1, 1, 0, 2), 10, "a"),
        (4, datetime(2024, 1, 1, 0, 0), 20, "a"),
        (5, datetime(2024, 1, 1, 0, 3), 20, "b"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type"]
    )
    got = {
        (r.prev_type, r.next_type): (r.n_trans, r.n_from_prev, r.p_next_1e6)
        for r in event_transitions(df).collect()
    }
    assert got == {
        ("a", "b"): (2, 2, 1000000),
        ("b", "a"): (1, 1, 1000000),
    }


def test_event_transitions_probabilities_sum_to_one(spark):
    import random
    from datetime import datetime, timedelta

    from liblevenshtein_spark.operators.analytics import event_transitions
    from pyspark.sql import functions as F

    rng = random.Random(2)
    rows = [
        (i, datetime(2024, 1, 1) + timedelta(minutes=i), rng.randrange(5),
         rng.choice("xyz"))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    out = event_transitions(df)
    sums = (
        out.groupBy("prev_type")
        .agg(F.sum("p_next_1e6").alias("s"), F.sum("n_trans").alias("n"),
             F.first("n_from_prev").alias("m"))
        .collect()
    )
    for r in sums:
        assert abs(r.s - 1000000) <= 2  # floor(+0.5) rounding slack
        assert r.n == r.m


def test_corpus_zipf_on_known_distribution(spark):
    from liblevenshtein_spark.operators.analytics import corpus_zipf

    # freq(term_r) = 2^(6-r): a perfect power law over ranks 1,2,4,...
    docs = []
    text = []
    for r, word in enumerate(["alpha", "beta", "gamma", "delta"], start=1):
        text += [word] * (2 ** (5 - r))
    docs.append((1, " ".join(text)))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    row = corpus_zipf(df).collect()[0]
    assert row.n_types == 4
    assert row.n_tokens == 16 + 8 + 4 + 2
    import math

    # exact least-squares on the 4 (ln rank, ln freq) points
    pts = [(math.log(r), math.log(f)) for r, f in
           [(1, 16), (2, 8), (3, 4), (4, 2)]]
    mx = sum(x for x, _ in pts) / 4
    my = sum(y for _, y in pts) / 4
    slope = sum((x - mx) * (y - my) for x, y in pts) / sum(
        (x - mx) ** 2 for x, _ in pts
    )
    assert abs(row.zipf_slope - round(slope + 1e-9, 4)) < 1e-9
    assert row.zipf_slope < 0
