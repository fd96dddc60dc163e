"""Temporal join operators: as-of join (union+window re-expression) and
bounded range join (two-bucket band join), each checked against a
straightforward brute-force within-Spark oracle plus hand-built edge
cases (empty build side, equal timestamps, window boundaries)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from liblevenshtein_spark.operators import temporal

EPOCH = dt.datetime(2024, 1, 1)


def _t(seconds: float) -> dt.datetime:
    return EPOCH + dt.timedelta(seconds=seconds)


def _frame(spark, rows):
    return spark.createDataFrame(rows, ["event_id", "user_id", "ts", "value"])


def test_asof_join_hand_cases(spark):
    build = _frame(spark, [
        (100, 1, _t(10), 1.0),
        (101, 1, _t(20), 1.0),
        (102, 2, _t(5), 1.0),
    ])
    probe = _frame(spark, [
        (0, 1, _t(5), 0.0),    # before any build -> -1
        (1, 1, _t(20), 0.0),   # equal ts -> inclusive match 101
        (2, 1, _t(25), 0.0),   # latest preceding -> 101
        (3, 2, _t(6), 0.0),    # -> 102
        (4, 3, _t(6), 0.0),    # user with no build rows -> -1
    ])
    out = {r.probe_id: r for r in temporal.asof_join(probe, build).collect()}
    assert len(out) == 5
    assert out[0].match_id == -1 and out[0].lag_us == -1
    assert out[1].match_id == 101 and out[1].lag_us == 0
    assert out[2].match_id == 101 and out[2].lag_us == 5_000_000
    assert out[3].match_id == 102 and out[3].lag_us == 1_000_000
    assert out[4].match_id == -1


def test_asof_join_vs_bruteforce_events(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    probe = ev.filter(F.col("event_type") == "view")
    build = ev.filter(F.col("event_type") == "signup")
    got = {r.probe_id: (r.match_id, r.lag_us)
           for r in temporal.asof_join(probe, build).collect()}
    # brute force: inequality join + argmax by build ts
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    p = probe.select("user_id", F.col("event_id").alias("pid"), us.alias("pus"))
    b = build.select("user_id", F.col("event_id").alias("bid"), us.alias("bus"))
    joined = (
        p.join(b, ["user_id"], "left")
        .filter(F.col("bus") <= F.col("pus"))
        .groupBy("pid", "pus")
        .agg(F.max(F.struct("bus", "bid")).alias("m"))
        .select("pid", "pus", "m.bid", "m.bus")
    )
    want = {r.pid: (r.bid, r.pus - r.bus) for r in joined.collect()}
    assert probe.count() == len(got)
    for pid, (mid, lag) in got.items():
        if pid in want:
            assert (mid, lag) == want[pid], pid
        else:
            assert (mid, lag) == (-1, -1), pid


def test_range_join_agg_hand_cases(spark):
    W = 10_000_000  # 10 s in us
    build = _frame(spark, [
        (100, 1, _t(10.0), 1.00),   # exactly t-window for probe at 20 -> in
        (101, 1, _t(19.5), 2.50),   # in range
        (102, 1, _t(20.0), 4.00),   # equal to probe ts -> excluded
        (103, 1, _t(3.0), 8.00),    # before window -> excluded
        (104, 2, _t(19.0), 1.00),   # other user
    ])
    probe = _frame(spark, [
        (0, 1, _t(20.0), 0.0),
        (1, 2, _t(40.0), 0.0),   # nothing in [30, 40) -> zeros
    ])
    out = {r.probe_id: r for r in
           temporal.range_join_agg(probe, build, window_us=W).collect()}
    assert out[0].n_in_range == 2 and out[0].sum_cents == 100 + 250
    assert out[1].n_in_range == 0 and out[1].sum_cents == 0


def test_range_join_agg_vs_bruteforce_events(spark):
    W = 7_200_000_000  # 2 h
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    probe = ev.filter(F.col("event_type") == "signup")
    build = ev.filter(F.col("event_type") == "view")
    got = {r.probe_id: (r.n_in_range, r.sum_cents)
           for r in temporal.range_join_agg(probe, build, window_us=W).collect()}
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    p = probe.select("user_id", F.col("event_id").alias("pid"), us.alias("pus"))
    b = build.select(
        "user_id", us.alias("bus"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    brute = (
        p.join(b, ["user_id"], "left")
        .withColumn(
            "hit",
            (F.col("bus") >= F.col("pus") - W) & (F.col("bus") < F.col("pus")),
        )
        .groupBy("pid")
        .agg(
            F.sum(F.when(F.col("hit"), 1).otherwise(0)).alias("n"),
            F.coalesce(
                F.sum(F.when(F.col("hit"), F.col("cents"))), F.lit(0)
            ).alias("s"),
        )
    )
    want = {r.pid: (r.n, r.s) for r in brute.collect()}
    assert got == want
    assert any(n > 0 for n, _ in got.values())  # non-degenerate


def test_range_join_agg_rejects_bad_window(spark):
    import pytest

    df = _frame(spark, [(0, 1, _t(0), 0.0)])
    with pytest.raises(ValueError):
        temporal.range_join_agg(df, df, window_us=0)


def test_dedup_turns_keeper_and_counts(spark):
    from liblevenshtein_spark.operators.dedup import dedup_turns

    turns = spark.createDataFrame(
        [
            ("a", 0, "hello"),
            ("a", 1, "unique one"),
            ("b", 0, "HELLO"),       # dup of (a,0) after lower()
            ("b", 1, "hello"),       # dup of (a,0)
            ("aa", 5, "hello"),      # 'a' < 'aa' lexicographically -> dup
            ("b", 2, "unique two"),
        ],
        ["conv_id", "turn_idx", "text"],
    )
    out = {(r.conv_id, r.turn_idx): r for r in dedup_turns(turns).collect()}
    assert len(out) == 6
    hello = [k for k, r in out.items() if r.n_occurrences == 4]
    assert set(hello) == {("a", 0), ("b", 0), ("b", 1), ("aa", 5)}
    assert not out[("a", 0)].is_dup          # first in (conv_id, turn_idx) order
    assert out[("b", 0)].is_dup and out[("b", 1)].is_dup and out[("aa", 5)].is_dup
    assert not out[("a", 1)].is_dup and not out[("b", 2)].is_dup
    assert out[("a", 1)].n_occurrences == 1


def test_dedup_turns_planted_duplicates(spark):
    """The derived transcript corpus plants near-dup conversations sharing
    every full-width turn prefix -> cross-conversation duplicate turns must
    exist, and exactly one keeper per duplicated text."""
    from liblevenshtein_spark.driver_queries import derive_transcripts
    from liblevenshtein_spark.operators.dedup import dedup_turns

    t = derive_transcripts(spark, "/root/testdata/sf0.001")
    out = dedup_turns(t)
    assert out.count() == t.count()
    dupes = out.filter("is_dup").count()
    assert dupes > 0
    # keepers per duplicated group: occurrences - 1 flagged
    agg = out.groupBy("n_occurrences").agg(
        F.count("*").alias("rows"),
        F.sum(F.col("is_dup").cast("int")).alias("flagged"),
    )
    for r in agg.collect():
        assert r.flagged * r.n_occurrences == r.rows * (r.n_occurrences - 1)
