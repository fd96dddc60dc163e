"""entity_history (operators/clustering.py): SCD2 gaps-and-islands interval
builder vs a pure-Python reference, including re-entry (A->B->A) and
absent-run cases."""

from __future__ import annotations

import random

from liblevenshtein_spark.operators.clustering import entity_history


def _ref(rows):
    """rows: (id, run, entity) -> set of (id, entity, valid_from, valid_to, is_current)"""
    by_id: dict = {}
    for i, r, e in rows:
        by_id.setdefault(i, []).append((r, e))
    out = []
    for i, obs in by_id.items():
        obs.sort()
        intervals = []
        for r, e in obs:
            if intervals and intervals[-1][0] == e:
                continue
            intervals.append((e, r))
        for k, (e, vf) in enumerate(intervals):
            vt = intervals[k + 1][1] if k + 1 < len(intervals) else None
            out.append((i, e, vf, vt, 1 if vt is None else 0))
    return sorted(out, key=lambda t: (t[0], t[2]))


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, run_id int, entity_id string"
    ).selectExpr("conv_id", "run_id", "entity_id")


def _collect(df):
    return sorted(
        ((r["conv_id"], r["entity_id"], r["valid_from"], r["valid_to"],
          r["is_current"]) for r in df.collect()),
        key=lambda t: (t[0], t[2]),
    )


def test_entity_history_basic_change_and_stable(spark):
    rows = [("x", 1, "A"), ("x", 2, "A"), ("x", 3, "B"),
            ("y", 1, "C"), ("y", 2, "C"), ("y", 3, "C")]
    got = _collect(entity_history(_df(spark, rows)))
    assert got == [("x", "A", 1, 3, 0), ("x", "B", 3, None, 1),
                   ("y", "C", 1, None, 1)]


def test_entity_history_reentry_gets_two_intervals(spark):
    rows = [("x", 1, "A"), ("x", 2, "B"), ("x", 3, "A")]
    got = _collect(entity_history(_df(spark, rows)))
    assert got == [("x", "A", 1, 2, 0), ("x", "B", 2, 3, 0),
                   ("x", "A", 3, None, 1)]


def test_entity_history_absent_runs_are_adjacent(spark):
    # record absent from run 2: runs 1 and 3 are treated as adjacent
    rows = [("x", 1, "A"), ("x", 3, "A"), ("x", 7, "B")]
    got = _collect(entity_history(_df(spark, rows)))
    assert got == [("x", "A", 1, 7, 0), ("x", "B", 7, None, 1)]


def test_entity_history_matches_reference_random(spark):
    rng = random.Random(5)
    for trial in range(3):
        rows = []
        for i in range(25):
            runs = sorted(rng.sample(range(1, 9), rng.randint(1, 6)))
            for r in runs:
                rows.append((f"id{i:02d}", r, rng.choice("ABC")))
        assert _collect(entity_history(_df(spark, rows))) == _ref(rows), trial
