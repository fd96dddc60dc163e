"""Incremental exact-contraction fold (operators/waterfall.py::
incremental_exact_groups): sticky reps, unseen-only kernel set, and
group parity with the one-shot batch plan."""

from __future__ import annotations

from liblevenshtein_spark.operators.waterfall import (
    exact_groups,
    fingerprint_index,
    incremental_exact_groups,
)


def _canon(spark, rows):
    return spark.createDataFrame(rows, "conv_id string, fingerprint string")


def test_incremental_fold_matches_batch_groups(spark):
    batch1 = _canon(spark, [("a1", "X"), ("a2", "X"), ("a3", "Y")])
    batch2 = _canon(spark, [("b1", "X"), ("b2", "Z"), ("b3", "Z"), ("b4", "Y")])

    index = fingerprint_index(batch1)
    map2, new_reps = incremental_exact_groups(index, batch2)

    # sticky reps: b1 (X) and b4 (Y) inherit batch-1 reps verbatim —
    # the old corpus is never re-read, only the (fp, rep) index
    m = {r.conv_id: r.rep for r in map2.collect()}
    assert m["b1"] == "a1" and m["b4"] == "a3"
    # unseen fingerprints get min-new-id reps
    assert m["b2"] == "b2" and m["b3"] == "b2"

    # the kernel set is EXACTLY the unseen fingerprints
    nr = {(r.fingerprint, r.rep) for r in new_reps.collect()}
    assert nr == {("Z", "b2")}

    # group parity with the one-shot plan: normalize sticky reps to the
    # group-min member id and compare against exact_groups over the union
    full = batch1.unionByName(batch2)
    batch_groups = {(r.conv_id, r.rep) for r in exact_groups(full).collect()}
    map1, _ = incremental_exact_groups(index, batch1)
    union_map = map1.unionByName(map2)
    from pyspark.sql import functions as F
    norm = union_map.groupBy("rep").agg(F.min("conv_id").alias("g"))
    inc_groups = {
        (r.conv_id, r.g)
        for r in union_map.join(norm, "rep").select("conv_id", "g").collect()
    }
    assert inc_groups == batch_groups


def test_incremental_fold_empty_index(spark):
    index = _canon(spark, []).selectExpr(
        "fingerprint", "conv_id as rep"
    )
    batch = _canon(spark, [("c1", "W"), ("c2", "W")])
    mapping, new_reps = incremental_exact_groups(index, batch)
    assert {(r.conv_id, r.rep) for r in mapping.collect()} == {("c1", "c1"), ("c2", "c1")}
    assert new_reps.count() == 1
