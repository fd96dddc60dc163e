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


def test_exact_pairs_mega_group_guard(spark):
    """The max_group_size guard on exact_pairs (operators/waterfall.py): a
    3,000-replica boilerplate fingerprint would emit C(3000,2) = 4,498,500
    pairs unguarded; with the guard it emits the 2,999 star pairs instead,
    small groups keep their full pair sets verbatim, and downstream
    connected components are byte-identical to the unguarded emission —
    the mega-group stress from VERDICT r04 'What's wrong' #4."""
    from pyspark.sql import functions as F

    from liblevenshtein_spark.operators.clustering import assign_clusters
    from liblevenshtein_spark.operators.waterfall import exact_pairs

    hot = [(f"h{i:05d}", "TEMPLATE") for i in range(3000)]
    cool = [("c1", "A"), ("c2", "A"), ("c3", "A"), ("d1", "B"), ("d2", "B"),
            ("e1", "C")]
    canon = _canon(spark, hot + cool)
    mapping = exact_groups(canon).localCheckpoint(eager=True)

    guarded = exact_pairs(mapping, max_group_size=100).localCheckpoint(eager=True)
    n_guarded = guarded.count()
    # 2,999 star rows for the mega-group + C(3,2) + C(2,2 pick 2) for the
    # small groups = 2999 + 3 + 1
    assert n_guarded == 2999 + 3 + 1

    # small groups: full pair sets, identical to the unguarded emission
    small_ids = {"c1", "c2", "c3", "d1", "d2", "e1"}
    got_small = {(r.id_a, r.id_b) for r in guarded.collect()
                 if r.id_a in small_ids}
    assert got_small == {("c1", "c2"), ("c1", "c3"), ("c2", "c3"),
                         ("d1", "d2")}

    # mega-group rows are exactly the min-member star
    got_hot = {(r.id_a, r.id_b) for r in guarded.collect()
               if r.id_a not in small_ids}
    assert got_hot == {("h00000", f"h{i:05d}") for i in range(1, 3000)}

    # connectivity parity: CC over guarded edges == CC over the full
    # quadratic emission (computed on a 300-member slice to keep the
    # reference side small)
    slice_map = mapping.filter(
        (F.col("conv_id") < "h00300") | F.col("conv_id").rlike("^[cde]"))
    ents = slice_map.select("conv_id")
    full_cc = {tuple(r) for r in assign_clusters(
        ents, exact_pairs(slice_map)).collect()}
    cap_cc = {tuple(r) for r in assign_clusters(
        ents, exact_pairs(slice_map, max_group_size=10)).collect()}
    assert cap_cc == full_cc

    # guard off -> historical quadratic behavior (count only, not collect)
    assert exact_pairs(mapping).count() == 3000 * 2999 // 2 + 4
