"""Distributed global ranking and sorted-neighborhood blocking.

Sorted neighborhood (Hernandez & Stolfo 1995) is the third classic
blocking family beside key-equality joins and LSH: sort all entities by a
key, slide a fixed window of width w down the sorted order, and emit every
pair inside the window. It bounds candidates at n*(w-1) regardless of key
skew — a hot key that would explode an equi-join contributes only its
window-adjacent pairs — at the price of missing pairs whose keys sort far
apart (so production runs union several passes with different keys).

The global rank itself is computed the way a 1000-executor job has to:
range-repartition on the sort key, sort within partitions, count rows per
partition (one tiny job: #partitions rows), broadcast the cumulative
offsets, and add a PARTITION-LOCAL row_number — no single-partition global
window ever materializes. Rank values depend only on the total order
(ties broken by the unique id), not on where Spark draws partition
boundaries, so the result is deterministic even though
repartitionByRange samples its boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["global_rank", "sorted_neighborhood_pairs"]


def global_rank(df: DataFrame, order_cols: list[str], rank_col: str = "rank",
                num_partitions: int | None = None) -> DataFrame:
    """Append a contiguous 1-based global rank under ORDER BY order_cols.

    `order_cols` must be a strict total order (include a unique id as the
    last column) — otherwise ranks are nondeterministic. Two passes over
    the data (partition counts, then local row_number + broadcast offset);
    the only driver-side state is one row per partition."""
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    cols = [F.col(c) for c in order_cols]
    ranged = df.repartitionByRange(parts, *cols).sortWithinPartitions(*cols)
    # pin the row->partition assignment: the counts job and the rank job
    # must read the SAME materialized partitioning, not two recomputations
    with_pid = ranged.withColumn("_pid", F.spark_partition_id()).localCheckpoint(eager=True)
    sizes = sorted(
        (r["_pid"], r["n"])
        for r in with_pid.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    )
    offsets, acc = {}, 0
    for pid, n in sizes:
        offsets[pid] = acc
        acc += n
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid int, _off long"
    )
    local = Window.partitionBy("_pid").orderBy(*cols)
    return (
        with_pid.join(F.broadcast(off_df), "_pid")
        .withColumn(rank_col, (F.row_number().over(local) + F.col("_off")).cast("bigint"))
        .drop("_pid", "_off")
    )


def sorted_neighborhood_pairs(entities: DataFrame, key_col: str,
                              window: int, id_col: str = "conv_id") -> DataFrame:
    """Candidate pairs from a sorted-neighborhood pass: entities sorted by
    (key_col, id_col), every pair within `window` positions emitted as
    (id_a, id_b) with id_a the lower-ranked entity. Candidate volume is
    exactly max(0, n*(window-1) - C(window-1+1, 2))-ish — linear in n,
    immune to key skew. The window join is an EQUI-join on target rank
    (each row explodes to window-1 probe ranks), so it distributes like
    any key join."""
    ranked = global_rank(
        entities.select(id_col, key_col), [key_col, id_col]
    ).select(id_col, "rank")
    probes = ranked.select(
        F.col(id_col).alias("id_a"),
        F.explode(
            F.array(*[F.col("rank") + F.lit(j) for j in range(1, window)])
        ).alias("rank"),
    )
    right = ranked.select(F.col(id_col).alias("id_b"), "rank")
    return probes.join(right, "rank").select("id_a", "id_b")
