"""Storage-layout evidence for the 100 TB story: bucketed tables make
repeated equi-joins shuffle-free, and partitioned writes give the scan
partition pruning. Both claims are asserted against the physical plan
string, not just row counts."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from liblevenshtein_spark.sources.tables import write_bucketed, write_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def no_broadcast(spark):
    """Force a non-broadcast join so the Exchange-elision claim is about
    bucketing, not about the small-table broadcast path."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, tmp_path, no_broadcast):
    left_name = f"bk_left_{uuid.uuid4().hex[:8]}"
    right_name = f"bk_right_{uuid.uuid4().hex[:8]}"
    left = spark.range(0, 1000).select(
        F.col("id").alias("entity_id"), (F.col("id") % 7).alias("a"))
    right = spark.range(0, 1000, 3).select(
        F.col("id").alias("entity_id"), (F.col("id") % 5).alias("b"))
    write_bucketed(left, left_name, 4, ["entity_id"], sort_by=["entity_id"],
                   path=str(tmp_path / "left"))
    write_bucketed(right, right_name, 4, ["entity_id"], sort_by=["entity_id"],
                   path=str(tmp_path / "right"))
    try:
        joined = spark.table(left_name).join(spark.table(right_name), "entity_id")
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert joined.count() == 334  # ids 0,3,...,999
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {left_name}")
        spark.sql(f"DROP TABLE IF EXISTS {right_name}")


def test_unbucketed_join_needs_exchange(spark, tmp_path, no_broadcast):
    """Control: identical data written flat DOES shuffle — the Exchange
    elision above is attributable to the bucketing."""
    left = spark.range(0, 1000).select(
        F.col("id").alias("entity_id"), (F.col("id") % 7).alias("a"))
    right = spark.range(0, 1000, 3).select(
        F.col("id").alias("entity_id"), (F.col("id") % 5).alias("b"))
    write_table(left, str(tmp_path / "l"))
    write_table(right, str(tmp_path / "r"))
    joined = spark.read.parquet(str(tmp_path / "l")).join(
        spark.read.parquet(str(tmp_path / "r")), "entity_id")
    assert "Exchange" in _plan(joined)


def test_partitioned_write_prunes_scan(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"text {i}", ["en", "de", "fr"][i % 3]) for i in range(90)],
        "doc_id long, text string, lang string")
    write_table(docs, str(tmp_path / "docs"), partition_by=["lang"])
    scan = spark.read.parquet(str(tmp_path / "docs")).filter(F.col("lang") == "en")
    plan = _plan(scan)
    # the lang predicate lands in PartitionFilters (metadata pruning), so
    # only the lang=en directory's files are ever opened
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters")[1].split("]")[0]
    assert scan.count() == 30


def test_sorted_within_partition_write_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(f"k{i % 5}", i) for i in range(100)], "block_key string, v long")
    write_table(df, str(tmp_path / "s"), sort_within_by=["block_key"])
    back = spark.read.parquet(str(tmp_path / "s"))
    assert back.count() == 100
    assert back.groupBy("block_key").count().count() == 5
