"""Distributed global rank + sorted-neighborhood blocking
(operators/ranking.py): the range-partition + offset rank must equal a
single-partition row_number under the same total order, and the window
join must emit exactly the rank-adjacent pairs."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from liblevenshtein_spark.operators.ranking import (
    global_rank, sorted_neighborhood_pairs,
)


def test_global_rank_matches_window(spark):
    rng = random.Random(7)
    rows = [(f"id{i:04d}", "".join(rng.choice("abc") for _ in range(3)))
            for i in range(500)]
    df = spark.createDataFrame(rows, "conv_id string, key string").repartition(7)
    got = global_rank(df, ["key", "conv_id"]).select("conv_id", "rank")
    want = df.select(
        "conv_id",
        F.row_number().over(Window.orderBy("key", "conv_id")).cast("bigint").alias("rank"),
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    # contiguous 1..n
    mm = got.agg(F.min("rank"), F.max("rank"), F.countDistinct("rank")).collect()[0]
    assert tuple(mm) == (1, 500, 500)


def test_sorted_neighborhood_window(spark):
    df = spark.createDataFrame(
        [(f"e{i}", chr(ord("a") + i)) for i in range(6)],
        "conv_id string, key string",
    ).repartition(3)
    pairs = sorted_neighborhood_pairs(df, "key", window=3)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    want = {(f"e{i}", f"e{j}") for i in range(6) for j in range(i + 1, min(i + 3, 6))}
    assert got == want
    # skew immunity: all-identical keys still emit only window pairs
    skew = spark.createDataFrame(
        [(f"e{i}", "same") for i in range(50)], "conv_id string, key string"
    )
    assert sorted_neighborhood_pairs(skew, "key", window=4).count() == 50 * 3 - (1 + 2 + 3)
