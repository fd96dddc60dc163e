"""Deterministic sampling/mixing/sharding tests: reproducibility across
partition layouts (the property DataFrame.sample lacks), rate accuracy,
zero-weight drop, and shard rollup conservation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from liblevenshtein_spark.operators.sampling import (
    mix_corpus,
    sample_corpus,
    shard_assign,
    split_assign,
)


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 4).cast("string")).alias("source"),
        F.concat_ws(" ", F.lit("w"), F.col("id").cast("string"), F.lit("x y")).alias("text"),
    )


def test_sample_deterministic_across_layouts(spark):
    docs = _docs(spark)
    ids1 = sorted(r.doc_id for r in sample_corpus(docs, 0.3).select("doc_id").collect())
    ids2 = sorted(
        r.doc_id
        for r in sample_corpus(docs.repartition(7, "source"), 0.3)
        .select("doc_id").collect()
    )
    assert ids1 == ids2 and len(ids1) > 0


def test_sample_rate_roughly_holds(spark):
    docs = _docs(spark, 1000)
    kept = sample_corpus(docs, 0.25).count()
    assert 180 <= kept <= 320          # binomial(1000, .25) well within 5 sigma


def test_sample_edge_rates(spark):
    docs = _docs(spark, 50)
    assert sample_corpus(docs, 0.0).count() == 0
    assert sample_corpus(docs, 1.0).count() == 50


def test_mix_weights_and_zero_drop(spark):
    docs = _docs(spark, 800)           # 200 docs per src0..src3
    out = mix_corpus(docs, {"src0": 1.0, "src1": 0.5, "src2": 0.0})
    per = {r.source: r.c for r in out.groupBy("source").agg(F.count("*").alias("c")).collect()}
    assert per.get("src0") == 200                  # rate 1.0 keeps all
    assert 60 <= per.get("src1", 0) <= 140         # rate 0.5 of 200
    assert "src2" not in per                       # explicit zero
    assert "src3" not in per                       # absent from weights


def test_mix_subset_of_full_sample_semantics(spark):
    # a doc kept at rate r is also kept at any higher rate (nested samples:
    # thresholds grow monotonically on the same bucket value)
    docs = _docs(spark, 500)
    low = {r.doc_id for r in mix_corpus(docs, {"src0": 0.2}).select("doc_id").collect()}
    high = {r.doc_id for r in mix_corpus(docs, {"src0": 0.6}).select("doc_id").collect()}
    assert low <= high


def test_shard_assign_conserves_totals(spark):
    docs = _docs(spark, 300)
    shards = shard_assign(docs, 4).collect()
    assert sorted(r.shard_id for r in shards) == sorted({r.shard_id for r in shards})
    assert set(r.shard_id for r in shards) <= {0, 1, 2, 3}
    assert sum(r.n_docs for r in shards) == 300
    assert sum(r.n_tokens for r in shards) == 300 * 4   # every doc has 4 tokens
    # balanced in expectation: no shard should hold more than half the corpus
    assert max(r.n_docs for r in shards) < 150


def test_split_assign_no_group_straddles_splits(spark):
    # 120 entities in 40 clusters of 3: every cluster must land whole
    rows = [(f"e{i:04d}", f"c{i % 40:03d}") for i in range(120)]
    df = spark.createDataFrame(rows, "entity_id string, cluster_id string")
    out = split_assign(df, {"train": 0.8, "val": 0.1, "test": 0.1})
    per_cluster = (out.groupBy("cluster_id")
                   .agg(F.countDistinct("split").alias("n"))
                   .collect())
    assert all(r.n == 1 for r in per_cluster)
    splits = {r.split for r in out.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"}
    assert out.count() == 120


def test_split_assign_fractions_roughly_hold(spark):
    rows = [(f"e{i}", f"c{i}") for i in range(2000)]   # singleton clusters
    df = spark.createDataFrame(rows, "entity_id string, cluster_id string")
    out = split_assign(df, {"train": 0.8, "val": 0.1, "test": 0.1})
    per = {r.split: r.c for r in out.groupBy("split").agg(F.count("*").alias("c")).collect()}
    assert 1480 <= per["train"] <= 1720       # binomial(2000, .8) +- 5 sigma
    assert 100 <= per["val"] <= 320
    assert 100 <= per["test"] <= 320


def test_split_assign_deterministic_across_layouts(spark):
    rows = [(f"e{i}", f"c{i % 7}") for i in range(100)]
    df = spark.createDataFrame(rows, "entity_id string, cluster_id string")
    a = {(r.entity_id, r.split) for r in
         split_assign(df.repartition(1), {"train": 0.5, "val": 0.5}).collect()}
    b = {(r.entity_id, r.split) for r in
         split_assign(df.repartition(16), {"train": 0.5, "val": 0.5}).collect()}
    assert a == b


def test_split_assign_rejects_bad_fractions(spark):
    df = spark.createDataFrame([("e", "c")], "entity_id string, cluster_id string")
    with pytest.raises(ValueError):
        split_assign(df, {"train": 0.8, "val": 0.1})
