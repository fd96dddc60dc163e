"""Deterministic corpus sampling, mixing, and sharding for training-data
pipelines. At 100 TB you cannot use `DataFrame.sample` for corpus
construction — it is partition-layout-dependent and unstable across
retries, AQE re-plans, and cluster sizes. These operators key every
decision off the portable 60-bit md5 hash (functions.text.portable_hash64)
of a stable record key, so the same document lands in the same
sample/mixture/shard on every run, any cluster, and in the DuckDB oracle.

All pure DataFrame exprs (zero UDFs, zero shuffles for sample/mix — they
are scan-time filters that Catalyst pushes into the parquet read; shard
rollup is one map-side-combined aggregation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import portable_hash64, token_count

__all__ = ["hash_bucket", "sample_corpus", "mix_corpus", "shard_assign",
           "split_assign"]

BUCKETS = 10_000


def hash_bucket(key: Column | str, salt: str, buckets: int = BUCKETS) -> Column:
    """Stable bucket in [0, buckets): portable_hash64(salt|key) % buckets.
    The hash is 60-bit non-negative, so plain % is sign-safe in both
    engines."""
    key = F.col(key) if isinstance(key, str) else key
    return portable_hash64(F.lit(salt), key.cast("string")) % buckets


def sample_corpus(df: DataFrame, rate: float, key_col: str = "doc_id",
                  salt: str = "sample", buckets: int = BUCKETS) -> DataFrame:
    """Reproducible `rate` sample: keep rows whose hash bucket falls below
    round(rate * buckets). The integer threshold is computed driver-side so
    Spark and any SQL oracle compare identical integers (no float-literal
    drift)."""
    threshold = int(round(rate * buckets))
    return df.filter(hash_bucket(key_col, salt, buckets) < threshold)


def mix_corpus(df: DataFrame, weights: dict[str, float],
               source_col: str = "source", key_col: str = "doc_id",
               salt: str = "mix", buckets: int = BUCKETS) -> DataFrame:
    """Corpus mixing: per-source sampling rates (a source's weight is its
    keep-probability; sources absent from `weights` are dropped). The
    weights ride as a literal map expression — no join, the filter stays a
    scan-time predicate next to the partition columns it would prune on."""
    thresholds = {s: int(round(r * buckets)) for s, r in weights.items()}
    tmap = F.create_map(
        *[F.lit(x) for s, t in sorted(thresholds.items()) for x in (s, t)]
    )
    thr = F.coalesce(tmap[F.col(source_col)], F.lit(0))
    return df.filter(hash_bucket(key_col, salt, buckets) < thr)


def shard_assign(df: DataFrame, n_shards: int, key_col: str = "doc_id",
                 text_col: str = "text", salt: str = "shard") -> DataFrame:
    """Deterministic output sharding + balance rollup: assign each doc a
    shard by hash-mod (balanced in expectation, independent of input
    layout) and report per-shard (n_docs, n_tokens) so imbalance is
    observable before the write fan-out. Returns
    (shard_id, n_docs, n_tokens)."""
    shard = (portable_hash64(F.lit(salt), F.col(key_col).cast("string"))
             % n_shards).cast("int")
    return (
        df.select(shard.alias("shard_id"), token_count(text_col).alias("_tc"))
        .groupBy("shard_id")
        .agg(
            F.count("*").cast("int").alias("n_docs"),
            F.sum("_tc").cast("bigint").alias("n_tokens"),
        )
    )


def split_assign(df: DataFrame, fractions: dict[str, float],
                 group_col: str = "cluster_id", salt: str = "split",
                 buckets: int = BUCKETS) -> DataFrame:
    """Leakage-safe train/val/test assignment: the split bucket is hashed
    from the GROUP id (the entity cluster / near-dup group), not the row
    id, so every member of a group lands in the same split. This is the
    contamination guard a training corpus needs: after linkage or near-dup
    clustering, a vanilla per-document split would put a document in train
    and its near-duplicate in eval; keying the hash off `group_col` makes
    that impossible by construction.

    `fractions` maps split name -> probability in declaration order and
    must sum to 1; thresholds are integer bucket counts computed
    driver-side (same convention as sample_corpus), so Spark and a SQL
    oracle compare identical integers. Pure scan-time expression — no
    shuffle, no UDF; at 100 TB this rides the scan that reads the cluster
    assignment table, and the assignment is stable across reruns, cluster
    sizes, and partition layouts.

    Reference analogue: none — the reference (README.md:13-24) stops at
    transducer matching; this is the training-pipeline consumer of its
    clusters.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    if not fractions:
        raise ValueError("fractions must be non-empty")
    names = list(fractions)
    bucket = hash_bucket(group_col, salt, buckets)
    expr = None
    acc = 0
    for name in names[:-1]:
        acc += int(round(fractions[name] * buckets))
        cond = bucket < acc
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    split = expr.otherwise(names[-1]) if expr is not None else F.lit(names[-1])
    return df.withColumn("split", split)


def stratified_sample(df: DataFrame, strata: list[str], k: int,
                      id_col: str = "doc_id") -> DataFrame:
    """Exactly-k-per-stratum deterministic sample: within each stratum
    (the distinct combination of `strata` columns) keep the k rows with
    the smallest md5(id) — a portable uniform-at-random-but-reproducible
    draw, the standard recipe for balanced eval/holdout sets over skewed
    corpora (a plain Bernoulli sample under- or over-shoots small
    strata; this never does).

    Scale shape: ONE window (partition by strata, order by md5 with the
    id as tiebreak) whose rank<=k filter compiles to WindowGroupLimit —
    per-partition top-k pushed before the shuffle, so the exchange
    carries at most k rows per stratum per input partition, not the
    corpus."""
    from pyspark.sql import Window

    w = Window.partitionBy(*strata).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
