"""P9 — per-partition checkpoint ledger (SURVEY.md §2.4): scoring runs in
bucketed waves; each completed bucket writes its scored pairs partitioned by
bucket id plus a ledger row with lineage + candidate-count/score metrics, so
a killed job resumes by anti-joining completed buckets and never rescores
them (BASELINE.json north_star: "a killed job resumes without rescoring
completed blocks").

Bucket = pmod(xxhash64(id_a, id_b), n_buckets): deterministic in the pair,
independent of physical partitioning, so resume is stable across cluster
sizes. In production the scored table is an Iceberg partitioned table and
the ledger its audit side-table; here both are partitioned parquet with
identical schemas (SURVEY.md §7.2).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import LinkConfig
from .scoring import match_filter, score_pairs

__all__ = ["bucketed", "completed_buckets", "pending_pairs", "run_scored_waves", "read_scored"]

LEDGER_SUBDIR = "_ledger"
SCORED_SUBDIR = "scored"


def bucketed(pairs: DataFrame, n_buckets: int, portable: bool = False) -> DataFrame:
    """Assign each pair its checkpoint bucket. Default is xxhash64 (fastest,
    JVM-side). `portable=True` swaps in the portable 60-bit md5 hash
    (functions.text.portable_hash64) so an external engine — a SQL audit of
    the ledger, a non-Spark resume tool — can recompute bucket membership
    bit-for-bit; same determinism/stability properties, slightly more CPU."""
    if portable:
        from ..functions.text import portable_hash64

        h = portable_hash64("id_a", "id_b")
    else:
        h = F.xxhash64("id_a", "id_b")
    return pairs.withColumn("bucket", F.pmod(h, F.lit(n_buckets)).cast("int"))


def _ledger_path(out_dir: str) -> str:
    return os.path.join(out_dir, LEDGER_SUBDIR)


def _scored_path(out_dir: str) -> str:
    return os.path.join(out_dir, SCORED_SUBDIR)


def completed_buckets(spark: SparkSession, out_dir: str) -> DataFrame:
    """Ledger rows of completed buckets (empty DataFrame if no ledger yet)."""
    path = _ledger_path(out_dir)
    try:
        return spark.read.parquet(path)
    except Exception:
        return spark.createDataFrame(
            [],
            "bucket int, n_pairs long, n_matches long, wave int, completed_at double, algorithm string, max_distance int",
        )


def pending_pairs(spark: SparkSession, pairs_b: DataFrame, out_dir: str) -> DataFrame:
    """Anti-join the bucketed pair set against the completed-bucket ledger —
    the resume path (SURVEY.md §3.2 step 5)."""
    done = completed_buckets(spark, out_dir).select("bucket")
    return pairs_b.join(F.broadcast(done), "bucket", "left_anti")


def run_scored_waves(
    spark: SparkSession,
    pairs: DataFrame,
    entities: DataFrame,
    conf: LinkConfig,
    out_dir: str,
    waves: int = 8,
    fail_after_waves: int | None = None,
    id_col: str = "conv_id",
    text_col: str = "fingerprint",
    portable_buckets: bool = False,
) -> DataFrame:
    """Score all candidate pairs in `waves` checkpointed waves; return the
    full scored DataFrame read back from the sink.

    Buckets are grouped into waves (bucket % waves); each wave scores only
    buckets absent from the ledger. `fail_after_waves` injects a crash for
    the resume test."""
    n_buckets = conf.checkpoint_buckets
    pairs_b = bucketed(pairs, n_buckets, portable=portable_buckets)
    todo = pending_pairs(spark, pairs_b, out_dir)
    already_done = {
        r.bucket for r in completed_buckets(spark, out_dir).select("bucket").collect()
    }
    done_waves = 0
    for wave in range(waves):
        wave_pairs = todo.filter(F.pmod(F.col("bucket"), F.lit(waves)) == wave)
        # `bucket` rides through the mapInArrow kernel as a passthrough
        # column, so no join-back against pairs_b is needed.
        scored = score_pairs(
            wave_pairs, entities, conf, id_col=id_col, text_col=text_col
        )
        scored.write.mode("append").partitionBy("bucket").parquet(_scored_path(out_dir))

        stats = (
            scored.groupBy("bucket")
            .agg(
                F.count("*").alias("n_pairs"),
                F.sum((F.col("distance") <= conf.max_distance).cast("long")).alias("n_matches"),
            )
            .withColumn("wave", F.lit(wave))
            .withColumn("completed_at", F.lit(time.time()))
            .withColumn("algorithm", F.lit(conf.algorithm))
            .withColumn("max_distance", F.lit(conf.max_distance))
        )
        # Buckets with zero pending pairs still complete (ledger row with 0s)
        # so resume does not re-plan them.
        wave_bucket_ids = [
            b for b in range(n_buckets) if b % waves == wave and b not in already_done
        ]
        if not wave_bucket_ids:
            done_waves += 1
            continue
        all_wave_buckets = spark.createDataFrame(
            [(b, wave) for b in wave_bucket_ids], "bucket int, wave int"
        )
        stats = (
            all_wave_buckets.join(stats.drop("wave"), "bucket", "left")
            .fillna({"n_pairs": 0, "n_matches": 0})
            .fillna({"completed_at": time.time(), "algorithm": conf.algorithm})
            .fillna({"max_distance": conf.max_distance})
        )
        stats.write.mode("append").parquet(_ledger_path(out_dir))
        done_waves += 1
        if fail_after_waves is not None and done_waves >= fail_after_waves:
            raise RuntimeError(f"injected failure after wave {wave}")
    return read_scored(spark, out_dir)


def read_scored(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(_scored_path(out_dir)).select(
        "id_a", "id_b", "distance", "bucket"
    )


def matches_from_sink(spark: SparkSession, out_dir: str, conf: LinkConfig) -> DataFrame:
    return match_filter(read_scored(spark, out_dir), conf)
