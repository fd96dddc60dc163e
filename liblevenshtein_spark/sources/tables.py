"""Table IO — the engine's source/sink layer.

Production target is Iceberg (BASELINE.json input_hint); this sandbox has no
Iceberg jar or network, so the format is abstracted behind read_table /
write_table with an identical-schema partitioned-parquet fallback
(SURVEY.md §7.2). Everything above this module is format-agnostic.

The compiled-dictionary role of the reference's DAWG serialization
(liblevenshtein's ProtobufSerializer / BytecodeSerializer — persist the
built automaton, reload without re-sorting) is played here by persisting the
blocking-keyed entity table sorted within partitions: parquet dictionary +
RLE encoding supplies the prefix-compression, partition + min/max metadata
supplies the pruning."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

TESTDATA_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Read an Iceberg-shaped table (parquet in-sandbox)."""
    return spark.read.parquet(path)


def load_testdata(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown testdata table {name!r}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def write_table(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    sort_within_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Partitioned, sorted-within-partition parquet write (Iceberg-shaped).

    Sorting within partitions maximizes parquet RLE/dictionary compression on
    key columns — the DAWG-prefix-sharing analogue (SURVEY.md §4.1)."""
    if sort_within_by:
        df = df.sortWithinPartitions(*sort_within_by)
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    n_buckets: int,
    bucket_by: list[str],
    sort_by: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (hash-clustered) table write — the parquet stand-in for
    Iceberg's `bucket(N, col)` partition transform.

    Why it matters at 100 TB: a self-join or repeated join on the bucket key
    (the pipeline's candidate-pairs equi-join on block_key, or any entity-id
    join against a bucketed dictionary) reads co-located buckets and skips
    the shuffle entirely — Catalyst plans a sort-merge join with NO Exchange
    on either side (proved in tests/test_storage.py by asserting the
    physical plan is Exchange-free). Amortized once at write time instead of
    per-query; `sort_by` additionally pre-sorts bucket files so single-file
    buckets skip the Sort too."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table_name)


def write_dictionary(df: DataFrame, path: str, key_col: str = "block_key") -> None:
    """Persist the 'compiled dictionary' (entity table with blocking keys) —
    the Spark-native A1+A5 of SURVEY.md §2.2."""
    write_table(df, path, sort_within_by=[key_col])


def read_dictionary(spark: SparkSession, path: str) -> DataFrame:
    return read_table(spark, path)


# ---------------------------------------------------------------------------
# Interchange formats (JSON lines / CSV) — schema-enforced readers/writers
# ---------------------------------------------------------------------------

def write_transcripts(df: DataFrame, path: str, fmt: str = "parquet",
                      mode: str = "overwrite") -> None:
    """Write a transcripts-shaped frame in an interchange format. CSV quotes
    embedded separators/newlines (multiLine on read restores them)."""
    w = df.select(*TRANSCRIPTS_SCHEMA.fieldNames()).write.mode(mode)
    if fmt == "parquet":
        w.parquet(path)
    elif fmt == "orc":
        w.orc(path)
    elif fmt == "json":
        w.json(path)
    elif fmt == "csv":
        # explicit null sentinel: CSV's default writes null and '' both as
        # empty, destroying the distinction on roundtrip
        w.options(header=True, escape='"', nullValue="\\N").csv(path)
    else:
        raise ValueError(f"unsupported transcripts format {fmt!r}")


def read_transcripts(spark: SparkSession, path: str,
                     fmt: str = "parquet") -> DataFrame:
    """Read transcripts with the canonical schema ENFORCED (never inferred:
    schema inference is a full extra pass at 100 TB and can drift types
    between shards)."""
    r = spark.read.schema(TRANSCRIPTS_SCHEMA)
    if fmt == "parquet":
        return r.parquet(path)
    if fmt == "orc":
        return r.orc(path)
    if fmt == "json":
        return r.json(path)
    if fmt == "csv":
        return r.options(header=True, escape='"', multiLine=True,
                         nullValue="\\N", emptyValue="").csv(path)
    raise ValueError(f"unsupported transcripts format {fmt!r}")
