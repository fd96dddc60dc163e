"""applyInPandasWithState conversation reassembly: turn events arriving out
of order and split across micro-batches must assemble into exactly the
canonical records the batch canonicalize produces, flushed by event-time
timeout."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from liblevenshtein_spark.config import FINGERPRINT_SEP
from liblevenshtein_spark.operators.canonicalize import canonicalize
from liblevenshtein_spark.sources.tables import TRANSCRIPTS_SCHEMA
from liblevenshtein_spark.streaming.stateful import assemble_conversations

EPOCH = dt.datetime(2024, 1, 1, 10, 0, 0)


def _turn(conv, idx, text, minute):
    return (conv, idx, "user", text, "", EPOCH + dt.timedelta(minutes=minute))


def test_reassembly_across_batches_equals_batch_canonicalize(spark, tmp_path):
    # conv_a's turns are split across the two files and arrive out of order;
    # the late flush row pushes the final watermark far past every timeout
    file1 = [
        _turn("conv_a", 2, "gamma", 1),
        _turn("conv_a", 0, "alpha", 1),
        _turn("conv_b", 0, "solo", 2),
    ]
    file2 = [
        _turn("conv_a", 1, "beta", 3),
        _turn("conv_c", 0, "x", 4),
        _turn("conv_c", 1, "y", 4),
        ("flush", 0, "user", "zzz", "", EPOCH + dt.timedelta(hours=6)),
    ]
    src = str(tmp_path / "src")
    for rows in (file1, file2):
        (spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA)
         .coalesce(1).write.mode("append").parquet(src))

    stream = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    assembled = assemble_conversations(stream, watermark_delay="2 minutes", gap_ms=60_000)
    q = (
        assembled.writeStream.format("memory").queryName("assembled")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=600)

    got = {
        (r.conv_id, r.n_turns, r.fingerprint)
        for r in spark.sql("SELECT * FROM assembled").collect()
    }
    all_rows = spark.createDataFrame(file1 + file2, TRANSCRIPTS_SCHEMA)
    want = {
        (r.conv_id, r.n_turns, r.fingerprint)
        for r in canonicalize(all_rows, FINGERPRINT_SEP)
        .select("conv_id", "n_turns", "fingerprint")
        .filter(F.col("conv_id") != "flush")  # flush row's own conv never times out
        .collect()
    }
    assert got == want
    assert ("conv_a", 3, FINGERPRINT_SEP.join(["alpha", "beta", "gamma"])) in got
