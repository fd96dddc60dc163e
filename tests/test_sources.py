"""Interchange-format connector tests (sources/tables.py): JSON and CSV
transcript roundtrips must preserve every row/column under the enforced
canonical schema, including hostile text (quotes, commas, newlines,
unicode, the \\x1e fingerprint separator)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row

from liblevenshtein_spark.sources.tables import (
    TRANSCRIPTS_SCHEMA, read_transcripts, write_transcripts,
)

HOSTILE = [
    Row(conv_id="c1", turn_idx=0, role="user",
        text='plain text', tool="", ts=None),
    Row(conv_id="c1", turn_idx=1, role="assistant",
        text='has "quotes", commas, and a\nnewline', tool="search",
        ts=datetime.datetime(2024, 3, 1, 12, 0, 0)),
    Row(conv_id="c2", turn_idx=0, role="user",
        text="unicode éß中文 and sep \x1e here", tool=None, ts=None),
    Row(conv_id="c3", turn_idx=0, role="tool",
        text=None, tool="exec", ts=None),
]


def _assert_same(df_a, df_b):
    rows_a = sorted(df_a.collect(), key=lambda r: (r.conv_id, r.turn_idx))
    rows_b = sorted(df_b.collect(), key=lambda r: (r.conv_id, r.turn_idx))
    assert rows_a == rows_b


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_transcripts_roundtrip(spark, tmp_path, fmt):
    df = spark.createDataFrame(HOSTILE, TRANSCRIPTS_SCHEMA)
    path = str(tmp_path / f"t_{fmt}")
    write_transcripts(df, path, fmt=fmt)
    back = read_transcripts(spark, path, fmt=fmt)
    # nullability is advisory on read paths; names + types must match exactly
    assert [(f.name, f.dataType) for f in back.schema.fields] == \
        [(f.name, f.dataType) for f in TRANSCRIPTS_SCHEMA.fields]
    # JSON/CSV cannot distinguish null text from absent; both read to null
    _assert_same(df, back)


def test_unknown_format_raises(spark, tmp_path):
    df = spark.createDataFrame(HOSTILE, TRANSCRIPTS_SCHEMA)
    with pytest.raises(ValueError):
        write_transcripts(df, str(tmp_path / "x"), fmt="avro")
    with pytest.raises(ValueError):
        read_transcripts(spark, str(tmp_path / "x"), fmt="avro")
