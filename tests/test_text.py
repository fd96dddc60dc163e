"""Text-analysis function tests: token counts, quality metrics, language ID
heuristic, normalized fingerprint."""

from __future__ import annotations

from liblevenshtein_spark.functions.text import (
    lang_id, lang_scores, normalized_fingerprint, quality_columns, token_count, tokens,
)
from pyspark.sql import functions as F


def test_tokens_and_count(spark):
    df = spark.createDataFrame(
        [("a b  c",), ("  leading",), ("",), ("one",)], ["text"]
    )
    got = [ (r.t, r.c) for r in df.select(tokens("text").alias("t"), token_count("text").alias("c")).collect() ]
    assert got[0] == (["a", "b", "c"], 3)
    assert got[1] == (["leading"], 1)
    assert got[2][1] == 0
    assert got[3] == (["one"], 1)


def test_quality_columns(spark):
    df = spark.createDataFrame([("abc 123 def",)], ["text"])
    r = df.select(*quality_columns("text")).collect()[0]
    assert r.n_chars == 11
    assert r.n_tokens == 3
    assert r.alpha_ratio == round(6 / 11, 4)
    assert r.digit_ratio == round(3 / 11, 4)
    assert r.space_ratio == round(2 / 11, 4)
    assert r.mean_token_len == 3.0
    assert 0.0 <= r.quality_score <= 1.0


def test_lang_id(spark):
    rows = [
        ("en", "the cat and the dog of a house that is it"),
        ("de", "der hund und die katze ist nicht mit dem haus"),
        ("fr", "le chien et la maison des arbres est je pas"),
        ("es", "el perro y la casa que en un con por"),
        ("und", "zzz qqq www"),
    ]
    df = spark.createDataFrame(rows, ["expected", "text"])
    out = df.select("expected", *lang_scores("text")).withColumn("pred", lang_id())
    for r in out.collect():
        assert r.pred == r.expected, (r.expected, r)


def test_normalized_fingerprint(spark):
    df = spark.createDataFrame(
        [("Hello, World!",), ("hello world",), ("HELLOWORLD",), ("different",)], ["text"]
    )
    fps = [r.f for r in df.select(normalized_fingerprint("text").alias("f")).collect()]
    assert fps[0] == fps[1] == fps[2]
    assert fps[3] != fps[0]
