"""Canonicalization invariant (SURVEY.md §5.2 row 5 / BASELINE.json
input_hint): per-turn text equality under stable (conv_id, turn_idx)
ordering — exploding the canonical turns array must reproduce the source
rows exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from liblevenshtein_spark.config import FINGERPRINT_SEP
from liblevenshtein_spark.operators.canonicalize import canonicalize, turns_roundtrip
from liblevenshtein_spark.sources.tables import TRANSCRIPTS_SCHEMA
from liblevenshtein_spark.testdata_gen import gen_transcript_rows


def _transcripts_df(spark, **kw):
    rows, planted = gen_transcript_rows(**kw)
    return spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA), planted


def test_per_turn_roundtrip(spark):
    df, _ = _transcripts_df(spark, n_base=40, dup_fraction=0.5)
    canon = canonicalize(df)
    back = turns_roundtrip(canon)
    src = df.select("conv_id", "turn_idx", "text")
    # symmetric difference must be empty
    assert back.exceptAll(src).count() == 0
    assert src.exceptAll(back).count() == 0


def test_fingerprint_structure(spark):
    df, _ = _transcripts_df(spark, n_base=20)
    canon = canonicalize(df).collect()
    by_conv = {}
    for r in df.collect():
        by_conv.setdefault(r.conv_id, []).append((r.turn_idx, r.text))
    assert len(canon) == len(by_conv)
    for row in canon:
        turns = [t for _, t in sorted(by_conv[row.conv_id])]
        assert row.turns == turns
        assert row.n_turns == len(turns)
        assert row.fingerprint == FINGERPRINT_SEP.join(turns)
        assert row.fp_len == len(row.fingerprint)


def test_ordering_is_shuffle_invariant(spark):
    """Ordering comes from turn_idx, not arrival order."""
    df, _ = _transcripts_df(spark, n_base=15)
    shuffled = df.orderBy(F.rand(seed=1)).repartition(7)
    a = {(r.conv_id, r.fingerprint) for r in canonicalize(df).collect()}
    b = {(r.conv_id, r.fingerprint) for r in canonicalize(shuffled).collect()}
    assert a == b
