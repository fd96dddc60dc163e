"""Checkpoint/resume test (SURVEY.md §5.2 row 7): kill after k waves ->
rerun -> identical final output, and completed buckets are not rescored
(ledger row counts prove it)."""

from __future__ import annotations

import pytest

from liblevenshtein_spark.config import LinkConfig
from liblevenshtein_spark.operators.candidates import block_keys, candidate_pairs
from liblevenshtein_spark.operators.canonicalize import canonicalize
from liblevenshtein_spark.operators import ledger
from liblevenshtein_spark.sources.tables import TRANSCRIPTS_SCHEMA
from liblevenshtein_spark.testdata_gen import gen_transcript_rows


@pytest.fixture()
def linkage_inputs(spark):
    rows, _ = gen_transcript_rows(n_base=30, dup_fraction=0.6, max_edits=2)
    df = spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA)
    conf = LinkConfig(algorithm="standard", max_distance=2, checkpoint_buckets=16)
    canonical = canonicalize(df)
    build, probe = block_keys(canonical, conf)
    pairs = candidate_pairs(build, probe, conf).localCheckpoint(eager=True)
    return canonical, pairs, conf


def _scored_set(df):
    return {(r.id_a, r.id_b, r.distance) for r in df.collect()}


def test_kill_and_resume_identical(spark, linkage_inputs, tmp_path):
    canonical, pairs, conf = linkage_inputs

    full_dir = str(tmp_path / "full")
    full = ledger.run_scored_waves(spark, pairs, canonical, conf, full_dir, waves=4)
    want = _scored_set(full)
    assert want, "fixture must produce scored pairs"

    crash_dir = str(tmp_path / "crash")
    with pytest.raises(RuntimeError, match="injected failure"):
        ledger.run_scored_waves(
            spark, pairs, canonical, conf, crash_dir, waves=4, fail_after_waves=2
        )
    done_before = {r.bucket for r in ledger.completed_buckets(spark, crash_dir).collect()}
    assert 0 < len(done_before) < conf.checkpoint_buckets

    resumed = ledger.run_scored_waves(spark, pairs, canonical, conf, crash_dir, waves=4)
    assert _scored_set(resumed) == want

    # no bucket appears twice in the ledger -> nothing was rescored
    led = ledger.completed_buckets(spark, crash_dir)
    assert led.count() == conf.checkpoint_buckets
    assert led.select("bucket").distinct().count() == conf.checkpoint_buckets
    # the buckets finished before the crash kept their original wave stamp
    waves_by_bucket = {r.bucket: r.wave for r in led.collect()}
    for b in done_before:
        assert waves_by_bucket[b] in (0, 1)


def test_ledger_metrics_lineage(spark, linkage_inputs, tmp_path):
    canonical, pairs, conf = linkage_inputs
    out = str(tmp_path / "m")
    ledger.run_scored_waves(spark, pairs, canonical, conf, out, waves=2)
    led = ledger.completed_buckets(spark, out)
    rows = led.collect()
    assert {r.algorithm for r in rows} == {"standard"}
    assert {r.max_distance for r in rows} == {2}
    total_pairs = sum(r.n_pairs for r in rows)
    assert total_pairs == pairs.count()
    total_matches = sum(r.n_matches for r in rows)
    scored = ledger.read_scored(spark, out)
    assert total_matches == scored.filter("distance <= 2").count()
