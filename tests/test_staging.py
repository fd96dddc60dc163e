"""Staged-commit append protocol (sources/staging.py): a kill at ANY point
during an append leaves the prior state byte-intact or the batch fully
committed — never a torn batch — and replaying the killed batch converges.
Unifies the crash-tolerance story across the streaming state dirs
(dict_keys/entities/matches/mapping/fp_index all append through this) the
way round 4's LLD1 writer did for binary dictionaries."""

from __future__ import annotations

import os

import pytest

from liblevenshtein_spark.sources import staging
from liblevenshtein_spark.sources.staging import staged_append


def _rows(spark, ids):
    return spark.createDataFrame([(i, f"v{i}") for i in ids], "id int, v string")


def _read_ids(spark, path):
    try:
        return sorted(r.id for r in spark.read.parquet(path).collect())
    except Exception:
        return None  # unreadable == no committed state


def test_staged_append_accumulates_and_cleans(spark, tmp_path):
    path = str(tmp_path / "state")
    staged_append(_rows(spark, [1, 2]), path)
    staged_append(_rows(spark, [3]), path)
    assert _read_ids(spark, path) == [1, 2, 3]
    assert not [n for n in os.listdir(path) if n.startswith(".stage_")]


@pytest.mark.parametrize("prior", [[], [1, 2]])
def test_killed_append_prior_intact_replay_converges(spark, tmp_path,
                                                     monkeypatch, prior):
    """Kill the append at the publish rename (the single atomic commit
    point, single_file=True): the prior index must read back byte-intact —
    including the empty-dir case, where the state dir holds ONLY the
    orphaned staging dir and readers must see 'no committed state', not an
    error mistaken for data. Replaying the same batch then converges to
    exactly prior + batch, with the orphaned staging dir swept."""
    path = str(tmp_path / "state")
    if prior:
        staged_append(_rows(spark, prior), path)

    real_replace = os.replace

    def killed_replace(src, dst):
        if "/.stage_" in src:
            raise RuntimeError("injected kill before publish rename")
        return real_replace(src, dst)

    monkeypatch.setattr(staging.os, "replace", killed_replace)
    with pytest.raises(RuntimeError, match="injected kill"):
        staged_append(_rows(spark, [7, 8]), path)
    monkeypatch.setattr(staging.os, "replace", real_replace)

    # prior state is byte-intact; the staged batch is invisible to readers
    assert _read_ids(spark, path) == (sorted(prior) if prior else None)
    assert [n for n in os.listdir(path) if n.startswith(".stage_")]

    # replay converges: exactly prior + batch, no duplicates, stage swept
    staged_append(_rows(spark, [7, 8]), path)
    assert _read_ids(spark, path) == sorted(prior + [7, 8])
    assert not [n for n in os.listdir(path) if n.startswith(".stage_")]
