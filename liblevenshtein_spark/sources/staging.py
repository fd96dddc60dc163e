"""Staged-commit append protocol for persisted incremental state.

Every incremental path in the engine folds micro-batches into append-only
parquet state dirs: the compiled-dictionary blocking keys + entity texts +
match sink (streaming/incremental._link_batch), the waterfall fingerprint
index + mapping sink (_waterfall_batch), and any user-persisted index the
same shape (e.g. an LSH band-key index for ann.incremental_lsh_pairs).
Spark's own FileOutputCommitter append is NOT all-or-nothing at the job
level: a job killed during commit can expose a SUBSET of the batch's task
files, so readers observe a torn batch. Each sink used to carry its own
replay argument for that window; the LLD1 binary dictionary writer
(sources/dictionary_io.py:156) got a real stage-then-commit protocol in
round 4, and this module unifies the remaining appends behind one helper
with the same contract.

Protocol (single-writer per state dir, like compact_state):
  1. sweep `.stage_*` dirs orphaned by a previous crash — readers never saw
     them (dot-prefixed paths are invisible to Spark and DuckDB parquet
     listings), so sweeping is always safe;
  2. write the batch to a fresh dot-prefixed staging dir INSIDE the target
     (same filesystem, so the publish renames below cannot cross devices);
  3. publish by os.replace-ing the staged part files to token-unique names
     in the target dir. With ``single_file=True`` (default) the batch is
     coalesced to ONE part file and the publish is ONE rename — atomic on
     any POSIX filesystem, so a kill at ANY point leaves the prior state
     byte-identical or the batch fully committed, never a torn batch.

With ``single_file=False`` (for batches too large to funnel through one
task) the publish is a sequence of atomic per-file renames: a kill
mid-publish leaves a PREFIX of fully-formed files — no torn parquet, but
the batch may be partially visible; callers on this path must keep a
replay-convergence argument (the existing sinks all have one: matches /
mapping dedup on read, dict_keys dedup via compact_state, fp_index
left-anti on fold).

At cluster scale this role is played by an Iceberg snapshot commit (an
all-or-nothing metadata swap with the same two guarantees); this helper is
the local-parquet stand-in with the same contract, kept behind one function
so swapping the table format touches one module.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame

__all__ = ["staged_append"]


def staged_append(df: DataFrame, path: str, single_file: bool = True) -> None:
    """Append ``df`` to the parquet state dir ``path`` all-or-nothing (see
    module docstring for the protocol and the single_file=False caveat)."""
    os.makedirs(path, exist_ok=True)
    for name in os.listdir(path):
        if name.startswith(".stage_"):
            shutil.rmtree(os.path.join(path, name), ignore_errors=True)
    token = uuid.uuid4().hex
    stage = os.path.join(path, f".stage_{token}")
    (df.coalesce(1) if single_file else df).write.mode("overwrite").parquet(stage)
    parts = sorted(
        name for name in os.listdir(stage)
        if name.startswith("part-") and not name.endswith(".crc")
    )
    for i, name in enumerate(parts):
        ext = name[name.index("."):] if "." in name else ".parquet"
        os.replace(
            os.path.join(stage, name),
            os.path.join(path, f"part-{token}-{i:05d}{ext}"),
        )
    shutil.rmtree(stage, ignore_errors=True)
