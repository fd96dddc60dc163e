"""Dictionary serialization formats (reference A5, SURVEY.md §2.2).

liblevenshtein persists its compiled DAWG through pluggable serializers
(plain-text term list / protobuf / bytecode). The Spark-native engine has
three equivalents:

* **plain text** — one term per line, globally sorted: the interchange
  format (the reference's PlainTextSerializer reads exactly this, and its
  Daciuk-style DAWG builder requires sorted input). `write_terms_text`
  produces range-partitioned, sorted-within-partition part files whose
  lexicographic concatenation is globally sorted.
* **compiled parquet** — the (candidate, block_key) table written by
  `sources.tables.write_dictionary`: the reloadable 'compiled automaton'
  (avoids recomputing keys across query batches).
* **LLD1 binary** — `write_terms_binary` / `read_terms_binary`: a compact
  front-coded binary term list, the analogue of the reference's
  protobuf/bytecode serializers `[PK] serialization/`. Terms are globally
  range-sorted; each partition emits one self-describing block file
  (magic + varint count + [varint shared-prefix-len, varint suffix-len,
  UTF-8 suffix] records + CRC32), so adjacent-term prefix sharing — the
  same redundancy a DAWG exploits on its paths — is captured on disk
  without any single-node build step. Filename order (part-00000…)
  preserves the global sort, mirroring the text format's contract.
"""

from __future__ import annotations

import os
import struct
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "write_terms_text",
    "read_terms_text",
    "write_terms_binary",
    "read_terms_binary",
]


def write_terms_text(terms: DataFrame, path: str, term_col: str = "term",
                     num_files: int | None = None) -> None:
    """Persist distinct terms as a sorted plain-text dictionary.

    repartitionByRange + sortWithinPartitions gives a global sort without
    funnelling everything through one task; part files are written in range
    order so the concatenation in filename order stays sorted."""
    out = terms.select(F.col(term_col).alias("value")).distinct()
    out = (
        out.repartitionByRange(num_files, "value")
        if num_files is not None
        else out.repartitionByRange("value")
    )
    out.sortWithinPartitions("value").write.mode("overwrite").text(path)


def read_terms_text(spark: SparkSession, path: str, term_col: str = "term") -> DataFrame:
    """Load a plain-text dictionary (one term per line, blank lines
    dropped) — accepts both our own output and hand-maintained word lists."""
    return (
        spark.read.text(path)
        .select(F.col("value").alias(term_col))
        .filter(F.col(term_col) != "")
    )


# ---------------------------------------------------------------------------
# LLD1 binary format (front-coded varint blocks)
# ---------------------------------------------------------------------------

_LLD_MAGIC = b"LLD1"
_LLD_VERSION = 1


def _varint(n: int) -> bytes:
    """Unsigned LEB128."""
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    n = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7


def _encode_block(terms: list[str]) -> bytes:
    """Front-coded block: header (magic, version, varint term count), then
    per term varint(shared UTF-8 prefix with the previous term) +
    varint(suffix byte length) + suffix bytes; CRC32 of everything after
    the magic as a little-endian u32 trailer."""
    body = bytearray()
    body.append(_LLD_VERSION)
    body += _varint(len(terms))
    prev = b""
    for t in terms:
        enc = t.encode("utf-8")
        p = 0
        lim = min(len(prev), len(enc))
        while p < lim and prev[p] == enc[p]:
            p += 1
        body += _varint(p)
        suffix = enc[p:]
        body += _varint(len(suffix))
        body += suffix
        prev = enc
    return _LLD_MAGIC + bytes(body) + struct.pack("<I", zlib.crc32(bytes(body)))


def _decode_block(blob: bytes, path: str = "?") -> list[str]:
    if blob[:4] != _LLD_MAGIC:
        raise ValueError(f"{path}: not an LLD1 dictionary block")
    body = blob[4:-4]
    (crc,) = struct.unpack("<I", blob[-4:])
    if zlib.crc32(body) != crc:
        raise ValueError(f"{path}: LLD1 block CRC mismatch")
    if body[0] != _LLD_VERSION:
        raise ValueError(f"{path}: unsupported LLD1 version {body[0]}")
    n, pos = _read_varint(body, 1)
    terms: list[str] = []
    prev = b""
    for _ in range(n):
        p, pos = _read_varint(body, pos)
        slen, pos = _read_varint(body, pos)
        prev = prev[:p] + body[pos : pos + slen]
        pos += slen
        terms.append(prev.decode("utf-8"))
    if pos != len(body):
        raise ValueError(f"{path}: trailing bytes in LLD1 block")
    return terms


def write_terms_binary(terms: DataFrame, path: str, term_col: str = "term",
                       num_files: int | None = None) -> None:
    """Persist distinct terms as a globally sorted LLD1 binary dictionary
    (the protobuf/bytecode-serializer analogue, reference A5).

    Same distribution shape as `write_terms_text`: repartitionByRange +
    sortWithinPartitions, then each partition front-codes its own sorted
    run and writes one `part-NNNNN.lld` file, so no single node ever holds
    the whole dictionary and filename-order concatenation preserves the
    global sort. Write protocol (a minimal stage-then-commit committer,
    mirroring what Spark's FileOutputCommitter gives the text path):

    * tasks write into a hidden `_staging-<token>/` subdirectory (leading
      underscore = invisible to Spark's file index, so a concurrent or
      self-referencing read of `path` never sees in-flight output);
    * each task attempt writes to an attempt-unique tmp name before an
      atomic rename, so speculative / zombie attempts can't corrupt a
      committed block;
    * only after the job succeeds does the driver swap staged files in and
      delete the previous generation — a failed job leaves the old
      dictionary fully intact, and `write_terms_binary(read_terms_binary(
      spark, p)..., p)` is safe because the input files outlive the read.

    Requires a filesystem every executor and the driver can reach
    (local / NFS — the sandbox's case); an object-store deployment would
    swap the direct `open()` for a committer-backed sink."""
    import shutil
    import uuid

    out = terms.select(F.col(term_col).alias("value")).dropna().distinct()
    out = (
        out.repartitionByRange(num_files, "value")
        if num_files is not None
        else out.repartitionByRange("value")
    )
    out = out.sortWithinPartitions("value")

    stage = os.path.join(path, f"_staging-{uuid.uuid4().hex}")
    os.makedirs(stage, exist_ok=True)

    def write_part(rows) -> None:
        from pyspark import TaskContext

        chunk = [r["value"] for r in rows]
        if not chunk:
            return  # range partitioner may leave trailing partitions empty
        ctx = TaskContext.get()
        dest = os.path.join(stage, f"part-{ctx.partitionId():05d}.lld")
        tmp = f"{dest}.{ctx.taskAttemptId()}.tmp"
        with open(tmp, "wb") as f:
            f.write(_encode_block(chunk))
        os.replace(tmp, dest)

    try:
        out.foreachPartition(write_part)
        staged = sorted(f for f in os.listdir(stage) if f.endswith(".lld"))
        if not staged:
            # empty dictionary: keep the directory self-describing
            with open(os.path.join(stage, "part-00000.lld"), "wb") as f:
                f.write(_encode_block([]))
            staged = ["part-00000.lld"]
        # commit point: the job succeeded — retire the old generation and
        # move the staged files in (plain listdir string checks; glob would
        # misread metacharacters in user paths as patterns)
        for old in os.listdir(path):
            if old.startswith("part-") and old.endswith(".lld"):
                os.remove(os.path.join(path, old))
        for name in staged:
            os.replace(os.path.join(stage, name), os.path.join(path, name))
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def read_terms_binary(spark: SparkSession, path: str, term_col: str = "term") -> DataFrame:
    """Load an LLD1 binary dictionary back into a (term) DataFrame: the
    `binaryFile` source parallelizes over block files; decoding is a
    mapInPandas per file (CRC-checked). Empty terms are dropped, matching
    `read_terms_text`'s contract exactly."""
    import re

    import pandas as pd

    # Spark resolves load() paths with Hadoop glob semantics; escape
    # metacharacters so a literal '[v2]'-style directory name is not read
    # as a character class (Hadoop's GlobPattern honours backslash escapes)
    safe_path = re.sub(r"([\[\]{}*?\\])", r"\\\1", path)
    files = (
        spark.read.format("binaryFile")
        # directory + pathGlobFilter (not a glob IN the path): FileStreamSink
        # otherwise stats the glob literally and logs a spurious WARN
        .option("pathGlobFilter", "*.lld")
        .load(safe_path)
        .select("path", "content")
    )

    def decode(batches):
        for pdf in batches:
            for p, blob in zip(pdf["path"], pdf["content"]):
                yield pd.DataFrame({term_col: _decode_block(bytes(blob), p)})

    return (
        files.mapInPandas(decode, f"{term_col} string")
        .filter(F.col(term_col) != "")
    )
