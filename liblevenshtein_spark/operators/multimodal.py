"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side machinery (schema, batching, partitioning, UDF signatures)
is real and tested; the actual codec step is STUBBED — this container has no
image/audio libraries, so `decode_media` uses a clearly-marked deterministic
fake decoder, and `real_decode` raises NotImplementedError until PIL /
torchaudio / pyav are importable. Swapping the fake for the real decode is a
one-function change; nothing upstream or downstream moves.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["MEDIA_SCHEMA", "synth_media", "decode_media", "extract_features",
           "resize_media", "sample_frames", "real_decode"]

MEDIA_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),     # image | audio | video
    T.StructField("payload", T.BinaryType(), True),   # opaque encoded bytes
])

DECODED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.IntegerType(), False),
    T.StructField("sha1_8", T.StringType(), False),
    T.StructField("width", T.IntegerType(), True),    # image/video
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),  # audio/video
])

_KINDS = ["image", "audio", "video"]


def synth_media(documents: DataFrame) -> DataFrame:
    """Deterministic media table from documents: payload = utf-8 bytes of
    the text (stands in for encoded media), kind cycles by doc_id."""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in _KINDS]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    return documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


def real_decode(payload: bytes, kind: str):
    """The production decode hook. Requires codec libraries absent from this
    container. To use real codecs, pass a decoder with this signature to
    `decode_media(media, decoder=...)` — the plumbing (schema, batching,
    column pruning, nullable-int typing) is decoder-agnostic and tested with
    an injected mock codec (tests/test_multimodal.py)."""
    raise NotImplementedError(
        "real media decoding requires PIL/torchaudio/pyav; wire them in here"
    )


def _fake_decode(payload: bytes, kind: str) -> dict:
    """Deterministic stand-in: metadata derived from the bytes themselves."""
    n = len(payload or b"")
    digest = hashlib.sha1(payload or b"").hexdigest()[:8]
    meta = {"n_bytes": n, "sha1_8": digest, "width": None, "height": None, "duration_ms": None}
    if kind in ("image", "video"):
        meta["width"] = 64 + n % 640
        meta["height"] = 64 + (n // 2) % 480
    if kind in ("audio", "video"):
        meta["duration_ms"] = 250 + n % 60_000
    return meta


def decode_media(media: DataFrame, decoder=None) -> DataFrame:
    """mapInPandas decode: one Arrow batch in, one metadata batch out.
    Columns are pruned to (doc_id, kind, payload) regardless of input.

    `decoder(payload: bytes, kind: str) -> dict` with keys n_bytes / sha1_8
    / width / height / duration_ms plugs in the real codec; defaults to the
    deterministic stub (`_fake_decode`). The callable is shipped to
    executors by cloudpickle — any importable or closure-defined decoder
    works."""
    decode = decoder if decoder is not None else _fake_decode

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                decode(p, k) for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            out = pd.DataFrame(metas)
            out.insert(0, "kind", pdf["kind"].values)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            # nullable ints must stay pandas-nullable for Arrow
            for c in ("width", "height", "duration_ms"):
                out[c] = out[c].astype("Int32")
            out["n_bytes"] = out["n_bytes"].astype("int32")
            yield out

    return media.select("doc_id", "kind", "payload").mapInPandas(
        decode_batches, schema=DECODED_SCHEMA
    )


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Deterministic fake feature extractor: first `dim` payload bytes,
    zero-padded, scaled to [0,1] — exercises the binary -> array<float>
    vectorized path that a real encoder would use."""

    def feat_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                buf = np.frombuffer((p or b"")[:dim].ljust(dim, b"\0"), dtype=np.uint8)
                feats.append((buf.astype(np.float32) / 255.0).tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "features": feats})

    schema = T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
    ])
    return media.select("doc_id", "payload").mapInPandas(feat_batches, schema=schema)


RESIZED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("src_width", T.IntegerType(), True),
    T.StructField("src_height", T.IntegerType(), True),
    T.StructField("width", T.IntegerType(), False),
    T.StructField("height", T.IntegerType(), False),
    T.StructField("thumb", T.BinaryType(), False),  # stub pixel payload
])


def resize_media(media: DataFrame, target_w: int = 32, target_h: int = 32) -> DataFrame:
    """Resize plumbing for image/video rows: mapInPandas emitting the
    target geometry plus a deterministic stub thumbnail (sha1-derived bytes
    of exactly target_w*target_h — the shape a real resampler would fill).
    Audio rows are dropped (no spatial dims). The real pixel resample goes
    where the stub bytes are built; schema/batching/pruning stay as-is."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_px = target_w * target_h
        for pdf in batches:
            keep = pdf["kind"].isin(["image", "video"])
            pdf = pdf[keep]
            rows = []
            for doc_id, kind, payload in zip(pdf["doc_id"], pdf["kind"], pdf["payload"]):
                meta = _fake_decode(payload, kind)
                seed = hashlib.sha1((payload or b"") + b"|resize").digest()
                thumb = (seed * (n_px // len(seed) + 1))[:n_px]
                rows.append((doc_id, kind, meta["width"], meta["height"],
                             target_w, target_h, thumb))
            out = pd.DataFrame(rows, columns=["doc_id", "kind", "src_width",
                                              "src_height", "width", "height", "thumb"])
            for c in ("src_width", "src_height"):
                out[c] = out[c].astype("Int32")
            yield out

    return media.select("doc_id", "kind", "payload").mapInPandas(
        resize_batches, schema=RESIZED_SCHEMA
    )


FRAMES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("ts_ms", T.IntegerType(), False),
    T.StructField("frame_sha1_8", T.StringType(), False),
])


def sample_frames(media: DataFrame, every_ms: int = 1000, max_frames: int = 32) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled timestamp
    (0, every_ms, 2*every_ms, ... capped at max_frames within the stub
    duration). The per-frame sha is derived deterministically from
    (payload, ts) — exactly where a real demuxer would decode the frame."""

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "video"]
            ids, idxs, tss, shas = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                duration = _fake_decode(payload, "video")["duration_ms"]
                n = min(max_frames, duration // every_ms + 1)
                for fi in range(int(n)):
                    ts = fi * every_ms
                    ids.append(doc_id)
                    idxs.append(fi)
                    tss.append(ts)
                    shas.append(hashlib.sha1(
                        (payload or b"") + f"|frame|{ts}".encode()
                    ).hexdigest()[:8])
            yield pd.DataFrame({
                "doc_id": ids,
                "frame_idx": pd.array(idxs, dtype="int32"),
                "ts_ms": pd.array(tss, dtype="int32"),
                "frame_sha1_8": shas,
            })

    return media.select("doc_id", "kind", "payload").mapInPandas(
        frame_batches, schema=FRAMES_SCHEMA
    )
