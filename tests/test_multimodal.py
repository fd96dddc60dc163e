"""Multimodal plumbing tests: schema, mapInPandas batching, deterministic
fake decode, feature extraction shape; the real codec hook stays
NotImplementedError by design (no media libs in this container)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from liblevenshtein_spark.operators import multimodal


@pytest.fixture(scope="module")
def media_df(spark):
    docs = spark.createDataFrame(
        [(0, "an image payload"), (1, "an audio payload!"), (2, "a video payload!!"),
         (3, ""), (4, "x" * 1000)],
        ["doc_id", "text"],
    )
    return docs, multimodal.synth_media(docs)


def test_synth_media_schema_and_kinds(spark, media_df):
    docs, media = media_df
    assert media.schema["payload"].dataType.typeName() == "binary"
    kinds = {r.doc_id: r.kind for r in media.collect()}
    assert kinds == {0: "image", 1: "audio", 2: "video", 3: "image", 4: "audio"}


def test_decode_media_deterministic_meta(spark, media_df):
    docs, media = media_df
    texts = {r.doc_id: r.text for r in docs.collect()}
    out = {r.doc_id: r for r in multimodal.decode_media(media).collect()}
    assert set(out) == set(texts)
    for doc_id, r in out.items():
        payload = texts[doc_id].encode()
        assert r.n_bytes == len(payload)
        assert r.sha1_8 == hashlib.sha1(payload).hexdigest()[:8]
        if r.kind in ("image", "video"):
            assert r.width == 64 + len(payload) % 640
            assert r.height == 64 + (len(payload) // 2) % 480
        else:
            assert r.width is None and r.height is None
        if r.kind in ("audio", "video"):
            assert r.duration_ms == 250 + len(payload) % 60000
    # repartitioned input -> identical output (batch-shape independence)
    out2 = {r.doc_id: tuple(r) for r in multimodal.decode_media(media.repartition(4)).collect()}
    assert out2 == {k: tuple(v) for k, v in out.items()}


def test_extract_features_shape(spark, media_df):
    _, media = media_df
    rows = multimodal.extract_features(media, dim=8).collect()
    assert len(rows) == 5
    for r in rows:
        assert len(r.features) == 8
        assert all(0.0 <= x <= 1.0 for x in r.features)


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.real_decode(b"\x89PNG", "image")


def test_resize_media_stub_plumbing(spark):
    from liblevenshtein_spark.operators.multimodal import resize_media, synth_media

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(30)
    media = synth_media(docs)
    out = resize_media(media, target_w=16, target_h=8).collect()
    kinds = {r.kind for r in out}
    assert kinds <= {"image", "video"} and out
    for r in out:
        assert (r.width, r.height) == (16, 8)
        assert len(r.thumb) == 16 * 8          # stub pixel buffer shape
        assert r.src_width is not None and r.src_height is not None
    # deterministic
    again = resize_media(media, target_w=16, target_h=8).collect()
    assert sorted((r.doc_id, bytes(r.thumb)) for r in out) == \
        sorted((r.doc_id, bytes(r.thumb)) for r in again)


def test_sample_frames_stub_plumbing(spark):
    from liblevenshtein_spark.operators.multimodal import (
        decode_media, sample_frames, synth_media)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(40)
    media = synth_media(docs)
    frames = sample_frames(media, every_ms=5000, max_frames=6).collect()
    assert frames and all(r.ts_ms == r.frame_idx * 5000 for r in frames)
    per_doc = {}
    for r in frames:
        per_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    durations = {r.doc_id: r.duration_ms for r in decode_media(media).collect()
                 if r.kind == "video"}
    assert set(per_doc) == set(durations)      # videos only, all of them
    for doc_id, idxs in per_doc.items():
        want = min(6, durations[doc_id] // 5000 + 1)
        assert sorted(idxs) == list(range(want))


def test_injected_codec_drops_in(spark):
    """A 'real' codec with the documented (payload, kind) -> meta signature
    must drop into decode_media without any plumbing change: here a mock
    codec that actually parses a tiny header format (width/height/duration
    encoded in the first bytes) — proving the stub boundary is the only
    thing that moves when PIL/pyav are available."""
    import struct

    from pyspark.sql import functions as F

    from liblevenshtein_spark.operators.multimodal import decode_media

    def header_codec(payload: bytes, kind: str) -> dict:
        w, h, dur = struct.unpack("<HHI", payload[:8])
        return {
            "n_bytes": len(payload),
            "sha1_8": payload[8:16].decode("ascii"),
            "width": w if kind in ("image", "video") else None,
            "height": h if kind in ("image", "video") else None,
            "duration_ms": dur if kind in ("audio", "video") else None,
        }

    rows = [
        (1, "image", struct.pack("<HHI", 640, 480, 0) + b"aaaaaaaa" + b"px"),
        (2, "audio", struct.pack("<HHI", 0, 0, 90_000) + b"bbbbbbbb"),
        (3, "video", struct.pack("<HHI", 1920, 1080, 5_000) + b"cccccccc"),
    ]
    media = spark.createDataFrame(rows, "doc_id long, kind string, payload binary")
    got = {r.doc_id: r.asDict() for r in decode_media(media, decoder=header_codec).collect()}
    assert got[1]["width"] == 640 and got[1]["height"] == 480
    assert got[1]["duration_ms"] is None and got[1]["sha1_8"] == "aaaaaaaa"
    assert got[2]["duration_ms"] == 90_000 and got[2]["width"] is None
    assert got[3] == {"doc_id": 3, "kind": "video", "n_bytes": 16,
                      "sha1_8": "cccccccc", "width": 1920, "height": 1080,
                      "duration_ms": 5_000}
    # default decoder unchanged (driver entry relies on it)
    base = decode_media(media.filter(F.col("doc_id") == 1)).collect()[0]
    assert base.n_bytes == 18
