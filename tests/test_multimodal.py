"""Multimodal tests: real container codecs (PNG/WAV/AVI generation AND
struct-level parsing), mapInPandas batching, real pixel resample, real
frame demux — plus hand-built byte fixtures so the parser is not merely
trusted to share the generator's bugs."""

from __future__ import annotations

import binascii
import hashlib
import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from liblevenshtein_spark.operators import multimodal


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", binascii.crc32(tag + data) & 0xFFFFFFFF))


# ---------------------------------------------------------------------------
# Codec unit tests (no Spark)
# ---------------------------------------------------------------------------

def test_real_decode_parses_handbuilt_png():
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    raw = b"\x00\x01\x02" + b"\x00\x03\x04"  # filter-0 scanlines
    png = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))
    meta = multimodal.real_decode(png, "image")
    assert (meta["width"], meta["height"]) == (2, 2)
    assert meta["duration_ms"] is None
    assert multimodal.decode_png_pixels(png).tolist() == [[1, 2], [3, 4]]


def test_real_decode_checks_png_crc():
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    png = bytearray(b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
                    + _chunk(b"IEND", b""))
    png[8 + 8 + 13 + 1] ^= 0xFF  # corrupt one IHDR CRC byte
    with pytest.raises(ValueError, match="CRC"):
        multimodal.real_decode(bytes(png), "image")


def test_real_decode_rejects_garbage():
    with pytest.raises(ValueError):
        multimodal.real_decode(b"definitely not a container", "image")
    with pytest.raises(ValueError):
        multimodal.real_decode(b"RIFF\x04\x00\x00\x00XXXX", "audio")


def test_real_decode_parses_handbuilt_wav():
    data = b"\x00\x01" * 8000  # 8000 samples @ 8 kHz 16-bit mono = 1000 ms
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    meta = multimodal.real_decode(wav, "audio")
    assert meta["duration_ms"] == 1000
    assert meta["width"] is None and meta["height"] is None


def test_png_unfilter_all_five_types():
    """Encode scanlines with an INDEPENDENT implementation of filters
    0/Sub/Up/Average/Paeth and confirm decode_png_pixels reverses them."""
    rng = np.random.default_rng(1)
    px = rng.integers(0, 256, size=(5, 7), dtype=np.uint8).astype(np.int32)
    lines = []
    for r, ftype in enumerate([0, 1, 2, 3, 4]):
        cur = px[r]
        prev = px[r - 1] if r else np.zeros(7, dtype=np.int32)
        out = np.zeros(7, dtype=np.int32)
        for x in range(7):
            a = int(cur[x - 1]) if x else 0
            b = int(prev[x])
            c = int(prev[x - 1]) if (x and r) else 0
            if ftype == 0:
                out[x] = cur[x]
            elif ftype == 1:
                out[x] = (cur[x] - a) & 0xFF
            elif ftype == 2:
                out[x] = (cur[x] - b) & 0xFF
            elif ftype == 3:
                out[x] = (cur[x] - (a + b) // 2) & 0xFF
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[x] = (cur[x] - pred) & 0xFF
        lines.append(bytes([ftype]) + out.astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", 7, 5, 8, 0, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(b"".join(lines)))
           + _chunk(b"IEND", b""))
    assert (multimodal.decode_png_pixels(png) == px.astype(np.uint8)).all()


def test_generator_roundtrips_through_parser():
    for doc_id in [0, 3, 6, 1, 4, 7, 2, 5, 8, 997, 998, 999, 123456]:
        kind, payload = multimodal._gen_payload(doc_id)
        meta = multimodal.real_decode(payload, kind)
        k = doc_id % 3
        if k == 0:
            assert meta["width"] == 16 + doc_id % 48
            assert meta["height"] == 16 + (doc_id // 2) % 32
            px = multimodal.decode_png_pixels(payload)
            idx = np.arange(px.size, dtype=np.int64)
            want = ((doc_id * 31 + idx * 7) % 256).astype(np.uint8).reshape(px.shape)
            assert (px == want).all()
        elif k == 1:
            assert meta["duration_ms"] == (800 + doc_id % 8000) // 8
        else:
            nf, w, h = 10 + doc_id % 120, 8 + doc_id % 32, 8 + (doc_id // 2) % 24
            assert (meta["width"], meta["height"]) == (w, h)
            assert meta["duration_ms"] == nf * 40
            assert multimodal.avi_stream_format(payload) == (w, h, 8, 0)
            stride = (w + 3) // 4 * 4
            frames = multimodal.demux_avi_frames(payload)
            assert len(frames) == nf
            ys = np.arange(h, dtype=np.int64)[:, None] * 5
            xs = np.arange(w, dtype=np.int64)[None, :] * 3
            for i, f in enumerate(frames):
                assert len(f) == stride * h
                px = multimodal.decode_dib_frame(f, w, h)
                assert (px == ((doc_id * 7 + i * 13 + ys + xs) % 256)).all()


def test_dib_frame_roundtrip_stride_and_flip():
    """encode_dib_frame stores bottom-up 4-byte-stride rows; decode must
    reverse both. Checked against hand-built bytes, not just the inverse."""
    px = np.arange(15, dtype=np.uint8).reshape(3, 5)  # w=5 -> stride 8
    enc = multimodal.encode_dib_frame(px)
    assert len(enc) == 8 * 3
    # bottom row of the image comes FIRST in the DIB, padded to 8 bytes
    assert enc[:8] == bytes([10, 11, 12, 13, 14, 0, 0, 0])
    assert enc[16:24] == bytes([0, 1, 2, 3, 4, 0, 0, 0])
    assert (multimodal.decode_dib_frame(enc, 5, 3) == px).all()
    with pytest.raises(ValueError, match="bytes"):
        multimodal.decode_dib_frame(enc[:-1], 5, 3)


def test_avi_caption_stream_padding_and_demux():
    """Interleaved '01tx' chunks with ODD lengths force the RIFF walk to
    honor even-byte padding, and must never leak into the frame demux."""
    frames = [multimodal.encode_dib_frame(
        np.full((4, 4), i, dtype=np.uint8)) for i in range(3)]
    captions = [b"odd", b"even", b"x"]  # lengths 3, 4, 1
    avi = multimodal.encode_avi(4, 4, frames, captions=captions)
    assert multimodal.demux_avi_frames(avi) == frames
    assert multimodal.avi_stream_format(avi) == (4, 4, 8, 0)
    usec, nf, w, h = multimodal._avi_main_header(avi)
    assert (nf, w, h) == (3, 4, 4)
    # odd-length caption is stored with a pad byte after its payload
    assert b"01tx\x03\x00\x00\x00odd\x00" in avi


# ---------------------------------------------------------------------------
# Spark-side plumbing
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def media_df(spark):
    docs = spark.createDataFrame([(i,) for i in range(12)], ["doc_id"])
    return multimodal.synth_media(docs)


def test_synth_media_schema_and_kinds(spark, media_df):
    assert media_df.schema["payload"].dataType.typeName() == "binary"
    kinds = {r.doc_id: r.kind for r in media_df.collect()}
    assert kinds == {i: ["image", "audio", "video"][i % 3] for i in range(12)}


def test_decode_media_real_parse(spark, media_df):
    out = {r.doc_id: r for r in multimodal.decode_media(media_df).collect()}
    payloads = {r.doc_id: bytes(r.payload) for r in media_df.collect()}
    assert set(out) == set(range(12))
    for doc_id, r in out.items():
        assert r.n_bytes == len(payloads[doc_id])
        assert r.sha1_8 == hashlib.sha1(payloads[doc_id]).hexdigest()[:8]
        if r.kind == "image":
            assert (r.width, r.height) == (16 + doc_id % 48, 16 + (doc_id // 2) % 32)
            assert r.duration_ms is None
        elif r.kind == "audio":
            assert r.width is None and r.height is None
            assert r.duration_ms == (800 + doc_id % 8000) // 8
        else:
            assert r.duration_ms == (10 + doc_id % 120) * 40
    # repartitioned input -> identical output (batch-shape independence)
    out2 = {r.doc_id: tuple(r) for r in
            multimodal.decode_media(media_df.repartition(4)).collect()}
    assert out2 == {k: tuple(v) for k, v in out.items()}


def test_extract_features_shape(spark, media_df):
    rows = multimodal.extract_features(media_df, dim=8).collect()
    assert len(rows) == 12
    for r in rows:
        assert len(r.features) == 8
        assert all(0.0 <= x <= 1.0 for x in r.features)


def test_resize_media_real_pixel_resample(spark, media_df):
    out = {r.doc_id: r for r in
           multimodal.resize_media(media_df, target_w=16, target_h=8).collect()}
    payloads = {r.doc_id: bytes(r.payload) for r in media_df.collect()}
    assert set(out) == {i for i in range(12) if i % 3 in (0, 2)}
    for doc_id, r in out.items():
        assert (r.width, r.height) == (16, 8)
        assert len(r.thumb) == 16 * 8
        assert r.thumb_pix0 == r.thumb[0]
        # independently recompute the nearest-neighbor resample from the
        # decoded source pixels — REAL pixels on both branches
        if r.kind == "image":
            px = multimodal.decode_png_pixels(payloads[doc_id])
        else:
            vw, vh, _, _ = multimodal.avi_stream_format(payloads[doc_id])
            frame0 = multimodal.demux_avi_frames(payloads[doc_id])[0]
            px = multimodal.decode_dib_frame(frame0, vw, vh)
        sh, sw = px.shape
        assert (r.src_width, r.src_height) == (sw, sh)
        ys = np.arange(8) * sh // 8
        xs = np.arange(16) * sw // 16
        assert bytes(r.thumb) == px[ys][:, xs].tobytes()


def test_sample_frames_real_demux(spark, media_df):
    frames = multimodal.sample_frames(media_df, every_ms=1000, max_frames=32).collect()
    assert frames and all(r.ts_ms == r.frame_idx * 1000 for r in frames)
    payloads = {r.doc_id: bytes(r.payload) for r in media_df.collect()
                if r.kind == "video"}
    per_doc: dict = {}
    for r in frames:
        per_doc.setdefault(r.doc_id, []).append(r)
    assert set(per_doc) == set(payloads)
    for doc_id, rows in per_doc.items():
        stored = multimodal.demux_avi_frames(payloads[doc_id])
        vw, vh, _, _ = multimodal.avi_stream_format(payloads[doc_id])
        nf = len(stored)
        duration = nf * 40
        want_n = min(32, duration // 1000 + 1)
        assert sorted(r.frame_idx for r in rows) == list(range(want_n))
        for r in rows:
            si = min(r.ts_ms // 40, nf - 1)
            fb = stored[si]
            assert r.frame_len == len(fb)
            assert r.frame_sha1_8 == hashlib.sha1(fb).hexdigest()[:8]
            # decoded top-left pixel matches the generation formula
            assert r.pix0 == int(multimodal.decode_dib_frame(fb, vw, vh)[0, 0])
            assert r.pix0 == (doc_id * 7 + si * 13) % 256


def test_injected_codec_drops_in(spark):
    """A codec with the documented (payload, kind) -> meta signature must
    drop into decode_media without any plumbing change — the production
    seam for PIL/pyav environments."""

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
    got = {r.doc_id: r.asDict()
           for r in multimodal.decode_media(media, decoder=header_codec).collect()}
    assert got[1]["width"] == 640 and got[1]["height"] == 480
    assert got[1]["duration_ms"] is None and got[1]["sha1_8"] == "aaaaaaaa"
    assert got[2]["duration_ms"] == 90_000 and got[2]["width"] is None
    assert got[3] == {"doc_id": 3, "kind": "video", "n_bytes": 16,
                      "sha1_8": "cccccccc", "width": 1920, "height": 1080,
                      "duration_ms": 5_000}


def test_default_decoder_is_real_parser(spark):
    """The default decode path must PARSE bytes, not trust the kind column:
    a WAV payload labeled 'image' still decodes as audio metadata."""
    _, wav = multimodal._gen_payload(1)  # doc 1 -> audio WAV
    media = spark.createDataFrame([(9, "image", wav)],
                                  "doc_id long, kind string, payload binary")
    r = multimodal.decode_media(media).collect()[0]
    assert r.width is None and r.duration_ms == (800 + 1 % 8000) // 8
