"""LLD1 binary dictionary serialization (reference A5's protobuf/bytecode
analogue): distributed front-coded roundtrip, global sort contract,
compression vs plain text, corruption detection, empty dictionary."""

from __future__ import annotations

import glob
import os

import pytest

from liblevenshtein_spark.sources.dictionary_io import (
    _decode_block,
    _encode_block,
    read_terms_binary,
    read_terms_text,
    write_terms_binary,
    write_terms_text,
)

WORDS = [
    "transduce", "transducer", "transduction", "transcript", "transcripts",
    "levenshtein", "lever", "level", "levels", "kitten", "sitting", "mitten",
    "a", "ab", "abc", "中文词", "中文字", "\U0001D49Cstral",
]


def test_block_codec_roundtrip_and_front_coding():
    terms = sorted(set(WORDS))
    blob = _encode_block(terms)
    assert _decode_block(blob) == terms
    # shared prefixes must actually be elided on disk
    plain = sum(len(t.encode("utf-8")) + 1 for t in terms)
    assert len(blob) < plain
    # corruption is detected, not silently decoded
    bad = blob[:-6] + bytes([blob[-6] ^ 0xFF]) + blob[-5:]
    with pytest.raises(ValueError, match="CRC"):
        _decode_block(bad)
    with pytest.raises(ValueError, match="not an LLD1"):
        _decode_block(b"XXXX" + blob[4:])


def test_spark_roundtrip_sorted_parts(spark, tmp_path):
    path = str(tmp_path / "dict_bin")
    df = spark.createDataFrame([(w,) for w in WORDS * 3], "term string")
    write_terms_binary(df, path, num_files=4)
    back = read_terms_binary(spark, path)
    assert sorted(r.term for r in back.collect()) == sorted(set(WORDS))
    # global sort contract: concatenating part files in filename order
    # yields the fully sorted term list (same contract as the text format)
    concat = []
    for p in sorted(glob.glob(os.path.join(path, "part-*.lld"))):
        with open(p, "rb") as f:
            concat.extend(_decode_block(f.read(), p))
    assert concat == sorted(set(WORDS))


def test_binary_smaller_than_text(spark, tmp_path):
    """On a prefix-heavy dictionary the LLD1 files undercut the plain-text
    serialization (the point of front coding)."""
    words = [f"conversation_fingerprint_{i:06d}" for i in range(2000)]
    df = spark.createDataFrame([(w,) for w in words], "term string")
    bin_path, txt_path = str(tmp_path / "b"), str(tmp_path / "t")
    write_terms_binary(df, bin_path, num_files=2)
    write_terms_text(df, txt_path, num_files=2)
    bin_sz = sum(os.path.getsize(p) for p in glob.glob(bin_path + "/part-*.lld"))
    txt_sz = sum(os.path.getsize(p) for p in glob.glob(txt_path + "/part-*"))
    assert bin_sz < txt_sz / 3  # ~26 shared prefix bytes per 31-byte term
    assert sorted(r.term for r in read_terms_binary(spark, bin_path).collect()) == words
    assert sorted(r.term for r in read_terms_text(spark, txt_path).collect()) == words


def test_empty_and_overwrite(spark, tmp_path):
    path = str(tmp_path / "dict_empty")
    full = spark.createDataFrame([(w,) for w in WORDS], "term string")
    write_terms_binary(full, path, num_files=2)
    assert read_terms_binary(spark, path).count() == len(set(WORDS))
    # overwrite with an empty dictionary: stale parts removed, read yields 0
    empty = spark.createDataFrame([], "term string")
    write_terms_binary(empty, path, num_files=2)
    assert read_terms_binary(spark, path).count() == 0
