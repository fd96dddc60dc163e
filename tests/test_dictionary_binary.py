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


def test_self_referencing_rewrite(spark, tmp_path):
    """write(read(p).filter(...), p) must not destroy its own input: the
    stage-then-commit protocol only retires the old generation after the
    job (and therefore the read) has completed."""
    path = str(tmp_path / "dict_self")
    df = spark.createDataFrame([(w,) for w in WORDS], "term string")
    write_terms_binary(df, path, num_files=2)
    from pyspark.sql import functions as F

    kept = read_terms_binary(spark, path).filter(F.length("term") > 2)
    expected = sorted(w for w in set(WORDS) if len(w) > 2)
    write_terms_binary(kept, path, num_files=2)
    assert sorted(r.term for r in read_terms_binary(spark, path).collect()) == expected
    # no staging residue left behind
    assert all(not f.startswith("_staging") for f in os.listdir(path))


def test_glob_metachar_path(spark, tmp_path):
    """Paths containing glob metacharacters are treated literally by the
    writer's commit step (a '[v2]' segment must not be read as a character
    class and trigger the empty-dictionary fallback over real data)."""
    path = str(tmp_path / "dict[v2]")
    df = spark.createDataFrame([(w,) for w in WORDS], "term string")
    write_terms_binary(df, path, num_files=2)
    files = [f for f in os.listdir(path) if f.endswith(".lld")]
    assert files and "part-00000.lld" in files
    concat = []
    for name in sorted(files):
        with open(os.path.join(path, name), "rb") as f:
            concat.extend(_decode_block(f.read(), name))
    assert concat == sorted(set(WORDS))
    # overwrite on the same metachar path retires the old generation
    write_terms_binary(df.limit(3), path, num_files=1)
    assert read_terms_binary(spark, path).count() == 3


def test_empty_string_parity_with_text(spark, tmp_path):
    """Both serializations drop the empty term on read — the formats share
    one contract, so the two gate entries can share one oracle."""
    df = spark.createDataFrame([("",), ("a",), ("ab",)], "term string")
    bin_path, txt_path = str(tmp_path / "b0"), str(tmp_path / "t0")
    write_terms_binary(df, bin_path, num_files=1)
    write_terms_text(df, txt_path, num_files=1)
    assert sorted(r.term for r in read_terms_binary(spark, bin_path).collect()) == ["a", "ab"]
    assert sorted(r.term for r in read_terms_text(spark, txt_path).collect()) == ["a", "ab"]


from hypothesis import given, settings, strategies as st


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(max_size=40), max_size=60))
def test_lld1_codec_roundtrips_arbitrary_unicode(terms):
    """Property: any sorted unique term list (including '', astral chars,
    embedded separators) survives encode->decode bit-exactly."""
    terms = sorted(set(terms))
    assert _decode_block(_encode_block(terms)) == terms
