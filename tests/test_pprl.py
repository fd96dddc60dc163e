"""PPRL Bloom-encoding operators (operators/pprl.py).

Correctness anchors:
- the encoding is deterministic and reproduced by an independent pure-
  Python md5 reference (same portable hash convention as the oracles);
- Dice is 1.0 exactly for identical fields and tracks q-gram Jaccard for
  perturbed fields;
- banded private blocking keeps recall 1.0 on near-identical fields at
  min_bands=2 while pruning chance single-band collisions.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from liblevenshtein_spark.operators.pprl import (
    bloom_band_candidates,
    bloom_encode,
    dice_pairs,
)


def _ref_bloom(text: str, q: int = 2, k: int = 4, m: int = 256) -> list[int]:
    """Independent reference encoding: same portable-md5 convention."""
    if len(text) <= q:
        grams = {text}
    else:
        grams = {text[i:i + q] for i in range(len(text) - q + 1)}
    bits = set()
    for g in grams:
        for j in range(k):
            h = hashlib.md5(f"{g}:{j}".encode()).hexdigest()[:8]
            bits.add(int(h, 16) % m)
    return sorted(bits)


def _encode(spark, rows):
    df = spark.createDataFrame(rows, ["conv_id", "sig"])
    return bloom_encode(df, id_col="conv_id", text_col="sig")


def test_bloom_encode_matches_pure_python_reference(spark):
    rows = [("a", "hello world abc"), ("b", "x"), ("c", "ab"),
            ("d", "the quick brown fox")]
    got = {r["id"]: list(r["bloom"]) for r in _encode(spark, rows).collect()}
    for cid, sig in rows:
        assert got[cid] == _ref_bloom(sig), cid


def test_dice_identical_is_one_and_tracks_similarity(spark):
    rows = [("a", "conversation alpha"), ("b", "conversation alpha"),
            ("c", "conversation alphb"), ("d", "zzzz qqqq jjjj")]
    enc = _encode(spark, rows)
    pairs = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("a", "d")], ["id_a", "id_b"]
    )
    dice = {(r["id_a"], r["id_b"]): r["dice"] for r in dice_pairs(pairs, enc).collect()}
    assert dice[("a", "b")] == 1.0
    assert 0.8 < dice[("a", "c")] < 1.0   # one changed char: most grams shared
    assert dice[("a", "d")] < 0.35        # disjoint vocabularies


def test_band_candidates_recall_and_pruning(spark):
    # 1-char-perturbed twins must collide on >= min_bands bands; unrelated
    # strings must not reach min_bands=2.
    rows = [("a1", "customer john smith"), ("a2", "customer john smyth"),
            ("b1", "order 4417 shipped"), ("b2", "order 4417 shippes"),
            ("z", "qqqq wwww kkkk vvvv")]
    enc = _encode(spark, rows)
    got = {(r["id_a"], r["id_b"]): r["n_shared_bands"]
           for r in bloom_band_candidates(enc, min_bands=2).collect()}
    assert ("a1", "a2") in got and got[("a1", "a2")] >= 2
    assert ("b1", "b2") in got and got[("b1", "b2")] >= 2
    assert all("z" not in p for p in got)


def test_min_bands_is_a_pure_threshold(spark):
    rows = [("a1", "customer john smith"), ("a2", "customer john smyth"),
            ("b1", "order 4417 shipped"), ("b2", "order 4417 shippes")]
    enc = _encode(spark, rows)
    loose = {(r["id_a"], r["id_b"]): r["n_shared_bands"]
             for r in bloom_band_candidates(enc, min_bands=1).collect()}
    tight = {(r["id_a"], r["id_b"]): r["n_shared_bands"]
             for r in bloom_band_candidates(enc, min_bands=2).collect()}
    assert tight == {p: n for p, n in loose.items() if n >= 2}


def test_bloom_is_sorted_distinct_and_bounded(spark):
    rows = [("a", "the quick brown fox jumps over the lazy dog")]
    row = _encode(spark, rows).collect()[0]
    bloom = list(row["bloom"])
    assert bloom == sorted(set(bloom))
    assert row["n_bits"] == len(bloom)
    assert all(0 <= b < 256 for b in bloom)


def test_band_candidates_cross_mode(spark):
    # A x B mode: only index-side x batch-side pairs, side identity in
    # (id_a, id_b) position, no within-side pairs.
    idx = _encode(spark, [("i1", "customer john smith"), ("i2", "order 4417 shipped")])
    batch = _encode(spark, [("b1", "customer john smyth"), ("b2", "order 4417 shippes"),
                            ("b3", "qqqq wwww kkkk vvvv")])
    got = {(r["id_a"], r["id_b"]): r["n_shared_bands"]
           for r in bloom_band_candidates(idx, min_bands=2, other=batch).collect()}
    assert ("i1", "b1") in got and ("i2", "b2") in got
    assert all(a.startswith("i") and b.startswith("b") for a, b in got)
    assert all("b3" != b for _, b in got)


def test_cross_mode_agrees_with_self_mode(spark):
    # Splitting one corpus into (idx, batch) must reproduce exactly the
    # self-mode pairs that cross the split.
    rows = [("a1", "customer john smith"), ("a2", "customer john smyth"),
            ("b1", "order 4417 shipped"), ("b2", "order 4417 shippes")]
    enc = _encode(spark, rows)
    full = {(r["id_a"], r["id_b"]): r["n_shared_bands"]
            for r in bloom_band_candidates(enc, min_bands=2).collect()}
    idx = enc.filter(enc.id.isin("a1", "b1"))
    batch = enc.filter(enc.id.isin("a2", "b2"))
    cross = {(r["id_a"], r["id_b"]): r["n_shared_bands"]
             for r in bloom_band_candidates(idx, min_bands=2, other=batch).collect()}
    expect = {(a, b): n for (a, b), n in full.items()
              if a in ("a1", "b1") and b in ("a2", "b2")}
    assert cross == expect
