"""Tests for operators/chunking.py (fixed-token-window document chunking)
plus the round-2 analytics additions (pivot/unpivot, exact deciles) and
int8 embedding quantization."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from liblevenshtein_spark.operators.analytics import (
    corpus_pivot, corpus_unpivot, length_deciles,
)
from liblevenshtein_spark.operators.ann import quantize_embeddings
from liblevenshtein_spark.operators.chunking import chunk_documents


def _doc(i, n_tokens):
    return (i, " ".join(f"t{i}w{j}" for j in range(n_tokens)))


# ---------------------------------------------------------------------------
# chunk_documents
# ---------------------------------------------------------------------------

def test_chunk_grid_shapes(spark):
    docs = spark.createDataFrame(
        [_doc(1, 10), _doc(2, 64), _doc(3, 65), _doc(4, 100), _doc(5, 160),
         (6, ""), (7, "   ")],
        "doc_id long, text string")
    out = chunk_documents(docs, window=64, stride=48)
    rows = {(r.doc_id, r.chunk_idx): r for r in out.collect()}
    by_doc = {}
    for (d, _), r in rows.items():
        by_doc.setdefault(d, []).append(r)
    # empty / whitespace-only docs emit no chunks
    assert 6 not in by_doc and 7 not in by_doc
    # n <= W: exactly one chunk of n tokens
    assert len(by_doc[1]) == 1 and by_doc[1][0].n_chunk_tokens == 10
    assert len(by_doc[2]) == 1 and by_doc[2][0].n_chunk_tokens == 64
    # n = 65: starts 0, 48 — tail chunk is short (17 tokens)
    assert sorted(r.start_tok for r in by_doc[3]) == [0, 48]
    assert {r.start_tok: r.n_chunk_tokens for r in by_doc[3]}[48] == 17
    # n = 100: starts 0, 48 — second chunk covers 48..99 (52 tokens)
    assert {r.start_tok: r.n_chunk_tokens for r in by_doc[4]} == {0: 64, 48: 52}
    # n = 160: ceil((160-64)/48) = 2 extra starts -> 0, 48, 96
    assert sorted(r.start_tok for r in by_doc[5]) == [0, 48, 96]


def test_chunk_full_coverage_and_content(spark):
    """Every token appears in at least one chunk; chunk text is the exact
    token-slice join and consecutive chunks overlap by W - S tokens."""
    n = 137
    docs = spark.createDataFrame([_doc(9, n)], "doc_id long, text string")
    rows = sorted(chunk_documents(docs, window=64, stride=48).collect(),
                  key=lambda r: r.chunk_idx)
    toks = [f"t9w{j}" for j in range(n)]
    covered = set()
    for r in rows:
        expect = toks[r.start_tok:r.start_tok + 64]
        assert r.chunk_text.split(" ") == expect
        assert r.n_chunk_tokens == len(expect)
        covered.update(range(r.start_tok, r.start_tok + r.n_chunk_tokens))
    assert covered == set(range(n))
    # chunk_idx is the start/stride grid position
    assert [r.start_tok for r in rows] == [48 * r.chunk_idx for r in rows]


def test_chunk_rejects_bad_stride(spark):
    docs = spark.createDataFrame([_doc(1, 3)], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, window=16, stride=16)
    with pytest.raises(ValueError):
        chunk_documents(docs, window=16, stride=0)


def test_chunk_plan_has_no_shuffle(spark):
    docs = spark.createDataFrame([_doc(1, 100)], "doc_id long, text string")
    plan = chunk_documents(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# corpus_pivot / corpus_unpivot
# ---------------------------------------------------------------------------

_DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _corpus(spark):
    return spark.createDataFrame([
        (1, "a", "en", "web", 10),
        (2, "b", "en", "web", 20),
        (3, "c", "de", "web", 30),
        (4, "d", "fr", "wiki", 40),
        (5, "e", "zh", "wiki", 50),
    ], _DOCS_SCHEMA)


def test_corpus_pivot_counts(spark):
    out = {r.source: r for r in corpus_pivot(_corpus(spark)).collect()}
    assert out["web"].n_en == 2 and out["web"].n_de == 1 and out["web"].n_fr == 0
    assert out["wiki"].n_fr == 1 and out["wiki"].n_zh == 1 and out["wiki"].n_en == 0


def test_corpus_unpivot_tidy(spark):
    out = {(r.source, r.metric): r.value
           for r in corpus_unpivot(_corpus(spark)).collect()}
    assert out[("web", "n_docs")] == 3
    assert out[("web", "sum_chars")] == 60
    assert out[("web", "n_langs")] == 2
    assert out[("wiki", "n_langs")] == 2
    assert len(out) == 6


# ---------------------------------------------------------------------------
# length_deciles
# ---------------------------------------------------------------------------

def test_length_deciles_exact_nearest_rank(spark):
    # values 1..20: decile d has rank ceil(d*20/10) = 2d -> value 2d
    docs = spark.createDataFrame(
        [(i, "x", "en", "web", i) for i in range(1, 21)], _DOCS_SCHEMA)
    out = {r.decile: (r.rank, r.value)
           for r in length_deciles(docs).collect()}
    assert out == {d: (2 * d, 2 * d) for d in range(1, 10)}


def test_length_deciles_with_duplicates(spark):
    # 10 copies of 5 and one 100: n=11, rank(d) = ceil(11d/10)
    docs = spark.createDataFrame(
        [(i, "x", "en", "web", 5) for i in range(10)]
        + [(10, "x", "en", "web", 100)], _DOCS_SCHEMA)
    out = {r.decile: r.value for r in length_deciles(docs).collect()}
    assert all(out[d] == 5 for d in range(1, 10))  # rank <= 10 for d <= 9


# ---------------------------------------------------------------------------
# quantize_embeddings
# ---------------------------------------------------------------------------

def test_quantize_hand_computed(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, -2.0, 0.5]), (2, [0.0, 0.0]), (3, [3.0])],
        "vec_id long, embedding array<float>")
    out = {r.vec_id: r for r in quantize_embeddings(emb).collect()}
    # scale=2 -> q = round([63.5, -127, 31.75]) = [64, -127, 32]
    assert out[1].qvec_csv == "64,-127,32"
    assert out[1].sum_q == 64 - 127 + 32
    assert out[1].scale_1e6 == 2_000_000
    assert out[1].n_dims == 3
    # zero vector -> all-zero lattice, scale 0
    assert out[2].qvec_csv == "0,0" and out[2].scale_1e6 == 0
    # single component quantizes to the extreme
    assert out[3].qvec_csv == "127"


def test_quantize_bounds_and_reconstruction(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    vecs = [(i, [float(x) for x in rng.normal(size=16).astype("float32")])
            for i in range(20)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    rows = quantize_embeddings(emb).collect()
    raw = dict(vecs)
    for r in rows:
        q = [int(s) for s in r.qvec_csv.split(",")]
        assert all(-127 <= v <= 127 for v in q)
        scale = r.scale_1e6 / 1e6
        # dequantized values within half a lattice step of the original
        step = scale / 127
        for orig, qi in zip(raw[r.vec_id], q):
            assert abs(qi * step - orig) <= step / 2 + 1e-4


# ---------------------------------------------------------------------------
# pack_sequences
# ---------------------------------------------------------------------------

def _pack_corpus(spark):
    # shard A: 100 + 50 + 30 tokens; shard B: 200 tokens; plus an empty doc
    rows = [
        (1, " ".join(f"a{j}" for j in range(100)), "en", "A", 0),
        (2, " ".join(f"b{j}" for j in range(50)), "en", "A", 0),
        (3, " ".join(f"c{j}" for j in range(30)), "en", "A", 0),
        (4, " ".join(f"d{j}" for j in range(200)), "en", "B", 0),
        (5, "", "en", "B", 0),
    ]
    return spark.createDataFrame(rows, _DOCS_SCHEMA)


def test_pack_sequences_offsets_and_splits(spark):
    from liblevenshtein_spark.operators.chunking import pack_sequences

    out = {r.doc_id: r for r in pack_sequences(_pack_corpus(spark), capacity=128).collect()}
    assert 5 not in out  # empty doc dropped
    # shard A in doc_id order: offsets 0, 100, 150
    assert (out[1].offset_in_shard, out[2].offset_in_shard,
            out[3].offset_in_shard) == (0, 100, 150)
    # doc 1 spans tokens [0,100) -> entirely in seq 0
    assert (out[1].first_seq, out[1].last_seq, out[1].n_boundary_splits) == (0, 0, 0)
    # doc 2 spans [100,150) -> crosses the seq 0/1 boundary at 128
    assert (out[2].first_seq, out[2].last_seq, out[2].n_boundary_splits) == (0, 1, 1)
    # doc 3 spans [150,180) -> entirely in seq 1
    assert (out[3].first_seq, out[3].last_seq) == (1, 1)
    # shard B restarts at offset 0; 200 tokens -> crosses one boundary
    assert (out[4].offset_in_shard, out[4].first_seq, out[4].last_seq) == (0, 0, 1)


def test_pack_sequences_token_conservation(spark):
    """Sum of tokens equals last offset + last doc's tokens per shard, and
    sequence ids tile the stream without gaps."""
    from liblevenshtein_spark.operators.chunking import pack_sequences

    out = pack_sequences(_pack_corpus(spark), capacity=64).collect()
    for shard in ("A", "B"):
        rows = sorted((r for r in out if r.shard == shard),
                      key=lambda r: r.offset_in_shard)
        total = sum(r.n_tokens for r in rows)
        assert rows[-1].offset_in_shard + rows[-1].n_tokens == total
        # consecutive docs abut exactly
        for prev, cur in zip(rows, rows[1:]):
            assert prev.offset_in_shard + prev.n_tokens == cur.offset_in_shard
        # first/last seq are consistent with the offsets
        for r in rows:
            assert r.first_seq == r.offset_in_shard // 64
            assert r.last_seq == (r.offset_in_shard + r.n_tokens - 1) // 64


def test_pack_sequences_rejects_bad_capacity(spark):
    from liblevenshtein_spark.operators.chunking import pack_sequences

    with pytest.raises(ValueError):
        pack_sequences(_pack_corpus(spark), capacity=0)


# ---------------------------------------------------------------------------
# minhash_estimate_pairs
# ---------------------------------------------------------------------------

def test_minhash_estimate_tracks_exact_jaccard(spark):
    from liblevenshtein_spark.operators.dedup import minhash_estimate_pairs

    base = " ".join(f"w{j}" for j in range(40))
    near = " ".join(f"w{j}" for j in range(39)) + " zz"
    docs = spark.createDataFrame(
        [(1, base, "en", "A", 0), (2, base, "en", "A", 0),
         (3, near, "en", "A", 0), (4, "totally different text here now", "en", "A", 0)],
        _DOCS_SCHEMA)
    out = {(r.id_a, r.id_b): r for r in minhash_estimate_pairs(docs).collect()}
    # identical docs: estimate is exact — 16/16 components match, error 0
    assert out[(1, 2)].est_16 == 16 and out[(1, 2)].jaccard == 1.0
    assert out[(1, 2)].abs_err_1e4 == 0
    # near-dup pair surfaces with a high estimate and bounded error
    for pair in [(1, 3), (2, 3)]:
        if pair in out:
            r = out[pair]
            assert r.est_16 >= 10 and r.jaccard > 0.8
            assert r.abs_err_1e4 == round(abs(r.est_16 / 16 - r.jaccard) * 10000)
    # the unrelated doc never becomes a candidate
    assert not any(4 in p for p in out)


# ---------------------------------------------------------------------------
# content-defined chunking
# ---------------------------------------------------------------------------

def _cdc_reference(text, gram=8, modulus=64, min_chunk=16):
    """Independent boundary walk mirroring the LBFS rule."""
    import hashlib

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    n = len(text)
    cand = [
        p for p in range(2, n - gram + 2)
        if h(text[p - 1:p - 1 + gram]) % modulus == 0
    ]
    kept, last = [], 1
    for p in cand:
        if p - last >= min_chunk:
            kept.append(p)
            last = p
    cuts = [1] + kept + [n + 1]
    return [
        (i, cuts[i], cuts[i + 1] - cuts[i],
         hashlib.md5(text[cuts[i] - 1:cuts[i + 1] - 1].encode()).hexdigest())
        for i in range(len(cuts) - 1)
    ]


def _mk_text(seed, n):
    import random

    rng = random.Random(seed)
    return "".join(rng.choice("abcdefgh ") for _ in range(n))


def test_cdc_chunks_match_reference(spark):
    from liblevenshtein_spark.operators.chunking import cdc_chunks

    rows = [(i, _mk_text(i, 50 + 70 * i)) for i in range(6)] + [(99, "short")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.doc_id, r.chunk_idx): (r.chunk_start, r.chunk_len, r.chunk_hash)
        for r in cdc_chunks(df).collect()
    }
    want = {}
    for doc_id, text in rows:
        for idx, start, ln, hsh in _cdc_reference(text):
            want[(doc_id, idx)] = (start, ln, hsh)
    assert got == want


def test_cdc_shift_invariance_vs_fixed_chunking(spark):
    """Prepend 3 chars to a long doc: CDC re-emits the original chunk
    hashes for everything after the first content boundary (fixed-offset
    chunking shares nothing)."""
    from liblevenshtein_spark.operators.chunking import cdc_chunks

    base = _mk_text(42, 600)
    df = spark.createDataFrame(
        [(1, base), (2, "xyz" + base)], ["doc_id", "text"]
    )
    by_doc = {1: set(), 2: set()}
    for r in cdc_chunks(df).collect():
        by_doc[r.doc_id].add(r.chunk_hash)
    shared = by_doc[1] & by_doc[2]
    assert len(shared) >= len(by_doc[1]) - 2  # all but the head chunk(s)
    assert len(by_doc[1]) >= 4  # the doc really split into several chunks


def test_cdc_min_gap_suppression(spark):
    """No non-tail chunk may be shorter than CDC_MIN_CHUNK."""
    from liblevenshtein_spark.operators.chunking import CDC_MIN_CHUNK, cdc_chunks

    rows = [(i, _mk_text(100 + i, 400)) for i in range(5)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    chunks = cdc_chunks(df).collect()
    n_per_doc = {}
    for r in chunks:
        n_per_doc[r.doc_id] = max(n_per_doc.get(r.doc_id, 0), r.chunk_idx)
    for r in chunks:
        if r.chunk_idx < n_per_doc[r.doc_id]:  # not the tail
            assert r.chunk_len >= CDC_MIN_CHUNK, r


def test_cdc_dedup_stats_planted_duplicates(spark):
    from liblevenshtein_spark.operators.chunking import cdc_dedup_stats

    a = _mk_text(7, 500)
    b = _mk_text(8, 500)
    df = spark.createDataFrame(
        [(1, a), (2, a), (3, b)], ["doc_id", "text"]
    )
    stats = {r.doc_id: r for r in cdc_dedup_stats(df).collect()}
    assert stats[1].dup_ratio_1e4 == 10000  # exact twin: all chunks shared
    assert stats[2].dup_ratio_1e4 == 10000
    assert stats[3].dup_ratio_1e4 == 0
    assert stats[1].total_chars == 500 and stats[3].n_dup_chunks == 0
