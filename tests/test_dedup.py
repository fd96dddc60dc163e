"""Dedup-operator tests: exact groups, n-gram Jaccard vs a pure-Python
oracle, MinHash-LSH (precision-1 verify + candidate behavior), SimHash
Hamming blocking completeness."""

from __future__ import annotations

import hashlib
import itertools

from liblevenshtein_spark.operators import dedup


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),
    (2, "the quick brown fox jumps over the lazy dog"),   # exact dup of 0
    (3, "a completely different sentence about spark jobs"),
    (4, "the quick brown fox leaps over the lazy dog"),
    (5, "spark jobs about different sentence a completely"),
    (6, "tiny"),                                           # < 3 tokens: no shingles
    (7, "the quick brown fox jumps over the lazy dog today"),
]


def _df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def _py_shingles(text, n=3):
    toks = [t for t in text.split() if t]
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def _py_jaccard(a, b, n=3):
    sa, sb = _py_shingles(a, n), _py_shingles(b, n)
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def test_exact_dedup(spark):
    out = {r.doc_id: (r.canonical_id, r.is_canonical) for r in dedup.exact_dedup(_df(spark)).collect()}
    assert out[0] == (0, True)
    assert out[2] == (0, False)
    assert all(out[i] == (i, True) for i in (1, 3, 4, 5, 6, 7))


def test_jaccard_pairs_matches_python_oracle(spark):
    got = {(r.id_a, r.id_b): r.jaccard for r in
           dedup.jaccard_pairs(_df(spark), threshold=0.3).collect()}
    want = {}
    for (ia, ta), (ib, tb) in itertools.combinations(DOCS, 2):
        j = _py_jaccard(ta, tb)
        if j >= 0.3 and j > 0:
            want[(min(ia, ib), max(ia, ib))] = round(j, 4)
    assert got == want
    assert (0, 2) in got and got[(0, 2)] == 1.0


def test_minhash_lsh_finds_exact_and_near_dups(spark):
    got = {(r.id_a, r.id_b): r.jaccard for r in
           dedup.minhash_lsh_pairs(_df(spark), threshold=0.3).collect()}
    # exact dup must always be found (identical signatures in every band)
    assert (0, 2) in got and got[(0, 2)] == 1.0
    # verify step means precision 1.0 vs the exact-jaccard criterion
    for (a, b), j in got.items():
        assert round(_py_jaccard(DOCS[a][1], DOCS[b][1]), 4) == j >= 0.3


def test_minhash_signature_determinism(spark):
    s1 = {(r.doc_id, r.perm): r.minhash for r in dedup.minhash_signatures(_df(spark)).collect()}
    s2 = {(r.doc_id, r.perm): r.minhash for r in dedup.minhash_signatures(_df(spark)).collect()}
    assert s1 == s2
    assert len({k[1] for k in s1}) == 16


def test_simhash_properties(spark):
    sh = {r.doc_id: r.simhash for r in dedup.simhash(_df(spark), bits=32).collect()}
    assert sh[0] == sh[2]  # identical text -> identical simhash
    assert 0 <= sh[0] < (1 << 32)
    # near-dup texts should be close in hamming space
    ham = bin(sh[0] ^ sh[1]).count("1")
    far = bin(sh[0] ^ sh[3]).count("1")
    assert ham < far


def test_simhash_pairs_band_completeness(spark):
    """Every pair with hamming <= 3 must be found (pigeonhole over 4 bands)."""
    sh = {r.doc_id: r.simhash for r in dedup.simhash(_df(spark), bits=32).collect()}
    want = {
        (a, b): bin(sh[a] ^ sh[b]).count("1")
        for a, b in itertools.combinations(sorted(sh), 2)
        if bin(sh[a] ^ sh[b]).count("1") <= 3
    }
    got = {(r.id_a, r.id_b): r.hamming for r in
           dedup.simhash_pairs(_df(spark), bits=32, bands=4, max_hamming=3).collect()}
    assert got == want


def test_portable_hash_matches_duckdb(spark):
    """The md5-based 60-bit hash must agree bit-for-bit with the DuckDB
    expression used in the oracles."""
    import duckdb
    from pyspark.sql import functions as F
    from liblevenshtein_spark.functions.text import portable_hash64

    df = spark.createDataFrame([("7", "alpha beta"), ("0", "x")], ["a", "b"])
    got = {(r.a, r.b): r.h for r in df.select("a", "b", portable_hash64("a", "b").alias("h")).collect()}
    con = duckdb.connect()
    for (a, b), h in got.items():
        expect = con.sql(
            f"SELECT CAST(('0x' || substring(md5('{a}' || '|' || '{b}'), 1, 15)) AS BIGINT)"
        ).fetchone()[0]
        assert h == expect
    # python-side check too
    s = "7|alpha beta"
    assert got[("7", "alpha beta")] == int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
