"""Soft-similarity comparators (operators.comparators) + phonetic blocking
(functions.blocking.phonetic_key) + the threshold-sweep evaluator
(operators.metrics.threshold_sweep): hand-computed oracles on tiny inputs.
The cross-engine hashes are gated separately by the contract entries
(`similarity_tfidf`, `similarity_me`, `eval_threshold_sweep`,
`block_keys_phonetic`, `candidate_pairs_phonetic`)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from liblevenshtein_spark.functions.blocking import phonetic_key
from liblevenshtein_spark.operators.comparators import (
    monge_elkan_pairs,
    tfidf_cosine_pairs,
)
from liblevenshtein_spark.operators.metrics import threshold_sweep


def _pairs(spark, rows):
    return spark.createDataFrame(rows, ["id_a", "id_b"])


def _entities(spark, rows):
    return spark.createDataFrame(rows, ["conv_id", "fingerprint"])


class TestTfidfCosine:
    def test_identical_docs_score_one(self, spark):
        ents = _entities(spark, [("a", "red green blue"), ("b", "red green blue")])
        out = tfidf_cosine_pairs(_pairs(spark, [("a", "b")]), ents).collect()
        assert len(out) == 1
        assert out[0]["cosine"] == pytest.approx(1.0, abs=1e-4)

    def test_disjoint_docs_score_zero(self, spark):
        ents = _entities(spark, [("a", "red green"), ("b", "cyan magenta")])
        out = tfidf_cosine_pairs(_pairs(spark, [("a", "b")]), ents).collect()
        assert out[0]["cosine"] == 0.0

    def test_hand_computed_value(self, spark):
        # corpus of 3 docs; 'red' appears in all (df=3), 'blue' in one (df=1)
        ents = _entities(
            spark, [("a", "red blue"), ("b", "red"), ("c", "red red green")]
        )
        out = {
            (r["id_a"], r["id_b"]): r["cosine"]
            for r in tfidf_cosine_pairs(
                _pairs(spark, [("a", "b"), ("a", "c")]), ents
            ).collect()
        }
        idf_red = math.log(4.0 / 4.0) + 1.0  # 1.0
        idf_blue = math.log(4.0 / 2.0) + 1.0
        idf_green = math.log(4.0 / 2.0) + 1.0
        na = math.hypot(idf_red, idf_blue)
        nb = idf_red
        nc = math.hypot(2 * idf_red, idf_green)
        assert out[("a", "b")] == pytest.approx(idf_red * idf_red / (na * nb), abs=1e-4)
        assert out[("a", "c")] == pytest.approx(
            idf_red * 2 * idf_red / (na * nc), abs=1e-4
        )

    def test_separator_bounds_tokens(self, spark):
        # chr(30) must split tokens: 'red\x1egreen' is NOT one token
        ents = _entities(spark, [("a", "red\x1egreen"), ("b", "red green")])
        out = tfidf_cosine_pairs(_pairs(spark, [("a", "b")]), ents).collect()
        assert out[0]["cosine"] == pytest.approx(1.0, abs=1e-4)

    def test_no_common_token_pair_kept(self, spark):
        # the LEFT join keeps pairs whose dot product is empty
        ents = _entities(spark, [("a", "x"), ("b", "y"), ("c", "x")])
        out = tfidf_cosine_pairs(_pairs(spark, [("a", "b"), ("a", "c")]), ents)
        assert out.count() == 2

    def test_empty_token_entity_pair_kept_at_zero(self, spark):
        # an entity whose text tokenizes to NOTHING has no norms row; the
        # norms joins must be LEFT so its pairs score 0.0 instead of being
        # silently dropped (code-review fix)
        ents = _entities(spark, [("a", "red"), ("b", "   "), ("c", "\x1e")])
        out = {
            (r["id_a"], r["id_b"]): r["cosine"]
            for r in tfidf_cosine_pairs(
                _pairs(spark, [("a", "b"), ("b", "c")]), ents
            ).collect()
        }
        assert out == {("a", "b"): 0.0, ("b", "c"): 0.0}


class TestMongeElkan:
    def test_identical_token_sets(self, spark):
        ents = _entities(spark, [("a", "alpha beta"), ("b", "beta alpha")])
        out = monge_elkan_pairs(_pairs(spark, [("a", "b")]), ents).collect()
        assert out[0]["me_sim"] == pytest.approx(1.0, abs=1e-4)

    def test_asymmetric_directions_average(self, spark):
        # a = {ab}, b = {ab, zz}: ME(a->b)=1.0, ME(b->a)=(1.0+jw(zz,ab))/2
        ents = _entities(spark, [("a", "ab"), ("b", "ab zz")])
        out = monge_elkan_pairs(_pairs(spark, [("a", "b")]), ents).collect()
        jw_zz_ab = 0.0  # no common chars
        expected = (1.0 + (1.0 + jw_zz_ab) / 2.0) / 2.0
        assert out[0]["me_sim"] == pytest.approx(expected, abs=1e-3)

    def test_head_chars_limits_tokens(self, spark):
        # with head_chars=5 only the first token of each side participates
        ents = _entities(spark, [("a", "alpha omega"), ("b", "alpha zebra")])
        out = monge_elkan_pairs(
            _pairs(spark, [("a", "b")]), ents, head_chars=5
        ).collect()
        assert out[0]["me_sim"] == pytest.approx(1.0, abs=1e-4)


class TestThresholdSweep:
    def test_hand_counts(self, spark):
        truth = spark.createDataFrame(
            [("a", "b"), ("a", "c"), ("x", "y")], ["id_a", "id_b"]
        )
        scored = spark.createDataFrame(
            [("a", "b", 0), ("a", "c", 2), ("p", "q", 1)],
            ["id_a", "id_b", "distance"],
        )
        rows = {
            r["threshold"]: r
            for r in threshold_sweep(truth, scored, [0, 1, 2]).collect()
        }
        assert (rows[0]["tp"], rows[0]["fp"], rows[0]["fn"]) == (1, 0, 2)
        assert (rows[1]["tp"], rows[1]["fp"], rows[1]["fn"]) == (1, 1, 2)
        assert (rows[2]["tp"], rows[2]["fp"], rows[2]["fn"]) == (2, 1, 1)
        # f1 at t=2: p=2/3, r=2/3 -> f1=2/3 -> 6667
        assert rows[2]["f1_1e4"] == 6667

    def test_ordered_by_threshold(self, spark):
        truth = spark.createDataFrame([("a", "b")], ["id_a", "id_b"])
        scored = spark.createDataFrame([("a", "b", 1)], ["id_a", "id_b", "distance"])
        ts = [r["threshold"] for r in threshold_sweep(truth, scored, [2, 0, 1]).collect()]
        assert ts == [0, 1, 2]


class TestPhoneticKey:
    @pytest.mark.parametrize(
        "term,code",
        [
            ("robert", "R163"),
            ("rupert", "R163"),  # the classic sound-alike collision
            ("tymczak", "T522"),
            ("honeyman", "H555"),
            ("ashcraft", "A261"),  # H transparent: s,c collapse through h
            ("pfister", "P236"),
        ],
    )
    def test_known_codes(self, spark, term, code):
        row = (
            spark.createDataFrame([(term,)], ["term"])
            .select(phonetic_key("term").alias("k"))
            .collect()[0]
        )
        assert row["k"] == code

    def test_vowel_suffix_preserves_code(self, spark):
        # the planted-variant invariant the contract entry relies on
        df = spark.createDataFrame(
            [("smith",), ("smitha",), ("blue",), ("bluea",)], ["term"]
        ).select("term", phonetic_key("term").alias("k"))
        codes = {r["term"]: r["k"] for r in df.collect()}
        assert codes["smith"] == codes["smitha"]
        assert codes["blue"] == codes["bluea"]


def test_me_empty_token_entity_pair_kept_at_zero(spark):
    # same zero-token contract as tfidf: a pair whose entity's head text
    # tokenizes to nothing scores 0.0 instead of being dropped
    from liblevenshtein_spark.operators.comparators import monge_elkan_pairs

    ents = spark.createDataFrame(
        [("a", "alpha"), ("b", "   "), ("c", "\x1e")], ["conv_id", "fingerprint"]
    )
    pairs = spark.createDataFrame([("a", "b"), ("b", "c")], ["id_a", "id_b"])
    out = {(r["id_a"], r["id_b"]): r["me_sim"]
           for r in monge_elkan_pairs(pairs, ents).collect()}
    assert out == {("a", "b"): 0.0, ("b", "c"): 0.0}


def test_tokens_literal_metachar_separator(spark):
    # the public API documents `sep` as a LITERAL separator; a regex
    # metachar like '|' must split ONLY on '|', not on every character
    ents = spark.createDataFrame(
        [("a", "red|green"), ("b", "red|green")], ["conv_id", "fingerprint"]
    )
    out = tfidf_cosine_pairs(
        _pairs(spark, [("a", "b")]), ents, sep="|"
    ).collect()
    assert out[0]["cosine"] == pytest.approx(1.0, abs=1e-4)
    # '.' as separator: an unescaped '.' would match EVERY char and
    # blank both docs (cosine 0 via the zero-token contract)
    ents2 = spark.createDataFrame(
        [("a", "red.blue"), ("b", "blue.red")], ["conv_id", "fingerprint"]
    )
    out2 = tfidf_cosine_pairs(
        _pairs(spark, [("a", "b")]), ents2, sep="."
    ).collect()
    assert out2[0]["cosine"] == pytest.approx(1.0, abs=1e-4)


class TestTfidfTopK:
    def test_k_large_equals_exact(self, spark):
        # K >= vocabulary size must be bit-identical to the exact path
        ents = _entities(
            spark,
            [("a", "red blue green cyan"), ("b", "red blue yellow"),
             ("c", "green cyan red red")],
        )
        pairs = _pairs(spark, [("a", "b"), ("a", "c"), ("b", "c")])
        exact = {(r["id_a"], r["id_b"]): r["cosine"]
                 for r in tfidf_cosine_pairs(pairs, ents).collect()}
        capped = {(r["id_a"], r["id_b"]): r["cosine"]
                  for r in tfidf_cosine_pairs(pairs, ents, topk_tokens=100).collect()}
        assert exact == capped

    def test_k1_keeps_highest_weight_token(self, spark):
        # 'rare' (df=2) outweighs 'common' (df=3); with K=1 both a and b
        # keep only 'rare', so cosine(a,b) = 1.0 over the truncated vectors
        ents = _entities(
            spark,
            [("a", "common rare"), ("b", "common rare"), ("c", "common solo")],
        )
        out = {(r["id_a"], r["id_b"]): r["cosine"]
               for r in tfidf_cosine_pairs(
                   _pairs(spark, [("a", "b"), ("a", "c")]), ents, topk_tokens=1
               ).collect()}
        assert out[("a", "b")] == pytest.approx(1.0, abs=1e-4)
        # c keeps 'solo' (rarer than common) -> no overlap with a's 'rare'
        assert out[("a", "c")] == 0.0
