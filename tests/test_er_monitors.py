"""Round-4 continuation ER operators: run-over-run cluster diff
(clustering.cluster_diff), blocking-layer PSI drift (metrics.
blocking_key_drift), score calibration (metrics.calibration_bins),
two-table cross-source candidate generation (candidates.
cross_source_pairs), and the SoftTFIDF comparator (comparators.
soft_tfidf_pairs) — hand-computed oracles on tiny inputs. Cross-engine
hashes are gated separately by the contract entries (`cluster_diff`,
`blocking_drift`, `score_calibration`, `link_cross_source`,
`similarity_soft_tfidf`)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from liblevenshtein_spark.operators.candidates import cross_source_pairs
from liblevenshtein_spark.operators.clustering import cluster_diff
from liblevenshtein_spark.operators.comparators import soft_tfidf_pairs
from liblevenshtein_spark.operators.metrics import (
    blocking_key_drift,
    calibration_bins,
)


def _assign(spark, rows):
    return spark.createDataFrame(rows, ["conv_id", "cluster_id"])


def _r4(x: float) -> float:
    return round(x + 1e-9, 4)


class TestClusterDiff:
    def test_stable_merge_classification(self, spark):
        old = _assign(spark, [("x1", "x1"), ("x2", "x1"), ("x3", "x3"), ("x4", "x4")])
        new = _assign(spark, [("x1", "x1"), ("x2", "x1"), ("x3", "x1"), ("x4", "x4")])
        rows = {
            (r["old_cluster"], r["new_cluster"]): r
            for r in cluster_diff(old, new).collect()
        }
        assert rows[("x1", "x1")]["kind"] == "merged_into"
        assert rows[("x1", "x1")]["n_common"] == 2
        assert rows[("x1", "x1")]["new_size"] == 3
        assert rows[("x3", "x1")]["kind"] == "merged_into"
        assert rows[("x4", "x4")]["kind"] == "stable"
        assert len(rows) == 3

    def test_split_classification(self, spark):
        old = _assign(spark, [("y1", "y1"), ("y2", "y1")])
        new = _assign(spark, [("y1", "y1"), ("y2", "y2")])
        rows = {
            (r["old_cluster"], r["new_cluster"]): r["kind"]
            for r in cluster_diff(old, new).collect()
        }
        assert rows == {("y1", "y1"): "split_from", ("y1", "y2"): "split_from"}

    def test_reshuffled_classification(self, spark):
        old = _assign(spark, [("a", "a"), ("b", "a"), ("c", "c"), ("d", "c")])
        new = _assign(spark, [("a", "a"), ("c", "a"), ("b", "b"), ("d", "b")])
        kinds = {r["kind"] for r in cluster_diff(old, new).collect()}
        assert kinds == {"reshuffled"}

    def test_added_and_removed_entities(self, spark):
        old = _assign(spark, [("a", "a"), ("gone", "gone")])
        new = _assign(spark, [("a", "a"), ("fresh", "fresh")])
        rows = {
            (r["old_cluster"], r["new_cluster"]): r
            for r in cluster_diff(old, new).collect()
        }
        assert rows[("gone", None)]["kind"] == "removed"
        assert rows[(None, "fresh")]["kind"] == "added"
        assert rows[("a", "a")]["kind"] == "stable"


class TestBlockingKeyDrift:
    def test_identical_batches_have_zero_psi(self, spark):
        keys = spark.createDataFrame(
            [("a", "k1"), ("b", "k1"), ("c", "k2")], ["conv_id", "block_key"]
        )
        out = blocking_key_drift(keys, keys).collect()
        assert len(out) == 2  # buckets 0 (k2, size 1) and 1 (k1, size 2)
        assert all(r["psi_term"] == 0.0 for r in out)
        assert all(r["n_keys_ref"] == r["n_keys_cur"] for r in out)

    def test_hand_computed_psi(self, spark):
        # ref: k1 has 4 members (bucket 2), k2 has 1 (bucket 0)
        ref = spark.createDataFrame(
            [("a", "k1"), ("b", "k1"), ("c", "k1"), ("d", "k1"), ("e", "k2")],
            ["conv_id", "block_key"],
        )
        # cur: two singleton keys (both bucket 0)
        cur = spark.createDataFrame(
            [("f", "k3"), ("g", "k4")], ["conv_id", "block_key"]
        )
        rows = {r["size_bucket"]: r for r in blocking_key_drift(ref, cur).collect()}
        assert set(rows) == {0, 2}
        # union vocabulary k=2 buckets; ref has 2 keys total, cur has 2
        p_ref0, p_cur0 = (1 + 0.5) / (2 + 1.0), (2 + 0.5) / (2 + 1.0)
        assert rows[0]["p_ref"] == pytest.approx(_r4(p_ref0), abs=1e-9)
        assert rows[0]["p_cur"] == pytest.approx(_r4(p_cur0), abs=1e-9)
        assert rows[0]["psi_term"] == pytest.approx(
            _r4((p_cur0 - p_ref0) * math.log(p_cur0 / p_ref0)), abs=1e-9
        )
        assert rows[2]["n_keys_cur"] == 0
        assert rows[2]["psi_term"] > 0  # mass left the bucket: still positive PSI

    def test_psi_terms_nonnegative(self, spark):
        # PSI terms are (p-q)*ln(p/q) >= 0 always — sanity on a skewed shift
        ref = spark.createDataFrame(
            [(f"r{i}", f"k{i % 3}") for i in range(30)], ["conv_id", "block_key"]
        )
        cur = spark.createDataFrame(
            [(f"c{i}", f"k{i}") for i in range(10)], ["conv_id", "block_key"]
        )
        assert all(
            r["psi_term"] >= 0.0 for r in blocking_key_drift(ref, cur).collect()
        )


class TestCalibrationBins:
    def test_hand_computed_bins(self, spark):
        df = spark.createDataFrame(
            [
                (0.95, True), (0.92, False), (1.0, True),
                (0.55, True), (0.51, False), (0.50, False),
            ],
            ["similarity", "y"],
        )
        rows = {r["bin"]: r for r in calibration_bins(df, F.col("y")).collect()}
        assert set(rows) == {5, 9}
        assert rows[9]["n_pairs"] == 3 and rows[9]["n_true"] == 2
        assert rows[9]["precision"] == pytest.approx(_r4(2 / 3), abs=1e-9)
        assert rows[5]["n_pairs"] == 3 and rows[5]["n_true"] == 1
        assert rows[9]["bin_lo"] == pytest.approx(0.9, abs=1e-9)

    def test_score_one_clamps_into_top_bin(self, spark):
        df = spark.createDataFrame([(1.0, True)], ["similarity", "y"])
        out = calibration_bins(df, F.col("y")).collect()
        assert len(out) == 1 and out[0]["bin"] == 9

    def test_custom_bin_count(self, spark):
        df = spark.createDataFrame(
            [(0.2, False), (0.7, True)], ["similarity", "y"]
        )
        rows = {r["bin"]: r for r in calibration_bins(df, F.col("y"), n_bins=4).collect()}
        assert set(rows) == {0, 2}
        assert rows[2]["bin_lo"] == pytest.approx(0.5, abs=1e-9)


class TestCrossSourcePairs:
    def test_only_cross_source_pairs_with_side_identity(self, spark):
        ka = spark.createDataFrame(
            [("a1", "k1"), ("a2", "k2")], ["conv_id", "block_key"]
        )
        kb = spark.createDataFrame(
            [("b1", "k1"), ("b2", "k3"), ("b3", "k1")], ["conv_id", "block_key"]
        )
        pairs = {(r["id_a"], r["id_b"]) for r in cross_source_pairs(ka, kb).collect()}
        assert pairs == {("a1", "b1"), ("a1", "b3")}

    def test_multi_key_pair_dedups(self, spark):
        ka = spark.createDataFrame(
            [("a1", "k1"), ("a1", "k2")], ["conv_id", "block_key"]
        )
        kb = spark.createDataFrame(
            [("b1", "k1"), ("b1", "k2")], ["conv_id", "block_key"]
        )
        out = cross_source_pairs(ka, kb).collect()
        assert len(out) == 1


class TestSoftTfidf:
    def _ents(self, spark, rows):
        return spark.createDataFrame(rows, ["conv_id", "fingerprint"])

    def _pairs(self, spark, rows):
        return spark.createDataFrame(rows, ["id_a", "id_b"])

    def test_identical_docs_score_one(self, spark):
        # anchors match themselves with jw=1, so Σ v² = 1 exactly regardless
        # of the idf weights
        ents = self._ents(spark, [("a", "rare common"), ("b", "rare common"),
                                  ("c", "common")])
        out = soft_tfidf_pairs(self._pairs(spark, [("a", "b")]), ents).collect()
        assert out[0]["soft_tfidf"] == pytest.approx(1.0, abs=2e-4)

    def test_no_close_tokens_scores_zero(self, spark):
        ents = self._ents(spark, [("a", "alpha"), ("b", "zzzz")])
        out = soft_tfidf_pairs(self._pairs(spark, [("a", "b")]), ents).collect()
        assert out[0]["soft_tfidf"] == 0.0

    def test_hand_computed_partial_overlap(self, spark):
        # corpus: a="rare common", b="rare zzzz", c="common"
        # df: rare=2, common=2, zzzz=1; N=3; w = ln(4/(df+1)) + 1
        ents = self._ents(spark, [("a", "rare common"), ("b", "rare zzzz"),
                                  ("c", "common")])
        w_r = math.log(4 / 3) + 1
        w_z = math.log(4 / 2) + 1
        w_c = math.log(4 / 3) + 1
        v_ra = w_r / math.sqrt(w_r**2 + w_c**2)
        v_rb = w_r / math.sqrt(w_r**2 + w_z**2)
        # only 'rare'->'rare' bridges (jw=1); both directions contribute the
        # same rounded sum, so the symmetrized score equals one direction
        expect = _r4(_r4(v_ra * v_rb * 1.0))
        out = soft_tfidf_pairs(self._pairs(spark, [("a", "b")]), ents).collect()
        assert out[0]["soft_tfidf"] == pytest.approx(expect, abs=2e-4)

    def test_anchor_picks_best_jw_partner(self, spark):
        # b offers both an exact and a prefix partner for 'jonathan'; the
        # exact one (jw=1) must win the rank, so the contribution uses ITS
        # weight, and the score from a's side is v_b(jonathan) * v_a * 1
        ents = self._ents(spark, [("a", "jonathan"), ("b", "jonathan jon")])
        w_exact = math.log(4 / 3) + 1   # df(jonathan)=2 with N=2 -> ln(3/3)+1
        # recompute properly: N=2 docs; df(jonathan)=2, df(jon)=1
        w_jonathan = math.log((2 + 1) / (2 + 1)) + 1  # = 1.0
        w_jon = math.log((2 + 1) / (1 + 1)) + 1
        v_b_jonathan = w_jonathan / math.sqrt(w_jonathan**2 + w_jon**2)
        s_ab = _r4(1.0 * v_b_jonathan * 1.0)  # v_a(jonathan) = 1
        out = soft_tfidf_pairs(self._pairs(spark, [("a", "b")]), ents).collect()
        score = out[0]["soft_tfidf"]
        # direction b->a: jonathan bridges (contrib v_b_jonathan * 1 * 1);
        # 'jon' vs 'jonathan' jw = 1 - off? jw(jon, jonathan) >= 0.9 (winkler
        # prefix boost), so it ALSO bridges with jw < 1
        assert 0.0 < score <= 1.0
        # the a->b direction alone is s_ab/2 of the symmetrized score's lower
        # bound; exact-partner selection means score >= s_ab / 2
        assert score >= s_ab / 2 - 2e-4

    def test_pairs_with_empty_head_survive_as_zero(self, spark):
        ents = self._ents(spark, [("a", ""), ("b", "alpha")])
        out = soft_tfidf_pairs(self._pairs(spark, [("a", "b")]), ents).collect()
        assert len(out) == 1 and out[0]["soft_tfidf"] == 0.0
