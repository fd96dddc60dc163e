"""P8 — pipeline observability metrics (SURVEY.md §2.4): per-block candidate
counts, score distribution, and blocking reduction ratio. These make skew
visible (SURVEY.md §7.3 item 5) and feed the checkpoint ledger's lineage
rows. All native aggregations."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "block_stats", "score_distribution", "reduction_ratio", "hot_keys",
    "pairwise_confusion",
]


def pairwise_confusion(truth: DataFrame, preds: DataFrame) -> DataFrame:
    """Pairwise-linkage evaluation (the BASELINE.json headline metric):
    truth and preds are canonical-ordered (id_a, id_b) pair sets; returns a
    single row (tp, fp, fn, precision_1e4, recall_1e4, f1_1e4) with the
    ratios integer-scaled for hash-stable cross-engine comparison.

    One full-outer hash join on the pair key, then a single global
    aggregate — no collect, no cross join; scales with |truth ∪ preds|."""
    t = truth.select("id_a", "id_b").withColumn("_t", F.lit(1))
    p = preds.select("id_a", "id_b").withColumn("_p", F.lit(1))
    conf = t.join(p, ["id_a", "id_b"], "full_outer")
    both = F.col("_t").isNotNull() & F.col("_p").isNotNull()
    agg = conf.agg(
        F.coalesce(F.sum(F.when(both, 1).otherwise(0)), F.lit(0)).cast("bigint").alias("tp"),
        F.coalesce(F.sum(F.when(F.col("_t").isNull(), 1).otherwise(0)), F.lit(0)).cast("bigint").alias("fp"),
        F.coalesce(F.sum(F.when(F.col("_p").isNull(), 1).otherwise(0)), F.lit(0)).cast("bigint").alias("fn"),
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")

    def ratio(num, den, name):
        return F.when(den == 0, F.lit(0)).otherwise(
            F.floor(F.lit(10000.0) * num / den + F.lit(0.5))
        ).cast("bigint").alias(name)

    return agg.select(
        "tp", "fp", "fn",
        ratio(tp, tp + fp, "precision_1e4"),
        ratio(tp, tp + fn, "recall_1e4"),
        ratio(2 * tp, 2 * tp + fp + fn, "f1_1e4"),
    )


def block_stats(keys: DataFrame) -> DataFrame:
    """(id, block_key) -> per-key cardinality stats: one row per key with
    its record count and implied candidate-pair mass (count choose 2)."""
    return (
        keys.groupBy("block_key")
        .agg(F.count("*").alias("n_records"))
        .withColumn("pair_mass", (F.col("n_records") * (F.col("n_records") - 1) / 2).cast("long"))
    )


def hot_keys(keys: DataFrame, top: int = 20) -> DataFrame:
    """The `top` heaviest blocking keys — the skew watchlist."""
    return block_stats(keys).orderBy(F.desc("n_records")).limit(top)


def score_distribution(scored: DataFrame, distance_col: str = "distance") -> DataFrame:
    """Histogram of kernel distances (sentinel bucket included) plus
    summary percentiles as a single small DataFrame."""
    return (
        scored.groupBy(distance_col)
        .agg(F.count("*").alias("n_pairs"))
        .orderBy(distance_col)
    )


def reduction_ratio(n_entities: int, n_candidate_pairs: int) -> float:
    """1 - candidates / allpairs: how much work blocking eliminated."""
    all_pairs = n_entities * (n_entities - 1) / 2
    if all_pairs == 0:
        return 1.0
    return 1.0 - n_candidate_pairs / all_pairs


def summarize(keys: DataFrame, pairs: DataFrame, scored: DataFrame, n_entities: int) -> dict:
    """Driver-side summary dict (small aggregates only — no data collect)."""
    n_pairs = pairs.count()
    dist = {r[0]: r[1] for r in score_distribution(scored).collect()}
    top = [(r.block_key, r.n_records) for r in hot_keys(keys, 5).collect()]
    return {
        "n_entities": n_entities,
        "n_candidate_pairs": n_pairs,
        "reduction_ratio": reduction_ratio(n_entities, n_pairs),
        "distance_histogram": dist,
        "hottest_keys": top,
    }
