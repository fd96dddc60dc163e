"""P10 — per-query k-best candidates (SURVEY.md §2.4): the reference's
spelling-correction consumption pattern (take the closest few candidates,
README.md:26-29) and the Spark stand-in for its lazy candidate iteration
(A6: consumers stop early; here the window + row_number limit bounds work
per query group)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["topk_candidates"]


def topk_candidates(
    scored: DataFrame,
    k: int,
    query_col: str = "query_id",
    candidate_col: str = "candidate",
    distance_col: str = "distance",
) -> DataFrame:
    """Keep the k best candidates per query, ordered by (distance, candidate)
    for deterministic tie-breaks; adds a 1-based `rank` column."""
    w = Window.partitionBy(query_col).orderBy(
        F.col(distance_col).asc(), F.col(candidate_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
