"""P5/P6 — pairwise scoring with the vectorized banded-Levenshtein kernel,
then the match filter (SURVEY.md §2.4).

The only JVM -> Python crossing in the whole pipeline: an Arrow-batched
pandas UDF over (text_a, text_b) columns calling
kernels.banded.batch_banded_distance. Distances above the budget come back
as the sentinel n+1 (reference B6 early termination), so `match_filter` is a
plain native `distance <= n` predicate.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..config import LinkConfig
from ..kernels.banded import batch_banded_distance

__all__ = ["distance_udf", "attach_texts", "score_pairs", "match_filter", "normalized_similarity"]


def distance_udf(n: int, algorithm: str):
    """Arrow-batched pandas UDF computing the variant distance (or n+1)."""

    @pandas_udf("integer")
    def dist(a: pd.Series, b: pd.Series) -> pd.Series:
        out = batch_banded_distance(
            a.fillna("").tolist(), b.fillna("").tolist(), n, algorithm
        )
        return pd.Series(out)

    return dist


def attach_texts(
    pairs: DataFrame,
    entities: DataFrame,
    id_col: str = "conv_id",
    text_col: str = "fingerprint",
) -> DataFrame:
    """Re-join the (narrow) pair ids with their texts just before scoring —
    texts never ride through the blocking join (SURVEY.md §4.2)."""
    ea = entities.select(F.col(id_col).alias("id_a"), F.col(text_col).alias("text_a"))
    eb = entities.select(F.col(id_col).alias("id_b"), F.col(text_col).alias("text_b"))
    return pairs.join(ea, "id_a").join(eb, "id_b")


def score_pairs(
    pairs: DataFrame,
    entities: DataFrame,
    conf: LinkConfig,
    id_col: str = "conv_id",
    text_col: str = "fingerprint",
) -> DataFrame:
    """(id_a, id_b) -> (id_a, id_b, distance). Applies the length-band
    pre-filter (|len_a - len_b| <= n, valid for all three variants — every
    unit op changes length by at most 1) natively before the kernel sees the
    pair, so Python only ever scores feasible pairs."""
    n = conf.max_distance
    with_texts = attach_texts(pairs, entities, id_col, text_col)
    feasible = with_texts.filter(
        F.abs(F.length("text_a") - F.length("text_b")) <= n
    )
    dist = distance_udf(n, conf.algorithm)
    return feasible.select(
        "id_a", "id_b", dist(F.col("text_a"), F.col("text_b")).alias("distance")
    )


def match_filter(scored: DataFrame, conf: LinkConfig) -> DataFrame:
    """Keep pairs within the distance budget (the reference's accepted
    candidate set, README.md:13-15)."""
    return scored.filter(F.col("distance") <= conf.max_distance)


def normalized_similarity(scored: DataFrame, entities: DataFrame,
                          id_col: str = "conv_id", text_col: str = "fingerprint") -> DataFrame:
    """Optional 1 - d / max(len) similarity column (P6 option)."""
    lens = entities.select(F.col(id_col), F.length(text_col).alias("_len"))
    la = lens.select(F.col(id_col).alias("id_a"), F.col("_len").alias("len_a"))
    lb = lens.select(F.col(id_col).alias("id_b"), F.col("_len").alias("len_b"))
    return (
        scored.join(la, "id_a").join(lb, "id_b")
        .withColumn(
            "similarity",
            F.when(F.greatest("len_a", "len_b") == 0, F.lit(1.0)).otherwise(
                1.0 - F.col("distance") / F.greatest("len_a", "len_b")
            ),
        )
        .drop("len_a", "len_b")
    )
