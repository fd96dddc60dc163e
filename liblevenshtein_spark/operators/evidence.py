"""Auxiliary-evidence fusion for entity resolution: relational (set-overlap)
evidence and temporal decay over the scored pair stream.

The reference transducer scores pairs on TEXT alone (README.md:13-24); real
mastering pipelines fuse the textual score with whatever other evidence the
records carry — which tools a conversation invoked, when it happened. These
operators add the two standard auxiliary-evidence families:

- `relational_jaccard`: one round of relational evidence in the
  Bhattacharya–Getoor collective-ER sense (VLDB J. 2007, simplified to the
  attribute+relational similarity combination): each entity owns a sparse
  profile of related items, and a candidate pair earns the Jaccard overlap
  of the two profiles. Implemented as sparse (id, item) joins — profiles
  are never collected into dense arrays, so the shape survives profiles of
  any cardinality at 10^12-turn scale (same discipline as the TF-IDF
  comparator: operators/comparators.py).
- `time_decay_weights`: temporal record linkage in the Li–Dong–Srivastava
  sense (PVLDB 4(11), 2011 — agreement decay): agreement evidence weakens
  as the time gap between two records grows. The decay kernel here is the
  RATIONAL 1 / (1 + delta/tau) rather than exp(-delta/tau): monotone in the
  gap like the paper's decay curves, but exactly reproducible across
  engines (pure field arithmetic — no libm, so the DuckDB oracle and Spark
  agree bit-for-bit before the gate rounding).

Both consume the already-blocked pair stream only — nothing quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["relational_jaccard", "time_decay_weights"]


def relational_jaccard(pairs: DataFrame, profile: DataFrame,
                       id_col: str = "conv_id",
                       item_col: str = "item") -> DataFrame:
    """Per-pair Jaccard overlap of two entities' sparse item profiles.

    `pairs`: (id_a, id_b, ...passthrough cols); `profile`: distinct
    (id_col, item_col) rows. Returns the input pair columns plus
    (n_common, n_union, rel_jaccard) with rel_jaccard = common/union and
    0.0 when both profiles are empty (union = 0).

    Scale shape: |profile_a ∩ profile_b| comes from joining the pair
    stream to the (id, item) table on each side and counting matching
    items — cost ∝ Σ_pairs |common items|, never |A|×|B|; profile sizes
    are one map-side-combined agg joined back by id. No arrays, no UDFs.
    """
    sizes = profile.groupBy(id_col).agg(F.count("*").cast("int").alias("_n"))
    pa = profile.select(F.col(id_col).alias("id_a"), F.col(item_col).alias("_item"))
    pb = profile.select(F.col(id_col).alias("id_b"), F.col(item_col).alias("_item"))
    inter = (
        pairs.select("id_a", "id_b")
        .join(pa, "id_a")
        .join(pb, ["id_b", "_item"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("int").alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("_n").alias("_na"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("_n").alias("_nb"))
    out = (
        pairs.join(inter, ["id_a", "id_b"], "left")
        .join(sa, "id_a", "left")
        .join(sb, "id_b", "left")
        .withColumn("n_common", F.coalesce(F.col("n_common"), F.lit(0)).cast("int"))
        .withColumn(
            "n_union",
            (F.coalesce(F.col("_na"), F.lit(0)) + F.coalesce(F.col("_nb"), F.lit(0))
             - F.col("n_common")).cast("int"),
        )
    )
    jac = F.when(F.col("n_union") == 0, F.lit(0.0)).otherwise(
        F.col("n_common") / F.col("n_union")
    )
    return out.withColumn("rel_jaccard_raw", jac).drop("_na", "_nb")


def time_decay_weights(pairs: DataFrame, timestamps: DataFrame,
                       tau: float, id_col: str = "conv_id",
                       ts_col: str = "day") -> DataFrame:
    """Attach a temporal decay weight to each pair: both entities' integer
    timestamps (`ts_col`, e.g. epoch days) join on, and the pair gets
    delta = |t_a - t_b| and decay_w_raw = 1.0 / (1.0 + delta / tau).

    tau is the gap (in ts units) at which evidence halves. Rational decay
    keeps the arithmetic engine-portable (module docstring); callers fuse
    `decay_w_raw` into their score and gate-round the product once.
    """
    ta = timestamps.select(F.col(id_col).alias("id_a"), F.col(ts_col).alias("_ta"))
    tb = timestamps.select(F.col(id_col).alias("id_b"), F.col(ts_col).alias("_tb"))
    return (
        pairs.join(ta, "id_a").join(tb, "id_b")
        .withColumn("delta_ts", F.abs(F.col("_ta") - F.col("_tb")).cast("int"))
        .withColumn("decay_w_raw", F.lit(1.0) / (F.lit(1.0) + F.col("delta_ts") / F.lit(tau)))
        .drop("_ta", "_tb")
    )
