"""Canopy clustering as a blocking stage (McCallum, Nigam & Ungar, KDD 2000).

Canopies use a CHEAP similarity (q-gram Jaccard over the blocking
signature) to carve the corpus into overlapping coarse groups; the
expensive metric (the banded edit-distance kernel) runs only within
groups.  This rounds out the repo's blocking catalog (deletion
neighborhoods, positional q-grams, soundex, sorted neighborhood, LSH
bands, learned schemes) with the cheap-metric-canopy family every ER
survey lists alongside them.

The original algorithm is sequential-greedy: pick a center from the pool,
add every point within loose threshold T1 to its canopy, remove every
point within tight threshold T2 from the pool.  That loop is inherently
order-dependent, so this module is the deterministic data-parallel
re-expression (Mahout's two-threshold distributed canopy is the public
precedent):

1. centers are chosen by a portable hash rule
   (``portable_hash64(id) % center_mod == 0``) instead of pool order;
2. near-duplicate centers contract deterministically: a center is DEMOTED
   when a smaller-id center lies within T2 — the parallel analogue of
   "points within T2 of a chosen center never become centers";
3. every entity joins all surviving canopies within T1, UNLESS some canopy
   is within T2 — then it joins ONLY its best canopy (max Jaccard, ties to
   the smallest center id) — the analogue of removal from the pool;
4. entities no canopy claims become their own canopy keyed on their exact
   signature — exactly what the sequential pass does to residual points
   (identical residuals land in one canopy because their distance is
   0 < T2).

Identical-signature entities therefore ALWAYS share a canopy: they have
identical Jaccard profiles, so rule 3 locks them to the same best center,
rule 2 contracts them when both are centers, and rule 4 co-buckets them
when unclaimed (property-tested in tests/test_canopy.py).

Scale shape (100 TB): candidate (entity, center) pairs come from an
INVERTED INDEX on signature q-grams with block purging — grams shared by
more than ``df_cap`` entities are dropped from pair GENERATION only (the
standard Papadakis block-cleaning trade, same knob as
``dedup.jaccard_pairs``) — and Jaccard is re-scored EXACTLY for surfaced
pairs by joining back to the full gram sets (cost ∝ candidates ×
grams-per-sig).  No all-pairs step exists; canopy sizes are governed by
t1/center_mod/df_cap, and the final co-member self-join is bounded by the
largest canopy the same way every other blocking scheme in this repo is.

Reference parity: the reference transducer bounds the expensive metric by
a dictionary automaton (/root/reference/README.md:13-24); canopies are the
classic ER alternative that bounds it by a cheap metric.  McCallum, Nigam
& Ungar, "Efficient clustering of high-dimensional data sets with
application to reference matching", KDD 2000 [PK].
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import gate_round4, portable_hash64

__all__ = ["sig_grams", "canopy_members", "canopy_pairs"]


def sig_grams(entities: DataFrame, id_col: str = "conv_id",
              sig_col: str = "sig", q: int = 3) -> DataFrame:
    """Distinct (id, gram) rows: sliding q-gram windows of the signature.
    Signatures shorter than q contribute themselves as their single gram
    (the short-string convention of ``functions.blocking.qgram_keys``)."""
    sig = F.col(sig_col)
    grams = F.when(F.length(sig) < q, F.array(sig)).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length(sig) - (q - 1)),
            lambda p: sig.substr(p, F.lit(q)),
        )
    )
    return entities.select(F.col(id_col), F.explode(grams).alias("gram")).distinct()


def _exact_jaccard(g: DataFrame, sizes: DataFrame, cands: DataFrame,
                   id_col: str) -> DataFrame:
    """Exact q-gram Jaccard for a GIVEN candidate (id_a, id_b) set, joined
    back to the FULL gram sets — the df-cap purge prunes pair generation
    only, never the reported value (the ``dedup.jaccard_for_pairs``
    contract).  Returns (id_a, id_b, j) with j round4'd BEFORE any
    threshold compare so both engines gate on the same double."""
    ga = g.select(F.col(id_col).alias("id_a"), "gram")
    gb = g.select(F.col(id_col).alias("id_b"), "gram")
    inter = (
        cands.join(ga, "id_a")
        .join(gb, ["id_b", "gram"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    za = sizes.select(F.col(id_col).alias("id_a"), F.col("n_g").alias("n_a"))
    zb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_g").alias("n_b"))
    return inter.join(za, "id_a").join(zb, "id_b").select(
        "id_a", "id_b",
        gate_round4(
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        ).alias("j"),
    )


def canopy_members(entities: DataFrame, id_col: str = "conv_id",
                   sig_col: str = "sig", center_mod: int = 4,
                   t1: float = 0.35, t2: float = 0.75, q: int = 3,
                   df_cap: int | None = 64) -> DataFrame:
    """(id, canopy_id) memberships under the deterministic parallel canopy
    rules documented in the module docstring.  canopy_id is a surviving
    center's entity id, or ``'r|' + sig`` for residual entities no canopy
    claims."""
    g = sig_grams(entities, id_col, sig_col, q).localCheckpoint(eager=True)
    sizes = g.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_g"))
    if df_cap is not None:
        rare = (
            g.groupBy("gram").agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= df_cap).select("gram")
        )
        gp = g.join(rare, "gram")
    else:
        gp = g

    centers0 = entities.select(id_col).filter(
        F.pmod(portable_hash64(id_col), F.lit(center_mod)) == 0
    )
    gpc0 = gp.join(centers0, id_col)

    # center contraction: a center is demoted when a smaller-id center
    # lies within the tight threshold
    ca = gpc0.select(F.col(id_col).alias("id_a"), "gram")
    cb = gpc0.select(F.col(id_col).alias("id_b"), "gram")
    cand_cc = (
        ca.join(cb, "gram")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    demoted = (
        _exact_jaccard(g, sizes, cand_cc, id_col)
        .filter(F.col("j") >= t2)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    centers = centers0.join(demoted, id_col, "left_anti")

    # entity -> surviving-center candidates from the purged inverted index
    ea = gp.select(F.col(id_col).alias("id_a"), "gram")
    eb = gp.join(centers, id_col).select(F.col(id_col).alias("id_b"), "gram")
    cand_ec = (
        ea.join(eb, "gram")
        .filter(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    ej = _exact_jaccard(g, sizes, cand_ec, id_col).filter(F.col("j") >= t1)

    by_entity = Window.partitionBy("id_a")
    ranked = ej.withColumn(
        "rn",
        F.row_number().over(
            by_entity.orderBy(F.col("j").desc(), F.col("id_b").asc())
        ),
    ).withColumn("mj", F.max("j").over(by_entity))
    assigned = ranked.filter(
        ((F.col("mj") >= t2) & (F.col("rn") == 1)) | (F.col("mj") < t2)
    ).select(F.col("id_a").alias(id_col), F.col("id_b").alias("canopy_id"))

    selfm = centers.select(F.col(id_col), F.col(id_col).alias("canopy_id"))
    covered = assigned.select(id_col).union(centers.select(id_col)).distinct()
    residual = entities.join(covered, id_col, "left_anti").select(
        F.col(id_col), F.concat(F.lit("r|"), F.col(sig_col)).alias("canopy_id")
    )
    return assigned.unionByName(selfm).unionByName(residual)


def canopy_pairs(members: DataFrame, id_col: str = "conv_id") -> DataFrame:
    """Candidate pairs = distinct canonical co-members of any canopy."""
    a = members.select(F.col(id_col).alias("id_a"), "canopy_id")
    b = members.select(F.col(id_col).alias("id_b"), "canopy_id")
    return (
        a.join(b, "canopy_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
