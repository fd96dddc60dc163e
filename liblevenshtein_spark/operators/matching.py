"""One-to-one match assignment: distributed greedy maximum-weight matching
via locally-dominant edge selection.

Two-source record linkage (link a probe batch against a reference corpus —
the ER framing of the reference's transduce query, where the query set is a
whole table instead of one term) usually ends with an ASSIGNMENT constraint:
each probe record may match at most one reference record and vice versa
(a probe is one real-world entity; two probes cannot both BE reference
record r). The candidate scores alone don't enforce that — this operator
does. The general-graph mode (``bipartite=False``) serves the dedup twin:
pick a DISJOINT set of near-dup pairs (no document touched twice) to merge
in one parallel wave.

Algorithm: iterated locally-dominant edge matching (Preis 1999; Manne &
Bisseling 2007 — the standard parallelization of greedy matching). Each
round keeps every edge that is the best incident edge of BOTH its
endpoints under a strict total order on edges, removes the matched nodes'
remaining edges, and repeats until no edges remain. With a strict total
order the fixpoint is exactly the sequential greedy matching (the globally
best remaining edge is always locally dominant, so the rounds peel the
same edges sequential greedy would take, just many per round), which is a
1/2-approximation of the maximum-weight matching — the classic quality/
scalability trade for assignment at corpus scale (the exact Hungarian
algorithm is inherently sequential and O(n^3)).

Scale shape: each bipartite round is two window ranks partitioned by the
endpoint columns plus two anti-joins, all on narrow id/weight rows; the
general-graph round symmetrizes to an incidence list first (one extra
narrow union + hash agg). The number of rounds is O(log m) expected on
random weight orders and bounded by the matching size in the worst case.
Lineage is truncated per round with an eager localCheckpoint; the
emptiness probe is a limit(1) collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["one_to_one"]


def one_to_one(pairs: DataFrame, left_col: str = "id_a",
               right_col: str = "id_b", weight_col: str = "distance",
               ascending: bool = True, max_rounds: int = 200,
               bipartite: bool = True) -> DataFrame:
    """Greedy one-to-one matching over candidate pairs.

    With ``bipartite=True`` (default) the ``left_col`` and ``right_col`` id
    spaces must be disjoint (each node appears on one fixed side). With
    ``bipartite=False`` both columns share one id space (a general graph —
    e.g. near-dup pairs within one corpus) and rows must be canonical
    (left < right). In both modes (left, right) rows must be distinct.
    Edges are ordered by the strict total order (weight ``ascending``/
    descending, left asc, right asc); ties in weight are broken by ids so
    the result is deterministic and engine-reproducible.

    Returns the matched subset: (left, right, weight, round:int), where
    ``round`` is the peel round that locked the edge in — a useful audit
    column (round-1 edges are mutual best matches; later rounds are
    consolation assignments that only exist because better partners were
    taken). Unmatched nodes simply don't appear.

    Raises after ``max_rounds`` non-converged rounds. Each round matches at
    least one edge (the globally best remaining edge is always locally
    dominant), so rounds are bounded by the matching size — but a
    monotone-weight contention CHAIN legitimately matches only one edge
    per round (p1-r1 < p2-r1 < p2-r2 < p3-r2 < ...), so deep chains need
    proportionally many rounds: size ``max_rounds`` to the longest
    contention path you accept before declaring the input pathological
    (duplicate rows / violated mode contract loop forever without the
    guard)."""
    w = F.col(weight_col).asc() if ascending else F.col(weight_col).desc()
    rem = pairs.select(left_col, right_col, weight_col).localCheckpoint(eager=True)
    out: DataFrame | None = None
    for rnd in range(1, max_rounds + 1):
        if not rem.limit(1).take(1):
            break
        if bipartite:
            wl = Window.partitionBy(left_col).orderBy(w, F.col(right_col).asc())
            wr = Window.partitionBy(right_col).orderBy(w, F.col(left_col).asc())
            dom = (
                rem.withColumn("_rl", F.row_number().over(wl))
                .withColumn("_rr", F.row_number().over(wr))
                .filter((F.col("_rl") == 1) & (F.col("_rr") == 1))
                .select(left_col, right_col, weight_col,
                        F.lit(rnd).cast("int").alias("round"))
                .localCheckpoint(eager=True)
            )
            rem = (
                rem.join(dom.select(left_col), left_col, "left_anti")
                .join(dom.select(right_col), right_col, "left_anti")
                .localCheckpoint(eager=True)
            )
        else:
            # general graph: symmetrize to an incidence list, take each
            # node's preferred edge, keep edges preferred by BOTH endpoints
            inc = rem.select(
                F.col(left_col).alias("_node"), left_col, right_col, weight_col
            ).unionByName(
                rem.select(F.col(right_col).alias("_node"),
                           left_col, right_col, weight_col)
            )
            wn = Window.partitionBy("_node").orderBy(
                w, F.col(left_col).asc(), F.col(right_col).asc())
            pref = inc.withColumn("_r", F.row_number().over(wn)).filter(
                F.col("_r") == 1)
            dom = (
                pref.groupBy(left_col, right_col)
                .agg(F.count("*").alias("_c"), F.min(weight_col).alias(weight_col))
                .filter(F.col("_c") == 2)
                .select(left_col, right_col, weight_col,
                        F.lit(rnd).cast("int").alias("round"))
                .localCheckpoint(eager=True)
            )
            nodes = dom.select(F.col(left_col).alias("_node")).unionByName(
                dom.select(F.col(right_col).alias("_node"))).distinct()
            rem = (
                rem.join(nodes.withColumnRenamed("_node", left_col),
                         left_col, "left_anti")
                .join(nodes.withColumnRenamed("_node", right_col),
                      right_col, "left_anti")
                .localCheckpoint(eager=True)
            )
        out = dom if out is None else out.unionByName(dom)
    if rem.limit(1).take(1):
        raise RuntimeError(
            f"one_to_one did not converge within {max_rounds} rounds; "
            "are the (left, right) rows distinct and the mode contract met?"
        )
    if out is None:
        schema_src = pairs.select(
            left_col, right_col, weight_col, F.lit(0).cast("int").alias("round")
        )
        return schema_src.limit(0)
    return out
