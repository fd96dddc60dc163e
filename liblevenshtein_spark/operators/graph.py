"""Match-graph audit operators: triangle support, cluster cohesion, and
bridge-pruned re-clustering.

Transitive connected components (P7, `operators/clustering.py`) weld whole
components into one entity, so a single false-positive match edge can merge
two unrelated entities — the classic mega-cluster failure mode of web-scale
ER. The reference library stops at per-query candidate sets
(`/root/reference/README.md:13-15`), so it never faces this; a 10^12-turn
linkage deployment faces it on every run. The standard graph-side defense
is edge corroboration: a genuine duplicate group is dense (its members all
match each other), while a false weld hangs on a single uncorroborated
edge. These operators compute that evidence and act on it:

* ``edge_support``     — per match edge, the number of common neighbors
  (= triangles through the edge). support=0 means NO third record
  corroborates the link — a bridge-like edge.
* ``cluster_cohesion`` — per cluster, edge density |E| / C(n,2); a large
  low-density cluster is the mega-cluster signature.
* ``robust_clusters``  — re-cluster after dropping uncorroborated weak
  edges inside oversized clusters (a k-truss-flavored prune, cf. Cohen
  2008 "Trusses: cohesive subgraphs for social network analysis" and the
  common-neighbor edge filters of production ER systems).

Scale shapes: everything is keyed joins and hash aggregations on id pairs
— no texts, no kernels. ``edge_support`` is the standard edge-local
triangle-count join (fan-out Σ_edges deg(endpoint)); post-ER match graphs
are sparse (degree bounded by near-dup group size), and the prune in
``robust_clusters`` computes support only on the SUSPECT subgraph, so its
cost is bounded by the mass of oversized clusters, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import gate_round4
from .clustering import assign_clusters

__all__ = ["edge_support", "cluster_cohesion", "robust_clusters", "knn_graph"]


def edge_support(matches: DataFrame, id_a: str = "id_a",
                 id_b: str = "id_b") -> DataFrame:
    """Per-edge triangle support: for every match edge (a, b), the number
    of common neighbors |N(a) ∩ N(b)| in the undirected match graph.

    Input edges must be canonical (``id_a`` < ``id_b``, no self loops, no
    duplicates) — the shape every pair stream in this engine already has.
    All other input columns are preserved; one ``support: int`` column is
    appended (0 when no triangle closes over the edge).

    Physical shape: symmetrize once, then two hash joins keyed on node ids
    close each wedge (a—c, b—c) against the edge list; a common neighbor c
    can never equal a or b (the graph has no self loops), so no extra
    filter is needed. Only ids ride the joins; the groupBy has map-side
    combine. Fan-out is Σ_(a,b)∈E deg(a) — linear in the wedge count, the
    same bound as any triangle enumeration keyed by edge."""
    e = matches
    pairs = e.select(id_a, id_b)
    adj = pairs.select(F.col(id_a).alias("_u"), F.col(id_b).alias("_v")).unionByName(
        pairs.select(F.col(id_b).alias("_u"), F.col(id_a).alias("_v"))
    )
    na = adj.select(F.col("_u").alias(id_a), F.col("_v").alias("_cn"))
    nb = adj.select(F.col("_u").alias(id_b), F.col("_v").alias("_cn"))
    tri = (
        pairs.join(na, id_a)
        .join(nb, [id_b, "_cn"])
        .groupBy(id_a, id_b)
        .agg(F.count("*").cast("int").alias("support"))
    )
    return (
        e.join(tri, [id_a, id_b], "left")
        .withColumn("support", F.coalesce("support", F.lit(0)))
    )


def transitivity_stats(matches: DataFrame, id_a: str = "id_a",
                       id_b: str = "id_b") -> DataFrame:
    """Global transitivity audit of the match graph: one row with the wedge
    census — (n_edges, n_wedges, n_closed_wedges, n_open_wedges,
    transitivity) where transitivity = closed / all wedges, the global
    clustering coefficient (= 3·triangles / wedges).

    Why it matters for ER: "a matches b" and "b matches c" should imply
    "a matches c" for a true equivalence relation; every OPEN wedge is a
    transitivity violation the CC step will weld anyway.  A healthy
    linkage run has transitivity near 1; a falling value means the
    threshold is admitting chain-like (bridge) matches — the leading
    indicator of mega-cluster welds, one number per run for the
    production dashboard.

    Physical shape: symmetrize the edge list, self-join on the wedge
    center (fan-out Σ_v deg(v)² — the standard wedge-enumeration bound,
    small on post-ER sparse graphs), close each wedge against the
    canonical edge list with one left join, then a single global agg and
    a 1-row cross join for the edge count.  Only ids ride the shuffles."""
    pairs = matches.select(id_a, id_b)
    adj = pairs.select(F.col(id_a).alias("_v"), F.col(id_b).alias("_u")).unionByName(
        pairs.select(F.col(id_b).alias("_v"), F.col(id_a).alias("_u"))
    )
    w1 = adj.select("_v", F.col("_u").alias(id_a))
    w2 = adj.select("_v", F.col("_u").alias(id_b))
    wedges = w1.join(w2, "_v").filter(F.col(id_a) < F.col(id_b)).select(id_a, id_b)
    flagged = wedges.join(
        pairs.withColumn("_closed", F.lit(1)), [id_a, id_b], "left"
    ).select(F.coalesce("_closed", F.lit(0)).alias("_closed"))
    n_edges = pairs.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    stats = flagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_wedges"),
        F.coalesce(F.sum("_closed"), F.lit(0)).cast("bigint").alias("n_closed_wedges"),
    )
    return (
        n_edges.crossJoin(stats)
        .select(
            "n_edges",
            "n_wedges",
            "n_closed_wedges",
            (F.col("n_wedges") - F.col("n_closed_wedges")).cast("bigint")
            .alias("n_open_wedges"),
            F.when(F.col("n_wedges") == 0, F.lit(0.0))
            .otherwise(
                gate_round4(
                    F.col("n_closed_wedges") / F.col("n_wedges").cast("double")
                )
            )
            .alias("transitivity"),
        )
    )


def cluster_cohesion(assignment: DataFrame, matches: DataFrame,
                     id_col: str = "conv_id",
                     cluster_col: str = "cluster_id",
                     edge_a: str = "id_a", edge_b: str = "id_b") -> DataFrame:
    """Per-cluster cohesion: size, intra-cluster edge count, and edge
    density |E| / C(size, 2) for every cluster with at least 2 members.

    Density 1.0 is a clique (every member directly matches every other —
    the shape of a genuine duplicate group); a large cluster with density
    near 2/size is a chain, the mega-cluster drift signature that
    ``robust_clusters`` exists to break. The denominator is computed in
    DOUBLE before the multiply (bigint n*(n-1) overflows past ~3e9
    members). Two hash aggs + one key join; output is O(|clusters|)."""
    sizes = assignment.groupBy(cluster_col).agg(
        F.count("*").cast("int").alias("size")
    )
    ca = assignment.select(F.col(id_col).alias(edge_a),
                           F.col(cluster_col).alias("_ca"))
    cb = assignment.select(F.col(id_col).alias(edge_b),
                           F.col(cluster_col).alias("_cb"))
    intra = (
        matches.select(edge_a, edge_b)
        .join(ca, edge_a).join(cb, edge_b)
        .filter(F.col("_ca") == F.col("_cb"))
        .groupBy(F.col("_ca").alias(cluster_col))
        .agg(F.count("*").cast("bigint").alias("n_edges"))
    )
    return (
        sizes.filter(F.col("size") >= 2)
        .join(intra, cluster_col, "left")
        .withColumn("n_edges", F.coalesce("n_edges", F.lit(0)))
        .withColumn(
            "density",
            gate_round4(
                F.col("n_edges")
                / (F.col("size").cast("double") * (F.col("size") - 1) / 2.0)
            ),
        )
    )


def robust_clusters(entities: DataFrame, matches: DataFrame,
                    id_col: str = "conv_id",
                    min_support: int = 1,
                    size_threshold: int = 3,
                    weak_distance: int | None = None,
                    weight_col: str = "distance",
                    edge_a: str = "id_a", edge_b: str = "id_b") -> DataFrame:
    """Bridge-pruned re-clustering: connected components after dropping
    uncorroborated weak edges inside oversized clusters.

    Steps (all deterministic, so the result is oracle-checkable):

    1. baseline CC over all match edges;
    2. clusters with more than ``size_threshold`` members are SUSPECT;
    3. inside suspect clusters, drop every edge with triangle support
       below ``min_support`` — optionally only when its ``weight_col`` is
       at least ``weak_distance`` (prune only the weakest-evidence edges;
       ``None`` prunes regardless of weight);
    4. re-cluster ONLY the suspect subgraph; untouched clusters keep their
       assignments verbatim.

    The result equals CC over the globally pruned edge set (triangles never
    cross components, so per-component support equals global support, and
    pruning only removes suspect-internal edges — non-suspect components
    are untouched by construction). Documented trade: a genuine pair that
    happens to be uncorroborated (no shared third duplicate) inside a
    suspect cluster is split too — precision bought with recall, the
    standard posture once a cluster is already oversized; production
    re-verifies dropped edges at a stricter threshold before discarding.

    Scale shape: support is computed on the suspect SUBGRAPH only, so the
    triangle join is bounded by oversized-cluster mass; the re-clustering
    runs on suspect nodes only. With healthy blocking, suspect mass is a
    vanishing fraction of the corpus — the full-corpus CC (step 1) remains
    the dominant cost, unchanged from `assign_clusters`."""
    pairs = matches.select(
        F.col(edge_a).alias("id_a"), F.col(edge_b).alias("id_b"),
        *([F.col(weight_col)] if weak_distance is not None else []))
    base = assign_clusters(entities, pairs, id_col)
    sizes = base.groupBy("cluster_id").agg(F.count("*").alias("_sz"))
    suspect = sizes.filter(F.col("_sz") > size_threshold).select("cluster_id")
    sus_nodes = base.join(suspect, "cluster_id").select(id_col)

    ca = base.select(F.col(id_col).alias("id_a"), F.col("cluster_id").alias("_ca"))
    sus_edges = (
        pairs.join(ca, "id_a")
        .join(suspect.select(F.col("cluster_id").alias("_ca")), "_ca")
        .drop("_ca")
    )
    supported = edge_support(sus_edges, "id_a", "id_b")
    drop_cond = F.col("support") < min_support
    if weak_distance is not None:
        drop_cond = drop_cond & (F.col(weight_col) >= weak_distance)
    kept = supported.filter(~drop_cond).select("id_a", "id_b")

    sub = assign_clusters(sus_nodes, kept, id_col)
    untouched = base.join(suspect, "cluster_id", "left_anti")
    return untouched.select(id_col, "cluster_id").unionByName(
        sub.select(id_col, "cluster_id")
    )


def knn_graph(scored: DataFrame, k: int = 2, mutual: bool = True,
              id_a: str = "id_a", id_b: str = "id_b",
              dist_col: str = "distance") -> DataFrame:
    """Degree-bounded match graph: keep each node's k NEAREST match edges
    (rank by ascending distance, ties by neighbor id so the cut is
    deterministic), optionally only where BOTH endpoints keep each other
    (the mutual-kNN graph).

    Why this exists at 10^12-turn scale: clustering cost and mega-cluster
    risk are both driven by node degree — a hub record (boilerplate
    fingerprint, template conversation) with 10^5 match edges welds
    everything it touches and makes CC's shuffles quadratic-ish in the hot
    key. Capping every node at its k best edges bounds downstream work to
    O(k·n) edges TOTAL, and the mutual filter is the standard
    hub-suppressor: a hub is rarely among its victims' own top-k, so its
    spoke edges drop unless the attraction is reciprocated. This is the
    graph-sparsification twin of the blocking-side df_cap / block-purging
    guards — same discipline, applied after scoring instead of before.

    Physical shape: one symmetrize union, ONE window (partition by node,
    order by distance then id) over the match edges — bounded by the match
    volume, never the candidate volume — then a self-join of the two kept
    directions on the canonical pair key. No texts, no kernel, nothing
    quadratic.

    Returns canonical (id_a < id_b) rows (id_a, id_b, distance, rank_a,
    rank_b): rank_x = how the edge ranks among x's neighbors (1 = x's
    nearest). With mutual=False an edge survives if EITHER endpoint keeps
    it, and the losing side's rank is reported as it ranked pre-cut."""
    from pyspark.sql import Window

    sym = scored.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst"),
        F.col(dist_col).alias("_d"),
    ).unionByName(scored.select(
        F.col(id_b).alias("src"), F.col(id_a).alias("dst"),
        F.col(dist_col).alias("_d"),
    ))
    w = Window.partitionBy("src").orderBy(F.col("_d").asc(), F.col("dst").asc())
    ranked = sym.select(
        "src", "dst", "_d", F.row_number().over(w).alias("_rnk")
    )
    fwd = ranked.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias(id_a), F.col("dst").alias(id_b),
        F.col("_d").alias(dist_col), F.col("_rnk").alias("rank_a"),
    )
    rev = ranked.filter(F.col("src") > F.col("dst")).select(
        F.col("dst").alias(id_a), F.col("src").alias(id_b),
        F.col("_rnk").alias("rank_b"),
    )
    both = fwd.join(rev, [id_a, id_b])
    if mutual:
        return both.filter(
            (F.col("rank_a") <= k) & (F.col("rank_b") <= k)
        ).select(id_a, id_b, dist_col, "rank_a", "rank_b")
    return both.filter(
        (F.col("rank_a") <= k) | (F.col("rank_b") <= k)
    ).select(id_a, id_b, dist_col, "rank_a", "rank_b")
