"""End-to-end logical plan: transcripts -> entity clusters (SURVEY.md §3.2).

One declarative DataFrame DAG — Catalyst owns pushdown/pruning/join
selection; the only imperative pieces are the CC fixpoint loop and the
checkpoint-ledger wave loop (operators.ledger)."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import LinkConfig
from ..operators.candidates import block_keys, candidate_pairs
from ..operators.canonicalize import canonicalize
from ..operators.clustering import assign_clusters, pivot_clusters, star_clusters
from ..operators.scoring import match_filter, score_pairs

__all__ = ["LinkResult", "exact_groups", "run_linkage"]


@dataclass
class LinkResult:
    canonical: DataFrame  # (conv_id, turns, n_turns, fingerprint, fp_len)
    pairs: DataFrame      # (id_a, id_b) candidate pairs (over reps when contracted)
    scored: DataFrame     # (id_a, id_b, distance)  (over reps when contracted)
    matches: DataFrame    # scored with distance <= n
    clusters: DataFrame   # (conv_id, cluster_id) — always over ALL entities


def exact_groups(canonical: DataFrame, id_col: str = "conv_id",
                 text_col: str = "fingerprint") -> DataFrame:
    """(id, _rep): exact-duplicate membership — every entity mapped to the
    minimum id sharing its md5(fingerprint). The representative of each
    group is its own _rep."""
    keyed = canonical.select(F.col(id_col), F.md5(F.col(text_col)).alias("_fp"))
    groups = keyed.groupBy("_fp").agg(F.min(id_col).alias("_rep"))
    return keyed.join(groups, "_fp").select(id_col, "_rep")


def run_linkage(transcripts: DataFrame, conf: LinkConfig | None = None,
                contract_exact: bool = False) -> LinkResult:
    """The reference's transduce-as-self-fuzzy-join plus clustering:
    canonicalize (P2) -> block keys (P3) -> candidate pairs (P4) ->
    banded-kernel scoring (P5) -> match filter (P6) -> connected
    components (P7).

    contract_exact=True first collapses exact-duplicate fingerprints to one
    representative per group — the dominant skew source in real transcript
    corpora (boilerplate conversations) otherwise drags a C(N,2)
    distance-0 clique through blocking, scoring and CC. With the default
    cc strategy the final cluster partition is PROVABLY unchanged:
    d(member, x) = d(rep, x) for every x, member-rep edges are distance 0,
    and each rep is its group's minimum id, so component minima (= cluster
    ids) are identical (equivalence gated in tests/test_pipeline.py).
    With cluster_strategy='star' that equivalence does NOT hold — the
    contracted result is DEFINED as star clustering over distinct
    fingerprints with members expanded into their representative's
    cluster, which additionally guarantees exact duplicates co-cluster
    (plain star can self-center two exact duplicates separately when
    neither's neighborhood contains a center; see
    tests/test_pipeline.py::test_cluster_strategy_star_contracted).
    The pairs/scored/matches frames are
    then over representatives only — use the default when the
    member-level match set itself is the deliverable (it is inherently
    quadratic in exact-group sizes), the contracted mode when clusters
    are (dedup, entity resolution at scale)."""
    conf = conf or LinkConfig()
    canonical = canonicalize(transcripts, conf.fingerprint_sep)
    if contract_exact:
        membership = exact_groups(canonical)
        reps = canonical.join(
            membership.filter(F.col("conv_id") == F.col("_rep")).select("conv_id"),
            "conv_id",
        )
    else:
        reps = canonical
    build, probe = block_keys(reps, conf)
    pairs = candidate_pairs(build, probe, conf)
    scored = score_pairs(pairs, reps, conf)
    matches = match_filter(scored, conf)
    if conf.cluster_strategy == "star":
        rep_clusters = star_clusters(reps.select("conv_id"), matches).withColumnRenamed(
            "star_id", "cluster_id"
        )
    elif conf.cluster_strategy == "pivot":
        rep_clusters = pivot_clusters(
            reps.select("conv_id"), matches
        ).withColumnRenamed("pivot_id", "cluster_id")
    else:
        rep_clusters = assign_clusters(reps, matches, max_iterations=conf.cc_max_iterations)
    if contract_exact:
        clusters = (
            membership.join(
                rep_clusters.withColumnRenamed("conv_id", "_rep"), "_rep"
            ).select("conv_id", "cluster_id")
        )
    else:
        clusters = rep_clusters
    return LinkResult(canonical, pairs, scored, matches, clusters)
