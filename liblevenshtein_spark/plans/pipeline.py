"""End-to-end logical plan: transcripts -> entity clusters (SURVEY.md §3.2).

One declarative DataFrame DAG — Catalyst owns pushdown/pruning/join
selection; the only imperative pieces are the CC fixpoint loop and the
checkpoint-ledger wave loop (operators.ledger)."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from ..config import LinkConfig
from ..operators.candidates import block_keys, candidate_pairs
from ..operators.canonicalize import canonicalize
from ..operators.clustering import assign_clusters
from ..operators.scoring import match_filter, score_pairs

__all__ = ["LinkResult", "run_linkage"]


@dataclass
class LinkResult:
    canonical: DataFrame  # (conv_id, turns, n_turns, fingerprint, fp_len)
    pairs: DataFrame      # (id_a, id_b) candidate pairs
    scored: DataFrame     # (id_a, id_b, distance)
    matches: DataFrame    # scored with distance <= n
    clusters: DataFrame   # (conv_id, cluster_id)


def run_linkage(transcripts: DataFrame, conf: LinkConfig | None = None) -> LinkResult:
    """The reference's transduce-as-self-fuzzy-join plus clustering:
    canonicalize (P2) -> block keys (P3) -> candidate pairs (P4) ->
    banded-kernel scoring (P5) -> match filter (P6) -> connected
    components (P7)."""
    conf = conf or LinkConfig()
    canonical = canonicalize(transcripts, conf.fingerprint_sep)
    build, probe = block_keys(canonical, conf)
    pairs = candidate_pairs(build, probe, conf)
    scored = score_pairs(pairs, canonical, conf)
    matches = match_filter(scored, conf)
    clusters = assign_clusters(canonical, matches, max_iterations=conf.cc_max_iterations)
    return LinkResult(canonical, pairs, scored, matches, clusters)
