from .candidates import block_keys, candidate_pairs, salted_cross_pairs
from .canonicalize import canonicalize, turns_roundtrip
from .clustering import (assign_clusters, connected_components,
                         entity_history, golden_records, stable_entity_ids)
from .graph import cluster_cohesion, edge_support, robust_clusters
from .matching import one_to_one
from .scoring import attach_texts, distance_udf, match_filter, score_pairs

__all__ = [
    "assign_clusters", "attach_texts", "block_keys", "candidate_pairs",
    "canonicalize", "cluster_cohesion", "connected_components",
    "distance_udf", "edge_support", "entity_history", "golden_records",
    "match_filter", "one_to_one", "robust_clusters", "salted_cross_pairs",
    "score_pairs", "stable_entity_ids", "turns_roundtrip",
]
