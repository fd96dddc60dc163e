from .candidates import block_keys, candidate_pairs, salted_cross_pairs
from .canonicalize import canonicalize, turns_roundtrip
from .clustering import assign_clusters, connected_components
from .scoring import attach_texts, distance_udf, match_filter, score_pairs

__all__ = [
    "assign_clusters", "attach_texts", "block_keys", "candidate_pairs",
    "canonicalize", "connected_components", "distance_udf", "match_filter",
    "salted_cross_pairs", "score_pairs", "turns_roundtrip",
]
