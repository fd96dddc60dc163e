from .blocking import (
    deletion_neighborhood, exploded_keys, probe_keys, qgram_keys,
    segment_keys, single_deletions,
)

__all__ = [
    "deletion_neighborhood", "exploded_keys", "probe_keys", "qgram_keys",
    "segment_keys", "single_deletions",
]
