"""Structured Streaming surface.

The reference is strictly batch (single-shot queries over a static
dictionary — /root/reference/README.md:13-24); this package is the engine's
growth path beyond it: `incremental.py` runs the same blocking/scoring
operators incrementally via readStream + foreachBatch against an
append-only compiled dictionary, with exactly-once resume from the stream
checkpoint, plus watermarked windowed turn-volume metrics.
"""

from .incremental import (  # noqa: F401
    clusters_from_sink,
    compact_state,
    fold_clusters_state,
    matches_from_sink,
    retract_state,
    start_incremental_linkage,
    start_incremental_waterfall,
    start_retraction_stream,
    stream_transcripts,
    stream_turn_metrics,
    waterfall_groups_from_sink,
)
