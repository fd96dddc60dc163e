"""Structured Streaming surface.

The reference is strictly batch (single-shot queries over a static
dictionary — /root/reference/README.md:13-24), so streaming is a declared
non-goal for v1 (SURVEY.md §1.2). `incremental.py` sketches the intended
growth path: readStream over the transcripts table + foreachBatch into the
same blocking/scoring operators with the checkpoint ledger as state.
"""
