"""P1/P2 — transcript scan + canonicalization (SURVEY.md §2.4).

Each multi-turn conversation becomes one entity record: the turns array
(ordered by turn_idx) stays authoritative so per-turn text equality vs the
source is checkable (BASELINE.json input_hint invariant), and a joined
fingerprint string is the unit the edit-distance kernels compare — the
reference's 'term' (liblevenshtein README.md:13-14) at conversation
granularity.

All native Spark: one hash-aggregate shuffle on conv_id, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import FINGERPRINT_SEP

__all__ = ["canonicalize", "turns_roundtrip"]


def canonicalize(transcripts: DataFrame, sep: str = FINGERPRINT_SEP) -> DataFrame:
    """transcripts(conv_id, turn_idx, role, text, tool, ts) ->
    (conv_id, turns array<string>, n_turns, fingerprint, fp_len).

    Stable (conv_id, turn_idx) ordering via sort_array over structs — the
    struct comparator orders by the leading turn_idx field, so ordering is
    deterministic regardless of shuffle arrival order."""
    return (
        transcripts
        .select("conv_id", "turn_idx", F.coalesce(F.col("text"), F.lit("")).alias("text"))
        .groupBy("conv_id")
        .agg(F.sort_array(F.collect_list(F.struct("turn_idx", "text"))).alias("ordered"))
        .select(
            "conv_id",
            F.expr("transform(ordered, t -> t.text)").alias("turns"),
        )
        .select(
            "conv_id",
            "turns",
            F.size("turns").alias("n_turns"),
            F.array_join("turns", sep).alias("fingerprint"),
        )
        .withColumn("fp_len", F.length("fingerprint"))
    )


def turns_roundtrip(canonical: DataFrame) -> DataFrame:
    """Explode canonical turns back to (conv_id, turn_idx, text) — used by
    the per-turn-equality invariant test (SURVEY.md §5.2 'canonicalize')."""
    return canonical.select(
        "conv_id", F.posexplode("turns").alias("turn_idx", "text")
    )
