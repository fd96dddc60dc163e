"""Turn-level alignment of matched conversation pairs.

The reference compares whole terms (README.md:13-24); this engine's corpus
rows are multi-turn TRANSCRIPTS, and once the linkage layer has declared
two conversations near-duplicates the next audit question is WHICH TURNS
differ — the conversation delta behind dedup keep/drop decisions, prompt
drift review, and incremental re-training cuts.

`align_turns` computes, per matched pair, the anchored alignment a text
diff uses before running any quadratic matcher (trim the common prefix and
the common suffix; the remainder is the changed region):

  aligned_prefix — leading turns equal in both conversations
  aligned_suffix — trailing turns equal in the remainder (capped so
                   prefix + suffix ≤ min(n_turns)); computed on reverse
                   turn offsets so insertions/deletions at either end
                   anchor correctly
  changed_a/b    — n_turns − prefix − suffix per side (each side's
                   changed region; they differ when turns were inserted
                   or deleted rather than edited)

For near-duplicate pairs (small edit distance) the changed region IS the
exact diff; for general pairs it is the standard conservative bracket (a
superset of any LCS-based diff).  This deliberately avoids a per-pair
DP: prefix/suffix anchoring is pure joins + aggregations, expressible in
both engines, and linear in total turns.

Plan shape (the part that must survive 10^12 turns): the matched-pair
stream fans out to per-(pair, turn) rows via two id-keyed joins against
the turns table — cost Σ_pairs (n_a + n_b), linear in matched volume, not
corpus volume; a full outer join keyed (id_a, id_b, offset) lines the two
sides up; two hash aggregations (forward offsets for the prefix, reverse
offsets for the suffix) reduce each pair to one row.  Every join and agg
keys on the pair ids, so the whole operator is ONE shuffle family; no
window functions, no driver-side loops, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BIG = 1 << 30  # sentinel larger than any real turn count


def align_turns(
    matches: DataFrame,
    turns: DataFrame,
    id_col: str = "conv_id",
    idx_col: str = "turn_idx",
    text_col: str = "text",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Anchored prefix/suffix turn alignment for each (id_a, id_b) pair.

    Only the pair ids are read from `matches`, which must be a UNIQUE
    pair set (the match stream's contract; duplicates would multiply the
    fan-out joins).  Re-join the result to the match stream for
    distance/provenance columns.  `turns` is the
    exploded (conv_id, turn_idx, text) table with turn_idx dense from 0
    per conversation.
    """
    pairs = matches.select(id_a, id_b)
    n_turns = turns.groupBy(F.col(id_col).alias("id")).agg(
        F.count(F.lit(1)).cast("int").alias("n")
    )
    na = n_turns.select(F.col("id").alias(id_a), F.col("n").alias("n_turns_a"))
    nb = n_turns.select(F.col("id").alias(id_b), F.col("n").alias("n_turns_b"))
    sized = pairs.join(na, id_a).join(nb, id_b)

    ta = pairs.join(
        turns.select(
            F.col(id_col).alias(id_a),
            F.col(idx_col).alias("idx"),
            F.col(text_col).alias("_txt_a"),
        ),
        id_a,
    )
    tb = pairs.join(
        turns.select(
            F.col(id_col).alias(id_b),
            F.col(idx_col).alias("idx"),
            F.col(text_col).alias("_txt_b"),
        ),
        id_b,
    )

    # Forward pass: first turn index where the sides disagree (a missing
    # side counts as disagreement).  Joining on the column-name list makes
    # Spark emit coalesced key columns, so rows present on one side only
    # still carry the pair ids.
    fwd = ta.join(tb, [id_a, id_b, "idx"], "full")
    mismatch = (
        F.col("_txt_a").isNull()
        | F.col("_txt_b").isNull()
        | (F.col("_txt_a") != F.col("_txt_b"))
    )
    prefix = fwd.groupBy(id_a, id_b).agg(
        F.min(F.when(mismatch, F.col("idx"))).alias("_first_diff")
    )

    # Reverse pass: same join keyed by offset-from-the-end per side.
    ra = ta.join(na, id_a).select(
        id_a, id_b, (F.col("n_turns_a") - 1 - F.col("idx")).alias("off"), "_txt_a"
    )
    rb = tb.join(nb, id_b).select(
        id_a, id_b, (F.col("n_turns_b") - 1 - F.col("idx")).alias("off"), "_txt_b"
    )
    rev = ra.join(rb, [id_a, id_b, "off"], "full")
    suffix = rev.groupBy(id_a, id_b).agg(
        F.min(F.when(mismatch, F.col("off"))).alias("_first_rdiff")
    )

    min_n = F.least(F.col("n_turns_a"), F.col("n_turns_b"))
    lcp = F.least(F.coalesce(F.col("_first_diff"), F.lit(_BIG)), min_n).cast("int")
    sfx = F.least(
        F.coalesce(F.col("_first_rdiff"), F.lit(_BIG)),
        min_n - lcp,
    ).cast("int")
    return (
        sized.join(prefix, [id_a, id_b])
        .join(suffix, [id_a, id_b])
        .select(
            id_a,
            id_b,
            "n_turns_a",
            "n_turns_b",
            lcp.alias("aligned_prefix"),
            sfx.alias("aligned_suffix"),
            (F.col("n_turns_a") - lcp - sfx).cast("int").alias("changed_a"),
            (F.col("n_turns_b") - lcp - sfx).cast("int").alias("changed_b"),
        )
    )
