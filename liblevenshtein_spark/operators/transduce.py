"""A3 — transduce(term, n): the reference's core query, Spark-native.

universal-automata/liblevenshtein README.md:13-15: "accept a query term and
return all terms in a dictionary that are within n spelling errors of the
query term", optionally with the exact distance (includeDistance). Here the
dictionary is a DataFrame of terms carrying precomputed blocking keys (the
'compiled DAWG'), queries are a DataFrame of (query_id, term), and the
automaton ∩ DAWG walk is a broadcast-able hash equi-join on blocking keys
followed by the banded kernel verify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import LinkConfig
from ..functions.blocking import deletion_neighborhood, probe_keys, segment_keys
from .scoring import score_attached

__all__ = ["compile_dictionary", "transduce"]


def _build_keys_col(text_col: str, conf: LinkConfig):
    if conf.blocking_scheme == "deletions":
        return deletion_neighborhood(text_col, conf.effective_deletion_depth)
    return segment_keys(text_col, conf.effective_segments)


def _probe_keys_col(text_col: str, conf: LinkConfig):
    if conf.blocking_scheme == "deletions":
        return deletion_neighborhood(text_col, conf.effective_deletion_depth)
    return probe_keys(text_col, conf.effective_segments, conf.max_distance)


def compile_dictionary(terms: DataFrame, conf: LinkConfig,
                       term_col: str = "term") -> DataFrame:
    """Dictionary terms -> exploded (term, block_key) — the A1 'build DAWG'
    step. Persist with sources.tables.write_dictionary to amortize across
    query batches (the reference's serialize/deserialize, A5)."""
    return terms.select(term_col).distinct().select(
        F.col(term_col).alias("candidate"),
        F.explode(_build_keys_col(term_col, conf)).alias("block_key"),
    )


def transduce(
    queries: DataFrame,
    compiled_dict: DataFrame,
    conf: LinkConfig,
    query_id_col: str = "query_id",
    term_col: str = "term",
    broadcast_queries: bool = True,
) -> DataFrame:
    """(query_id, term) x compiled dictionary -> all (query_id, query_term,
    candidate, distance) with distance <= conf.max_distance.

    The query side is typically tiny relative to the dictionary, so its
    exploded probe keys are broadcast — no shuffle of the dictionary at all,
    mirroring the reference's dictionary-size-independent query cost claim
    (README.md:22-24) in the distributed setting."""
    probes = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(term_col).alias("query_term"),
        F.explode(_probe_keys_col(term_col, conf)).alias("block_key"),
    )
    if broadcast_queries:
        probes = F.broadcast(probes)
    cands = (
        probes.join(compiled_dict, "block_key")
        .select("query_id", "query_term", "candidate")
        .dropDuplicates(["query_id", "candidate"])
    )
    # Same mapInArrow kernel node as the pipeline's score_pairs (scoring.py):
    # the length-band prefilter is applied inside score_attached, and a
    # map-partitions node cannot be duplicated by Catalyst, so the
    # distance-filter below never re-runs the kernel.
    out = score_attached(
        cands, conf, text_a="query_term", text_b="candidate", drop_texts=False
    ).filter(F.col("distance") <= conf.max_distance)
    if not conf.include_distance:
        out = out.drop("distance")
    return out
