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

__all__ = ["compile_dictionary", "add_terms", "transduce", "transduce_per_query"]


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


def add_terms(compiled_dict: DataFrame, new_terms: DataFrame,
              conf: LinkConfig, term_col: str = "term") -> DataFrame:
    """Incremental dictionary INSERTION: append a batch of terms to an
    ALREADY-COMPILED (candidate, block_key) index without recompiling any
    existing key — the reference's mutable-dictionary add() surface
    ([PK] SortedDawg incremental construction; the dictionary notion is
    pinned by README.md:13-14) in index form, and the dictionary-side
    sibling of operators.waterfall.incremental_exact_groups (probe the
    persisted index, fold in only the unseen members) the way
    remove-by-anti-join (driver_queries.q_transduce_after_remove) is the
    sibling of retract_entities.

    Cost is O(|added|), not O(|dict|): the batch (typically tiny) anti-joins
    against the index's distinct candidate set — at cluster scale a
    broadcast of the batch against the bucketed index, no index shuffle —
    already-present terms drop out (re-adding is a no-op, so the append is
    idempotent), and only genuinely-new terms pay key compilation. The
    `conf` must be the one the index was compiled under: blocking keys are
    a function of (scheme, depth/segments), so mixing configs would splice
    incompatible key spaces.

    Invariant (pytest test_add_terms_equals_recompile asserts INDEX
    equality, the transduce_after_add gate entry asserts query-result
    equality at all scales): add_terms(compile(A), B) == compile(A ∪ B)."""
    batch = new_terms.select(F.col(term_col).alias("candidate")).distinct()
    unseen = batch.join(
        compiled_dict.select("candidate").distinct(), "candidate", "left_anti"
    )
    return compiled_dict.unionByName(
        compile_dictionary(unseen, conf, term_col="candidate")
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


def _per_query_probe_keys(text_col: str, n_col: str, conf: LinkConfig):
    """Probe keys branched per-row on the query's own distance budget —
    a native CASE over the static key expressions for each n in
    [0, conf.max_distance]. A query with n=0 emits one exact key instead of
    the full cap-depth neighborhood, so mixed-n batches prune candidate
    volume per query rather than paying the batch maximum everywhere."""
    branch = None
    for nn in range(conf.max_distance + 1):
        if conf.blocking_scheme == "deletions":
            depth = 2 * nn if conf.algorithm == "merge_and_split" else nn
            keys = deletion_neighborhood(text_col, depth)
        else:
            # k stays the compile-time segment count (the dictionary side is
            # keyed at that k); smaller n only narrows the probe shift/length
            # windows, and pigeonhole completeness holds for every n <= cap
            # since at most n <= cap <= k-1 segments can be damaged.
            keys = probe_keys(text_col, conf.effective_segments, nn)
        cond = F.col(n_col) == nn
        branch = F.when(cond, keys) if branch is None else branch.when(cond, keys)
    return branch


def transduce_per_query(
    queries: DataFrame,
    compiled_dict: DataFrame,
    conf: LinkConfig,
    query_id_col: str = "query_id",
    term_col: str = "term",
    n_col: str = "n",
    broadcast_queries: bool = True,
) -> DataFrame:
    """The reference's `transduce(term, n)` overload (README.md:13-15): each
    query row carries its own distance budget in `n_col`; NULL falls back to
    conf.max_distance — the TransducerBuilder defaultMaxDistance role `[PK]`.

    The compiled dictionary's keys only support budgets up to its
    compile-time conf.max_distance (the deletion depth / segment count is
    baked into the keys), so per-row budgets are clamped to [0, cap] — the
    documented contract is "compile the dictionary at the largest n any
    query batch will ask for". Blocking keys are generated per-row at the
    row's OWN budget (see _per_query_probe_keys), the kernel bands once at
    the cap, and the exact distance is post-filtered per row — so an n=0
    lookup costs an exact-key join probe, not a cap-neighborhood scan.

    Returns (query_id, query_term, n, candidate[, distance])."""
    default = conf.max_distance
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(term_col).alias("query_term"),
        F.least(
            F.greatest(
                F.coalesce(F.col(n_col).cast("int"), F.lit(default)), F.lit(0)
            ),
            F.lit(default),
        ).alias("n"),
    )
    probes = q.select(
        "query_id", "query_term", "n",
        F.explode(_per_query_probe_keys("query_term", "n", conf)).alias("block_key"),
    )
    if broadcast_queries:
        probes = F.broadcast(probes)
    cands = (
        probes.join(compiled_dict, "block_key")
        .select("query_id", "query_term", "n", "candidate")
        .dropDuplicates(["query_id", "candidate"])
    )
    out = score_attached(
        cands, conf, text_a="query_term", text_b="candidate", drop_texts=False
    ).filter(F.col("distance") <= F.col("n"))
    if not conf.include_distance:
        out = out.drop("distance")
    return out
