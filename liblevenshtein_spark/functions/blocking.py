"""Blocking-key generation — the Spark-native re-expression of the
reference's DAWG ∩ Levenshtein-automaton product walk (SURVEY.md §2.3 B4:
universal-automata/liblevenshtein intersects the dictionary automaton with
the query automaton so it never visits dictionary regions that cannot be
within distance n; here, precomputed candidate keys + a hash equi-join play
that pruning role).

Two complete schemes (completeness is empirically gated by the
recall == 1.0 tests in tests/test_blocking.py):

* deletion neighborhoods (FastSS): if d(u,v) <= n under standard or
  transposition edits, the depth-n deletion neighborhoods of u and v
  intersect. A merge (two chars -> one) needs two deletions on one side, so
  merge_and_split requires depth 2n (SURVEY.md §4.3). Best for short terms.

* even segments + shifted substring probes (PassJoin-style): split every
  string into k segments; if d(u,v) <= n and k is large enough that at most
  k-1 segments are damaged (k = n+1 for standard; 2n+1 for transposition /
  merge_and_split, whose unit ops can damage two adjacent segments), then u
  contains at least one of v's segments verbatim, shifted by at most n.
  Scales to long fingerprints: key volume is O(k * n^2) per record,
  independent of string length.

Everything here is built-in Spark SQL expressions — JVM-side, whole-stage
codegen, zero Python crossings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "single_deletions",
    "deletion_neighborhood",
    "segment_keys",
    "probe_keys",
    "qgram_keys",
    "exploded_keys",
]


def single_deletions(col: str) -> Column:
    """array<string> of every string obtained by deleting exactly one char."""
    return F.expr(
        f"CASE WHEN length({col}) = 0 THEN array() "
        f"ELSE transform(sequence(1, length({col})), pos -> "
        f"concat(substring({col}, 1, pos - 1), substring({col}, pos + 1, length({col})))) END"
    )


def deletion_neighborhood(col: str, depth: int) -> Column:
    """array<string>: all strings reachable by deleting 0..depth chars
    (FastSS candidate keys). depth is expanded iteratively; each level is a
    native flatten(transform(...)), no UDF."""
    if depth < 0:
        raise ValueError("depth must be >= 0")
    expr = f"array({col})"
    for level in range(depth):
        v = f"x{level}"
        expr = (
            f"array_distinct(concat({expr}, flatten(transform({expr}, {v} -> "
            f"CASE WHEN length({v}) = 0 THEN array() "
            f"ELSE transform(sequence(1, length({v})), p{level} -> "
            f"concat(substring({v}, 1, p{level} - 1), substring({v}, p{level} + 1, length({v})))) END))))"
        )
    return F.expr(expr)


def segment_keys(col: str, k: int, hashed: bool = False) -> Column:
    """array of k even-segment keys (i, len, segment) for the string.

    Segment i of a length-L string spans [floor(i*L/k), floor((i+1)*L/k)).
    The target length L is part of the key because probe-side boundaries
    depend on it (PassJoin length grouping).

    hashed=True emits xxhash64(i, len, segment) bigints instead of
    'i|len|segment' strings: fingerprint segments are multi-KB, so string
    keys make the blocking join shuffle megabytes per row; a 64-bit hash
    keeps completeness (equal segments hash equal) and a collision merely
    adds a candidate pair that scoring rejects."""
    if k < 1:
        raise ValueError("k must be >= 1")
    seg = (
        f"substring({col}, cast(floor(i * length({col}) / {k}) as int) + 1, "
        f"cast(floor((i + 1) * length({col}) / {k}) as int) - "
        f"cast(floor(i * length({col}) / {k}) as int))"
    )
    key = (f"xxhash64(i, length({col}), {seg})" if hashed
           else f"concat_ws('|', i, length({col}), {seg})")
    return F.expr(f"transform(sequence(0, {k} - 1), i -> {key})")


def probe_keys(col: str, k: int, n: int, hashed: bool = False) -> Column:
    """array of probe keys: for every candidate partner length
    lv in [len-n, len+n] and every segment index i, the substrings of this
    string where partner-segment i could sit — keyed (i, lv, substr) to
    match `segment_keys` of the partner (hashed=True mirrors segment_keys'
    xxhash64 bigint form).

    The alignment shift d is NOT the naive [-n, n]: it uses PassJoin's
    multi-match-aware substring selection (Li, Deng & Feng, "PassJoin: a
    partition-based method for similarity joins", PVLDB 5(3), §4.2) —
    d ∈ [max(-i, Δ - (k-1-i)), min(i, Δ + (k-1-i))] with Δ = len - lv:
    at most i errors can shift the match left of partner-segment i's
    position, and the remaining k-1-i partitions bound the right shift
    through the length difference. Completeness is collective (SOME
    feasible partition of a within-n partner matches inside its window,
    not every one) and is gated by the recall=1.0 tests in
    tests/test_blocking.py. For equal lengths this cuts shifts per segment
    from 2n+1 to min(i, k-1-i)*2+1 — ~2x fewer probe rows at k=3."""
    if n < 0:
        raise ValueError("n must be >= 0")
    L = f"length({col})"
    lo = f"greatest({L} - {n}, 0)"
    start = f"cast(floor(i * lv / {k}) as int)"
    seglen = f"(cast(floor((i + 1) * lv / {k}) as int) - cast(floor(i * lv / {k}) as int))"
    sub = f"substring({col}, {start} + d + 1, {seglen})"
    key = (f"xxhash64(i, lv, {sub})" if hashed
           else f"concat_ws('|', i, lv, {sub})")
    delta = f"({L} - lv)"
    lo_d = f"greatest(-i, {delta} - ({k} - 1 - i), -{n})"
    hi_d = f"least(i, {delta} + ({k} - 1 - i), {n})"
    inner = (
        f"filter(transform("
        f"CASE WHEN {lo_d} <= {hi_d} THEN sequence({lo_d}, {hi_d}) "
        f"ELSE array() END, d -> "
        f"CASE WHEN {start} + d >= 0 AND {start} + d + {seglen} <= {L} "
        f"THEN {key} END), "
        f"key -> key IS NOT NULL)"
    )
    return F.expr(
        f"array_distinct(flatten(transform(sequence({lo}, {L} + {n}), lv -> "
        f"flatten(transform(sequence(0, {k} - 1), i -> {inner})))))"
    )


def qgram_keys(col: str, q: int = 3, pos_bucket: int = 8) -> Column:
    """array<string> of positional q-gram keys 'bucket|gram' (gram starting
    positions bucketed by `pos_bucket`). High-recall heuristic blocking for
    analytics (SURVEY.md §2.4 P3 q-gram option); not completeness-gated."""
    return F.expr(
        f"CASE WHEN length({col}) < {q} THEN array(concat_ws('|', 0, {col})) "
        f"ELSE array_distinct(transform(sequence(1, length({col}) - {q} + 1), p -> "
        f"concat_ws('|', cast(floor((p - 1) / {pos_bucket}) as int), substring({col}, p, {q})))) END"
    )


def exploded_keys(
    df: DataFrame, id_col: str, text_col: str, keys: Column, key_name: str = "block_key"
) -> DataFrame:
    """(id, block_key) pairs — one row per key. Only the id and key survive;
    texts are re-joined by id later so the big join shuffles narrow rows
    (SURVEY.md §4.2 column-pruning note)."""
    return df.select(F.col(id_col), F.explode(keys).alias(key_name))


def phonetic_key(col: str) -> Column:
    """American-Soundex phonetic blocking key (JVM built-in `soundex`) —
    the classic dirty-name blocking family: terms that SOUND alike land in
    the same bucket even at edit distance > n (e.g. 'smith'/'smyth',
    'robert'/'rupert'), complementing the completeness-gated deletion
    neighborhoods which only reach distance <= n. Pure whole-stage-codegen
    expression, no Python. Callers should restrict input to alphabetic
    terms: Spark returns NON-letter-prefixed strings unchanged, which makes
    degenerate keys."""
    return F.soundex(F.col(col))


def filter_blocks(keys, ratio_tenths: int = 6,
                  id_col: str = "conv_id",
                  key_col: str = "block_key"):
    """Papadakis BLOCK FILTERING: each entity keeps only its
    ceil(ratio_tenths/10 · n) smallest blocks (n = the entity's key
    count) — hot keys are dropped per-entity exactly where they
    contribute least marginal recall.  Integer ceil
    ((ratio_tenths·n + 9) DIV 10) keeps the retention boundary exact
    across engines.  Returns the retained (id, key) rows; feed them to
    the usual key equi-join for the filtered candidate stream.

    One block-size agg + one per-entity window over the entity's few
    keys ordered by (block size, key) — deterministic, WindowGroupLimit
    shape."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    sizes = keys.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("_bsize")
    )
    w = Window.partitionBy(id_col).orderBy("_bsize", key_col)
    return (
        keys.join(sizes, key_col)
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_nk", F.count(F.lit(1)).over(Window.partitionBy(id_col)))
        .filter(F.col("_rn") <= F.expr(f"({ratio_tenths} * _nk + 9) DIV 10"))
        .select(id_col, key_col)
    )
