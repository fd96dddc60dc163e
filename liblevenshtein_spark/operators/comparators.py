"""Soft-similarity comparators over the blocked candidate-pair stream.

The reference transducer's single scoring family is exact edit distance
(README.md:13-24).  Production record linkage layers SOFT comparators on
the same candidate stream — token TF-IDF cosine (Cohen 1998's WHIRL
soft-join) and Monge-Elkan hybrid similarity (Monge & Elkan 1996) — so
pairs that share rare vocabulary or near-identical tokens score high even
when raw edit distance is large.  Both operators here consume an ALREADY
BLOCKED (id_a, id_b) pair set: cost is candidate-bounded, never all-pairs,
which is the only shape that survives a 10^12-turn corpus.

Scale notes (local[32] is the test rig; the design target is a 1000-executor
cluster):
- `tfidf_cosine_pairs` never materializes a dense vector: weights live as a
  sparse (id, token, w) table, the dot product is an equi-join on
  (id, token), and document frequencies aggregate with map-side combine.
  The one scalar (corpus size N) rides a broadcast 1-row cross join, not a
  driver collect.
- `monge_elkan_pairs` crosses tokens WITHIN a pair only (≤ head_tokens² rows
  per candidate), with the Jaro-Winkler inner kernel running as an
  Arrow-batched pandas UDF — no per-row Python.
- All gated floats go through `gate_round4` (the repo's ulp-robust rounding
  convention) so DuckDB recomputes identical hashes.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import gate_round4


def _tokens(entities: DataFrame, id_col: str, text_col: str, sep: str) -> DataFrame:
    """(id, token) with one row per token OCCURRENCE; the turn separator is
    treated as whitespace so tokens never span turn boundaries.  `sep` is a
    LITERAL string (the documented semantics; the DuckDB oracles use
    replace(chr(30))), so regex metacharacters like '|' or '.' are escaped
    before reaching Spark's Java-regex engine."""
    txt = F.regexp_replace(F.col(text_col), re.escape(sep), " ")
    return entities.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(txt, r"\s+")).alias("token"),
    ).filter(F.col("token") != "")


def tfidf_cosine_pairs(
    pairs: DataFrame,
    entities: DataFrame,
    id_col: str = "conv_id",
    text_col: str = "fingerprint",
    sep: str = "\x1e",
    topk_tokens: int | None = None,
) -> DataFrame:
    """TF-IDF cosine similarity for each blocked candidate pair.

    w(d, t) = tf(d, t) * (ln((N + 1) / (df(t) + 1)) + 1)   [smoothed idf]
    cosine  = Σ_t w(a,t)·w(b,t) / (‖a‖·‖b‖)

    Plan shape: tokens → two hash aggs (tf by (id, token), df by token) →
    one token-keyed join to weight → norm agg by id → pair dot product as
    an (id, token) equi-join driven from the candidate pairs.  Every stage
    is candidate- or vocabulary-bounded; nothing is quadratic in the corpus.
    Pairs with no shared token keep cosine = 0.0 (left join + coalesce).

    `topk_tokens`: optional per-document weight-vector truncation — keep
    only each document's K highest-weight tokens (ties broken by token for
    determinism) before norms and dot products.  The dot-product fan-out is
    Σ_pairs |tokens(a)|, linear in candidates × document length; on 100 TB
    corpora with multi-thousand-token conversations this caps the constant
    at K per document.  The truncated cosine is exact over the kept
    vectors (norms computed AFTER truncation, so cosine stays <= 1);
    recall trade: a pair whose shared vocabulary is entirely outside both
    top-K sets scores 0.  None (the default and the gate path) keeps the
    exact full-vocabulary score — K=∞ equivalence is test-gated.
    """
    toks = _tokens(entities, id_col, text_col, sep)
    tf = toks.groupBy("id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = entities.select(
        F.count(F.lit(1)).cast("double").alias("n_docs")
    )  # 1 row — broadcast cross join, no collect
    w = (
        tf.join(df_t, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "id",
            "token",
            (
                F.col("tf")
                * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0)
            ).alias("w"),
        )
    )
    if topk_tokens is not None:
        # rank-within-doc window + WindowGroupLimit pushdown: the filter on
        # row_number is pushed into the sort, so no full-rank materialization
        from pyspark.sql import Window

        # round-before-rank: rank on the 4dp-rounded weight so near-equal
        # weights become EXACT ties broken by token ASC — cross-engine ulps
        # (JVM Math.log vs libm log) can otherwise flip which token holds
        # rank K vs the DuckDB oracle (same convention as monge_elkan's
        # round-before-max)
        win = Window.partitionBy("id").orderBy(
            F.round(F.col("w"), 4).desc(), F.asc("token"))
        w = (
            w.withColumn("_rk", F.row_number().over(win))
            .filter(F.col("_rk") <= topk_tokens)
            .drop("_rk")
        )
    norms = w.groupBy("id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm"))

    base = pairs.select("id_a", "id_b")
    wa = w.select(F.col("id").alias("id_a"), "token", F.col("w").alias("w_a"))
    wb = w.select(F.col("id").alias("id_b"), "token", F.col("w").alias("w_b"))
    dots = (
        base.join(wa, "id_a")
        .join(wb, ["id_b", "token"])
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("w_a") * F.col("w_b")).alias("dot"))
    )
    na = norms.select(F.col("id").alias("id_a"), F.col("norm").alias("norm_a"))
    nb = norms.select(F.col("id").alias("id_b"), F.col("norm").alias("norm_b"))
    # norms join LEFT too: an entity whose text tokenizes to nothing has no
    # norms row, and an inner join would silently DROP its pairs instead of
    # scoring them 0.0 (dot non-null implies both norms non-null, so the
    # null-guard collapses to one when())
    return (
        base.join(dots, ["id_a", "id_b"], "left")
        .join(na, "id_a", "left")
        .join(nb, "id_b", "left")
        .select(
            "id_a",
            "id_b",
            gate_round4(
                F.when(F.col("dot").isNull(), F.lit(0.0)).otherwise(
                    F.col("dot") / (F.col("norm_a") * F.col("norm_b"))
                )
            ).alias("cosine"),
        )
    )


def monge_elkan_pairs(
    pairs: DataFrame,
    entities: DataFrame,
    id_col: str = "conv_id",
    text_col: str = "fingerprint",
    sep: str = "\x1e",
    head_chars: int = 100,
    inner=None,
) -> DataFrame:
    """Symmetric set-Monge-Elkan similarity with a Jaro-Winkler inner
    comparator, over the DISTINCT tokens of each entity's head text
    (first `head_chars` chars — the first transcript turn).

    ME(a→b) = avg over tokens t of a of  max over tokens u of b  JW(t, u);
    result  = (ME(a→b) + ME(b→a)) / 2.

    The token cross product is bounded per pair (head tokens only), so the
    JW kernel — an Arrow-batched pandas UDF — sees Σ_pairs |Ta|·|Tb| rows,
    never a corpus-level cross join.  Inner JW values are rounded to 4
    decimals BEFORE the max so cross-engine float ulps can't flip which
    token wins (the similarity_jw rank convention).
    """
    if inner is None:
        from .scoring import jaro_winkler_udf

        inner = jaro_winkler_udf()
    head = F.regexp_replace(
        F.substring(F.col(text_col), 1, head_chars), sep, " "
    )
    toks = (
        entities.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(head, r"\s+")).alias("token"),
        )
        .filter(F.col("token") != "")
        .distinct()
    )
    base = pairs.select("id_a", "id_b")
    ta = toks.select(F.col("id").alias("id_a"), F.col("token").alias("tok_a"))
    tb = toks.select(F.col("id").alias("id_b"), F.col("token").alias("tok_b"))
    crossed = (
        base.join(ta, "id_a")
        .join(tb, "id_b")
        .select(
            "id_a",
            "id_b",
            "tok_a",
            "tok_b",
            gate_round4(inner(F.col("tok_a"), F.col("tok_b"))).alias("jw"),
        )
    )
    # Both directions from ONE kernel pass: tag each crossed row with its
    # (direction, anchor-token) pair AFTER the UDF, so the plan has a single
    # ArrowEvalPython node feeding one aggregation chain — two separate
    # per-direction aggregations would make Catalyst recompute the join and
    # re-run the JW kernel (the round-1 kernel-duplication anti-pattern).
    tagged = crossed.select(
        "id_a",
        "id_b",
        "jw",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("dir"), F.col("tok_a").alias("tok")),
                F.struct(F.lit(1).alias("dir"), F.col("tok_b").alias("tok")),
            )
        ).alias("dt"),
    )
    per_dir = (
        tagged.groupBy("id_a", "id_b", F.col("dt.dir").alias("dir"), F.col("dt.tok").alias("tok"))
        .agg(F.max("jw").alias("best"))
        .groupBy("id_a", "id_b", "dir")
        .agg(gate_round4(F.avg("best")).alias("me_dir"))
    )
    # exactly two me_dir values per pair; a two-term IEEE sum is
    # order-independent, so the final round4 is deterministic
    me = per_dir.groupBy("id_a", "id_b").agg(
        gate_round4(F.sum("me_dir") / 2.0).alias("me_sim")
    )
    # re-attach from the pair stream LEFT so a pair whose entity has no
    # head tokens scores 0.0 instead of vanishing (same zero-token contract
    # as tfidf_cosine_pairs)
    return base.join(me, ["id_a", "id_b"], "left").select(
        "id_a", "id_b", F.coalesce(F.col("me_sim"), F.lit(0.0)).alias("me_sim")
    )


def soft_tfidf_pairs(
    pairs: DataFrame,
    entities: DataFrame,
    id_col: str = "conv_id",
    text_col: str = "fingerprint",
    sep: str = "\x1e",
    head_chars: int = 100,
    theta: float = 0.9,
    inner=None,
) -> DataFrame:
    """SoftTFIDF hybrid similarity (Cohen, Ravikumar & Fienberg 2003, "A
    Comparison of String Distance Metrics for Name-Matching Tasks") over
    the blocked candidate-pair stream — the third classic soft comparator
    next to `tfidf_cosine_pairs` (pure token overlap) and
    `monge_elkan_pairs` (pure char-level bridging): rare-token IDF weight
    AND near-miss token spelling tolerance in one score.

    For each direction a→b: every anchor token t of a picks its best
    Jaro-Winkler partner u in b (rounded-JW DESC, partner-token ASC — the
    repo's round-before-rank convention so cross-engine ulps can't flip the
    winner); anchors whose best JW >= `theta` contribute
    v(t,a) · v(u,b) · JW(t,u), where v is the L2-normalized smoothed-IDF
    weight (idf = ln((N+1)/(df+1)) + 1 over DISTINCT head tokens, tf = 1
    since token sets are distinct). The reported score symmetrizes the two
    directions: (s(a→b) + s(b→a)) / 2, each direction rounded first so the
    final two-term sum is order-independent.

    Token sets are the DISTINCT tokens of each entity's first `head_chars`
    characters (the monge_elkan convention), so the JW crossing is bounded
    per pair — Σ_pairs |Ta|·|Tb| rows through ONE Arrow-batched kernel
    node, never corpus-quadratic. Weights are sparse (id, token, v) rows;
    N rides a 1-row broadcast; pairs with no qualifying anchor in either
    direction score 0.0 via the left-join-back contract shared by the
    other comparators."""
    from pyspark.sql import Window

    if inner is None:
        from .scoring import jaro_winkler_udf

        inner = jaro_winkler_udf()
    head = F.regexp_replace(
        F.substring(F.col(text_col), 1, head_chars), re.escape(sep), " "
    )
    toks = (
        entities.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(head, r"\s+")).alias("token"),
        )
        .filter(F.col("token") != "")
        .distinct()
    )
    df_t = toks.groupBy("token").agg(F.count(F.lit(1)).cast("double").alias("df"))
    n_docs = entities.select(F.count(F.lit(1)).cast("double").alias("n_docs"))
    w = (
        toks.join(df_t, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "id", "token",
            (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0).alias("w"),
        )
    )
    norms = w.groupBy("id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    v = w.join(norms, "id").select("id", "token", (F.col("w") / F.col("nrm")).alias("v"))

    base = pairs.select("id_a", "id_b")
    va = v.select(F.col("id").alias("id_a"), F.col("token").alias("tok_a"), F.col("v").alias("v_a"))
    vb = v.select(F.col("id").alias("id_b"), F.col("token").alias("tok_b"), F.col("v").alias("v_b"))
    from ..functions.text import gate_round4 as _g4

    crossed = (
        base.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a", "id_b", "tok_a", "tok_b", "v_a", "v_b",
            _g4(inner(F.col("tok_a"), F.col("tok_b"))).alias("jw"),
        )
    )
    # Both directions from ONE kernel pass (the monge_elkan explode-tag
    # trick): tagging AFTER the UDF keeps a single ArrowEvalPython node in
    # the plan instead of Catalyst re-running the JW kernel per direction.
    tagged = crossed.select(
        "id_a", "id_b", "jw",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("dir"),
                    F.col("tok_a").alias("anchor"), F.col("tok_b").alias("partner"),
                    F.col("v_a").alias("v_anchor"), F.col("v_b").alias("v_partner"),
                ),
                F.struct(
                    F.lit(1).alias("dir"),
                    F.col("tok_b").alias("anchor"), F.col("tok_a").alias("partner"),
                    F.col("v_b").alias("v_anchor"), F.col("v_a").alias("v_partner"),
                ),
            )
        ).alias("dt"),
    ).select("id_a", "id_b", "jw", "dt.dir", "dt.anchor", "dt.partner",
             "dt.v_anchor", "dt.v_partner")
    win = Window.partitionBy("id_a", "id_b", "dir", "anchor").orderBy(
        F.col("jw").desc(), F.asc("partner")
    )
    best = (
        tagged.withColumn("_rk", F.row_number().over(win))
        .filter((F.col("_rk") == 1) & (F.col("jw") >= F.lit(theta)))
    )
    per_dir = best.groupBy("id_a", "id_b", "dir").agg(
        _g4(F.sum(F.col("v_anchor") * F.col("v_partner") * F.col("jw"))).alias("s_dir")
    )
    soft = per_dir.groupBy("id_a", "id_b").agg(
        _g4(F.sum("s_dir") / 2.0).alias("soft_tfidf")
    )
    return base.join(soft, ["id_a", "id_b"], "left").select(
        "id_a", "id_b", F.coalesce(F.col("soft_tfidf"), F.lit(0.0)).alias("soft_tfidf")
    )
