"""Corpus/event analytics operators rounding out the relational surface
(SURVEY.md §2.4 checklist): per-document TF-IDF top terms (two-level
aggregation + ranking window), per-user event-gap statistics (lag frame
window), and a source/language ROLLUP aggregate (grouping sets).

All pure DataFrame operators — zero UDFs — with exact DuckDB oracles
(driver_queries.py). Float-bearing intermediates are pinned to integers
(micro-scaled IDF, epoch-millis gaps, integer cents) so value hashing is
stable across engines.

Scale notes (1000-executor framing):
* tfidf_topk shuffles (doc, term) then (term) keyed rows, both with
  map-side partial aggregation; the document-frequency side collapses to
  |vocab| rows and broadcasts back onto the tf stream, so the corpus-sized
  stream shuffles exactly once. The ranking window partitions by doc —
  per-partition state is one document's vocabulary.
* event_gap_stats is one window (partitioned by user, sorted by time) plus
  one hash agg; at 10^12 events the user-id partitioning is the natural
  layout and gap computation is a single pass.
* corpus_rollup is a plain grouping-sets hash aggregate — partial
  aggregation covers every grouping set map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens

__all__ = ["bpe_merge_pairs",
           "tfidf_topk", "event_gap_stats", "event_transitions",
           "corpus_rollup", "corpus_cube", "corpus_zipf",
           "event_running_totals", "corpus_pivot", "corpus_unpivot",
           "length_deciles", "event_hop_windows", "event_props_map",
           "PIVOT_LANGS"]

# IDF is ln((N+1)/(df+1)) scaled to 1e4 and rounded to a bigint: exact
# cross-engine arithmetic after the rounding (a mismatch would need the two
# engines' ln() to straddle a 0.5e-4 boundary — same vanishing-probability
# argument as the LSH sign bits, driver_queries._lsh_ann_oracle_sql).
IDF_SCALE = 10_000


def tfidf_topk(docs: DataFrame, k: int = 3,
               id_col: str = "doc_id", text_col: str = "text",
               materialize_tf: bool = True) -> DataFrame:
    """Top-k TF-IDF terms per document (whitespace tokens, the toolkit's
    shared tokenizer). Returns (id, term, tf, idf_1e4, tfidf_1e4, rank)
    with integer-scaled scores; rank ties break lexicographically by term.

    The term-frequency aggregate feeds BOTH the document-frequency branch
    and the scoring join; without materialization Catalyst re-plans the
    corpus scan + tokenize-explode + (doc, term) shuffle for each branch
    (verified via explain) — two full corpus passes at 100 TB. With
    `materialize_tf` the tf frame is computed once (localCheckpoint; at
    production scale, a persisted table) and both branches read it."""
    toks = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    if materialize_tf:
        tf = tf.localCheckpoint(eager=True)
    n_docs = docs.agg(F.count("*").alias("_n"))
    dfreq = (
        tf.groupBy("term").agg(F.count("*").alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term",
            F.round(
                F.log((F.col("_n") + 1) / (F.col("df") + 1)) * IDF_SCALE
            ).cast("bigint").alias("idf_1e4"),
        )
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .select(
            id_col, "term", F.col("tf").cast("int").alias("tf"), "idf_1e4",
            (F.col("tf") * F.col("idf_1e4")).cast("bigint").alias("tfidf_1e4"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf_1e4"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("rank", F.col("rank").cast("int"))
    )


def event_gap_stats(events: DataFrame) -> DataFrame:
    """Per-user inter-event gap statistics via a lag window over (ts,
    event_id): (user_id, n_events, sum_gap_us, max_gap_us, sum_value_cents).
    Gaps are epoch-MICROsecond bigints (the events ts is TIMESTAMP_NTZ; the
    UTC session timezone makes the cast tz-free, and microseconds avoid the
    truncation asymmetry of millisecond conversions); values are summed in
    integer cents (float addition order can't break hash parity)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    return (
        events.withColumn("_gap_us", gap)
        .groupBy("user_id")
        .agg(
            F.count("*").cast("int").alias("n_events"),
            F.coalesce(F.sum("_gap_us"), F.lit(0)).cast("bigint").alias("sum_gap_us"),
            F.coalesce(F.max("_gap_us"), F.lit(0)).cast("bigint").alias("max_gap_us"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_value_cents"),
        )
    )


def corpus_rollup(docs: DataFrame) -> DataFrame:
    """ROLLUP aggregate over (lang, source): per-(lang, source) counts, the
    per-lang subtotals, and the grand total in one grouping-sets pass.
    Dimension nulls introduced by the rollup are pinned to '<all>' so the
    output is total-order hashable."""
    return (
        docs.rollup("lang", "source")
        .agg(
            # grouping() is only legal inside the grouping-sets aggregate
            (F.grouping("lang") * 2 + F.grouping("source"))
            .cast("int").alias("grouping_lvl"),
            F.count("*").cast("int").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
        .select(
            F.coalesce("lang", F.lit("<all>")).alias("lang"),
            F.coalesce("source", F.lit("<all>")).alias("source"),
            "grouping_lvl", "n_docs", "sum_chars",
        )
    )


def corpus_cube(docs: DataFrame) -> DataFrame:
    """CUBE aggregate over (lang, source): all four grouping sets —
    per-(lang, source), per-lang, per-source, and the grand total — in one
    grouping-sets hash aggregate (ROLLUP's missing per-source slice).
    Same hash-robustness discipline as corpus_rollup: dimension nulls
    pinned to '<all>', grouping level as an explicit int column."""
    return (
        docs.cube("lang", "source")
        .agg(
            (F.grouping("lang") * 2 + F.grouping("source"))
            .cast("int").alias("grouping_lvl"),
            F.count("*").cast("int").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
        .select(
            F.coalesce("lang", F.lit("<all>")).alias("lang"),
            F.coalesce("source", F.lit("<all>")).alias("source"),
            "grouping_lvl", "n_docs", "sum_chars",
        )
    )


def event_hop_windows(events: DataFrame, window: str = "30 minutes",
                      slide: str = "10 minutes") -> DataFrame:
    """Sliding (hopping) window aggregate: per overlapping 30-minute
    window advancing every 10 minutes, per event type, event count + exact
    integer-cent value sum. Each event lands in window/slide = 3 windows —
    Spark's native F.window(slide) fan-out, the one time-window shape the
    toolkit's tumbling (stream_event_windows) and session (event_sessions)
    entries don't cover. Window starts are epoch-aligned on both engines;
    emitted as unix microseconds so the hash never sees a raw timestamp.

    Scale: the fan-out is a narrow ×(window/slide) Generate before the one
    hash-agg shuffle — partial aggregation still applies map-side, so the
    shuffle carries ~|windows × types| rows, not ×3 the event stream."""
    return (
        events.groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(
            F.count("*").cast("int").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("bigint").alias("sum_value_cents"),
        )
        .select(
            # events ts is NTZ; the UTC session tz makes the cast
            # wall-clock-preserving (same idiom as stream_event_windows)
            F.unix_micros(F.col("w.start").cast("timestamp")).alias("window_start_us"),
            "event_type", "n_events", "sum_value_cents",
        )
    )


def event_props_map(events: DataFrame) -> DataFrame:
    """Map-typed scalar-function coverage: parse the JSON props column into
    a genuine MapType (from_json -> map<string,bigint>), explode its
    entries, and aggregate per key — count, sum, min/max. Generic over any
    flat integer-valued props object (the sandbox fixture happens to carry
    a single key); the DuckDB oracle re-derives the entries with positional
    regexp_extract_all + zipped unnest, so key discovery itself is gated.

    Scale: explode(map) is a narrow Generate; the per-key aggregate
    partially combines map-side and shuffles |keys|-bounded rows."""
    entries = events.select(
        F.explode(F.from_json("props", "map<string,bigint>")).alias("key", "val")
    )
    return entries.groupBy("key").agg(
        F.count("*").cast("int").alias("n_events"),
        F.sum("val").cast("bigint").alias("sum_val"),
        F.min("val").cast("bigint").alias("min_val"),
        F.max("val").cast("bigint").alias("max_val"),
    )


# Explicit pivot-column list: passing values to pivot() fixes the output
# schema without a distinct-scan job, keeps the plan a single hash aggregate
# (one shuffle on the row key), and makes the schema data-independent — at
# 100 TB an implicit pivot would first run a full distinct over the pivot
# column and fall over on high cardinality.
PIVOT_LANGS = ["de", "en", "es", "fr", "zh"]


def corpus_pivot(docs: DataFrame, langs: list[str] | None = None) -> DataFrame:
    """Per-source language breakdown as a wide table: one row per source,
    one n_<lang> count column per configured language (unseen combinations
    pinned to 0 so the frame is dense and hashable)."""
    langs = PIVOT_LANGS if langs is None else langs
    wide = docs.groupBy("source").pivot("lang", langs).count()
    return wide.select(
        "source",
        *[F.coalesce(F.col(f"`{l}`"), F.lit(0)).cast("int").alias(f"n_{l}")
          for l in langs],
    )


def corpus_unpivot(docs: DataFrame) -> DataFrame:
    """The melt direction: aggregate per-source stats wide, then `unpivot`
    back to tidy (source, metric, value) rows — the relational surface's
    UNPIVOT/MELT shape. All measures are bigint so the value column needs no
    lossy common-type promotion."""
    wide = docs.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
    )
    return wide.unpivot(
        ids=["source"], values=["n_docs", "sum_chars", "n_langs"],
        variableColumnName="metric", valueColumnName="value",
    )


def length_deciles(docs: DataFrame, col: str = "n_chars",
                   q: int = 10) -> DataFrame:
    """EXACT distribution deciles of an integer column via a value
    histogram — not approx_percentile (non-deterministic across engines) and
    not a global sort of the raw rows. The corpus collapses to one row per
    distinct value (map-side combined groupBy), the cumulative window runs
    over that tiny frame, and each decile p picks the value at rank
    ceil(p*n/q) — nearest-rank semantics, exact integers end to end.

    At 100 TB the only corpus-sized operation is the histogram aggregate
    (|distinct lengths| output rows); the window + decile join are
    negligible. Returns (decile:int, rank:bigint, value:bigint)."""
    hist = docs.groupBy(F.col(col).alias("value")).agg(
        F.count("*").alias("cnt"))
    w = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    cum = hist.select(
        "value", "cnt", F.sum("cnt").over(w).alias("cum"))
    total = docs.agg(F.count("*").alias("n"))
    deciles = (
        docs.sparkSession.range(1, q)
        .select(F.col("id").cast("int").alias("decile"))
        .crossJoin(F.broadcast(total))
        # nearest-rank: ceil(p*n/q) in exact integer arithmetic
        .select("decile",
                F.expr(f"CAST((decile * n + {q} - 1) DIV {q} AS BIGINT)")
                .alias("rank"))
    )
    return (
        cum.join(F.broadcast(deciles),
                 (F.col("cum") >= F.col("rank"))
                 & (F.col("cum") - F.col("cnt") < F.col("rank")))
        .select("decile", "rank", F.col("value").cast("bigint").alias("value"))
    )


def event_running_totals(events: DataFrame, buckets: int = 4) -> DataFrame:
    """Per-user running totals (cumulative frame: ROWS UNBOUNDED PRECEDING
    .. CURRENT ROW) plus an ntile value-quartile — the frame-spec and
    distribution window shapes the rest of the toolkit doesn't exercise.
    Ordering is (ts, event_id): unique per user, so every window value is
    deterministic; money stays in integer cents."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cents = F.round(F.col("value") * 100).cast("long")
    wv = Window.partitionBy("user_id").orderBy(
        F.desc(cents), F.asc("event_id")
    )
    return events.select(
        "event_id", "user_id",
        F.sum(cents).over(cum).cast("bigint").alias("running_cents"),
        F.count("*").over(cum).cast("int").alias("running_n"),
        F.ntile(buckets).over(wv).cast("int").alias("value_quartile"),
    )


def event_funnel(events: DataFrame, stages: list[str],
                 user_col: str = "user_id", type_col: str = "event_type",
                 ts_col: str = "ts") -> DataFrame:
    """Ordered-sequence funnel (the MATCH_RECOGNIZE/funnel-analysis shape
    Spark lacks as a primitive): for each user, the earliest stage-1 event,
    then the earliest stage-2 event STRICTLY AFTER it, and so on — the
    greedy earliest-completion funnel every product-analytics engine
    computes. Emits one row per user who reached stage 1:
    (user, <stage>_us bigint nullable per stage, stage:int = stages
    reached). Timestamps are epoch microseconds (the engine's portable
    timestamp convention). Monotone by construction: a NULL stage implies
    NULL for every later stage.

    Scale shape: one filtered user-keyed hash agg per stage (map-side
    combine), chained by key joins on the per-user stage table — which is
    at most one row per user, so each join is AQE-broadcastable against
    the next filtered event stream; the corpus-sized events table is
    scanned once per stage with the stage filter pushed to the scan. No
    windows over the raw event stream, no per-user event materialization."""
    if not stages:
        raise ValueError("event_funnel needs at least one stage")
    if len(set(stages)) != len(stages):
        raise ValueError(f"event_funnel stages must be unique, got {stages!r}"
                         " (duplicate names would collide as output columns)")
    # events tables carry TIMESTAMP_NTZ; unix_micros requires TIMESTAMP
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    cols: list[str] = []
    out = None
    for i, st in enumerate(stages):
        col = f"{st}_us"
        stream = events.filter(F.col(type_col) == st).select(
            user_col, us.alias("_ts"))
        if out is None:
            out = stream.groupBy(user_col).agg(F.min("_ts").alias(col))
        else:
            prev = cols[-1]
            nxt = (
                stream.join(out.select(user_col, prev), user_col)
                .filter(F.col("_ts") > F.col(prev))
                .groupBy(user_col)
                .agg(F.min("_ts").alias(col))
            )
            out = out.join(nxt, user_col, "left")
        cols.append(col)
    stage = None
    for c in cols:
        term = F.col(c).isNotNull().cast("int")
        stage = term if stage is None else stage + term
    return out.select(user_col, *cols, stage.cast("int").alias("stage"))


def bpe_merge_pairs(docs: DataFrame, text_col: str = "text",
                    top_n: int = 50) -> DataFrame:
    """First BPE merge-table step (Sennrich, Haddow & Birch, ACL 2016 [PK]):
    corpus-weighted frequencies of adjacent symbol pairs, the statistic a
    tokenizer-training job computes over the whole corpus before each merge.

    Shape is the classic word-frequency trick that makes BPE training
    feasible at corpus scale: the corpus-sized stream is reduced ONCE to
    (word, count) with map-side partial aggregation, and the symbol-pair
    explode runs over the DISTINCT VOCABULARY (|V| << corpus), never the
    raw text.  The final ranking window sorts the aggregated pair table,
    which is bounded by |alphabet|^2 (<= 676 rows for a-z), not the corpus
    — at 100 TB the only full-data pass is the first word count.

    Returns the top_n (pair, pair_count, rank) rows, ranked by
    (pair_count DESC, pair ASC) — a total order, so the cut is
    deterministic under ties."""
    words = docs.select(
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("word")
    ).filter(F.length("word") >= 2)
    vocab = words.groupBy("word").agg(F.count(F.lit(1)).alias("wc"))
    pairs = vocab.select(
        "wc",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda p: F.col("word").substr(p, F.lit(2)),
            )
        ).alias("pair"),
    )
    agg = pairs.groupBy("pair").agg(F.sum("wc").cast("bigint").alias("pair_count"))
    rank = F.row_number().over(
        Window.orderBy(F.col("pair_count").desc(), F.col("pair").asc())
    )
    return (
        agg.withColumn("rank", rank.cast("int"))
        .filter(F.col("rank") <= top_n)
        .select("pair", "pair_count", "rank")
    )


def event_transitions(events: DataFrame) -> DataFrame:
    """First-order Markov transition statistics over each user's
    time-ordered event stream: for every observed (prev_type, next_type)
    pair, the transition count and the conditional probability
    P(next | prev) — the behavioral fingerprint used for funnel sanity
    checks, bot detection (improbable transition chains), and simulating
    realistic event load. Probability is integer-scaled to 1e6
    (floor(x + 0.5), the repo's hash-stable ratio convention).

    Shape: ONE lag window per user (same partitioning event_gap_stats
    already shuffles by, so a shared pipeline reuses the exchange), then
    a hash agg on (prev, next) — at most |types|² rows out — and a tiny
    per-prev marginal self-agg. Nothing leaves the JVM."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = (
        events.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").cast("bigint").alias("n_trans"))
    )
    marg = steps.groupBy("prev_type").agg(
        F.sum("n_trans").cast("bigint").alias("n_from_prev")
    )
    return (
        steps.join(marg, "prev_type")
        .select(
            "prev_type", "next_type", "n_trans", "n_from_prev",
            F.floor(
                F.lit(1000000.0) * F.col("n_trans") / F.col("n_from_prev")
                + F.lit(0.5)
            ).cast("bigint").alias("p_next_1e6"),
        )
    )


def corpus_zipf(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-level lexical statistics in one row: token/type counts,
    type-token ratio, and the Zipf rank-frequency power-law fit — the
    least-squares slope/intercept of ln(freq) on ln(rank) (Zipf's law
    predicts slope ≈ -1; a corpus that deviates hard is usually templated
    or machine-generated, which makes this a cheap corpus-quality gate).

    Scale shape: one tokenize+explode pass with a map-side-combined term
    count; ranking runs on the VOCABULARY (sublinear in corpus size by
    Heaps' law) through operators.ranking.global_rank — range-partitioned
    sort + broadcast offsets, never a single-partition global window; the
    regression is one aggregate over (ln rank, ln freq)."""
    from .ranking import global_rank

    tf = (
        docs.select(F.explode(tokens(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("bigint").alias("freq"))
    )
    ranked = global_rank(
        tf.withColumn("_negf", -F.col("freq")), ["_negf", "term"]
    )
    lr = F.log(F.col("rank").cast("double"))
    lf = F.log(F.col("freq").cast("double"))
    from ..functions.text import gate_round4

    return ranked.agg(
        F.count("*").cast("bigint").alias("n_types"),
        F.sum("freq").cast("bigint").alias("n_tokens"),
        gate_round4(F.count("*") / F.sum("freq")).alias("type_token_ratio"),
        gate_round4(F.regr_slope(lf, lr)).alias("zipf_slope"),
        gate_round4(F.regr_intercept(lf, lr)).alias("zipf_intercept"),
    )


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Column-level data profiling (the ingest-time quality report every
    production linkage run opens with — Splink/Great-Expectations-style):
    for each named column, row count, null count, distinct count and
    min/max/total length of the string rendering, one output row per
    column.

    Scale shape: ONE table scan computes every column's statistics — the
    per-column count/min/max/sum aggregates fuse into a single hash-agg
    pass, and the exact distinct counts ride Spark's multi-DISTINCT
    Expand (one narrow (gid, value) row per profiled column inside the
    same scan, partial-aggregated map-side — not a separate job per
    column); the wide 1-row result is then unpivoted by a stack()
    projection over O(columns) rows.
    Non-string columns profile their canonical string rendering so the
    report shape is uniform."""
    # generated aliases are positional (_c0_rows, ...) and labels ride as
    # escaped literals, so column names with spaces / hyphens / quotes
    # profile fine — only F.col ever sees the raw name
    aggs = []
    for i, c in enumerate(cols):
        s = F.col(c).cast("string")
        ln = F.length(s)
        aggs += [
            F.count(F.lit(1)).cast("bigint").alias(f"_c{i}_rows"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("bigint").alias(f"_c{i}_nulls"),
            F.countDistinct(s).cast("bigint").alias(f"_c{i}_distinct"),
            F.min(ln).cast("int").alias(f"_c{i}_min_len"),
            F.max(ln).cast("int").alias(f"_c{i}_max_len"),
            F.sum(ln).cast("bigint").alias(f"_c{i}_sum_len"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        "'{lbl}', _c{i}_rows, _c{i}_nulls, _c{i}_distinct,"
        " _c{i}_min_len, _c{i}_max_len, _c{i}_sum_len".format(
            lbl=c.replace("\\", "\\\\").replace("'", "\\'"), i=i)
        for i, c in enumerate(cols)
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args})"
            " AS (column_name, n_rows, n_nulls, n_distinct,"
            " min_len, max_len, sum_len)"
        )
    )
