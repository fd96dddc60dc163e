"""Corpus-level quality operators for training-data pipelines:

* benchmark DECONTAMINATION — flag training documents that share long word
  n-grams with an evaluation/benchmark set (the standard n-gram-overlap
  decontamination used for LLM training corpora);
* REPETITION statistics — per-document duplicate-token / top-n-gram
  fractions (Gopher-style repetition quality signals).

Both are pure DataFrame operators (zero UDFs) over the same whitespace
tokenizer as the rest of the toolkit (functions.text.tokens), so each has
an exact DuckDB oracle (driver_queries.py).

Scale notes (designed for 1000-executor runs):
* decontamination joins the 100 TB training side against the BROADCAST
  distinct eval-shingle set — benchmark suites are tiny relative to the
  corpus (even 1M eval docs x ~1k shingles fits executor memory), so the
  big side never shuffles for the probe; the only wide exchange is the
  per-doc count aggregation, which partial-aggregates map-side;
* repetition stats shuffle (doc_id, token) / (doc_id, bigram) keyed rows
  with map-side combine — cardinality is bounded by corpus token count,
  keys are dominated by doc_id so skew follows document length, which the
  tokenizer already bounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import gate_round4, token_count, tokens
from .dedup import doc_shingles, word_ngrams

__all__ = ["contamination", "repetition_stats", "boilerplate_spans",
           "scrub_boilerplate", "trigram_lm_scores"]


def contamination(train: DataFrame, evalset: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = 5) -> DataFrame:
    """Per-training-document benchmark contamination by word n-gram overlap.

    Returns one row per training document:
      (id, n_shingles, n_contaminated, contamination, is_contaminated)
    where n_contaminated counts the doc's distinct n-grams that appear in
    ANY eval document and contamination = n_contaminated / n_shingles
    (0.0 for docs too short to have an n-gram).

    The eval side is reduced to a distinct shingle set and broadcast: the
    training corpus is probed with a broadcast hash join, so the dominant
    (training) side never shuffles before its per-doc aggregation.
    """
    tr_sh = doc_shingles(train, id_col, text_col, n)
    ev_sh = doc_shingles(evalset, id_col, text_col, n).select("shingle").distinct()
    sizes = tr_sh.groupBy(id_col).agg(F.count("*").alias("_n_sh"))
    hits = (
        tr_sh.join(F.broadcast(ev_sh), "shingle")
        .groupBy(id_col)
        .agg(F.count("*").alias("_n_hit"))
    )
    n_sh = F.coalesce(F.col("_n_sh"), F.lit(0))
    n_hit = F.coalesce(F.col("_n_hit"), F.lit(0))
    return (
        train.select(id_col)
        .join(sizes, id_col, "left")
        .join(hits, id_col, "left")
        .select(
            id_col,
            n_sh.cast("int").alias("n_shingles"),
            n_hit.cast("int").alias("n_contaminated"),
            gate_round4(n_hit / F.greatest(n_sh, F.lit(1))).alias("contamination"),
            (n_hit > 0).alias("is_contaminated"),
        )
    )


def repetition_stats(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals per document (token-count proxies):

      n_tokens            total whitespace tokens
      n_distinct_tokens   distinct tokens
      dup_token_frac      (n_tokens - n_distinct) / n_tokens
      top_token_frac      occurrences of the most frequent token / n_tokens
      top_bigram_count    occurrences of the most frequent word bigram
      top_bigram_frac     2 * top_bigram_count / n_tokens

    High dup_token_frac / top_bigram_frac marks boilerplate- or
    loop-generated text. Two narrow shuffles keyed (doc_id, gram) with
    map-side combine; short docs (< 2 tokens) report zero bigram stats.
    """
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    tok_counts = tok.groupBy(id_col, "tok").agg(F.count("*").alias("c"))
    per_tok = tok_counts.groupBy(id_col).agg(
        F.sum("c").alias("_n_tok"),
        F.count("*").alias("_n_dist"),
        F.max("c").alias("_top_tok"),
    )
    grams = df.select(F.col(id_col), F.explode(word_ngrams(text_col, 2)).alias("g"))
    gram_counts = grams.groupBy(id_col, "g").agg(F.count("*").alias("c"))
    per_gram = gram_counts.groupBy(id_col).agg(F.max("c").alias("_top_gram"))

    n_tok = F.coalesce(F.col("_n_tok"), F.lit(0))
    n_dist = F.coalesce(F.col("_n_dist"), F.lit(0))
    top_tok = F.coalesce(F.col("_top_tok"), F.lit(0))
    top_gram = F.coalesce(F.col("_top_gram"), F.lit(0))
    denom = F.greatest(n_tok, F.lit(1))
    return (
        df.select(id_col)
        .join(per_tok, id_col, "left")
        .join(per_gram, id_col, "left")
        .select(
            id_col,
            n_tok.cast("int").alias("n_tokens"),
            n_dist.cast("int").alias("n_distinct_tokens"),
            gate_round4((n_tok - n_dist) / denom).alias("dup_token_frac"),
            gate_round4(top_tok / denom).alias("top_token_frac"),
            top_gram.cast("int").alias("top_bigram_count"),
            gate_round4(F.lit(2) * top_gram / denom).alias("top_bigram_frac"),
        )
    )


def boilerplate_spans(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", n: int = 5,
                      min_docs: int = 3) -> DataFrame:
    """Cross-document repeated-substring detection at word-n-gram
    granularity — the boilerplate-span pass of a training-data pipeline
    (headers, footers, license blocks, templated paragraphs), the
    n-gram-blocked re-expression of suffix-array substring dedup
    [Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better"].

    A token position is BOILERPLATE when some n-gram covering its doc
    starts there and that n-gram occurs in >= min_docs distinct documents.
    Overlapping or adjacent marked windows merge into maximal spans
    (gaps-and-islands over a running max of span ends). Returns one row
    per span: (id, span_start, span_end, span_tokens), 1-based inclusive
    token positions.

    Scale shape (100 TB):
    * the positioned-n-gram explode shuffles (gram, doc) rows once for the
      document-frequency aggregate — cardinality ~ corpus tokens, same
      budget as minhash shingling, partial-aggregated map-side;
    * the hot-gram set (grams in >= min_docs docs) is tiny relative to the
      corpus, so the probe join back onto positioned grams broadcasts
      under AQE; only matching positions survive;
    * span merging is a per-document window — partitioned by doc id,
      bounded by document length, never global.
    """
    toks_grams = df.select(
        F.col(id_col),
        F.posexplode(word_ngrams(text_col, n)).alias("pos0", "gram"),
    ).select(F.col(id_col), (F.col("pos0") + 1).alias("pos"), "gram")
    hot = (
        toks_grams.groupBy("gram")
        .agg(F.count_distinct(id_col).alias("df_docs"))
        .where(F.col("df_docs") >= min_docs)
        .select("gram")
    )
    marked = toks_grams.join(hot, "gram").select(id_col, "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    prev_end = F.max(F.col("pos") + n - 1).over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = marked.withColumn(
        "_new",
        (F.col("pos") > F.coalesce(prev_end, F.lit(-1)) + 1).cast("int"))
    islands = flagged.withColumn("_isl", F.sum("_new").over(w))
    return (
        islands.groupBy(id_col, "_isl")
        .agg(F.min("pos").alias("_s"), (F.max("pos") + n - 1).alias("_e"))
        .select(
            F.col(id_col),
            F.col("_s").cast("int").alias("span_start"),
            F.col("_e").cast("int").alias("span_end"),
            (F.col("_e") - F.col("_s") + 1).cast("int").alias("span_tokens"),
        )
    )


def scrub_boilerplate(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", n: int = 5,
                      min_docs: int = 3) -> DataFrame:
    """Remove boilerplate_spans from each document's token stream.

    Returns one row per input document:
      (id, clean_text, n_tokens, n_removed_tokens)
    clean_text re-joins the surviving tokens with single spaces in original
    order ('' when everything was boilerplate or the doc had no tokens).

    Scale shape: spans explode to covered (id, pos) keys — output is
    bounded by the boilerplate mass, not the corpus — and removal is a
    left-anti equi-join on (id, pos) followed by a per-document aggregate;
    no window over the full corpus, no UDFs.
    """
    spans = boilerplate_spans(df, id_col, text_col, n, min_docs)
    covered = spans.select(
        F.col(id_col),
        F.explode(F.sequence("span_start", "span_end")).alias("pos"))
    tok_rows = df.select(
        F.col(id_col),
        F.posexplode(tokens(text_col)).alias("pos0", "tok"),
    ).select(F.col(id_col), (F.col("pos0") + 1).alias("pos"), "tok")
    kept = tok_rows.join(covered, [id_col, "pos"], "left_anti")
    agg = kept.groupBy(id_col).agg(
        F.concat_ws(" ", F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "tok"))),
            lambda s: s["tok"])).alias("_clean"),
        F.count("*").alias("_n_kept"),
    )
    n_tok = token_count(text_col)
    return (
        df.select(F.col(id_col), n_tok.alias("_n_tok"))
        .join(agg, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("_clean"), F.lit("")).alias("clean_text"),
            F.col("_n_tok").alias("n_tokens"),
            (F.col("_n_tok") - F.coalesce(F.col("_n_kept"), F.lit(0)))
            .cast("int").alias("n_removed_tokens"),
        )
    )


def trigram_lm_scores(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Character-trigram language-model self-scoring — the CCNet-style
    perplexity quality filter (Wenzek et al. 2020 train a KenLM and keep
    the low-perplexity tail; here the model is an add-one-smoothed
    char-trigram LM trained on the corpus itself, so the score needs no
    external artifact and flags exactly the documents whose character
    statistics deviate from the corpus: mojibake, binary spill, wrong
    language, synthetic noise).

    Text is normalized to [a-z0-9 ] (everything else -> space); trigram
    probabilities are P(t) = (c(t)+1) / (T+V) over corpus occurrence count
    T and vocabulary V; a document's score is the mean log-probability of
    its trigram OCCURRENCES and lm_ppl = exp(-mean). Per-trigram log-probs
    ride as INTEGER ten-thousandths (the repo's order-free-summation
    convention: float addition order differs between engines at ulp level,
    integer sums cannot), so the gate hash is stable.

    Scale shape (100 TB): the model key space is bounded by the alphabet
    (37^3 ~ 50k trigrams) REGARDLESS of corpus size, so the count
    aggregation collapses map-side to <=50k rows per task and the scoring
    join BROADCASTS the model — the corpus is scanned twice (train, score)
    with zero wide exchange of text; the per-doc aggregation partial-
    aggregates the (doc, logp) stream to one row per doc per task. Docs
    with no trigram after normalization (<3 chars) are dropped.
    """
    norm = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", " ")
    d = (
        df.select(F.col(id_col), norm.alias("_norm"))
        .filter(F.length("_norm") >= 3)
    )
    tri = d.select(
        F.col(id_col),
        F.explode(
            F.expr("transform(sequence(1, length(_norm) - 2),"
                   " i -> substring(_norm, i, 3))")
        ).alias("tri"),
    )
    model = tri.groupBy("tri").agg(F.count("*").cast("bigint").alias("c"))
    tot = model.agg(
        F.sum("c").alias("t_total"), F.count("*").cast("bigint").alias("v_size")
    )
    model_p = model.crossJoin(F.broadcast(tot)).select(
        "tri",
        F.round(
            F.log((F.col("c") + 1).cast("double")
                  / (F.col("t_total") + F.col("v_size")).cast("double"))
            * 10000
        ).cast("bigint").alias("logp_1e4"),
    )
    scored = tri.join(F.broadcast(model_p), "tri").groupBy(id_col).agg(
        F.count("*").cast("int").alias("n_trigrams"),
        F.sum("logp_1e4").alias("_logp_sum"),
    )
    mean_logp = F.col("_logp_sum") / 10000.0 / F.col("n_trigrams")
    return scored.select(
        F.col(id_col),
        "n_trigrams",
        gate_round4(mean_logp).alias("lm_logprob_avg"),
        gate_round4(F.exp(-mean_logp)).alias("lm_ppl"),
    )
