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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens
from .dedup import doc_shingles, word_ngrams

__all__ = ["contamination", "repetition_stats"]


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
            F.round(n_hit / F.greatest(n_sh, F.lit(1)), 4).alias("contamination"),
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
            F.round((n_tok - n_dist) / denom, 4).alias("dup_token_frac"),
            F.round(top_tok / denom, 4).alias("top_token_frac"),
            top_gram.cast("int").alias("top_bigram_count"),
            F.round(F.lit(2) * top_gram / denom, 4).alias("top_bigram_frac"),
        )
    )
