"""Fixed-token-window document chunking — the standard pre-tokenization
split a training pipeline applies before packing sequences (context-window
chunks with overlap, e.g. The Pile / RefinedWeb preprocessing).

Pure native DataFrame code: tokenize (the toolkit's shared whitespace
tokenizer, functions/text.tokens), compute the chunk-start grid with integer
arithmetic, `posexplode` the grid, and `slice` each window out of the token
array. No UDFs, no shuffle at all — chunking is embarrassingly row-parallel,
so the physical plan is a single narrow Generate+Project over the scan and
survives any scale-up untouched (the only data movement is whatever the
caller's sink repartitioning asks for).

Chunk-grid semantics (window W, stride S < W, n tokens):
* n == 0 -> no chunks (empty/whitespace docs are dropped, matching the
  quality-filter stage's floor).
* n <= W -> exactly one chunk [0, n).
* else   -> starts 0, S, 2S, ..., (nb-1)*S with nb = 1 + ceil((n-W)/S),
  computed as (n - W + S - 1) DIV S in exact integer arithmetic; the last
  window is short iff (n-W) % S != 0, and every token is covered because
  (nb-1)*S + W >= n.

The DuckDB oracle (driver_queries.DATA_ORACLES['doc_chunks']) mirrors the
same grid with generate_series + list_slice; chunk text is emitted both raw
(chunk_text) and as md5 (chunk_hash) so the gate pins exact content.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens

__all__ = ["chunk_documents", "pack_sequences",
           "CHUNK_WINDOW", "CHUNK_STRIDE", "SEQ_CAPACITY"]

# Defaults sized for readability at test scale; production values (e.g.
# 2048/1920) only change the literals — the plan shape is identical.
CHUNK_WINDOW = 64
CHUNK_STRIDE = 48
SEQ_CAPACITY = 128


def pack_sequences(docs: DataFrame, capacity: int = SEQ_CAPACITY,
                   shard_col: str = "source", id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Concatenate-and-split sequence packing (the standard GPT-style
    training layout): within each shard, documents are laid end to end in
    deterministic `id_col` order and the token stream is cut every
    `capacity` tokens. Emits, per non-empty document, where it lands:
    global shard offset, the first/last training sequence it touches, and
    how many sequence boundaries cut through it.

    Packing is sequential by nature; the scalable decomposition is the same
    one production packers use — pack WITHIN shards (here `shard_col`), so
    the cumulative-offset window partitions by shard and the per-partition
    state is one running sum. No corpus-global ordering anywhere.

    Returns (shard, doc_id, n_tokens:int, offset_in_shard:bigint,
    first_seq:int, last_seq:int, n_boundary_splits:int)."""
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    sized = (
        docs.select(
            F.col(shard_col).alias("shard"), F.col(id_col),
            F.size(tokens(text_col)).alias("_n"))
        .filter(F.col("_n") > 0)
    )
    w = Window.partitionBy("shard").orderBy(id_col)
    off = (F.sum("_n").over(w) - F.col("_n")).cast("bigint")
    return (
        sized.select(
            "shard", id_col,
            F.col("_n").cast("int").alias("n_tokens"),
            off.alias("offset_in_shard"))
        .select(
            "shard", id_col, "n_tokens", "offset_in_shard",
            F.expr(f"CAST(offset_in_shard DIV {capacity} AS INT)")
            .alias("first_seq"),
            F.expr(
                f"CAST((offset_in_shard + n_tokens - 1) DIV {capacity} AS INT)"
            ).alias("last_seq"))
        .withColumn("n_boundary_splits",
                    (F.col("last_seq") - F.col("first_seq")).cast("int"))
    )


def chunk_documents(docs: DataFrame, window: int = CHUNK_WINDOW,
                    stride: int = CHUNK_STRIDE,
                    id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Split each document into overlapping token windows.

    Returns (doc_id, chunk_idx:int, start_tok:int, n_chunk_tokens:int,
    chunk_text:string, chunk_hash:string md5). Deterministic: the grid is
    integer arithmetic and the tokenizer is shared with every other text
    operator, so chunk boundaries are reproducible across runs/engines.
    """
    if not (0 < stride < window):
        raise ValueError(f"need 0 < stride < window, got {stride}/{window}")
    toked = docs.select(
        F.col(id_col), tokens(text_col).alias("_toks")
    ).withColumn("_n", F.size("_toks"))
    n_blocks = F.when(F.col("_n") <= window, F.lit(1)).otherwise(
        F.expr(f"1 + CAST((_n - {window} + {stride} - 1) DIV {stride} AS INT)")
    )
    grid = F.sequence(F.lit(0), (n_blocks - 1) * stride, F.lit(stride))
    out = (
        toked.filter(F.col("_n") > 0)
        .select(id_col, "_toks", F.posexplode(grid).alias("chunk_idx", "start_tok"))
        .withColumn("_chunk", F.slice("_toks", F.col("start_tok") + 1, window))
        .select(
            id_col,
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.col("start_tok").cast("int").alias("start_tok"),
            F.size("_chunk").cast("int").alias("n_chunk_tokens"),
            F.array_join("_chunk", " ").alias("chunk_text"),
            F.md5(F.array_join("_chunk", " ")).alias("chunk_hash"),
        )
    )
    return out
