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

__all__ = ["chunk_documents", "pack_sequences", "cdc_chunks", "cdc_dedup_stats",
           "CHUNK_WINDOW", "CHUNK_STRIDE", "SEQ_CAPACITY",
           "CDC_GRAM", "CDC_MODULUS", "CDC_MIN_CHUNK"]

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


# Content-defined chunking defaults: 8-char rolling gram, boundary when the
# gram hash ≡ 0 (mod 64) -> ~64-char expected chunks; chunks shorter than
# CDC_MIN_CHUNK merge forward into their successor (the FastCDC-style floor
# that stops pathological boundary runs from emitting confetti).
CDC_GRAM = 8
CDC_MODULUS = 64
CDC_MIN_CHUNK = 16


def cdc_chunks(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", gram: int = CDC_GRAM,
               modulus: int = CDC_MODULUS,
               min_chunk: int = CDC_MIN_CHUNK) -> DataFrame:
    """Content-defined chunking (the rolling-hash boundary scheme of LBFS /
    rsync / FastCDC, Muthitacharoen SOSP'01): cut a document wherever the
    hash of the gram STARTING at that position is ≡ 0 mod `modulus`, so
    boundaries are anchored to CONTENT, not offsets — insert one character
    at the front of a doc and every fixed-width chunk shifts, but all CDC
    chunks after the edit keep their exact bytes and their hashes. That
    shift-invariance is what makes chunk-level dedup catch shared passages
    between documents that fixed chunking (chunk_documents) structurally
    cannot.

    Boundaries closer than `min_chunk` to the previous cut are suppressed
    (deterministically, scanning left-to-right — expressed as an aggregate
    over the sorted boundary array, no loop), bounding the chunk-count
    blow-up on low-entropy text. Emits (id, chunk_idx:int,
    chunk_start:int 1-based, chunk_len:int, chunk_hash).

    Scale shape: one explode to per-position rows (corpus chars — the same
    volume every shingle pass in this toolkit already shuffles), a
    per-doc aggregate collecting the (tiny: chars/modulus expected)
    boundary list, and a narrow per-chunk projection with substring; the
    rolling hash is the portable 60-bit md5 gram hash, so DuckDB
    recomputes boundaries bit-for-bit. No UDFs."""
    from ..functions.text import portable_hash64

    n = F.length(text_col)
    # build (position, gram) structs per doc and explode THOSE — the rows
    # that ride the explode carry an 8-char gram, never the full text, so
    # the per-doc cost is O(L·gram) bytes instead of the O(L²) a naive
    # position-explode-then-substring pays (at 10 KB docs that is the
    # difference between 80 KB and 100 MB of row copies per document)
    pos_grams = F.when(
        n >= gram + 1,
        F.transform(
            F.sequence(F.lit(2), n - F.lit(gram - 1)),
            lambda i: F.struct(
                i.cast("int").alias("p"),
                F.col(text_col).substr(i, F.lit(gram)).alias("g"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<p:int,g:string>>"))
    hits = (
        docs.select(F.col(id_col), F.explode(pos_grams).alias("_pg"))
        .filter(portable_hash64(F.col("_pg.g")) % modulus == 0)
        .select(F.col(id_col), F.col("_pg.p").alias("p"))
    )
    bounds = hits.groupBy(id_col).agg(
        F.sort_array(F.collect_list("p")).alias("_bs")
    )
    # deterministic left-to-right min-gap suppression: fold the sorted
    # boundary list, keeping a cut only if it is >= min_chunk past the
    # last KEPT cut (which starts at 1, the document head)
    kept = F.aggregate(
        F.col("_bs"),
        F.array().cast("array<int>"),
        # F.get is 0-based and null-safe on the empty accumulator (ANSI
        # element_at would throw INVALID_ARRAY_INDEX there)
        lambda acc, b: F.when(
            b - F.coalesce(F.get(acc, F.size(acc) - 1), F.lit(1)) >= min_chunk,
            F.concat(acc, F.array(b.cast("int"))),
        ).otherwise(acc),
    )
    with_bounds = (
        docs.select(F.col(id_col), F.col(text_col).alias("_t"))
        .join(bounds, id_col, "left")
        .select(
            F.col(id_col), "_t",
            F.concat(
                F.array(F.lit(1)),
                F.coalesce(kept, F.array().cast("array<int>")),
                F.array((F.length("_t") + 1).cast("int")),
            ).alias("_cuts"),
        )
        .filter(F.length("_t") > 0)
    )
    # same trick on emission: build the per-doc chunk-struct array in one
    # row (start, len, md5 of the chunk bytes), then explode structs that
    # no longer reference the text column
    chunk_structs = F.transform(
        F.sequence(F.lit(1), F.size("_cuts") - 1),
        lambda i: F.struct(
            F.element_at(F.col("_cuts"), i).alias("start"),
            (F.element_at(F.col("_cuts"), i + 1)
             - F.element_at(F.col("_cuts"), i)).alias("len"),
            F.md5(
                F.col("_t").substr(
                    F.element_at(F.col("_cuts"), i),
                    F.element_at(F.col("_cuts"), i + 1)
                    - F.element_at(F.col("_cuts"), i),
                )
            ).alias("hash"),
        ),
    )
    return with_bounds.select(
        F.col(id_col), F.posexplode(chunk_structs).alias("chunk_idx", "_c")
    ).select(
        F.col(id_col),
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("_c.start").cast("int").alias("chunk_start"),
        F.col("_c.len").cast("int").alias("chunk_len"),
        F.col("_c.hash").alias("chunk_hash"),
    )


def cdc_dedup_stats(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", gram: int = CDC_GRAM,
                    modulus: int = CDC_MODULUS,
                    min_chunk: int = CDC_MIN_CHUNK) -> DataFrame:
    """Per-document shared-content accounting over the CDC chunk table:
    (id, n_chunks, total_chars, n_dup_chunks, dup_chars, dup_ratio_1e4)
    where a chunk is DUP if its exact bytes occur anywhere else in the
    corpus (other docs or elsewhere in the same doc). This is the
    passage-level dedup ledger — robust to insertions in a way fixed
    chunks are not — that decides which documents carry mostly-boilerplate
    mass before training. One hash agg over (chunk_hash, chunk_len) for
    global occurrence counts + one join back; cost ∝ chunks."""
    ch = cdc_chunks(docs, id_col, text_col, gram, modulus, min_chunk)
    occ = ch.groupBy("chunk_hash").agg(F.count("*").alias("_occ"))
    dup = F.col("_occ") > 1
    return (
        ch.join(occ, "chunk_hash")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("int").alias("n_chunks"),
            F.sum("chunk_len").cast("bigint").alias("total_chars"),
            F.sum(dup.cast("int")).cast("int").alias("n_dup_chunks"),
            F.sum(F.when(dup, F.col("chunk_len")).otherwise(0))
            .cast("bigint").alias("dup_chars"),
            F.floor(
                F.lit(10000.0)
                * F.sum(F.when(dup, F.col("chunk_len")).otherwise(0))
                / F.sum("chunk_len") + F.lit(0.5)
            ).cast("bigint").alias("dup_ratio_1e4"),
        )
    )
