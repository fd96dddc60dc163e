"""Similarity search over embedding columns (array<float>):

* exact cosine — native zip_with/aggregate expressions (JVM-side), used for
  brute-force top-k (the correctness baseline) and threshold near-dup pairs;
* random-hyperplane LSH — a vectorized numpy pandas UDF producing sign-bit
  signatures, bucketed by bit-band for the scale path (candidate recall vs
  brute force is gated in tests/test_ann.py).

Scale notes: brute-force variants exist as baselines and for the driver
oracle; the LSH path is the one that survives 100TB (buckets + verify,
no cross join). Top-k uses a window only after a per-bucket pre-prune.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = [
    "cosine", "brute_force_topk", "cosine_dup_pairs",
    "lsh_signature_udf", "lsh_ann_pairs",
    "ivf_centroids", "ivf_index", "ivf_topk", "semantic_dedup",
    "quantize_embeddings",
]


def quantize_embeddings(emb: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Symmetric int8 quantization per vector — the storage/serving format a
    vector index ships at scale (4x smaller than float32, SIMD-friendly).

    scale = max(|x|) over the vector (computed in double), q_i =
    round(x_i * 127 / scale) as int8-range ints. Zero vectors quantize to
    all-zero with scale 0. Entirely native expressions (transform /
    array_max / aggregate) — a narrow per-row map, no shuffle, so the plan
    is scan → project at any scale.

    Determinism: every float32 input casts exactly to double, both engines
    evaluate x*127.0/scale in IEEE double with identical association, and
    ties at .5 round away from zero in both Spark and DuckDB; random-valued
    embeddings hit an exact .5 boundary with vanishing probability (same
    argument as the LSH sign bits, driver_queries._lsh_ann_oracle_sql).

    Returns (vec_id, n_dims:int, scale_1e6:bigint, sum_q:bigint,
    qvec_csv:string — the comma-joined int8 lattice, content-pinning the
    whole quantized vector for the oracle hash)."""
    dv = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scale = F.array_max(F.transform(dv, F.abs))
    qv = F.when(scale == 0, F.transform(dv, lambda x: F.lit(0))).otherwise(
        F.transform(dv, lambda x: F.round(x * 127.0 / scale).cast("int"))
    )
    return emb.select(
        id_col,
        F.size(vec_col).cast("int").alias("n_dims"),
        F.round(scale * 1_000_000).cast("bigint").alias("scale_1e6"),
        F.aggregate(qv, F.lit(0).cast("bigint"),
                    lambda acc, x: acc + x).alias("sum_q"),
        F.array_join(F.transform(qv, lambda x: x.cast("string")), ",")
        .alias("qvec_csv"),
    )


def cosine(a: str | Column, b: str | Column, digits: int | None = 4) -> Column:
    """Exact cosine similarity between two array<float>/<double> columns,
    computed in double with a sequential fold (deterministic order — matches
    DuckDB's list_cosine_similarity within rounding)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    dot = F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(ca, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))
    nb = F.sqrt(F.aggregate(cb, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))
    sim = dot / (na * nb)
    # + 1e-9 before rounding: the gate_round4 ulp-robust convention
    # (functions/text.py) — synthetic embeddings are small rationals, so
    # cosines can land exactly on 4-decimal boundaries where a 1-ulp
    # summation-order difference vs DuckDB flips the round (observed: a
    # threshold-boundary pair flipped in embed_cosine_pairs at sf0.1)
    return F.round(sim + 1e-9, digits) if digits is not None else sim


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query vector (excluding self): the O(Q*N)
    baseline. Queries are broadcast; rank ties broken by neighbor id."""
    q = F.broadcast(queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    ))
    cand = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = (
        q.crossJoin(cand)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine("_qv", "_cv").alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )


def cosine_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs >= threshold (brute-force
    baseline; LSH path below is the scale variant)."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine("_va", "_vb").alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def lsh_signature_udf(dim: int, n_planes: int = 16, seed: int = 42):
    """Arrow-batched pandas UDF: embedding -> random-hyperplane sign
    signature (bigint bitmask). Hyperplanes are a fixed seeded Gaussian
    matrix — deterministic across executors and runs."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))

    @pandas_udf("long")
    def sig(v: pd.Series) -> pd.Series:
        mat = np.asarray(v.tolist(), dtype=np.float64)  # (batch, dim)
        bits = (mat @ planes) > 0  # (batch, n_planes)
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series(bits @ weights)

    return sig


def lsh_ann_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Scale-path near-dup pairs: LSH-bucket join (signature bit-bands) then
    exact-cosine verify >= threshold. Candidate recall vs brute force is a
    tested property, not an assumption (tests/test_ann.py).

    Only (id, sig) rides the bands-x explode and the bucket join; embedding
    vectors are re-joined BY ID onto the deduped candidate pairs just before
    the verify — the same narrow-join-then-attach shape as the linkage
    scorer (scoring.attach_texts), cutting bucket-join shuffle bytes by
    ~(bands x dim)."""
    sig = lsh_signature_udf(dim, n_planes, seed)
    signed = emb.select(F.col(id_col), F.col(vec_col), sig(F.col(vec_col)).alias("sig"))
    chunk_bits = n_planes // bands
    mask = (1 << chunk_bits) - 1
    chunks = signed.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("chunk"),
        F.col("sig"),
    ).withColumn("chunk_val", F.expr(f"shiftright(sig, cast(chunk as int) * {chunk_bits}) & {mask}"))
    a = chunks.select(F.col(id_col).alias("id_a"), "chunk", "chunk_val")
    b = chunks.select(F.col(id_col).alias("id_b"), "chunk", "chunk_val")
    cands = (
        a.join(b, ["chunk", "chunk_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    vb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        cands.join(va, "id_a").join(vb, "id_b")
        .select("id_a", "id_b", cosine("_va", "_vb").alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the partition-pruned scale path
# ---------------------------------------------------------------------------

def ivf_centroids(
    emb: DataFrame,
    n_cells: int = 8,
    refine_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Deterministic centroids: seed with the n_cells vectors of smallest
    xxhash64(id) (a reproducible k-means|| stand-in; distributed top-k, no
    global sort), then `refine_iters` Lloyd passes computed natively
    (assign -> posexplode -> per-(cell,pos) mean -> rebuild array).
    Returns driver-side [(cell_id, centroid)] — n_cells x dim floats, the
    'coarse quantizer' that is broadcast into assignment expressions."""
    seeds = (
        emb.orderBy(F.xxhash64(F.col(id_col).cast("string")))
        .limit(n_cells)
        .select(vec_col)
        .collect()
    )
    cents = [(i, [float(x) for x in r[0]]) for i, r in enumerate(seeds)]
    for _ in range(refine_iters):
        assigned = emb.select(
            _nearest_cell(vec_col, cents).alias("cell"), F.col(vec_col)
        )
        means = (
            assigned.select("cell", F.posexplode(vec_col).alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.avg("val").alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cell", F.expr("transform(pm, x -> x.m)").alias("centroid"))
            .collect()
        )
        cents = [(int(r["cell"]), [float(x) for x in r["centroid"]]) for r in means]
    return cents


def _cell_cosines(vec_col: str, cents: list[tuple[int, list[float]]]) -> list[Column]:
    return [cosine(vec_col, F.array(*[F.lit(x) for x in c]), digits=None)
            for _, c in cents]


def _nearest_cell(vec_col: str, cents: list[tuple[int, list[float]]]) -> Column:
    """argmax-cosine cell id as a native expression (no UDF): greatest()
    over the per-centroid cosines, first-match tie-break by cell order."""
    sims = _cell_cosines(vec_col, cents)
    best = F.greatest(*sims) if len(sims) > 1 else sims[0]
    expr = F.lit(cents[-1][0])
    for (cell_id, _), sim in list(zip(cents, sims))[-2::-1]:
        expr = F.when(sim == best, F.lit(cell_id)).otherwise(expr)
    return expr.cast("int")


def ivf_index(
    emb: DataFrame,
    cents: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Inverted lists: every vector assigned to its nearest centroid and
    the table repartitioned by cell — at scale this is the partition layout
    on disk, so a probe reads only nprobe/n_cells of the data."""
    return (
        emb.select(_nearest_cell(vec_col, cents).alias("cell"), id_col, vec_col)
        .repartition("cell")
    )


def ivf_topk(
    index: DataFrame,
    queries: DataFrame,
    cents: list[tuple[int, list[float]]],
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k per query over the nprobe nearest cells only. With
    nprobe == n_cells this is exactly brute force (tested); smaller nprobe
    trades recall for reading a fraction of the index."""
    sims = _cell_cosines(vec_col, cents)
    ranked = F.array_sort(
        F.array(*[F.struct((-s).alias("neg"), F.lit(c).cast("int").alias("cell"))
                  for (c, _), s in zip(cents, sims)])
    )
    probes = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"),
        F.explode(F.slice(ranked, 1, nprobe)).alias("pr"),
    ).select("query_id", "_qv", F.col("pr.cell").alias("cell"))
    scored = (
        F.broadcast(probes)
        .join(index.select("cell", F.col(id_col).alias("neighbor_id"),
                           F.col(vec_col).alias("_cv")), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine("_qv", "_cv").alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )


def semantic_dedup(
    emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """SemDeDup-style embedding near-duplicate GROUP assignment: LSH-bucketed
    candidate generation (lsh_ann_pairs — the scale path, no cross join),
    cosine-verified pairs >= threshold, transitive closure via large-star/
    small-star connected components, minimum member id kept as the group's
    canonical vector. Returns (id, dup_group, is_kept); singletons keep
    themselves.

    This is the 'which embeddings survive semantic dedup' step of a
    training-data pipeline: everything upstream of the CC is bucketed, and
    the CC itself runs on the (sparse) near-dup pair graph, not the corpus.
    """
    from .clustering import assign_clusters

    pairs = lsh_ann_pairs(
        emb, threshold, id_col, vec_col,
        dim=dim, n_planes=n_planes, bands=bands, seed=seed,
    )
    groups = assign_clusters(
        emb.select(id_col), pairs.select("id_a", "id_b"), id_col=id_col
    ).withColumnRenamed("cluster_id", "dup_group")
    return groups.select(
        id_col, "dup_group",
        (F.col(id_col) == F.col("dup_group")).alias("is_kept"),
    )


def lsh_band_keys(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """(id, chunk, chunk_val) LSH band keys for an embedding set — the
    rows a PERSISTED ANN index stores per vector (the embeddings twin of
    dedup.minhash_band_keys).  Signatures ride one Arrow-batched pass;
    only (id, 2 ints) leaves it."""
    sig = lsh_signature_udf(dim, n_planes, seed)
    chunk_bits = n_planes // bands
    mask = (1 << chunk_bits) - 1
    signed = emb.select(F.col(id_col), sig(F.col(vec_col)).alias("sig"))
    return signed.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("chunk"),
        F.col("sig"),
    ).withColumn(
        "chunk_val",
        F.expr(f"shiftright(sig, cast(chunk as int) * {chunk_bits}) & {mask}"),
    ).select(id_col, "chunk", "chunk_val")


def incremental_lsh_pairs(
    index_keys: DataFrame,
    batch: DataFrame,
    all_emb: DataFrame,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Rolling-ingest ANN: near-neighbor pairs introduced by a NEW batch of
    embeddings against a PERSISTED band-key index — new×old probes the
    index by (chunk, chunk_val) key join (old vectors are never
    re-signed), plus new×new within the batch; old×old pairs were
    emitted by the batches that introduced them.  The embeddings twin of
    dedup.incremental_minhash_pairs and the ANN leg of the repo's
    rolling-ingest trio (minhash dedup index, waterfall fingerprint
    index, LSH band index).  Verify re-reads vectors BY ID for candidate
    pairs only (`all_emb` — in production, the embeddings table)."""
    new_keys = lsh_band_keys(batch, id_col, vec_col, dim, n_planes, bands, seed)
    probe = new_keys.select(F.col(id_col).alias("_idn"), "chunk", "chunk_val")
    hits = (
        probe.join(
            index_keys.select(F.col(id_col).alias("_ido"), "chunk", "chunk_val"),
            ["chunk", "chunk_val"],
        )
        .filter(F.col("_idn") != F.col("_ido"))
        .select(
            F.least("_idn", "_ido").alias("id_a"),
            F.greatest("_idn", "_ido").alias("id_b"),
        )
    )
    within = (
        probe.join(
            new_keys.select(F.col(id_col).alias("_idb"), "chunk", "chunk_val"),
            ["chunk", "chunk_val"],
        )
        .filter(F.col("_idn") < F.col("_idb"))
        .select(F.col("_idn").alias("id_a"), F.col("_idb").alias("id_b"))
    )
    cands = hits.unionByName(within).distinct()
    va = all_emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    vb = all_emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        cands.join(va, "id_a").join(vb, "id_b")
        .select("id_a", "id_b", cosine("_va", "_vb").alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
