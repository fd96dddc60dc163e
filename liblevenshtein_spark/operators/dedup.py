"""Deduplication operators for 100TB-scale training-data pipelines: exact
(hash groupBy), n-gram Jaccard, MinHash+LSH, and SimHash. All pure
DataFrame/SQL operators — zero UDFs — built on the portable 60-bit md5 hash
(functions.text.portable_hash64) so every operator has an exact DuckDB
oracle.

Scale notes (designed for 1000-executor runs, tested at sf):
* every pairwise step is blocked (shared shingle / LSH band / SimHash band)
  — no cross joins anywhere;
* shingle explosion is the big shuffle: rows = docs x shingles (and x perms
  for MinHash); partial aggregation (map-side min/count) keeps the shuffle
  narrow since keys dominate values;
* stop-shingle demotion (df_cap) drops shingles shared by more than a
  bounded number of docs from PAIR GENERATION only (they stay in the
  signature/jaccard denominators), the classic guard against the 'the quick
  brown fox' bucket that would otherwise go quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import gate_round4, normalized_fingerprint, portable_hash64, tokens

__all__ = [
    "exact_dedup", "word_ngrams", "doc_shingles", "jaccard_for_pairs",
    "jaccard_pairs", "containment_pairs", "minhash_signatures",
    "minhash_lsh_pairs", "minhash_band_keys", "incremental_minhash_pairs",
    "simhash", "simhash_pairs", "dedup_groups",
    "keep_best_groups", "dedup_turns", "ppjoin_pairs",
]


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                normalized: bool = False) -> DataFrame:
    """(id) -> (id, dup_group, canonical_id, is_canonical): docs with equal
    (optionally normalized) text share a dup_group; the minimum id is
    canonical. One hash-agg shuffle + one broadcast-able join back."""
    fp = normalized_fingerprint(text_col) if normalized else F.md5(F.col(text_col))
    keyed = df.select(F.col(id_col), fp.alias("dup_group"))
    groups = keyed.groupBy("dup_group").agg(F.min(id_col).alias("canonical_id"))
    return (
        keyed.join(groups, "dup_group")
        .select(
            id_col, "dup_group", "canonical_id",
            (F.col(id_col) == F.col("canonical_id")).alias("is_canonical"),
        )
    )


def word_ngrams(col: str, n: int):
    """array<string> of word n-grams (space-joined); empty when fewer than n
    tokens."""
    toks = tokens(col)
    return F.when(
        F.size(toks) < n, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - n + 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def doc_shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                 n: int = 3) -> DataFrame:
    """(id, shingle) distinct — the exploded shingle set."""
    return df.select(
        F.col(id_col), F.explode(word_ngrams(text_col, n)).alias("shingle")
    ).distinct()


def _pair_candidates(sh: DataFrame, id_col: str, df_cap: int | None) -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing at least one (non-stop) shingle."""
    if df_cap is not None:
        freq = sh.groupBy("shingle").agg(F.count("*").alias("_df"))
        sh = sh.join(
            F.broadcast(freq.filter(F.col("_df") > df_cap).select("shingle")),
            "shingle", "left_anti",
        )
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    return (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_for_pairs(sh: DataFrame, cands: DataFrame, threshold: float,
                      id_col: str = "doc_id") -> DataFrame:
    """Exact Jaccard for a GIVEN candidate pair set: each candidate pair is
    joined to its two shingle sets (cost ∝ |cands| x shingles-per-doc), never
    via the full shingle self-join — this is what keeps LSH/capped blocking
    cheaper than no blocking at scale. Intersections are counted over ALL
    shingles (stop shingles included), so the Jaccard value is exact even
    when the candidate set came from a df-capped or banded generator.
    Returns (id_a, id_b, jaccard >= threshold)."""
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    sa = sh.select(F.col(id_col).alias("id_a"), "shingle")
    sb = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        cands.join(sa, "id_a")
        .join(sb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    za = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    zb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(za, "id_a").join(zb, "id_b")
        .withColumn(
            "jaccard",
            gate_round4(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def jaccard_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                  n: int = 3, threshold: float = 0.6,
                  df_cap: int | None = None) -> DataFrame:
    """Near-duplicate pairs by exact n-gram Jaccard >= threshold, blocked on
    shared shingles: |A ∩ B| via a groupBy over the shingle join, |A ∪ B|
    from per-doc shingle counts. Returns (id_a, id_b, jaccard).

    `df_cap` demotes shingles shared by more than df_cap docs from PAIR
    GENERATION (the quadratic step) — they still count in every intersection
    and denominator, so reported Jaccard values are exact; only pairs whose
    shared shingles are ALL boilerplate are missed (the standard
    recall/cost trade)."""
    sh = doc_shingles(df, id_col, text_col, n)
    if df_cap is not None:
        # materialize once: the stop-shingle filter, pair generation and
        # per-pair verify each consume the shingle set — without this the
        # tokenize+explode lineage re-runs ~6x (candidate_pairs had the
        # same bug; measured on the 100k-doc dedup smoke)
        sh = sh.localCheckpoint(eager=True)
        return jaccard_for_pairs(sh, _pair_candidates(sh, id_col, df_cap),
                                 threshold, id_col)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a").join(sb, "id_b")
        .withColumn(
            "jaccard",
            gate_round4(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                       n_perms: int = 16, shingle_n: int = 3,
                       shingles: DataFrame | None = None) -> DataFrame:
    """(id, perm, minhash): n_perms MinHash values per doc over its word
    shingles, using the portable md5-based hash family h_p(s) =
    hash64(p | s). Docs with zero shingles have no signature.

    Shape: all n_perms hashes of a shingle are computed as ONE array row
    and reduced with n_perms columnar min aggregates (map-side combine),
    so the shuffle carries docs-x-shingles rows — NOT docs x shingles x
    perms: at 100k docs / 32 perms that is 5M rows instead of 160M
    (measured ~4x on the dedup smoke). The (id, perm, minhash) long form
    is re-derived by posexplode after the aggregate.

    `shingles` short-circuits shingle generation with a precomputed
    (id, shingle) frame (minhash_lsh_pairs shares one materialized set
    between signatures and verify)."""
    sh = shingles if shingles is not None else doc_shingles(df, id_col, text_col, shingle_n)
    hashes = F.array(*[
        portable_hash64(F.lit(str(p)), F.col("shingle")) for p in range(n_perms)
    ])
    wide = (
        sh.select(F.col(id_col), hashes.alias("_hs"))
        .groupBy(id_col)
        .agg(*[F.min(F.col("_hs")[p]).alias(f"_m{p}") for p in range(n_perms)])
    )
    return wide.select(
        F.col(id_col),
        F.posexplode(F.array(*[F.col(f"_m{p}") for p in range(n_perms)])).alias(
            "perm", "minhash"
        ),
    )


def minhash_lsh_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                      n_perms: int = 16, bands: int = 4, shingle_n: int = 3,
                      threshold: float = 0.5) -> DataFrame:
    """MinHash-LSH near-dup pairs: band the signature (n_perms / bands rows
    per band), bucket-join on (band, banded signature), then verify with
    exact Jaccard >= threshold computed ONLY for the LSH candidates
    (jaccard_for_pairs) — verifying against the full shingle-sharing pair
    stream would cost more than not using LSH at all. Returns
    (id_a, id_b, jaccard)."""
    sh = doc_shingles(df, id_col, text_col, shingle_n).localCheckpoint(eager=True)
    band_keys = minhash_band_keys(df, id_col, text_col, n_perms, bands,
                                  shingle_n, shingles=sh)
    a = band_keys.select(F.col(id_col).alias("id_a"), "band_key")
    b = band_keys.select(F.col(id_col).alias("id_b"), "band_key")
    cands = (
        a.join(b, "band_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return jaccard_for_pairs(sh, cands, threshold, id_col)


def minhash_band_keys(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                      n_perms: int = 16, bands: int = 4, shingle_n: int = 3,
                      shingles: DataFrame | None = None) -> DataFrame:
    """(id, band_key): the LSH bucket keys — the PERSISTABLE dedup index.
    At ingest scale this table is what a pipeline stores per corpus
    partition (n_perms/bands strings per doc, no shingles, no raw text) so
    a later batch can be deduped against the corpus without touching it."""
    sig = minhash_signatures(df, id_col, text_col, n_perms, shingle_n,
                             shingles=shingles)
    rows_per_band = n_perms // bands
    return (
        sig.withColumn("band", (F.col("perm") / rows_per_band).cast("int"))
        .groupBy(id_col, "band")
        .agg(F.sort_array(F.collect_list(F.concat_ws(":", "perm", "minhash"))).alias("sig"))
        .select(
            F.col(id_col),
            F.concat_ws("|", F.col("band").cast("string"), F.array_join("sig", ",")).alias("band_key"),
        )
    )


def minhash_estimate_pairs(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", n_perms: int = 16,
                           bands: int = 4, shingle_n: int = 3) -> DataFrame:
    """Estimator-accuracy audit for the MinHash sketch: for every LSH
    candidate pair, the sketch's Jaccard estimate (matching signature
    components / n_perms) side by side with the exact Jaccard, plus the
    absolute error in 1e-4 units — the number a pipeline owner watches to
    size n_perms before trusting sketch-only dedup at full scale.

    Cost shape matches minhash_lsh_pairs: one shingle materialization
    shared by signatures and the exact verify, candidates from the band
    bucket join, and the component-match count is a (pair, perm) equi-join
    on the n_perms-row signature frames — everything downstream of blocking
    is proportional to |candidates|, never corpus².

    Returns (id_a, id_b, est_16:int, jaccard, abs_err_1e4:bigint); pairs
    whose exact intersection is empty (pure hash-collision candidates)
    report jaccard 0.0."""
    sh = doc_shingles(df, id_col, text_col, shingle_n).localCheckpoint(eager=True)
    sig = minhash_signatures(df, id_col, text_col, n_perms, shingle_n,
                             shingles=sh)
    band_keys = minhash_band_keys(df, id_col, text_col, n_perms, bands,
                                  shingle_n, shingles=sh)
    a = band_keys.select(F.col(id_col).alias("id_a"), "band_key")
    b = band_keys.select(F.col(id_col).alias("id_b"), "band_key")
    cands = (
        a.join(b, "band_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sa = sig.select(F.col(id_col).alias("id_a"), "perm",
                    F.col("minhash").alias("_mh_a"))
    sb = sig.select(F.col(id_col).alias("id_b"), "perm",
                    F.col("minhash").alias("_mh_b"))
    est = (
        cands.join(sa, "id_a").join(sb, ["id_b", "perm"])
        .groupBy("id_a", "id_b")
        .agg(F.sum((F.col("_mh_a") == F.col("_mh_b")).cast("int"))
             .cast("int").alias("est_16"))
    )
    exact = jaccard_for_pairs(sh, cands, threshold=0.0, id_col=id_col)
    return (
        est.join(exact, ["id_a", "id_b"], "left")
        .select(
            "id_a", "id_b", "est_16",
            F.coalesce("jaccard", F.lit(0.0)).alias("jaccard"),
            F.round(F.abs(F.col("est_16") / n_perms
                          - F.coalesce("jaccard", F.lit(0.0))) * 10_000)
            .cast("bigint").alias("abs_err_1e4"),
        )
    )


def incremental_minhash_pairs(new_docs: DataFrame, stored_index: DataFrame,
                              corpus: DataFrame,
                              id_col: str = "doc_id", text_col: str = "text",
                              n_perms: int = 16, bands: int = 4,
                              shingle_n: int = 3,
                              threshold: float = 0.5) -> DataFrame:
    """Dedup an incoming batch against an already-indexed corpus — the
    100 TB ingest path: only the NEW docs are shingled and hashed;
    `stored_index` is the persisted (id, band_key) table from
    minhash_band_keys. Candidates come from probing new band keys against
    stored ∪ new keys (new×old and new×new duplicates; old×old pairs were
    already found when the old batches landed). The exact-Jaccard verify
    re-shingles ONLY candidate docs — `corpus` (id, text) is semi-joined on
    the candidate ids first, so the old corpus is never re-scanned beyond
    the matched rows. Equivalent to minhash_lsh_pairs(old ∪ new) restricted
    to pairs touching a new doc (pytest-gated)."""
    new_keys = minhash_band_keys(new_docs, id_col, text_col, n_perms, bands,
                                 shingle_n)
    all_keys = stored_index.unionByName(new_keys)
    probe = new_keys.select(F.col(id_col).alias("_ida"), "band_key")
    build = all_keys.select(F.col(id_col).alias("_idb"), "band_key")
    cands = (
        probe.join(build, "band_key")
        .filter(F.col("_ida") != F.col("_idb"))
        .select(
            F.least("_ida", "_idb").alias("id_a"),
            F.greatest("_ida", "_idb").alias("id_b"),
        )
        .distinct()
    )
    cand_ids = (
        cands.select(F.col("id_a").alias(id_col))
        .union(cands.select("id_b"))
        .distinct()
    )
    sub = corpus.join(cand_ids, id_col, "left_semi")
    sh = doc_shingles(sub, id_col, text_col, shingle_n)
    return jaccard_for_pairs(sh, cands, threshold, id_col)


def containment_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", n: int = 3,
                      threshold: float = 0.8,
                      df_cap: int | None = None) -> DataFrame:
    """Near-dup pairs by n-gram CONTAINMENT >= threshold:
    |A ∩ B| / min(|A|, |B|) — catches subset/prefix duplication (a short
    doc embedded in a longer one) that symmetric Jaccard under-scores,
    the standard complement to Jaccard in training-corpus dedup.

    Candidates come from the same capped shared-shingle blocking as
    jaccard_pairs (`df_cap` demotes boilerplate shingles from PAIR
    GENERATION only; intersection counts stay exact). Returns
    (id_a, id_b, containment)."""
    sh = doc_shingles(df, id_col, text_col, n).localCheckpoint(eager=True)
    cands = _pair_candidates(sh, id_col, df_cap)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    sa = sh.select(F.col(id_col).alias("id_a"), "shingle")
    sb = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        cands.join(sa, "id_a")
        .join(sb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    za = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    zb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(za, "id_a").join(zb, "id_b")
        .withColumn(
            "containment",
            gate_round4(F.col("n_inter") / F.least(F.col("n_a"), F.col("n_b"))),
        )
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", "containment")
    )


def dedup_groups(docs: DataFrame, pairs: DataFrame,
                 id_col: str = "doc_id") -> DataFrame:
    """Near-dup pairs -> keep-one-per-group: transitive closure of the pair
    graph (large-star/small-star CC, operators.clustering) with the minimum
    id as the group's canonical document — the "which docs survive dedup"
    step a training pipeline runs after any pair generator (minhash / simhash
    / jaccard / cosine). Returns (id, dup_group, is_canonical); singletons
    are their own group."""
    from .clustering import assign_clusters

    groups = assign_clusters(
        docs.select(id_col),
        pairs.select(F.col("id_a"), F.col("id_b")),
        id_col=id_col,
    ).withColumnRenamed("cluster_id", "dup_group")
    return groups.select(
        id_col, "dup_group",
        (F.col(id_col) == F.col("dup_group")).alias("is_canonical"),
    )


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            bits: int = 32) -> DataFrame:
    """(id, simhash): `bits`-bit SimHash over distinct whitespace tokens —
    bit b is the sign of the vote sum over token-hash bits. Pure exprs.

    Shape: the per-token ±1 votes for all `bits` positions are one array
    row reduced by `bits` columnar sum aggregates (map-side combine), so
    the shuffle carries docs-x-tokens rows, not docs x tokens x bits —
    the same reshape as minhash_signatures. The final value is assembled
    with shiftleft exprs (two's-complement-exact for bit 63, matching the
    previous row-exploded implementation and the DuckDB oracle)."""
    toks = df.select(
        F.col(id_col), F.explode(F.array_distinct(tokens(text_col))).alias("tok")
    ).withColumn("h", portable_hash64(F.lit("sim"), F.col("tok")))
    votes_arr = F.array(*[
        F.expr(f"(shiftright(h, {b}) & 1) * 2 - 1") for b in range(bits)
    ])
    wide = (
        toks.select(F.col(id_col), votes_arr.alias("_v"))
        .groupBy(id_col)
        .agg(*[F.sum(F.col("_v")[b]).alias(f"_v{b}") for b in range(bits)])
    )
    contribs = [
        F.expr(f"shiftleft(cast((_v{b} > 0) as bigint), {b})") for b in range(bits)
    ]
    total = contribs[0]
    for c in contribs[1:]:
        total = total + c
    return wide.select(F.col(id_col), total.alias("simhash"))


def simhash_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                  bits: int = 32, bands: int = 4, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance <= max_hamming, blocked
    on `bands` bit-chunks (pigeonhole: <= bands-1 differing bits leaves one
    chunk intact; max_hamming must be < bands). Returns
    (id_a, id_b, hamming)."""
    if max_hamming >= bands:
        raise ValueError("completeness requires max_hamming < bands")
    sh = simhash(df, id_col, text_col, bits)
    chunk_bits = bits // bands
    mask = (1 << chunk_bits) - 1
    chunks = sh.select(
        F.col(id_col), F.col("simhash"),
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("chunk"),
    ).withColumn(
        "chunk_val",
        F.expr(f"shiftright(simhash, cast(chunk as int) * {chunk_bits}) & {mask}"),
    )
    a = chunks.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"),
                      "chunk", "chunk_val")
    b = chunks.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"),
                      "chunk", "chunk_val")
    return (
        a.join(b, ["chunk", "chunk_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("int").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def dedup_turns(turns: DataFrame, conv_col: str = "conv_id",
                idx_col: str = "turn_idx", text_col: str = "text") -> DataFrame:
    """Sub-record (turn/paragraph) exact dedup across a transcript corpus:
    every distinct normalized turn text keeps its FIRST occurrence in
    (conv_id, turn_idx) order; later occurrences are flagged — the
    transcript analogue of Common-Crawl-style duplicated-paragraph removal
    (boilerplate greetings, repeated tool dumps, templated system turns).

    Returns one row per input turn: (conv_id, turn_idx, n_occurrences,
    is_dup). Downstream, `filter(~is_dup)` + canonicalize rebuilds the
    deduplicated fingerprints.

    Scale shape: one hash aggregate keyed by the normalized-text hash
    (map-side combine collapses each executor's duplicates before the
    shuffle — exactly the skew pattern of boilerplate: hot text, huge
    partial counts, tiny post-agg rows) + one equi join back. The keeper is
    `min(struct(conv_id, turn_idx))` inside the aggregate, NOT a
    per-text-group window: a row_number window would funnel every copy of a
    hot boilerplate turn through one task. Text rides the shuffle alongside
    its 64-bit hash so equal hashes never merge distinct texts."""
    norm = F.lower(F.col(text_col))
    keyed = turns.select(
        F.col(conv_col), F.col(idx_col),
        F.xxhash64(norm).alias("_h"), norm.alias("_norm"),
    )
    groups = keyed.groupBy("_h", "_norm").agg(
        F.min(F.struct(conv_col, idx_col)).alias("_keep"),
        F.count("*").cast("int").alias("n_occurrences"),
    )
    return keyed.join(groups, ["_h", "_norm"]).select(
        conv_col, idx_col, "n_occurrences",
        (
            ~(
                (F.col(conv_col) == F.col(f"_keep.{conv_col}"))
                & (F.col(idx_col) == F.col(f"_keep.{idx_col}"))
            )
        ).alias("is_dup"),
    )


def keep_best_groups(docs: DataFrame, pairs: DataFrame,
                     score_col: str = "quality_score",
                     id_col: str = "doc_id") -> DataFrame:
    """Near-dup pairs -> quality-preferred keep-one-per-group: like
    dedup_groups, but the survivor is the group member with the HIGHEST
    score (ties -> minimum id) instead of blindly keeping the minimum id —
    what a training pipeline actually wants when near-dups differ in
    quality (truncated vs full page, boilerplate-wrapped vs clean).

    `docs` must carry (id_col, score_col); returns
    (id, dup_group, score, is_kept). The ranking is a per-group window —
    groups are near-dup clusters, so partitions are tiny by construction
    and the window never sees corpus-scale skew."""
    from pyspark.sql import Window

    from .clustering import assign_clusters

    groups = assign_clusters(
        docs.select(id_col), pairs.select("id_a", "id_b"), id_col=id_col
    ).withColumnRenamed("cluster_id", "dup_group")
    scored = groups.join(docs.select(id_col, score_col), id_col)
    w = Window.partitionBy("dup_group").orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .select(
            id_col, "dup_group", score_col,
            (F.col("_rn") == 1).alias("is_kept"),
        )
    )


def ppjoin_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                 n: int = 3, threshold: float = 0.6) -> DataFrame:
    """LOSSLESS set-similarity self-join via prefix filtering with the
    positional refinement — the AllPairs/PPJoin discipline (Bayardo et al.
    WWW 2007; Xiao et al. WWW 2008) — returning EXACTLY the pairs with
    shingle-set Jaccard >= threshold, like jaccard_pairs with no df_cap,
    but without ever joining on common shingles outside each document's
    short prefix.

    Principle: order every document's shingles by ascending global document
    frequency (rarest first, ties by shingle text); a pair with Jaccard >=
    t must share at least ceil(t*|A|) shingles, so it must share one inside
    A's first |A| - ceil(t*|A|) + 1 — the PREFIX. Only prefix rows enter
    the self-join, so the hot 'the quick brown fox' shingles that make the
    naive shingle join quadratic are joined only by the (few) documents
    whose prefix reaches them. The positional filter then prunes candidate
    pairs whose best-case remaining overlap 1 + min(|A|-pos_a, |B|-pos_b)
    is below the Jaccard overlap bound ceil(t/(1+t)*(|A|+|B|)); exact
    Jaccard verification (jaccard_for_pairs, cost ∝ candidates) decides.

    Float safety: prefix lengths / overlap bounds use ceil(x - 1e-9) so a
    binary-float product like 0.6*5 = 3.0000000000000004 can only ERR
    TOWARD a longer prefix / weaker prune — more candidates, never a lost
    pair; the verify stage keeps the result exact either way. Generation
    additionally runs at threshold - 1e-4: the verify filter compares the
    4-DECIMAL-ROUNDED Jaccard (gate_round4, the repo's float-stability
    convention), which admits true values down to threshold - 5e-5, so the
    prefix/positional bounds must be lossless down there too.

    Scale shape vs the siblings: jaccard_pairs(df_cap) bounds the hot
    buckets by DROPPING them from generation (lossy on all-boilerplate
    pairs); minhash_lsh_pairs bounds them probabilistically; ppjoin is the
    EXACT bounded path — one df agg (map-side combined), one per-doc
    window over docs-x-shingles rows, a self-join carrying only prefix
    rows, and a candidate-bounded verify. No UDFs, no cross join."""
    from pyspark.sql import Window

    eps = F.lit(1e-9)
    t_gen = max(0.0, threshold - 1e-4)
    sh = doc_shingles(df, id_col, text_col, n).localCheckpoint(eager=True)
    freq = sh.groupBy("shingle").agg(F.count("*").alias("_df"))
    w = Window.partitionBy(id_col).orderBy("_df", "shingle")
    ranked = (
        sh.join(freq, "shingle")
        .select(
            F.col(id_col), "shingle", "_df",
            F.row_number().over(w).alias("pos"),
            F.count("*").over(Window.partitionBy(id_col)).alias("n_sh"),
        )
    )
    prefix_len = (
        F.col("n_sh") - F.ceil(F.lit(t_gen) * F.col("n_sh") - eps) + 1
    )
    prefix = ranked.filter(F.col("pos") <= prefix_len).select(
        F.col(id_col), "shingle", "pos", "n_sh"
    )
    a = prefix.select(
        F.col(id_col).alias("id_a"), "shingle",
        F.col("pos").alias("pos_a"), F.col("n_sh").alias("n_a"),
    )
    b = prefix.select(
        F.col(id_col).alias("id_b"), "shingle",
        F.col("pos").alias("pos_b"), F.col("n_sh").alias("n_b"),
    )
    alpha = F.ceil(
        F.lit(t_gen / (1.0 + t_gen)) * (F.col("n_a") + F.col("n_b")) - eps
    )
    cands = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.lit(1) + F.least(
                F.col("n_a") - F.col("pos_a"), F.col("n_b") - F.col("pos_b")
            ) >= alpha
        )
        .select("id_a", "id_b")
        .distinct()
    )
    return jaccard_for_pairs(sh, cands, threshold, id_col)
