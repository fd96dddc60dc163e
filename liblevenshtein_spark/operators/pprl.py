"""Privacy-preserving record linkage (PPRL) via Bloom-filter encodings.

The reference transducer compares CLEARTEXT terms (README.md:13-24).  In
production entity resolution the two sides of a linkage frequently cannot
exchange cleartext identifiers at all (patient records, cross-company
customer mastering) — the standard answer is Schnell, Bachteler & Reiher
2009 (BMC Med Inform Decis Mak 9:41): encode each identifier's character
q-gram set into a fixed-width Bloom filter with k independent hash
functions, share only the bit vectors, and compare encodings with the Dice
coefficient (Dice ≈ q-gram Jaccard, degraded only by bit collisions).
Similar strings share most q-grams, hence most set bits, so the encoding
preserves approximate similarity while individual grams stay hidden behind
the many-to-one hash mapping.

Engine mapping:
- A Bloom encoding is an `array<int>` of SORTED DISTINCT set-bit positions
  (sparse form; m ≤ a few hundred bits, so the array is tiny and
  constant-width — it broadcasts and shuffles for free at any corpus size).
- The k hash functions are md5-derived and PORTABLE: bit_j(gram) =
  int(md5(gram || ':' || j)[:8], 16) % m, computed identically by Spark
  (`conv(substring(md5(..), 1, 8), 16, 10)`) and the DuckDB oracles
  (`CAST('0x' || substring(md5(..), 1, 8) AS BIGINT)`) — the repo's
  portable-md5 convention, so encodings gate bit-for-bit across engines.
- `dice_pairs` consumes an ALREADY BLOCKED (id_a, id_b) stream: per-pair
  cost is O(m) array intersection inside whole-stage codegen, never
  all-pairs.
- `bloom_band_candidates` is the PRIVATE blocking layer: split the m bit
  positions into `bands` fixed ranges and key each encoding by the exact
  bit subset it sets within a band (LSH-style banding on the encoding, not
  the cleartext — Durham et al. 2012's composite blocking shape).  Two
  encodings collide on a band iff they agree on every bit in that range,
  so near-identical grams sets collide on most bands.  Empty bands emit no
  key: agreement-on-absence is shared by almost every pair and would
  create one giant bucket (and is not similarity evidence).  The self-join
  is bucketed by (band, subset) — candidate cost rides bucket sizes, the
  only shape that survives 10^12 rows.

Scale notes (local[32] is the rig; design target is a 1000-executor
cluster): encoding is a narrow map + one hash agg per id (map-side
combine); banding shuffles (id, band_key) rows only — the bit arrays
re-join by id afterwards; nothing here rescans texts or is quadratic in
the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import gate_round4


def bloom_encode(
    entities: DataFrame,
    id_col: str = "conv_id",
    text_col: str = "sig",
    q: int = 2,
    k: int = 4,
    m: int = 256,
) -> DataFrame:
    """Encode `text_col` into a Bloom filter: (id, bloom array<int>, n_bits).

    Grams are the q-character substrings of the raw field (no padding —
    Schnell et al. use padded grams; padding is a caller-side concat if
    wanted).  A field shorter than q contributes its whole text as the
    single gram.  Gram SETS drive the encoding (duplicate grams set the
    same bits), matching the Dice-over-sets semantics of the oracle.
    """
    grams = F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(length({text_col}) - {q - 1}, 1)),"
            f" i -> substring({text_col}, i, {q}))"
        )
    )
    hashes = F.array(*[F.lit(j) for j in range(k)])
    g = entities.select(F.col(id_col).alias("id"), F.explode(grams).alias("gram"))
    bits = g.select(
        "id",
        F.explode(hashes).alias("j"),
        F.col("gram"),
    ).select(
        "id",
        (
            F.conv(
                F.substring(F.md5(F.concat_ws(":", F.col("gram"), F.col("j"))), 1, 8),
                16,
                10,
            ).cast("long")
            % m
        ).cast("int").alias("bit"),
    )
    return (
        bits.groupBy("id")
        .agg(F.array_sort(F.collect_set("bit")).alias("bloom"))
        .select("id", "bloom", F.size("bloom").alias("n_bits"))
    )


def dice_pairs(
    pairs: DataFrame,
    encoded: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Dice coefficient 2|A∩B| / (|A|+|B|) for each blocked candidate pair
    over Bloom encodings from `bloom_encode`.

    Plan shape: two id-keyed joins to attach the (tiny, fixed-width) bit
    arrays, then a codegen'd `array_intersect` — no shuffle beyond the
    joins, cost strictly candidate-bounded.  The gated float goes through
    `gate_round4` so the DuckDB oracle hashes identically.
    """
    ea = encoded.select(
        F.col("id").alias(id_a), F.col("bloom").alias("_ba"), F.col("n_bits").alias("_na")
    )
    eb = encoded.select(
        F.col("id").alias(id_b), F.col("bloom").alias("_bb"), F.col("n_bits").alias("_nb")
    )
    return (
        pairs.select(id_a, id_b)
        .join(ea, id_a)
        .join(eb, id_b)
        .select(
            id_a,
            id_b,
            gate_round4(
                2.0
                * F.size(F.array_intersect(F.col("_ba"), F.col("_bb")))
                / (F.col("_na") + F.col("_nb"))
            ).alias("dice"),
        )
    )


def bloom_band_candidates(
    encoded: DataFrame,
    m: int = 256,
    bands: int = 16,
    min_bands: int = 1,
    other: DataFrame | None = None,
) -> DataFrame:
    """Private candidate generation: self-join the encodings on per-band
    bit-subset keys.  Returns (id_a, id_b, n_shared_bands) with
    id_a < id_b, one row per pair agreeing on >= `min_bands` bands.

    Key = (band, exact sorted bit list within [band·w, (band+1)·w)), w =
    m / bands.  A pair collides on a band iff that band's bit pattern
    matches exactly; `min_bands` is the multi-band agreement rule — on
    natural-language gram distributions single-band agreement is common
    by chance (frequent bigrams share bits), so requiring 2+ agreeing
    bands cuts the candidate volume by orders of magnitude while
    near-identical gram sets (which agree on almost every band) keep
    colliding.  Only ids and band keys ride the shuffle; the agreement
    count is one hash agg on the collision stream; empty bands emit
    nothing (see module docstring).

    `other`: two-table (A×B) mode — the cross-source private mastering
    shape.  `encoded` is the persisted index side (e.g. the entity
    master's encodings, written once), `other` is the new-ingest batch;
    candidates pair an `encoded` id (id_a) with an `other` id (id_b)
    ONLY — no within-side pairs, side identity preserved.  The index
    side's band keys are exactly what a production deployment persists:
    probing a new batch is a key join against that index, it never
    re-encodes or rescans the master.
    """
    w = m // bands

    def _keyed(df: DataFrame) -> DataFrame:
        return (
            df.select("id", F.explode("bloom").alias("bit"))
            .withColumn("band", (F.col("bit") / w).cast("int"))
            .groupBy("id", "band")
            .agg(F.array_join(F.array_sort(F.collect_list("bit")), ",").alias("band_sig"))
        )

    keyed = _keyed(encoded)
    a = keyed.select(F.col("id").alias("id_a"), "band", "band_sig")
    if other is None:
        b = keyed.select(F.col("id").alias("id_b"), "band", "band_sig")
        joined = a.join(b, ["band", "band_sig"]).filter(F.col("id_a") < F.col("id_b"))
    else:
        b = _keyed(other).select(F.col("id").alias("id_b"), "band", "band_sig")
        joined = a.join(b, ["band", "band_sig"])
    return (
        joined.groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("int").alias("n_shared_bands"))
        .filter(F.col("n_shared_bands") >= min_bands)
    )
