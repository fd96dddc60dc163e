"""sf1-scale smoke for the session-4 operators.

Drives the session-4 additions that are not already sf1-proved by
scripts/retract_bench.py — cluster_exemplars (closed-form medoids),
capture_recapture (Chapman duplicate-population estimate), filter_blocks
(Papadakis block filtering) and the turn-window fork grams behind
fork_detection — over the cached ~180k-entity / ~800k-turn corpus, with
hard invariants:

  * cluster_exemplars: one row per multi-member cluster; every exemplar
    is a member of its cluster; every cost within the feasible integer
    range [0, sentinel*(n-1)].
  * capture_recapture: n_both <= min(n_a, n_b); est_total >= the union
    actually found (Chapman estimate can never undercut the observed
    union); detector counts positive.
  * filter_blocks: per-entity retention == ceil(0.6 n) on the real key
    table; filtered candidate volume strictly below unfiltered.
  * fork grams: planted-duplicate conversations (>=6 turns) share >= 1
    turn-window gram with their base (a 2-edit tail change leaves the
    leading windows intact), and the gram pass stays bounded (rows ≈
    turns).

Canary-gated like every bench in this repo. Writes
BENCH_SF1_SESSION4.json. Usage: python scripts/sf1_session4_smoke.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from liblevenshtein_spark import LinkConfig  # noqa: E402
from liblevenshtein_spark.functions.blocking import filter_blocks  # noqa: E402
from liblevenshtein_spark.operators.candidates import block_keys, candidate_pairs  # noqa: E402
from liblevenshtein_spark.operators.canonicalize import canonicalize  # noqa: E402
from liblevenshtein_spark.operators.clustering import (  # noqa: E402
    assign_clusters, cluster_exemplars)
from liblevenshtein_spark.operators.metrics import capture_recapture  # noqa: E402
from liblevenshtein_spark.operators.ranking import sorted_neighborhood_pairs  # noqa: E402
from liblevenshtein_spark.operators.scoring import match_filter, score_pairs  # noqa: E402
from liblevenshtein_spark.session import build_session  # noqa: E402

SIG_LEN = 16


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_base = 72_000
    spark = build_session(
        app_name="sf1-session4-smoke",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus * 4,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "28g"),
            "spark.sql.execution.arrow.maxRecordsPerBatch": "3072",
        },
    )
    spark.range(1_000_000).select(F.sum("id")).collect()
    lat = []
    for _ in range(10):
        t = time.time()
        spark.range(1000).count()
        lat.append(time.time() - t)
    canary = round(statistics.median(lat), 3)

    cache = f"/tmp/lev_sf1_corpus_{n_base}"
    if not os.path.exists(os.path.join(cache, "_SUCCESS")):
        from liblevenshtein_spark.sources.tables import TRANSCRIPTS_SCHEMA
        from liblevenshtein_spark.testdata_gen import gen_transcript_rows

        rows, _ = gen_transcript_rows(
            n_base=n_base, dup_fraction=1.0, max_edits=2, max_dups=2, seed=1042,
        )
        (spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA)
         .repartition(cpus * 2).write.mode("overwrite").parquet(cache))

    conf = LinkConfig(algorithm="standard", max_distance=2,
                      blocking_scheme="segments")
    transcripts = spark.read.parquet(cache)
    canonical = canonicalize(transcripts).localCheckpoint(eager=True)
    n_entities = canonical.count()
    build, probe = block_keys(canonical, conf)
    pairs = candidate_pairs(build, probe, conf)
    texts = canonical.select("conv_id", "fingerprint")
    scored = score_pairs(pairs, texts, conf).localCheckpoint(eager=True)
    matches = match_filter(scored, conf).select("id_a", "id_b") \
        .localCheckpoint(eager=True)
    assignment = assign_clusters(canonical.select("conv_id"), matches) \
        .localCheckpoint(eager=True)

    checks: dict[str, bool] = {}
    timings: dict[str, float] = {}

    # --- cluster_exemplars -------------------------------------------------
    t0 = time.time()
    ex = cluster_exemplars(assignment, scored).localCheckpoint(eager=True)
    n_ex = ex.count()
    timings["cluster_exemplars"] = round(time.time() - t0, 1)
    sizes = assignment.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n")).filter("n >= 2")
    n_multi = sizes.count()
    checks["exemplar_one_per_multi_cluster"] = n_ex == n_multi
    member = assignment.select(
        F.col("cluster_id"), F.col("conv_id").alias("exemplar_id"))
    checks["exemplar_is_member"] = (
        ex.join(member, ["cluster_id", "exemplar_id"], "left_anti").count() == 0
    )
    checks["exemplar_cost_in_range"] = (
        ex.filter((F.col("exemplar_cost") < 0)
                  | (F.col("exemplar_cost") > 3 * (F.col("n_members") - 1)))
        .count() == 0
    )

    # --- capture_recapture -------------------------------------------------
    t0 = time.time()
    ents = canonical.select(
        "conv_id", F.expr(f"substring(fingerprint, 1, {SIG_LEN})").alias("sig"))
    snm = sorted_neighborhood_pairs(ents, "sig", window=4).select(
        F.least("id_a", "id_b").alias("id_a"),
        F.greatest("id_a", "id_b").alias("id_b"),
    ).distinct()
    cap_a = score_pairs(snm, texts, conf).filter("distance <= 2")
    sa = ents.select(F.col("conv_id").alias("id_a"), "sig")
    sb = ents.select(F.col("conv_id").alias("id_b"), "sig")
    sig_eq = sa.join(sb, "sig").filter("id_a < id_b").select("id_a", "id_b")
    cap_b = score_pairs(sig_eq, texts, conf).filter("distance <= 2")
    cr = capture_recapture(cap_a, cap_b).collect()[0]
    timings["capture_recapture"] = round(time.time() - t0, 1)
    checks["cr_overlap_bounded"] = cr.n_both <= min(cr.n_a, cr.n_b)
    checks["cr_est_covers_union"] = cr.est_total >= cr.n_a + cr.n_b - cr.n_both
    checks["cr_detectors_positive"] = cr.n_a > 0 and cr.n_b > 0

    # --- filter_blocks -----------------------------------------------------
    t0 = time.time()
    keys = build.select("conv_id", "block_key").distinct() \
        .localCheckpoint(eager=True)
    retained = filter_blocks(keys, ratio_tenths=6).localCheckpoint(eager=True)
    timings["filter_blocks"] = round(time.time() - t0, 1)
    kept_counts = retained.groupBy("conv_id").agg(F.count(F.lit(1)).alias("k"))
    all_counts = keys.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n"))
    bad_retention = (
        kept_counts.join(all_counts, "conv_id")
        .filter(F.col("k") != F.expr("(6 * n + 9) DIV 10"))
        .count()
    )
    checks["filter_retention_exact"] = bad_retention == 0

    def pair_count(kdf):
        a = kdf.select(F.col("conv_id").alias("id_a"), "block_key")
        b = kdf.select(F.col("conv_id").alias("id_b"), "block_key")
        return (a.join(b, "block_key").filter("id_a < id_b")
                .select("id_a", "id_b").distinct().count())

    n_all_pairs = pair_count(keys)
    n_filt_pairs = pair_count(retained)
    checks["filter_cuts_pairs"] = n_filt_pairs < n_all_pairs

    # --- fork grams --------------------------------------------------------
    t0 = time.time()
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    grams = (
        # null turn text filtered first: concat_ws SKIPS nulls, so without
        # this the gram recipe desyncs from any ||-based SQL cross-check
        # (same fix as driver_queries.q_fork_detection)
        transcripts.filter(F.col("text").isNotNull()).select(
            "conv_id",
            F.md5(F.concat_ws("\x1f", F.col("text"),
                              F.lead("text", 1).over(w),
                              F.lead("text", 2).over(w))).alias("gram"),
            F.lead("text", 2).over(w).alias("_t2"),
        )
        .filter(F.col("_t2").isNotNull())
        .select("conv_id", "gram")
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_grams = grams.count()
    timings["fork_grams"] = round(time.time() - t0, 1)
    n_turns = transcripts.count()
    checks["gram_volume_bounded"] = n_grams <= n_turns
    # Exact fork invariant, derived from the data (edits are applied INSIDE
    # single turns, so turn boundaries are preserved): a planted dup with
    # >= 6 turns and exactly ONE edited turn has 4+ windows of which the
    # edit kills at most 3 — it MUST share a window with its base.  (Dups
    # with two edited turns can legitimately lose every window when the two
    # turns jointly cover all of them; those are reported, not gated.)
    base_of = F.regexp_extract("conv_id", r"^(conv_\d+)_dup\d+$", 1)
    dup_turns = transcripts.withColumn("base", base_of).filter("base != ''") \
        .select("conv_id", "base", "turn_idx", "text")
    base_turns = transcripts.select(
        F.col("conv_id").alias("base"), "turn_idx",
        F.col("text").alias("base_text"))
    profile = (
        dup_turns.join(base_turns, ["base", "turn_idx"])
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("nt"),
            F.sum(F.when(F.col("text") != F.col("base_text"), 1)
                  .otherwise(0)).alias("n_diff"),
        )
    )
    one_edit_long = profile.filter("nt >= 6 AND n_diff <= 1") \
        .select("conv_id").localCheckpoint(eager=True)
    dup_grams = grams.withColumn("base", base_of).filter("base != ''")
    shared = (
        dup_grams.join(one_edit_long, "conv_id")
        .join(grams.select(F.col("conv_id").alias("base"), "gram"),
              ["base", "gram"])
        .select("conv_id").distinct().count()
    )
    n_long_dups = one_edit_long.count()
    checks["fork_planted_share_window"] = shared == n_long_dups

    out = {
        "metric": "sf1_session4_ops",
        "cpus": cpus,
        "job_latency_canary_sec": canary,
        "canary_healthy": canary < 0.15,
        "n_entities": n_entities,
        "n_multi_clusters": n_multi,
        "n_exemplars": n_ex,
        "capture_recapture": {"n_a": cr.n_a, "n_b": cr.n_b,
                              "n_both": cr.n_both,
                              "est_total": cr.est_total,
                              "est_missed": cr.est_missed},
        "block_pairs_unfiltered": n_all_pairs,
        "block_pairs_filtered": n_filt_pairs,
        "n_turn_window_grams": n_grams,
        "n_long_planted_dups": n_long_dups,
        "timings_sec": timings,
        "checks": checks,
        "all_pass": all(checks.values()),
    }
    with open(os.path.join(REPO, "BENCH_SF1_SESSION4.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    assert out["all_pass"], checks


if __name__ == "__main__":
    main()
