"""sf1-scale smoke for the round-4 evidence/estimation operators.

Drives the auxiliary-evidence and model-estimation family over the cached
~180k-entity / ~810k-turn corpus (built by scripts/bench_sf1.py):

  * time_decay_weights: temporal decay over the full match stream with
    deterministic per-entity days — row count preserved, delta-0 pairs
    carry weight exactly 1.0, every weight in (0, 1].
  * relational_jaccard: sparse tool-profile overlap for every matched
    pair (profiles derived from per-turn md5, ~16 items max) —
    row count preserved, n_common <= n_union, jaccard in [0, 1].
  * fs_em: unsupervised EM over the candidate ∪ offset gamma histogram —
    lambda strictly inside (0, 1), m > u per field (agreement must be
    evidence FOR match on this corpus).
  * greedy_scheme_selection: deletion + sorted-neighborhood schemes vs
    hash-sampled banded truth — the deletion scheme's recall is 1.0 by
    the blocking-completeness gate, so the greedy curve must END at 1.0
    and the marginals must sum to the covered-truth count.

Canary-gated like every bench in this repo. Writes BENCH_SF1_EVIDENCE.json.
Usage: python scripts/sf1_evidence_smoke.py [--n-base 72000]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from liblevenshtein_spark import LinkConfig  # noqa: E402
from liblevenshtein_spark.functions.text import portable_hash64  # noqa: E402
from liblevenshtein_spark.operators.candidates import block_keys, candidate_pairs  # noqa: E402
from liblevenshtein_spark.operators.canonicalize import canonicalize  # noqa: E402
from liblevenshtein_spark.operators.evidence import (  # noqa: E402
    relational_jaccard, time_decay_weights)
from liblevenshtein_spark.operators.metrics import (  # noqa: E402
    banded_truth_pairs, fs_em, greedy_scheme_selection)
from liblevenshtein_spark.operators.ranking import sorted_neighborhood_pairs  # noqa: E402
from liblevenshtein_spark.operators.sampling import sample_corpus  # noqa: E402
from liblevenshtein_spark.operators.scoring import match_filter, score_pairs  # noqa: E402
from liblevenshtein_spark.session import build_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--n-base", type=int, default=72_000)
    ap.add_argument("--truth-rate", type=float, default=0.05)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_SF1_EVIDENCE.json"))
    args = ap.parse_args()

    cache = f"/tmp/lev_sf1_corpus_{args.n_base}"
    if not os.path.exists(os.path.join(cache, "_SUCCESS")):
        raise SystemExit(f"run scripts/bench_sf1.py first to build {cache}")

    spark = build_session(
        app_name="sf1-evidence-ops",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus * 4,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "28g"),
            "spark.sql.execution.arrow.maxRecordsPerBatch": "3072",
        },
    )
    conf = LinkConfig(algorithm="standard", max_distance=2, blocking_scheme="segments")

    spark.range(1_000_000).select(F.sum("id")).collect()
    lat = []
    for _ in range(10):
        t = time.time()
        spark.range(1000).count()
        lat.append(time.time() - t)
    canary = round(statistics.median(lat), 3)

    transcripts = spark.read.parquet(cache).localCheckpoint(eager=True)
    canonical = canonicalize(transcripts).localCheckpoint(eager=True)
    n_entities = canonical.count()
    build, probe = block_keys(canonical, conf)
    pairs = candidate_pairs(build, probe, conf).localCheckpoint(eager=True)
    n_pairs = pairs.count()
    scored = score_pairs(
        pairs, canonical.select("conv_id", "fingerprint"), conf
    ).localCheckpoint(eager=True)
    matches = match_filter(scored, conf).localCheckpoint(eager=True)
    n_matches = matches.count()

    timings: dict[str, float] = {}
    checks: dict[str, bool] = {}

    # --- time_decay_weights --------------------------------------------------
    t0 = time.time()
    days = canonical.select(
        "conv_id",
        (portable_hash64(F.lit("convday"), F.col("conv_id")) % 365)
        .cast("int").alias("day"),
    )
    decayed = time_decay_weights(
        matches.select("id_a", "id_b", "distance"), days, tau=30.0
    ).localCheckpoint(eager=True)
    n_decayed = decayed.count()
    timings["time_decay"] = round(time.time() - t0, 1)
    checks["decay_rows_preserved"] = n_decayed == n_matches
    checks["decay_in_unit_interval"] = (
        decayed.filter("decay_w_raw <= 0 OR decay_w_raw > 1").count() == 0)
    checks["decay_zero_delta_is_one"] = (
        decayed.filter("delta_ts = 0 AND decay_w_raw <> 1.0").count() == 0)

    # --- relational_jaccard --------------------------------------------------
    t0 = time.time()
    profile = (
        transcripts.filter(F.col("role") == "assistant")
        .select("conv_id",
                F.concat(F.lit("tool_"), F.substring(F.md5("text"), 1, 1)).alias("item"))
        .distinct()
    )
    rel = relational_jaccard(
        matches.select("id_a", "id_b"), profile
    ).localCheckpoint(eager=True)
    n_rel = rel.count()
    timings["relational_jaccard"] = round(time.time() - t0, 1)
    checks["rel_rows_preserved"] = n_rel == n_matches
    checks["rel_common_le_union"] = rel.filter("n_common > n_union").count() == 0
    checks["rel_jaccard_in_unit"] = (
        rel.filter("rel_jaccard_raw < 0 OR rel_jaccard_raw > 1").count() == 0)

    # --- fs_em ---------------------------------------------------------------
    t0 = time.time()
    ents = canonical.select(
        "conv_id", "n_turns", "fp_len", F.substring("fingerprint", 1, 16).alias("sig"))
    from pyspark.sql import Window
    rn = ents.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.md5("conv_id")))
    ).crossJoin(F.broadcast(ents.agg((F.count("*") / 2).cast("bigint").alias("half"))))
    u_pairs = (
        rn.filter(F.col("rn") <= F.col("half"))
        .select(F.col("conv_id").alias("id_a"), (F.col("rn") + F.col("half")).alias("_r"))
        .join(rn.select(F.col("conv_id").alias("id_b"), F.col("rn").alias("_r")), "_r")
        .select("id_a", "id_b")
    )
    em_pairs = scored.select("id_a", "id_b").unionByName(u_pairs)
    ga = ents.select(F.col("conv_id").alias("id_a"), F.col("n_turns").alias("nt_a"),
                     F.col("fp_len").alias("fl_a"), F.col("sig").alias("sig_a"))
    gb = ents.select(F.col("conv_id").alias("id_b"), F.col("n_turns").alias("nt_b"),
                     F.col("fp_len").alias("fl_b"), F.col("sig").alias("sig_b"))
    gammas = em_pairs.join(ga, "id_a").join(gb, "id_b").select(
        (F.col("nt_a") == F.col("nt_b")).cast("long").alias("turns"),
        (F.abs(F.col("fl_a") - F.col("fl_b")) <= 2).cast("long").alias("len2"),
        (F.col("sig_a") == F.col("sig_b")).cast("long").alias("sig"),
    )
    em = {r.field: r for r in fs_em(gammas, ["turns", "len2", "sig"], iters=25).collect()}
    timings["fs_em"] = round(time.time() - t0, 1)
    lam = em["_lambda"].m_prob
    checks["em_lambda_interior"] = 0.0 < lam < 1.0
    checks["em_m_gt_u_all_fields"] = all(
        em[f].m_prob > em[f].u_prob for f in ("turns", "len2", "sig"))

    # --- greedy_scheme_selection ---------------------------------------------
    t0 = time.time()
    samp = sample_corpus(
        canonical.select("conv_id", "fingerprint", "fp_len"),
        args.truth_rate, key_col="conv_id", salt="truthsample",
    ).localCheckpoint(eager=True)
    truth = banded_truth_pairs(samp, 2, "standard").select("id_a", "id_b") \
        .localCheckpoint(eager=True)
    n_truth = truth.count()
    dele = pairs.select("id_a", "id_b", F.lit(1).alias("scheme"))
    snm_ents = canonical.select(
        "conv_id", F.substring("fingerprint", 1, 16).alias("sig"))
    # normalize to id_a < id_b: SNM emits pairs in sig-rank order, which can
    # disagree with id order, and the truth join inside the selection is
    # keyed on canonical (id_a < id_b) pairs (same least/greatest+distinct
    # the gate's _build_scheme_pairs applies)
    snm = sorted_neighborhood_pairs(snm_ents, "sig", window=4).select(
        F.least("id_a", "id_b").alias("id_a"),
        F.greatest("id_a", "id_b").alias("id_b"),
        F.lit(2).alias("scheme"),
    ).distinct()
    curve = greedy_scheme_selection(dele.unionByName(snm), truth).collect()
    timings["scheme_selection"] = round(time.time() - t0, 1)
    last = max(curve, key=lambda r: r.pick_order)
    checks["greedy_curve_ends_at_full_recall"] = last.cum_recall == 1.0
    checks["greedy_marginals_sum_to_cum"] = (
        sum(r.marginal_caught for r in curve) == last.cum_caught)

    result = {
        "metric": "sf1_evidence_ops_sec", "value": round(sum(timings.values()), 1),
        "unit": "sec", "stages": timings, "cpus": args.cpus,
        "job_latency_canary_sec": canary, "canary_healthy": canary < 0.15,
        "rows": {"entities": n_entities, "blocked_pairs": n_pairs,
                 "matches": n_matches, "decayed": n_decayed,
                 "relational": n_rel, "sampled_truth_pairs": n_truth},
        "fs_em": {f: {"m": em[f].m_prob, "u": em[f].u_prob}
                  for f in ("turns", "len2", "sig")},
        "fs_em_lambda": lam,
        "scheme_curve": [
            {"pick_order": r.pick_order, "scheme": r.scheme, "n_cand": r.n_cand,
             "marginal_caught": r.marginal_caught, "cum_recall": r.cum_recall}
            for r in sorted(curve, key=lambda r: r.pick_order)],
        "checks": checks,
        "all_checks_pass": all(checks.values()),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
