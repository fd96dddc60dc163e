"""sf1-scale smoke for the round-4 PPRL / alignment / transitivity operators.

Drives the five newest operators over the same cached ~180k-entity /
~800k-turn corpus as scripts/bench_sf1.py, with hard invariants:

  * bloom_encode: one encoding per entity; every bit in [0, m).
  * pprl private pipeline (band blocking at min_bands=2 + Dice >= 0.95):
    recall 1.0 against the cleartext banded-Levenshtein matches — the
    same privacy-utility claim the gated eval_pprl entry makes at sf0.x,
    proved one decade up.
  * align_turns: one row per match; 0 <= prefix + suffix <= min(n);
    changed_x = n_x - prefix - suffix >= 0; near-dup pairs (distance<=2,
    tail-truncation generator) must align almost everywhere — mean
    changed turns <= 2.
  * transitivity_stats: wedge identity n_closed + n_open == n_wedges and
    a sane [0, 1] coefficient.

Canary-gated like every bench in this repo. Writes BENCH_SF1_PPRL.json.
Usage: python scripts/sf1_pprl_align_smoke.py [--n-base 72000]
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
from liblevenshtein_spark.operators.alignment import align_turns  # noqa: E402
from liblevenshtein_spark.operators.candidates import block_keys, candidate_pairs  # noqa: E402
from liblevenshtein_spark.operators.canonicalize import canonicalize  # noqa: E402
from liblevenshtein_spark.operators.graph import transitivity_stats  # noqa: E402
from liblevenshtein_spark.operators.pprl import (  # noqa: E402
    bloom_band_candidates, bloom_encode, dice_pairs)
from liblevenshtein_spark.operators.scoring import match_filter, score_pairs  # noqa: E402
from liblevenshtein_spark.session import build_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--n-base", type=int, default=72_000)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_SF1_PPRL.json"))
    args = ap.parse_args()

    cache = f"/tmp/lev_sf1_corpus_{args.n_base}"
    if not os.path.exists(os.path.join(cache, "_SUCCESS")):
        raise SystemExit(f"run scripts/bench_sf1.py first to build {cache}")

    spark = build_session(
        app_name="sf1-pprl-align",
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
    scored = score_pairs(pairs, canonical.select("conv_id", "fingerprint"), conf)
    matches = match_filter(scored, conf).localCheckpoint(eager=True)
    n_matches = matches.count()

    timings: dict[str, float] = {}
    checks: dict[str, bool] = {}

    # --- bloom_encode over every entity's sig --------------------------------
    t0 = time.time()
    sigs = canonical.select("conv_id", F.substring("fingerprint", 1, 16).alias("sig"))
    enc = bloom_encode(sigs, id_col="conv_id", text_col="sig").localCheckpoint(eager=True)
    n_enc = enc.count()
    timings["bloom_encode"] = round(time.time() - t0, 1)
    checks["encode_one_per_entity"] = n_enc == n_entities
    bad_bits = enc.filter(
        F.exists("bloom", lambda b: (b < 0) | (b >= 256))
    ).count()
    checks["encode_bits_in_range"] = bad_bits == 0

    # --- private pipeline: band blocking + Dice >= 0.95 ----------------------
    t0 = time.time()
    cands = bloom_band_candidates(enc, m=256, bands=16, min_bands=2)
    private = (
        dice_pairs(cands, enc)
        .filter(F.col("dice") >= 0.95)
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    n_private = private.count()
    timings["pprl_private_pipeline"] = round(time.time() - t0, 1)
    missed = matches.select("id_a", "id_b").join(private, ["id_a", "id_b"], "left_anti").count()
    n_common = n_matches - missed
    checks["pprl_recall_one"] = missed == 0

    # --- align_turns over the match stream ------------------------------------
    t0 = time.time()
    turns = transcripts.select("conv_id", "turn_idx", "text")
    aligned = align_turns(matches.select("id_a", "id_b"), turns).localCheckpoint(eager=True)
    n_aligned = aligned.count()
    timings["align_turns"] = round(time.time() - t0, 1)
    checks["align_one_row_per_match"] = n_aligned == n_matches
    bad_geom = aligned.filter(
        (F.col("aligned_prefix") < 0) | (F.col("aligned_suffix") < 0)
        | (F.col("changed_a") < 0) | (F.col("changed_b") < 0)
        | (F.col("aligned_prefix") + F.col("aligned_suffix")
           > F.least("n_turns_a", "n_turns_b"))
    ).count()
    checks["align_geometry_valid"] = bad_geom == 0
    mean_changed = aligned.agg(
        F.avg((F.col("changed_a") + F.col("changed_b")) / 2.0)
    ).collect()[0][0]
    checks["align_neardup_tight"] = mean_changed is not None and mean_changed <= 2.0

    # --- transitivity over the match graph ------------------------------------
    t0 = time.time()
    tr = transitivity_stats(matches.select("id_a", "id_b")).collect()[0]
    timings["transitivity"] = round(time.time() - t0, 1)
    checks["wedge_identity"] = (
        tr["n_closed_wedges"] + tr["n_open_wedges"] == tr["n_wedges"])
    checks["transitivity_in_unit"] = 0.0 <= tr["transitivity"] <= 1.0

    result = {
        "metric": "sf1_pprl_align_sec", "value": round(sum(timings.values()), 1),
        "unit": "sec", "stages": timings, "cpus": args.cpus,
        "job_latency_canary_sec": canary, "canary_healthy": canary < 0.15,
        "rows": {"entities": n_entities, "matches": n_matches,
                 "encodings": n_enc, "private_matches": n_private,
                 "private_common": n_common, "aligned": n_aligned,
                 "n_wedges": tr["n_wedges"], "n_open_wedges": tr["n_open_wedges"],
                 "transitivity": tr["transitivity"],
                 "mean_changed_turns": round(float(mean_changed), 3)},
        "checks": checks,
        "all_checks_pass": all(checks.values()),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
