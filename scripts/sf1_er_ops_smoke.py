"""sf1-scale smoke for the round-4 ER post-processing operators.

The headline sf1 proof (scripts/bench_sf1.py) covers canonicalize ->
block -> score -> match -> CC -> sampled eval; this script drives the
three operators that sit AFTER clustering — golden_records
(survivorship fusion), stable_entity_ids (run-to-run ID-stitching, the
incremental-run simulation: prev = CC over the md5-parity half of the
match edges), and match_provenance (scheme audit) — over the same
cached ~180k-entity / ~800k-turn corpus, with hard invariants:

  * golden_records: one row per cluster; member counts sum back to the
    entity count; every survivor source is a member of its cluster.
  * stable_entity_ids: one row per entity; entity_id -> cluster map is
    functional (uniqueness); records whose prev and curr clusters agree
    are all carried.
  * match_provenance: row count == matches; every pair proposed by the
    deletion scheme reports it.

Canary-gated like every bench in this repo. Writes BENCH_SF1_ER_OPS.json.
Usage: python scripts/sf1_er_ops_smoke.py [--n-base 72000]
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
from liblevenshtein_spark.operators.candidates import block_keys, candidate_pairs  # noqa: E402
from liblevenshtein_spark.operators.canonicalize import canonicalize  # noqa: E402
from liblevenshtein_spark.operators.clustering import (  # noqa: E402
    assign_clusters, golden_records, stable_entity_ids)
from liblevenshtein_spark.operators.metrics import match_provenance  # noqa: E402
from liblevenshtein_spark.operators.scoring import match_filter, score_pairs  # noqa: E402
from liblevenshtein_spark.session import build_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--n-base", type=int, default=72_000)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_SF1_ER_OPS.json"))
    args = ap.parse_args()

    cache = f"/tmp/lev_sf1_corpus_{args.n_base}"
    if not os.path.exists(os.path.join(cache, "_SUCCESS")):
        raise SystemExit(f"run scripts/bench_sf1.py first to build {cache}")

    spark = build_session(
        app_name="sf1-er-ops",
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
    scored = score_pairs(pairs, canonical.select("conv_id", "fingerprint"), conf)
    matches = match_filter(scored, conf).localCheckpoint(eager=True)
    n_matches = matches.count()
    clusters = assign_clusters(
        canonical.select("conv_id"), matches.select("id_a", "id_b")
    ).localCheckpoint(eager=True)
    n_clusters = clusters.select("cluster_id").distinct().count()

    timings: dict[str, float] = {}
    checks: dict[str, bool] = {}

    # --- golden_records -----------------------------------------------------
    t0 = time.time()
    ents = canonical.select(
        "conv_id", "n_turns", "fingerprint",
        F.substring("fingerprint", 1, 8).alias("prefix8"))
    golden = golden_records(
        clusters, ents, longest=("fingerprint",), mode=("prefix8",),
        sums=("n_turns",), maxs=("n_turns",)).localCheckpoint(eager=True)
    n_golden = golden.count()
    timings["golden_records"] = round(time.time() - t0, 1)
    checks["golden_one_row_per_cluster"] = n_golden == n_clusters
    checks["golden_members_sum"] = (
        golden.agg(F.sum("n_members")).collect()[0][0] == n_entities)
    # survivor source must belong to its own cluster
    bad_src = (
        golden.select("cluster_id", F.col("fingerprint_survivor_src").alias("conv_id"))
        .join(clusters, ["conv_id", "cluster_id"], "left_anti").count())
    checks["golden_survivor_is_member"] = bad_src == 0

    # --- stable_entity_ids (simulated previous run = md5-half of edges) -----
    t0 = time.time()
    is_hist = F.substring(F.md5(F.concat_ws("|", "id_a", "id_b")), 1, 1) < "8"
    prev = assign_clusters(
        canonical.select("conv_id"), matches.filter(is_hist).select("id_a", "id_b")
    ).select("conv_id", F.concat(F.lit("ent:"), "cluster_id").alias("entity_id"))
    stitched = stable_entity_ids(prev, clusters).localCheckpoint(eager=True)
    n_stitched = stitched.count()
    n_carried = stitched.filter("carried = 1").count()
    timings["stable_entity_ids"] = round(time.time() - t0, 1)
    checks["stitch_one_row_per_entity"] = n_stitched == n_entities
    dup_ids = (
        stitched.select("entity_id", "cluster_id").distinct()
        .groupBy("entity_id").count().filter("count > 1").count())
    checks["stitch_entity_id_unique"] = dup_ids == 0
    checks["stitch_majority_carried"] = n_carried > n_stitched * 0.9

    # --- match_provenance ----------------------------------------------------
    t0 = time.time()
    schemes = pairs.select("id_a", "id_b", F.lit("deletions").alias("scheme"))
    prov = match_provenance(matches, schemes).localCheckpoint(eager=True)
    n_prov = prov.count()
    timings["match_provenance"] = round(time.time() - t0, 1)
    checks["prov_one_row_per_match"] = n_prov == n_matches
    checks["prov_all_attributed"] = prov.filter("n_schemes = 0").count() == 0

    result = {
        "metric": "sf1_er_ops_sec", "value": round(sum(timings.values()), 1),
        "unit": "sec", "stages": timings, "cpus": args.cpus,
        "job_latency_canary_sec": canary, "canary_healthy": canary < 0.15,
        "rows": {"entities": n_entities, "blocked_pairs": n_pairs,
                 "matches": n_matches, "clusters": n_clusters,
                 "golden": n_golden, "stitched": n_stitched,
                 "carried": n_carried, "provenance": n_prov},
        "checks": checks,
        "all_checks_pass": all(checks.values()),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
