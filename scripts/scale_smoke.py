"""12x-scale pipeline smoke: the full linkage pipeline (canonicalize ->
block -> candidates -> score -> match -> cluster) on a dense near-duplicate
corpus ~12x the bench corpus — the densest workload the engine faces (every
entity has many true near-dups, so blocking emits millions of REAL pairs
and CC builds large components). Proves the end-to-end plan survives a
scale-up with no spill/OOM/skew blowup on local[32], and records per-stage
seconds so rounds can be compared.

Writes/updates the "12x-scale pipeline smoke" row in BASELINE.md.
Usage: python scripts/scale_smoke.py [--n-base 18000] [--variants 11]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from liblevenshtein_spark import LinkConfig  # noqa: E402
from liblevenshtein_spark.operators.candidates import block_keys, candidate_pairs  # noqa: E402
from liblevenshtein_spark.operators.canonicalize import canonicalize  # noqa: E402
from liblevenshtein_spark.operators.clustering import assign_clusters  # noqa: E402
from liblevenshtein_spark.operators.scoring import match_filter, score_pairs  # noqa: E402
from liblevenshtein_spark.session import build_session  # noqa: E402
from liblevenshtein_spark.sources.tables import TRANSCRIPTS_SCHEMA  # noqa: E402
from liblevenshtein_spark.testdata_gen import gen_transcript_rows  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--n-base", type=int, default=30_000)
    ap.add_argument("--variants", type=int, default=11)
    # skew stress: N extra conversations sharing ONE fingerprint — every
    # blocking key they produce is hot (count >> hot_key_threshold), forcing
    # the salted grid path to carry a C(N,2) true-duplicate clique through
    # score -> match -> CC without a straggler task or OOM
    ap.add_argument("--hot-convs", type=int, default=0)
    args = ap.parse_args()

    spark = build_session(
        app_name="scale-smoke",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus * 4,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "28g"),
            "spark.sql.execution.arrow.maxRecordsPerBatch": "3072",
        },
    )
    conf = LinkConfig(algorithm="standard", max_distance=2, blocking_scheme="segments")

    # self-qualifying capture, same convention as bench.py: median warm
    # per-job latency < 0.15 s or the capture is flagged and BASELINE.md is
    # NOT patched (a 0.3 s canary turned a 38 s smoke into 165 s once)
    import statistics

    spark.range(1_000_000).select(F.sum("id")).collect()
    _lat = []
    for _ in range(10):
        _t = time.time()
        spark.range(1000).count()
        _lat.append(time.time() - _t)
    canary = round(statistics.median(_lat), 3)

    # dense corpus: every base conversation gets `variants` planted
    # near-duplicates, written to parquet once (seed-deterministic)
    cache = f"/tmp/levsmoke_corpus_{args.n_base}_{args.variants}"
    if not os.path.exists(os.path.join(cache, "_SUCCESS")):
        rows, _ = gen_transcript_rows(
            n_base=args.n_base, dup_fraction=1.0, max_edits=2,
            max_dups=args.variants, seed=42,
        )
        (spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA)
         .repartition(args.cpus * 2).write.mode("overwrite").parquet(cache))

    t: dict[str, float] = {}
    t0 = time.time()
    transcripts = spark.read.parquet(cache)
    if args.hot_convs:
        boiler = [
            (f"hot_{i:06d}", j, "user",
             "please run the tool and report status", "", None)
            for i in range(args.hot_convs) for j in range(3)
        ]
        transcripts = transcripts.unionByName(
            spark.createDataFrame(boiler, TRANSCRIPTS_SCHEMA)
        )
    transcripts = transcripts.localCheckpoint(eager=True)
    transcripts.count()
    t["load"] = round(time.time() - t0, 1)

    t0 = time.time()
    canonical = canonicalize(transcripts).localCheckpoint(eager=True)
    n_entities = canonical.count()
    t["canonicalize"] = round(time.time() - t0, 1)

    # exact-duplicate contraction (plans.pipeline.exact_groups): boilerplate
    # conversations collapse to one representative before the quadratic
    # stages; the cluster partition is provably identical (test_pipeline)
    t0 = time.time()
    from liblevenshtein_spark.plans.pipeline import exact_groups

    membership = exact_groups(canonical).localCheckpoint(eager=True)
    reps = canonical.join(
        membership.filter(F.col("conv_id") == F.col("_rep")).select("conv_id"),
        "conv_id",
    ).localCheckpoint(eager=True)
    n_reps = reps.count()
    t["contract"] = round(time.time() - t0, 1)

    t0 = time.time()
    build, probe = block_keys(reps, conf)
    pairs = candidate_pairs(build, probe, conf).localCheckpoint(eager=True)
    n_pairs = pairs.count()
    t["block"] = round(time.time() - t0, 1)

    t0 = time.time()
    scored = score_pairs(pairs, reps, conf).localCheckpoint(eager=True)
    scored.count()
    t["score"] = round(time.time() - t0, 1)

    t0 = time.time()
    matches = match_filter(scored, conf).localCheckpoint(eager=True)
    n_matches = matches.count()
    t["match"] = round(time.time() - t0, 1)

    t0 = time.time()
    rep_clusters = assign_clusters(reps, matches.select("id_a", "id_b"))
    clusters = membership.join(
        rep_clusters.withColumnRenamed("conv_id", "_rep"), "_rep"
    ).select("conv_id", "cluster_id")
    n_clusters = clusters.select("cluster_id").distinct().count()
    t["cluster_cc"] = round(time.time() - t0, 1)

    total = round(sum(t.values()), 1)
    result = {
        "metric": "scale_smoke_sec", "value": total, "unit": "sec",
        "stages": t, "cpus": args.cpus,
        "job_latency_canary_sec": canary,
        "canary_healthy": canary < 0.15,
        "rows": {"entities": n_entities, "reps": n_reps, "blocked_pairs": n_pairs,
                 "matches": n_matches, "clusters": n_clusters},
    }
    print(json.dumps(result))

    if args.hot_convs or not result["canary_healthy"]:
        # skew run (report only) or noise-suspect capture: never patch the
        # BASELINE.md row from an unhealthy window
        spark.stop()
        return
    row = ("| measured: 12x-scale pipeline smoke | {e:,} entities -> {p:,} blocked pairs -> "
           "{m:,} matches -> {c:,} clusters in ~{tot:.0f} s (block {b:.0f} / score {s:.0f} / CC {cc:.0f}) "
           "| local[{cpu}], dense near-dup corpus ({v} planted variants/entity), full pipeline, no spill/OOM "
           "| `scripts/scale_smoke.py` |").format(
        e=n_entities, p=n_pairs, m=n_matches, c=n_clusters, tot=total,
        b=t["block"], s=t["score"], cc=t["cluster_cc"], cpu=args.cpus, v=args.variants)
    path = os.path.join(REPO, "BASELINE.md")
    md = open(path).read()
    md2 = re.sub(r"\| measured: 12x-scale pipeline smoke \|[^\n]*", row.replace("\\", "\\\\"), md)
    if md2 != md:
        open(path, "w").write(md2)
    spark.stop()


if __name__ == "__main__":
    main()
