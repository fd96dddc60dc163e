"""sf1-scale smoke for the round-4 graph-audit / assignment / history
operators.

scripts/sf1_er_ops_smoke.py covers the post-clustering fusion operators;
this script drives the round-4-continuation additions over the same cached
~180k-entity / ~800k-turn corpus (build with scripts/bench_sf1.py first):

  * edge_support     — support rows == matches; SAMPLED exactness: the
    support counts inside a hash-sampled subset of clusters are recomputed
    with a pure-Python common-neighbor reference and must match exactly.
  * robust_clusters  — partition-refinement invariant: pruning only ever
    SPLITS baseline clusters (every robust cluster maps to exactly one
    baseline cluster); row count == entities; the split delta is reported.
  * one_to_one       — matching constraint (each probe and each reference
    record at most once) at scale, plus convergence depth (max round).
  * entity_history   — exactly one open (is_current=1) interval per
    record; every closed interval has valid_to > valid_from.

Canary-gated like every bench in this repo. Writes BENCH_SF1_GRAPH_OPS.json.
Usage: python scripts/sf1_graph_ops_smoke.py [--n-base 72000]
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
    assign_clusters, entity_history)
from liblevenshtein_spark.operators.graph import edge_support, robust_clusters  # noqa: E402
from liblevenshtein_spark.operators.matching import one_to_one  # noqa: E402
from liblevenshtein_spark.operators.scoring import match_filter, score_pairs  # noqa: E402
from liblevenshtein_spark.session import build_session  # noqa: E402


def _support_ref(edges):
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return {(a, b): len(adj[a] & adj[b]) for a, b in edges}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--n-base", type=int, default=72_000)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_SF1_GRAPH_OPS.json"))
    args = ap.parse_args()

    cache = f"/tmp/lev_sf1_corpus_{args.n_base}"
    if not os.path.exists(os.path.join(cache, "_SUCCESS")):
        raise SystemExit(f"run scripts/bench_sf1.py first to build {cache}")

    spark = build_session(
        app_name="sf1-graph-ops",
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
    matches = match_filter(scored, conf).select(
        "id_a", "id_b", "distance").localCheckpoint(eager=True)
    n_matches = matches.count()
    base = assign_clusters(
        canonical.select("conv_id"), matches.select("id_a", "id_b")
    ).localCheckpoint(eager=True)

    timings: dict[str, float] = {}
    checks: dict[str, bool] = {}

    # --- edge_support ---------------------------------------------------
    t0 = time.time()
    sup = edge_support(matches).localCheckpoint(eager=True)
    n_sup = sup.count()
    n_zero = sup.filter("support = 0").count()
    timings["edge_support"] = round(time.time() - t0, 1)
    checks["support_one_row_per_match"] = n_sup == n_matches
    # sampled exactness: every edge whose BASELINE CLUSTER hashes into the
    # sample bucket, recomputed driver-side (components are closed under
    # cluster sampling, so the python reference sees whole neighborhoods)
    ca = base.select(F.col("conv_id").alias("id_a"), F.col("cluster_id").alias("_c"))
    tagged = sup.join(ca, "id_a")
    sampled = tagged.filter(F.abs(F.xxhash64("_c")) % 50 == 0)
    s_rows = sampled.collect()
    s_edges = [(r["id_a"], r["id_b"]) for r in s_rows]
    ref = _support_ref(s_edges)
    got = {(r["id_a"], r["id_b"]): r["support"] for r in s_rows}
    checks["support_sampled_exact"] = bool(s_edges) and all(
        got[e] == ref[e] for e in ref)

    # --- robust_clusters --------------------------------------------------
    t0 = time.time()
    # size_threshold=2: the planted-dup corpus tops out at 3-member clusters
    # (base + 2 independent dups), so threshold 2 makes those suspect — their
    # base-dup edges are triangle-corroborated only when the two dups also
    # match each other, so the prune genuinely fires at this scale
    robust = robust_clusters(
        canonical.select("conv_id"), matches, min_support=1,
        size_threshold=2, weak_distance=2).localCheckpoint(eager=True)
    n_robust_rows = robust.count()
    timings["robust_clusters"] = round(time.time() - t0, 1)
    checks["robust_one_row_per_entity"] = n_robust_rows == n_entities
    # refinement: each robust cluster lies inside exactly one baseline cluster
    xwalk = (
        robust.withColumnRenamed("cluster_id", "rc")
        .join(base, "conv_id")
        .select("rc", "cluster_id").distinct()
    )
    n_rc = robust.select("cluster_id").distinct().count()
    checks["robust_is_refinement"] = xwalk.count() == n_rc
    n_base_c = base.select("cluster_id").distinct().count()
    split_delta = n_rc - n_base_c

    # --- one_to_one -------------------------------------------------------
    t0 = time.time()
    bip = matches.filter(
        ~F.col("id_a").contains("_dup") & F.col("id_b").contains("_dup"))
    assign = one_to_one(
        bip.select(F.col("id_b").alias("probe_id"),
                   F.col("id_a").alias("ref_id"), "distance"),
        "probe_id", "ref_id", "distance").localCheckpoint(eager=True)
    n_assigned = assign.count()
    max_round = assign.agg(F.max("round")).collect()[0][0] or 0
    timings["one_to_one"] = round(time.time() - t0, 1)
    checks["o2o_probe_unique"] = (
        assign.select("probe_id").distinct().count() == n_assigned)
    checks["o2o_ref_unique"] = (
        assign.select("ref_id").distinct().count() == n_assigned)
    checks["o2o_nonempty"] = n_assigned > 0

    # --- entity_history (two runs: md5-half then full) ----------------------
    t0 = time.time()
    digit = F.substring(F.md5(F.concat_ws("|", "id_a", "id_b")), 1, 1)
    runs = None
    for rid, mm in ((1, matches.filter(digit < "8")), (2, matches)):
        a = assign_clusters(canonical.select("conv_id"),
                            mm.select("id_a", "id_b")).select(
            F.lit(rid).cast("int").alias("run_id"), "conv_id",
            F.concat(F.lit("ent:"), "cluster_id").alias("entity_id"))
        runs = a if runs is None else runs.unionByName(a)
    hist = entity_history(runs).localCheckpoint(eager=True)
    n_intervals = hist.count()
    timings["entity_history"] = round(time.time() - t0, 1)
    checks["hist_one_current_per_record"] = (
        hist.filter("is_current = 1").count() == n_entities)
    checks["hist_closed_ordered"] = (
        hist.filter("valid_to IS NOT NULL AND valid_to <= valid_from").count() == 0)

    result = {
        "metric": "sf1_graph_ops_sec", "value": round(sum(timings.values()), 1),
        "unit": "sec", "stages": timings, "cpus": args.cpus,
        "job_latency_canary_sec": canary, "canary_healthy": canary < 0.15,
        "rows": {"entities": n_entities, "matches": n_matches,
                 "support_rows": n_sup, "zero_support_edges": n_zero,
                 "sampled_support_edges": len(s_edges),
                 "robust_clusters": n_rc, "base_clusters": n_base_c,
                 "robust_split_delta": split_delta,
                 "one_to_one_assigned": n_assigned,
                 "one_to_one_max_round": int(max_round),
                 "history_intervals": n_intervals},
        "checks": checks,
        "all_checks_pass": all(checks.values()),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
