"""sf1-scale smoke for the round-4 session-3 operators.

Drives the four new scale-path operators over the same cached ~180k-entity
/ ~800k-turn corpus as the other sf1 smokes (build with
scripts/bench_sf1.py first):

  * pivot_clusters  — the DISTRIBUTED round loop (small_graph_edges=0) on
    the full ~100k-edge match graph: one row per match-graph-touched
    entity, convergence within the round budget, and SAMPLED exactness —
    every baseline-CC cluster that hashes into the sample bucket is
    re-clustered with the pure-Python round replica and must match
    exactly (components are closed under cluster sampling, so the
    replica sees whole neighborhoods).
  * knn_graph       — mutual k=2 capping at scale: kept edges ⊆ matches,
    per-node kept degree ≤ k (the O(k·n) clustering-cost bound, asserted
    not assumed), plus the edge-volume cut.
  * ppjoin_pairs    — prefix-filtered set-similarity join over the 180k
    fingerprint "documents": every emitted pair's Jaccard recomputed
    exactly in Python on a hash sample; thresholds respected; candidate
    volume reported against the corpus size.
  * cdc_dedup_stats — content-defined chunking over the fingerprints:
    ratios in range, planted near-duplicate conversations must carry
    strictly more shared-chunk mass than the corpus median (CDC's
    shift-invariance is what makes 1-2 edit dups share almost all
    chunks).

Canary-gated like every bench in this repo. Writes BENCH_SF1_SESSION3.json.
Usage: python scripts/sf1_session3_smoke.py [--n-base 72000]
"""

from __future__ import annotations

import argparse
import hashlib
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
from liblevenshtein_spark.operators.chunking import cdc_dedup_stats  # noqa: E402
from liblevenshtein_spark.operators.clustering import assign_clusters, pivot_clusters  # noqa: E402
from liblevenshtein_spark.operators.dedup import ppjoin_pairs  # noqa: E402
from liblevenshtein_spark.operators.graph import knn_graph  # noqa: E402
from liblevenshtein_spark.operators.scoring import match_filter, score_pairs  # noqa: E402
from liblevenshtein_spark.session import build_session  # noqa: E402


def _pivot_ref(edges, max_rounds=12):
    def pri(x):
        return hashlib.md5(f"pivot|{x}".encode()).hexdigest()

    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    assign: dict = {}
    live = set(adj)
    for _ in range(max_rounds):
        if not live:
            break
        pivots = {u for u in live
                  if all(pri(u) < pri(v) for v in adj[u] if v in live)}
        step = {u: u for u in pivots}
        for u in live - pivots:
            cands = [v for v in adj[u] if v in pivots]
            if cands:
                step[u] = min(cands, key=pri)
        assign.update(step)
        live -= set(step)
    for u in live:
        assign[u] = u
    return assign


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--n-base", type=int, default=72_000)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_SF1_SESSION3.json"))
    args = ap.parse_args()

    cache = f"/tmp/lev_sf1_corpus_{args.n_base}"
    if not os.path.exists(os.path.join(cache, "_SUCCESS")):
        raise SystemExit(f"run scripts/bench_sf1.py first to build {cache}")

    spark = build_session(
        app_name="sf1-session3-ops",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus * 4,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "28g"),
            "spark.sql.execution.arrow.maxRecordsPerBatch": "3072",
        },
    )
    conf = LinkConfig(algorithm="standard", max_distance=2,
                      blocking_scheme="segments")

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

    timings: dict[str, float] = {}
    checks: dict[str, bool] = {}

    # --- pivot_clusters: DISTRIBUTED loop -------------------------------
    t0 = time.time()
    piv = pivot_clusters(
        canonical.select("conv_id"), matches.select("id_a", "id_b"),
        max_rounds=12, small_graph_edges=0,
    ).localCheckpoint(eager=True)
    n_piv_rows = piv.count()
    timings["pivot_distributed"] = round(time.time() - t0, 1)
    checks["pivot_one_row_per_entity"] = n_piv_rows == n_entities
    n_piv_clusters = piv.select("pivot_id").distinct().count()
    # sampled exactness vs the pure-Python round replica, sampling whole
    # BASELINE-CC components so the replica sees closed neighborhoods
    base = assign_clusters(
        canonical.select("conv_id"), matches.select("id_a", "id_b")
    ).localCheckpoint(eager=True)
    comp = base.select(F.col("conv_id").alias("id_a"),
                       F.col("cluster_id").alias("_c"))
    sampled_edges = (
        matches.join(comp, "id_a")
        .filter(F.abs(F.xxhash64("_c")) % 50 == 0)
        .select("id_a", "id_b")
        .collect()
    )
    s_edges = [(r["id_a"], r["id_b"]) for r in sampled_edges]
    ref = _pivot_ref(s_edges)
    s_nodes = set(ref)
    got = {
        r["conv_id"]: r["pivot_id"]
        for r in piv.join(
            spark.createDataFrame([(n,) for n in s_nodes], ["conv_id"]),
            "conv_id",
        ).collect()
    }
    checks["pivot_sampled_exact"] = bool(s_edges) and got == ref

    # --- knn_graph ------------------------------------------------------
    t0 = time.time()
    knn = knn_graph(matches, k=2, mutual=True).localCheckpoint(eager=True)
    n_knn = knn.count()
    timings["knn_graph"] = round(time.time() - t0, 1)
    checks["knn_subset_of_matches"] = (
        knn.join(matches.select("id_a", "id_b"), ["id_a", "id_b"],
                 "left_anti").count() == 0)
    deg = (
        knn.select(F.col("id_a").alias("n")).unionByName(
            knn.select(F.col("id_b").alias("n")))
        .groupBy("n").count().agg(F.max("count")).collect()[0][0]
    )
    checks["knn_degree_bounded"] = (deg or 0) <= 2

    # --- ppjoin over fingerprint documents ------------------------------
    t0 = time.time()
    docs = canonical.select(F.col("conv_id").alias("doc_id"),
                            F.col("fingerprint").alias("text"))
    pp = ppjoin_pairs(docs, threshold=0.8).localCheckpoint(eager=True)
    n_pp = pp.count()
    timings["ppjoin"] = round(time.time() - t0, 1)
    checks["ppjoin_threshold_respected"] = (
        pp.filter("jaccard < 0.8").count() == 0)
    # sampled exactness: recompute Jaccard in Python for a hash sample
    samp = pp.filter(F.abs(F.xxhash64("id_a", "id_b")) % 20 == 0).collect()
    ids = {r["id_a"] for r in samp} | {r["id_b"] for r in samp}
    texts = {}
    if ids:
        texts = {
            r["doc_id"]: r["text"]
            for r in docs.join(
                spark.createDataFrame([(i,) for i in ids], ["doc_id"]),
                "doc_id",
            ).collect()
        }

    def _sh(t):
        toks = [x for x in t.split() if x]
        return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

    ok = True
    for r in samp:
        a, b = _sh(texts[r["id_a"]]), _sh(texts[r["id_b"]])
        j = round(len(a & b) / len(a | b) + 1e-9, 4)
        ok = ok and j == r["jaccard"]
    checks["ppjoin_sampled_exact"] = bool(samp) and ok

    # --- cdc_dedup_stats ------------------------------------------------
    t0 = time.time()
    cdc = cdc_dedup_stats(docs).localCheckpoint(eager=True)
    n_cdc = cdc.count()
    timings["cdc_dedup"] = round(time.time() - t0, 1)
    checks["cdc_one_row_per_doc"] = n_cdc == docs.count()
    checks["cdc_ratio_in_range"] = (
        cdc.filter("dup_ratio_1e4 < 0 OR dup_ratio_1e4 > 10000").count() == 0)
    med_all = cdc.agg(
        F.expr("percentile_approx(dup_ratio_1e4, 0.5)")).collect()[0][0]
    med_dup = cdc.filter(F.col("doc_id").contains("_dup")).agg(
        F.expr("percentile_approx(dup_ratio_1e4, 0.5)")).collect()[0][0]
    checks["cdc_planted_dups_share_more"] = (med_dup or 0) > (med_all or 0)

    result = {
        "metric": "sf1_session3_ops_sec",
        "value": round(sum(timings.values()), 1), "unit": "sec",
        "stages": timings, "cpus": args.cpus,
        "job_latency_canary_sec": canary, "canary_healthy": canary < 0.15,
        "rows": {
            "entities": n_entities, "matches": n_matches,
            "pivot_rows": n_piv_rows, "pivot_clusters": n_piv_clusters,
            "pivot_sampled_nodes": len(s_nodes),
            "knn_kept_edges": n_knn,
            "knn_edge_cut_pct": round(100.0 * (1 - n_knn / max(n_matches, 1)), 1),
            "ppjoin_pairs": n_pp, "ppjoin_sampled_pairs": len(samp),
            "cdc_docs": n_cdc,
            "cdc_median_dup_ratio_1e4": int(med_all or 0),
            "cdc_median_dup_ratio_planted_1e4": int(med_dup or 0),
        },
        "checks": checks,
        "all_checks_pass": all(checks.values()),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
