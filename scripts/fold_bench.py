"""Incremental-clustering benchmark: fold_clusters (new ingest batch folded
into the persisted assignment) vs full-history re-clustering, on a synthetic
match graph big enough that CC depth matters.

The production question this answers: once 10^12 turns have been linked,
what does the NEXT ingest batch pay for clustering? Full re-cluster scans
every match edge ever emitted and pays O(log d) large-star/small-star
rounds over deep merge chains; fold_clusters clusters star(assignment) ∪
new_edges — the stars are depth-1 by construction, so the edge set is
|clustered entities| + |new batch| and the loop converges in ~2 rounds.

Graph (seed-deterministic, ER-shaped): history = C clusters, each a
PATH of L entities (deep merge chains — the round-count worst case for
CC) plus `redundancy` extra random intra-cluster edges per entity (near-
dup match graphs are redundant: every pair under the threshold is an
edge, so |history edges| >> |entities|). The new batch merges random
cluster pairs. Full re-cluster pays both costs — the redundant edge
volume AND the chain depth — every batch; the fold pays neither. Full CC
runs FIRST (warm-path bias favors it), and the fold result is verified
exactly equal to full-history CC before timings are reported.

Writes BENCH_FOLD.json and updates the fold row in BASELINE.md.
Usage: python scripts/fold_bench.py [--n 2000000] [--degree 1.2]
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

from liblevenshtein_spark.operators.clustering import (  # noqa: E402
    assign_clusters, fold_clusters,
)
from liblevenshtein_spark.session import build_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--clusters", type=int, default=20_000)
    ap.add_argument("--path-len", type=int, default=100, help="entities per cluster chain")
    ap.add_argument("--redundancy", type=int, default=3,
                    help="extra intra-cluster edges per entity")
    ap.add_argument("--new-edges", type=int, default=100_000)
    args = ap.parse_args()

    spark = build_session(
        app_name="fold-bench",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus * 2,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "28g"),
        },
    )
    C, L = args.clusters, args.path_len
    n = C * L

    def node(cl, pos):
        return F.format_string("c%06d_%04d", cl, pos)

    entities = (
        spark.range(n)
        .select(node(F.floor(F.col("id") / L), F.pmod(F.col("id"), F.lit(L))).alias("conv_id"))
        .repartition(args.cpus * 2).localCheckpoint(eager=True)
    )
    # deep chains: (cl, pos-1) -- (cl, pos)
    paths = (
        spark.range(n).filter(F.pmod(F.col("id"), F.lit(L)) != 0)
        .select(
            node(F.floor(F.col("id") / L), F.pmod(F.col("id"), F.lit(L)) - 1).alias("id_a"),
            node(F.floor(F.col("id") / L), F.pmod(F.col("id"), F.lit(L))).alias("id_b"),
        )
    )
    # redundant intra-cluster near-dup edges: random position pairs
    red = (
        spark.range(n * args.redundancy)
        .select(
            F.floor(F.pmod(F.col("id"), F.lit(n)) / L).alias("_cl"),
            F.pmod(F.xxhash64(F.col("id"), F.lit("p")), F.lit(L)).alias("_p1"),
            F.pmod(F.xxhash64(F.col("id"), F.lit("q")), F.lit(L)).alias("_p2"),
        )
        .filter(F.col("_p1") != F.col("_p2"))
        .select(node(F.col("_cl"), F.col("_p1")).alias("id_a"),
                node(F.col("_cl"), F.col("_p2")).alias("id_b"))
    )
    hist = paths.unionByName(red).repartition(args.cpus * 2).localCheckpoint(eager=True)
    # new ingest batch: merge random cluster pairs at random chain positions
    new = (
        spark.range(args.new_edges)
        .select(
            F.pmod(F.xxhash64(F.col("id"), F.lit("c1")), F.lit(C)).alias("_c1"),
            F.pmod(F.xxhash64(F.col("id"), F.lit("c2")), F.lit(C)).alias("_c2"),
            F.pmod(F.xxhash64(F.col("id"), F.lit("p1")), F.lit(L)).alias("_p1"),
            F.pmod(F.xxhash64(F.col("id"), F.lit("p2")), F.lit(L)).alias("_p2"),
        )
        .filter(F.col("_c1") != F.col("_c2"))
        .select(node(F.col("_c1"), F.col("_p1")).alias("id_a"),
                node(F.col("_c2"), F.col("_p2")).alias("id_b"))
        .repartition(args.cpus).localCheckpoint(eager=True)
    )
    n_hist, n_new = hist.count(), new.count()

    # persisted state a production pipeline already has (untimed)
    prior = assign_clusters(entities, hist).localCheckpoint(eager=True)
    prior.count()

    # full re-cluster FIRST (any warm-path bias favors the baseline)
    all_edges = hist.unionByName(new)
    t0 = time.time()
    full = assign_clusters(entities, all_edges).localCheckpoint(eager=True)
    full.count()
    full_sec = round(time.time() - t0, 1)

    t0 = time.time()
    folded = fold_clusters(entities, prior, new).localCheckpoint(eager=True)
    folded.count()
    fold_sec = round(time.time() - t0, 1)

    # exactness gate before any number is reported
    diff = (
        folded.withColumnRenamed("cluster_id", "_f")
        .join(full, "conv_id")
        .filter(F.col("_f") != F.col("cluster_id"))
        .count()
    )
    assert diff == 0, f"fold != full CC on {diff} entities"

    result = {
        "metric": "fold_vs_full_cc", "unit": "sec",
        "fold_sec": fold_sec, "full_sec": full_sec,
        "speedup": round(full_sec / fold_sec, 2) if fold_sec else None,
        "n_entities": n, "n_hist_edges": n_hist, "n_new_edges": n_new,
        "cpus": args.cpus, "exact_equal": True,
    }
    print(json.dumps(result))
    with open(os.path.join(REPO, "BENCH_FOLD.json"), "w") as f:
        f.write(json.dumps(result) + "\n")

    row = ("| measured: incremental cluster fold vs full re-cluster | "
           "{n:,} entities, {h:,} historical + {w:,} new edges: fold {f:.0f} s vs "
           "full {u:.0f} s ({x:.1f}x), results exactly equal "
           "| local[{c}], seed-deterministic ER-shaped graph ({cl:,} clusters, "
           "{pl}-deep chains, {r}x redundant intra-cluster edges), full run first "
           "| `scripts/fold_bench.py`, `BENCH_FOLD.json` |").format(
        n=n, h=n_hist, w=n_new, f=fold_sec, u=full_sec,
        x=full_sec / max(fold_sec, 0.1), c=args.cpus,
        cl=C, pl=L, r=args.redundancy)
    path = os.path.join(REPO, "BASELINE.md")
    md = open(path).read()
    if "incremental cluster fold" in md:
        md2 = re.sub(r"\| measured: incremental cluster fold[^\n]*", row, md)
    else:
        # append as the last row of the measured table (after executor scaling)
        md2 = re.sub(r"(\| measured: executor scaling[^\n]*\n)", r"\1" + row + "\n", md)
    if md2 != md:
        open(path, "w").write(md2)
    spark.stop()


if __name__ == "__main__":
    main()
