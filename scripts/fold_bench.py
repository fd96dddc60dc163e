"""Incremental-clustering benchmark: fold_clusters (new ingest batch folded
into the persisted assignment) vs full-history re-clustering, on a synthetic
match graph big enough that CC depth matters.

The production question this answers: once 10^12 turns have been linked,
what does the NEXT ingest batch pay for clustering? Full re-cluster scans
every match edge ever emitted and pays O(log d) large-star/small-star
rounds over deep merge chains; fold_clusters clusters star(assignment) ∪
new_edges — the stars are depth-1 by construction, so the edge set is
|clustered entities| + |new batch| and the loop converges in ~2 rounds.

Graph: seed-deterministic random edges over N string ids (avg degree ~1.2
→ a giant component with deep chains, the worst case for CC rounds).
90% of edges are "history", 10% are the new batch. The fold result is
verified exactly equal to full-history CC before timings are reported.

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
    ap.add_argument("--n", type=int, default=2_000_000, help="entities")
    ap.add_argument("--degree", type=float, default=1.2, help="avg degree")
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
    n, n_edges = args.n, int(args.n * args.degree / 2)

    def cid(col):
        return F.format_string("c%09d", F.pmod(col, F.lit(n)))

    entities = spark.range(n).select(cid(F.col("id")).alias("conv_id"))
    entities = entities.repartition(args.cpus * 2).localCheckpoint(eager=True)
    edges = (
        spark.range(n_edges)
        .select(
            cid(F.xxhash64(F.col("id"), F.lit("a"))).alias("id_a"),
            cid(F.xxhash64(F.col("id"), F.lit("b"))).alias("id_b"),
            F.pmod(F.xxhash64(F.col("id"), F.lit("s")), F.lit(10)).alias("_s"),
        )
        .filter(F.col("id_a") != F.col("id_b"))
        .repartition(args.cpus * 2)
        .localCheckpoint(eager=True)
    )
    hist = edges.filter(F.col("_s") != 0).drop("_s").localCheckpoint(eager=True)
    new = edges.filter(F.col("_s") == 0).drop("_s").localCheckpoint(eager=True)
    n_hist, n_new = hist.count(), new.count()

    # persisted state a production pipeline already has (untimed)
    prior = assign_clusters(entities, hist).localCheckpoint(eager=True)
    prior.count()

    t0 = time.time()
    folded = fold_clusters(entities, prior, new).localCheckpoint(eager=True)
    folded.count()
    fold_sec = round(time.time() - t0, 1)

    t0 = time.time()
    full = assign_clusters(entities, edges.drop("_s")).localCheckpoint(eager=True)
    full.count()
    full_sec = round(time.time() - t0, 1)

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
           "| local[{c}], seed-deterministic random graph (giant component) "
           "| `scripts/fold_bench.py`, `BENCH_FOLD.json` |").format(
        n=n, h=n_hist, w=n_new, f=fold_sec, u=full_sec,
        x=full_sec / max(fold_sec, 0.1), c=args.cpus)
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
