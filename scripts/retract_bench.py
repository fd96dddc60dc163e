"""sf1-scale proof for retract_entities (right-to-be-forgotten repair).

Reuses the cached bench_sf1 corpus (~180k entities / ~800k turns), runs the
headline linkage once, then deletes the deterministic md5-first-hex-'f'
entity batch (~1/16) two ways:

  * incremental — operators.clustering.retract_entities: untouched clusters
    pass through, affected clusters re-run CC on surviving internal edges;
  * full — assign_clusters over ALL surviving entities and edges.

The artifact records both walls AND the work-volume ratio that is the
actual scale claim (edges entering CC under each path: the incremental
path's CC input is bounded by affected-cluster mass, the full path's by the
whole match graph), plus an exact assignment-equality check — the gate
invariant (deletion splits, never merges) re-verified at sf1.

Writes BENCH_RETRACT.json. Usage: python scripts/retract_bench.py
"""

from __future__ import annotations

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
    assign_clusters, retract_entities)
from liblevenshtein_spark.operators.scoring import match_filter, score_pairs  # noqa: E402
from liblevenshtein_spark.session import build_session  # noqa: E402
from liblevenshtein_spark.sources.tables import TRANSCRIPTS_SCHEMA  # noqa: E402
from liblevenshtein_spark.testdata_gen import gen_transcript_rows  # noqa: E402


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_base = 72_000
    spark = build_session(
        app_name="bench-retract",
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
    scored = score_pairs(pairs, canonical.select("conv_id", "fingerprint"), conf)
    matches = match_filter(scored, conf).select("id_a", "id_b") \
        .localCheckpoint(eager=True)
    n_edges = matches.count()
    assignment = assign_clusters(
        canonical.select("conv_id"), matches
    ).localCheckpoint(eager=True)
    assignment.count()

    deleted = canonical.filter(
        F.substring(F.md5("conv_id"), 1, 1) == "f"
    ).select("conv_id").localCheckpoint(eager=True)
    n_deleted = deleted.count()

    # work-volume diagnostics (computed once, outside the timed runs) via
    # the OPERATOR'S OWN decomposition, so the reported edge volume is by
    # construction the edge set retract_entities feeds CC
    from liblevenshtein_spark.operators.clustering import affected_subgraph

    n_affected_clusters = (
        assignment.join(deleted, "conv_id").select("cluster_id").distinct().count()
    )
    _, _, sub_edges = affected_subgraph(assignment, matches, deleted)
    n_sub_edges = sub_edges.count()

    t0 = time.time()
    incr = retract_entities(assignment, matches, deleted) \
        .localCheckpoint(eager=True)
    n_incr = incr.count()
    t_incr = round(time.time() - t0, 2)

    survivors = canonical.select("conv_id").join(deleted, "conv_id", "left_anti")
    kept_edges = (
        matches
        .join(deleted.select(F.col("conv_id").alias("id_a")), "id_a", "left_anti")
        .join(deleted.select(F.col("conv_id").alias("id_b")), "id_b", "left_anti")
    )
    t0 = time.time()
    full = assign_clusters(survivors, kept_edges).localCheckpoint(eager=True)
    n_full = full.count()
    t_full = round(time.time() - t0, 2)

    n_disagree = (
        incr.withColumnRenamed("cluster_id", "c1")
        .join(full.withColumnRenamed("cluster_id", "c2"), "conv_id", "full")
        .filter((F.col("c1") != F.col("c2"))
                | F.col("c1").isNull() | F.col("c2").isNull())
        .count()
    )

    out = {
        "metric": "retract_entities_sf1",
        "sf": "sf1-equivalent (n_base=72k, ~180k entities)",
        "cpus": cpus,
        "job_latency_canary_sec": canary,
        "canary_healthy": canary < 0.15,
        "n_entities": n_entities,
        "n_match_edges": n_edges,
        "n_deleted": n_deleted,
        "n_affected_clusters": n_affected_clusters,
        "cc_input_edges_incremental": n_sub_edges,
        "cc_input_edges_full": n_edges,
        "cc_edge_cut_x": round(n_edges / max(n_sub_edges, 1), 1),
        "wall_incremental_sec": t_incr,
        "wall_full_sec": t_full,
        "survivors_incremental": n_incr,
        "survivors_full": n_full,
        "assignments_equal": n_disagree == 0,
        "n_disagree": n_disagree,
    }
    path = os.path.join(REPO, "BENCH_RETRACT.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    assert n_disagree == 0, "incremental repair diverged from full re-cluster"


if __name__ == "__main__":
    main()
