"""sf1-scale proof: one more decade beyond the sf0.1 bench corpus.

Generates a seed-deterministic ~180k-entity / ~800k-turn transcript corpus
(every base conversation gets 1-2 planted near-duplicates within 2 edits),
runs the headline linkage path (canonicalize -> block -> score -> match ->
CC), then evaluates with the round-4 SAMPLED-truth mode (the full
blocking-free truth scan is quadratic-within-length-bands and is the part
that does NOT survive sf>=1; the deterministic entity-hash sample at
rate=0.05 cuts the truth scan ~400x — see
driver_queries.q_eval_pairwise_f1_sampled for the estimator notes).

Hard checks built in (the artifact records pass/fail):
  * blocking recall on PLANTED duplicate pairs == 1.0 (every planted pair
    is within max_distance=2 by construction, so a miss is a key-scheme
    recall bug, not sampling noise);
  * match recall on planted pairs == 1.0 (kernel + threshold);
  * canary-gated capture (median warm per-job latency < 0.15 s) per the
    repo's bench methodology — unhealthy captures are flagged, not trusted.

Writes BENCH_SF1.json. Usage: python scripts/bench_sf1.py [--n-base 72000]
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
from liblevenshtein_spark.operators.clustering import assign_clusters  # noqa: E402
from liblevenshtein_spark.operators.metrics import (  # noqa: E402
    banded_truth_pairs, pairwise_confusion)
from liblevenshtein_spark.operators.sampling import sample_corpus  # noqa: E402
from liblevenshtein_spark.operators.scoring import match_filter, score_pairs  # noqa: E402
from liblevenshtein_spark.session import build_session  # noqa: E402
from liblevenshtein_spark.sources.tables import TRANSCRIPTS_SCHEMA  # noqa: E402
from liblevenshtein_spark.testdata_gen import gen_transcript_rows  # noqa: E402

TRUTH_RATE_SF1 = 0.05


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--n-base", type=int, default=72_000)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_SF1.json"))
    args = ap.parse_args()

    spark = build_session(
        app_name="bench-sf1",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus * 4,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "28g"),
            "spark.sql.execution.arrow.maxRecordsPerBatch": "3072",
        },
    )
    conf = LinkConfig(algorithm="standard", max_distance=2, blocking_scheme="segments")

    # canary (same self-qualification as bench.py)
    spark.range(1_000_000).select(F.sum("id")).collect()
    lat = []
    for _ in range(10):
        t = time.time()
        spark.range(1000).count()
        lat.append(time.time() - t)
    canary = round(statistics.median(lat), 3)

    cache = f"/tmp/lev_sf1_corpus_{args.n_base}"
    planted_path = cache + "_planted"
    # cache is valid only if BOTH writes committed — a crash between the
    # corpus and planted writes must not leave a half-cache that skips
    # regeneration and then reads missing/partial planted truth
    if not (os.path.exists(os.path.join(cache, "_SUCCESS"))
            and os.path.exists(os.path.join(planted_path, "_SUCCESS"))):
        rows, planted = gen_transcript_rows(
            n_base=args.n_base, dup_fraction=1.0, max_edits=2, max_dups=2, seed=1042,
        )
        (spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA)
         .repartition(args.cpus * 2).write.mode("overwrite").parquet(cache))
        (spark.createDataFrame(
            [(min(d, b), max(d, b)) for d, (b, _) in planted.items()],
            ["id_a", "id_b"])
         .coalesce(4).write.mode("overwrite").parquet(planted_path))

    timings: dict[str, float] = {}
    t0 = time.time()
    transcripts = spark.read.parquet(cache).localCheckpoint(eager=True)
    n_turns = transcripts.count()
    planted_pairs = spark.read.parquet(planted_path).localCheckpoint(eager=True)
    n_planted = planted_pairs.count()
    timings["load"] = round(time.time() - t0, 1)

    t0 = time.time()
    canonical = canonicalize(transcripts).localCheckpoint(eager=True)
    n_entities = canonical.count()
    timings["canonicalize"] = round(time.time() - t0, 1)

    t0 = time.time()
    build, probe = block_keys(canonical, conf)
    pairs = candidate_pairs(build, probe, conf).localCheckpoint(eager=True)
    n_pairs = pairs.count()
    timings["block"] = round(time.time() - t0, 1)

    # planted blocking recall (exact, not sampled: these pairs are true
    # matches by construction)
    blocked_caught = planted_pairs.join(pairs, ["id_a", "id_b"], "left_semi").count()
    blocking_recall = blocked_caught / n_planted if n_planted else 1.0

    t0 = time.time()
    scored = score_pairs(
        pairs, canonical.select("conv_id", "fingerprint"), conf
    ).localCheckpoint(eager=True)
    scored.count()
    timings["score"] = round(time.time() - t0, 1)

    t0 = time.time()
    matches = match_filter(scored, conf).localCheckpoint(eager=True)
    n_matches = matches.count()
    timings["match"] = round(time.time() - t0, 1)

    match_caught = planted_pairs.join(matches, ["id_a", "id_b"], "left_semi").count()
    match_recall = match_caught / n_planted if n_planted else 1.0

    t0 = time.time()
    clusters = assign_clusters(canonical.select("conv_id"), matches.select("id_a", "id_b"))
    n_clusters = clusters.select("cluster_id").distinct().count()
    timings["cluster_cc"] = round(time.time() - t0, 1)

    # sampled-truth pairwise F1 (rate 0.05): truth is the length-banded
    # blocking-free scan RESTRICTED to the entity sample; preds restricted
    # to the same induced subgraph. Exact on the sample.
    t0 = time.time()
    samp = sample_corpus(
        canonical.select("conv_id", "fingerprint", "fp_len"),
        TRUTH_RATE_SF1, key_col="conv_id", salt="truthsample",
    ).localCheckpoint(eager=True)
    n_sampled = samp.count()
    truth = banded_truth_pairs(samp, 2, "standard").select("id_a", "id_b")
    ids = samp.select("conv_id")
    preds = (
        matches.select("id_a", "id_b")
        .join(ids.withColumnRenamed("conv_id", "id_a"), "id_a", "left_semi")
        .join(ids.withColumnRenamed("conv_id", "id_b"), "id_b", "left_semi")
    )
    eval_row = pairwise_confusion(truth, preds).collect()[0].asDict()
    timings["eval_sampled_truth"] = round(time.time() - t0, 1)

    total = round(sum(timings.values()), 1)
    result = {
        "metric": "sf1_linkage_sec", "value": total, "unit": "sec",
        "stages": timings, "cpus": args.cpus,
        "job_latency_canary_sec": canary,
        "canary_healthy": canary < 0.15,
        "truth_sample_rate": TRUTH_RATE_SF1,
        "rows": {"turns": n_turns, "entities": n_entities,
                 "blocked_pairs": n_pairs, "matches": n_matches,
                 "clusters": n_clusters, "sampled_entities": n_sampled,
                 "planted_pairs": n_planted},
        "blocking_recall_planted": round(blocking_recall, 6),
        "match_recall_planted": round(match_recall, 6),
        "eval_pairwise_f1_sampled": eval_row,
        "pairs_scored_per_sec": round(n_pairs / timings["score"], 1) if timings["score"] else None,
    }
    print(json.dumps(result))
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
