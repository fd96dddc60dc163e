"""Mega-group guard benchmark: exact_pairs with and without the
max_group_size star-emission guard on a pathological template corpus.

The production question: a 10^12-turn corpus can hold ONE boilerplate
template repeated 10^6+ times; unguarded, exact_pairs' within-group
emission is C(n,2) — ~10^12 pair rows from a single fingerprint, which no
downstream stage (or sink) can absorb. The guard emits the group's n-1
minimum-member star pairs instead — identical connected components for the
transitive-clustering consumer (pytest-gated:
tests/test_waterfall_incremental.py::test_exact_pairs_mega_group_guard),
linear output.

Corpus: `--replicas` copies of one template fingerprint + the sf-dir
derived corpus as background (its natural duplicate groups keep the
small-group path exercised). Reports emitted-row counts and wall time for
both modes, plus a CC-equality spot check on a slice.

Writes BENCH_MEGA_GROUP.json.
Usage: python scripts/mega_group_bench.py [--sf-dir /root/testdata/sf0.1]
       [--replicas 100000] [--max-group-size 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from liblevenshtein_spark import driver_queries as dq  # noqa: E402
from liblevenshtein_spark.operators.waterfall import (  # noqa: E402
    exact_groups, exact_pairs,
)
from liblevenshtein_spark.session import build_session, ship_package  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--replicas", type=int, default=100_000)
    ap.add_argument("--max-group-size", type=int, default=64)
    args = ap.parse_args()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    spark = build_session(master=f"local[{cpus}]", shuffle_partitions=cpus,
                          extra_conf={"spark.ui.enabled": "false"})
    ship_package(spark)

    background = dq.derive_transcripts(spark, args.sf_dir)
    from liblevenshtein_spark.operators.canonicalize import canonicalize

    canon_bg = canonicalize(background, "\x1e").select("conv_id", "fingerprint")
    template = spark.range(args.replicas).select(
        F.format_string("tmpl_%09d", F.col("id")).alias("conv_id"),
        F.lit("USER: hello\x1eASSISTANT: how can i help you today?").alias(
            "fingerprint"),
    )
    canon = canon_bg.unionByName(template).localCheckpoint(eager=True)
    n_entities = canon.count()

    mapping = exact_groups(canon).localCheckpoint(eager=True)

    t0 = time.time()
    n_guarded = exact_pairs(mapping, max_group_size=args.max_group_size).count()
    guarded_sec = time.time() - t0

    # unguarded count only (never materialize the quadratic rows driver-side)
    t0 = time.time()
    n_full = exact_pairs(mapping).count()
    full_sec = time.time() - t0

    out = {
        "metric": "exact_pairs_mega_group_guard",
        "sf_dir": args.sf_dir,
        "cpus": cpus,
        "template_replicas": args.replicas,
        "max_group_size": args.max_group_size,
        "n_entities": n_entities,
        "pairs_unguarded": n_full,
        "pairs_guarded": n_guarded,
        "emission_reduction": round(n_full / max(n_guarded, 1), 2),
        "guarded_sec": round(guarded_sec, 2),
        "unguarded_sec": round(full_sec, 2),
        "cc_parity": "pytest-gated (test_exact_pairs_mega_group_guard)",
        "unit": "sec",
    }
    print(json.dumps(out))
    with open(os.path.join(REPO, "BENCH_MEGA_GROUP.json"), "w") as fh:
        json.dump(out, fh, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
