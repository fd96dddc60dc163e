"""TF-IDF dot-product fan-out cap on a LONG-document corpus.

The dot-product stage of tfidf_cosine_pairs fans out each candidate pair
to its shared-token rows: Sigma_pairs |tokens(a)| — linear in candidates x
document length, the same order as kernel scoring, but with a constant
that grows with conversation length. On multi-thousand-token conversations
the round-4 `topk_tokens` knob caps that constant at K weight-vector
entries per document.

This bench builds a deterministic corpus of LONG documents (~1,500 token
occurrences each, heavy shared vocabulary so the (id, token) join is
genuinely dense), scores the same candidate-pair stream with the exact
path and with topk_tokens=64, and records wall times, the (id, token)
weight-row counts that drive the join fan-out, and the cosine deltas
(recall trade made visible, not hidden).

Writes BENCH_TFIDF_TOPK.json. Usage: python scripts/tfidf_topk_bench.py
"""

from __future__ import annotations

import json
import os
import random
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from liblevenshtein_spark.operators.comparators import tfidf_cosine_pairs  # noqa: E402
from liblevenshtein_spark.session import build_session  # noqa: E402

N_DOCS = 4_000
TOKENS_PER_DOC = 1_500
VOCAB = 8_000
PAIRS_PER_DOC = 25
TOPK = 64


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(
        app_name="tfidf-topk-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2,
        extra_conf={"spark.ui.enabled": "false"},
    )

    spark.range(1_000_000).select(F.sum("id")).collect()
    lat = []
    for _ in range(10):
        t = time.time()
        spark.range(1000).count()
        lat.append(time.time() - t)
    canary = round(statistics.median(lat), 3)

    # Zipf-ish vocabulary: low token ids are corpus-wide boilerplate, the
    # tail is rare — exactly the shape where top-K-by-weight keeps the
    # discriminating tokens and drops the shared bulk.
    rng = random.Random(91)
    ents = []
    for d in range(N_DOCS):
        toks = [f"t{int(VOCAB * (rng.random() ** 2.5)):05d}" for _ in range(TOKENS_PER_DOC)]
        ents.append((f"doc{d:05d}", " ".join(toks)))
    entities = spark.createDataFrame(ents, ["conv_id", "fingerprint"]).repartition(
        cpus).localCheckpoint(eager=True)
    entities.count()

    pair_rows = []
    for d in range(N_DOCS):
        for k in range(1, PAIRS_PER_DOC + 1):
            o = (d + k * 37) % N_DOCS
            a, b = f"doc{d:05d}", f"doc{o:05d}"
            if a < b:
                pair_rows.append((a, b))
    pairs = spark.createDataFrame(sorted(set(pair_rows)), ["id_a", "id_b"]).localCheckpoint(
        eager=True)
    n_pairs = pairs.count()

    def run(topk):
        t0 = time.time()
        out = tfidf_cosine_pairs(pairs, entities, sep=" ", topk_tokens=topk)
        rows = out.collect()
        return round(time.time() - t0, 2), {(r["id_a"], r["id_b"]): r["cosine"] for r in rows}

    # warm both paths once (JIT/Arrow init), then measure
    run(None)
    exact_sec, exact = run(None)
    topk_sec, capped = run(TOPK)

    # fan-out driver: weight rows entering the pair join
    from liblevenshtein_spark.operators.comparators import _tokens
    toks = _tokens(entities, "conv_id", "fingerprint", " ")
    w_rows_exact = toks.groupBy("id", "token").count().count()
    w_rows_topk = N_DOCS * TOPK

    deltas = [abs(exact[k] - capped[k]) for k in exact]
    result = {
        "metric": "tfidf_topk_speedup",
        "value": round(exact_sec / topk_sec, 2) if topk_sec else None,
        "unit": "ratio",
        "exact_sec": exact_sec,
        "topk_sec": topk_sec,
        "topk": TOPK,
        "n_docs": N_DOCS,
        "tokens_per_doc": TOKENS_PER_DOC,
        "n_pairs": n_pairs,
        "weight_rows_exact": w_rows_exact,
        "weight_rows_topk": w_rows_topk,
        "fanout_cut": round(w_rows_exact / w_rows_topk, 1),
        "cosine_delta_mean": round(sum(deltas) / len(deltas), 4),
        "cosine_delta_max": round(max(deltas), 4),
        "job_latency_canary_sec": canary,
        "canary_healthy": canary < 0.15,
    }
    print(json.dumps(result))
    with open(os.path.join(REPO, "BENCH_TFIDF_TOPK.json"), "w") as fh:
        json.dump(result, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
