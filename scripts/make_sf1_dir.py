"""Synthesize a deterministic sf1-scale test-data directory from sf0.1.

The driver ships parquet at sf{0.001,0.01,0.1} only; the round-4 verdict
(#7) asks for a self-consistent CONTRACT-style artifact at sf1 for the
linkage core, which needs a directory the contract gate can point BOTH
engines at. This script scales the tables the linkage core reads — all
derived from `documents` (the transcript corpus source) plus `embeddings`
(the ANN path) — by a deterministic replication factor, and copies the
remaining tables verbatim (the core entries only touch them for tiny
dimension lookups, e.g. nation names in the word dictionary).

Replication design (documents):
  * replica k prefixes every text with an 8-char md5-derived tag + space;
    tags are pairwise >2 edits apart (asserted), so cross-replica pairs of
    the SAME document sit beyond the max_distance=2 budget — candidate and
    match volume scales ~linearly with the corpus instead of quadratically
    in the replication factor, which is what a real 10x-bigger corpus does
    (new content, not byte-identical repeats; the repeat regime is
    exercised separately by BENCH_WATERFALL / BENCH_MEGA_GROUP);
  * doc_id offset per replica is a multiple of 21, so the derive chain's
    doc_id % 3 / % 7 near-duplicate planting keeps the same density in
    every replica (driver_queries.derive_transcripts / DUCK_TRANSCRIPTS).

Embeddings: replica k offsets vec_id by the same-style multiple and adds
k * 1e-3 to the first component — distinct vectors, deterministic, same
label distribution.

Everything is plain deterministic SQL over the driver's own parquet — no
external data, rerunnable bit-for-bit.

Usage: python scripts/make_sf1_dir.py [--src /root/testdata/sf0.1]
       [--out /tmp/levtest_sf1] [--factor 10]
"""

from __future__ import annotations

import argparse
import hashlib
import os

import duckdb

COPY_TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
               "lineitem", "events"]


def replica_tag(k: int) -> str:
    return hashlib.md5(f"sf1-replica-{k}".encode()).hexdigest()[:8]


def check_tags(factor: int) -> None:
    tags = [replica_tag(k) for k in range(factor)]
    for i in range(factor):
        for j in range(i + 1, factor):
            diff = sum(a != b for a, b in zip(tags[i], tags[j]))
            assert diff > 2, (tags[i], tags[j])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/levtest_sf1")
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    check_tags(args.factor)
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()

    max_doc = con.sql(
        f"SELECT max(doc_id) FROM '{args.src}/documents.parquet'").fetchone()[0]
    off = ((max_doc + 21) // 21) * 21
    doc_sql = " UNION ALL ".join(
        f"SELECT doc_id + {k * off} AS doc_id, "
        + ("text" if k == 0 else f"'{replica_tag(k)} ' || text") + " AS text, "
        "lang, source, "
        + ("n_chars" if k == 0 else "n_chars + 9") + " AS n_chars "
        f"FROM '{args.src}/documents.parquet'"
        for k in range(args.factor)
    )
    con.sql(f"COPY ({doc_sql}) TO '{args.out}/documents.parquet' (FORMAT PARQUET)")

    max_vec = con.sql(
        f"SELECT max(vec_id) FROM '{args.src}/embeddings.parquet'").fetchone()[0]
    voff = ((max_vec + 21) // 21) * 21
    emb_sql = " UNION ALL ".join(
        f"SELECT vec_id + {k * voff} AS vec_id, "
        + ("embedding"
           if k == 0 else
           f"list_prepend(embedding[1] + {k} * 0.001, embedding[2:]) ")
        + " AS embedding, label "
        f"FROM '{args.src}/embeddings.parquet'"
        for k in range(args.factor)
    )
    con.sql(f"COPY ({emb_sql}) TO '{args.out}/embeddings.parquet' (FORMAT PARQUET)")

    for t in COPY_TABLES:
        con.sql(f"COPY (SELECT * FROM '{args.src}/{t}.parquet') "
                f"TO '{args.out}/{t}.parquet' (FORMAT PARQUET)")

    for t in ["documents", "embeddings"] + COPY_TABLES:
        n = con.sql(f"SELECT count(*) FROM '{args.out}/{t}.parquet'").fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    main()
