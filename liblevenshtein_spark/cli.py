"""Command-line spelling correction — the Spark-native analogue of the
reference's CLI front-end (universal-automata/liblevenshtein README.md:31-33:
command-line spelling correction over a dictionary file).

Usage:
    python -m liblevenshtein_spark.cli \
        --dictionary /path/to/terms.txt \
        --max-distance 2 --algorithm standard \
        query1 query2 ...

The dictionary is a plain-text term list (one per line — the reference's
PlainTextSerializer format, readable by sources.dictionary_io); queries are
positional args or stdin lines. Output: TSV `query  candidate  distance`,
candidates sorted by (distance, candidate) per query — include_distance
corresponds to the reference's builder flag and is on by default.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import functions as F


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(prog="liblevenshtein-spark",
                                 description=__doc__.splitlines()[0])
    ap.add_argument("--dictionary", required=True,
                    help="dictionary path: plain-text term list, or an LLD1 "
                         "binary dictionary directory (--format binary)")
    ap.add_argument("--format", choices=["text", "binary"], default="text",
                    help="dictionary serialization format (text = one term "
                         "per line; binary = front-coded LLD1 blocks, the "
                         "reference's protobuf/bytecode-serializer analogue)")
    ap.add_argument("--max-distance", "-n", type=int, default=2)
    ap.add_argument("--algorithm", choices=["standard", "transposition", "merge_and_split"],
                    default="standard")
    ap.add_argument("--no-distance", action="store_true",
                    help="emit candidates only (includeDistance=false)")
    ap.add_argument("--units", choices=["codepoint", "utf16"], default="codepoint",
                    help="comparison alphabet: Unicode code points (default) "
                         "or UTF-16 code units (bit-for-bit Java reference "
                         "semantics; astral chars count as surrogate pairs)")
    ap.add_argument("--master", default="local[*]")
    ap.add_argument("queries", nargs="*", help="query terms (default: stdin lines)")
    args = ap.parse_args(argv)

    from .config import LinkConfig
    from .operators.transduce import compile_dictionary, transduce
    from .session import build_session
    from .sources.dictionary_io import read_terms_binary, read_terms_text

    queries = args.queries or [ln.strip() for ln in sys.stdin if ln.strip()]
    if not queries:
        ap.error("no query terms (pass as args or on stdin)")

    spark = build_session(app_name="liblevenshtein-spark-cli", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")
    conf = LinkConfig(algorithm=args.algorithm, max_distance=args.max_distance,
                      include_distance=not args.no_distance,
                      blocking_scheme="deletions", units=args.units)
    reader = read_terms_binary if args.format == "binary" else read_terms_text
    dictionary = reader(spark, args.dictionary)
    qdf = spark.createDataFrame([(q, q) for q in queries], "query_id string, term string")
    out = transduce(qdf, compile_dictionary(dictionary, conf), conf)
    cols = ["query_id", "candidate"] + ([] if args.no_distance else ["distance"])
    order = [F.col("query_id")] + (
        [F.col("distance"), F.col("candidate")] if not args.no_distance else [F.col("candidate")]
    )
    for row in out.select(*cols).orderBy(*order).collect():
        print("\t".join(str(v) for v in row))
    spark.stop()


if __name__ == "__main__":
    main()
