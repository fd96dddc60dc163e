"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: full record-linkage pipeline (canonicalize ->
                 block -> score -> match -> cluster) over the transcripts
                 corpus derived from sf0.001 documents; returns the cluster
                 assignment DataFrame.
queries()      — one entry per implemented operator (SURVEY.md §2.4 P1-P10 +
                 A3 transduce variants + the training-data toolkit).
oracle_sql()   — DuckDB-equivalent SQL for EVERY entry (no rows-only
                 entries): the restricted transduce variants use an
                 edit-lattice-BFS recursive CTE mirroring the
                 naive-recursion oracles (DuckDB's damerau_levenshtein is
                 the unrestricted variant, ours is restricted), and the
                 LSH ANN oracle embeds the seeded hyperplanes as SQL
                 literals so the whole scale path is recomputed in SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from liblevenshtein_spark import LinkConfig  # noqa: E402
from liblevenshtein_spark import driver_queries as dq  # noqa: E402
from liblevenshtein_spark.plans.pipeline import run_linkage  # noqa: E402
from liblevenshtein_spark.session import ship_package  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: end-to-end linkage over the
    derived transcripts corpus; returns (conv_id, cluster_id, n_turns,
    fp_len) with planted near-duplicates clustered together."""
    ship_package(spark)
    transcripts = dq.derive_transcripts(spark, "/root/testdata/sf0.001")
    res = run_linkage(transcripts, LinkConfig(algorithm="standard", max_distance=2))
    return res.clusters.join(
        res.canonical.select("conv_id", "n_turns", "fp_len"), "conv_id"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {**dq.LINKAGE_QUERIES, **dq.DATA_QUERIES}


def oracle_sql() -> dict[str, str]:
    return {**dq.LINKAGE_ORACLES, **dq.DATA_ORACLES}
