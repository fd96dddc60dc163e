"""Dictionary serialization formats (reference A5, SURVEY.md §2.2).

liblevenshtein persists its compiled DAWG through pluggable serializers
(plain-text term list / protobuf / bytecode). The Spark-native engine has
two equivalents:

* **plain text** — one term per line, globally sorted: the interchange
  format (the reference's PlainTextSerializer reads exactly this, and its
  Daciuk-style DAWG builder requires sorted input). `write_terms_text`
  produces range-partitioned, sorted-within-partition part files whose
  lexicographic concatenation is globally sorted.
* **compiled parquet** — the (candidate, block_key) table written by
  `sources.tables.write_dictionary`: the binary 'compiled automaton'
  (protobuf/bytecode analogue), reloadable without recomputing keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_terms_text", "read_terms_text"]


def write_terms_text(terms: DataFrame, path: str, term_col: str = "term",
                     num_files: int | None = None) -> None:
    """Persist distinct terms as a sorted plain-text dictionary.

    repartitionByRange + sortWithinPartitions gives a global sort without
    funnelling everything through one task; part files are written in range
    order so the concatenation in filename order stays sorted."""
    out = terms.select(F.col(term_col).alias("value")).distinct()
    out = (
        out.repartitionByRange(num_files, "value")
        if num_files is not None
        else out.repartitionByRange("value")
    )
    out.sortWithinPartitions("value").write.mode("overwrite").text(path)


def read_terms_text(spark: SparkSession, path: str, term_col: str = "term") -> DataFrame:
    """Load a plain-text dictionary (one term per line, blank lines
    dropped) — accepts both our own output and hand-maintained word lists."""
    return (
        spark.read.text(path)
        .select(F.col("value").alias(term_col))
        .filter(F.col(term_col) != "")
    )
