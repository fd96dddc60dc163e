"""Text-analysis scalar functions for large-scale training-data pipelines:
tokenization, token counts, quality scoring, language ID (stopword-overlap
heuristic), and document fingerprinting. All native Spark SQL expressions
(JVM-side, codegen) — no UDFs — and each has an exact DuckDB-SQL equivalent
used by the driver oracle (driver_queries.py)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "tokens", "token_count", "gate_round4", "portable_hash64", "quality_columns",
    "lang_scores", "lang_id", "normalized_fingerprint", "STOPWORDS",
    "SCRUB_PATTERNS", "scrub_columns",
    "BPE_ISH_PATTERN", "bpe_ish_tokens", "bpe_ish_token_count",
]


def tokens(col: str) -> Column:
    """Whitespace tokens, empties dropped (consistent with DuckDB
    list_filter(regexp_split_to_array(...), x -> x <> ''))."""
    return F.expr(f"filter(split({col}, '\\\\s+'), x -> x != '')")


def gate_round4(col: Column) -> Column:
    """Ulp-robust 4-decimal rounding for gated float ratios: round(x+1e-9).

    Ratios of small integers (a/n, jaccard, quality scores) land EXACTLY on
    decimal rounding boundaries (e.g. 133/160 = 0.83125); the nearest double
    sits a fraction of an ulp to one side and Spark's BigDecimal HALF_UP and
    DuckDB's multiply-then-nearbyint round() can read OPPOSITE sides of it
    (observed: quality_score 0.8312 vs 0.8313 at sf0.1). Adding 1e-9 before
    rounding moves the knife edge to boundary-1e-9, which no rational with a
    denominator < ~1e8 can hit — every oracle adds the same constant
    (`+ 0.000000001`), so both engines round identically. The same epsilon
    must be used anywhere the rounded value feeds a >= threshold filter."""
    return F.round(col + 1e-9, 4)


def token_count(col: str) -> Column:
    return F.size(tokens(col)).cast("int")


# GPT-2-style pretokenizer shape: contractions, letter runs, digit runs,
# other-symbol runs, whitespace runs — a cheap, deterministic proxy for BPE
# token counts (ASCII classes so Spark and DuckDB regex engines agree).
BPE_ISH_PATTERN = "'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+|\\s+"


def bpe_ish_tokens(col: str) -> Column:
    """Sub-word-ish tokens under the GPT-2-style pretokenizer regex;
    whitespace runs dropped from the result (they carry no token mass).
    Column-based construction (no F.expr) sidesteps SQL-literal backslash
    escaping differences between engines."""
    arr = F.regexp_extract_all(F.col(col), F.lit(f"({BPE_ISH_PATTERN})"), 1)
    return F.filter(arr, lambda x: ~x.rlike(r"^\s+$"))


def bpe_ish_token_count(col: str) -> Column:
    return F.size(bpe_ish_tokens(col)).cast("int")


def portable_hash64(*cols: Column | str) -> Column:
    """Deterministic 60-bit hash identical in Spark and DuckDB:
    Spark : CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)
    DuckDB: CAST(('0x' || substring(md5(s), 1, 15)) AS BIGINT)
    Inputs are joined with '|'."""
    s = F.concat_ws("|", *[F.col(c) if isinstance(c, str) else c for c in cols])
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")


def quality_columns(col: str) -> list[Column]:
    """Deterministic quality metrics: length, token count, alpha/digit/space
    ratios, mean token length, and a [0,1] composite quality score."""
    n = F.length(col)
    alpha = n - F.length(F.regexp_replace(F.col(col), "[A-Za-z]", ""))
    digit = n - F.length(F.regexp_replace(F.col(col), "[0-9]", ""))
    space = n - F.length(F.regexp_replace(F.col(col), r"\s", ""))
    tc = token_count(col)
    safe_n = F.greatest(n, F.lit(1)).cast("double")
    alpha_ratio = alpha / safe_n
    digit_ratio = digit / safe_n
    space_ratio = space / safe_n
    mean_tok = F.when(tc > 0, (n - space) / tc.cast("double")).otherwise(F.lit(0.0))
    score = (
        F.when((n >= 50) & (n <= 5000), F.lit(0.25)).otherwise(F.lit(0.0))
        + 0.25 * alpha_ratio
        + 0.25 * (1.0 - digit_ratio)
        + 0.25 * F.least(mean_tok / 8.0, F.lit(1.0))
    )
    return [
        n.cast("int").alias("n_chars"),
        tc.alias("n_tokens"),
        gate_round4(alpha_ratio).alias("alpha_ratio"),
        gate_round4(digit_ratio).alias("digit_ratio"),
        gate_round4(space_ratio).alias("space_ratio"),
        gate_round4(mean_tok).alias("mean_token_len"),
        gate_round4(score).alias("quality_score"),
    ]


STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "you", "that"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "du", "ich", "mit", "ein"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est", "je", "pas"],
    "es": ["el", "los", "y", "de", "que", "en", "se", "para", "con", "por"],
}
_LANG_ORDER = ["en", "de", "fr", "es"]  # fixed tie-break precedence


def lang_scores(col: str) -> list[Column]:
    toks = F.array_distinct(tokens(col))
    out = []
    for lang in _LANG_ORDER:
        arr = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        out.append(F.size(F.array_intersect(toks, arr)).cast("int").alias(f"score_{lang}"))
    return out


def lang_id() -> Column:
    """argmax over the score_<lang> columns produced by lang_scores, ties
    broken by _LANG_ORDER; 'und' when all scores are zero."""
    best = F.greatest(*[F.col(f"score_{lang}") for lang in _LANG_ORDER])
    expr = F.lit("und")
    for lang in reversed(_LANG_ORDER):
        expr = F.when((F.col(f"score_{lang}") == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


# PII-style scrub patterns (ASCII-class regexes valid in both Java regex
# and RE2, so Spark and DuckDB agree): applied in order — URLs first (they
# may embed '@'), then emails, then long digit runs (ids/phones).
SCRUB_PATTERNS: list[tuple[str, str, str]] = [
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("longnum", r"\b[0-9]{6,}\b", "<NUM>"),
]


def scrub_columns(col: str) -> list[Column]:
    """Scrubbed text + per-pattern match counts (counts are measured
    independently on the ORIGINAL text; replacement is sequential in
    SCRUB_PATTERNS order). Pure native regexp exprs — the standard
    PII-redaction pass of a training-data pipeline, JVM-side at scale."""
    out = []
    scrubbed = F.col(col)
    for _, pat, repl in SCRUB_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    out.append(scrubbed.alias("scrubbed"))
    for name, pat, _ in SCRUB_PATTERNS:
        out.append(
            F.size(F.regexp_extract_all(F.col(col), F.lit(pat), F.lit(0)))
            .cast("int").alias(f"n_{name}")
        )
    return out


def normalized_fingerprint(col: str) -> Column:
    """md5 of the lowercased alphanumeric skeleton — whitespace/punct/case
    -insensitive exact-dup fingerprint."""
    return F.md5(F.lower(F.regexp_replace(F.col(col), "[^A-Za-z0-9]+", "")))
