"""SURVEY.md §7.3 edge cases: astral-plane unicode (item 3) and separator
collisions in fingerprints (item 4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from liblevenshtein_spark.config import FINGERPRINT_SEP
from liblevenshtein_spark.kernels.banded import batch_banded_distance
from liblevenshtein_spark.operators.canonicalize import canonicalize
from liblevenshtein_spark.sources.tables import TRANSCRIPTS_SCHEMA


def test_astral_plane_codepoint_semantics():
    """Parity is defined on Python code points: an astral char (outside the
    BMP, e.g. U+1F600) counts as ONE unit. (The Java reference compares
    UTF-16 code units, where it would be a surrogate pair — the documented,
    benign delta of SURVEY.md §7.3 item 3.) This also exercises the uint32
    codepoint-matrix path."""
    cases = [
        ("a\U0001F600b", "ab", 1),          # delete one astral char
        ("a\U0001F600b", "a\U0001F600b", 0),
        ("a\U0001F600b", "a\U0001F601b", 1),  # astral -> astral substitution
        ("\U0001F600", "\U0001F601\U0001F600", 1),
    ]
    for algo in ("standard", "transposition", "merge_and_split"):
        got = batch_banded_distance([c[0] for c in cases], [c[1] for c in cases], 2, algo)
        for (a, b, want), d in zip(cases, got):
            assert d == want, (algo, a, b, want, int(d))
    # mixed batch: astral rows + ascii rows must not disturb each other
    # (single narrow dtype is chosen per batch)
    mixed_a = ["kitten", "a\U0001F600b"]
    mixed_b = ["sitten", "ab"]
    assert batch_banded_distance(mixed_a, mixed_b, 2, "standard").tolist() == [1, 1]


def test_separator_collision_turns_stay_authoritative(spark):
    """Turn text containing the reserved separator makes two structurally
    different conversations join to the SAME fingerprint. The turns array
    is authoritative (SURVEY.md §7.3 item 4): canonicalize must round-trip
    the exact per-turn texts even then, so any consumer needing structural
    identity uses `turns`, and only the kernel consumes the joined form."""
    sep = FINGERPRINT_SEP
    rows = [
        ("c1", 0, "user", f"ab{sep}cd", "", None),       # one turn w/ embedded sep
        ("c2", 0, "user", "ab", "", None),               # two real turns
        ("c2", 1, "assistant", "cd", "", None),
    ]
    df = spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA)
    canon = canonicalize(df, sep)
    out = {r.conv_id: r for r in canon.collect()}
    # joined fingerprints collide by construction...
    assert out["c1"].fingerprint == out["c2"].fingerprint
    # ...but the authoritative turns arrays do not
    assert list(out["c1"].turns) == [f"ab{sep}cd"]
    assert list(out["c2"].turns) == ["ab", "cd"]
    assert out["c1"].n_turns == 1 and out["c2"].n_turns == 2
    # round-trip: exploding canonical turns reproduces the source rows
    back = {
        (r.conv_id, r.turn_idx): r.text
        for r in canon.select(
            "conv_id", F.posexplode("turns").alias("turn_idx", "text")
        ).collect()
    }
    assert back == {(cid, t): txt for cid, t, _r, txt, _to, _ts in rows}
