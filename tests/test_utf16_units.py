"""UTF-16 code-unit parity mode (`units="utf16"`), closing SURVEY.md §7.3
item 3: the Java reference compares UTF-16 code units (`String.charAt`
`[PK]`), so an astral character is a surrogate PAIR — two symbols — while
the default code-point mode counts it as one. The kernel's utf16 mode must
agree with the naive oracles run over the surrogate-expanded unit strings,
and the two modes must coincide exactly on BMP-only text.

Also property-tests the invariant the blocking layer relies on
(config.py `units` docs): d_codepoint <= d_utf16 for well-formed strings,
so code-point blocking keys / length prefilters stay COMPLETE under a
utf16 distance budget.
"""

from __future__ import annotations

import struct

import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from liblevenshtein_spark.config import LinkConfig
from liblevenshtein_spark.kernels.banded import (
    batch_banded_distance,
    batch_banded_distance_arrow,
)
from liblevenshtein_spark.kernels.oracles import distance as naive_distance

ALGOS = ("standard", "transposition", "merge_and_split")

# BMP chars + astral chars (each astral = one surrogate pair in UTF-16);
# \U0001D49C / \U0001D49D share a HIGH surrogate (differ only in the low
# unit), \U0001F600 does not — exercises partial-pair matches.
ASTRAL_ALPHA = "ab\U0001D49C\U0001D49D\U0001F600"
astral_texts = st.text(alphabet=ASTRAL_ALPHA, max_size=8)
bmp_texts = st.text(alphabet="abé中", max_size=12)
ns = st.integers(min_value=0, max_value=3)
algos = st.sampled_from(ALGOS)


def u16_units(s: str) -> str:
    """Surrogate-expand: the string whose i-th CHAR is the i-th UTF-16 code
    unit of `s` (lone surrogates are valid Python chars, so the pure-Python
    oracles compute the code-unit distance directly on the result)."""
    enc = s.encode("utf-16-le")
    return "".join(chr(u) for u in struct.unpack(f"<{len(enc) >> 1}H", enc))


def test_utf16_hand_cases():
    A, B = "\U0001D49C", "\U0001D49D"  # same high surrogate, different low
    cases = [
        # (a, b, algo, want_utf16)
        (A, "x", "standard", 2),          # pair -> 1 char: sub + delete
        (A, "", "standard", 2),           # delete both units
        (A, B, "standard", 1),            # low-unit substitution only
        (A, "x", "merge_and_split", 1),   # merge the two units into 'x'
        ("x", A, "merge_and_split", 1),   # split 'x' into the two units
        (A + "x", "x" + A, "transposition", 2),  # NOT adjacent-unit swap
        ("a" + A, A + "a", "standard", 2),
        (A, A, "standard", 0),
    ]
    for a, b, algo, want in cases:
        got = int(batch_banded_distance([a], [b], 4, algo, units="utf16")[0])
        assert got == want, (a, b, algo, want, got)
        # oracle agreement on the expanded unit strings
        assert naive_distance(u16_units(a), u16_units(b), algo) == want


@settings(max_examples=250, deadline=None)
@given(astral_texts, astral_texts, ns, algos)
def test_utf16_kernel_equals_oracle_on_units(a, b, n, algo):
    got = int(batch_banded_distance([a], [b], n, algo, units="utf16")[0])
    true = naive_distance(u16_units(a), u16_units(b), algo)
    want = true if true <= n else n + 1
    assert got == want, (a, b, n, algo, true, got)


@settings(max_examples=150, deadline=None)
@given(bmp_texts, bmp_texts, ns, algos)
def test_bmp_modes_coincide(a, b, n, algo):
    """Inside the BMP a code point IS one code unit, so the modes agree."""
    d_cp = int(batch_banded_distance([a], [b], n, algo)[0])
    d_16 = int(batch_banded_distance([a], [b], n, algo, units="utf16")[0])
    assert d_cp == d_16


@settings(max_examples=250, deadline=None)
@given(astral_texts, astral_texts, algos)
def test_codepoint_distance_below_utf16(a, b, algo):
    """The blocking-completeness invariant: d_codepoint <= d_utf16, so
    code-point blocking keys built for budget n can never miss a pair whose
    code-UNIT distance is within n (config.py `units`)."""
    d_cp = naive_distance(a, b, algo)
    d_16 = naive_distance(u16_units(a), u16_units(b), algo)
    assert d_cp <= d_16, (a, b, algo, d_cp, d_16)


def test_arrow_entry_units():
    # multi-byte batch -> list fallback must carry units through
    a = pa.array(["\U0001D49C", "abc", None])
    b = pa.array(["x", "abd", "y"])
    got = batch_banded_distance_arrow(a, b, 3, "standard", units="utf16")
    assert got.tolist() == [2, 1, 1]
    # pure-ASCII batch: fast path is units-agnostic (identical results)
    a2 = pa.array(["kitten", "flaw"])
    b2 = pa.array(["sitting", "lawn"])
    d_cp = batch_banded_distance_arrow(a2, b2, 3, "standard")
    d_16 = batch_banded_distance_arrow(a2, b2, 3, "standard", units="utf16")
    assert d_cp.tolist() == d_16.tolist() == [3, 2]


def test_linkconfig_validates_units():
    assert LinkConfig(units="utf16").units == "utf16"
    with pytest.raises(ValueError):
        LinkConfig(units="utf8")


def test_scoring_pipeline_utf16(spark):
    """End-to-end through score_pairs / transduce with units='utf16': the
    astral pair ('𝒜x', 'yx') is 1 edit in code points (astral sub) but 2 in
    code units (high-surrogate sub + low-surrogate delete) — the reported
    distances must diverge exactly there."""
    from liblevenshtein_spark.operators.scoring import score_pairs
    from liblevenshtein_spark.operators.transduce import compile_dictionary, transduce

    ents = spark.createDataFrame(
        [("e1", "\U0001D49Cx"), ("e2", "yx"), ("e3", "\U0001D49Dx")],
        "conv_id string, fingerprint string",
    )
    pairs = spark.createDataFrame(
        [("e1", "e2"), ("e1", "e3")], "id_a string, id_b string"
    )
    base = dict(max_distance=2, blocking_scheme="deletions")
    d_cp = {(r.id_a, r.id_b): r.distance for r in
            score_pairs(pairs, ents, LinkConfig(**base)).collect()}
    d_16 = {(r.id_a, r.id_b): r.distance for r in
            score_pairs(pairs, ents, LinkConfig(units="utf16", **base)).collect()}
    assert d_cp == {("e1", "e2"): 1, ("e1", "e3"): 1}
    assert d_16 == {("e1", "e2"): 2, ("e1", "e3"): 1}  # sub+del vs low-unit sub

    # transduce: dictionary match set shrinks under the stricter unit metric
    conf_cp = LinkConfig(max_distance=1, blocking_scheme="deletions")
    conf_16 = LinkConfig(max_distance=1, blocking_scheme="deletions", units="utf16")
    terms = spark.createDataFrame([("\U0001D49Cx",), ("yx",)], "term string")
    queries = spark.createDataFrame([(0, "\U0001D49Dx")], "query_id int, term string")
    got_cp = {r.candidate: r.distance for r in
              transduce(queries, compile_dictionary(terms, conf_cp), conf_cp).collect()}
    got_16 = {r.candidate: r.distance for r in
              transduce(queries, compile_dictionary(terms, conf_16), conf_16).collect()}
    assert got_cp == {"\U0001D49Cx": 1, "yx": 1}   # both 1 edit in code points
    assert got_16 == {"\U0001D49Cx": 1}            # 'yx' is 3 unit edits: dropped


def test_banded_truth_pairs_units(spark):
    """The evaluation truth scan must measure in the same units as the
    pipeline under audit: with units='utf16' the astral pair ('𝒜x','yx')
    (d_cp=1, d_utf16=2) drops out of a max_distance=1 truth set."""
    from pyspark.sql import functions as F

    from liblevenshtein_spark.operators.metrics import banded_truth_pairs

    canon = spark.createDataFrame(
        [("e1", "\U0001D49Cx"), ("e2", "yx")],
        "conv_id string, fingerprint string",
    ).withColumn("fp_len", F.length("fingerprint"))
    cp = banded_truth_pairs(canon, 1, "standard").collect()
    u16 = banded_truth_pairs(canon, 1, "standard", units="utf16").collect()
    assert [(r.id_a, r.id_b, r.distance) for r in cp] == [("e1", "e2", 1)]
    assert u16 == []
