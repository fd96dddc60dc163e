"""Anchored turn alignment (operators/alignment.py::align_turns).

Hand-built transcripts cover the geometry cases: identical, middle edit,
edit in first/last turn, insertion at the end, insertion at the start
(shifting every index), disjoint, and overlapping prefix/suffix where the
suffix must be capped at min(n) - prefix.
"""

from __future__ import annotations

from liblevenshtein_spark.operators.alignment import align_turns


def _turns(spark, convs: dict[str, list[str]]):
    rows = [
        (cid, i, txt)
        for cid, ts in convs.items()
        for i, txt in enumerate(ts)
    ]
    return spark.createDataFrame(rows, ["conv_id", "turn_idx", "text"])


def _align(spark, convs, pairs):
    m = spark.createDataFrame(pairs, ["id_a", "id_b"])
    out = align_turns(m, _turns(spark, convs)).collect()
    return {
        (r["id_a"], r["id_b"]): (
            r["n_turns_a"], r["n_turns_b"], r["aligned_prefix"],
            r["aligned_suffix"], r["changed_a"], r["changed_b"],
        )
        for r in out
    }


def test_identical_conversations(spark):
    convs = {"a": ["hi", "yo", "bye"], "b": ["hi", "yo", "bye"]}
    got = _align(spark, convs, [("a", "b")])
    # full prefix consumes everything; suffix capped at min(n) - prefix = 0
    assert got[("a", "b")] == (3, 3, 3, 0, 0, 0)


def test_middle_edit(spark):
    convs = {"a": ["hi", "yo", "bye"], "b": ["hi", "YO", "bye"]}
    assert _align(spark, convs, [("a", "b")])[("a", "b")] == (3, 3, 1, 1, 1, 1)


def test_edit_in_first_and_last_turn(spark):
    convs = {"a": ["hi", "yo", "bye"], "b": ["HI", "yo", "bye"]}
    assert _align(spark, convs, [("a", "b")])[("a", "b")] == (3, 3, 0, 2, 1, 1)
    convs = {"a": ["hi", "yo", "bye"], "b": ["hi", "yo", "BYE"]}
    assert _align(spark, convs, [("a", "b")])[("a", "b")] == (3, 3, 2, 0, 1, 1)


def test_truncated_tail(spark):
    # b = a minus its last turn: prefix covers all of b, nothing changed on b
    convs = {"a": ["hi", "yo", "bye"], "b": ["hi", "yo"]}
    assert _align(spark, convs, [("a", "b")])[("a", "b")] == (3, 2, 2, 0, 1, 0)


def test_insertion_at_start_shifts_alignment(spark):
    # b = ["new"] + a: no common prefix, but the whole of a is a common suffix
    convs = {"a": ["hi", "yo"], "b": ["new", "hi", "yo"]}
    assert _align(spark, convs, [("a", "b")])[("a", "b")] == (2, 3, 0, 2, 0, 1)


def test_disjoint_conversations(spark):
    convs = {"a": ["hi", "yo"], "b": ["xx", "yy", "zz"]}
    assert _align(spark, convs, [("a", "b")])[("a", "b")] == (2, 3, 0, 0, 2, 3)


def test_suffix_capped_by_prefix(spark):
    # a is a prefix AND suffix overlap case: b repeats a's turns; prefix=2
    # consumes min(n)=2, so suffix must cap at 0 even though turns match
    # from the end too.
    convs = {"a": ["x", "x"], "b": ["x", "x", "x"]}
    assert _align(spark, convs, [("a", "b")])[("a", "b")] == (2, 3, 2, 0, 0, 1)


def test_multiple_pairs_stay_independent(spark):
    convs = {
        "a": ["hi", "yo", "bye"],
        "b": ["hi", "YO", "bye"],
        "c": ["hi", "yo", "bye"],
    }
    got = _align(spark, convs, [("a", "b"), ("a", "c")])
    assert got[("a", "b")] == (3, 3, 1, 1, 1, 1)
    assert got[("a", "c")] == (3, 3, 3, 0, 0, 0)
