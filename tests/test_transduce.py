"""Transduce parity (SURVEY.md §5.2 row 4): the Spark pipeline's
(query, candidate, distance) set must equal brute-force transduce over the
fixture dictionary — the reference's own transducer-vs-oracle equivalence
test pattern, per algorithm."""

from __future__ import annotations

import pytest

from liblevenshtein_spark.config import LinkConfig
from liblevenshtein_spark.kernels.oracles import transduce_brute_force
from liblevenshtein_spark.operators.transduce import (
    compile_dictionary,
    transduce,
    transduce_per_query,
)
from liblevenshtein_spark.testdata_gen import gen_dictionary, gen_queries

ALGOS = ["standard", "transposition", "merge_and_split"]


@pytest.mark.parametrize("algorithm", ALGOS)
@pytest.mark.parametrize("n", [0, 1, 2])
def test_transduce_parity(spark, algorithm, n):
    dictionary = gen_dictionary(250)
    queries = gen_queries(dictionary, n_queries=45, algorithm=algorithm)
    conf = LinkConfig(algorithm=algorithm, max_distance=n, blocking_scheme="deletions")

    dict_df = spark.createDataFrame([(t,) for t in dictionary], ["term"])
    q_df = spark.createDataFrame(queries, ["query_id", "term"])
    compiled = compile_dictionary(dict_df, conf)
    got = {
        (r.query_id, r.candidate, r.distance)
        for r in transduce(q_df, compiled, conf).collect()
    }
    want = {
        (qid, cand, d)
        for qid, term in queries
        for cand, d in transduce_brute_force(term, dictionary, n, algorithm)
    }
    assert got == want


@pytest.mark.parametrize("algorithm", ALGOS)
@pytest.mark.parametrize("scheme", ["deletions", "segments"])
def test_transduce_per_query_n_parity(spark, algorithm, scheme):
    """transduce(term, n) overload: per-row budgets 0/1/2 in one batch must
    equal brute force at each row's own n (cap = 2); NULL n falls back to the
    cap (the defaultMaxDistance role) and out-of-range n clamps to it."""
    cap = 2
    dictionary = gen_dictionary(150)
    base = gen_queries(dictionary, n_queries=30, algorithm=algorithm)
    # deterministic mixed budgets incl. NULL (-> cap) and 99 (-> clamped cap)
    budgets = [0, 1, 2, None, 99]
    queries = [(qid, term, budgets[i % len(budgets)])
               for i, (qid, term) in enumerate(base)]
    conf = LinkConfig(algorithm=algorithm, max_distance=cap, blocking_scheme=scheme)

    dict_df = spark.createDataFrame([(t,) for t in dictionary], ["term"])
    q_df = spark.createDataFrame(queries, ["query_id", "term", "n"])
    got = {
        (r.query_id, r.candidate, r.distance)
        for r in transduce_per_query(q_df, compile_dictionary(dict_df, conf), conf).collect()
    }
    want = {
        (qid, cand, d)
        for qid, term, n in queries
        for cand, d in transduce_brute_force(
            term, dictionary, min(n, cap) if n is not None else cap, algorithm
        )
    }
    assert got == want


def test_include_distance_flag(spark):
    """The reference's includeDistance builder flag: candidates-only mode."""
    dictionary = gen_dictionary(100)
    conf = LinkConfig(algorithm="standard", max_distance=1,
                      blocking_scheme="deletions", include_distance=False)
    dict_df = spark.createDataFrame([(t,) for t in dictionary], ["term"])
    q_df = spark.createDataFrame([("q1", dictionary[0])], ["query_id", "term"])
    out = transduce(q_df, compile_dictionary(dict_df, conf), conf)
    assert "distance" not in out.columns
    rows = out.collect()
    assert ("q1", dictionary[0]) in {(r.query_id, r.candidate) for r in rows}


def test_remove_terms_equals_recompile(spark):
    """Deleting terms from the COMPILED dictionary (anti-join, no key
    recompilation) must give transduce results identical to compiling a
    fresh dictionary from the surviving terms — the mutable-dictionary
    remove() parity behind the transduce_after_remove gate entry."""
    from pyspark.sql import functions as F

    from liblevenshtein_spark.config import LinkConfig
    from liblevenshtein_spark.operators.transduce import (
        compile_dictionary, transduce)

    conf = LinkConfig(algorithm="standard", max_distance=1,
                      blocking_scheme="deletions")
    terms = ["kitten", "sitten", "sitting", "mitten", "mutton", "bitten"]
    d = spark.createDataFrame([(t,) for t in terms], ["term"])
    removed = {"sitten", "mitten"}
    survivors = d.filter(~F.col("term").isin(list(removed)))

    mutated = compile_dictionary(d, conf).join(
        spark.createDataFrame([(t,) for t in removed], ["candidate"]),
        "candidate", "left_anti")
    fresh = compile_dictionary(survivors, conf)

    queries = spark.createDataFrame(
        [("q1", "kitten"), ("q2", "mittens"), ("q3", "button")],
        ["query_id", "term"])
    got = {tuple(r) for r in transduce(queries, mutated, conf).collect()}
    want = {tuple(r) for r in transduce(queries, fresh, conf).collect()}
    assert got == want and got
    assert all(c not in removed for (_, _, c, _) in got)


@pytest.mark.parametrize("algorithm", ALGOS)
def test_add_terms_equals_recompile(spark, algorithm):
    """Appending terms to the COMPILED dictionary (add_terms: anti-join +
    compile only the unseen batch members) must yield an index IDENTICAL to
    compiling the union fresh — including when the batch re-adds terms the
    index already holds (re-add is a no-op). The mutable-dictionary add()
    parity behind the transduce_after_add gate entry, symmetric twin of
    test_remove_terms_equals_recompile."""
    from liblevenshtein_spark.operators.transduce import add_terms

    conf = LinkConfig(algorithm=algorithm, max_distance=1,
                      blocking_scheme="deletions")
    base = ["kitten", "sitten", "sitting", "mitten"]
    batch = ["mutton", "bitten", "kitten", "sitten"]  # 2 new, 2 re-adds
    base_df = spark.createDataFrame([(t,) for t in base], ["term"])
    batch_df = spark.createDataFrame([(t,) for t in batch], ["term"])
    union_df = spark.createDataFrame(
        [(t,) for t in sorted(set(base) | set(batch))], ["term"])

    appended = add_terms(compile_dictionary(base_df, conf), batch_df, conf)
    fresh = compile_dictionary(union_df, conf)

    # index-level equality, stronger than query-result parity: no stale,
    # lost, or duplicated (candidate, block_key) row anywhere
    got_idx = sorted(tuple(r) for r in appended.collect())
    want_idx = sorted(tuple(r) for r in fresh.collect())
    assert got_idx == want_idx and got_idx

    queries = spark.createDataFrame(
        [("q1", "kitten"), ("q2", "mutton"), ("q3", "bitte")],
        ["query_id", "term"])
    got = {tuple(r) for r in transduce(queries, appended, conf).collect()}
    want = {tuple(r) for r in transduce(queries, fresh, conf).collect()}
    assert got == want and got
    assert any(c == "mutton" for (_, _, c, _) in got)  # added term reachable
