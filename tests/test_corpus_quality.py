"""Corpus-quality operator tests: benchmark decontamination vs a
pure-Python n-gram-overlap oracle, repetition stats vs hand-computed
values, and containment pairs vs a pure-Python containment oracle."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from liblevenshtein_spark.operators import dedup
from liblevenshtein_spark.operators.corpus_quality import (
    contamination,
    repetition_stats,
)


TRAIN = [
    # doc 10 embeds an exact 5-gram from eval doc 100
    (10, "intro words then the secret benchmark answer sequence here plus tail"),
    (11, "no overlap with any benchmark document at all in this one"),
    (12, "short doc"),                       # < 5 tokens: zero shingles
    (13, "the secret benchmark answer sequence the secret benchmark answer sequence"),
]
EVAL = [
    (100, "question one the secret benchmark answer sequence question two"),
    (101, "unrelated eval material nothing shared"),
]


def _py_shingles(text, n):
    toks = [t for t in text.split() if t]
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def test_contamination_matches_python_oracle(spark):
    train = spark.createDataFrame(TRAIN, ["doc_id", "text"])
    evalset = spark.createDataFrame(EVAL, ["doc_id", "text"])
    got = {r.doc_id: r for r in contamination(train, evalset, n=5).collect()}

    ev_sh = set().union(*(_py_shingles(t, 5) for _, t in EVAL))
    assert set(got) == {d for d, _ in TRAIN}
    for doc_id, text in TRAIN:
        sh = _py_shingles(text, 5)
        hits = len(sh & ev_sh)
        r = got[doc_id]
        assert r.n_shingles == len(sh)
        assert r.n_contaminated == hits
        assert r.is_contaminated == (hits > 0)
        assert r.contamination == round(hits / max(len(sh), 1), 4)
    assert got[10].is_contaminated and not got[11].is_contaminated
    assert got[12].n_shingles == 0 and got[12].contamination == 0.0


def test_contamination_ignores_eval_only_docs(spark):
    train = spark.createDataFrame(TRAIN, ["doc_id", "text"])
    evalset = spark.createDataFrame(EVAL, ["doc_id", "text"])
    out = contamination(train, evalset, n=5)
    assert set(r.doc_id for r in out.collect()) == {10, 11, 12, 13}


def test_repetition_stats_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (0, "a a a a"),
            (1, "w x y z"),
            (2, "one"),
            (3, "go go stop go go"),
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in repetition_stats(docs).collect()}

    r0 = got[0]
    assert (r0.n_tokens, r0.n_distinct_tokens) == (4, 1)
    assert r0.dup_token_frac == 0.75
    assert r0.top_token_frac == 1.0
    assert r0.top_bigram_count == 3          # overlapping "a a" x3
    assert r0.top_bigram_frac == 1.5         # 2*3/4 (overlap double-counts)

    r1 = got[1]
    assert r1.dup_token_frac == 0.0
    assert r1.top_bigram_count == 1

    r2 = got[2]                              # single token: no bigrams
    assert (r2.n_tokens, r2.top_bigram_count, r2.top_bigram_frac) == (1, 0, 0.0)

    r3 = got[3]                              # "go go" occurs twice
    assert (r3.n_tokens, r3.n_distinct_tokens) == (5, 2)
    assert r3.top_token_frac == 0.8
    assert r3.top_bigram_count == 2


def test_containment_pairs_python_oracle(spark):
    docs = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),  # 0 ⊂ 1
        (2, "alpha beta gamma delta epsilon zeta"),                       # exact dup of 0
        (3, "totally unrelated content with no shared trigrams anywhere"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r.id_a, r.id_b): r.containment
        for r in dedup.containment_pairs(df, n=3, threshold=0.5).collect()
    }

    expected = {}
    for (ia, ta), (ib, tb) in itertools.combinations(docs, 2):
        sa, sb = _py_shingles(ta, 3), _py_shingles(tb, 3)
        if not sa or not sb:
            continue
        c = len(sa & sb) / min(len(sa), len(sb))
        if c >= 0.5:
            expected[(ia, ib)] = round(c, 4)
    assert got == expected
    assert got[(0, 1)] == 1.0 and got[(0, 2)] == 1.0   # subset + exact dup
    assert (0, 3) not in got


def test_containment_df_cap_prunes_generation_not_values(spark):
    # a boilerplate shingle shared by every doc; cap=2 demotes it from pair
    # generation, but docs still pairing via rarer shingles keep EXACT
    # containment (boilerplate still counted in the intersection)
    docs = [
        (0, "common shingle here rare pair one"),
        (1, "common shingle here rare pair two"),
        (2, "common shingle here unrelated suffix words"),
        (3, "common shingle here other totally different"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    capped = {
        (r.id_a, r.id_b): r.containment
        for r in dedup.containment_pairs(df, n=3, threshold=0.1, df_cap=2).collect()
    }
    # 0-1 share "here rare pair" (df=2, survives the cap) -> still paired,
    # and its containment counts the boilerplate 3-grams too
    sa, sb = _py_shingles(docs[0][1], 3), _py_shingles(docs[1][1], 3)
    assert capped[(0, 1)] == round(len(sa & sb) / min(len(sa), len(sb)), 4)
    # 2-3 share ONLY capped boilerplate -> pruned
    assert (2, 3) not in capped
