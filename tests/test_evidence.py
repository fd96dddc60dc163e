"""Auxiliary-evidence fusion (operators/evidence.py), greedy blocking-scheme
selection, and unsupervised Fellegi–Sunter EM (operators/metrics.py) —
hand-computed small-graph oracles."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from liblevenshtein_spark.operators.evidence import (
    relational_jaccard,
    time_decay_weights,
)
from liblevenshtein_spark.operators.metrics import fs_em, greedy_scheme_selection


def test_relational_jaccard_hand_computed(spark):
    pairs = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("c", "d")], "id_a string, id_b string"
    )
    profile = spark.createDataFrame(
        [("a", "t1"), ("a", "t2"), ("b", "t2"), ("b", "t3"),
         ("c", "t1"), ("c", "t2")],  # d has an empty profile
        "conv_id string, item string",
    )
    rows = {(r.id_a, r.id_b): r for r in relational_jaccard(pairs, profile).collect()}
    ab = rows[("a", "b")]
    assert (ab.n_common, ab.n_union) == (1, 3)          # {t2} / {t1,t2,t3}
    assert abs(ab.rel_jaccard_raw - 1 / 3) < 1e-12
    ac = rows[("a", "c")]
    assert (ac.n_common, ac.n_union) == (2, 2)          # identical profiles
    assert ac.rel_jaccard_raw == 1.0
    cd = rows[("c", "d")]                               # one side empty
    assert (cd.n_common, cd.n_union) == (0, 2)
    assert cd.rel_jaccard_raw == 0.0


def test_relational_jaccard_both_empty_union_zero(spark):
    pairs = spark.createDataFrame([("x", "y")], "id_a string, id_b string")
    profile = spark.createDataFrame([("z", "t1")], "conv_id string, item string")
    r = relational_jaccard(pairs, profile).collect()[0]
    assert (r.n_common, r.n_union, r.rel_jaccard_raw) == (0, 0, 0.0)


def test_time_decay_weights(spark):
    pairs = spark.createDataFrame([("a", "b"), ("a", "c")], "id_a string, id_b string")
    ts = spark.createDataFrame(
        [("a", 10), ("b", 40), ("c", 10)], "conv_id string, day int"
    )
    rows = {(r.id_a, r.id_b): r for r in
            time_decay_weights(pairs, ts, tau=30.0, ts_col="day").collect()}
    assert rows[("a", "b")].delta_ts == 30
    assert abs(rows[("a", "b")].decay_w_raw - 0.5) < 1e-12   # 1/(1+30/30)
    assert rows[("a", "c")].delta_ts == 0
    assert rows[("a", "c")].decay_w_raw == 1.0


def test_greedy_scheme_selection_attribution_and_curve(spark):
    # truth pairs: p1, p2, p3; scheme 1 covers p1+p2 (recall 2/3),
    # scheme 2 covers p2+p3 (recall 2/3, tie -> scheme 1 first by name),
    # scheme 3 covers nothing and proposes 2 junk pairs
    sp = spark.createDataFrame(
        [("a", "b", 1), ("c", "d", 1),
         ("c", "d", 2), ("e", "f", 2),
         ("x", "y", 3), ("x", "z", 3)],
        "id_a string, id_b string, scheme int",
    )
    truth = spark.createDataFrame(
        [("a", "b"), ("c", "d"), ("e", "f")], "id_a string, id_b string"
    )
    rows = {r.scheme: r for r in greedy_scheme_selection(sp, truth).collect()}
    assert rows[1].pick_order == 1 and rows[2].pick_order == 2
    assert rows[1].marginal_caught == 2                 # p1, p2 attributed first
    assert rows[2].marginal_caught == 1                 # only p3 is new
    assert rows[3].marginal_caught == 0
    assert rows[2].cum_caught == 3 and abs(rows[2].cum_recall - 1.0) < 1e-9
    assert rows[3].cum_cost == 6                        # 2 + 2 + 2 candidates
    assert rows[3].cum_recall == 1.0


def test_fs_em_recovers_planted_mixture(spark):
    # two latent classes: matches agree on both fields w.p. ~1,
    # non-matches agree w.p. ~0 — EM must find lambda ~ 1/3, m ~ 1, u ~ 0
    rows = [(1, 1)] * 100 + [(0, 0)] * 200
    g = spark.createDataFrame(rows, "f1 long, f2 long")
    out = {r.field: r for r in fs_em(g, ["f1", "f2"], iters=50).collect()}
    assert abs(out["_lambda"].m_prob - 1 / 3) < 0.01
    assert out["f1"].m_prob > 0.99 and out["f1"].u_prob < 0.01
    assert out["f2"].m_prob > 0.99 and out["f2"].u_prob < 0.01
    assert out["f1"].w_agree > 10  # log2(m/u) with u clamped at 1e-6


def test_fs_em_matches_pure_python_reference(spark):
    # bit-level determinism: the operator must equal an independent
    # plain-Python EM over the same histogram (same init/clamps/order)
    rows = [(1, 1)] * 7 + [(1, 0)] * 3 + [(0, 1)] * 2 + [(0, 0)] * 11
    g = spark.createDataFrame(rows, "f1 long, f2 long")
    out = {r.field: r for r in fs_em(g, ["f1", "f2"], iters=25).collect()}

    patterns = sorted(
        [( [1.0, 1.0], 7.0), ([1.0, 0.0], 3.0), ([0.0, 1.0], 2.0), ([0.0, 0.0], 11.0)],
        key=lambda p: p[0],
    )
    lam, m, u = 0.5, [0.9, 0.9], [0.1, 0.1]
    clamp = lambda x: min(max(x, 0.000001), 0.999999)  # noqa: E731
    for _ in range(25):
        s = t = w = 0.0
        a = [0.0, 0.0]
        b = [0.0, 0.0]
        for gv, n in patterns:
            pm, pu = lam, 1.0 - lam
            for j in range(2):
                pm *= m[j] if gv[j] else 1.0 - m[j]
                pu *= u[j] if gv[j] else 1.0 - u[j]
            r = pm / (pm + pu)
            s += n * r
            w += n * (1.0 - r)
            t += n
            for j in range(2):
                a[j] += n * r * gv[j]
                b[j] += n * (1.0 - r) * gv[j]
        lam = clamp(s / t)
        m = [clamp(a[j] / s) for j in range(2)]
        u = [clamp(b[j] / w) for j in range(2)]

    assert out["_lambda"].m_prob == round(lam + 1e-9, 4)
    for j, f in enumerate(["f1", "f2"]):
        assert out[f].m_prob == round(m[j] + 1e-9, 4)
        assert out[f].u_prob == round(u[j] + 1e-9, 4)
        assert out[f].w_agree == round(math.log2(m[j] / u[j]) + 1e-9, 4)
