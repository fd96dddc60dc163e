"""Tests for operators/canopy.py: the deterministic parallel canopy rules
are replayed by an independent pure-Python replica over randomized corpora,
and the structural invariants (identical-sig co-bucketing, canonical pair
order) are asserted directly."""

from __future__ import annotations

import hashlib
import itertools

import pytest

from liblevenshtein_spark.operators.canopy import (
    canopy_members, canopy_pairs, sig_grams,
)


def _hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _grams(sig: str, q: int = 3) -> frozenset[str]:
    if len(sig) < q:
        return frozenset([sig])
    return frozenset(sig[i:i + q] for i in range(len(sig) - q + 1))


def _round4(x: float) -> float:
    return round(x + 1e-9, 4)


def _replica_pairs(ents: dict[str, str], center_mod: int, t1: float,
                   t2: float, df_cap: int) -> set[tuple[str, str]]:
    """Pure-Python replay of canopy_members + canopy_pairs."""
    grams = {e: _grams(s) for e, s in ents.items()}
    df: dict[str, int] = {}
    for gs in grams.values():
        for g in gs:
            df[g] = df.get(g, 0) + 1
    purged = {e: {g for g in gs if df[g] <= df_cap} for e, gs in grams.items()}

    def jac(a: str, b: str) -> float:
        inter = len(grams[a] & grams[b])
        return _round4(inter / (len(grams[a]) + len(grams[b]) - inter))

    centers0 = sorted(e for e in ents if _hash60(e) % center_mod == 0)
    demoted = set()
    for a, b in itertools.combinations(centers0, 2):
        a, b = min(a, b), max(a, b)
        if purged[a] & purged[b] and jac(a, b) >= t2:
            demoted.add(b)
    centers = [c for c in centers0 if c not in demoted]

    members: set[tuple[str, str]] = {(c, c) for c in centers}
    assigned: set[str] = set(centers)
    for e in ents:
        cands = [c for c in centers
                 if c != e and purged[e] & purged[c] and jac(e, c) >= t1]
        if not cands:
            continue
        assigned.add(e)
        best = min(cands, key=lambda c: (-jac(e, c), c))
        if jac(e, best) >= t2:
            members.add((e, best))
        else:
            members.update((e, c) for c in cands)
    for e in ents:
        if e not in assigned:
            members.add((e, "r|" + ents[e]))

    by_canopy: dict[str, list[str]] = {}
    for e, c in members:
        by_canopy.setdefault(c, []).append(e)
    pairs = set()
    for group in by_canopy.values():
        for a, b in itertools.combinations(sorted(group), 2):
            pairs.add((a, b))
    return pairs


def _spark_pairs(spark, ents: dict[str, str], center_mod=4, t1=0.35,
                 t2=0.75, df_cap=64) -> set[tuple[str, str]]:
    df = spark.createDataFrame(
        [(e, s) for e, s in ents.items()], "conv_id string, sig string"
    )
    m = canopy_members(df, "conv_id", "sig", center_mod, t1, t2, 3, df_cap)
    return {(r.id_a, r.id_b) for r in canopy_pairs(m).collect()}


def _rand_corpus(seed: int, n: int) -> dict[str, str]:
    """Deterministic corpus with planted duplicate families and shared
    prefixes so all three membership rules (lock, loose, residual) fire."""
    bases = ["abcdefghijklmnop", "abcdefgh12345678", "zyxwvutsrqponmlk",
             "hello world sig!", "hello world sag!", "qq"]
    ents = {}
    for i in range(n):
        b = bases[(i * 7 + seed) % len(bases)]
        mut = (i * 13 + seed * 5) % 4
        sig = b if mut == 0 else b[:-(mut)] + "XYZ"[:mut]
        ents[f"e{i:03d}"] = sig
    # exact twins for the co-bucketing invariant
    ents["twin_a"] = bases[seed % len(bases)]
    ents["twin_b"] = bases[seed % len(bases)]
    return ents


@pytest.mark.parametrize("seed,n", [(0, 40), (1, 60), (2, 25)])
def test_canopy_matches_python_replica(spark, seed, n):
    ents = _rand_corpus(seed, n)
    got = _spark_pairs(spark, ents)
    want = _replica_pairs(ents, 4, 0.35, 0.75, 64)
    assert got == want


def test_identical_sigs_always_share_a_canopy(spark):
    """Exact twins co-bucket under every role combination: both residual,
    both non-center-assigned, one a center, both centers (T2 contraction)."""
    ents = _rand_corpus(3, 50)
    # a clique of four identical sigs: the hash rule will scatter
    # center/non-center roles across them
    for k in range(4):
        ents[f"clone{k}"] = "abcdefghijklmnop"
    pairs = _spark_pairs(spark, ents)
    clones = sorted(f"clone{k}" for k in range(4)) + [
        e for e, s in ents.items() if s == "abcdefghijklmnop" and not e.startswith("clone")
    ]
    for a, b in itertools.combinations(sorted(clones), 2):
        assert (a, b) in pairs, f"identical-sig pair {(a, b)} missing"


def test_pairs_canonical_and_distinct(spark):
    ents = _rand_corpus(1, 30)
    df = spark.createDataFrame(
        [(e, s) for e, s in ents.items()], "conv_id string, sig string"
    )
    rows = canopy_pairs(canopy_members(df)).collect()
    seen = set()
    for r in rows:
        assert r.id_a < r.id_b
        assert (r.id_a, r.id_b) not in seen
        seen.add((r.id_a, r.id_b))


def test_short_sig_single_gram(spark):
    df = spark.createDataFrame([("a", "xy"), ("b", "xyz")],
                               "conv_id string, sig string")
    got = {(r.conv_id, r.gram) for r in sig_grams(df).collect()}
    assert got == {("a", "xy"), ("b", "xyz")}
