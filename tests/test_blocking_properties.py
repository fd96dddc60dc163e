"""Property-based completeness of the multi-match-aware probe window
(functions/blocking.py::probe_keys): for ANY pair within distance n, some
exact segment of one string must occur in the other inside the PassJoin
window d ∈ [max(-i, Δ-(k-1-i), -n), min(i, Δ+(k-1-i), n)] — the pure-math
invariant behind the Spark recall gates in test_blocking.py, checked here
against randomized edit sequences without a SparkSession (hundreds of
cases per run via hypothesis).

The mirror below replicates segment_keys/probe_keys' arithmetic exactly
(floor boundaries, empty segments, bounds filters); drift between the two
is caught by the Spark-side gates."""

from __future__ import annotations

import random

from hypothesis import given, settings, strategies as st

from liblevenshtein_spark.kernels.oracles import distance as oracle_distance


def _segment(r: str, k: int, i: int) -> tuple[int, str]:
    L = len(r)
    lo, hi = (i * L) // k, ((i + 1) * L) // k
    return lo, r[lo:hi]


def _window_match(r: str, s: str, k: int, n: int) -> bool:
    """True iff some exact segment of r occurs in s within the
    multi-match-aware shift window (the condition under which the engine's
    build(segments of r) ∩ probe(substrings of s) join emits the pair)."""
    delta = len(s) - len(r)
    if abs(delta) > n:
        return False
    for i in range(k):
        p, seg = _segment(r, k, i)
        lo_d = max(-i, delta - (k - 1 - i), -n)
        hi_d = min(i, delta + (k - 1 - i), n)
        for d in range(lo_d, hi_d + 1):
            start = p + d
            if 0 <= start and start + len(seg) <= len(s):
                if s[start:start + len(seg)] == seg:
                    return True
    return False


def _blocked(a: str, b: str, k: int, n: int) -> bool:
    # the engine generates build AND probe keys for every entity, so a pair
    # is found if either direction's segments match in-window
    return _window_match(a, b, k, n) or _window_match(b, a, k, n)


@st.composite
def edited_pair(draw):
    n = draw(st.integers(min_value=1, max_value=3))
    base = draw(st.text(alphabet="abcd", min_size=1, max_size=30))
    seed = draw(st.integers(min_value=0, max_value=2**31))
    rng = random.Random(seed)
    s = base
    for _ in range(draw(st.integers(min_value=0, max_value=n))):
        if not s:
            s = rng.choice("abcd")
            continue
        p = rng.randrange(len(s))
        op = rng.choice(["del", "ins", "sub"])
        if op == "del":
            s = s[:p] + s[p + 1:]
        elif op == "ins":
            s = s[:p] + rng.choice("wxyz") + s[p:]
        else:
            s = s[:p] + rng.choice("wxyz") + s[p + 1:]
    return base, s, n


@settings(max_examples=400, deadline=None)
@given(edited_pair())
def test_window_complete_for_within_n_pairs(pair):
    a, b, n = pair
    if oracle_distance(a, b, "standard") <= n and a and b:
        assert _blocked(a, b, n + 1, n), (a, b, n)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="ab", min_size=1, max_size=12),
       st.text(alphabet="ab", min_size=1, max_size=12),
       st.integers(min_value=1, max_value=2))
def test_window_complete_dense_alphabet(a, b, n):
    """Dense 2-letter strings: every pair of similar lengths is close to
    every other — the adversarial regime for window off-by-ones."""
    if oracle_distance(a, b, "standard") <= n:
        assert _blocked(a, b, n + 1, n), (a, b, n)
