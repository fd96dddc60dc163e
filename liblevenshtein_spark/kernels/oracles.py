"""Pure-Python reference oracles for the three liblevenshtein distance variants.

These mirror the reference's own test-oracle pattern: naive recursive
distance functions with symmetric memoization, used as ground truth for the
vectorized production kernels (reference: universal-automata/liblevenshtein
README.md:18-21 names the plain/Damerau duality; README.md:40-46 cites
Schulz & Mihov 2002, which defines the standard, transposition and
merge-and-split variants; the Java subproject exposes them as
MemoizedStandard / MemoizedTransposition / MemoizedMergeAndSplit).

They are deliberately slow and simple — correctness anchors only, never used
in the Spark pipeline itself.
"""

from __future__ import annotations

from functools import lru_cache

__all__ = [
    "ALGORITHMS",
    "distance",
    "standard",
    "transposition",
    "merge_and_split",
]

ALGORITHMS = ("standard", "transposition", "merge_and_split")


@lru_cache(maxsize=1_000_000)
def _standard(v: str, w: str) -> int:
    if not v:
        return len(w)
    if not w:
        return len(v)
    if v[0] == w[0]:
        return _standard(v[1:], w[1:])
    return 1 + min(
        _standard(v[1:], w),  # delete from v
        _standard(v, w[1:]),  # insert into v
        _standard(v[1:], w[1:]),  # substitute
    )


@lru_cache(maxsize=1_000_000)
def _transposition(v: str, w: str) -> int:
    """Restricted-Damerau (Schulz–Mihov transposition) distance.

    A transposed pair may not take part in further edits; on the trap pair
    ("ca", "abc") this yields 3, not the unrestricted-Damerau 2.
    """
    if not v:
        return len(w)
    if not w:
        return len(v)
    if v[0] == w[0]:
        return _transposition(v[1:], w[1:])
    best = min(
        _transposition(v[1:], w),
        _transposition(v, w[1:]),
        _transposition(v[1:], w[1:]),
    )
    if len(v) > 1 and len(w) > 1 and v[0] == w[1] and v[1] == w[0]:
        best = min(best, _transposition(v[2:], w[2:]))
    return 1 + best


@lru_cache(maxsize=1_000_000)
def _merge_and_split(v: str, w: str) -> int:
    """Levenshtein extended with merge (two chars -> one, cost 1) and
    split (one char -> two, cost 1)."""
    if not v:
        return len(w)
    if not w:
        return len(v)
    if v[0] == w[0]:
        return _merge_and_split(v[1:], w[1:])
    best = min(
        _merge_and_split(v[1:], w),
        _merge_and_split(v, w[1:]),
        _merge_and_split(v[1:], w[1:]),
    )
    if len(w) > 1:  # split: v[0] becomes w[0]w[1]
        best = min(best, _merge_and_split(v[1:], w[2:]))
    if len(v) > 1:  # merge: v[0]v[1] becomes w[0]
        best = min(best, _merge_and_split(v[2:], w[1:]))
    return 1 + best


_FUNCS = {
    "standard": _standard,
    "transposition": _transposition,
    "merge_and_split": _merge_and_split,
}

standard = _standard
transposition = _transposition
merge_and_split = _merge_and_split


def distance(v: str, w: str, algorithm: str = "standard") -> int:
    """Exact distance between two strings under the named variant."""
    try:
        fn = _FUNCS[algorithm]
    except KeyError:
        raise ValueError(f"unknown algorithm {algorithm!r}; one of {ALGORITHMS}") from None
    return fn(v, w)


def transduce_brute_force(
    term: str, dictionary: list[str], n: int, algorithm: str = "standard"
) -> list[tuple[str, int]]:
    """Brute-force transduce: every dictionary term within n edits of
    `term`, with its exact distance — the reference's query semantics
    (reference README.md:13-15) as an O(|dict|) oracle."""
    fn = _FUNCS[algorithm]
    out = [(cand, fn(term, cand)) for cand in dictionary]
    return [(cand, d) for cand, d in out if d <= n]
