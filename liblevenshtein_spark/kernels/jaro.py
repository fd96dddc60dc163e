"""Batch-vectorized Jaro-Winkler similarity kernel.

Record linkage's standard SHORT-string comparator (names, words, keys),
complementing the banded Levenshtein kernels for long fingerprints. Matches
DuckDB's `jaro_winkler_similarity` semantics exactly (probed empirically,
tests/test_jaro.py): either string empty -> 0.0; match window
max(la, lb)//2 - 1 clamped at 0; transpositions = half the mismatched
positions between the two matched-character sequences; Winkler boost
`j + l*0.1*(1-j)` with common prefix l <= 4 applied only when jaro > 0.7.

Vectorization shape: like kernels/banded.py, the batch is encoded into
(batch, maxlen) codepoint matrices and the only Python loop runs over
CHARACTER POSITIONS of the query side (maxlen iterations), each step a
vectorized O(batch x maxlen) masked scan — no per-pair Python. Work is
O(batch x la x lb), which is why this kernel is for short strings: the
Jaro window is inherently +-L/2, so there is no banded shortcut. Keep
long-fingerprint scoring on the banded Levenshtein path.
"""

from __future__ import annotations

import numpy as np

from .banded import _encode, _narrow

__all__ = ["batch_jaro_winkler"]


def batch_jaro_winkler(a_list, b_list) -> np.ndarray:
    """Jaro-Winkler similarity for each aligned pair -> float64 array."""
    bt = len(a_list)
    if bt == 0:
        return np.zeros(0, dtype=np.float64)
    la = np.fromiter((len(s) for s in a_list), count=bt, dtype=np.int64)
    lb = np.fromiter((len(s) for s in b_list), count=bt, dtype=np.int64)
    lam, lbm = int(max(la.max(), 1)), int(max(lb.max(), 1))
    A, B = _narrow(_encode(a_list, lam), _encode(b_list, lbm))[:2]

    w = np.maximum(np.maximum(la, lb) // 2 - 1, 0)
    jpos = np.arange(lbm, dtype=np.int64)[None, :]
    in_b = jpos < lb[:, None]
    a_matched = np.zeros((bt, lam), dtype=bool)
    b_matched = np.zeros((bt, lbm), dtype=bool)
    rows = np.arange(bt)
    for i in range(int(la.max(initial=0))):
        # greedy Jaro matching: smallest unmatched j with equal char inside
        # the window — argmax over a boolean mask returns the FIRST True
        mask = (
            (B == A[:, i : i + 1])
            & ~b_matched
            & in_b
            & (jpos >= (i - w)[:, None])
            & (jpos <= (i + w)[:, None])
            & (i < la)[:, None]
        )
        hit = mask.any(axis=1)
        j = mask.argmax(axis=1)
        b_matched[rows[hit], j[hit]] = True
        a_matched[hit, i] = True

    m = a_matched.sum(axis=1).astype(np.int64)
    # transpositions: compact each side's matched characters (stable argsort
    # floats matched positions to the front in order) and count mismatches
    k = min(lam, lbm)
    oa = np.argsort(~a_matched, axis=1, kind="stable")[:, :k]
    ob = np.argsort(~b_matched, axis=1, kind="stable")[:, :k]
    a_seq = np.take_along_axis(A, oa, axis=1)
    b_seq = np.take_along_axis(B, ob, axis=1)
    valid = np.arange(k, dtype=np.int64)[None, :] < m[:, None]
    # DuckDB (rapidfuzz lineage) FLOORS the half-count: t = mismatches // 2
    t = np.floor(((a_seq != b_seq) & valid).sum(axis=1) / 2.0)

    md = m.astype(np.float64)
    safe_la = np.maximum(la, 1).astype(np.float64)
    safe_lb = np.maximum(lb, 1).astype(np.float64)
    safe_m = np.maximum(md, 1.0)
    jaro = np.where(
        m > 0,
        (md / safe_la + md / safe_lb + (md - t) / safe_m) / 3.0,
        0.0,
    )

    # Winkler boost: common prefix up to 4 codepoints (zero padding never
    # counts — positions past either length are masked out)
    pk = min(4, k)
    ppos = np.arange(pk, dtype=np.int64)[None, :]
    peq = (
        (A[:, :pk] == B[:, :pk]) & (ppos < la[:, None]) & (ppos < lb[:, None])
    )
    prefix = np.cumprod(peq, axis=1).sum(axis=1).astype(np.float64)
    return np.where(jaro > 0.7, jaro + prefix * 0.1 * (1.0 - jaro), jaro)
