"""Vectorized banded edit-distance kernels (numpy, Arrow-batch friendly).

Re-expresses the Schulz–Mihov Levenshtein automaton's characteristic-vector
windowing (reference: universal-automata/liblevenshtein README.md:40-46) as a
banded dynamic program: only the diagonal band of width 2n+1 is computed, so
cost is O(len * n) per pair instead of O(len^2). All three reference
algorithm variants (README.md:18-21; Java enum STANDARD / TRANSPOSITION /
MERGE_AND_SPLIT) are supported.

The batch entry point `batch_banded_distance` is vectorized ACROSS pairs:
the only Python-level loops are over DP rows (max string length) and the
2n+1 band columns — never over rows of the batch. This is the kernel behind
the pipeline's pandas UDF (SURVEY.md §2.4 P5).

Distances greater than `n` are reported as the sentinel `n + 1`, matching
the reference's max-distance early termination (automaton positions with
e > n are never created).
"""

from __future__ import annotations

import numpy as np

__all__ = ["batch_banded_distance", "banded_distance", "SENTINEL_OFFSET"]

SENTINEL_OFFSET = 1  # reported value for d > n is n + SENTINEL_OFFSET


def _encode(strings, max_len: int) -> np.ndarray:
    """Pad/encode a list of strings to a (batch, max_len) uint32 codepoint
    matrix. Comparison semantics are Python code points (SURVEY.md §7.3
    documents the benign UTF-16 delta vs the Java reference)."""
    out = np.zeros((len(strings), max_len), dtype=np.uint32)
    for i, s in enumerate(strings):  # encode loop only; DP never loops rows
        if s:
            out[i, : len(s)] = np.frombuffer(
                s.encode("utf-32-le"), dtype=np.uint32
            )
    return out


def batch_banded_distance(a_list, b_list, n: int, algorithm: str = "standard") -> np.ndarray:
    """Exact variant distance for each pair (a_list[i], b_list[i]) if it is
    <= n, else the sentinel n+1. Returns int32 array of len(a_list)."""
    if algorithm not in ("standard", "transposition", "merge_and_split"):
        raise ValueError(f"unknown algorithm {algorithm!r}")
    if n < 0:
        raise ValueError("max distance n must be >= 0")

    bsz = len(a_list)
    sentinel = np.int32(n + SENTINEL_OFFSET)
    if bsz == 0:
        return np.empty(0, dtype=np.int32)

    la = np.fromiter((len(s) for s in a_list), dtype=np.int64, count=bsz)
    lb = np.fromiter((len(s) for s in b_list), dtype=np.int64, count=bsz)
    res = np.full(bsz, sentinel, dtype=np.int32)

    # Length band predicate (reference B6: every unit-cost op, incl. merge /
    # split / transposition, changes the length difference by at most 1).
    feasible = np.abs(la - lb) <= n
    # Trivial rows: empty a.
    res[(la == 0) & feasible] = np.minimum(lb[(la == 0) & feasible], sentinel)
    active = feasible & (la > 0)
    if not active.any():
        return res

    idx = np.nonzero(active)[0]
    a_sub = [a_list[i] for i in idx]
    b_sub = [b_list[i] for i in idx]
    la_s, lb_s = la[idx], lb[idx]
    lamax = int(la_s.max())
    lbmax = int(lb_s.max()) if lb_s.size else 0

    A = _encode(a_sub, lamax)
    B = _encode(b_sub, max(lbmax, 1))
    m = len(idx)
    W = 2 * n + 1
    karr = np.arange(W)
    INF = np.int32(n + 1)  # values are clipped at n+1: anything above is sentinel

    is_tr = algorithm == "transposition"
    is_ms = algorithm == "merge_and_split"

    # Row 0: d[0][j] = j for j in [0, n]  -> offsets k = j + n in [n, 2n].
    prev = np.full((m, W), INF, dtype=np.int32)
    j0 = karr - n
    ok0 = (j0 >= 0) & (j0 <= lb_s[:, None])
    prev[:, :] = np.where(ok0, np.minimum(j0, INF), INF).astype(np.int32)
    prev2 = np.full((m, W), INF, dtype=np.int32)

    sub_res = np.full(m, sentinel, dtype=np.int32)
    # Pairs whose answer offset: k* = lb - la + n (within [0, 2n] by feasibility).
    kstar = (lb_s - la_s + n).astype(np.int64)
    # live: positions into the ORIGINAL sub-batch for the currently-active
    # pairs. Finished (i == la) and dead (row min > n: reference B6 — banded
    # row minima are non-decreasing in i) pairs are compacted away so each
    # DP row only touches still-active pairs: work is ~sum(effective la),
    # not batch_size * max(la).
    live = np.arange(m, dtype=np.int64)

    for i in range(1, lamax + 1):
        jv = i + karr - n  # (W,) target-column per band offset
        lb_l = lb_s[live]
        row_valid = (jv[None, :] >= 0) & (jv[None, :] <= lb_l[:, None])

        achar = A[live, i - 1][:, None]  # (ml,1)
        bj = np.clip(jv - 1, 0, B.shape[1] - 1)
        bchar = B[live[:, None], bj[None, :]]  # (ml,W) b char at j-1 (masked below)
        has_b = jv[None, :] >= 1

        diag = np.where(has_b, prev + (achar != bchar), INF)  # substitute / match
        ml = live.shape[0]
        dele = np.full((ml, W), INF, dtype=np.int32)
        dele[:, : W - 1] = prev[:, 1:] + 1  # delete from a: d[i-1][j]
        cur = np.minimum(diag, dele).astype(np.int32)

        if is_tr and i >= 2:
            # transpose: d[i-2][j-2] + 1 when a[i-1]==b[j-2] and a[i-2]==b[j-1]
            bj2 = np.clip(jv - 2, 0, B.shape[1] - 1)
            bchar2 = B[live[:, None], bj2[None, :]]
            cond = (jv[None, :] >= 2) & (achar == bchar2) & (A[live, i - 2][:, None] == bchar)
            tr = np.where(cond, prev2 + 1, INF)
            cur = np.minimum(cur, tr)
        if is_ms:
            if i >= 2:
                # merge: a[i-2:i] -> b[j-1]; d[i-2][j-1] + 1 at offset k+1 of row i-2
                mg = np.full((ml, W), INF, dtype=np.int32)
                mg[:, : W - 1] = prev2[:, 1:] + 1
                cur = np.minimum(cur, np.where(has_b, mg, INF))
            # split: a[i-1] -> b[j-2:j]; d[i-1][j-2] + 1 at offset k-1 of row i-1
            sp = np.full((ml, W), INF, dtype=np.int32)
            sp[:, 1:] = prev[:, : W - 1] + 1
            cur = np.minimum(cur, np.where(jv[None, :] >= 2, sp, INF))

        cur = np.where(row_valid, cur, INF).astype(np.int32)
        # insert into a: d[i][j-1] + 1 — prefix pass along the band (W steps)
        for k in range(1, W):
            cur[:, k] = np.minimum(cur[:, k], cur[:, k - 1] + 1)
        cur = np.where(row_valid, np.minimum(cur, INF), INF).astype(np.int32)

        finish = la_s[live] == i
        if finish.any():
            fidx = live[finish]
            sub_res[fidx] = cur[finish, kstar[fidx]]

        keep = ~finish & (cur.min(axis=1) <= n)
        if not keep.any():
            break
        if not keep.all():
            live = live[keep]
            cur = cur[keep]
            prev = prev[keep]
        prev2, prev = prev, cur

    res[idx] = np.minimum(sub_res, sentinel)
    return res


def banded_distance(a: str, b: str, n: int, algorithm: str = "standard") -> int:
    """Scalar convenience wrapper (tests/debug)."""
    return int(batch_banded_distance([a], [b], n, algorithm)[0])
