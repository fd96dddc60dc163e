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

Memory layout is chosen for multi-core cache behavior (32 concurrent
executor workers share one L3):

* DP state is band-major ``(W, m)`` uint8 — each band row is contiguous, and
  a cell only ever holds values in [0, n+2] (everything > n means "over
  budget"), so the whole working set is ~6 rows x m bytes instead of the
  int32 pair-major layout whose temporaries thrash the shared cache;
* the candidate string is kept as a padded TRANSPOSED codepoint matrix, so
  the per-DP-row character window ``b[j-1], j = i-n..i+n`` is a zero-copy
  contiguous slice (no per-row fancy gather);
* all per-row arithmetic runs in-place into preallocated buffers.

Early termination (reference B6: automaton positions with e > n are never
created) appears twice: banded row minima are non-decreasing, so pairs whose
band minimum exceeds n are finished; when the still-active fraction drops
below a hysteresis threshold the batch is compacted so each DP row touches
only live pairs. Distances greater than `n` are reported as the sentinel
`n + 1`.
"""

from __future__ import annotations

import numpy as np

__all__ = ["batch_banded_distance", "banded_distance", "SENTINEL_OFFSET"]

SENTINEL_OFFSET = 1  # reported value for d > n is n + SENTINEL_OFFSET

_MAX_N = 200  # uint8 cells hold values <= n+2 plus +1 headroom
_COMPACT_FRACTION = 0.6  # compact live set when it falls below this share


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
    if n > _MAX_N:
        raise ValueError(f"max distance n must be <= {_MAX_N}")

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
    la_s = la[idx].astype(np.int32)
    lb_s = lb[idx].astype(np.int32)
    lamax = int(la_s.max())
    lbmax = int(lb_s.max()) if lb_s.size else 0
    m = len(idx)
    W = 2 * n + 1
    INF = np.uint8(n + 1)     # anything > n means "over budget"
    CLAMP = np.uint8(n + 2)   # per-row clamp keeps +1 headroom in uint8

    is_tr = algorithm == "transposition"
    is_ms = algorithm == "merge_and_split"

    # Transposed layouts: AT[i-1] is the (m,) a-char column of DP row i;
    # BTp[i : i + W] is the zero-copy (W, m) window of b chars b[j-1] for
    # j = i-n .. i+n (pad = n+1 leading sentinel rows; out-of-range rows
    # read pad zeros and are masked by the bounds pass). Codepoints are
    # stored in the narrowest width that holds the batch's max codepoint
    # (uint8 for ASCII/Latin-1, uint16 for BMP) — char-matrix streaming is
    # the kernel's main memory traffic, and equality is width-agnostic.
    A32 = _encode(a_sub, lamax)
    B32 = _encode(b_sub, max(lbmax, 1))
    maxcp = max(int(A32.max(initial=0)), int(B32.max(initial=0)))
    cdt = np.uint8 if maxcp < 256 else (np.uint16 if maxcp < 65536 else np.uint32)
    AT = np.ascontiguousarray(A32.T.astype(cdt, copy=False))
    pad = n + 1
    BTp = np.zeros((lamax + W + 1, m), dtype=cdt)
    if lbmax:
        BTp[pad : pad + lbmax] = B32.T.astype(cdt, copy=False)
    del A32, B32

    # DP row 0: d[0][j] = j at band offset k = j + n (j in [0, n]).
    prev = np.full((W, m), INF, dtype=np.uint8)
    for k in range(n, W):
        j0 = k - n
        row = prev[k]
        row[:] = min(j0, int(INF))
        row[lb_s < j0] = INF
    prev2 = np.full((W, m), INF, dtype=np.uint8)
    cur = np.empty((W, m), dtype=np.uint8)

    # preallocated per-row scratch
    neq = np.empty((W, m), dtype=np.uint8)
    tmp = np.empty((W, m), dtype=np.uint8)
    c1 = np.empty((W, m), dtype=bool)
    c2 = np.empty((W, m), dtype=bool)
    trow = np.empty(m, dtype=np.uint8)

    sub_res = np.full(m, int(sentinel), dtype=np.int32)
    kstar = (lb_s - la_s + n).astype(np.int64)  # answer offset per pair
    live = np.arange(m, dtype=np.int64)  # positions into the sub-batch

    for i in range(1, lamax + 1):
        ml = live.shape[0]
        p, p2, c = prev[:, :ml], prev2[:, :ml], cur[:, :ml]
        nq, tm, tr_ = neq[:, :ml], tmp[:, :ml], trow[:ml]
        lb_l = lb_s[live]

        achar = AT[i - 1, :ml]
        bwin = BTp[i : i + W, :ml]  # contiguous view

        # substitute / match: cur = prev + (a[i-1] != b[j-1])
        np.not_equal(bwin, achar[None, :], out=c1[:, :ml])
        np.add(p, c1[:, :ml], out=c, casting="unsafe")
        # rows whose j = i+k-n has no b char at j-1 (j < 1): the diag just
        # written compared against pad zeros — kill it before the dele pass
        # writes the only legitimate contribution for those cells
        for k in range(W):
            if i + k - n < 1:
                c[k, :] = INF
        # delete from a: d[i-1][j] lives one band offset up
        if W > 1:
            np.add(p[1:], 1, out=tm[: W - 1], casting="unsafe")
            np.minimum(c[: W - 1], tm[: W - 1], out=c[: W - 1])

        if is_tr and i >= 2:
            # transpose: d[i-2][j-2] + 1 when a[i-1]==b[j-2], a[i-2]==b[j-1]
            aprev = AT[i - 2, :ml]
            bwin2 = BTp[i - 1 : i - 1 + W, :ml]
            np.equal(bwin2, achar[None, :], out=c1[:, :ml])
            np.equal(bwin, aprev[None, :], out=c2[:, :ml])
            np.logical_and(c1[:, :ml], c2[:, :ml], out=c1[:, :ml])
            np.add(p2, 1, out=tm, casting="unsafe")
            np.logical_not(c1[:, :ml], out=c2[:, :ml])
            tm[c2[:, :ml]] = 255
            for k in range(W):
                if i + k - n < 2:
                    tm[k, :] = 255
            np.minimum(c, tm, out=c)
        if is_ms:
            if i >= 2 and W > 1:
                # merge: a[i-2:i] -> b[j-1] (j >= 1); d[i-2][j] is one band
                # offset up in row i-2
                np.add(p2[1:], 1, out=tm[: W - 1], casting="unsafe")
                for k in range(W - 1):
                    if i + k - n < 1:
                        tm[k, :] = 255
                np.minimum(c[: W - 1], tm[: W - 1], out=c[: W - 1])
            if W > 1:
                # split: a[i-1] -> b[j-2:j] (j >= 2); d[i-1][j-2] one band
                # offset down in row i-1
                np.add(p[: W - 1], 1, out=tm[1:], casting="unsafe")
                for k in range(1, W):
                    if i + k - n < 2:
                        tm[k, :] = 255
                np.minimum(c[1:], tm[1:], out=c[1:])

        # insert into a: d[i][j-1] + 1 — prefix pass along the band
        for k in range(1, W):
            np.add(c[k - 1], 1, out=tr_, casting="unsafe")
            np.minimum(c[k], tr_, out=c[k])
        # bounds + clamp: kill cells outside [max(0, i-n), min(lb, i+n)]
        for k in range(W):
            jk = i + k - n
            if jk < 0:
                c[k, :] = INF
            else:
                c[k, lb_l < jk] = INF
        np.minimum(c, CLAMP, out=c)

        la_l = la_s[live]
        fin = la_l == i
        if fin.any():
            fpos = np.nonzero(fin)[0]
            sub_res[live[fpos]] = c[kstar[live[fpos]], fpos]

        rowmin = c.min(axis=0)
        keep = ~fin & (rowmin <= n)
        nkeep = int(keep.sum())
        if nkeep == 0:
            break
        if nkeep < ml * _COMPACT_FRACTION:
            # compact the live set so later DP rows touch only active pairs
            live = live[keep]
            AT = np.ascontiguousarray(AT[:, : ml][:, keep])
            BTp = np.ascontiguousarray(BTp[:, : ml][:, keep])
            nl = live.shape[0]
            cur[:, :nl] = c[:, keep]
            prev[:, :nl] = p[:, keep]
        # rotate buffers: cur -> prev -> prev2 -> (reused as next cur)
        prev, prev2, cur = cur, prev, prev2

    res[idx] = np.minimum(sub_res, sentinel)
    return res


def banded_distance(a: str, b: str, n: int, algorithm: str = "standard") -> int:
    """Scalar convenience wrapper (tests/debug)."""
    return int(batch_banded_distance([a], [b], n, algorithm)[0])
