"""Dynamic-time-warping kernels (pure NumPy, deterministic).

DTW is the classic elastic similarity measure for time series — the
reference's distance-based detectors (KShape's SBD, the matrix-profile
z-norm Euclidean) are rigid alignments; DTW allows local time
stretching, the standard tool for "same shape, different pacing"
retrieval (Sakoe & Chiba 1978; UCR Suite, Rakthanmanon et al. 2012).

The engine's scale pipeline (pipelines/similarity.py:series_dtw_topk)
never calls these kernels on the full corpus: candidates are pruned
relationally with the LB_Keogh lower bound first, and only the
survivors reach the Arrow stage that runs :func:`dtw_banded`.

Everything here is sequential/vectorized NumPy with a fixed float64
summation order — bit-reproducible across partitionings.
"""

from __future__ import annotations

import numpy as np


def paa_znorm(x: np.ndarray, paa: int) -> np.ndarray:
    """PAA to ``paa`` segments (linspace boundaries, the reference's
    PiecewiseAggregateApproximation rule) then z-normalize the reduced
    series. Segment means are exact rationals (integer token sums /
    segment length); the z-norm folds the ``paa`` floats in array order.
    Series shorter than ``paa`` keep one point per position (PAA is a
    no-op when n <= paa, matching the operator's CASE guard).
    Population std; a constant series maps to all-zeros."""
    x = np.asarray(x, dtype=np.float64)
    n = x.shape[0]
    if n > paa:
        bounds = (np.arange(paa + 1, dtype=np.int64) * n) // paa
        sums = np.add.reduceat(x, bounds[:-1])
        seg = sums / (bounds[1:] - bounds[:-1])
    else:
        seg = x
    m = seg.sum() / seg.shape[0]
    var = (seg * seg).sum() / seg.shape[0] - m * m
    sd = np.sqrt(var) if var > 0 else 0.0
    return (seg - m) / sd if sd > 0 else np.zeros_like(seg)


def envelope(q: np.ndarray, band: int) -> tuple[np.ndarray, np.ndarray]:
    """Sakoe-Chiba envelope: U_i / L_i = max / min of q over
    [i - band, i + band] (LB_Keogh, Keogh & Ratanamahatana 2005)."""
    n = q.shape[0]
    idx = np.arange(n)
    lo = np.maximum(idx - band, 0)
    hi = np.minimum(idx + band + 1, n)
    u = np.empty(n)
    low = np.empty(n)
    for i in range(n):  # n is the PAA width (tiny), not series length
        u[i] = q[lo[i]:hi[i]].max()
        low[i] = q[lo[i]:hi[i]].min()
    return u, low


def lb_keogh(c: np.ndarray, u: np.ndarray, low: np.ndarray) -> float:
    """LB_Keogh(q, c) = sum of squared envelope violations — a lower
    bound on banded DTW(q, c) with the same band. Fixed left-to-right
    summation order (matches the SQL aggregate fold)."""
    viol = np.where(c > u, c - u, np.where(c < low, low - c, 0.0))
    return float(np.cumsum(viol * viol)[-1]) if viol.shape[0] else 0.0


def dtw_banded(a: np.ndarray, b: np.ndarray, band: int) -> float:
    """Exact DTW distance (sum of squared diffs along the optimal
    warping path) under a Sakoe-Chiba band of radius ``band``,
    anti-diagonal vectorized DP — no O(n*m) Python loop. Returns the
    SQUARED-cost total (monotone in the usual sqrt form; comparisons
    and LB_Keogh share the squared domain). Lengths may differ; the
    band is widened to at least |len(a) - len(b)| so a path exists."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    n, m = a.shape[0], b.shape[0]
    if n == 0 or m == 0:
        raise ValueError("DTW inputs must be non-empty")
    r = max(band, abs(n - m))
    inf = np.inf
    # D has a sentinel row/col 0; D[i, j] for i in 1..n, j in 1..m.
    # Anti-diagonal d holds cells with i + j = d; within the band only
    # j in [i - r, i + r] are live. We store full rows for simplicity —
    # n, m are PAA widths (~128), so the dense (n+1)x(m+1) float64
    # matrix is ~130 KB; the DP walks diagonals so each cell still
    # reads only finished neighbors.
    D = np.full((n + 1, m + 1), inf)
    D[0, 0] = 0.0
    ii = np.arange(1, n + 1)
    for d in range(2, n + m + 1):
        i = ii[(d - ii >= 1) & (d - ii <= m)]
        if i.size == 0:
            continue
        j = d - i
        live = np.abs(i - j) <= r
        i, j = i[live], j[live]
        if i.size == 0:
            continue
        cost = (a[i - 1] - b[j - 1]) ** 2
        best = np.minimum(np.minimum(D[i - 1, j], D[i, j - 1]), D[i - 1, j - 1])
        D[i, j] = cost + best
    out = D[n, m]
    if not np.isfinite(out):
        raise AssertionError("band left no feasible warping path")
    return float(out)


def dtw_full(a: np.ndarray, b: np.ndarray) -> float:
    """Unbanded reference DP (independent implementation used as the
    pytest oracle for :func:`dtw_banded` with a full-width band):
    plain row-by-row scalar recurrence."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    n, m = a.shape[0], b.shape[0]
    prev = [np.inf] * (m + 1)
    prev[0] = 0.0
    for i in range(1, n + 1):
        cur = [np.inf] * (m + 1)
        for j in range(1, m + 1):
            c = (a[i - 1] - b[j - 1]) ** 2
            cur[j] = c + min(prev[j], cur[j - 1], prev[j - 1])
        prev = cur
    return float(prev[m])
