"""Preprocessing kernels (vectorized NumPy).

Semantics match the reference transforms under
``/root/reference/dtaianomaly/preprocessing/`` (citations inline); code is
new. Each kernel is a pure function over a 1-D or 2-D array — the same
function backs the pytest oracle and the Arrow UDF the Spark operator runs.

NumPy float quirks preserved on purpose:
* population std (ddof=0), nan-skipping stats (StandardScaler.py:50-58)
* exact linear-interpolation percentiles (RobustScaler.py:95-105)
* EMA accumulates as ``y_t = alpha * y_{t-1} + (1 - alpha) * x_t`` — note the
  reference's ``frompyfunc(lambda a, b: alpha*a + (1-alpha)*b).accumulate``
  puts the *accumulator* first (ExponentialMovingAverage.py:39-47).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def _as2d(X: np.ndarray) -> Tuple[np.ndarray, bool]:
    X = np.asarray(X, dtype=np.float64)
    if X.ndim == 1:
        return X[:, None], True
    return X, False


# ---------------------------------------------------------------- scalers

def minmax_fit(X: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-attribute nanmin/nanmax; constant attributes mapped to (0, 1).
    (MinMaxScaler.py:41-55)"""
    X2, _ = _as2d(X)
    mn = np.nanmin(X2, axis=0)
    mx = np.nanmax(X2, axis=0)
    const = mn == mx
    return np.where(const, 0.0, mn), np.where(const, 1.0, mx)


def minmax_transform(X: np.ndarray, mn: np.ndarray, mx: np.ndarray) -> np.ndarray:
    X2, squeeze = _as2d(X)
    out = (X2 - mn) / (mx - mn)
    return out[:, 0] if squeeze else out


def standard_fit(X: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-attribute nanmean / population nanstd. (StandardScaler.py:50-58)"""
    X2, _ = _as2d(X)
    return np.nanmean(X2, axis=0), np.nanstd(X2, axis=0)


def standard_transform(
    X: np.ndarray, mean: np.ndarray, std: np.ndarray, min_std: float = 1e-9
) -> np.ndarray:
    """Z-normalize; attributes with std < min_std pass through unchanged
    (all-constant input passes through entirely). (StandardScaler.py:68-87)"""
    X2, squeeze = _as2d(X)
    if np.all(std < min_std):
        out = X2.copy()
    else:
        out = (X2 - mean) / std
        low = std < min_std
        out[:, low] = X2[:, low]
    return out[:, 0] if squeeze else out


def robust_fit(
    X: np.ndarray, quantile_range: Tuple[float, float] = (25.0, 75.0)
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-attribute nanmedian center + exact linear-interp quantile-range
    scale. (RobustScaler.py:92-110)"""
    X2, _ = _as2d(X)
    lo, hi = quantile_range
    center = np.nanmedian(X2, axis=0)
    q = np.nanpercentile(X2, [lo, hi], axis=0)
    return center, q[1] - q[0]


def robust_transform(X: np.ndarray, center: np.ndarray, scale: np.ndarray) -> np.ndarray:
    """(x - center) / scale; NaN results (zero IQR) fall back to raw x.
    (RobustScaler.py:112-121)"""
    X2, squeeze = _as2d(X)
    with np.errstate(invalid="ignore", divide="ignore"):
        out = (X2 - center) / scale
    out = np.where(np.isfinite(out), out, X2)
    return out[:, 0] if squeeze else out


# ------------------------------------------------------- smoothing & diffs

def moving_average(X: np.ndarray, window_size: int) -> np.ndarray:
    """Centered moving mean: pad w//2 NaNs front, w//2 - (w even) back,
    nanmean each window (edges average fewer samples).
    (MovingAverage.py:38-60)"""
    X2, squeeze = _as2d(X)
    w = window_size
    front, back = w // 2, w // 2 - (w % 2 == 0)
    pad = np.full((front + back, X2.shape[1]), np.nan)
    ext = np.concatenate([pad[:front], X2, pad[front:]], axis=0)
    wins = np.lib.stride_tricks.sliding_window_view(ext, w, axis=0)
    out = np.nanmean(wins, axis=-1)
    return out[:, 0] if squeeze else out


def exponential_moving_average(X: np.ndarray, alpha: float) -> np.ndarray:
    """y_0 = x_0; y_t = alpha * y_{t-1} + (1 - alpha) * x_t.

    Vectorized as a log2(n)-pass prefix composition of affine maps
    (associative scan) instead of the reference's per-element Python ufunc;
    agrees with the sequential recursion to ~1e-12 (exact for exact inputs of
    moderate length).
    """
    X2, squeeze = _as2d(X)
    n = X2.shape[0]
    # y_t = m_t * y_{t-1} + b_t  with (m, b) = (alpha, (1-alpha) x_t), t >= 1
    m = np.full((n, 1), alpha)
    b = (1 - alpha) * X2
    m[0] = 0.0
    b[0] = X2[0]
    # prefix-compose: (m2,b2) . (m1,b1) = (m1*m2, m2*b1 + b2)
    k = 1
    while k < n:
        m_prev, b_prev = m[:-k].copy(), b[:-k].copy()
        b[k:] = m[k:] * b_prev + b[k:]
        m[k:] = m[k:] * m_prev
        k <<= 1
    return b[:, 0] if squeeze else b


def differencing(X: np.ndarray, order: int, window_size: int = 1) -> np.ndarray:
    """Seasonal differencing applied ``order`` times; the first
    ``window_size`` outputs of each pass are 0 via the self-prepend trick.
    (Differencing.py:50-57)"""
    X2, squeeze = _as2d(X)
    out = X2
    m = window_size
    for _ in range(order):
        ext = np.concatenate([out[:m], out], axis=0)
        out = ext[m:] - ext[:-m]
    return out[:, 0] if squeeze else out


# ------------------------------------------------------------ resampling

def undersample_rate(X: np.ndarray, sampling_rate: int) -> np.ndarray:
    """Every k-th sample; error if k >= n. (UnderSampler.py:33-42)"""
    X = np.asarray(X)
    if sampling_rate >= X.shape[0]:
        raise ValueError(
            f"Sampling rate {sampling_rate} too large for series of shape {X.shape}"
        )
    return X[::sampling_rate]


def undersample_indices(n: int, nb_samples: int) -> np.ndarray:
    """linspace(0, n-1, m) integer indices; identity if m >= n.
    (UnderSampler.py:70-78)"""
    if nb_samples >= n:
        return np.arange(n, dtype=np.int64)
    return np.linspace(0, n - 1, nb_samples, dtype=int, endpoint=True)


def paa_boundaries(n: int, n_frames: int) -> np.ndarray:
    """Frame boundaries ``linspace(0, n, n_frames+1, dtype=int)``.
    (PiecewiseAggregateApproximation.py:68-70)"""
    return np.linspace(0, n, n_frames + 1, dtype=int, endpoint=True)


def paa_frame_of_pos(pos: np.ndarray, n: int, n_frames: int) -> np.ndarray:
    """Frame id of each position under the linspace boundaries — the
    group-by key the Spark rollup uses. frame j covers [b_j, b_{j+1})."""
    bounds = paa_boundaries(n, n_frames)
    return np.searchsorted(bounds, np.asarray(pos), side="right") - 1


def paa(X: np.ndarray, n_frames: int) -> np.ndarray:
    """Per-frame means; identity if n <= n_frames handled by caller."""
    X2, squeeze = _as2d(X)
    bounds = paa_boundaries(X2.shape[0], n_frames)
    out = np.array(
        [np.mean(X2[s:e], axis=0) for s, e in zip(bounds[:-1], bounds[1:])]
    )
    return out[:, 0] if squeeze else out


def paa_transform(
    X: np.ndarray, y: Optional[np.ndarray], n_frames: int
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Full PAA preprocessor semantics incl. the no-op guard and the label
    rule ``paa(y) < 0.5 ? 0 : 1``. (PiecewiseAggregateApproximation.py:55-66)"""
    X = np.asarray(X)
    if X.shape[0] <= n_frames:
        return X, y
    Xp = paa(X, n_frames)
    if y is None:
        return Xp, None
    return Xp, np.where(paa(np.asarray(y, dtype=np.float64), n_frames) < 0.5, 0, 1)


def lttb_indices(values: np.ndarray, n_out: int) -> np.ndarray:
    """Largest-Triangle-Three-Buckets downsample (Steinarsson 2013,
    "Downsampling Time Series for Visual Representation") over a series
    sampled at x = 0..n-1: returns the SORTED positions of the n_out
    selected points. EXACT integer arithmetic throughout: with integer
    x and y the doubled triangle area against the next bucket's
    centroid (sx/c, sy/c) is compared SCALED by c —
    ``|(xa*c - sx)*(yb - ya) - (xa - xb)*(sy - c*ya)|`` — so there is
    no float anywhere and ties break to the earliest position (the
    canonical implementation's strict-> rule).

    Bucket edges are the canonical ``floor(i * (n-2) / (n_out-2))``
    (integer division here, bit-equal to the reference's float floor
    for any feasible n), covering positions 1..n-2; the first and last
    points are always kept. n <= n_out passes every point through."""
    v = np.asarray(values, dtype=np.int64)
    n = int(v.shape[0])
    if n_out < 3:
        raise ValueError(f"n_out must be >= 3, got {n_out}")
    if n <= n_out:
        return np.arange(n, dtype=np.int64)
    k = int(n_out)
    edges = 1 + (np.arange(k - 1, dtype=np.int64) * (n - 2)) // (k - 2)
    sel = np.empty(k, dtype=np.int64)
    sel[0] = 0
    sel[-1] = n - 1
    xa = 0
    for i in range(k - 2):
        lo, hi = int(edges[i]), int(edges[i + 1])
        if i + 1 < k - 2:
            nlo, nhi = int(edges[i + 1]), int(edges[i + 2])
            c = nhi - nlo
            sx = (nlo + nhi - 1) * c // 2  # sum of consecutive ints
            sy = int(v[nlo:nhi].sum())
        else:
            c, sx, sy = 1, n - 1, int(v[n - 1])
        ya = int(v[xa])
        xb = np.arange(lo, hi, dtype=np.int64)
        yb = v[lo:hi]
        area2 = np.abs((xa * c - sx) * (yb - ya) - (xa - xb) * (sy - c * ya))
        pick = lo + int(np.argmax(area2))  # argmax keeps the earliest tie
        sel[i + 1] = pick
        xa = pick
    return sel
