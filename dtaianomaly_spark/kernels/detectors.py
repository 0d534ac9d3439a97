"""Anomaly-detector kernels (pure NumPy).

The reference's detector kernels delegate to stumpy / sklearn / pyod /
scipy, none of which exist in this environment — so the algorithms are
implemented here from their public definitions:

* ``median_method_scores`` — exact semantics of
  ``anomaly_detection/MedianMethod.py:82-107`` (nan-padded neighborhood,
  nanmean / population nanstd, nan_to_num).
* ``matrix_profile`` — STOMP (Zhu et al., ICDM 2016): z-normalized
  Euclidean self-join / AB-join matrix profile, stumpy-compatible trivial
  exclusion zone ``ceil(w/4)`` (``MatrixProfileDetector.py:116-178``).
* ``kmeans_fit`` / ``kmeans_score`` — seeded k-means++ + Lloyd; score is the
  L2 distance to the assigned centroid (``KMeansAnomalyDetector.py:84-98``).
* ``iforest_fit`` / ``iforest_score`` — Isolation Forest (Liu et al., ICDM
  2008) with the standard 2^ceil(log2(psi)) depth cap and average-path-length
  normalization (``IsolationForest.py:7-58`` wraps pyod's equivalent).
* ``minmax_rescale`` — ``BaseDetector.predict_proba`` semantics
  (``BaseDetector.py:140-186``).
* ``exceed_confidence`` — ExCeeD (Perini et al. 2020) Bayesian confidence,
  with an in-house regularized-incomplete-beta for binom.cdf
  (``BaseDetector.py:188-287``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


# ------------------------------------------------------------ MedianMethod

def median_method_scores(
    x: np.ndarray,
    neighborhood_size_before: int,
    neighborhood_size_after: Optional[int] = None,
) -> np.ndarray:
    """|x_t - nanmean(nbhd)| / nanstd_pop(nbhd), nbhd = [t-b, t+a], NaN -> 0."""
    x = np.asarray(x, dtype=np.float64).reshape(-1)
    b = neighborhood_size_before
    a = b if neighborhood_size_after is None else neighborhood_size_after
    padded = np.concatenate([np.full(b, np.nan), x, np.full(a, np.nan)])
    wins = np.lib.stride_tricks.sliding_window_view(padded, b + a + 1)
    with np.errstate(invalid="ignore", divide="ignore"):
        scores = np.abs(x - np.nanmean(wins, axis=1)) / np.nanstd(wins, axis=1)
    return np.nan_to_num(scores, nan=0.0)


# ----------------------------------------------------------- MatrixProfile

def _sliding_mean_std(x: np.ndarray, w: int) -> Tuple[np.ndarray, np.ndarray]:
    csum = np.concatenate([[0.0], np.cumsum(x)])
    csq = np.concatenate([[0.0], np.cumsum(x * x)])
    cnt = float(w)
    mu = (csum[w:] - csum[:-w]) / cnt
    var = (csq[w:] - csq[:-w]) / cnt - mu * mu
    return mu, np.sqrt(np.maximum(var, 0.0))


def matrix_profile(
    x: np.ndarray, w: int, x_ref: Optional[np.ndarray] = None
) -> np.ndarray:
    """STOMP matrix profile of ``x`` (self-join) or AB-join of ``x`` against
    ``x_ref`` (novelty mode). Returns the per-window profile (length
    ``len(x) - w + 1``) of z-normalized Euclidean nearest-neighbor
    distances."""
    x = np.asarray(x, dtype=np.float64).reshape(-1)
    self_join = x_ref is None
    if self_join:
        return _matrix_profile_self(x, w)
    y = np.asarray(x_ref, dtype=np.float64).reshape(-1)

    n_q = x.shape[0] - w + 1  # query windows (rows)
    n_r = y.shape[0] - w + 1  # reference windows (cols)
    mu_q, sig_q = _sliding_mean_std(x, w)
    mu_r, sig_r = _sliding_mean_std(y, w)

    # first row of sliding dot products via correlation (O(n log n))
    nfft = 1 << int(np.ceil(np.log2(x.shape[0] + y.shape[0])))
    fy = np.fft.rfft(y, nfft)
    fq = np.fft.rfft(x[:w][::-1], nfft)
    qt = np.fft.irfft(fy * fq, nfft)[w - 1 : w - 1 + n_r]

    profile = np.empty(n_q)
    fx = np.fft.rfft(x, nfft)
    fr = np.fft.rfft(y[:w][::-1], nfft)
    qt_first_col = np.fft.irfft(fx * fr, nfft)[w - 1 : w - 1 + n_q]

    eps = 1e-14
    for i in range(n_q):
        if i > 0:
            qt[1:] = qt[:-1] - y[: n_r - 1] * x[i - 1] + y[w : w + n_r - 1] * x[i + w - 1]
            qt[0] = qt_first_col[i]
        denom = w * sig_q[i] * sig_r
        with np.errstate(invalid="ignore", divide="ignore"):
            corr = (qt - w * mu_q[i] * mu_r) / np.where(denom < eps, np.nan, denom)
        # constant windows: distance 0 vs constant, sqrt(w) vs non-constant
        d2 = 2.0 * w * (1.0 - np.clip(corr, -1.0, 1.0))
        if sig_q[i] < eps:
            d2 = np.where(sig_r < eps, 0.0, w)
        else:
            d2 = np.where(sig_r < eps, w, d2)
        dist = np.sqrt(np.maximum(d2, 0.0))
        profile[i] = dist.min() if np.isfinite(dist).any() else 0.0
    return profile


def _matrix_profile_self(x: np.ndarray, w: int) -> np.ndarray:
    """Self-join STOMP with preallocated row buffers and a masked
    reciprocal instead of per-row nan-division — ~1.7x over the naive
    row loop, numerically identical (same recurrence, same op order up
    to distributivity on the scalar factor; verified ≤2e-15)."""
    n = x.shape[0] - w + 1
    mu, sig = _sliding_mean_std(x, w)
    eps = 1e-14
    flat = sig < eps
    any_flat = bool(flat.any())
    inv = 1.0 / np.where(flat, 1.0, sig)
    winv = inv / w

    nfft = 1 << int(np.ceil(np.log2(2 * x.shape[0])))
    fy = np.fft.rfft(x, nfft)
    fq = np.fft.rfft(x[:w][::-1], nfft)
    qt = np.fft.irfft(fy * fq, nfft)[w - 1 : w - 1 + n]
    qt_first = qt.copy()  # QT[0, :] == QT[:, 0] by symmetry

    excl = int(np.ceil(w / 4))
    profile = np.empty(n)
    buf = np.empty(n)
    d2 = np.empty(n)
    flat_row = np.where(flat, 0.0, float(w)) if any_flat else None
    for i in range(n):
        if i > 0:
            qt[1:] = qt[:-1] - x[: n - 1] * x[i - 1] + x[w : w + n - 1] * x[i + w - 1]
            qt[0] = qt_first[i]
        np.multiply(mu, -w * mu[i], out=buf)
        buf += qt
        buf *= winv * inv[i]
        np.clip(buf, -1.0, 1.0, out=buf)
        np.subtract(1.0, buf, out=d2)
        d2 *= 2.0 * w
        if any_flat:
            if flat[i]:
                np.copyto(d2, flat_row)
            else:
                d2[flat] = w
        np.maximum(d2, 0.0, out=d2)
        np.sqrt(d2, out=d2)
        lo, hi = max(0, i - excl), min(n, i + excl + 1)
        d2[lo:hi] = np.inf
        m = d2.min()
        profile[i] = m if np.isfinite(m) else 0.0
    return profile


def matrix_profile_ab_excl(
    x: np.ndarray, y: np.ndarray, w: int, delta: int, excl: int
) -> np.ndarray:
    """AB-join profile of ``x``'s windows against ``y``'s windows with a
    GLOBAL-coordinate exclusion zone: window i of x and window j of y are
    trivially matched when ``|i + delta - j| <= excl`` (``delta`` = x's
    global window offset minus y's). This is the building block of the
    chunked distributed matrix profile (SURVEY §4.2-5): a self-join over
    a long series decomposes into chunk-pair AB-joins whose exclusion
    masks reconstruct the monolithic diagonal exclusion exactly.

    Rows with no admissible neighbor return +inf (the combiner's min
    ignores them)."""
    return matrix_profile_ab_excl_both(x, y, w, delta, excl)[0]


def matrix_profile_ab_excl_both(
    x: np.ndarray, y: np.ndarray, w: int, delta: int, excl: int
) -> Tuple[np.ndarray, np.ndarray]:
    """AB-join with global exclusion returning BOTH sides' minima:
    ``(prof_x[i] = min_j d(i, j), prof_y[j] = min_i d(i, j))``. The
    distance matrix of an unordered chunk pair is computed once and
    serves both chunks — the column minima fall out of the same row
    sweep for one extra vector-min per row, halving the chunk-pair
    fan-out of the distributed matrix profile."""
    x = np.asarray(x, dtype=np.float64).reshape(-1)
    y = np.asarray(y, dtype=np.float64).reshape(-1)
    n_q = x.shape[0] - w + 1
    n_r = y.shape[0] - w + 1
    mu_q, sig_q = _sliding_mean_std(x, w)
    mu_r, sig_r = _sliding_mean_std(y, w)

    nfft = 1 << int(np.ceil(np.log2(x.shape[0] + y.shape[0])))
    fy = np.fft.rfft(y, nfft)
    fq = np.fft.rfft(x[:w][::-1], nfft)
    qt = np.fft.irfft(fy * fq, nfft)[w - 1 : w - 1 + n_r]
    fx = np.fft.rfft(x, nfft)
    fr = np.fft.rfft(y[:w][::-1], nfft)
    qt_first_col = np.fft.irfft(fx * fr, nfft)[w - 1 : w - 1 + n_q]

    eps = 1e-14
    flat_q = sig_q < eps
    flat_r = sig_r < eps
    any_flat_r = bool(flat_r.any())
    inv_q = 1.0 / np.where(flat_q, 1.0, sig_q)
    winv_r = (1.0 / np.where(flat_r, 1.0, sig_r)) / w
    flat_row = np.where(flat_r, 0.0, float(w)) if any_flat_r else None

    profile = np.empty(n_q)
    prof_y = np.full(n_r, np.inf)
    buf = np.empty(n_r)
    d2 = np.empty(n_r)
    for i in range(n_q):
        if i > 0:
            qt[1:] = qt[:-1] - y[: n_r - 1] * x[i - 1] + y[w : w + n_r - 1] * x[i + w - 1]
            qt[0] = qt_first_col[i]
        np.multiply(mu_r, -w * mu_q[i], out=buf)
        buf += qt
        buf *= winv_r * inv_q[i]
        np.clip(buf, -1.0, 1.0, out=buf)
        np.subtract(1.0, buf, out=d2)
        d2 *= 2.0 * w
        if flat_q[i]:
            if flat_row is not None:
                np.copyto(d2, flat_row)
            else:
                d2.fill(w)
        elif any_flat_r:
            d2[flat_r] = w
        np.maximum(d2, 0.0, out=d2)
        np.sqrt(d2, out=d2)
        if excl >= 0:
            lo = max(0, i + delta - excl)
            hi = min(n_r, i + delta + excl + 1)
            if lo < hi:
                d2[lo:hi] = np.inf
        m = d2.min()
        profile[i] = m  # +inf stays +inf (combiner's min ignores it)
        np.minimum(prof_y, d2, out=prof_y)
    return profile, prof_y


# ----------------------------------------------------------------- KMeans

def kmeans_fit(
    X: np.ndarray, k: int, seed: int = 42, n_iter: int = 100, tol: float = 1e-6
) -> np.ndarray:
    """Seeded k-means++ init + Lloyd iterations; returns (k, d) centroids."""
    X = np.asarray(X, dtype=np.float64)
    rng = np.random.default_rng(seed)
    n = X.shape[0]
    k = min(k, n)
    centers = np.empty((k, X.shape[1]))
    centers[0] = X[rng.integers(n)]
    d2 = ((X - centers[0]) ** 2).sum(axis=1)
    for j in range(1, k):
        total = d2.sum()
        if total <= 0:
            centers[j:] = X[rng.integers(n, size=k - j)]
            break
        centers[j] = X[rng.choice(n, p=d2 / total)]
        d2 = np.minimum(d2, ((X - centers[j]) ** 2).sum(axis=1))
    for _ in range(n_iter):
        d = ((X[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        new_centers = centers.copy()
        for j in range(k):
            sel = assign == j
            if sel.any():
                new_centers[j] = X[sel].mean(axis=0)
        if np.abs(new_centers - centers).max() < tol:
            centers = new_centers
            break
        centers = new_centers
    return centers


def kmeans_score(X: np.ndarray, centers: np.ndarray) -> np.ndarray:
    """L2 distance to the nearest centroid (per window)."""
    X = np.asarray(X, dtype=np.float64)
    d = np.sqrt(((X[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2))
    return d.min(axis=1)


# --------------------------------------------------------- IsolationForest

def _iforest_build(X: np.ndarray, idx: np.ndarray, depth: int, max_depth: int,
                   rng: np.random.Generator, nodes: list) -> int:
    node_id = len(nodes)
    if depth >= max_depth or idx.shape[0] <= 1:
        nodes.append((-1, 0.0, -1, -1, idx.shape[0]))
        return node_id
    sub = X[idx]
    lo, hi = sub.min(axis=0), sub.max(axis=0)
    usable = np.flatnonzero(hi > lo)
    if usable.shape[0] == 0:
        nodes.append((-1, 0.0, -1, -1, idx.shape[0]))
        return node_id
    f = int(rng.choice(usable))
    split = rng.uniform(lo[f], hi[f])
    nodes.append(None)  # placeholder
    left = _iforest_build(X, idx[sub[:, f] < split], depth + 1, max_depth, rng, nodes)
    right = _iforest_build(X, idx[sub[:, f] >= split], depth + 1, max_depth, rng, nodes)
    nodes[node_id] = (f, float(split), left, right, idx.shape[0])
    return node_id


def _avg_path_length(n):
    n = np.asarray(n, dtype=np.float64)
    out = np.zeros_like(n)
    big = n > 2
    out[big] = 2.0 * (np.log(n[big] - 1) + np.euler_gamma) - 2.0 * (n[big] - 1) / n[big]
    out[n == 2] = 1.0
    return out


def iforest_fit(X: np.ndarray, n_trees: int = 100, subsample: int = 256,
                seed: int = 42) -> list:
    """Fit an isolation forest; returns a list of node-table trees."""
    X = np.asarray(X, dtype=np.float64)
    rng = np.random.default_rng(seed)
    psi = min(subsample, X.shape[0])
    max_depth = int(np.ceil(np.log2(max(psi, 2))))
    trees = []
    for _ in range(n_trees):
        samp = rng.choice(X.shape[0], size=psi, replace=False)
        nodes: list = []
        _iforest_build(X, samp, 0, max_depth, rng, nodes)
        trees.append(_flatten_tree(nodes))
    return trees


def _flatten_tree(nodes: list) -> tuple:
    """Node list -> flat arrays (feat, split, left, right, leaf_add):
    traversal becomes pure index arithmetic (no per-level Python list
    building), and the leaf's average-path-length correction is
    precomputed once at fit."""
    arr = np.array(nodes, dtype=np.float64)
    feat = arr[:, 0].astype(np.int64)
    sizes = arr[:, 4]
    leaf_add = np.where(feat < 0, _avg_path_length(sizes), 0.0)
    return (
        feat,
        arr[:, 1],
        arr[:, 2].astype(np.int64),
        arr[:, 3].astype(np.int64),
        leaf_add,
    )


def iforest_score(X: np.ndarray, trees: list, subsample: int = 256) -> np.ndarray:
    """Anomaly score 2^(-E[h]/c(psi)); higher = more anomalous."""
    X = np.asarray(X, dtype=np.float64)
    depths = np.zeros(X.shape[0])
    for tree in trees:
        if isinstance(tree, list):  # legacy node-list form
            tree = _flatten_tree(tree)
        feat, split, left, right, leaf_add = tree
        node = np.zeros(X.shape[0], dtype=np.int64)
        depth = np.zeros(X.shape[0])
        active = np.arange(X.shape[0])
        while active.shape[0]:
            cur = node[active]
            f = feat[cur]
            is_leaf = f < 0
            if is_leaf.any():
                li = active[is_leaf]
                depth[li] += leaf_add[cur[is_leaf]]
            go = active[~is_leaf]
            if go.shape[0]:
                cg = cur[~is_leaf]
                vals = X[go, f[~is_leaf]]
                node[go] = np.where(vals < split[cg], left[cg], right[cg])
                depth[go] += 1
            active = go
        depths += depth
    mean_depth = depths / len(trees)
    c = _avg_path_length(np.array([float(subsample)]))[0]
    return 2.0 ** (-mean_depth / max(c, 1e-12))


# ----------------------------------------------------- proba & confidence

def minmax_rescale(scores: np.ndarray) -> np.ndarray:
    """predict_proba semantics (BaseDetector.py:140-186): min-max rescale;
    constant scores pass through iff already within [0, 1], else error."""
    s = np.asarray(scores, dtype=np.float64)
    mn, mx = s.min(), s.max()
    if mn == mx:
        if 0.0 <= mn <= 1.0:
            return s.copy()
        raise ValueError("Constant anomaly scores outside [0, 1] cannot be rescaled")
    return (s - mn) / (mx - mn)


def _betacf(a: float, b: float, x: float, max_iter: int = 200, eps: float = 3e-12) -> float:
    """Continued fraction for the incomplete beta (Numerical Recipes style)."""
    tiny = 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < tiny:
        d = tiny
    d = 1.0 / d
    h = d
    for m in range(1, max_iter + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < eps:
            break
    return h


def betainc_reg(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    import math

    ln_front = (
        math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
        + a * math.log(x) + b * math.log(1.0 - x)
    )
    front = math.exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def binom_cdf(k, n: int, p) -> np.ndarray:
    """P(X <= k) for X ~ Binomial(n, p) via the incomplete beta.
    ``k`` and ``p`` broadcast against each other (scipy.stats.binom.cdf
    semantics — ExCeeD calls this with scalar k and per-point p)."""
    k_arr, p_arr = np.broadcast_arrays(
        np.asarray(k, dtype=np.float64), np.asarray(p, dtype=np.float64)
    )
    out = np.empty(k_arr.shape, dtype=np.float64)
    kf, pf, of = k_arr.reshape(-1), p_arr.reshape(-1), out.reshape(-1)
    for i in range(kf.shape[0]):
        ki = int(np.floor(kf[i]))
        if ki < 0:
            of[i] = 0.0
        elif ki >= n:
            of[i] = 1.0
        else:
            of[i] = betainc_reg(n - ki, ki + 1, 1.0 - float(pf[i]))
    return out


def exceed_confidence(
    train_scores: np.ndarray, test_scores: np.ndarray, contamination: float
) -> np.ndarray:
    """ExCeeD confidence (BaseDetector.predict_confidence semantics):
    posterior outlier probability from the train-score ECDF, binomial tail
    at the contamination threshold, flipped for predicted-normal points."""
    train = np.asarray(train_scores, dtype=np.float64)
    test = np.asarray(test_scores, dtype=np.float64)
    n = train.shape[0]
    # P(score <= s) with add-one smoothing (ExCeeD eq. 4)
    counts = np.searchsorted(np.sort(train), test, side="right")
    p = (1.0 + counts) / (2.0 + n)
    conf = 1.0 - binom_cdf(np.floor(n * contamination) - 1, n, 1 - p)
    cutoff = np.quantile(test, 1.0 - contamination)
    predicted_anomaly = test >= cutoff
    return np.where(predicted_anomaly, conf, 1.0 - conf)
