"""Extended detector kernels: the remaining reference detector family.

Pure-NumPy reimplementations of the algorithms the reference reaches via
pyod/sklearn/tslearn wrappers (anomaly_detection/*.py) — the fit state is
small (sample windows, centroids, histograms, eigenvectors) so the Spark
operators driver-fit on a bounded deterministic sample and broadcast, the
same shape as operators/detectors.py.

Semantics notes (vs the wrapped libraries):
* knn/lof — classic kNN-distance and LOF in novelty mode (score test
  points against the train set), matching pyod KNN(largest)/LOF defaults
  structurally (KNearestNeighbors.py:7-62, LocalOutlierFactor.py:7-61).
* hbos — static equal-width per-feature histograms, log-density sum
  (HistogramBasedOutlierScore.py:7-62).
* copod — empirical left/right tail probabilities, skewness-corrected
  dimension choice (CopulaBasedOutlierDetector.py:7-62).
* pca / kpca — reconstruction error against top-q principal components /
  RBF kernel components (PrincipalComponentAnalysis.py:7-58,
  KernelPrincipalComponentAnalysis.py:7-58).
* cblof — distance to nearest large-cluster centroid
  (ClusterBasedLocalOutlierFactor.py:7-76).
* ocsvm — the real Schölkopf one-class SVM: dual QP solved by projected
  gradient with exact box-simplex projection; ν-property verified
  empirically (train outlier fraction → ν with iterations)
  (OneClassSupportVectorMachine.py:7-59).
* kshape — real k-Shape (SBD assignment via FFT cross-correlation +
  eigenvector shape extraction, Paparrizos & Gravano SIGMOD'15), cluster
  weights = minmax(size^2 / ΣSBD) (KShapeAnomalyDetector.py:142-193),
  per-window score = weighted z-normalized AB-join distance to each
  centroid via the matrix-profile kernel.
* rpca — PCP by inexact ALM (SVD shrinkage loop,
  RobustPrincipalComponentAnalysis.py:113-190) on the sample, then PCA
  scoring against the low-rank part's components.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from dtaianomaly_spark.kernels.detectors import (
    _sliding_mean_std, kmeans_fit, matrix_profile,
)


def _block_dists(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Pairwise Euclidean distances (n_a, n_b), exact, vectorized."""
    a2 = (A * A).sum(axis=1)[:, None]
    b2 = (B * B).sum(axis=1)[None, :]
    d2 = a2 + b2 - 2.0 * A @ B.T
    return np.sqrt(np.maximum(d2, 0.0))


# ------------------------------------------------------------------ kNN/LOF

def knn_score(test: np.ndarray, train: np.ndarray, k: int = 5) -> np.ndarray:
    """Distance to the k-th nearest train window (pyod KNN 'largest')."""
    d = _block_dists(test, train)
    k = min(k, train.shape[0])
    return np.partition(d, k - 1, axis=1)[:, k - 1]


def lof_fit(train: np.ndarray, k: int = 10) -> Dict[str, np.ndarray]:
    """Precompute train k-distances and local reachability densities."""
    n = train.shape[0]
    k = min(k, n - 1)
    d = _block_dists(train, train)
    np.fill_diagonal(d, np.inf)
    idx = np.argpartition(d, k - 1, axis=1)[:, :k]
    ndist = np.take_along_axis(d, idx, axis=1)
    kdist = ndist.max(axis=1)
    reach = np.maximum(ndist, kdist[idx])
    lrd = 1.0 / np.maximum(reach.mean(axis=1), 1e-12)
    return {"train": train, "k": np.int64(k), "kdist": kdist, "lrd": lrd}


def lof_score(test: np.ndarray, model: Dict[str, np.ndarray]) -> np.ndarray:
    """LOF of test points vs the train set (novelty mode)."""
    train, k = model["train"], int(model["k"])
    kdist, lrd = model["kdist"], model["lrd"]
    d = _block_dists(test, train)
    idx = np.argpartition(d, k - 1, axis=1)[:, :k]
    ndist = np.take_along_axis(d, idx, axis=1)
    reach = np.maximum(ndist, kdist[idx])
    lrd_test = 1.0 / np.maximum(reach.mean(axis=1), 1e-12)
    return lrd[idx].mean(axis=1) / lrd_test


# -------------------------------------------------------------------- HBOS

def hbos_fit(train: np.ndarray, n_bins: int = 10) -> Dict[str, np.ndarray]:
    """Per-feature equal-width histograms over the train range."""
    mn = train.min(axis=0)
    mx = train.max(axis=0)
    width = np.where(mx > mn, (mx - mn) / n_bins, 1.0)
    counts = np.zeros((train.shape[1], n_bins), dtype=np.float64)
    for j in range(train.shape[1]):
        b = np.clip(((train[:, j] - mn[j]) / width[j]).astype(np.int64), 0, n_bins - 1)
        counts[j] = np.bincount(b, minlength=n_bins)
    density = counts / train.shape[0]
    return {"mn": mn, "width": width, "density": density, "n_bins": np.int64(n_bins)}


def hbos_score(test: np.ndarray, model: Dict[str, np.ndarray], alpha: float = 0.1) -> np.ndarray:
    """score = Σ_j log(1 / (density_j(bin) + alpha))."""
    mn, width, density = model["mn"], model["width"], model["density"]
    n_bins = int(model["n_bins"])
    out = np.zeros(test.shape[0])
    for j in range(test.shape[1]):
        b = np.clip(((test[:, j] - mn[j]) / width[j]).astype(np.int64), 0, n_bins - 1)
        out += np.log(1.0 / (density[j][b] + alpha))
    return out


# ------------------------------------------------------------------- COPOD

def copod_fit(train: np.ndarray) -> Dict[str, np.ndarray]:
    from numpy import sort

    skew_num = ((train - train.mean(axis=0)) ** 3).mean(axis=0)
    skew_den = np.maximum(train.std(axis=0) ** 3, 1e-12)
    return {
        "sorted": sort(train, axis=0),
        "n": np.int64(train.shape[0]),
        "skew": skew_num / skew_den,
    }


def copod_score(test: np.ndarray, model: Dict[str, np.ndarray]) -> np.ndarray:
    """Σ_j -log(tail probability), tail side chosen by train skewness."""
    srt, n, skew = model["sorted"], int(model["n"]), model["skew"]
    out = np.zeros(test.shape[0])
    for j in range(test.shape[1]):
        left = (np.searchsorted(srt[:, j], test[:, j], side="right") + 1.0) / (n + 1.0)
        right = (n - np.searchsorted(srt[:, j], test[:, j], side="left") + 1.0) / (n + 1.0)
        p = np.where(skew[j] < 0, left, right)
        out += -np.log(np.clip(p, 1e-12, 1.0))
    return out


# --------------------------------------------------------------- PCA / KPCA

def pca_fit(train: np.ndarray, n_components: int = 4) -> Dict[str, np.ndarray]:
    mean = train.mean(axis=0)
    Xc = train - mean
    cov = Xc.T @ Xc / max(train.shape[0] - 1, 1)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][: min(n_components, train.shape[1])]
    return {"mean": mean, "components": vecs[:, order]}


def pca_score(test: np.ndarray, model: Dict[str, np.ndarray]) -> np.ndarray:
    """Squared reconstruction error against the principal subspace."""
    Xc = test - model["mean"]
    proj = Xc @ model["components"] @ model["components"].T
    return ((Xc - proj) ** 2).sum(axis=1)


def _rbf(A: np.ndarray, B: np.ndarray, gamma: float) -> np.ndarray:
    d = _block_dists(A, B)
    return np.exp(-gamma * d * d)


def kpca_fit(train: np.ndarray, n_components: int = 4, gamma: float | None = None) -> Dict:
    if gamma is None:
        gamma = 1.0 / train.shape[1]
    K = _rbf(train, train, gamma)
    n = K.shape[0]
    one = np.full((n, n), 1.0 / n)
    Kc = K - one @ K - K @ one + one @ K @ one
    vals, vecs = np.linalg.eigh(Kc)
    order = np.argsort(vals)[::-1][:n_components]
    lam = np.maximum(vals[order], 1e-12)
    return {"train": train, "gamma": gamma, "K": K,
            "alphas": vecs[:, order] / np.sqrt(lam), "lam": lam}


def kpca_score(test: np.ndarray, model: Dict) -> np.ndarray:
    """Reconstruction error in feature space: k(x,x) - ||projection||²
    (with centering terms), the standard KPCA novelty score."""
    train, gamma, K = model["train"], model["gamma"], model["K"]
    n = train.shape[0]
    Kt = _rbf(test, train, gamma)
    row_mean = K.mean(axis=0)
    all_mean = K.mean()
    Ktc = Kt - Kt.mean(axis=1, keepdims=True) - row_mean[None, :] + all_mean
    proj = Ktc @ model["alphas"]
    kxx = 1.0 - 2.0 * Kt.mean(axis=1) + all_mean
    return np.maximum(kxx - (proj * proj).sum(axis=1), 0.0)


# ------------------------------------------------------------------- CBLOF

def cblof_fit(train: np.ndarray, k: int = 8, alpha: float = 0.9, seed: int = 42) -> Dict:
    centers = kmeans_fit(train, k, seed=seed)
    d = _block_dists(train, centers)
    assign = d.argmin(axis=1)
    sizes = np.bincount(assign, minlength=centers.shape[0])
    order = np.argsort(sizes)[::-1]
    cum = np.cumsum(sizes[order])
    n_big = int(np.searchsorted(cum, alpha * train.shape[0]) + 1)
    big = order[:n_big]
    return {"centers": centers, "big": big}


def cblof_score(test: np.ndarray, model: Dict) -> np.ndarray:
    """Distance to the nearest LARGE cluster centroid."""
    return _block_dists(test, model["centers"][model["big"]]).min(axis=1)


# ----------------------------------------------------------- OCSVM (approx)

def _project_box_simplex(a: np.ndarray, ub: float) -> np.ndarray:
    """Euclidean projection onto {0 <= x <= ub, Σx = 1} by bisection on
    the simplex shift (clip(a - λ, 0, ub) is monotone in λ)."""
    lo = a.max() - ub - 1.0
    hi = a.max()
    for _ in range(100):
        mid = 0.5 * (lo + hi)
        s = np.clip(a - mid, 0.0, ub).sum()
        if s > 1.0:
            lo = mid
        else:
            hi = mid
    return np.clip(a - 0.5 * (lo + hi), 0.0, ub)


def ocsvm_fit(
    train: np.ndarray, nu: float = 0.1, gamma: float | None = None,
    n_iter: int = 3000,
) -> Dict:
    """One-class SVM (Schölkopf et al. 2001): solves the dual QP
    ``min ½αᵀKα  s.t. 0 ≤ αᵢ ≤ 1/(νn), Σα = 1`` by projected gradient
    descent (deterministic; the projection is exact box-simplex). ρ from
    the margin of interior support vectors."""
    if gamma is None:
        gamma = 1.0 / train.shape[1]
    K = _rbf(train, train, gamma)
    n = train.shape[0]
    ub = 1.0 / (nu * n)
    alpha = np.full(n, 1.0 / n)
    # Lipschitz constant of the gradient is ||K||₂ <= trace-bound n
    eta = 1.0 / max(np.linalg.norm(K, 2), 1e-6)
    for _ in range(n_iter):
        alpha_new = _project_box_simplex(alpha - eta * (K @ alpha), ub)
        if np.abs(alpha_new - alpha).max() < 1e-10:
            alpha = alpha_new
            break
        alpha = alpha_new
    margins = K @ alpha
    interior = (alpha > 1e-8) & (alpha < ub - 1e-8)
    rho = float(np.median(margins[interior])) if interior.any() else float(
        np.median(margins[alpha > 1e-8])
    )
    return {"train": train, "gamma": gamma, "alpha": alpha, "rho": rho}


def ocsvm_score(test: np.ndarray, model: Dict) -> np.ndarray:
    """Anomaly score = ρ - f(x) (positive outside the learned region)."""
    f = _rbf(test, model["train"], model["gamma"]) @ model["alpha"]
    return model["rho"] - f


# kept for API compatibility: the surrogate is now the real QP solution
ocsvm_surrogate_fit = ocsvm_fit
ocsvm_surrogate_score = ocsvm_score


# ------------------------------------------------------------------ KShape

def _znorm_rows(X: np.ndarray) -> np.ndarray:
    mu = X.mean(axis=1, keepdims=True)
    sd = X.std(axis=1, keepdims=True)
    return (X - mu) / np.where(sd < 1e-12, 1.0, sd)


def _ncc_max_and_shift(members: np.ndarray, centroid: np.ndarray):
    """Max normalized cross-correlation of each member row against the
    centroid, plus the maximizing shift (FFT full cross-correlation —
    the SBD building block of k-Shape, Paparrizos & Gravano SIGMOD'15)."""
    m, w = members.shape
    nfft = 1 << int(np.ceil(np.log2(2 * w)))
    fm = np.fft.rfft(members, nfft, axis=1)
    fc = np.fft.rfft(centroid, nfft)
    cc = np.fft.irfft(fm * np.conj(fc)[None, :], nfft, axis=1)
    # full correlation, shifts -(w-1)..(w-1): wrap-around layout
    cc = np.concatenate([cc[:, -(w - 1):], cc[:, :w]], axis=1)
    norm = np.linalg.norm(members, axis=1) * np.linalg.norm(centroid)
    with np.errstate(invalid="ignore", divide="ignore"):
        ncc = cc / np.where(norm < 1e-12, np.nan, norm)[:, None]
    ncc = np.nan_to_num(ncc, nan=0.0)
    best = ncc.argmax(axis=1)
    return ncc[np.arange(m), best], best - (w - 1)


def _align(members: np.ndarray, shifts: np.ndarray) -> np.ndarray:
    """Shift each row by its alignment offset, zero-padded (k-Shape's
    alignment step before shape extraction)."""
    m, w = members.shape
    out = np.zeros_like(members)
    for i, s in enumerate(shifts):
        if s >= 0:
            out[i, s:] = members[i, : w - s]
        else:
            out[i, : w + s] = members[i, -s:]
    return out


def _extract_shape(aligned: np.ndarray, prev: np.ndarray) -> np.ndarray:
    """Shape extraction: dominant eigenvector of Qᵀ(XᵀX)Q with the
    centering matrix Q = I - 1/w·11ᵀ; sign chosen to correlate with the
    previous centroid; z-normalized."""
    w = aligned.shape[1]
    S = aligned.T @ aligned
    Q = np.eye(w) - np.full((w, w), 1.0 / w)
    M = Q @ S @ Q
    _, vecs = np.linalg.eigh(M)
    c = vecs[:, -1]
    if c @ prev < 0:
        c = -c
    sd = c.std()
    return (c - c.mean()) / (sd if sd > 1e-12 else 1.0)


def kshape_fit(
    train_windows: np.ndarray, k: int = 3, seed: int = 42, n_iter: int = 20
) -> Dict:
    """k-Shape clustering (SBD assignment + eigenvector shape extraction,
    Paparrizos & Gravano SIGMOD'15 — the algorithm behind the reference's
    tslearn KShape, KShapeAnomalyDetector.py:142-160) plus the reference's
    cluster weights minmax(size² / Σ SBD-to-centroid)
    (KShapeAnomalyDetector.py:162-173)."""
    Z = _znorm_rows(np.asarray(train_windows, dtype=np.float64))
    m, w = Z.shape
    rng = np.random.default_rng(seed)
    k = min(k, m)
    assign = rng.integers(k, size=m)
    centers = np.zeros((k, w))
    for j in range(k):
        members = Z[assign == j]
        centers[j] = _extract_shape(members, np.ones(w)) if members.shape[0] else Z[rng.integers(m)]

    for _ in range(n_iter):
        # assignment by SBD = 1 - max NCC
        sbd = np.empty((m, k))
        for j in range(k):
            ncc, _ = _ncc_max_and_shift(Z, centers[j])
            sbd[:, j] = 1.0 - ncc
        new_assign = sbd.argmin(axis=1)
        if (new_assign == assign).all():
            assign = new_assign
            break
        assign = new_assign
        for j in range(k):
            members = Z[assign == j]
            if members.shape[0] == 0:
                centers[j] = Z[rng.integers(m)]
                continue
            _, shifts = _ncc_max_and_shift(members, centers[j])
            centers[j] = _extract_shape(_align(members, shifts), centers[j])

    # reference weight formula over final SBD assignment
    sbd = np.empty((m, k))
    for j in range(k):
        ncc, _ = _ncc_max_and_shift(Z, centers[j])
        sbd[:, j] = 1.0 - ncc
    assign = sbd.argmin(axis=1)
    sizes = np.bincount(assign, minlength=k).astype(np.float64)
    tot = np.array([sbd[assign == j, j].sum() for j in range(k)])
    wt = sizes**2 / np.maximum(tot, 1e-12)
    rngw = wt.max() - wt.min()
    weights = (wt - wt.min()) / rngw if rngw > 0 else np.ones_like(wt)
    return {"centers": centers, "weights": weights}


def sliding_znorm_dist(x: np.ndarray, c: np.ndarray, w: int) -> np.ndarray:
    """Z-normalized Euclidean distance of EVERY length-``w`` window of
    ``x`` to the single pattern ``c`` — equal to
    ``matrix_profile(x, w, x_ref=c)`` (n_ref = 1), but the whole profile
    comes out of ONE FFT cross-correlation instead of a per-window
    Python loop (the STOMP recurrence degenerates to length-1 rows for a
    single reference window; measured ~40x on the kshape scoring path).
    Constant-window semantics match the STOMP kernel: flat-vs-flat -> 0,
    flat-vs-varying -> sqrt(w)."""
    x = np.asarray(x, dtype=np.float64).reshape(-1)
    c = np.asarray(c, dtype=np.float64).reshape(-1)
    n_q = x.shape[0] - w + 1
    mu_q, sig_q = _sliding_mean_std(x, w)
    # same cumsum-based moments as the STOMP kernel, so float-roundoff
    # flat-window detection agrees bit-for-bit with matrix_profile
    mu_c_a, sig_c_a = _sliding_mean_std(c, w)
    mu_c, sig_c = float(mu_c_a[0]), float(sig_c_a[0])

    nfft = 1 << int(np.ceil(np.log2(x.shape[0] + w)))
    dot = np.fft.irfft(
        np.fft.rfft(x, nfft) * np.fft.rfft(c[::-1], nfft), nfft
    )[w - 1 : w - 1 + n_q]

    eps = 1e-14
    denom = w * sig_q * sig_c
    with np.errstate(invalid="ignore", divide="ignore"):
        corr = (dot - w * mu_q * mu_c) / np.where(denom < eps, np.nan, denom)
    d2 = 2.0 * w * (1.0 - np.clip(corr, -1.0, 1.0))
    if sig_c < eps:
        d2 = np.where(sig_q < eps, 0.0, w)
    else:
        d2 = np.where(sig_q < eps, w, d2)
    return np.sqrt(np.maximum(d2, 0.0))


def kshape_scores(x: np.ndarray, model: Dict, window_size: int) -> np.ndarray:
    """Per-window weighted sum of z-normalized AB-join distances to each
    centroid (KShapeAnomalyDetector.py:182-193 pattern)."""
    x = np.asarray(x, dtype=np.float64).reshape(-1)
    n_win = x.shape[0] - window_size + 1
    out = np.zeros(n_win)
    for c, w in zip(model["centers"], model["weights"]):
        out += w * sliding_znorm_dist(x, c, window_size)
    return out


# -------------------------------------------------------------------- RPCA

def rpca_fit(train: np.ndarray, max_iter: int = 100, tol: float = 1e-6,
             n_components: int = 4) -> Dict:
    """Principal Component Pursuit by inexact ALM: M = L + S with nuclear-
    norm L and l1 S; PCA components of the recovered low-rank L."""
    M = np.asarray(train, dtype=np.float64)
    norm = np.linalg.norm(M)
    if norm == 0:
        return pca_fit(M, n_components)
    lam = 1.0 / np.sqrt(max(M.shape))
    mu = M.shape[0] * M.shape[1] / (4.0 * np.abs(M).sum())
    S = np.zeros_like(M)
    Y = np.zeros_like(M)
    for _ in range(max_iter):
        U, sig, Vt = np.linalg.svd(M - S + Y / mu, full_matrices=False)
        sig_sh = np.maximum(sig - 1.0 / mu, 0.0)
        L = (U * sig_sh) @ Vt
        R = M - L + Y / mu
        S = np.sign(R) * np.maximum(np.abs(R) - lam / mu, 0.0)
        Z = M - L - S
        Y += mu * Z
        if np.linalg.norm(Z) / norm < tol:
            break
    return pca_fit(L, n_components)


rpca_score = pca_score


# ------------------------------------------------ spectral residual (SR)

def _causal_mavg(a: np.ndarray, q: int) -> np.ndarray:
    """Causal moving average with a growing head: position i averages the
    last ``min(i + 1, q)`` values — the standard SR ``average_filter``
    shape, vectorized with one cumulative sum."""
    c = np.cumsum(a, dtype=np.float64)
    out = c.copy()
    out[q:] = c[q:] - c[:-q]
    div = np.minimum(np.arange(1, a.shape[0] + 1, dtype=np.float64), float(q))
    return out / div


def sr_extend(x: np.ndarray, m: int = 5, kappa: int = 5) -> np.ndarray:
    """The SR paper's tail extrapolation (Ren et al. 2019, KDD, "Time-
    Series Anomaly Detection Service at Microsoft", eq. 8-9): append
    ``kappa`` copies of the estimated next point
    ``x_{n+1} = x_{n-m+1} + m * mean_i (x_n - x_{n-i}) / i`` so the
    FFT sees the most recent points away from the boundary. Series
    shorter than ``m + 1`` repeat the last value."""
    x = np.asarray(x, dtype=np.float64)
    n = x.shape[0]
    if n == 0:
        return x
    if n < m + 1:
        est = x[-1]
    else:
        i = np.arange(1, m + 1, dtype=np.float64)
        grad = (x[-1] - x[-1 - np.arange(1, m + 1)]) / i
        est = x[n - m] + grad.mean() * m
    return np.concatenate([x, np.full(kappa, est)])


def sr_saliency(x: np.ndarray, q: int = 3, m: int = 5,
                kappa: int = 5) -> np.ndarray:
    """Spectral-residual saliency map of a series (Ren et al. 2019,
    section 3.1): log-amplitude spectrum minus its ``q``-point moving
    average, recombined with the original phase, back-transformed —
    ``S = |IFFT(exp(L - h_q * L + i * phase))|``. The tail is
    extrapolated with :func:`sr_extend` before the FFT and trimmed
    after. Zero-amplitude frequency bins (an all-zero series) keep a
    log floor so the map stays finite everywhere."""
    x = np.asarray(x, dtype=np.float64)
    n = x.shape[0]
    if n == 0:
        return x
    ext = sr_extend(x, m, kappa)
    spec = np.fft.fft(ext)
    amp = np.abs(spec)
    safe = np.where(amp > 0, amp, 1.0)
    log_amp = np.log(safe)
    resid = log_amp - _causal_mavg(log_amp, q)
    # exp(resid) rescales each bin's amplitude; zero bins stay zero
    sal = np.abs(np.fft.ifft(spec * (np.exp(resid) / safe)))
    return sal[:n]


def sr_scores_1d(x: np.ndarray, q: int = 3, m: int = 5, kappa: int = 5,
                 z: int = 21) -> np.ndarray:
    """Per-observation SR anomaly score: relative deviation of the
    saliency map from its ``z``-point causal local average,
    ``(S - S_loc) / S_loc`` (Ren et al. 2019 eq. 5 with the local
    average as the expected saliency). Zero local average (constant
    series) scores 0 — finite everywhere by construction."""
    sal = sr_saliency(x, q, m, kappa)
    if sal.shape[0] == 0:
        return sal
    loc = _causal_mavg(sal, z)
    return np.where(loc > 0, (sal - loc) / np.where(loc > 0, loc, 1.0), 0.0)


# ----------------------------------------- generalized ESD / S-H-ESD

def t_cdf(t: float, df: float) -> float:
    """Student-t CDF via the regularized incomplete beta:
    ``P(T <= t) = 1 - I_x(df/2, 1/2) / 2`` with ``x = df / (df + t^2)``
    for ``t >= 0``, mirrored below — the same betainc the ExCeeD path
    uses (kernels/detectors.betainc_reg)."""
    from dtaianomaly_spark.kernels.detectors import betainc_reg

    if df <= 0:
        raise ValueError(f"df must be > 0, got {df}")
    x = df / (df + t * t)
    half = 0.5 * betainc_reg(df / 2.0, 0.5, x)
    return 1.0 - half if t >= 0 else half


def t_ppf(p: float, df: float) -> float:
    """Student-t quantile: bracket doubling, ten bisections to tighten,
    then safeguarded Newton on :func:`t_cdf` with the closed-form t
    density (each step stays inside the live bracket, so convergence is
    monotone-guaranteed like plain bisection but ~6x fewer betainc
    evaluations). Deterministic, no lookup tables, ~1e-14 relative —
    pinned against textbook critical values and a CDF round-trip in
    tests."""
    import math

    if not 0.0 < p < 1.0:
        raise ValueError(f"p must be in (0, 1), got {p}")
    if p == 0.5:
        return 0.0
    if p < 0.5:
        return -t_ppf(1.0 - p, df)
    lo, hi = 0.0, 1.0
    while t_cdf(hi, df) < p:
        lo = hi
        hi *= 2.0
        if hi > 1e18:  # pragma: no cover — p astronomically close to 1
            return hi
    for _ in range(10):
        mid = 0.5 * (lo + hi)
        if t_cdf(mid, df) < p:
            lo = mid
        else:
            hi = mid
    log_c = (
        math.lgamma((df + 1.0) / 2.0) - math.lgamma(df / 2.0)
        - 0.5 * math.log(df * math.pi)
    )
    t = 0.5 * (lo + hi)
    for _ in range(12):
        f = t_cdf(t, df) - p
        if f < 0.0:
            lo = t
        else:
            hi = t
        pdf = math.exp(log_c - 0.5 * (df + 1.0) * math.log1p(t * t / df))
        nxt = t - f / pdf if pdf > 0.0 else 0.5 * (lo + hi)
        if not lo < nxt < hi:  # safeguard: fall back to bisection
            nxt = 0.5 * (lo + hi)
        if abs(nxt - t) <= 1e-15 * max(1.0, abs(t)):
            return nxt
        t = nxt
    return t


# lambda_i depends only on (alpha, live count): series share lengths, so
# one process-wide ladder cache turns ~max_k t-quantile bisections per
# series into at most one per distinct (alpha, n) — the executor-side
# speedup that keeps the sf0.1 sweep in seconds
_LAMBDA_CACHE: dict = {}


def _gesd_lambda(alpha: float, ni: int) -> float:
    key = (alpha, ni)
    lam = _LAMBDA_CACHE.get(key)
    if lam is None:
        p = 1.0 - alpha / (2.0 * ni)
        t = t_ppf(p, ni - 2)
        lam = (ni - 1) * t / np.sqrt((ni - 2 + t * t) * ni)
        _LAMBDA_CACHE[key] = lam
    return lam


def gesd_outliers(
    x: np.ndarray,
    max_k: int,
    alpha: float = 0.05,
    robust: bool = False,
):
    """Generalized (many-outlier) ESD test (Rosner 1983, "Percentage
    points for a generalized ESD many-outlier procedure"): iteratively
    remove the most extreme point and compare each test statistic
    ``R_i = max |x - center| / spread`` against the critical value
    ``lambda_i = (n - i) * t / sqrt((n - i - 1 + t^2) * (n - i + 1))``
    with ``t = t_ppf(1 - alpha / (2 (n - i + 1)), n - i - 1)``; the
    declared outlier count is the LARGEST ``i`` with ``R_i > lambda_i``
    (later exceedances resurrect earlier non-exceedances — the part
    naive repeated Grubbs gets wrong).

    ``robust=True`` is the Seasonal-Hybrid ESD reading (Hochenbaum,
    Vallis & Kejariwal 2017, "Automatic anomaly detection in the cloud
    via statistical learning"): median/MAD replace mean/std so massive
    anomalies cannot mask each other. Ties on the max deviation break
    on the LOWEST index — a pinned total order.

    Returns ``(idx, r_stats, lambdas, n_declared)`` where ``idx`` holds
    the removal order (first ``n_declared`` entries are the declared
    anomalies)."""
    x = np.asarray(x, dtype=np.float64)
    n = x.shape[0]
    max_k = int(min(max_k, max(n - 2, 0)))
    if max_k < 1:
        return (np.empty(0, np.int64), np.empty(0), np.empty(0), 0)
    live = np.ones(n, dtype=bool)
    idx = np.empty(max_k, dtype=np.int64)
    r_stats = np.empty(max_k, dtype=np.float64)
    lambdas = np.empty(max_k, dtype=np.float64)
    for i in range(max_k):
        vals = x[live]
        if robust:
            center = float(np.median(vals))
            mad = float(np.median(np.abs(vals - center)))
            spread = 1.4826 * mad  # consistent sigma-hat under normality
        else:
            center = float(vals.mean())
            spread = float(vals.std(ddof=1))
        if spread <= 0.0:
            # no variation left in the live set: nothing further is
            # declarable (the reference S-H-ESD stops here too) —
            # truncate the sweep instead of emitting inf statistics
            idx, r_stats, lambdas = idx[:i], r_stats[:i], lambdas[:i]
            break
        dev = np.abs(x - center)
        dev[~live] = -np.inf
        j = int(np.argmax(dev))  # argmax takes the lowest index on ties
        r_stats[i] = dev[j] / spread
        ni = int(live.sum())  # Rosner's n - i + 1 == points still live
        lambdas[i] = _gesd_lambda(alpha, ni)
        idx[i] = j
        live[j] = False
    exceed = np.nonzero(r_stats > lambdas)[0]
    n_declared = int(exceed[-1]) + 1 if exceed.size else 0
    return idx, r_stats, lambdas, n_declared


# ------------------------------------------------ Holt-Winters (additive)

def hw_init(x2m, m: int, alpha: float, beta: float, gamma: float):
    """Additive Holt-Winters warmup (Winters 1960) over the first
    ``2m`` observations: textbook init from the first two periods
    (level = first-period mean, trend = (second-period mean - first) /
    m, seasonals = first-period deviations), then the recursion is run
    over the second period so the state leaving warmup has consumed
    exactly ``x2m``. Returns ``(level, trend, seasonals)`` as plain
    floats — the O(m) state both the batch kernel and the streaming
    twin carry."""
    if len(x2m) != 2 * m:
        raise ValueError(f"warmup needs exactly 2m={2 * m} values")
    mean1 = sum(x2m[:m]) / m
    mean2 = sum(x2m[m:]) / m
    s = [x2m[i] - mean1 for i in range(m)]
    lvl, b = mean1, (mean2 - mean1) / m
    for t in range(m, 2 * m):
        _, lvl, b = hw_step(lvl, b, s, t, x2m[t], m, alpha, beta, gamma)
    return lvl, b, s


def hw_step(lvl, b, s, t: int, x_t, m: int,
            alpha: float, beta: float, gamma: float):
    """One Holt-Winters update: returns ``(abs one-step-ahead forecast
    error, new level, new trend)`` and rewrites ``s[t % m]`` in place —
    the SINGLE shared code path for the batch kernel and the streaming
    twin, so streamed scores are byte-equal by construction."""
    i = t % m
    f = lvl + b + s[i]
    err = abs(x_t - f)
    lvl_new = alpha * (x_t - s[i]) + (1.0 - alpha) * (lvl + b)
    b_new = beta * (lvl_new - lvl) + (1.0 - beta) * b
    s[i] = gamma * (x_t - lvl_new) + (1.0 - gamma) * s[i]
    return err, lvl_new, b_new


def hw_scores_1d(x: np.ndarray, m: int, alpha: float = 0.3,
                 beta: float = 0.1, gamma: float = 0.2) -> np.ndarray:
    """Per-observation Holt-Winters forecast-error scores: |x_t - (level
    + trend + seasonal)| one step ahead, 0 through the 2m-point causal
    warmup (and everywhere when the series is shorter than 2m + 1).
    The score of a point never uses that point's own value — a genuine
    online forecaster replayed in batch."""
    if m < 2:
        raise ValueError(f"period must be >= 2, got {m}")
    x = np.asarray(x, dtype=np.float64)
    n = x.shape[0]
    out = np.zeros(n, dtype=np.float64)
    if n < 2 * m + 1:
        return out
    xs = x.tolist()
    lvl, b, s = hw_init(xs[: 2 * m], m, alpha, beta, gamma)
    for t in range(2 * m, n):
        out[t], lvl, b = hw_step(lvl, b, s, t, xs[t], m, alpha, beta, gamma)
    return out


# ------------------------------------------------ PELT changepoints

def _seg_cost(cs: np.ndarray, cs2: np.ndarray, a, b):
    """Gaussian mean-shift segment cost of x[a:b): residual sum of
    squares around the segment mean, ``sumsq - sum^2 / len`` —
    vectorized over an array of starts ``a``."""
    ln = b - a
    sm = cs[b] - cs[a]
    return (cs2[b] - cs2[a]) - sm * sm / ln


def pelt_mean(x: np.ndarray, beta: float):
    """PELT exact changepoint segmentation (Killick, Fearnhead &
    Eckley 2012, "Optimal detection of changepoints with a linear
    computational cost"): minimize ``sum of segment RSS + beta * (#
    changepoints)`` over ALL segmentations — the same optimum as the
    O(n^2) optimal-partitioning DP (pinned by test), found with the
    paper's pruning ``F(s) + C(s, t) <= F(t) -> keep s`` (valid here
    because RSS cost is concave-additive: C(a,c) >= C(a,b) + C(b,c)).

    Returns the sorted array of changepoint positions (each the FIRST
    index of a new segment; empty when one segment is optimal)."""
    x = np.asarray(x, dtype=np.float64)
    n = x.shape[0]
    if beta < 0 or not np.isfinite(beta):
        raise ValueError(f"beta must be finite and >= 0, got {beta}")
    if n == 0:
        return np.empty(0, dtype=np.int64)
    csa = np.concatenate([[0.0], np.cumsum(x)])
    cs2a = np.concatenate([[0.0], np.cumsum(x * x)])
    # hybrid inner loop: plain-float candidate scan while the pruned set
    # is small (the common case — numpy's per-call overhead dominates
    # tiny arrays), vectorized scan once it grows. Both branches use
    # the IDENTICAL float summation order ((d2 - q) + F), so the
    # switch changes nothing but speed — ties resolve the same way.
    cs = csa.tolist()
    cs2 = cs2a.tolist()
    F = np.empty(n + 1)
    F[0] = -beta
    Fl = F  # numpy buffer is indexable from both paths
    prev = np.zeros(n + 1, dtype=np.int64)
    R: list = [0]
    SWITCH = 64
    Rbuf = cand = None
    m = 1
    use_np = False
    for t in range(1, n + 1):
        if not use_np and len(R) >= SWITCH:
            use_np = True
            Rbuf = np.empty(n + 1, dtype=np.int64)
            m = len(R)
            Rbuf[:m] = R
            cand = np.empty(n + 1)
        if use_np:
            r = Rbuf[:m]
            c = cand[:m]
            np.subtract(csa[t], csa[r], out=c)
            c *= c
            c /= t - r
            np.subtract(cs2a[t] - cs2a[r], c, out=c)
            c += Fl[r]
            j = int(np.argmin(c))
            best = c[j]
            F[t] = best + beta
            prev[t] = r[j]
            keep = c <= best + beta
            m2 = int(keep.sum())
            Rbuf[:m2] = r[keep]
            Rbuf[m2] = t
            m = m2 + 1
        else:
            cst, cst2 = cs[t], cs2[t]
            best = None
            bs = 0
            vals = []
            for sv in R:
                sm = cst - cs[sv]
                # same float summation ORDER as the vectorized branch
                # ((d2 - q) + F), so the path switch cannot flip a tie
                v = ((cst2 - cs2[sv]) - sm * sm / (t - sv)) + Fl[sv]
                vals.append(v)
                if best is None or v < best:
                    best, bs = v, sv
            F[t] = best + beta
            prev[t] = bs
            thr = best + beta
            R = [sv for sv, v in zip(R, vals) if v <= thr]
            R.append(t)
    cps = []
    t = n
    while t > 0:
        s = int(prev[t])
        if s > 0:
            cps.append(s)
        t = s
    return np.asarray(sorted(cps), dtype=np.int64)
