"""Matrix-profile parameter surface (normalize / p / k / AB-join) and the
mstump multivariate composition, checked against NAIVE oracles written
straight from the published definitions (explicit per-window
z-normalization, O(n²·w) double loops, explicit sort-and-average across
dimensions) — fully independent of the kernels' recurrences.

Reference behavior being reproduced: MatrixProfileDetector.py:121-178
(stumpy.stump / stumpy.aamp / stumpy.mstump(discords=True))."""

import math
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dtaianomaly_spark.kernels import detectors as KD


# ------------------------------------------------------------ naive oracles

def _znorm_dist(a: np.ndarray, b: np.ndarray) -> float:
    """z-normalized Euclidean distance with the stumpy flat-window
    convention: both constant -> 0, one constant -> sqrt(w)."""
    sa, sb = a.std(), b.std()
    eps = 1e-14
    if sa < eps and sb < eps:
        return 0.0
    if sa < eps or sb < eps:
        return math.sqrt(len(a))
    za = (a - a.mean()) / sa
    zb = (b - b.mean()) / sb
    return float(np.sqrt(((za - zb) ** 2).sum()))


def _p_dist(a: np.ndarray, b: np.ndarray, p: float) -> float:
    return float((np.abs(a - b) ** p).sum() ** (1.0 / p))


def _dist_matrix(x, y, w, normalize, p):
    n_q, n_r = len(x) - w + 1, len(y) - w + 1
    D = np.empty((n_q, n_r))
    for i in range(n_q):
        for j in range(n_r):
            a, b = x[i : i + w], y[j : j + w]
            D[i, j] = _znorm_dist(a, b) if normalize else _p_dist(a, b, p)
    return D


def _naive_profile(x, w, x_ref=None, normalize=True, p=2.0, k=1):
    self_join = x_ref is None
    y = x if self_join else x_ref
    D = _dist_matrix(x, y, w, normalize, p)
    excl = math.ceil(w / 4)
    prof = np.empty(D.shape[0])
    for i in range(D.shape[0]):
        row = D[i].copy()
        if self_join:
            row[max(0, i - excl) : i + excl + 1] = np.inf
        srt = np.sort(row)
        prof[i] = srt[k - 1] if k <= len(srt) else np.inf
    if k == 1 and self_join:
        prof[~np.isfinite(prof)] = 0.0
    return prof


def _naive_mstump_sum(X, w, discords=True):
    n, d = X.shape
    l = n - w + 1
    Ds = np.stack(
        [_dist_matrix(X[:, a], X[:, a], w, True, 2.0) for a in range(d)]
    )  # (d, l, l)
    excl = math.ceil(w / 4)
    out = np.zeros(l)
    for i in range(l):
        block = Ds[:, i, :].copy()
        block[:, max(0, i - excl) : i + excl + 1] = np.inf
        block = np.sort(block, axis=0)
        if discords:
            block = block[::-1]
        for kk in range(d):
            out[i] += block[: kk + 1].mean(axis=0).min()
    return out


def _series(n, seed, flat_run=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=n).cumsum()
    if flat_run:
        x[n // 3 : n // 3 + flat_run] = x[n // 3]
    return x


# ------------------------------------------------------------------- tests

@pytest.mark.parametrize("k", [1, 2, 4])
def test_znorm_self_join_kth_neighbor(k):
    x = _series(120, seed=7)
    got = KD.matrix_profile_general(x, 16, k=k)
    np.testing.assert_allclose(got, _naive_profile(x, 16, k=k), atol=1e-8)


def test_znorm_self_join_with_flat_windows():
    x = _series(100, seed=3, flat_run=20)
    got = KD.matrix_profile_general(x, 8, k=1)
    np.testing.assert_allclose(got, _naive_profile(x, 8), atol=1e-8)
    got2 = KD.matrix_profile_general(x, 8, k=2)
    np.testing.assert_allclose(got2, _naive_profile(x, 8, k=2), atol=1e-8)


@pytest.mark.parametrize("p", [1.0, 1.5, 2.0, 3.0])
def test_non_normalized_p_norm_self_join(p):
    x = _series(90, seed=11)
    got = KD.matrix_profile_general(x, 12, normalize=False, p=p)
    np.testing.assert_allclose(
        got, _naive_profile(x, 12, normalize=False, p=p), atol=1e-8
    )


@pytest.mark.parametrize("normalize,p,k", [
    (True, 2.0, 1), (True, 2.0, 3), (False, 2.0, 1), (False, 1.5, 2),
])
def test_ab_join_novelty(normalize, p, k):
    x = _series(80, seed=5)
    ref = _series(110, seed=6)
    got = KD.matrix_profile_general(x, 10, x_ref=ref, normalize=normalize, p=p, k=k)
    np.testing.assert_allclose(
        got, _naive_profile(x, 10, x_ref=ref, normalize=normalize, p=p, k=k),
        atol=1e-8,
    )


def test_p_ignored_when_normalized():
    """stumpy ignores p for the z-normalized family; the kernel must too."""
    x = _series(70, seed=9)
    a = KD.matrix_profile_general(x, 8, normalize=True, p=2.0)
    b = KD.matrix_profile_general(x, 8, normalize=True, p=3.0)
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("d", [2, 3])
def test_mstump_sum_matches_naive(d):
    rng = np.random.default_rng(21 + d)
    X = rng.normal(size=(90, d)).cumsum(axis=0)
    got = KD.mstump_profile_sum(X, 12, discords=True)
    np.testing.assert_allclose(got, _naive_mstump_sum(X, 12, True), atol=1e-8)


def test_mstump_motifs_mode_matches_naive():
    rng = np.random.default_rng(33)
    X = rng.normal(size=(80, 2)).cumsum(axis=0)
    got = KD.mstump_profile_sum(X, 10, discords=False)
    np.testing.assert_allclose(got, _naive_mstump_sum(X, 10, False), atol=1e-8)


def test_mstump_d1_reduces_to_univariate():
    x = _series(100, seed=13)
    got = KD.mstump_profile_sum(x[:, None], 16)
    expect = KD.matrix_profile(x, 16)
    np.testing.assert_allclose(got, expect, atol=1e-10)


def test_mstump_differs_from_plain_attribute_sum():
    """The discord-sorted cumulative-average composition is NOT the plain
    per-attribute profile sum (the round-2 deviation this kernel fixes)."""
    rng = np.random.default_rng(4)
    X = rng.normal(size=(120, 2)).cumsum(axis=0)
    mstump = KD.mstump_profile_sum(X, 16)
    plain = KD.matrix_profile(X[:, 0], 16) + KD.matrix_profile(X[:, 1], 16)
    assert not np.allclose(mstump, plain)


def test_general_matches_fast_path_k1():
    """The generic engine path and the buffered STOMP fast path agree."""
    x = _series(150, seed=17)
    np.testing.assert_allclose(
        KD.matrix_profile_general(x, 20, k=1),
        KD.matrix_profile(x, 20),
        atol=1e-10,
    )


def test_short_series_and_reference_are_graceful():
    """A reference (or query) shorter than the window must not crash the
    Arrow task: empty profile for a short query, 0.0 (k=1) / +inf (k>1)
    for a reference with no windows — regression for the engine refactor
    which raised obscure numpy shape errors from novelty fits on short
    train splits."""
    x = _series(60, seed=2)
    short = x[:10]
    assert KD.matrix_profile(short, 16).shape == (0,)
    assert KD.matrix_profile_general(short, 16, k=2).shape == (0,)
    np.testing.assert_array_equal(
        KD.matrix_profile(x, 16, x_ref=short), np.zeros(45)
    )
    np.testing.assert_array_equal(
        KD.matrix_profile_general(x, 16, x_ref=short, normalize=False),
        np.zeros(45),
    )
    assert np.all(np.isinf(KD.matrix_profile_general(x, 16, x_ref=short, k=2)))


# ---------------------------------------------------- property tests

def test_matrix_profile_general_property_vs_naive():
    """Hypothesis sweep: random series / window / distance family / k —
    the engine-based kernel must match the naive O(n²·w) oracle."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        seed=st.integers(0, 10_000),
        n=st.integers(20, 90),
        w=st.integers(4, 16),
        k=st.integers(1, 3),
        normalize=st.booleans(),
        p=st.sampled_from([1.0, 1.5, 2.0, 3.0]),
        ab=st.booleans(),
    )
    def check(seed, n, w, k, normalize, p, ab):
        rng = np.random.default_rng(seed)
        x = rng.normal(size=n).cumsum()
        ref = rng.normal(size=max(w, n // 2)).cumsum() if ab else None
        got = KD.matrix_profile_general(
            x, w, x_ref=ref, normalize=normalize, p=p, k=k
        )
        want = _naive_profile(x, w, x_ref=ref, normalize=normalize, p=p, k=k)
        fin = np.isfinite(want)
        assert np.array_equal(fin, np.isfinite(got))
        np.testing.assert_allclose(got[fin], want[fin], atol=1e-7)

    check()


def test_left_matrix_profile_suffix_invariance_property():
    """The streaming bit-equality contract as a property: evaluating the
    left profile over ANY suffix long enough to cover the horizon must
    reproduce the full-series values exactly (==)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        seed=st.integers(0, 10_000),
        n=st.integers(60, 160),
        w=st.integers(4, 12),
        h=st.integers(4, 40),
        cut=st.integers(0, 40),
    )
    def check(seed, n, w, h, cut):
        rng = np.random.default_rng(seed)
        x = rng.normal(size=n).cumsum()
        full = KD.left_matrix_profile(x, w, horizon=h)
        # suffix starting at `cut`, evaluating windows whose full
        # lookback (h windows + w-1 values) lies inside the suffix
        suffix = x[cut:]
        sub = KD.left_matrix_profile(suffix, w, horizon=h)
        first_covered = h + w - 1  # local window index with full lookback
        for i_loc in range(first_covered, sub.shape[0]):
            assert sub[i_loc] == full[cut + i_loc]

    check()


def test_engine_blocked_rows_match_row_loop():
    """The blocked `rows(i0, i1)` sweep must reproduce the sequential
    `row(i)` values exactly for every engine family — the contract the
    blocked kernel call sites rest on. Fresh engine per mode because
    both APIs advance the same QT recurrence."""
    from dtaianomaly_spark.kernels.detectors import (
        _Aamp2Engine, _AampPEngine, _ZnormEngine,
    )

    rng = np.random.default_rng(11)
    x = rng.normal(size=120).cumsum()
    y = rng.normal(size=90).cumsum()
    x[20:30] = 3.0  # flat run on the query side
    y[40:52] = -1.0  # flat run on the reference side
    w = 8
    makers = [
        lambda: _ZnormEngine(x, y, w),
        lambda: _Aamp2Engine(x, y, w),
        lambda: _AampPEngine(x, y, w, 1.5),
    ]
    for make in makers:
        seq = make()
        expect = np.stack([seq.row(i).copy() for i in range(seq.n_q)])
        blk = make()
        got = np.empty_like(expect)
        for i0 in range(0, blk.n_q, 7):  # odd block size incl. short tail
            i1 = min(i0 + 7, blk.n_q)
            got[i0:i1] = blk.rows(i0, i1)
        np.testing.assert_array_equal(got, expect, err_msg=type(seq).__name__)


# ---------------------------------------------------- mv + k adjudication
# Reference behavior when MatrixProfileDetector(k=...) meets multivariate
# input (MatrixProfileDetector.py:139-176), pinned branch by branch:
#
# * mv SELF-JOIN (:169-175): stumpy.mstump takes NO k parameter — the
#   reference silently drops k. The engine matches: mp_profile ignores k
#   on the mstump branch.
# * mv NOVELTY (:153-167): k IS forwarded to each per-attribute
#   stumpy.stump AB-join and the k-th neighbor column [:, k-1] is taken.
#   The engine matches: mp_profile forwards k per attribute.
# * the reference then runs np.sum(matrix_profiles, axis=0) on an array
#   it filled as (n_windows, d) — on ITS novelty branch axis=0 sums over
#   WINDOWS, yielding a d-length vector that cannot feed
#   reverse_sliding_window (a latent shape bug; the self-join branch's
#   mstump output is (d, n_windows), where axis=0 is correct). The
#   engine implements the evident intent — sum over ATTRIBUTES — which
#   is the only reading that produces per-window profiles; pinned below.


def test_mv_self_join_silently_ignores_k_like_the_reference():
    from dtaianomaly_spark.operators.detectors import mp_profile

    rng = np.random.default_rng(51)
    X = rng.normal(size=(100, 2)).cumsum(axis=0)
    np.testing.assert_array_equal(
        mp_profile(X, 12, k=1), mp_profile(X, 12, k=3)
    )


def test_mv_novelty_forwards_k_per_attribute_sums_over_attributes():
    from dtaianomaly_spark.operators.detectors import mp_profile

    rng = np.random.default_rng(52)
    X = rng.normal(size=(80, 3)).cumsum(axis=0)
    R = rng.normal(size=(120, 3)).cumsum(axis=0)
    for k in (1, 2):
        got = mp_profile(X, 10, x_ref=R, k=k)
        manual = sum(
            KD.matrix_profile_general(
                np.ascontiguousarray(X[:, a]), 10,
                np.ascontiguousarray(R[:, a]), k=k,
            )
            for a in range(3)
        )
        assert got.shape == (80 - 10 + 1,)  # per-WINDOW, never d-length
        np.testing.assert_allclose(got, manual, atol=1e-8)
    # k really changes the mv novelty profile (it is forwarded, not dropped)
    assert not np.allclose(
        mp_profile(X, 10, x_ref=R, k=1), mp_profile(X, 10, x_ref=R, k=2)
    )


# ------------------------------------------------- motif / discord extraction

def _naive_pair_matrix(x, w):
    """Full admissible z-norm distance matrix, inf inside the exclusion."""
    n = len(x) - w + 1
    excl = int(np.ceil(w / 4))
    D = np.full((n, n), np.inf)
    for i in range(n):
        a = x[i:i + w]
        az = (a - a.mean()) / (a.std() if a.std() > 1e-14 else 1.0)
        for j in range(n):
            if abs(i - j) < excl:
                continue
            b = x[j:j + w]
            bz = (b - b.mean()) / (b.std() if b.std() > 1e-14 else 1.0)
            D[i, j] = np.sqrt(((az - bz) ** 2).sum())
    return D


def test_pair_index_matches_naive():
    rng = np.random.default_rng(61)
    x = rng.normal(0, 1, 140).cumsum()
    prof, nn = KD.matrix_profile_pair_index(x, 12)
    D = _naive_pair_matrix(x, 12)
    np.testing.assert_allclose(prof, D.min(axis=1), atol=1e-6)
    # argmin may differ only where distances tie within tolerance
    for i in range(len(prof)):
        assert abs(D[i, nn[i]] - D[i].min()) < 1e-6


def test_top_motifs_and_discords_respect_exclusion():
    rng = np.random.default_rng(62)
    motif = rng.normal(0, 1, 16)
    x = np.concatenate(
        [motif, rng.normal(0, 1, 60).cumsum(), motif, rng.normal(0, 1, 40)]
    )
    prof, nn = KD.matrix_profile_pair_index(x, 16)
    excl = 4
    motifs = KD.top_motifs(prof, nn, 3, excl)
    # the planted exact repeat is the #1 motif pair
    assert motifs[0][0] == 0 and motifs[0][1] == 16 + 60
    assert motifs[0][2] < 1e-6
    reported = [m[0] for m in motifs] + [m[1] for m in motifs]
    for i, a in enumerate(reported):
        for b in reported[:i]:
            assert abs(a - b) >= excl, (a, b)
    discords = KD.top_discords(prof, 3, excl)
    assert all(
        abs(discords[i][0] - discords[j][0]) >= excl
        for i in range(3) for j in range(i)
    )
    assert discords[0][1] >= discords[1][1] >= discords[2][1]
