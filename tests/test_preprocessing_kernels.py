"""Golden tests for preprocessing kernels — inputs/expected values mirror
/root/reference/tests/preprocessing/* (MovingAverage, Differencing, PAA,
scalers, undersamplers, EMA)."""

import numpy as np
import pytest

from dtaianomaly_spark.kernels import preprocessing as P

X8 = np.array([1, 5, 3, 7, 8, 6, 4, 11], dtype=float)
Y8 = np.array([0, 1, 0, 0, 0, 1, 0, 1], dtype=float)


class TestMovingAverage:
    def test_odd_window(self):
        assert P.moving_average(X8, 3) == pytest.approx([3, 3, 5, 6, 7, 6, 7, 7.5])

    def test_even_window(self):
        assert P.moving_average(X8, 4) == pytest.approx([3, 3, 4, 5.75, 6, 6.25, 7.25, 7])

    def test_multivariate(self):
        X = np.stack([X8, X8 * 10], axis=1)
        out = P.moving_average(X, 3)
        assert out[:, 0] == pytest.approx([3, 3, 5, 6, 7, 6, 7, 7.5])
        assert out[:, 1] == pytest.approx([30, 30, 50, 60, 70, 60, 70, 75])

    def test_window_1_identity(self):
        assert np.array_equal(P.moving_average(X8, 1), X8)


class TestDifferencing:
    def test_order_1(self):
        assert np.array_equal(P.differencing(X8, 1), [0, 4, -2, 4, 1, -2, -2, 7])

    def test_order_0_identity(self):
        assert np.array_equal(P.differencing(X8, 0), X8)

    def test_seasonal(self):
        out = P.differencing(X8, 1, window_size=2)
        assert np.array_equal(out, [0, 0, 2, 2, 5, -1, -4, 5])

    def test_order_2(self):
        out = P.differencing(X8, 2)
        first = np.array([0, 4, -2, 4, 1, -2, -2, 7], dtype=float)
        expected = np.concatenate([[0], np.diff(first)])
        assert np.array_equal(out, expected)


class TestPAA:
    def test_n_1_is_mean(self):
        out, _ = P.paa_transform(X8, None, 1)
        assert out == pytest.approx([X8.mean()])

    def test_n_ge_len_identity(self):
        out, y = P.paa_transform(X8, Y8, 8)
        assert np.array_equal(out, X8)
        assert np.array_equal(y, Y8)

    def test_n_2(self):
        out, y = P.paa_transform(X8, Y8, 2)
        assert out == pytest.approx([4.0, 7.25])
        # paa(y) = [0.25, 0.5] -> labels [0, 1]
        assert np.array_equal(y, [0, 1])

    def test_frame_of_pos_matches_boundaries(self):
        for n, f in [(10, 3), (100, 7), (8, 2), (1400, 60), (61, 60)]:
            bounds = P.paa_boundaries(n, f)
            frames = P.paa_frame_of_pos(np.arange(n), n, f)
            for j, (s, e) in enumerate(zip(bounds[:-1], bounds[1:])):
                assert np.all(frames[s:e] == j)


class TestScalers:
    def test_minmax(self):
        mn, mx = P.minmax_fit(X8)
        out = P.minmax_transform(X8, mn, mx)
        assert out == pytest.approx((X8 - 1) / 10)

    def test_minmax_constant(self):
        mn, mx = P.minmax_fit(np.ones(5))
        assert mn == [0] and mx == [1]
        assert np.array_equal(P.minmax_transform(np.ones(5), mn, mx), np.ones(5))

    def test_standard_population_std(self):
        mean, std = P.standard_fit(X8)
        assert mean[0] == pytest.approx(X8.mean())
        assert std[0] == pytest.approx(X8.std())  # ddof=0
        out = P.standard_transform(X8, mean, std)
        assert out == pytest.approx((X8 - X8.mean()) / X8.std())

    def test_standard_constant_passthrough(self):
        x = np.ones(5)
        mean, std = P.standard_fit(x)
        assert np.array_equal(P.standard_transform(x, mean, std), x)

    def test_standard_multivariate_low_std_column(self):
        X = np.stack([X8, np.ones(8)], axis=1)
        mean, std = P.standard_fit(X)
        out = P.standard_transform(X, mean, std)
        assert out[:, 0] == pytest.approx((X8 - X8.mean()) / X8.std())
        assert np.array_equal(out[:, 1], np.ones(8))

    def test_robust(self):
        center, scale = P.robust_fit(X8)
        assert center[0] == pytest.approx(np.median(X8))
        q25, q75 = np.percentile(X8, [25, 75])
        assert scale[0] == pytest.approx(q75 - q25)
        out = P.robust_transform(X8, center, scale)
        assert out == pytest.approx((X8 - np.median(X8)) / (q75 - q25))

    def test_robust_zero_iqr_fallback(self):
        x = np.ones(9)
        center, scale = P.robust_fit(x)
        assert np.array_equal(P.robust_transform(x, center, scale), x)


class TestEMA:
    @pytest.mark.parametrize("alpha", [0.1, 0.5, 0.9])
    def test_matches_sequential_recursion(self, alpha):
        rng = np.random.default_rng(7)
        x = rng.normal(size=500)
        seq = np.empty_like(x)
        seq[0] = x[0]
        for t in range(1, x.shape[0]):
            seq[t] = alpha * seq[t - 1] + (1 - alpha) * x[t]
        assert P.exponential_moving_average(x, alpha) == pytest.approx(seq, abs=1e-10)

    def test_first_value_identity(self):
        out = P.exponential_moving_average(X8, 0.5)
        assert out[0] == X8[0]
        assert out[1] == 0.5 * X8[0] + 0.5 * X8[1]


class TestUndersample:
    def test_rate(self):
        assert np.array_equal(P.undersample_rate(X8, 2), X8[::2])
        with pytest.raises(ValueError):
            P.undersample_rate(X8, 8)

    def test_nb_samples(self):
        idx = P.undersample_indices(10, 4)
        assert np.array_equal(idx, [0, 3, 6, 9])
        assert np.array_equal(P.undersample_indices(5, 10), np.arange(5))


def test_classical_decompose_recovers_planted_seasonality(spark):
    """A pure trend+seasonal series (no noise) decomposes back to its
    components: away from the edges, trend matches the linear ramp and
    seasonal recovers the planted per-phase offsets up to the fold
    centering; remainder is ~0."""
    import numpy as np
    from pyspark.sql import functions as F

    from dtaianomaly_spark.operators.preprocessing import classical_decompose

    period, n = 8, 160
    season = np.array([40, -10, 0, 30, -40, 10, 0, -30])  # sums to 0
    rows = []
    for p in range(n):
        rows.append(("s", p, int(3 * p + season[p % period])))
    lf = spark.createDataFrame(rows, "doc_id string, pos long, value long")
    out = {
        r["pos"]: r
        for r in classical_decompose(lf, period).collect()
    }
    assert len(out) == n
    k = period // 2
    for p in range(n):
        r = out[p]
        if p < k or p >= n - k:
            assert r["trend"] is None and r["remainder"] is None
        else:
            # centered MA of linear trend = the trend itself; the planted
            # seasonal has a small MA leakage (window 2k+1 covers the
            # period once + 1 extra point), so allow its magnitude
            assert abs(r["trend"] - 3 * p) <= 40 / (2 * k + 1) + 1e-9
            assert abs(r["remainder"]) < 6.0, (p, r)
            assert abs(r["seasonal"] - season[p % period]) < 6.0


# ----------------------------------------------------------------- LTTB
def _lttb_naive(values, n_out):
    """Independent LTTB oracle: textbook loop, Fraction centroids, real
    (unscaled) triangle areas — none of the kernel's integer scaling."""
    from fractions import Fraction

    v = [int(x) for x in values]
    n = len(v)
    if n <= n_out:
        return list(range(n))
    every = Fraction(n - 2, n_out - 2)
    sel = [0]
    a = 0
    for i in range(n_out - 2):
        lo = 1 + int(i * every)
        hi = 1 + int((i + 1) * every)
        if i + 1 < n_out - 2:
            nlo, nhi = 1 + int((i + 1) * every), 1 + int((i + 2) * every)
            cx = Fraction(sum(range(nlo, nhi)), nhi - nlo)
            cy = Fraction(sum(v[nlo:nhi]), nhi - nlo)
        else:
            cx, cy = Fraction(n - 1), Fraction(v[n - 1])
        best, best_area = None, Fraction(-1)
        for b in range(lo, hi):
            area = abs(
                (Fraction(a) - cx) * (v[b] - v[a])
                - Fraction(a - b) * (cy - v[a])
            )
            if area > best_area:
                best, best_area = b, area
        sel.append(best)
        a = best
    sel.append(n - 1)
    return sel


def test_lttb_kernel_matches_fraction_oracle():
    rng = np.random.default_rng(41)
    for _ in range(300):
        n = int(rng.integers(3, 120))
        v = rng.integers(-105, 106, n)
        for k in (3, 4, 7, 16, 50):
            got = P.lttb_indices(v, k).tolist()
            assert got == _lttb_naive(v, k), (v.tolist(), k)


def test_lttb_kernel_properties():
    v = np.arange(100)  # collinear: every area is 0, earliest-tie wins
    idx = P.lttb_indices(v, 10)
    assert idx[0] == 0 and idx[-1] == 99 and len(idx) == 10
    assert all(np.diff(idx) > 0)
    # constant series: same structure
    assert P.lttb_indices(np.zeros(50, dtype=np.int64), 5).tolist() == \
        _lttb_naive(np.zeros(50), 5)
    # pass-through when n <= n_out
    assert P.lttb_indices(np.array([1, 2, 3]), 8).tolist() == [0, 1, 2]
    with pytest.raises(ValueError, match="n_out"):
        P.lttb_indices(np.array([1, 2, 3, 4]), 2)
