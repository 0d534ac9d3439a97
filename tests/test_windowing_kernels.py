"""Golden tests for the windowing kernels.

Inputs and expected values reproduce the reference's own unit tests
(/root/reference/tests/anomaly_detection/test_windowing_utils.py) so the
engine's window semantics byte-match the reference, including the irregular
tail window and its reverse mapping.
"""

import numpy as np
import pytest

from dtaianomaly_spark.kernels import windowing as W
from tests.conftest import make_demonstration_time_series


class TestSlidingWindow:
    def test_stride1_odd_w(self):
        wins = W.sliding_window(np.arange(10), 3, 1)
        assert wins.shape == (8, 3)
        assert np.array_equal(wins[0], [0, 1, 2])
        assert np.array_equal(wins[7], [7, 8, 9])

    def test_stride1_even_w(self):
        wins = W.sliding_window(np.arange(10), 4, 1)
        assert wins.shape == (7, 4)
        assert np.array_equal(wins[6], [6, 7, 8, 9])

    def test_nice_fit(self):
        wins = W.sliding_window(np.arange(11), 3, 2)
        assert wins.shape == (5, 3)
        assert np.array_equal(wins, [[0, 1, 2], [2, 3, 4], [4, 5, 6], [6, 7, 8], [8, 9, 10]])

    def test_not_nice_fit(self):
        wins = W.sliding_window(np.arange(10), 3, 2)
        assert wins.shape == (5, 3)
        # tail window overlaps irregularly
        assert np.array_equal(wins, [[0, 1, 2], [2, 3, 4], [4, 5, 6], [6, 7, 8], [7, 8, 9]])

    def test_large_stride(self):
        wins = W.sliding_window(np.arange(20), 6, 4)
        assert wins.shape == (5, 6)
        assert np.array_equal(wins[3], [12, 13, 14, 15, 16, 17])
        assert np.array_equal(wins[4], [14, 15, 16, 17, 18, 19])

    def test_multivariate_interleave(self):
        x = np.array([np.arange(10), np.arange(10) * 10]).T
        wins = W.sliding_window(x, 3, 1)
        assert wins.shape == (8, 6)
        assert np.array_equal(wins[0], [0, 0, 1, 10, 2, 20])
        assert np.array_equal(wins[7], [7, 70, 8, 80, 9, 90])

    def test_multivariate_not_nice_fit(self):
        x = np.array([np.arange(10), np.arange(10) * 10]).T
        wins = W.sliding_window(x, 3, 2)
        assert np.array_equal(wins[4], [7, 70, 8, 80, 9, 90])

    def test_num_windows_matches(self):
        for n, w, s in [(10, 3, 1), (10, 4, 1), (11, 3, 2), (10, 3, 2), (20, 6, 4),
                        (10, 1, 1), (15, 3, 3), (10, 10, 1), (100, 7, 13)]:
            assert W.num_windows(n, w, s) == W.sliding_window(np.arange(n), w, s).shape[0]


class TestReverseSlidingWindow:
    def test_window_size_1(self):
        out = W.reverse_sliding_window(np.arange(10), 1, 1, 10)
        assert np.array_equal(out, np.arange(10))

    def test_stride_1(self):
        out = W.reverse_sliding_window(np.arange(8), 3, 1, 10)
        assert np.array_equal(out, [0, 0.5, 1, 2, 3, 4, 5, 6, 6.5, 7])

    def test_stride_1_bigger_numbers(self):
        out = W.reverse_sliding_window(2 ** np.arange(8), 3, 1, 10)
        expected = [1, 1.5, 7 / 3, 14 / 3, 28 / 3, 56 / 3, 112 / 3, 224 / 3, 96, 128]
        assert out == pytest.approx(expected)

    def test_nice_fit(self):
        out = W.reverse_sliding_window(np.arange(5), 3, 2, 11)
        assert np.array_equal(out, [0, 0, 0.5, 1, 1.5, 2, 2.5, 3, 3.5, 4, 4])

    def test_not_nice_fit(self):
        out = W.reverse_sliding_window(np.arange(5), 3, 2, 10)
        assert np.array_equal(out, [0, 0, 0.5, 1, 1.5, 2, 2.5, 3.5, 3.5, 4])

    def test_non_overlapping(self):
        out = W.reverse_sliding_window(np.arange(5), 3, 3, 15)
        assert np.array_equal(out, np.repeat(np.arange(5), 3))


class TestCheckIsValidWindowSize:
    def test_valid(self):
        for i in range(1, 100):
            W.check_is_valid_window_size(i)
        for s in ["fft", "acf", "mwf", "suss"]:
            W.check_is_valid_window_size(s)

    @pytest.mark.parametrize("bad", [-10, -1, 0, "nope", 1.0, True, False])
    def test_invalid(self, bad):
        with pytest.raises(ValueError):
            W.check_is_valid_window_size(bad)


class TestComputeWindowSize:
    def test_integer_passthrough(self):
        for i in range(1, 100):
            assert W.compute_window_size(np.array([1, 2, 3]), i) == i

    def test_multivariate_int_ok_auto_fails(self):
        X = np.random.default_rng(0).normal(size=(500, 3))
        assert W.compute_window_size(X, 16) == 16
        with pytest.raises(ValueError):
            W.compute_window_size(X, "fft")

    @pytest.mark.parametrize("nb_periods", [5, 10])
    def test_fft_simple(self, nb_periods):
        X = np.sin(np.linspace(0, nb_periods * 2 * np.pi, 5000))
        assert W.compute_window_size(X, "fft") == 5000 / nb_periods

    @pytest.mark.parametrize("period_size", [25, 42])
    @pytest.mark.parametrize("nb_periods", [5, 10])
    def test_acf_simple(self, period_size, nb_periods):
        rng = np.random.default_rng(42)
        X = np.tile(rng.uniform(size=period_size), nb_periods)
        assert W.compute_window_size(X, "acf") == period_size

    def test_mwf_three_periods(self):
        X = np.sin(np.linspace(0, 1.5 * 2 * np.pi, 500))
        assert W.compute_window_size(X, "mwf", upper_bound=500) == pytest.approx(500 // 3, abs=5)

    def test_suss_exact_threshold(self):
        X, _ = make_demonstration_time_series()
        assert W.compute_window_size(X, "suss", threshold=0.9437091537824681) == 104

    @pytest.mark.parametrize("mode", ["fft", "acf", "mwf", "suss"])
    def test_demonstration_series(self, mode):
        X, _ = make_demonstration_time_series()
        assert W.compute_window_size(X, mode, threshold=0.95) == pytest.approx(1400 / 12.5, abs=10)

    @pytest.mark.parametrize("mode", ["fft", "acf", "mwf", "suss"])
    def test_flat_series(self, mode):
        flat = np.ones(1000)
        with pytest.raises(ValueError):
            W.compute_window_size(flat, mode)
        assert W.compute_window_size(flat, mode, default_window_size=16) == 16

    @pytest.mark.parametrize("mode", ["fft", "acf", "mwf", "suss"])
    def test_invalid_bounds_default(self, mode, univariate_time_series):
        x = univariate_time_series
        assert (
            W.compute_window_size(
                x, mode,
                lower_bound=x.shape[0] // 2,
                upper_bound=x.shape[0] // 3,
                default_window_size=16,
            )
            == 16
        )


# --------------------------------------- DGIM exponential histogram

def test_eh_bounds_on_adversarial_streams():
    import math

    from dtaianomaly_spark.kernels.eh import ExpHistogram

    rng = np.random.default_rng(9)
    for r in (2, 4, 8):
        for W in (32, 256):
            flags, t = [], 0
            for _ in range(2500):
                t += int(rng.integers(1, 4))
                # bursty: dense and sparse regimes alternate
                if rng.random() < (0.95 if (t // 150) % 2 == 0 else 0.02):
                    flags.append(t)
            eh = ExpHistogram(W, r)
            fi, fset = 0, set(flags)
            true = 0
            from collections import deque
            dq = deque()
            for now in range(1, t + 1):
                if now in fset:
                    eh.add(now)
                    dq.append(now)
                while dq and dq[0] <= now - W:
                    dq.popleft()
                true = len(dq)
                est = eh.estimate(now)
                # analytic per-instant bound: half the oldest bucket
                assert abs(est - true) <= eh.max_error() + 1e-9
                # uniform bound: max(1/2, true / r) — see kernels/eh.py
                assert abs(est - true) <= max(0.5, true / r) + 1e-9
                # O(r log W) state
                assert eh.n_buckets() <= r * (int(math.log2(W)) + 2)
            # something actually happened
            assert len(flags) > 500


def test_eh_exact_when_sparse_and_errors():
    from dtaianomaly_spark.kernels.eh import ExpHistogram

    eh = ExpHistogram(100, 4)
    # fewer than r events: no merge ever happens -> exact except the
    # half-count of the oldest bucket
    for t in (10, 30, 50):
        eh.add(t)
    assert eh.estimate(50) == 2.5  # 3 size-1 buckets, oldest halved
    assert eh.estimate(200) == 0.0  # all expired
    with pytest.raises(ValueError, match="window"):
        ExpHistogram(0)
    with pytest.raises(ValueError, match="r must"):
        ExpHistogram(10, 1)


def test_eh_operator_and_query_audit(spark):
    from dtaianomaly_spark.kernels.eh import ExpHistogram
    from dtaianomaly_spark.operators.windows import eh_sliding_count_map

    rows = []
    rng = np.random.default_rng(4)
    flags = {}
    for d in ("a", "b"):
        fl = (rng.random(600) < 0.3).astype(int)
        flags[d] = fl
        rows += [(d, p, int(fl[p])) for p in range(600)]
    df = spark.createDataFrame(rows, "doc_id string, pos long, flag int")
    got = {
        (r["doc_id"], r["pos"]): (r["est"], r["n_buckets"])
        for r in eh_sliding_count_map(df, window=64, r=4).collect()
    }
    for d, fl in flags.items():
        eh = ExpHistogram(64, 4)
        for p in range(600):
            if fl[p]:
                eh.add(p)
            assert got[(d, p)] == (eh.estimate(p), eh.n_buckets())
    # driver query: bound visible in every row at sf0.001
    import __spark_entry__ as E

    out = E.queries()["sw_eh_sliding"](spark, "/root/testdata/sf0.001")
    agg = out.selectExpr(
        "max(abs(est - exact) - greatest(0.5, exact / 4.0)) AS worst",
        "max(n_buckets) AS mb",
        "count(*) AS n",
        "sum(CASE WHEN exact > 0 THEN 1 ELSE 0 END) AS nz",
    ).collect()[0]
    assert agg["worst"] <= 1e-9
    assert agg["mb"] <= 4 * 10  # r * (log2(256) + 2)
    assert agg["n"] > 100_000 and agg["nz"] > 1000


def test_pacf_from_acf_matches_yule_walker_solve():
    """Durbin-Levinson pacf_k equals the last coefficient of the
    order-k Yule-Walker solution solved independently via a dense
    Toeplitz system, for several random stationary-ish series."""
    rng = np.random.RandomState(5)
    for _ in range(6):
        x = np.cumsum(rng.normal(size=400)) * 0.1 + rng.normal(size=400)
        rho = W.acf(x, 8)
        got = W.pacf_from_acf(rho)
        for k in range(1, 9):
            R = np.empty((k, k))
            for i in range(k):
                for j in range(k):
                    R[i, j] = rho[abs(i - j)]
            sol = np.linalg.solve(R, rho[1:k + 1])
            assert got[k - 1] == pytest.approx(sol[-1], rel=1e-8, abs=1e-10)


def test_pacf_white_noise_near_zero_and_ar1_spike():
    rng = np.random.RandomState(9)
    w = rng.normal(size=5000)
    p = W.pacf_from_acf(W.acf(w, 8))
    assert np.all(np.abs(p) < 0.05)  # white: all pacf ~ 0
    # AR(1): pacf_1 ~ phi, higher lags ~ 0
    x = np.empty(5000)
    x[0] = 0.0
    for t in range(1, 5000):
        x[t] = 0.6 * x[t - 1] + w[t]
    p = W.pacf_from_acf(W.acf(x, 8))
    assert p[0] == pytest.approx(0.6, abs=0.05)
    assert np.all(np.abs(p[1:]) < 0.06)
    with pytest.raises(ValueError):
        W.pacf_from_acf(np.array([1.0]))


class TestPeriodogram:
    def test_matches_naive_dft(self):
        """FFT periodogram == the textbook O(n²) DFT sum, bin by bin."""
        rng = np.random.default_rng(31)
        for n in (16, 37, 128):
            x = rng.normal(0, 3, n)
            p = W.periodogram(x)
            xc = x - x.mean()
            t = np.arange(n)
            for k in range(1, n // 2 + 1):
                re = float((xc * np.cos(2 * np.pi * k * t / n)).sum())
                im = float((xc * np.sin(2 * np.pi * k * t / n)).sum())
                naive = (re * re + im * im) / n
                assert p[k - 1] == pytest.approx(naive, rel=1e-9, abs=1e-9)

    def test_pure_tone_peak_analytic(self):
        """A pure cosine at Fourier frequency k0 concentrates ALL power
        in bin k0 with the analytic value n·A²/4."""
        n, k0, amp = 256, 8, 5.0
        t = np.arange(n)
        x = amp * np.cos(2 * np.pi * k0 * t / n)
        p = W.periodogram(x)
        assert int(W.spectral_peaks(p, 1)[0]) + 1 == k0
        assert p[k0 - 1] == pytest.approx(n * amp * amp / 4, rel=1e-9)
        others = np.delete(p, k0 - 1)
        assert np.all(others < 1e-6 * p[k0 - 1])
        # single tone -> entropy ~ 0; white noise -> near 1
        assert W.spectral_entropy(p) < 1e-6
        rng = np.random.default_rng(7)
        assert W.spectral_entropy(
            W.periodogram(rng.normal(0, 1, n))
        ) > 0.8

    def test_peak_ordering_deterministic_on_ties(self):
        p = np.array([2.0, 5.0, 5.0, 1.0])
        # equal powers: smaller k (longer period) ranks first
        assert W.spectral_peaks(p, 3).tolist() == [1, 2, 0]

    def test_guards(self):
        with pytest.raises(ValueError):
            W.periodogram(np.ones(3))
        with pytest.raises(ValueError):
            W.spectral_entropy(np.zeros(8))


class TestAsap:
    def test_matches_bruteforce(self):
        """Grid-search kernel == an independent brute-force replay."""
        rng = np.random.default_rng(41)
        for n in (64, 200):
            x = rng.normal(0, 2, n) + np.sin(np.arange(n) / 5) * 3
            w, ok, sk, orr, sr = W.asap_window(x, 0.1)

            def kurt(v):
                d = v - v.mean()
                m2 = (d * d).mean()
                return (d ** 4).mean() / (m2 * m2)

            def rough(v):
                return float(np.diff(v).std())

            best_w, best_r, best_k = 1, rough(x), kurt(x)
            for cand in range(2, int(n * 0.1) + 1):
                s = np.convolve(x, np.ones(cand) / cand, "valid")
                if kurt(s) >= kurt(x) and rough(s) < best_r:
                    best_w, best_r, best_k = cand, rough(s), kurt(s)
            assert w == best_w
            assert sr == pytest.approx(best_r, rel=1e-9)
            assert sk == pytest.approx(best_k, rel=1e-9)
            assert ok == pytest.approx(kurt(x), rel=1e-12)

    def test_wide_anomaly_smooths_noise_keeps_dip(self):
        """The paper's showcase regime: a wide anomaly survives the
        SMA while the noise shrinks, so kurtosis is preserved and a
        large window qualifies with far lower roughness. (A noisy
        SINE, by contrast, correctly refuses to smooth: averaging
        toward a sine LOWERS kurtosis, so no window qualifies.)"""
        rng = np.random.default_rng(43)
        n = 400
        x = rng.normal(0, 2, n)
        x[150:180] -= 10  # 30-point dip: wide enough to survive w<=40
        w, ok, sk, orr, sr = W.asap_window(x, 0.1)
        assert w > 10 and sr < orr / 5 and sk >= ok
        sine = 10 * np.sin(2 * np.pi * np.arange(n) / 100)
        sine += rng.normal(0, 1, n)
        assert W.asap_window(sine, 0.1)[0] == 1  # refuses, by design
        with pytest.raises(ValueError):
            W.asap_window(np.ones(4))

    def test_smoothing_never_qualifies_without_kurtosis(self):
        """A two-sided spike train: heavy smoothing kills the spikes'
        kurtosis, so qualifying windows stay small."""
        x = np.zeros(200)
        x[::50] = 100.0
        x[25::50] = -100.0
        w, ok, sk, _, _ = W.asap_window(x, 0.25)
        assert sk >= ok  # the preservation constraint held


class TestRobustTrend:
    def test_matches_explicit_loops(self):
        rng = np.random.default_rng(47)
        for n, drift in ((60, 0.1), (157, -0.05), (100, 0.0)):
            x = rng.normal(0, 1, n) + drift * np.arange(n)
            x[::9] = np.round(x[::9])  # inject some exact ties
            s_brute = sum(
                int(np.sign(x[j] - x[i]))
                for i in range(n) for j in range(i + 1, n)
            )
            assert W.mann_kendall_s(x, block=13) == s_brute
            slopes = [
                (x[j] - x[i]) / (j - i)
                for i in range(n) for j in range(i + 1, n)
            ]
            assert W.theil_sen_slope(x, block=13) == pytest.approx(
                float(np.median(slopes)), rel=1e-12
            )

    def test_report_analytics(self):
        n = 64
        up = np.arange(n, dtype=float) * 2 + 5
        s, tau, z = W.mann_kendall_report(up)
        assert s == n * (n - 1) // 2 and tau == 1.0 and z > 8
        assert W.theil_sen_slope(up) == pytest.approx(2.0)
        const = np.full(n, 3.0)
        s, tau, z = W.mann_kendall_report(const)
        assert s == 0 and tau == 0.0 and z == 0.0
        assert W.theil_sen_slope(const) == 0.0
        # tie-corrected variance: z with ties stays finite and sane
        rng = np.random.default_rng(3)
        tied = rng.integers(0, 4, 200).astype(float)
        _, tau_t, z_t = W.mann_kendall_report(tied)
        assert abs(tau_t) < 0.2 and abs(z_t) < 4
        with pytest.raises(ValueError):
            W.mann_kendall_report(np.ones(5))


def test_fused_mk_theil_sen_equals_separate():
    rng = np.random.default_rng(53)
    for n in (64, 311):
        x = rng.normal(0, 2, n) + 0.02 * np.arange(n)
        s, slope = W.mk_and_theil_sen(x, block=29)
        assert s == W.mann_kendall_s(x)
        assert slope == W.theil_sen_slope(x)
        assert W.mann_kendall_report_from_s(x, s) == W.mann_kendall_report(x)
