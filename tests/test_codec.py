"""Round-trip and compression-ratio tests for the Gorilla codecs."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dtaianomaly_spark.kernels import codec


class TestDeltaOfDelta:
    @pytest.mark.parametrize(
        "values",
        [
            [],
            [42],
            [1, 2],
            [5, 5, 5, 5, 5],
            [0, 10, 20, 30, 40],  # constant delta -> all '0' bits
            [0, 10, 21, 33, 46],
            [-1000, 0, 1000, -500000, 7],
            list(range(0, 10000, 60)),
        ],
    )
    def test_round_trip(self, values):
        v = np.asarray(values, dtype=np.int64)
        assert np.array_equal(codec.dod_decode(codec.dod_encode(v)), v)

    def test_regular_timestamps_compress_well(self):
        ts = np.arange(0, 3600_000, 60_000, dtype=np.int64)  # 60 points
        enc = codec.dod_encode(ts)
        # header 4B + two 64-bit seeds + ~1 bit per point
        assert len(enc) <= 4 + 16 + (ts.shape[0] // 8) + 2

    @settings(max_examples=100, deadline=None)
    @given(st.lists(st.integers(min_value=-(2**40), max_value=2**40), max_size=200))
    def test_round_trip_property(self, values):
        v = np.asarray(values, dtype=np.int64)
        assert np.array_equal(codec.dod_decode(codec.dod_encode(v)), v)


class TestXor:
    @pytest.mark.parametrize(
        "values",
        [
            [],
            [1.5],
            [1.5, 1.5, 1.5],
            [0.0, -0.0, 1.0, -1.0],
            [3.14159, 3.14160, 3.14161],
            list(np.linspace(0, 1, 100)),
        ],
    )
    def test_round_trip(self, values):
        v = np.asarray(values, dtype=np.float64)
        dec = codec.xor_decode(codec.xor_encode(v))
        assert np.array_equal(dec.view(np.uint64), v.view(np.uint64))

    def test_constant_stream_compresses_to_one_bit_per_point(self):
        v = np.full(1000, 123.456)
        enc = codec.xor_encode(v)
        assert len(enc) <= 4 + 8 + 1000 // 8 + 2

    @settings(max_examples=100, deadline=None)
    @given(
        st.lists(
            st.floats(allow_nan=False, allow_infinity=False, width=64), max_size=200
        )
    )
    def test_round_trip_property(self, values):
        v = np.asarray(values, dtype=np.float64)
        dec = codec.xor_decode(codec.xor_encode(v))
        assert np.array_equal(dec.view(np.uint64), v.view(np.uint64))

    def test_nan_payloads_survive(self):
        v = np.array([1.0, np.nan, 2.0, np.nan])
        dec = codec.xor_decode(codec.xor_encode(v))
        assert np.array_equal(dec.view(np.uint64), v.view(np.uint64))


# --------------------------------------------- Swing-filter PLA (lossy)

def _naive_swing(x, eps):
    """Independent per-origin maximal-extension twin: from each origin
    (t0, y0), brute-force the farthest end whose slope corridor (the
    intersection of ALL per-point feasible slope intervals, recomputed
    from scratch) is nonempty — same policy as the kernel, different
    mechanism."""
    n = len(x)
    if n == 0:
        return []
    if n == 1:
        return [(0, 0, x[0], x[0])]
    segs, t0, y0 = [], 0, float(x[0])
    while t0 < n - 1:
        lo, hi = -np.inf, np.inf
        end, y_end = t0 + 1, None
        for i in range(t0 + 1, n):
            dt = i - t0
            lo2 = max(lo, (x[i] - eps - y0) / dt)
            hi2 = min(hi, (x[i] + eps - y0) / dt)
            if lo2 > hi2:
                break
            lo, hi = lo2, hi2
            end, y_end = i, y0 + 0.5 * (lo + hi) * dt
        segs.append((t0, end, y0, y_end))
        if end == n - 1:
            return segs
        t0, y0 = end, y_end
    return segs


@pytest.mark.parametrize("eps", [0.0, 0.5, 3.0, 25.0])
def test_swing_matches_naive_twin_and_error_bound(eps):
    from dtaianomaly_spark.kernels.codec import swing_encode, swing_decode

    rng = np.random.default_rng(11)
    for n in (1, 2, 3, 50, 400):
        x = np.cumsum(rng.normal(0, 1, n)) + 5 * np.sin(np.arange(n) / 17)
        segs = swing_encode(x, eps)
        want = _naive_swing(x, eps)
        assert [tuple(s) for s in segs.tolist()] == [
            (float(a), float(b), c, d) for a, b, c, d in want
        ]
        rec = swing_decode(segs, n)
        assert np.abs(rec - x).max() <= eps + 1e-9
        # connected-PLA contract: shared knots
        for a, b in zip(segs[:-1], segs[1:]):
            assert a[1] == b[0] and a[3] == b[2]
        # segments tile [0, n-1]
        assert segs[0][0] == 0 and segs[-1][1] == n - 1


def test_swing_edge_cases():
    from dtaianomaly_spark.kernels.codec import swing_encode, swing_decode

    assert swing_encode(np.array([]), 1.0).shape == (0, 4)
    line = np.arange(64, dtype=float) * 0.25 - 3
    segs = swing_encode(line, 1e-9)
    assert segs.shape[0] == 1
    np.testing.assert_allclose(swing_decode(segs, 64), line, atol=1e-9)
    # eps=0 reproduces the data exactly
    rng = np.random.default_rng(2)
    x = rng.integers(-50, 50, 100).astype(float)
    np.testing.assert_allclose(
        swing_decode(swing_encode(x, 0.0), 100), x, atol=1e-12
    )
    with pytest.raises(ValueError, match="eps"):
        swing_encode(x, -1.0)
    with pytest.raises(ValueError, match="eps"):
        swing_encode(x, float("nan"))


def test_pla_operators_match_kernel(spark):
    from dtaianomaly_spark.kernels.codec import swing_decode, swing_encode
    from dtaianomaly_spark.rollup.compress import (
        pla_report_map, pla_segments_map,
    )
    from dtaianomaly_spark.sources.corpus import token_arrays

    arrays = token_arrays(spark, "/root/testdata/sf0.001").limit(20)
    arrays.persist().count()
    eps = 4.0
    segs = {}
    for r in pla_segments_map(arrays, eps).collect():
        segs.setdefault(r["doc_id"], []).append(
            (r["seg"], r["t_start"], r["t_end"], r["y_start"], r["y_end"])
        )
    report = {r["doc_id"]: r for r in pla_report_map(arrays, eps).collect()}
    for r in arrays.collect():
        x = np.asarray(r["tokens"], dtype=np.float64)
        want = swing_encode(x, eps)
        got = sorted(segs[str(r["doc_id"])])
        assert len(got) == want.shape[0]
        for (i, t0, t1, y0, y1), w in zip(got, want.tolist()):
            assert (t0, t1, y0, y1) == (int(w[0]), int(w[1]), w[2], w[3])
        rep = report[str(r["doc_id"])]
        err = float(np.abs(swing_decode(want, x.shape[0]) - x).max())
        assert rep["max_err"] == err and rep["max_err"] <= eps
        assert rep["n"] == x.shape[0] and rep["n_segments"] == want.shape[0]
        assert rep["ratio"] == x.shape[0] / (want.shape[0] + 1)
    arrays.unpersist()
