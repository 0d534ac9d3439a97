"""Counter-reset semantics (TimescaleDB counter_agg / PromQL increase)
and time-weighted averages (TimescaleDB time_weight) — hand-computed
goldens on a tiny synthetic events frame, plus the reset/bucket
attribution rules the DuckDB oracle also pins at corpus scale."""

import datetime as dt
import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dtaianomaly_spark.pipelines import events as EVT  # noqa: E402

EPOCH = dt.datetime(2024, 1, 1)
EPOCH_US = 1_704_067_200_000_000  # unix µs of EPOCH


def _events(spark, rows):
    """rows: (event_id, seconds_after_epoch, event_type, value)."""
    data = [
        (eid, EPOCH + dt.timedelta(seconds=s), 1, et, v, "{}")
        for (eid, s, et, v) in rows
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string"
    )


def test_counter_agg_reset_semantics(spark):
    # values 10 -> 12 -> 5 -> 7: steps 0, +2, reset(+5), +2 in
    # milli-units => delta 9000, one reset, rate = 9 units / 30 s
    ev = _events(spark, [
        (1, 0, "a", 10.0), (2, 10, "a", 12.0),
        (3, 20, "a", 5.0), (4, 30, "a", 7.0),
    ])
    row = EVT.counter_agg(ev).collect()[0]
    assert row.n_samples == 4
    assert row.n_resets == 1
    assert row.delta == 9000
    assert row.first_us == EPOCH_US
    assert row.last_us == EPOCH_US + 30_000_000
    assert row.rate_per_s == pytest.approx(9000 * 1000.0 / 30_000_000)


def test_counter_agg_single_sample_rate_null(spark):
    ev = _events(spark, [(1, 0, "solo", 42.0)])
    row = EVT.counter_agg(ev).collect()[0]
    assert row.delta == 0 and row.n_resets == 0
    assert row.rate_per_s is None


def test_counter_agg_bucket_attribution(spark):
    # 1h buckets: the 12->5 reset step lands in the LATER sample's
    # bucket (hour 1), not where the run started
    h = 3600
    ev = _events(spark, [
        (1, 0, "a", 10.0), (2, 10, "a", 12.0),
        (3, h + 5, "a", 5.0), (4, h + 15, "a", 9.0),
    ])
    b0 = EPOCH_US // 3_600_000_000
    out = {r.bucket: r for r in
           EVT.counter_agg(ev, bucket_us=3_600_000_000).collect()}
    assert out[b0].delta == 2000 and out[b0].n_resets == 0
    assert out[b0 + 1].delta == 5000 + 4000 and out[b0 + 1].n_resets == 1
    # bucket extent is its own samples, so the rate denominator is
    # the within-bucket span
    assert out[b0 + 1].first_us == EPOCH_US + (h + 5) * 1_000_000
    assert out[b0 + 1].last_us == EPOCH_US + (h + 15) * 1_000_000


def test_time_weight_locf_and_linear(spark):
    # t = 0, 10, 20 s; v = 1, 3, 2:
    #   LOCF  integral = 1*10 + 3*10          = 40  -> twa 2.0
    #   linear integral = (1+3)/2*10 + (3+2)/2*10 = 45 -> twa 2.25
    ev = _events(spark, [
        (1, 0, "a", 1.0), (2, 10, "a", 3.0), (3, 20, "a", 2.0),
    ])
    row = EVT.time_weight(ev).collect()[0]
    assert row.n_samples == 3
    assert row.twa_locf == pytest.approx(2.0)
    assert row.twa_linear == pytest.approx(2.25)


def test_time_weight_zero_span_null(spark):
    ev = _events(spark, [(1, 5, "a", 1.0), (2, 5, "a", 3.0)])
    row = EVT.time_weight(ev).collect()[0]
    assert row.twa_locf is None and row.twa_linear is None


def test_time_weight_vs_plain_avg_bias(spark):
    # densely-sampled low period + one sparse high sample: plain AVG is
    # dragged toward the dense samples, the time-weighted average isn't
    rows = [(i, i, "a", 0.0) for i in range(10)]          # 0..9 s at 0
    rows.append((10, 109, "a", 10.0))                     # 100 s at 10
    ev = _events(spark, rows)
    row = EVT.time_weight(ev).collect()[0]
    plain_avg = 10.0 / 11
    # LOCF: value 0 holds for the full span -> integral 0
    assert row.twa_locf == pytest.approx(0.0)
    # linear: one trapezoid ramps 0->10 over the last 100 s
    assert row.twa_linear == pytest.approx((0 + 10) / 2 * 100 / 109)
    assert not math.isclose(row.twa_linear, plain_avg, rel_tol=0.3)


def test_counter_agg_validates_bucket(spark):
    ev = _events(spark, [(1, 0, "a", 1.0)])
    with pytest.raises(ValueError):
        EVT.counter_agg(ev, bucket_us=0)


# ---------------------------------------------------------------- lead-lag


def test_leadlag_recovers_planted_shift(spark):
    """b IS a shifted by 2 minutes (plus a flat floor): the best lag
    must be +2 with corr == 1.0 exactly (all integer moments)."""
    rows = []
    eid = 0
    # type a: a burst of k events in minute m for a deterministic pattern
    pattern = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3]
    for m, k in enumerate(pattern):
        for _ in range(k):
            eid += 1
            rows.append((eid, m * 60, "a", 1.0))
        # type b: the SAME pattern two minutes later
        for _ in range(k):
            eid += 1
            rows.append((eid, (m + 2) * 60, "b", 1.0))
    ev = _events(spark, rows)
    got = EVT.leadlag_pairs(ev, max_lag=3).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.a_type, r.b_type) == ("a", "b")
    assert r.best_lag == 2
    assert r.corr == pytest.approx(1.0, abs=1e-12)


def test_leadlag_matches_numpy_corrcoef(spark):
    """Every (pair, lag) winner equals an independent NumPy replay:
    dense zero-filled grids, np.corrcoef per lag, same tie-break."""
    import numpy as np

    rng_rows = []
    eid = 0
    # three types with irregular, partly-empty minutes
    bursts = {
        "x": [(0, 2), (1, 5), (3, 1), (4, 4), (7, 2), (9, 6)],
        "y": [(1, 3), (2, 5), (5, 1), (6, 4), (8, 2), (9, 1)],
        "z": [(0, 1), (2, 2), (4, 7), (6, 1), (8, 3), (10, 2)],
    }
    for et, mins in bursts.items():
        for m, k in mins:
            for _ in range(k):
                eid += 1
                rng_rows.append((eid, m * 60 + 5, et, 1.0))
    ev = _events(spark, rng_rows)
    L = 2
    got = {(r.a_type, r.b_type): (r.best_lag, r.n, r.corr)
           for r in EVT.leadlag_pairs(ev, max_lag=L).collect()}

    # NumPy replay
    lo = min(m for v in bursts.values() for m, _ in v)
    hi = max(m for v in bursts.values() for m, _ in v)
    nn = hi - lo + 1
    dense = {}
    for et, mins in bursts.items():
        arr = np.zeros(nn, dtype=np.int64)
        for m, k in mins:
            arr[m - lo] = k
        dense[et] = arr
    types = sorted(bursts)
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            best = None
            for lag in range(-L, L + 1):
                # corr(A_t, B_{t+l}) over in-range t
                t0, t1 = max(0, -lag), nn - max(0, lag)
                xa, xb = dense[a][t0:t1], dense[b][t0 + lag:t1 + lag]
                if xa.std() == 0 or xb.std() == 0:
                    continue
                r = float(np.corrcoef(xa, xb)[0, 1])
                key = (-r, abs(lag), lag)
                if best is None or key < best[0]:
                    best = (key, lag, len(xa), r)
            _, lag, n, r = best
            assert got[(a, b)][0] == lag, (a, b, got[(a, b)], best)
            assert got[(a, b)][1] == n
            assert got[(a, b)][2] == pytest.approx(r, rel=1e-9)


def test_leadlag_excludes_zero_variance_and_validates(spark):
    # constant-count series: every lag window has zero variance for
    # type c -> the (a, c) pair never reaches the ranking
    rows = []
    eid = 0
    for m in range(8):
        eid += 1
        rows.append((eid, m * 60, "c", 1.0))  # exactly 1 event/minute
        for _ in range(m % 3 + 1):
            eid += 1
            rows.append((eid, m * 60 + 1, "a", 1.0))
    ev = _events(spark, rows)
    got = EVT.leadlag_pairs(ev, max_lag=2).collect()
    assert got == []
    with pytest.raises(ValueError):
        EVT.leadlag_pairs(ev, max_lag=0)
