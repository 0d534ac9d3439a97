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
