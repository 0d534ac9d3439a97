"""Visualization data layer: every array the reference's six plot
functions compute before drawing (visualization.py:10-462), verified
without matplotlib; render functions raise a clear ImportError when
matplotlib is absent (as in this container) and the Spark bridge
collects exactly one bounded series."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dtaianomaly_spark.workflow import visualization as V


def test_format_time_steps():
    np.testing.assert_array_equal(V.format_time_steps(None, 5), np.arange(5))
    ts = np.array([3, 7, 9])
    assert V.format_time_steps(ts, 3) is ts


def test_colored_segments_bins_match_reference_formula():
    # reference: scaled = (y - min)/(max - min); bin = floor(scaled*nb)/nb
    y = np.array([0.0, 2.5, 5.0, 10.0])
    _, bins = V.colored_segments_data(np.zeros(4), y, nb_colors=4)
    np.testing.assert_array_equal(bins, [0.0, 0.25, 0.5, 1.0])
    # constant scores -> all zeros (the y_max > y_min guard)
    _, bins = V.colored_segments_data(np.zeros(3), np.full(3, 7.0))
    np.testing.assert_array_equal(bins, np.zeros(3))


def test_anomaly_markers_masks():
    y = np.array([1, 1, 0, 0, 1])
    y_pred = np.array([1, 0, 1, 0, 1])
    tp, fp, fn = V.anomaly_markers_data(y, y_pred)
    np.testing.assert_array_equal(tp, [True, False, False, False, True])
    np.testing.assert_array_equal(fp, [False, False, True, False, False])
    np.testing.assert_array_equal(fn, [False, True, False, False, False])
    with pytest.raises(ValueError, match="binary"):
        V.anomaly_markers_data(np.array([0, 2]), np.array([0, 1]))


def test_demarcated_regions_and_end_clamp():
    # anomaly runs to the end: diff(append=0) puts end == n, the
    # reference clamps the drawn span at the last time step
    y = np.array([0, 1, 1, 0, 1, 1])
    starts, ends, spans = V.demarcated_regions_data(y)
    np.testing.assert_array_equal(starts, [1, 4])
    np.testing.assert_array_equal(ends, [3, 6])
    assert spans == [(1, 3), (4, 5)]  # 6 clamped to n-1 = 5
    ts = np.array([10, 20, 30, 40, 50, 60])
    _, _, spans_t = V.demarcated_regions_data(y, ts)
    assert spans_t == [(20, 40), (50, 60)]


def test_zoom_data_slices_every_array():
    X = np.arange(10.0)
    y = (X > 6).astype(int)
    yp = (X > 4).astype(int)
    ts = X * 2
    full, zoom = V.zoom_data(X, 3, 7, y=y, y_pred=yp, time_steps=ts)
    np.testing.assert_array_equal(full["X"], X)
    np.testing.assert_array_equal(zoom["X"], X[3:7])
    np.testing.assert_array_equal(zoom["y"], y[3:7])
    np.testing.assert_array_equal(zoom["y_pred"], yp[3:7])
    np.testing.assert_array_equal(zoom["time_steps"], ts[3:7])
    full2, zoom2 = V.zoom_data(X, 2, 5)
    assert set(full2) == set(zoom2) == {"X"}


def test_confidence_band():
    yp = np.array([0.5, 0.8])
    conf = np.array([0.9, 1.0])
    lo, hi = V.confidence_band_data(yp, conf)
    np.testing.assert_allclose(lo, [0.4, 0.8])
    np.testing.assert_allclose(hi, [0.6, 0.8])


def test_render_functions_gate_on_matplotlib():
    if V.HAS_MATPLOTLIB:  # pragma: no cover - absent in this container
        pytest.skip("matplotlib present: render path active")
    for fn, args in [
        (V.plot_time_series_colored_by_score, (np.zeros(4), np.zeros(4))),
        (V.plot_time_series_anomalies,
         (np.zeros(4), np.zeros(4, int), np.zeros(4, int))),
        (V.plot_demarcated_anomalies, (np.zeros(4), np.zeros(4, int))),
        (V.plot_with_zoom, (np.zeros(8), 2, 5)),
        (V.plot_anomaly_scores,
         (np.zeros(4), np.zeros(4, int), np.zeros(4))),
    ]:
        with pytest.raises(ImportError, match="matplotlib"):
            fn(*args)


def test_feature_name_validation_runs_before_matplotlib_gate():
    # mirror of the reference's ValueError for mismatched feature names —
    # matplotlib-independent, so it must be checkable here too
    with pytest.raises(ValueError, match="feature names"):
        V._check_feature_names(np.zeros((5, 2)), ["only-one"])


def test_series_plot_frame_bridge(spark):
    from pyspark.sql import functions as F

    from dtaianomaly_spark.sources import corpus as C

    lf = C.token_long_form(spark, "/root/testdata/sf0.001").filter(
        "CAST(doc_id AS BIGINT) < 3"
    ).select("doc_id", "pos", F.col("value").cast("double").alias("score"))
    out = V.series_plot_frame(lf, 1)
    n = lf.filter("doc_id = 1").count()
    assert set(out) == {"pos", "score"}
    assert out["pos"].shape == (n,)
    assert np.array_equal(out["pos"], np.arange(n))  # pos-ordered
    with pytest.raises(ValueError, match="max_points"):
        V.series_plot_frame(lf, 1, max_points=10)


def test_series_plot_frame_unknown_doc_raises(spark):
    from pyspark.sql import functions as F

    from dtaianomaly_spark.sources import corpus as C

    lf = C.token_long_form(spark, "/root/testdata/sf0.001").filter(
        "CAST(doc_id AS BIGINT) < 2"
    ).select("doc_id", "pos", F.col("value").cast("double").alias("score"))
    with pytest.raises(KeyError, match="no rows"):
        V.series_plot_frame(lf, 999999)
