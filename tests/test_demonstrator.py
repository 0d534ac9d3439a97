"""Headless demonstrator engine: component discovery, form generation,
upload validation and the tab run loop must mirror the reference
demonstrator's mechanics (demonstrator.py:117-1932) over the Spark
components."""

import math
import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dtaianomaly_spark.workflow import demonstrator as D

SF_DIR = "/root/testdata/sf0.001"


def test_available_components_lists_full_registry():
    opts = D.available_components()
    assert len(opts["detectors"]) == 17
    for name in ("MedianMethod", "MatrixProfileDetector", "IsolationForest",
                 "KShapeAnomalyDetector", "RandomDetector"):
        assert name in opts["detectors"]
    assert "ChainedPreprocessor" in opts["preprocessors"]
    assert len(opts["preprocessors"]) == 11
    assert "BestThresholdMetric" in opts["metrics"]
    assert set(opts["thresholds"]) == {"FixedCutoff", "ContaminationRate", "TopN"}


def test_custom_component_registration_roundtrip():
    from dtaianomaly_spark.workflow.components import AlwaysNormal

    class MyDetector(AlwaysNormal):
        pass

    D.clear_custom_components()
    try:
        D.register_custom_component("detectors", "MyDetector", MyDetector)
        assert "MyDetector" in D.available_components()["detectors"]
        form = D.hyperparam_form("MyDetector")
        assert isinstance(form, list)
        with pytest.raises(ValueError, match="kind"):
            D.register_custom_component("widgets", "x", object)
    finally:
        D.clear_custom_components()
    assert "MyDetector" not in D.available_components()["detectors"]


def test_hyperparam_form_window_size_selector_and_defaults():
    form = {s["name"]: s for s in D.hyperparam_form("MatrixProfileDetector")}
    ws = form["window_size"]
    assert ws["kind"] == "window_size"
    assert ws["options"] == ("Auto (fft)", "Manual")
    assert ws["manual_default"] == 32 and ws["default"] == 32  # engine default
    # the reference 20-fallback (demonstrator.py:331) applies when the
    # constructor gives no int default
    from dtaianomaly_spark.workflow.components import AlwaysNormal

    class WsDetector(AlwaysNormal):
        def __init__(self, window_size):
            super().__init__()

    D.clear_custom_components()
    try:
        D.register_custom_component("detectors", "WsDetector", WsDetector)
        spec = {s["name"]: s for s in D.hyperparam_form("WsDetector")}
        assert spec["window_size"]["manual_default"] == 20
        assert spec["window_size"]["default"] == "fft"
    finally:
        D.clear_custom_components()
    med = {s["name"]: s for s in D.hyperparam_form("MedianMethod")}
    assert med["neighborhood_size_before"]["kind"] == "int"
    # defaults are constructible for every registry detector
    from dtaianomaly_spark.workflow.components import DETECTOR_REGISTRY

    for name in DETECTOR_REGISTRY:
        params = D.default_hyperparams(name)
        DETECTOR_REGISTRY[name](**params)


def test_validate_uploaded_data_contract():
    good = pd.DataFrame(
        {"Time Step": [0, 1, 2], "Value": [1.0, 2.0, 3.0], "Label": [0, 1, 0]}
    )
    x, y, msg = D.validate_uploaded_data(good)
    assert msg == "" and x.shape == (3, 2) and list(y) == [0, 1, 0]
    x, y, msg = D.validate_uploaded_data(good.drop(columns=["Label"]))
    assert x is None and "must contain the columns" in msg
    bad = good.assign(Label=[0, 2, 0])
    x, y, msg = D.validate_uploaded_data(bad)
    assert x is None and "binary" in msg
    nonnum = good.assign(Value=["a", "b", "c"])
    x, y, msg = D.validate_uploaded_data(nonnum)
    assert x is None and "'Value' column must be numeric" in msg


def test_demo_session_end_to_end(spark):
    sess = D.DemoSession(spark, SF_DIR)
    t_med = sess.add_detector(
        "MedianMethod",
        {"neighborhood_size_before": 16, "neighborhood_size_after": 16},
    )
    t_rand = sess.add_detector("RandomDetector", {"seed": 7})
    assert set(sess.tabs) == {t_med, t_rand}

    res = sess.run(
        t_med,
        metrics=("AreaUnderROC", "FBeta"),
        thresholds=(("TopN", 50),),
    )
    assert res["fit_time"] >= 0 and res["predict_time"] > 0
    auc = res["metrics"]["AreaUnderROC"]
    f1 = res["metrics"]["FBeta[TopN=50]"]
    assert 0.0 <= auc <= 1.0 and 0.0 <= f1 <= 1.0
    assert math.isfinite(auc) and math.isfinite(f1)
    sess.run(t_rand, metrics=("AreaUnderROC",), thresholds=(("TopN", 50),))

    doc = sess.base_long.select("doc_id").orderBy("doc_id").first()["doc_id"]
    frame = sess.plot_frames(t_med, str(doc))
    n = len(frame["value"])
    assert n > 0 and len(frame["score"]) == n and len(frame["truth"]) == n
    assert set(np.unique(frame["truth"])).issubset({0, 1})

    sheets = sess.export_sheets(str(doc))
    assert set(sheets) == {
        "Original Dataset", "Anomaly Scores", "Thresholded Predictions",
        "Evaluation Metrics",
    }
    assert len(sheets["Original Dataset"]) == n
    assert sheets["Anomaly Scores"].shape == (n, 3)  # Time Step + 2 tabs
    assert sheets["Thresholded Predictions"].drop(
        columns=["Time Step"]
    ).isin([0, 1]).all().all()
    assert "Fit Time (s)" in sheets["Evaluation Metrics"].columns
    assert len(sheets["Evaluation Metrics"]) == 2

    sess.remove_detector(t_rand)
    assert set(sess.tabs) == {t_med}
    sess.close()
    assert sess.results == {}
