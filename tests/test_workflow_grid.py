"""Workflow grid: config interpretation, cross-product execution,
error quarantine, fit/predict runtime columns, n_jobs concurrency
(reference Workflow.py semantics)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dtaianomaly_spark.workflow.grid import Workflow, workflow_from_config


def test_grid_runs_cross_product(spark):
    wf = workflow_from_config(
        {
            "dataloaders": ["/root/testdata/sf0.001"],
            "preprocessors": ["Identity", "Differencing"],
            "detectors": [
                {"type": "MedianMethod"},
                {"type": "KMeansAnomalyDetector", "window_size": 32,
                 "stride": 16, "n_clusters": 4},
            ],
            "metrics": ["AreaUnderROC", "FBeta"],
            "thresholds": [{"type": "TopN", "param": 20}],
        }
    )
    result = wf.run(spark)
    assert len(result) == 4  # 1 source x 2 preprocessors x 2 detectors
    assert (result["Error"] == "").all()
    assert (result["Runtime [s]"] > 0).all()
    assert (result["Runtime Fit [s]"] >= 0).all()
    assert (result["Runtime Predict [s]"] > 0).all()
    # Workflow.py:255-266 column order
    assert list(result.columns[:6]) == [
        "Dataset", "Detector", "Preprocessor",
        "Runtime Fit [s]", "Runtime Predict [s]", "Runtime [s]",
    ]
    assert result["AreaUnderROC"].between(0, 1).all()
    assert result["FBeta[TopN=20]"].between(0, 1).all()
    # detectors print as canonical init-call strings (PrettyPrintable)
    assert set(result["Detector"]) == {"MedianMethod()", "KMeansAnomalyDetector(n_clusters=4)"}
    # spikes are high-valued points: identity + median-method should beat coin flip
    med = result[(result.Detector == "MedianMethod()") & (result.Preprocessor == "Identity")]
    assert med["AreaUnderROC"].iloc[0] > 0.5


def test_grid_quarantines_failures(spark):
    wf = Workflow(
        sources=["/root/testdata/sf0.001"],
        preprocessors=["Identity"],
        detectors=[("MedianMethod", {}), ("MatrixProfileDetector", {"window_size": -5})],
        metrics=["AreaUnderROC"],
        thresholds=[],
    )
    result = wf.run(spark)
    assert len(result) == 2
    ok = result[result.Detector.str.startswith("MedianMethod")]
    bad = result[result.Detector.str.startswith("MatrixProfileDetector")]
    assert (ok["Error"] == "").all()
    assert (bad["Error"] != "").all()  # failed job recorded, grid survived


def test_grid_n_jobs_matches_serial(spark):
    """n_jobs > 1 (driver thread pool + fair-scheduler pools) returns the
    same metric values as the serial run."""
    cfg = {
        "dataloaders": ["/root/testdata/sf0.001"],
        "preprocessors": ["Identity"],
        "detectors": [
            {"type": "MedianMethod"},
            {"type": "AlwaysNormal"},
            {"type": "RandomDetector", "seed": 3},
        ],
        "metrics": ["AreaUnderROC"],
    }
    serial = workflow_from_config(cfg).run(spark)
    conc = workflow_from_config({**cfg, "n_jobs": 3}).run(spark)
    a = serial.set_index("Detector")["AreaUnderROC"].to_dict()
    b = conc.set_index("Detector")["AreaUnderROC"].to_dict()
    # AlwaysNormal has constant scores: AUC undefined -> NaN on both sides
    assert a.keys() == b.keys()
    for k in a:
        if a[k] is None or (isinstance(a[k], float) and a[k] != a[k]):
            assert b[k] is None or b[k] != b[k]
        else:
            assert a[k] == pytest.approx(b[k], abs=1e-12)


def test_grid_wide_registry_cells(spark):
    """One cell per newly registered component family: undersampler + PAA
    preprocessors, point-adjusted + best-threshold metrics, a pyod-style
    detector, and ChainedPreprocessor."""
    wf = workflow_from_config(
        {
            "dataloaders": ["/root/testdata/sf0.001"],
            "preprocessors": [
                {"type": "SamplingRateUnderSampler", "k": 4},
                {"type": "PiecewiseAggregateApproximation", "n_frames": 64},
                {"type": "ChainedPreprocessor",
                 "base_preprocessors": ["MinMaxScaler", {"type": "MovingAverage", "window_size": 4}]},
            ],
            "detectors": [{"type": "HistogramBasedOutlierScore", "window_size": 16, "stride": 8}],
            "metrics": [
                "PointAdjustedFBeta",
                {"type": "FBeta", "beta": 2},
                {"type": "BestThresholdMetric", "metric": {"type": "FBeta"}},
                "AreaUnderPR",
            ],
            "thresholds": [{"type": "ContaminationRate", "param": 0.05}],
        }
    )
    result = wf.run(spark)
    assert len(result) == 3
    assert (result["Error"] == "").all(), result["Error"].tolist()
    for col in [
        "PointAdjustedFBeta[ContaminationRate=0.05]",
        "FBeta(beta=2)[ContaminationRate=0.05]",
        "BestThresholdMetric(metric={'type': 'FBeta'})",
        "AreaUnderPR",
    ]:
        assert result[col].between(0, 1).all(), col


def test_best_threshold_inner_metric_dispatch(spark):
    """BestThresholdMetric must evaluate the WRAPPED metric, not always
    F-beta: check Precision / Recall / FBeta(beta=2) against a brute-force
    enumeration of every candidate label set, and reject unsupported
    inner types eagerly."""
    from dtaianomaly_spark.workflow.grid import metric_value

    scores = [0.1, 0.4, 0.4, 0.7, 0.9, 0.2, 0.8]
    truth = [0, 1, 0, 1, 0, 1, 1]
    scored_truth = spark.createDataFrame(
        [("1", i, float(s), t) for i, (s, t) in enumerate(zip(scores, truth))],
        "doc_id string, pos long, score double, truth int",
    )

    def brute_best(metric_fn):
        best = 0.0
        label_sets = [
            [1 if s >= c else 0 for s in scores] for c in sorted(set(scores))
        ] + [[0] * len(scores)]
        for labels in label_sets:
            tp = sum(1 for l, t in zip(labels, truth) if l == 1 and t == 1)
            fp = sum(1 for l, t in zip(labels, truth) if l == 1 and t == 0)
            fn = sum(1 for l, t in zip(labels, truth) if l == 0 and t == 1)
            best = max(best, metric_fn(tp, fp, fn))
        return best

    def brute_best_pa(metric_fn):
        """Reference composition: threshold -> binary labels ->
        point-adjust (any hit marks the whole truth run) -> metric."""
        # truth runs as (start, end) inclusive
        runs, start = [], None
        for i, t in enumerate(truth + [0]):
            if t == 1 and start is None:
                start = i
            elif t != 1 and start is not None:
                runs.append((start, i - 1))
                start = None
        best = 0.0
        for c in sorted(set(scores)) + [max(scores) + 1]:
            labels = [1 if s >= c else 0 for s in scores]
            for a, b in runs:
                if any(labels[a : b + 1]):
                    for j in range(a, b + 1):
                        labels[j] = 1
            tp = sum(1 for l, t in zip(labels, truth) if l == 1 and t == 1)
            fp = sum(1 for l, t in zip(labels, truth) if l == 1 and t == 0)
            fn = sum(1 for l, t in zip(labels, truth) if l == 0 and t == 1)
            best = max(best, metric_fn(tp, fp, fn))
        return best

    prec = lambda tp, fp, fn: tp / (tp + fp) if tp + fp else 0.0
    rec = lambda tp, fp, fn: tp / (tp + fn) if tp + fn else 0.0
    f2 = lambda tp, fp, fn: (
        5.0 * tp / (5.0 * tp + fp + 4.0 * fn) if tp + fp + fn else 0.0
    )
    for inner, fn in [
        ({"type": "Precision"}, prec),
        ("Recall", rec),
        ({"type": "FBeta", "beta": 2}, f2),
    ]:
        got = metric_value(
            scored_truth, {"type": "BestThresholdMetric", "metric": inner}, None
        )
        assert got == pytest.approx(brute_best(fn), abs=1e-12), inner

    for inner, fn in [
        ("PointAdjustedPrecision", prec),
        ({"type": "PointAdjustedFBeta", "beta": 2}, f2),
    ]:
        got = metric_value(
            scored_truth, {"type": "BestThresholdMetric", "metric": inner}, None
        )
        assert got == pytest.approx(brute_best_pa(fn), abs=1e-12), inner

    with pytest.raises(ValueError, match="unsupported inner metric"):
        workflow_from_config(
            {"metrics": [
                {"type": "BestThresholdMetric", "metric": {"type": "AreaUnderROC"}}
            ]}
        )
    # PA + max_nb_thresholds: a cap covering every candidate equals the
    # full enumeration; a small cap equals the brute force of the same
    # linspace index-selection rule
    full = metric_value(
        scored_truth,
        {"type": "BestThresholdMetric", "metric": "PointAdjustedFBeta"},
        None,
    )
    assert metric_value(
        scored_truth,
        {"type": "BestThresholdMetric", "metric": "PointAdjustedFBeta",
         "max_nb_thresholds": 100},
        None,
    ) == pytest.approx(full, abs=1e-12)

    def brute_pa_sub(metric_fn, m):
        runs, start = [], None
        for i, t in enumerate(truth + [0]):
            if t == 1 and start is None:
                start = i
            elif t != 1 and start is not None:
                runs.append((start, i - 1))
                start = None
        cuts = sorted(set(scores)) + [max(scores) + 1]  # + empty set
        u = len(cuts) - 1
        if u + 1 > m:
            sel = {int(kk * ((u + 1) / (m + 1))) for kk in range(1, m + 1)}
            cuts = [c for j, c in enumerate(cuts) if j in sel]
        best = 0.0
        for c in cuts:
            labels = [1 if s >= c else 0 for s in scores]
            for a, b in runs:
                if any(labels[a : b + 1]):
                    for j in range(a, b + 1):
                        labels[j] = 1
            tp = sum(1 for l, t in zip(labels, truth) if l == 1 and t == 1)
            fp = sum(1 for l, t in zip(labels, truth) if l == 1 and t == 0)
            fn = sum(1 for l, t in zip(labels, truth) if l == 0 and t == 1)
            best = max(best, metric_fn(tp, fp, fn))
        return best

    f1 = lambda tp, fp, fn: 2.0 * tp / (2.0 * tp + fp + fn) if tp + fp + fn else 0.0
    for m in (2, 3, 5):
        got = metric_value(
            scored_truth,
            {"type": "BestThresholdMetric",
             "metric": "PointAdjustedFBeta", "max_nb_thresholds": m},
            None,
        )
        assert got == pytest.approx(brute_pa_sub(f1, m), abs=1e-12), m


def test_config_rejects_unknown_types():
    with pytest.raises(ValueError, match="unknown detector"):
        workflow_from_config({"detectors": [{"type": "NoSuchDetector"}]})
    with pytest.raises(ValueError, match="unknown preprocessor"):
        workflow_from_config({"preprocessors": ["NoSuchPreprocessor"]})
    with pytest.raises(ValueError, match="unknown metric"):
        workflow_from_config({"metrics": ["NoSuchMetric"]})
    with pytest.raises(ValueError, match="window_size"):
        workflow_from_config(
            {"detectors": [{"type": "MatrixProfileDetector", "window_size": -1}]}
        )


def test_config_file_loading(tmp_path):
    import json

    from dtaianomaly_spark.workflow.grid import workflow_from_config_file

    p = tmp_path / "job.json"
    p.write_text(json.dumps({"detectors": [{"type": "MedianMethod"}]}))
    wf = workflow_from_config_file(str(p))
    assert wf.detectors == [("MedianMethod", {})]

    t = tmp_path / "job.toml"
    t.write_text('detectors = [{type = "MedianMethod"}]\n')
    wf2 = workflow_from_config_file(str(t))
    assert wf2.detectors == [("MedianMethod", {})]

    big = tmp_path / "big.json"
    big.write_text("{}" + " " * 1_000_001)

    with pytest.raises(ValueError, match="maximum"):
        workflow_from_config_file(str(big))


def test_error_log_writes_runnable_repro_script(spark, tmp_path):
    """A failing cell writes a .err file (reference log_error semantics):
    commented traceback on top, runnable reconstruction below — and the
    reconstruction reproduces the SAME error class when executed."""
    log_dir = str(tmp_path / "errs")
    wf = Workflow(
        sources=["/root/testdata/sf0.001"],
        preprocessors=["Identity"],
        detectors=[("KMeansAnomalyDetector", {"window_size": 32, "stride": -3})],
        metrics=["AreaUnderROC"],
        thresholds=[],
        error_log_path=log_dir,
    )
    result = wf.run(spark)
    assert (result["Error"] != "").all()
    err_files = os.listdir(log_dir)
    assert len(err_files) == 1 and err_files[0].endswith(".err")
    path = os.path.join(log_dir, err_files[0])
    src = open(path).read()
    assert src.startswith("# An error occurred")
    assert "invalid stride" in src
    assert "KMeansAnomalyDetector" in src
    # the reconstruction reproduces the same failure
    with pytest.raises(ValueError, match="invalid stride"):
        exec(compile(src, path, "exec"), {"__name__": "__repro__"})


def test_bad_component_entry_quarantines_not_aborts(spark):
    """A malformed preprocessor/detector entry fills the Error cell
    instead of killing the grid (the quarantine contract covers
    component construction too)."""
    wf = Workflow(
        sources=["/root/testdata/sf0.001"],
        preprocessors=[{"type": "NoSuchPreprocessor"}, "Identity"],
        detectors=[("MedianMethod", {})],
        metrics=["AreaUnderROC"],
        thresholds=[],
    )
    result = wf.run(spark)
    assert len(result) == 2
    bad = result[result.Error != ""]
    ok = result[result.Error == ""]
    assert len(bad) == 1 and "NoSuchPreprocessor" in bad.iloc[0]["Error"]
    assert len(ok) == 1


def test_bare_string_threshold_gets_per_kind_default():
    wf = workflow_from_config({"detectors": ["MedianMethod"], "thresholds": ["TopN"]})
    assert wf.thresholds == [("TopN", 20)]
    wf2 = workflow_from_config(
        {"detectors": ["MedianMethod"], "thresholds": ["FixedCutoff", "ContaminationRate"]}
    )
    assert wf2.thresholds == [("FixedCutoff", 0.5), ("ContaminationRate", 0.05)]


def test_trace_memory_columns(spark):
    """trace_memory=True adds the reference's three tracemalloc peak
    columns in the reference's order (Workflow.py:255-266, 341-365)."""
    wf = workflow_from_config(
        {
            "dataloaders": ["/root/testdata/sf0.001"],
            "detectors": [
                {"type": "MedianMethod"},
                {"type": "KMeansAnomalyDetector", "window_size": 16,
                 "stride": 8, "n_clusters": 3},
            ],
            "metrics": ["AreaUnderROC"],
            "trace_memory": True,
        }
    )
    result = wf.run(spark)
    assert list(result.columns[:9]) == [
        "Dataset", "Detector", "Preprocessor",
        "Runtime Fit [s]", "Runtime Predict [s]", "Runtime [s]",
        "Peak Memory Fit [MB]", "Peak Memory Predict [MB]", "Peak Memory [MB]",
    ]
    assert (result["Error"] == "").all()
    assert (result["Peak Memory Predict [MB]"] > 0).all()
    assert (
        result["Peak Memory [MB]"]
        == result[["Peak Memory Fit [MB]", "Peak Memory Predict [MB]"]].max(axis=1)
    ).all()
    # the kmeans fit really allocates on the driver (sample + solver)
    km = result[result.Detector.str.startswith("KMeans")]
    assert (km["Peak Memory Fit [MB]"] > 0).all()


def test_trace_memory_failed_cell_has_full_column_set(spark):
    """A cell that fails AFTER fit (predict raises) must not leave a
    partially-populated memory column set: the missing phase columns are
    NaN-filled so every trace_memory row has the same shape."""
    import numpy as np

    wf = Workflow(
        sources=["/root/testdata/sf0.001"],
        preprocessors=["Identity"],
        detectors=[
            ("MedianMethod", {}),
            # window far beyond any series length: fit (stateless) is
            # fine, the scoring pass raises
            ("MatrixProfileDetector", {"window_size": 10**7}),
        ],
        metrics=["AreaUnderROC"],
        thresholds=[],
        trace_memory=True,
    )
    result = wf.run(spark)
    bad = result[result["Error"] != ""]
    assert len(bad) == 1
    for col in ("Peak Memory Fit [MB]", "Peak Memory Predict [MB]",
                "Peak Memory [MB]"):
        assert col in result.columns
        # present on the row dict itself (NaN, not absent)
        assert np.isnan(bad[col]).all() or (bad[col] > 0).all()
    ok = result[result["Error"] == ""]
    assert (ok["Peak Memory [MB]"] > 0).all()


def test_ucr_dataloader_entries_run_in_grid(spark, tmp_path):
    """Type-tagged dataloader entries (interpret_dataloaders semantics,
    workflow_from_config.py:134-176): a UCRLoader archive directory runs
    through the grid with REAL labels as truth; detectors fit on the
    test series (the reference's fit-*-on-test-data defaults)."""
    import numpy as np

    rng = np.random.default_rng(5)
    vals = rng.normal(0, 1.0, 400)
    vals[300:320] += 8.0  # injected anomaly inside the test split
    (tmp_path / "004_UCR_Anomaly_gridD_200_300_320.txt").write_text(
        "\n".join(f"{v:.6f}" for v in vals) + "\n"
    )

    wf = workflow_from_config(
        {
            "dataloaders": [{"type": "UCRLoader", "path": str(tmp_path)}],
            "detectors": [{"type": "MedianMethod",
                           "neighborhood_size_before": 20}],
            "metrics": ["AreaUnderROC"],
        }
    )
    result = wf.run(spark)
    assert len(result) == 1
    assert (result["Error"] == "").all(), result["Error"].tolist()
    assert result["Dataset"].iloc[0].startswith("UCRLoader(path=")
    # real labels drive the metric: a level-shift anomaly scores well
    # above chance (MedianMethod flags the shift edges strongly and the
    # interior moderately — 0.9+ needs a shape detector, not the point
    # of this plumbing test)
    assert result["AreaUnderROC"].iloc[0] > 0.65

    with pytest.raises(ValueError, match="Invalid data entry"):
        workflow_from_config({"dataloaders": [{"type": "NoSuchLoader"}]})
    with pytest.raises(TypeError, match="path keyword"):
        workflow_from_config({"dataloaders": [{"type": "UCRLoader"}]})
    with pytest.raises(ValueError, match="Invalid base type"):
        workflow_from_config(
            {"dataloaders": [{"type": "directory", "path": "/x",
                              "base_type": "Nope"}]}
        )


def test_directory_dataloader_expands_per_dataset(spark, tmp_path):
    """A 'directory' entry expands to one UCRLoader per archive file —
    one grid row per dataset, mirroring the reference's from_directory
    (workflow_from_config.py:160-176)."""
    import numpy as np

    rng = np.random.default_rng(9)
    for name in (
        "005_UCR_Anomaly_dirA_100_150_160.txt",
        "006_UCR_Anomaly_dirB_80_120_130.txt",
    ):
        (tmp_path / name).write_text(
            "\n".join(f"{v:.6f}" for v in rng.normal(0, 1, 250)) + "\n"
        )
    wf = workflow_from_config(
        {
            "dataloaders": [
                {"type": "directory", "path": str(tmp_path),
                 "base_type": "UCRLoader"}
            ],
            "detectors": [{"type": "MedianMethod"}],
            "metrics": ["AreaUnderROC"],
        }
    )
    result = wf.run(spark)
    assert len(result) == 2  # one row per archive file
    assert (result["Error"] == "").all(), result["Error"].tolist()
    assert all("dirA" in d or "dirB" in d for d in result["Dataset"])
    assert result["Dataset"].nunique() == 2
