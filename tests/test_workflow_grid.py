"""Workflow grid: config interpretation, cross-product execution,
error quarantine, runtime columns (reference Workflow.py semantics)."""

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
    assert result["AreaUnderROC"].between(0, 1).all()
    assert result["FBeta[TopN=20]"].between(0, 1).all()
    # spikes are high-valued points: identity + median-method should beat coin flip
    med = result[(result.Detector == "MedianMethod") & (result.Preprocessor == "Identity")]
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
    ok = result[result.Detector == "MedianMethod"]
    bad = result[result.Detector == "MatrixProfileDetector"]
    assert (ok["Error"] == "").all()
    assert (bad["Error"] != "").all()  # failed job recorded, grid survived


def test_config_rejects_unknown_types():
    with pytest.raises(ValueError, match="unknown detector"):
        workflow_from_config({"detectors": [{"type": "NoSuchDetector"}]})
    with pytest.raises(ValueError, match="unknown preprocessor"):
        workflow_from_config({"preprocessors": ["NoSuchPreprocessor"]})


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
    import pytest

    with pytest.raises(ValueError, match="maximum"):
        workflow_from_config_file(str(big))
