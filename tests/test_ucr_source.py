"""UCR source loader: format parsing, split/label semantics."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dtaianomaly_spark.sources import ucr


def _write_ucr(tmp_path, name, values):
    p = tmp_path / name
    p.write_text("\n".join(f"{v:.6f}" for v in values) + "\n")
    return values


def test_ucr_loader_round_trip(spark, tmp_path):
    rng = np.random.default_rng(7)
    a = _write_ucr(tmp_path, "001_UCR_Anomaly_seriesA_100_120_140.txt",
                   rng.normal(size=200))
    b = _write_ucr(tmp_path, "002_UCR_Anomaly_seriesB_50_60_65.txt",
                   rng.normal(size=90))

    lf = ucr.load_ucr_directory(spark, str(tmp_path))
    rows = {(r["series_id"], r["pos"]): r for r in lf.collect()}
    assert len(rows) == 290

    # values preserved in order
    for i, v in enumerate(a):
        r = rows[("001_UCR_Anomaly_seriesA_100_120_140", i)]
        assert abs(r["value"] - float(f"{v:.6f}")) < 1e-12
        assert r["is_train"] == (i < 100)
        assert r["label"] == (1 if 120 <= i < 140 else 0)
    r = rows[("002_UCR_Anomaly_seriesB_50_60_65", 89)]
    assert r["train_split"] == 50 and r["anomaly_stop"] == 65


def test_ucr_as_datasets(spark, tmp_path):
    vals = list(np.arange(100, dtype=float))
    _write_ucr(tmp_path, "003_UCR_Anomaly_rampC_40_70_80.txt", vals)
    ds = ucr.ucr_as_datasets(
        ucr.load_ucr_directory(spark, str(tmp_path))
    ).collect()
    assert len(ds) == 1
    d = ds[0]
    assert d["x_train"] == vals[:40]
    assert d["x_test"] == vals[40:]
    labels = d["y_test"]
    assert labels[70 - 40: 80 - 40] == [1] * 10
    assert sum(labels) == 10


def test_ucr_dataset_end_to_end(spark, tmp_path):
    """UCR directory -> DataSet -> EvaluationPipeline: fit on the normal
    train split (semi-supervised flow), score test, evaluate metrics."""
    import numpy as np

    from dtaianomaly_spark.sources.ucr import ucr_dataset
    from dtaianomaly_spark.workflow import components as CMP

    rng = np.random.default_rng(9)
    d = tmp_path / "ucr"
    d.mkdir()
    for i in range(3):
        n, split = 400, 150
        x = np.sin(np.arange(n) / 7.0) + rng.normal(0, 0.05, n)
        a0, a1 = 250 + i * 10, 280 + i * 10
        x[a0:a1] += 2.5
        (d / f"series{i}_{split}_{a0}_{a1}.txt").write_text(
            "\n".join(f"{v:.6f}" for v in x)
        )

    ds = ucr_dataset(spark, str(d))
    assert ds.X_train is not None
    assert CMP.Supervision.SEMI_SUPERVISED in ds.compatible_supervision()
    assert ds.X_test.count() == 3
    # test arrays are the post-split remainder
    r = ds.X_test.collect()[0]
    assert r["n_tok"] == 250

    ep = CMP.EvaluationPipeline(
        "Identity",
        CMP.KMeansAnomalyDetector(window_size=16, stride=8, n_clusters=4),
        ["AreaUnderROC"],
    )
    out = ep.run(ds)
    # the detector fit ONLY normal data; the injected level shift in the
    # test region must score as anomalous
    assert out["AreaUnderROC"] > 0.7, out


def test_ucr_oversized_file_guard(spark, tmp_path):
    """wholetext materializes one row per file: files beyond
    max_file_bytes must fail fast with the offender listed, BEFORE any
    executor task OOMs; compliant files load unchanged under the same
    bound."""
    import pytest

    from dtaianomaly_spark.sources.ucr import load_ucr_directory

    small = tmp_path / "001_UCR_Anomaly_x_10_20_25.txt"
    small.write_text("\n".join(str(float(i)) for i in range(40)) + "\n")
    big = tmp_path / "002_UCR_Anomaly_y_10_20_25.txt"
    big.write_text("\n".join(str(float(i)) for i in range(5000)) + "\n")

    with pytest.raises(ValueError, match=r"max_file_bytes.*002_UCR_Anomaly_y"):
        load_ucr_directory(spark, str(tmp_path), max_file_bytes=1024)

    # under the default bound both load; line order (the time axis) intact
    lf = load_ucr_directory(spark, str(tmp_path))
    assert lf.count() == 40 + 5000
    rows = (
        lf.filter("series_id like '001%'").orderBy("pos").limit(3).collect()
    )
    assert [r["value"] for r in rows] == [0.0, 1.0, 2.0]
