"""SparkDetector components: BaseDetector contract — fit/decision_function
/predict_proba/save/load_detector (BaseDetector.py:54-331) and the
PrettyPrintable canonical strings (PrettyPrintable.py:5-34)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dtaianomaly_spark.sources import corpus as C
from dtaianomaly_spark.workflow import components as CMP

SF_DIR = "/root/testdata/sf0.001"


def _arrays(spark):
    return C.token_arrays(spark, SF_DIR).filter("CAST(doc_id AS BIGINT) < 40")


@pytest.mark.parametrize(
    "cls,kwargs",
    [
        (CMP.KMeansAnomalyDetector, {"n_clusters": 4}),
        (CMP.IsolationForest, {"n_estimators": 10}),
        (CMP.KNearestNeighbors, {}),
        (CMP.HistogramBasedOutlierScore, {}),
    ],
)
def test_save_load_scores_identical(spark, tmp_path, cls, kwargs):
    """fit -> save -> load in a 'fresh' context -> byte-identical scores
    WITHOUT refitting (BaseDetector.py:289-331)."""
    arrays = _arrays(spark)
    det = cls(window_size=16, stride=8, **kwargs).fit(arrays)
    path = str(tmp_path / "sub" / "model")  # exercises mkdir + .dtai suffix
    det.save(path)
    assert os.path.exists(path + ".dtai")

    loaded = CMP.load_detector(path + ".dtai")
    a = det.decision_function(arrays).orderBy("doc_id", "pos").collect()
    b = loaded.decision_function(arrays).orderBy("doc_id", "pos").collect()
    assert [r["score"] for r in a] == [r["score"] for r in b]
    assert len(a) > 0


def test_unfitted_raises(spark):
    with pytest.raises(CMP.NotFittedError):
        CMP.KMeansAnomalyDetector().decision_function(_arrays(spark))


def test_stateless_detectors_score_without_fit(spark):
    arrays = _arrays(spark)
    for det in (CMP.MedianMethod(), CMP.MatrixProfileDetector(window_size=16),
                CMP.AlwaysNormal(), CMP.RandomDetector(seed=1)):
        out = det.decision_function(arrays)
        # canonical SCORE_SCHEMA contract: every detector — baselines
        # included — emits a STRING doc_id, so truth joins never rely on
        # implicit string<->bigint key coercion
        assert dict(out.dtypes)["doc_id"] == "string"
        assert out.count() > 0


def test_predict_proba_in_unit_interval(spark):
    arrays = _arrays(spark)
    probas = CMP.MedianMethod().predict_proba(arrays)
    mn, mx = probas.agg(
        {"proba": "min"}
    ).collect()[0][0], probas.agg({"proba": "max"}).collect()[0][0]
    assert 0.0 <= mn <= mx <= 1.0


def test_pretty_strings():
    assert str(CMP.MedianMethod()) == "MedianMethod()"
    assert str(CMP.MedianMethod(neighborhood_size_before=8)) == (
        "MedianMethod(neighborhood_size_before=8)"
    )
    assert str(CMP.KMeansAnomalyDetector(n_clusters=4)) == (
        "KMeansAnomalyDetector(n_clusters=4)"
    )
    assert str(CMP.RandomDetector(seed=5)) == "RandomDetector(seed=5)"


def test_registry_covers_reference_detectors():
    expected = {
        "AlwaysNormal", "AlwaysAnomalous", "RandomDetector",
        "MedianMethod", "MatrixProfileDetector", "KMeansAnomalyDetector",
        "IsolationForest", "KNearestNeighbors", "LocalOutlierFactor",
        "HistogramBasedOutlierScore", "CopulaBasedOutlierDetector",
        "PrincipalComponentAnalysis", "KernelPrincipalComponentAnalysis",
        "ClusterBasedLocalOutlierFactor", "OneClassSupportVectorMachine",
        "RobustPrincipalComponentAnalysis", "KShapeAnomalyDetector",
    }
    assert expected == set(CMP.DETECTOR_REGISTRY)


def test_supervision_matches_reference():
    """BaseDetector.py:17-33 taxonomy: PCA/KPCA/OCSVM/RPCA are
    semi-supervised in the reference; everything else here is
    unsupervised."""
    semi = {
        "PrincipalComponentAnalysis", "KernelPrincipalComponentAnalysis",
        "OneClassSupportVectorMachine", "RobustPrincipalComponentAnalysis",
    }
    for name, cls in CMP.DETECTOR_REGISTRY.items():
        want = CMP.Supervision.SEMI_SUPERVISED if name in semi else CMP.Supervision.UNSUPERVISED
        assert cls.supervision == want, name


def test_pipeline_component_fit_score_save_load(spark, tmp_path):
    """Pipeline(preprocessor, detector) behaves as one detector
    (pipeline/Pipeline.py:10-120): transform -> fit -> score, and the
    composite save/load round-trips to identical scores."""
    arrays = _arrays(spark)
    pipe = CMP.Pipeline(
        [{"type": "MovingAverage", "window_size": 4}, "StandardScaler"],
        CMP.KMeansAnomalyDetector(window_size=16, stride=8, n_clusters=4),
    ).fit(arrays)
    scored = pipe.decision_function(arrays)
    assert scored.count() > 0

    path = str(tmp_path / "pipe")
    pipe.save(path)
    loaded = CMP.load_detector(path + ".dtai")
    a = scored.orderBy("doc_id", "pos").collect()
    b = loaded.decision_function(arrays).orderBy("doc_id", "pos").collect()
    assert [r["score"] for r in a] == [r["score"] for r in b]

    with pytest.raises(TypeError):
        CMP.Pipeline("Identity", "not-a-detector")
    assert str(pipe).startswith("Pipeline(preprocessor=")


def test_auto_window_size_modes(spark):
    """window_size='fft'/'suss' etc. resolve at fit (window-model family,
    median over the fit sample — MatrixProfileDetector.py:117 analog) or
    per series (MatrixProfile)."""
    arrays = _arrays(spark)
    det = CMP.KMeansAnomalyDetector(window_size="fft", stride=8, n_clusters=4)
    det.fit(arrays)
    assert isinstance(det.window_size_, int) and det.window_size_ >= 10
    assert det.decision_function(arrays).count() > 0

    mp = CMP.MatrixProfileDetector(window_size="suss")
    assert mp.decision_function(arrays.filter("CAST(doc_id AS BIGINT) < 6")).count() > 0

    with pytest.raises(ValueError, match="Invalid window_size"):
        CMP.MatrixProfileDetector(window_size="nope")


def test_dataset_supervision_routing(spark):
    from pyspark.sql import functions as F

    arrays = _arrays(spark)
    truth = arrays.select(
        "doc_id", F.posexplode("tokens").alias("pos", "v")
    ).select("doc_id", F.col("pos").cast("long").alias("pos"),
             (F.col("v") > 300).cast("int").alias("truth"))

    ds = CMP.DataSet(arrays, truth)
    assert ds.compatible_supervision() == [CMP.Supervision.UNSUPERVISED]
    assert ds.is_compatible(CMP.MedianMethod())
    assert not ds.is_compatible(CMP.PrincipalComponentAnalysis())
    with pytest.raises(ValueError, match="not\\s+compatible"):
        ds.fit_frame(CMP.PrincipalComponentAnalysis())

    ds2 = CMP.DataSet(arrays, truth, X_train=arrays)
    assert ds2.is_compatible(CMP.PrincipalComponentAnalysis())
    assert ds2.fit_frame(CMP.PrincipalComponentAnalysis()) is arrays
    with pytest.raises(ValueError, match="y_train"):
        CMP.DataSet(arrays, truth, y_train=truth)


def test_evaluation_pipeline_runs_metrics(spark):
    from pyspark.sql import functions as F

    arrays = _arrays(spark)
    truth = arrays.select(
        "doc_id", F.posexplode("tokens").alias("pos", "v")
    ).select("doc_id", F.col("pos").cast("long").alias("pos"),
             (F.col("v") > 300).cast("int").alias("truth"))
    ep = CMP.EvaluationPipeline(
        "Identity", CMP.MedianMethod(), ["AreaUnderROC", "FBeta"]
    )
    out = ep.run(CMP.DataSet(arrays, truth))
    assert set(out) == {"AreaUnderROC", "FBeta[TopN=20]"}
    assert 0.0 <= out["FBeta[TopN=20]"] <= 1.0
    assert out["AreaUnderROC"] > 0.5  # spikes are high-valued


def test_predict_confidence_matches_operator(spark):
    """Component predict_confidence == the fused Arrow-pass operator
    (exceed_confidence_scores) for MedianMethod scores."""
    arrays = _arrays(spark)
    from dtaianomaly_spark.operators import detectors as DET

    got = {
        (r["doc_id"], r["pos"]): r["confidence"]
        for r in CMP.MedianMethod().predict_confidence(arrays).collect()
    }
    want = {
        (r["doc_id"], r["pos"]): r["score"]
        for r in DET.exceed_confidence_scores(arrays).collect()
    }
    assert got.keys() == want.keys() and len(got) > 0
    for k in got:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


def test_kshape_auto_window_scores(spark):
    """KShape with an auto window mode must use the fit-resolved window
    at scoring (regression: it crashed with the mode string)."""
    arrays = _arrays(spark)
    det = CMP.KShapeAnomalyDetector(window_size="fft", stride=8, n_clusters=3)
    det.fit(arrays)
    assert isinstance(det.window_size_, int)
    assert det.decision_function(arrays).count() > 0


def test_auto_window_fit_on_string_ids(spark):
    """Auto window resolution must handle non-numeric series ids (the
    UCR path) — regression for the ANSI-mode cast crash."""
    from pyspark.sql import functions as F

    arrays = _arrays(spark).select(
        F.concat(F.lit("ucr-"), "doc_id").alias("doc_id"), "tokens", "n_tok"
    )
    det = CMP.KMeansAnomalyDetector(window_size="fft", stride=8, n_clusters=3)
    det.fit(arrays)
    assert isinstance(det.window_size_, int) and det.window_size_ >= 10


def test_fit_sample_rejects_too_large_window(spark):
    from dtaianomaly_spark.operators.detectors import fit_sample_windows

    with pytest.raises(ValueError, match="exceeds the length"):
        fit_sample_windows(_arrays(spark), window_size=100_000, stride=16)


def test_evaluation_pipeline_pretty_string(spark):
    ep = CMP.EvaluationPipeline("Identity", CMP.MedianMethod(), ["AreaUnderROC"])
    s = str(ep)  # regression: raised AttributeError
    assert s.startswith("EvaluationPipeline(") and "MedianMethod()" in s


# ------------------------------------- MatrixProfileDetector full params

def test_matrix_profile_param_validation():
    """Constructor validation mirrors MatrixProfileDetector.py:94-108."""
    MP = CMP.MatrixProfileDetector
    with pytest.raises(TypeError, match="normalize"):
        MP(window_size=16, normalize="yes")
    with pytest.raises(TypeError, match="`p` should be numeric"):
        MP(window_size=16, p="2")
    with pytest.raises(TypeError, match="`p` should be numeric"):
        MP(window_size=16, p=True)
    with pytest.raises(ValueError, match="p-norm"):
        MP(window_size=16, p=0.5)
    with pytest.raises(TypeError, match="`k` should be integer"):
        MP(window_size=16, k=1.5)
    with pytest.raises(TypeError, match="`k` should be integer"):
        MP(window_size=16, k=True)
    with pytest.raises(ValueError, match="strictly positive"):
        MP(window_size=16, k=0)
    with pytest.raises(TypeError, match="novelty"):
        MP(window_size=16, novelty=1)


def test_matrix_profile_params_route_to_kernel(spark):
    """normalize/p/k reach the kernel: component scores equal the kernel
    oracle on a collected series, and differ across parameterizations."""
    import numpy as np

    from dtaianomaly_spark.kernels import detectors as KD
    from dtaianomaly_spark.kernels import windowing as KW

    arrays = _arrays(spark).filter("CAST(doc_id AS BIGINT) < 6")
    series = {
        r["doc_id"]: np.asarray(r["tokens"], dtype=np.float64)
        for r in arrays.collect()
    }
    outs = {}
    for name, kwargs in [
        ("default", {}),
        ("k2", {"k": 2}),
        ("aamp", {"normalize": False}),
        ("aamp_p3", {"normalize": False, "p": 3.0}),
    ]:
        det = CMP.MatrixProfileDetector(window_size=16, **kwargs)
        got = {}
        for r in det.decision_function(arrays).collect():
            got.setdefault(r["doc_id"], {})[r["pos"]] = r["score"]
        outs[name] = got
        for doc_id, x in series.items():
            prof = KD.matrix_profile_general(x, 16, **kwargs)
            expect = KW.reverse_sliding_window(prof, 16, 1, x.shape[0])
            out = np.array([got[str(doc_id)][p] for p in range(x.shape[0])])
            assert np.allclose(out, expect, atol=1e-8), (name, doc_id)
    base = outs["default"][next(iter(outs["default"]))]
    for other in ("k2", "aamp", "aamp_p3"):
        assert outs[other][next(iter(outs[other]))] != base, other


def test_matrix_profile_novelty_fit_score_save_load(spark, tmp_path):
    """novelty=True: fit WRITES the per-series reference to parquet (no
    driver collect), scoring is the distributed equi-join against each
    series' own reference, save/load reproduces scores (the reference
    parquet travels next to the .dtai), and scoring before fit raises."""
    import numpy as np
    from pyspark.sql import functions as F

    from dtaianomaly_spark.kernels import detectors as KD
    from dtaianomaly_spark.kernels import windowing as KW

    arrays = _arrays(spark).filter("CAST(doc_id AS BIGINT) < 6")
    # reference split = each series' first half (deterministic, per-series)
    ref = arrays.select(
        "doc_id",
        F.expr("slice(tokens, 1, CAST(n_tok / 2 AS INT))").alias("tokens"),
        F.expr("CAST(n_tok / 2 AS INT)").alias("n_tok"),
    )

    det = CMP.MatrixProfileDetector(window_size=16, novelty=True)
    with pytest.raises(CMP.NotFittedError):
        det.decision_function(arrays).count()
    det.fit(ref)

    got = {}
    for r in det.decision_function(arrays).collect():
        got.setdefault(r["doc_id"], {})[r["pos"]] = r["score"]
    assert len(got) == 6

    for r in arrays.collect():
        x = np.asarray(r["tokens"], dtype=np.float64)
        xr = x[: x.shape[0] // 2]
        prof = KD.matrix_profile_general(x, 16, x_ref=xr)
        expect = KW.reverse_sliding_window(prof, 16, 1, x.shape[0])
        out = np.array([got[str(r["doc_id"])][p] for p in range(x.shape[0])])
        assert np.allclose(out, expect, atol=1e-8)

    path = str(tmp_path / "mp_novelty")
    det.save(path)
    loaded = CMP.load_detector(path + ".dtai")
    a = det.decision_function(arrays).orderBy("doc_id", "pos").collect()
    b = loaded.decision_function(arrays).orderBy("doc_id", "pos").collect()
    assert a == b


def test_matrix_profile_novelty_refit_and_resave_replace_reference(
    spark, tmp_path
):
    """Regression: save() must REPLACE a previous save's reference
    parquet — parquet part files carry unique names per write, so a
    merging copy (copytree dirs_exist_ok) would silently UNION two
    reference corpora and trip the duplicate-reference guard — and
    fit()/save() must free superseded scratch directories."""
    from pyspark.sql import functions as F

    arrays = _arrays(spark).filter("CAST(doc_id AS BIGINT) < 3")
    ref_a = arrays.select(
        "doc_id",
        F.expr("slice(tokens, 1, CAST(n_tok / 2 AS INT))").alias("tokens"),
    )
    ref_b = arrays.select(
        "doc_id",
        F.expr("slice(tokens, 1, CAST(n_tok * 3 / 4 AS INT))").alias(
            "tokens"
        ),
    )

    det = CMP.MatrixProfileDetector(window_size=16, novelty=True)
    det.fit(ref_a)
    first_tmp = det.reference_path_
    path = str(tmp_path / "mp_novelty_resave")
    det.save(path)
    assert not os.path.exists(first_tmp)  # superseded by the .ref copy

    det.fit(ref_b)
    second_tmp = det.reference_path_
    assert second_tmp != first_tmp
    det.save(path)  # SAME target: must replace the ref_a parquet
    assert not os.path.exists(second_tmp)

    loaded = CMP.load_detector(path + ".dtai")
    got = loaded.decision_function(arrays).orderBy("doc_id", "pos").collect()
    fresh = CMP.MatrixProfileDetector(window_size=16, novelty=True)
    fresh.fit(ref_b)
    want = fresh.decision_function(arrays).orderBy("doc_id", "pos").collect()
    # a merged (ref_a UNION ref_b) corpus would raise the
    # duplicate-reference guard before ever producing rows
    assert got == want


def test_matrix_profile_novelty_join_equals_dict(spark):
    """The distributed equi-join novelty form (no driver collect, no
    broadcast reference dict) returns EXACTLY the dict form's scores —
    for int and auto window sizes, and for k>1 / aamp variants."""
    import numpy as np
    from pyspark.sql import functions as F

    from dtaianomaly_spark.operators import detectors as DET

    arrays = _arrays(spark).filter("CAST(doc_id AS BIGINT) < 5")
    ref = arrays.select(
        "doc_id",
        F.expr("slice(tokens, 1, CAST(n_tok / 2 AS INT))").alias("tokens"),
        F.expr("CAST(n_tok / 2 AS INT)").alias("n_tok"),
    )
    # test-local collect: the dict form is kept as the equivalence
    # oracle for the join path; product code never collects references
    reference = {
        str(r["doc_id"]): np.asarray(r["tokens"], dtype=np.float64)
        for r in ref.collect()
    }
    for kwargs in (
        {},
        {"normalize": False, "p": 1.0},
        {"k": 2},
    ):
        for ws in (16, "fft"):
            a = (
                DET.matrix_profile_novelty_scores(arrays, reference, ws, **kwargs)
                .orderBy("doc_id", "pos").collect()
            )
            b = (
                DET.matrix_profile_novelty_scores_join(arrays, ref, ws, **kwargs)
                .orderBy("doc_id", "pos").collect()
            )
            assert a == b, (ws, kwargs)


def test_matrix_profile_novelty_join_missing_reference_raises(spark):
    from pyspark.sql import functions as F

    from dtaianomaly_spark.operators import detectors as DET

    arrays = _arrays(spark).filter("CAST(doc_id AS BIGINT) < 4")
    ref = arrays.filter("CAST(doc_id AS BIGINT) < 2").select(
        "doc_id",
        F.expr("slice(tokens, 1, CAST(n_tok / 2 AS INT))").alias("tokens"),
        "n_tok",
    )
    with pytest.raises(Exception, match="no reference series"):
        DET.matrix_profile_novelty_scores_join(arrays, ref, 16).count()


def test_matrix_profile_novelty_single_reference_broadcast(spark):
    """A one-series reference corpus (the reference's own shape — a
    single pickled X_reference_) scores EVERY test series against that
    series, even when doc_ids differ (train/test splits)."""
    import numpy as np
    from pyspark.sql import functions as F

    from dtaianomaly_spark.kernels import detectors as KD
    from dtaianomaly_spark.kernels import windowing as KW

    test_arrays = _arrays(spark).filter("CAST(doc_id AS BIGINT) < 4")
    ref_arrays = _arrays(spark).filter("CAST(doc_id AS BIGINT) = 30").select(
        F.lit("train-series").alias("doc_id"), "tokens", "n_tok"
    )
    ref_np = np.asarray(
        ref_arrays.collect()[0]["tokens"], dtype=np.float64
    )

    det = CMP.MatrixProfileDetector(window_size=16, novelty=True).fit(ref_arrays)
    got = {}
    for r in det.decision_function(test_arrays).collect():
        got.setdefault(r["doc_id"], {})[r["pos"]] = r["score"]
    assert len(got) == 4
    for r in test_arrays.collect():
        x = np.asarray(r["tokens"], dtype=np.float64)
        prof = KD.matrix_profile(x, 16, x_ref=ref_np)
        expect = KW.reverse_sliding_window(prof, 16, 1, x.shape[0])
        out = np.array([got[str(r["doc_id"])][p] for p in range(x.shape[0])])
        assert np.allclose(out, expect, atol=1e-8)


def test_matrix_profile_novelty_join_duplicate_reference_raises(spark):
    from pyspark.sql import functions as F

    from dtaianomaly_spark.operators import detectors as DET

    arrays = _arrays(spark).filter("CAST(doc_id AS BIGINT) < 3")
    ref = arrays.select(
        "doc_id",
        F.expr("slice(tokens, 1, 32)").alias("tokens"),
        F.lit(32).alias("n_tok"),
    )
    dup_ref = ref.unionByName(ref.filter("CAST(doc_id AS BIGINT) = 1"))
    with pytest.raises(Exception, match="reference series"):
        DET.matrix_profile_novelty_scores_join(arrays, dup_ref, 16).count()
