"""General F-beta, BestThresholdMetric(metric, max_nb_thresholds) and the
baseline detectors, checked against exact NumPy re-implementations of the
reference semantics (simple_binary_metrics.py:83-118,
BestThresholdMetric.py:58-118, baselines/baselines.py:8-64)."""

import hashlib
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dtaianomaly_spark.operators import detectors as DET
from dtaianomaly_spark.operators import evaluation as EV


def _np_fbeta(y_true, y_pred, beta):
    tp = int(np.sum((y_pred == 1) & (y_true == 1)))
    fp = int(np.sum((y_pred == 1) & (y_true == 0)))
    fn = int(np.sum((y_pred == 0) & (y_true == 1)))
    b2 = beta * beta
    denom = (1 + b2) * tp + fp + b2 * fn
    return 0.0 if denom == 0 else (1 + b2) * tp / denom


def _np_best_threshold(y_true, scores, beta, max_nb=-1):
    """Reference BestThresholdMetric._compute semantics."""
    uniq = np.sort(np.unique(scores))
    thresholds = (uniq[:-1] + uniq[1:]) / 2.0
    thresholds = np.append(np.insert(thresholds, 0, 0), 1)
    if 0 < max_nb < thresholds.shape[0]:
        sel = np.linspace(0, thresholds.shape[0], max_nb + 2, dtype=int)[1:-1]
        thresholds = thresholds[sel]
    vals = [_np_fbeta(y_true, (scores >= t).astype(int), beta) for t in thresholds]
    return max(vals)


def _mk_scored(spark, seed=3):
    rng = np.random.default_rng(seed)
    rows = []
    for d in range(6):
        n = int(rng.integers(30, 120))
        scores = rng.random(n).round(2)  # duplicates on purpose
        truth = (rng.random(n) < 0.15).astype(int)
        rows += [(d, p, float(scores[p]), int(truth[p])) for p in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, pos long, score double, truth int")
    return df, rows


def test_fbeta_metrics_matches_numpy(spark):
    df, rows = _mk_scored(spark)
    labeled = EV.top_n(df, 10)
    got = {r["doc_id"]: r["fbeta"] for r in EV.fbeta_metrics(labeled, 2.0).collect()}
    lab = {r["doc_id"]: r for r in labeled.collect()}  # noqa: F841
    pd_rows = labeled.toPandas()
    for d in got:
        sub = pd_rows[pd_rows.doc_id == d]
        want = _np_fbeta(sub.truth.values, sub.label.values, 2.0)
        assert got[d] == pytest.approx(want, abs=1e-12)


@pytest.mark.parametrize("beta,max_nb", [(1.0, -1), (0.5, -1), (2.0, 7), (1.0, 3)])
def test_best_threshold_metric_matches_reference(spark, beta, max_nb):
    df, rows = _mk_scored(spark)
    got = {
        r["doc_id"]: r["best_metric"]
        for r in EV.best_threshold_metric(
            df, EV.fbeta_sql(beta), max_nb_thresholds=max_nb
        ).collect()
    }
    arr = np.array(rows, dtype=object)
    for d in got:
        mask = np.array([r[0] == d for r in rows])
        scores = np.array([r[2] for r in rows])[mask]
        truth = np.array([r[3] for r in rows])[mask]
        want = _np_best_threshold(truth, scores, beta, max_nb)
        assert got[d] == pytest.approx(want, abs=1e-12), f"doc {d}"


def test_best_threshold_rejects_bad_max_nb(spark):
    df, _ = _mk_scored(spark)
    with pytest.raises(ValueError):
        EV.best_threshold_metric(df, EV.F1_SQL, max_nb_thresholds=0).collect()


def test_baseline_detectors(spark):
    lf = spark.createDataFrame(
        [("a", p, p) for p in range(10)] + [("b", p, -p) for p in range(5)],
        "doc_id string, pos long, value long",
    )
    assert {r["score"] for r in DET.always_normal_scores(lf).collect()} == {0.0}
    assert {r["score"] for r in DET.always_anomalous_scores(lf).collect()} == {1.0}
    got = {(r["doc_id"], r["pos"]): r["score"] for r in DET.random_scores(lf, seed=7).collect()}
    # deterministic, uniform-ish in [0,1), matches the md5 definition
    for (d, p), s in got.items():
        h = int(hashlib.md5(f"{d}:{p}:7".encode()).hexdigest()[:13], 16)
        assert s == h / 4503599627370496
        assert 0.0 <= s < 1.0
    assert len(set(got.values())) == len(got)  # no collisions at this size


def test_predict_proba_raises_on_constant_outside_unit(spark):
    from py4j.protocol import Py4JJavaError

    scored = spark.createDataFrame(
        [("a", p, 5.0) for p in range(4)], "doc_id string, pos long, score double"
    )
    with pytest.raises(Exception) as ei:
        DET.predict_proba(scored).collect()
    assert "constant decision" in str(ei.value)
    # non-strict passes through (round-1 behavior)
    vals = {r["proba"] for r in DET.predict_proba(scored, strict=False).collect()}
    assert vals == {5.0}


# ------------------------------------------------------- anomaly spans

def _spans_twin(pairs, merge_gap, min_length):
    """Plain-Python islands twin over (pos, score) flagged pairs of one
    series: bridge gaps <= merge_gap, drop spans < min_length."""
    out, cur = [], None
    for pos, score in sorted(pairs):
        if cur is None or pos - cur["end"] > merge_gap + 1:
            if cur is not None:
                out.append(cur)
            cur = {"start": pos, "end": pos, "n": 1,
                   "peak": score, "sum": score}
        else:
            cur["end"] = pos
            cur["n"] += 1
            cur["peak"] = max(cur["peak"], score)
            cur["sum"] += score
    if cur is not None:
        out.append(cur)
    return [
        (c["start"], c["end"], c["end"] - c["start"] + 1, c["n"],
         c["peak"], c["sum"] / c["n"])
        for c in out
        if c["end"] - c["start"] + 1 >= min_length
    ]


@pytest.mark.parametrize("merge_gap,min_length", [(0, 1), (2, 2), (5, 3)])
def test_anomaly_spans_matches_python_twin(spark, merge_gap, min_length):
    from dtaianomaly_spark.operators.evaluation import anomaly_spans

    # handcrafted labels with singletons, runs, bridgeable gaps and a
    # second series
    rows = []
    flagged = {
        "a": [3, 4, 5, 8, 20, 22, 23, 40],
        "b": [0, 1, 2, 3, 10, 99],
    }
    for d, n in (("a", 100), ("b", 100)):
        for p in range(n):
            lab = 1 if p in flagged[d] else 0
            rows.append((d, p, float(p % 7) + lab * 10.0, lab))
    df = spark.createDataFrame(
        rows, "doc_id string, pos long, score double, label int"
    )
    got = {}
    for r in anomaly_spans(df, merge_gap, min_length).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"], r["length"], r["n_flagged"],
             r["peak_score"], r["mean_score"])
        )
    for d, poss in flagged.items():
        want = _spans_twin(
            [(p, float(p % 7) + 10.0) for p in poss], merge_gap, min_length
        )
        assert sorted(got.get(d, [])) == sorted(want), (d, merge_gap)
    # without a score column the span stats are omitted
    cols = anomaly_spans(df.drop("score"), merge_gap, min_length).columns
    assert "peak_score" not in cols and "n_flagged" in cols
    with pytest.raises(ValueError, match="merge_gap"):
        anomaly_spans(df, -1, 1)


def test_ev_anomaly_spans_query_consistent(spark):
    import __spark_entry__ as E

    SF_DIR = "/root/testdata/sf0.001"
    from dtaianomaly_spark.operators import evaluation as EV

    labeled = EV.contamination_rate(
        E.queries()["median_method"](spark, SF_DIR), 0.02
    )
    flagged = {}
    for r in labeled.filter("label = 1").collect():
        flagged.setdefault(r["doc_id"], []).append((r["pos"], r["score"]))
    got = {}
    for r in E.queries()["ev_anomaly_spans"](spark, SF_DIR).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"], r["length"], r["n_flagged"],
             r["peak_score"], r["mean_score"])
        )
    assert set(got) <= set(flagged)
    n_spans = 0
    for d, pairs in flagged.items():
        want = _spans_twin(pairs, 2, 1)
        assert sorted(got.get(d, [])) == sorted(want), d
        n_spans += len(want)
    assert n_spans > 50
