"""Experiment grid: (sources × preprocessors × detectors) × metrics.

Mirrors the reference's ``Workflow`` (workflow/Workflow.py:169-379):
jobs are the cross-product of data sources and pipelines; each job runs
fit+score, evaluates every metric, records wall-clock runtime, and
failures quarantine into an ``Error`` cell instead of killing the grid
(the reference writes a reproducible .err script — here the error string
plus the job's lineage land in the result row). ``workflow_from_config``
(workflow/workflow_from_config.py:11-438) interprets the same
"type"-tagged JSON config shape with the reference's component names.

Spark mapping: the grid iterates at the driver; each cell is one (or a
few) Spark actions over the shared corpus DataFrame — on a cluster the
driver submits cells concurrently via the fair scheduler; here they run
serially for deterministic timing. Per-job runtime comes from driver
timers (the reference's time.time pattern); per-partition metrics come
from plans/lineage.py rather than tracemalloc (executor memory is a
Spark-metrics concern, not a driver-process one).
"""

from __future__ import annotations

import time
import traceback
from typing import Callable, Dict, List, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dtaianomaly_spark.sources import corpus as C

TRUTH_SPIKE = "(CAST(doc_id AS BIGINT) * 7919 + pos * 104729) % 997 = 0"


# ---------------------------------------------------------------- components

def _det_median(spark, arrays, long_form):
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(-16, 16)
    from dtaianomaly_spark.rollup.tiers import DERIVE_MEAN_SQL, DERIVE_STD_SQL

    stats = long_form.select(
        "doc_id", "pos", "value",
        F.count("value").over(w).alias("cnt"),
        F.sum("value").over(w).alias("sum"),
        F.sum(F.col("value") * F.col("value")).over(w).alias("sumsq"),
    )
    return stats.select(
        "doc_id", "pos",
        F.expr(
            f"CASE WHEN {DERIVE_STD_SQL} = 0.0 THEN 0.0 "
            f"ELSE abs(CAST(value AS DOUBLE) - ({DERIVE_MEAN_SQL})) / ({DERIVE_STD_SQL}) END"
        ).alias("score"),
    )


def _det_matrix_profile(spark, arrays, long_form, window_size=32):
    from dtaianomaly_spark.operators import detectors as DET

    return DET.matrix_profile_scores(arrays, window_size)


def _det_kmeans(spark, arrays, long_form, window_size=32, stride=16, n_clusters=8):
    from dtaianomaly_spark.operators import detectors as DET

    return DET.kmeans_scores(arrays, window_size, stride, k=n_clusters)


def _det_iforest(spark, arrays, long_form, window_size=32, stride=16, n_trees=25):
    from dtaianomaly_spark.operators import detectors as DET

    return DET.iforest_scores(arrays, window_size, stride, n_trees=n_trees)


DETECTORS: Dict[str, Callable] = {
    "MedianMethod": _det_median,
    "MatrixProfileDetector": _det_matrix_profile,
    "KMeansAnomalyDetector": _det_kmeans,
    "IsolationForest": _det_iforest,
}


def _pp_identity(long_form):
    return long_form


def _pp_standard(long_form):
    from dtaianomaly_spark.operators import preprocessing as PP

    out = PP.standard_scale(long_form)
    # rescaled values re-enter as integer milli-units so downstream
    # integer-exact operators keep working
    return out.select(
        "doc_id", "pos",
        F.expr("CAST(round(out * 1000) AS BIGINT)").alias("value"),
    )


def _pp_moving_average(long_form, window_size=8):
    from dtaianomaly_spark.operators import preprocessing as PP

    out = PP.moving_average(long_form, window_size)
    return out.select(
        "doc_id", "pos",
        F.expr("CAST(round(out * 1000) AS BIGINT)").alias("value"),
    )


def _pp_differencing(long_form, order=1, window_size=1):
    from dtaianomaly_spark.operators import preprocessing as PP

    return PP.differencing(long_form, order, window_size).select(
        "doc_id", "pos", F.col("out").alias("value")
    )


PREPROCESSORS: Dict[str, Callable] = {
    "Identity": _pp_identity,
    "StandardScaler": _pp_standard,
    "MovingAverage": _pp_moving_average,
    "Differencing": _pp_differencing,
}


def _metric_auc(scored_truth):
    from dtaianomaly_spark.operators import evaluation as EV

    df = EV.auc_roc(scored_truth).agg(F.avg("auc").alias("v"))
    return df.collect()[0]["v"]


def _threshold_metric(scored_truth, threshold: Tuple[str, float], metric: str):
    from dtaianomaly_spark.operators import evaluation as EV

    kind, param = threshold
    if kind == "FixedCutoff":
        labeled = scored_truth.select(
            "doc_id", "pos", "truth",
            (F.col("score") >= param).cast("int").alias("label"),
        )
    elif kind == "ContaminationRate":
        labeled = EV.contamination_rate(scored_truth, rate=param)
    elif kind == "TopN":
        labeled = EV.top_n(scored_truth, int(param))
    else:
        raise ValueError(f"unknown threshold type {kind!r}")
    per_series = EV.confusion_metrics(labeled)
    col = {"Precision": "precision", "Recall": "recall", "FBeta": "f1"}[metric]
    return per_series.agg(F.avg(col).alias("v")).collect()[0]["v"]


class Workflow:
    """Grid runner over the shared token corpus."""

    def __init__(
        self,
        sources: List[str],
        preprocessors: List[str],
        detectors: List[Tuple[str, dict]],
        metrics: List[str],
        thresholds: List[Tuple[str, float]],
    ):
        self.sources = sources
        self.preprocessors = preprocessors
        self.detectors = detectors
        self.metrics = metrics
        self.thresholds = thresholds

    def run(self, spark: SparkSession) -> pd.DataFrame:
        rows = []
        for sf_dir in self.sources:
            arrays = C.token_arrays(spark, sf_dir)
            base_long = C.token_long_form(spark, sf_dir)
            for pp_name in self.preprocessors:
                for det_name, det_kwargs in self.detectors:
                    row = {
                        "Dataset": sf_dir,
                        "Preprocessor": pp_name,
                        "Detector": det_name,
                    }
                    t0 = time.perf_counter()
                    try:
                        long_form = PREPROCESSORS[pp_name](base_long)
                        scored = DETECTORS[det_name](
                            spark, arrays, long_form, **det_kwargs
                        )
                        scored_truth = scored.join(
                            base_long.select(
                                "doc_id", "pos",
                                F.expr(
                                    f"CASE WHEN {TRUTH_SPIKE} THEN 1 ELSE 0 END"
                                ).alias("truth"),
                            ),
                            ["doc_id", "pos"],
                        )
                        scored_truth = scored_truth.persist()
                        try:
                            for m in self.metrics:
                                if m == "AreaUnderROC":
                                    row[m] = _metric_auc(scored_truth)
                                else:
                                    for th in self.thresholds:
                                        key = f"{m}[{th[0]}={th[1]}]"
                                        row[key] = _threshold_metric(
                                            scored_truth, th, m
                                        )
                        finally:
                            scored_truth.unpersist()
                        row["Error"] = ""
                    except Exception as exc:  # quarantine, keep the grid alive
                        row["Error"] = f"{type(exc).__name__}: {exc}"
                        row["Traceback"] = traceback.format_exc(limit=3)
                    row["Runtime [s]"] = round(time.perf_counter() - t0, 3)
                    rows.append(row)
        return pd.DataFrame(rows)


MAX_CONFIG_BYTES = 1_000_000  # reference guard, workflow_from_config.py:11-61


def workflow_from_config_file(path: str) -> "Workflow":
    """Load a JSON or TOML job spec (the reference's file entry point,
    workflow_from_config.py:11-61, including its <=1 MB size guard)."""
    import json
    import os

    size = os.path.getsize(path)
    if size > MAX_CONFIG_BYTES:
        raise ValueError(
            f"config file is {size} bytes; the maximum is {MAX_CONFIG_BYTES}"
        )
    with open(path, "rb") as f:
        raw = f.read()
    if path.endswith(".toml"):
        import tomllib

        config = tomllib.loads(raw.decode())
    else:
        config = json.loads(raw)
    return workflow_from_config(config)


def workflow_from_config(config: dict) -> Workflow:
    """Interpret the reference-shaped, "type"-tagged config dict
    (workflow_from_config.py:64-438): unknown component types raise with
    the offending tag."""

    def names(section, registry, what):
        out = []
        for entry in config.get(section, []):
            t = entry["type"] if isinstance(entry, dict) else entry
            if t not in registry:
                raise ValueError(f"unknown {what} type {t!r}")
            out.append(t)
        return out

    detectors = []
    for entry in config.get("detectors", []):
        t = entry["type"] if isinstance(entry, dict) else entry
        if t not in DETECTORS:
            raise ValueError(f"unknown detector type {t!r}")
        kwargs = {k: v for k, v in entry.items() if k != "type"} if isinstance(entry, dict) else {}
        detectors.append((t, kwargs))

    thresholds = []
    for entry in config.get("thresholds", [{"type": "TopN", "param": 20}]):
        thresholds.append((entry["type"], entry.get("param", 0.05)))

    return Workflow(
        sources=config.get("dataloaders", ["/root/testdata/sf0.001"]),
        preprocessors=names("preprocessors", PREPROCESSORS, "preprocessor")
        or ["Identity"],
        detectors=detectors or [("MedianMethod", {})],
        metrics=[
            (e["type"] if isinstance(e, dict) else e)
            for e in config.get("metrics", ["AreaUnderROC"])
        ],
        thresholds=thresholds,
    )
