"""Experiment grid: (sources × preprocessors × detectors) × metrics.

Mirrors the reference's ``Workflow`` (workflow/Workflow.py:169-379):
jobs are the cross-product of data sources and pipelines; each job runs
fit+score, evaluates every metric, records fit/predict/total wall-clock
("Runtime Fit [s]" / "Runtime Predict [s]" / "Runtime [s]",
Workflow.py:255-266), and failures quarantine into an ``Error`` cell
instead of killing the grid. ``workflow_from_config``
(workflow/workflow_from_config.py:11-438) interprets the same
"type"-tagged JSON config shape with the reference's component names —
every detector in ``components.DETECTOR_REGISTRY`` (17), every
preprocessor (10 + ChainedPreprocessor), binary + proba + point-adjusted
+ best-threshold metrics, and the three thresholds.

Preprocessors transform the ``(X, y)`` PAIR like the reference's
``Preprocessor.transform`` (preprocessing/Preprocessor.py): the truth
column rides the long form through every transform, so undersampling
selects y at the same index grid and PAA thresholds the y-frame mean at
0.5 (PiecewiseAggregateApproximation.py:60-66).

Spark mapping: the grid iterates at the driver; each cell is a handful
of Spark actions over the shared corpus DataFrame. ``n_jobs > 1`` runs
cells from a driver thread pool, each thread tagging its jobs with a
fair-scheduler pool (the cluster analog of the reference's
multiprocessing.Pool, Workflow.py:229-249) — Spark schedules their
stages concurrently, so small cells fill the cluster instead of
serializing. Timings of concurrent cells overlap by design (same as the
reference's n_jobs); run serially for clean per-cell timing.
"""

from __future__ import annotations

import os
import time
import traceback
from typing import Callable, Dict, List, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dtaianomaly_spark.sources import corpus as C
from dtaianomaly_spark.workflow.components import (
    DETECTOR_REGISTRY, SparkDetector, initialization_call_string,
)

TRUTH_SPIKE = "(CAST(doc_id AS BIGINT) * 7919 + pos * 104729) % 997 = 0"


# ------------------------------------------------------------- preprocessors
#
# Each wrapper maps a long form (doc_id, pos, value, truth, n) to the same
# shape. Values re-enter as integer milli-units so downstream integer-exact
# operators keep working.

def _milli(out: DataFrame, col: str = "out") -> DataFrame:
    keep = [c for c in ("truth", "n") if c in out.columns]
    return out.select(
        "doc_id", "pos",
        F.expr(f"CAST(round({col} * 1000) AS BIGINT)").alias("value"),
        *keep,
    )


def _join_truth(out: DataFrame, inp: DataFrame) -> DataFrame:
    """Re-attach (truth, n) for pos-preserving transforms."""
    return out.join(inp.select("doc_id", "pos", "truth", "n"), ["doc_id", "pos"])


def _pp_identity(lf: DataFrame) -> DataFrame:
    return lf


def _pp_standard(lf: DataFrame) -> DataFrame:
    from dtaianomaly_spark.operators import preprocessing as PP

    return _join_truth(_milli(PP.standard_scale(lf)), lf)


def _pp_minmax(lf: DataFrame) -> DataFrame:
    from dtaianomaly_spark.operators import preprocessing as PP

    return _join_truth(_milli(PP.minmax_scale(lf)), lf)


def _pp_robust(lf: DataFrame) -> DataFrame:
    from dtaianomaly_spark.operators import preprocessing as PP

    return _join_truth(_milli(PP.robust_scale(lf)), lf)


def _pp_moving_average(lf: DataFrame, window_size: int = 8) -> DataFrame:
    from dtaianomaly_spark.operators import preprocessing as PP

    return _join_truth(_milli(PP.moving_average(lf, window_size)), lf)


def _pp_ema(lf: DataFrame, alpha: float = 0.9) -> DataFrame:
    from dtaianomaly_spark.operators import preprocessing as PP

    arrays = _long_to_arrays(lf)
    # cast the Arrow pass's string doc_id back to the INPUT's id type so
    # the truth join key matches exactly — a hard 'long' cast would
    # throw under ANSI for non-numeric ids (the UCR path)
    id_type = dict(lf.dtypes)["doc_id"]
    out = PP.ema(arrays, alpha).select(
        F.col("doc_id").cast(id_type).alias("doc_id"), "pos", F.col("out"),
    )
    return _join_truth(_milli(out), lf)


def _pp_differencing(lf: DataFrame, order: int = 1, window_size: int = 1) -> DataFrame:
    from dtaianomaly_spark.operators import preprocessing as PP

    out = PP.differencing(lf, order, window_size).select(
        "doc_id", "pos", F.col("out").alias("value")
    )
    return _join_truth(out, lf)


def _pp_undersample_rate(lf: DataFrame, k: int = 4) -> DataFrame:
    """X and y selected at the same every-k grid (UnderSampler.py:33-42)."""
    return lf.filter(F.col("pos") % k == 0).select(
        "doc_id", (F.col("pos") / k).cast("long").alias("pos"), "value", "truth",
        F.expr(f"CAST(ceil(n / {k}.0) AS INT)").alias("n"),
    )


def _pp_undersample_nb(lf: DataFrame, nb_samples: int = 128) -> DataFrame:
    """X and y selected at the same linspace grid (UnderSampler.py:70-78):
    the operator passes non-key columns through, so truth rides along."""
    from dtaianomaly_spark.operators import preprocessing as PP

    out = PP.undersample_nb(lf, nb_samples)
    n = lf.select(
        "doc_id", F.least(F.col("n"), F.lit(nb_samples)).cast("int").alias("n")
    ).distinct()
    return out.join(n, "doc_id")


def _pp_paa(lf: DataFrame, n_frames: int = 64) -> DataFrame:
    """Frame means for X; y-frame mean thresholded at 0.5
    (PiecewiseAggregateApproximation.py:60-70)."""
    from dtaianomaly_spark.operators import preprocessing as PP

    x = PP.paa(lf, n_frames).select(
        "doc_id", F.col("frame").alias("pos"),
        F.expr("CAST(round(out * 1000) AS BIGINT)").alias("value"),
    )
    y = (
        PP.paa(lf.drop("value").withColumnRenamed("truth", "value"), n_frames)
        .select(
            "doc_id", F.col("frame").alias("pos"),
            F.expr("CASE WHEN out < 0.5 THEN 0 ELSE 1 END").alias("truth"),
        )
    )
    n = lf.groupBy("doc_id").agg(
        F.least(F.max("n"), F.lit(n_frames)).cast("int").alias("n")
    )
    return x.join(y, ["doc_id", "pos"]).join(n, "doc_id")


PREPROCESSORS: Dict[str, Callable] = {
    "Identity": _pp_identity,
    "StandardScaler": _pp_standard,
    "MinMaxScaler": _pp_minmax,
    "RobustScaler": _pp_robust,
    "MovingAverage": _pp_moving_average,
    "ExponentialMovingAverage": _pp_ema,
    "Differencing": _pp_differencing,
    "SamplingRateUnderSampler": _pp_undersample_rate,
    "NbSamplesUnderSampler": _pp_undersample_nb,
    "PiecewiseAggregateApproximation": _pp_paa,
}


def build_preprocessor(entry) -> Tuple[str, Callable]:
    """A config entry (type tag or dict, possibly ChainedPreprocessor
    with a ``base_preprocessors`` list) -> (display name, callable).
    (workflow_from_config.py:358-421)"""
    if isinstance(entry, str):
        entry = {"type": entry}
    t = entry["type"]
    if t == "ChainedPreprocessor":
        parts = [build_preprocessor(e) for e in entry["base_preprocessors"]]

        def chained(lf):
            for _, fn in parts:
                lf = fn(lf)
            return lf

        return "ChainedPreprocessor(" + ",".join(n for n, _ in parts) + ")", chained
    if t not in PREPROCESSORS:
        raise ValueError(f"unknown preprocessor type {t!r}")
    kwargs = {k: v for k, v in entry.items() if k != "type"}
    name = t if not kwargs else t + "(" + ",".join(
        f"{k}={v}" for k, v in sorted(kwargs.items())
    ) + ")"
    return name, (lambda lf: PREPROCESSORS[t](lf, **kwargs))


# ------------------------------------------------------------------ plumbing

def _long_to_arrays(long_form: DataFrame) -> DataFrame:
    """Canonical arrays rebuild (shared helper in sources/corpus.py).
    Cells with Identity preprocessing skip this (they reuse the source
    arrays, no extra shuffle)."""
    return C.long_to_arrays(long_form)


def build_detector(name: str, kwargs: dict) -> SparkDetector:
    if name not in DETECTOR_REGISTRY:
        raise ValueError(f"unknown detector type {name!r}")
    return DETECTOR_REGISTRY[name](**kwargs)


# -------------------------------------------------------------------- metrics

def _avg(df: DataFrame, col: str) -> float:
    return df.agg(F.avg(col).alias("v")).collect()[0]["v"]


def _labeled(scored_truth: DataFrame, threshold: Tuple[str, float]) -> DataFrame:
    from dtaianomaly_spark.operators import evaluation as EV

    kind, param = threshold
    if kind == "FixedCutoff":
        return scored_truth.select(
            "doc_id", "pos", "truth",
            (F.col("score") >= param).cast("int").alias("label"),
        )
    if kind == "ContaminationRate":
        return EV.contamination_rate(scored_truth, rate=param)
    if kind == "TopN":
        return EV.top_n(scored_truth, int(param))
    raise ValueError(f"unknown threshold type {kind!r}")


def _base_metric_sql(base: str, params: dict) -> str:
    from dtaianomaly_spark.operators import evaluation as EV

    if base == "Precision":
        return EV.PRECISION_SQL
    if base == "Recall":
        return EV.RECALL_SQL
    if base == "FBeta":
        return EV.fbeta_sql(float(params.get("beta", 1.0)))
    raise ValueError(
        f"BestThresholdMetric: unsupported inner metric type {base!r}"
        " (supported: Precision, Recall, FBeta and their PointAdjusted"
        " variants)"
    )


def _best_threshold_value(scored_truth, metric) -> float:
    """BestThresholdMetric cell: dispatch the WRAPPED BinaryMetric — the
    reference accepts any BinaryMetric (BestThresholdMetric.py:44-57).
    Plain confusion metrics run the single-sorted-pass enumerator;
    PointAdjusted inners run the run-max enumerator
    (evaluation.best_threshold_point_adjusted); both support the
    reference's max_nb_thresholds linspace subsampling."""
    from dtaianomaly_spark.operators import evaluation as EV

    inner = metric.get("metric", {"type": "FBeta"})
    if isinstance(inner, str):
        inner = {"type": inner}
    it = inner["type"]
    mx = int(metric.get("max_nb_thresholds", -1))
    if it.startswith("PointAdjusted"):
        sql = _base_metric_sql(it.removeprefix("PointAdjusted"), inner)
        return _avg(
            EV.best_threshold_point_adjusted(
                scored_truth, sql, max_nb_thresholds=mx
            ),
            "best_metric",
        )
    return _avg(
        EV.best_threshold_metric(
            scored_truth, _base_metric_sql(it, inner), max_nb_thresholds=mx
        ),
        "best_metric",
    )


def metric_value(
    scored_truth: DataFrame, metric, threshold: Optional[Tuple[str, float]]
) -> float:
    """One metric cell. ``metric`` is a type tag or a dict with params
    (workflow_from_config.py:195-264)."""
    from dtaianomaly_spark.operators import evaluation as EV

    if isinstance(metric, str):
        metric = {"type": metric}
    t = metric["type"]
    if t == "AreaUnderROC":
        return _avg(EV.auc_roc(scored_truth), "auc")
    if t == "AreaUnderPR":
        return _avg(EV.auc_pr(scored_truth), "auc_pr")
    if t == "BestThresholdMetric":
        return _best_threshold_value(scored_truth, metric)

    point_adjusted = t.startswith("PointAdjusted")
    base = t.removeprefix("PointAdjusted")
    labeled = _labeled(scored_truth, threshold or ("TopN", 20))
    if point_adjusted:
        labeled = EV.point_adjust(labeled)
    if base == "Precision":
        return _avg(EV.confusion_metrics(labeled), "precision")
    if base == "Recall":
        return _avg(EV.confusion_metrics(labeled), "recall")
    if base == "FBeta":
        return _avg(EV.fbeta_metrics(labeled, float(metric.get("beta", 1.0))), "fbeta")
    raise ValueError(f"unknown metric type {t!r}")


def metric_name(metric, threshold) -> str:
    if isinstance(metric, str):
        metric = {"type": metric}
    t = metric["type"]
    params = ",".join(f"{k}={v}" for k, v in sorted(metric.items()) if k != "type")
    base = t if not params else f"{t}({params})"
    if t in ("AreaUnderROC", "AreaUnderPR", "BestThresholdMetric") or threshold is None:
        return base
    return f"{base}[{threshold[0]}={threshold[1]}]"


PROBA_METRICS = ("AreaUnderROC", "AreaUnderPR", "BestThresholdMetric")


class Workflow:
    """Grid runner over the shared token corpus (Workflow.py:169-379)."""

    def __init__(
        self,
        sources: List[str],
        preprocessors: List,
        detectors: List[Tuple[str, dict]],
        metrics: List,
        thresholds: List[Tuple[str, float]],
        n_jobs: int = 1,
        error_log_path: Optional[str] = None,
        trace_memory: bool = False,
    ):
        self.sources = sources
        self.preprocessors = preprocessors
        self.detectors = detectors
        self.metrics = metrics
        self.thresholds = thresholds
        self.n_jobs = n_jobs
        self.error_log_path = error_log_path
        self.trace_memory = trace_memory
        if trace_memory and n_jobs > 1:
            # tracemalloc is process-global; concurrent driver threads
            # would stop each other's tracer mid-measurement (the
            # reference sidesteps this with one PROCESS per job —
            # multiprocessing.Pool — which a shared SparkSession can't)
            raise ValueError(
                "trace_memory=True requires n_jobs=1: tracemalloc is"
                " process-global and grid cells would corrupt each"
                " other's measurements"
            )

    # ---------------------------------------------------------------- cell
    def _run_cell(
        self, spark, name, source, arrays, base_long, pp_entry, det_entry
    ):
        det_name, det_kwargs = det_entry
        # component construction happens INSIDE the quarantine: a bad
        # entry must fill the Error cell, not abort the grid
        row = {
            "Dataset": name,
            "Preprocessor": str(pp_entry),
            "Detector": det_name,
        }
        t_total = time.perf_counter()
        try:
            pp_name, pp_fn = build_preprocessor(pp_entry)
            row["Preprocessor"] = pp_name
            detector = build_detector(det_name, det_kwargs)
            row["Detector"] = initialization_call_string(detector)
            pp_long = pp_fn(base_long)
            pp_arrays = (
                arrays if pp_name == "Identity" else _long_to_arrays(pp_long)
            )

            # Memory tracing mirrors the reference (Workflow.py:341-365,
            # 392-399): tracemalloc peak of the DRIVER Python process
            # around fit and the predict action. In this engine the fit
            # work (bounded sample + NumPy solver) genuinely runs on the
            # driver, so the fit column measures the real fit
            # allocations; the predict column covers the driver side of
            # the scoring action (executor memory shows up in the
            # per-partition lineage metrics / Spark UI instead).
            import tracemalloc

            if self.trace_memory:
                tracemalloc.start()
            t0 = time.perf_counter()
            detector.fit(pp_arrays)
            row["Runtime Fit [s]"] = round(time.perf_counter() - t0, 3)
            if self.trace_memory:
                _, peak = tracemalloc.get_traced_memory()
                row["Peak Memory Fit [MB]"] = peak / 10**6
                tracemalloc.stop()

            if self.trace_memory:
                tracemalloc.start()
            t0 = time.perf_counter()
            scored_truth = detector.decision_function(pp_arrays).join(
                pp_long.select(
                    F.col("doc_id").cast("string").alias("doc_id"), "pos", "truth"
                ),
                ["doc_id", "pos"],
            ).persist()
            scored_truth.count()  # force: predict time = the scoring pass
            row["Runtime Predict [s]"] = round(time.perf_counter() - t0, 3)
            if self.trace_memory:
                _, peak = tracemalloc.get_traced_memory()
                row["Peak Memory Predict [MB]"] = peak / 10**6
                tracemalloc.stop()
                row["Peak Memory [MB]"] = max(
                    row["Peak Memory Fit [MB]"], row["Peak Memory Predict [MB]"]
                )

            try:
                for m in self.metrics:
                    t = m["type"] if isinstance(m, dict) else m
                    if t in PROBA_METRICS:
                        row[metric_name(m, None)] = metric_value(
                            scored_truth, m, None
                        )
                    else:
                        for th in self.thresholds:
                            row[metric_name(m, th)] = metric_value(
                                scored_truth, m, th
                            )
            finally:
                scored_truth.unpersist()
            row["Error"] = ""
        except Exception as exc:  # quarantine, keep the grid alive
            if self.trace_memory:
                # the success path stops the tracer after each phase; a
                # failing fit/predict must not leave the process-global
                # tracer running (a still-armed tracer makes the NEXT
                # cell's start() a no-op and inflates its peaks with
                # this cell's)
                import tracemalloc

                if tracemalloc.is_tracing():
                    tracemalloc.stop()
                # a cell failing between phases leaves a PARTIAL memory
                # column set (e.g. Fit recorded, Predict missing) — fill
                # the gaps with NaN so every trace_memory row has the
                # same shape in the result frame
                for col in (
                    "Peak Memory Fit [MB]",
                    "Peak Memory Predict [MB]",
                    "Peak Memory [MB]",
                ):
                    row.setdefault(col, float("nan"))
            row["Error"] = f"{type(exc).__name__}: {exc}"
            row["Traceback"] = traceback.format_exc(limit=3)
            if self.error_log_path:
                # reference log_error: a runnable .err repro script
                from dtaianomaly_spark.workflow.error_logging import log_error

                try:
                    row["Error File"] = log_error(
                        self.error_log_path, exc, source,
                        det_name, det_kwargs, pp_entry,
                    )
                except OSError:
                    pass
        row["Runtime [s]"] = round(time.perf_counter() - t_total, 3)
        return row

    def _source_frames(self, spark, entry):
        """A dataloader entry -> (display name, arrays, long form with
        truth). A plain string is a testdata sf directory (token corpus,
        synthetic spike truth). A type-tagged dict mirrors the
        reference's interpret_dataloaders (workflow_from_config.py:
        134-176): ``UCRLoader`` (and ``directory`` of UCRLoaders) loads
        the anomaly archive — real labels become the truth column, and
        cells fit on the test series itself, the reference's
        fit-*-on-test-data defaults."""
        if isinstance(entry, str):
            arrays = C.token_arrays(spark, entry)
            base_long = C.token_long_form(spark, entry).withColumn(
                "truth", F.expr(f"CASE WHEN {TRUTH_SPIKE} THEN 1 ELSE 0 END")
            )
            return str(entry), arrays, base_long
        t = entry.get("type")
        if t == "UCRLoader" or (
            t == "directory" and entry.get("base_type") == "UCRLoader"
        ):
            if "path" not in entry:
                raise TypeError(f"Entry should have a path keyword: {entry}")
            from dtaianomaly_spark.sources import ucr as U

            ds = U.ucr_dataset(spark, entry["path"])
            arrays = ds.X_test
            base_long = (
                arrays.select(
                    "doc_id",
                    F.posexplode("tokens").alias("pos", "value"),
                    F.col("n_tok").alias("n"),
                )
                .select(
                    "doc_id", F.col("pos").cast("long").alias("pos"),
                    F.col("value").cast("long").alias("value"), "n",
                )
                .join(
                    ds.y_test.select("doc_id", "pos", "truth"),
                    ["doc_id", "pos"],
                )
            )
            return f"{t}(path='{entry['path']}')", arrays, base_long
        raise ValueError(f"Invalid data entry: {entry}")

    @staticmethod
    def _expand_sources(sources):
        """``directory`` entries expand to ONE UCRLoader per archive
        file — the reference's ``from_directory`` returns a list of
        loaders, one grid row per dataset (workflow_from_config.py:
        160-176); plain strings / UCRLoader entries pass through."""
        out = []
        for entry in sources:
            if isinstance(entry, dict) and entry.get("type") == "directory":
                import glob as _glob

                files = sorted(_glob.glob(os.path.join(entry["path"], "*.txt")))
                if not files:
                    raise ValueError(
                        f"directory dataloader matched no archive files: {entry}"
                    )
                out.extend(
                    {"type": "UCRLoader", "path": f} for f in files
                )
            else:
                out.append(entry)
        return out

    def run(self, spark: SparkSession) -> pd.DataFrame:
        cells = []
        for source in self._expand_sources(self.sources):
            name, arrays, base_long = self._source_frames(spark, source)
            for pp_entry in self.preprocessors:
                for det_entry in self.detectors:
                    cells.append(
                        (name, source, arrays, base_long, pp_entry, det_entry)
                    )

        if self.n_jobs <= 1:
            rows = [self._run_cell(spark, *cell) for cell in cells]
        else:
            # the reference's n_jobs (Workflow.py:229-249): concurrent
            # driver threads, each in its own fair-scheduler pool so
            # Spark interleaves their stages
            from concurrent.futures import ThreadPoolExecutor

            sc = spark.sparkContext

            def run_one(icell):
                i, cell = icell
                sc.setLocalProperty("spark.scheduler.pool", f"grid-{i % self.n_jobs}")
                try:
                    return self._run_cell(spark, *cell)
                finally:
                    sc.setLocalProperty("spark.scheduler.pool", None)

            with ThreadPoolExecutor(max_workers=self.n_jobs) as pool:
                rows = list(pool.map(run_one, enumerate(cells)))

        df = pd.DataFrame(rows)
        ordered = [
            "Dataset", "Detector", "Preprocessor",
            "Runtime Fit [s]", "Runtime Predict [s]", "Runtime [s]",
        ]  # Workflow.py:255-266 column order
        if self.trace_memory:
            ordered += [
                "Peak Memory Fit [MB]", "Peak Memory Predict [MB]",
                "Peak Memory [MB]",
            ]
        cols = [c for c in ordered if c in df.columns] + [
            c for c in df.columns if c not in ordered
        ]
        return df[cols]


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
    the offending tag; entries validate eagerly so a bad config fails
    before any Spark job runs."""
    detectors = []
    for entry in config.get("detectors", []):
        t = entry["type"] if isinstance(entry, dict) else entry
        kwargs = (
            {k: v for k, v in entry.items() if k != "type"}
            if isinstance(entry, dict)
            else {}
        )
        build_detector(t, kwargs)  # eager validation
        detectors.append((t, kwargs))

    preprocessors = list(config.get("preprocessors", [])) or ["Identity"]
    for entry in preprocessors:
        build_preprocessor(entry)  # eager validation

    metrics = list(config.get("metrics", ["AreaUnderROC"]))
    for m in metrics:
        t = m["type"] if isinstance(m, dict) else m
        base = t.removeprefix("PointAdjusted")
        if t not in PROBA_METRICS and base not in ("Precision", "Recall", "FBeta"):
            raise ValueError(f"unknown metric type {t!r}")
        if t == "BestThresholdMetric" and isinstance(m, dict):
            # eager inner-metric validation: fail before any Spark job
            inner = m.get("metric", {"type": "FBeta"})
            if isinstance(inner, str):
                inner = {"type": inner}
            _base_metric_sql(
                inner["type"].removeprefix("PointAdjusted"), inner
            )

    for entry in config.get("dataloaders", []):
        # eager dataloader validation (interpret_dataloaders semantics,
        # workflow_from_config.py:134-176)
        if isinstance(entry, dict):
            t = entry.get("type")
            if t == "directory":
                if entry.get("base_type") != "UCRLoader":
                    raise ValueError(f"Invalid base type: {entry}")
                if "path" not in entry:
                    raise TypeError(f"Entry should have a path keyword: {entry}")
            elif t == "UCRLoader":
                if "path" not in entry:
                    raise TypeError(f"Entry should have a path keyword: {entry}")
            else:
                raise ValueError(f"Invalid data entry: {entry}")

    threshold_defaults = {"FixedCutoff": 0.5, "ContaminationRate": 0.05, "TopN": 20}
    thresholds = []
    for entry in config.get("thresholds", [{"type": "TopN", "param": 20}]):
        t = entry["type"] if isinstance(entry, dict) else entry
        if t not in threshold_defaults:
            raise ValueError(f"unknown threshold type {t!r}")
        # per-kind default: a bare 'TopN' must not inherit the
        # contamination rate (int(0.05) would silently mean top-0)
        default = threshold_defaults[t]
        param = entry.get("param", default) if isinstance(entry, dict) else default
        thresholds.append((t, param))

    return Workflow(
        sources=config.get("dataloaders", ["/root/testdata/sf0.001"]),
        preprocessors=preprocessors,
        detectors=detectors or [("MedianMethod", {})],
        metrics=metrics,
        thresholds=thresholds,
        n_jobs=int(config.get("n_jobs", 1)),
        error_log_path=config.get("error_log_path"),
        trace_memory=bool(config.get("trace_memory", False)),
    )
