"""Headless demonstrator engine — everything the reference's Streamlit
demonstrator computes, minus the widgets.

The reference ships a 2,975-line interactive app
(``demonstrator/demonstrator.py``) whose actual MECHANICS are plain
engine logic wrapped in ``st.*`` calls: component discovery by
introspection (demonstrator.py:117-143), hyperparameter form generation
from constructor signatures with a special window-size selector
(:289-430), default-hyperparameter extraction (:432-452), uploaded-CSV
validation (:454-482), custom-component registration (:108-143,
:177-209), the per-tab run loop — preprocess, fit, score, threshold,
evaluate, with fit/predict timings (:859+) — and the five-sheet Excel
export (:1863-1932). This module implements ALL of that against the
Spark engine's components, so a UI (Streamlit or anything else) is a
thin render layer over these functions; only the render layer remains
out of scope (Streamlit is absent from this environment, exactly like
matplotlib is for the visualization suite — same import-gate pattern).

Nothing here shuffles or collects beyond the existing bounded bridges:
runs reuse the workflow grid's cell machinery, plots reuse
``visualization.series_plot_frame`` (bounded single-series collect)."""

from __future__ import annotations

import inspect
import time
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import pandas as pd

from dtaianomaly_spark.workflow.components import (
    DETECTOR_REGISTRY, initialization_call_string,
)
from dtaianomaly_spark.workflow import grid as G

# the engine-side analog of st.session_state.custom_components
# (demonstrator.py:108-143): kind -> {name: object}
_CUSTOM: Dict[str, Dict[str, Any]] = {}

_KINDS = ("detectors", "preprocessors", "metrics", "thresholds", "data_loaders")

# metric / threshold type tags the grid's metric_value dispatch accepts
# (grid.py metric_value/_labeled — the demonstrator's selectbox options)
METRIC_TAGS = (
    "Precision", "Recall", "FBeta",
    "PointAdjustedPrecision", "PointAdjustedRecall", "PointAdjustedFBeta",
    "AreaUnderROC", "AreaUnderPR", "BestThresholdMetric",
)
THRESHOLD_TAGS = ("FixedCutoff", "ContaminationRate", "TopN")
DATA_LOADER_TAGS = ("sf_directory", "UCRLoader", "directory")


def register_custom_component(kind: str, name: str, obj: Any) -> None:
    """Engine twin of the demonstrator's custom-component upload
    (demonstrator.py:131-143): registered objects appear in
    :func:`available_components` and resolve in :class:`DemoSession`
    and :func:`build_component`. ``kind`` is one of ``detectors`` /
    ``preprocessors`` / ``metrics`` / ``thresholds`` /
    ``data_loaders``."""
    if kind not in _KINDS:
        raise ValueError(f"unknown component kind {kind!r} (one of {_KINDS})")
    _CUSTOM.setdefault(kind, {})[name] = obj


def clear_custom_components() -> None:
    _CUSTOM.clear()


def available_components() -> Dict[str, List[str]]:
    """Component discovery (demonstrator.py:117-143
    ``get_available_options``): every selectable option per kind,
    standard registry first, then any custom registrations."""
    out = {
        "detectors": sorted(DETECTOR_REGISTRY),
        "preprocessors": sorted(G.PREPROCESSORS) + ["ChainedPreprocessor"],
        "metrics": list(METRIC_TAGS),
        "thresholds": list(THRESHOLD_TAGS),
        "data_loaders": list(DATA_LOADER_TAGS),
    }
    for kind, members in _CUSTOM.items():
        out[kind] = out[kind] + [n for n in sorted(members) if n not in out[kind]]
    return out


def _detector_class(name: str):
    if name in _CUSTOM.get("detectors", {}):
        return _CUSTOM["detectors"][name]
    if name in DETECTOR_REGISTRY:
        return DETECTOR_REGISTRY[name]
    raise ValueError(f"unknown detector {name!r}")


def _param_help(cls, param_name: str) -> str:
    """Best-effort parameter doc from the class / __init__ docstring
    (demonstrator.py:225-287 ``get_parameter_documentation``), falling
    back to the reference's generic text."""
    for doc in (inspect.getdoc(cls), inspect.getdoc(cls.__init__)):
        if not doc:
            continue
        for line in doc.splitlines():
            s = line.strip()
            if s.startswith(f"{param_name}:") or s.startswith(f"``{param_name}``"):
                return s
    return f"Parameter {param_name}"


_ANNOT_NAMES = {"int": int, "float": float, "bool": bool, "str": str}


def _resolve_annotation(annotation):
    """PEP-563 string annotations ('bool', 'int', ...) resolve to their
    types so the widget-kind rules below see real classes."""
    if isinstance(annotation, str):
        return _ANNOT_NAMES.get(annotation, annotation)
    return annotation


def _type_default(annotation):
    """The reference's fallback defaults for parameters without one
    (demonstrator.py:303-320): int/unannotated -> 10, float -> 1.0,
    bool -> False, str -> '' and None otherwise."""
    if annotation in (int, inspect.Parameter.empty):
        return 10
    if annotation is float:
        return 1.0
    if annotation is bool:
        return False
    if annotation is str:
        return ""
    return None


def _widget_kind(param_name: str, annotation, default) -> str:
    if param_name == "window_size":
        return "window_size"
    probe = default if default is not None else _type_default(annotation)
    if isinstance(probe, bool) or annotation is bool:
        return "bool"
    if isinstance(probe, int) or annotation is int:
        return "int"
    if isinstance(probe, float) or annotation is float:
        return "float"
    return "str"


def hyperparam_form(detector_name: str) -> List[Dict[str, Any]]:
    """The hyperparameter FORM the demonstrator renders per detector
    tab (demonstrator.py:289-430 ``generate_hyperparam_inputs``), as
    declarative widget specs instead of ``st.*`` calls. Each spec:
    ``{name, kind, default, required, help}``; ``window_size`` gets the
    reference's special selector — options ``('Auto (fft)', 'Manual')``
    defaulting to the string ``'fft'``, with ``manual_default`` = 20
    when the constructor gives none (:324-341)."""
    cls = _detector_class(detector_name)
    specs = []
    for pname, pobj in inspect.signature(cls.__init__).parameters.items():
        if pname in ("self", "args", "kwargs"):
            continue
        annotation = _resolve_annotation(pobj.annotation)
        required = pobj.default is inspect.Parameter.empty
        default = None if required else pobj.default
        if pname == "window_size":
            manual = 20 if not isinstance(default, int) else int(default)
            specs.append(
                {
                    "name": pname,
                    "kind": "window_size",
                    "options": ("Auto (fft)", "Manual"),
                    "default": "fft" if not isinstance(default, int) else default,
                    "manual_default": manual,
                    "required": required,
                    "help": _param_help(cls, pname),
                }
            )
            continue
        if required:
            default = _type_default(annotation)
        specs.append(
            {
                "name": pname,
                "kind": _widget_kind(pname, annotation, default),
                "default": default,
                "required": required,
                "help": _param_help(cls, pname),
            }
        )
    return specs


def default_hyperparams(detector_name: str) -> Dict[str, Any]:
    """Ready-to-construct defaults (demonstrator.py:432-452
    ``get_default_hyperparams``): every form spec's default value."""
    return {s["name"]: s["default"] for s in hyperparam_form(detector_name)}


def validate_uploaded_data(
    df: pd.DataFrame,
) -> Tuple[Optional[np.ndarray], Optional[np.ndarray], str]:
    """Uploaded-CSV validation, verbatim semantics of
    demonstrator.py:454-482 including its quirk that the returned ``x``
    keeps the Time Step as column 0 (shape ``(n, 2)``): requires
    numeric ``Time Step`` / ``Value`` / ``Label`` columns with a binary
    label, returns ``(x, y, '')`` or ``(None, None, message)``."""
    required = ["Time Step", "Value", "Label"]
    if not all(c in df.columns for c in required):
        return None, None, (
            "The dataset must contain the columns 'Time Step', 'Value',"
            " and 'Label'."
        )
    for c in required:
        if not pd.api.types.is_numeric_dtype(df[c]):
            return None, None, f"The '{c}' column must be numeric."
    if not set(df["Label"]).issubset({0, 1}):
        return None, None, (
            "The 'Label' column must contain binary values (0 or 1)."
        )
    x = df[["Time Step", "Value"]].to_numpy()
    y = df["Label"].to_numpy()
    return x, y, ""


class DemoSession:
    """The demonstrator's session state + run loop, headless: load a
    dataset once, manage detector tabs (add / configure / remove —
    demonstrator.py:629-648), run each tab through preprocess -> fit ->
    score -> threshold -> evaluate with fit/predict timings
    (:859+ ``run_detector``), and export the five result sheets
    (:1863-1932 ``export_to_excel``). Runs reuse the workflow grid's
    component builders and metric dispatch, so a demonstrator run and a
    grid cell are the same engine code path."""

    def __init__(self, spark, source):
        self.spark = spark
        wf = G.Workflow([], [], [], [], [])
        self.source_name, self.arrays, self.base_long = wf._source_frames(
            spark, source
        )
        self._tabs: Dict[int, Dict[str, Any]] = {}
        self._next_id = 0
        self.results: Dict[int, Dict[str, Any]] = {}

    # ------------------------------------------------------------- tabs
    def add_detector(
        self,
        detector_name: str,
        hyperparams: Optional[dict] = None,
        preprocessor: Any = "Identity",
    ) -> int:
        """New detector tab (demonstrator.py:629-638); hyperparams
        default to :func:`default_hyperparams`."""
        _detector_class(detector_name)  # validate eagerly, like the UI
        tab_id = self._next_id
        self._next_id += 1
        self._tabs[tab_id] = {
            "detector": detector_name,
            "hyperparams": (
                default_hyperparams(detector_name)
                if hyperparams is None else dict(hyperparams)
            ),
            "preprocessor": preprocessor,
        }
        return tab_id

    def remove_detector(self, tab_id: int) -> None:
        """demonstrator.py:640-648."""
        self._tabs.pop(tab_id, None)
        self.results.pop(tab_id, None)

    @property
    def tabs(self) -> Dict[int, Dict[str, Any]]:
        return dict(self._tabs)

    # -------------------------------------------------------------- run
    def run(
        self,
        tab_id: int,
        metrics=("AreaUnderROC",),
        thresholds=(("FixedCutoff", 0.5),),
    ) -> Dict[str, Any]:
        """One tab's run loop (demonstrator.py:859+): preprocess, fit
        (timed), score (timed action), then every requested metric —
        proba metrics once, binary metrics per threshold — exactly the
        grid's dispatch. The scored frame stays in the result for
        plotting/export; call :meth:`close` (or rerun) to release it."""
        tab = self._tabs[tab_id]
        name = tab["detector"]
        if name in _CUSTOM.get("detectors", {}):
            detector = _CUSTOM["detectors"][name](**tab["hyperparams"])
        else:
            detector = G.build_detector(name, tab["hyperparams"])
        pp_name, pp_fn = G.build_preprocessor(tab["preprocessor"])
        pp_long = pp_fn(self.base_long)
        pp_arrays = (
            self.arrays if pp_name == "Identity" else G._long_to_arrays(pp_long)
        )

        t0 = time.perf_counter()
        detector.fit(pp_arrays)
        fit_time = time.perf_counter() - t0

        from pyspark.sql import functions as F

        t0 = time.perf_counter()
        # unlike the grid cell, the demonstrator also needs the series
        # VALUES (plots + the Original Dataset export sheet) — carry them
        scored_truth = detector.decision_function(pp_arrays).join(
            pp_long.select(
                F.col("doc_id").cast("string").alias("doc_id"),
                "pos", "value", "truth",
            ),
            ["doc_id", "pos"],
        ).persist()
        scored_truth.count()
        predict_time = time.perf_counter() - t0

        metric_values: Dict[str, float] = {}
        for m in metrics:
            t = m["type"] if isinstance(m, dict) else m
            if t in G.PROBA_METRICS:
                metric_values[G.metric_name(m, None)] = G.metric_value(
                    scored_truth, m, None
                )
            else:
                for th in thresholds:
                    metric_values[G.metric_name(m, th)] = G.metric_value(
                        scored_truth, m, th
                    )

        old = self.results.get(tab_id)
        if old is not None:
            old["scored_truth"].unpersist()
        result = {
            "detector_label": initialization_call_string(detector),
            "preprocessor": pp_name,
            "fit_time": round(fit_time, 3),
            "predict_time": round(predict_time, 3),
            "metrics": metric_values,
            "thresholds": list(thresholds),
            "scored_truth": scored_truth,
        }
        self.results[tab_id] = result
        return result

    # ------------------------------------------------------------ plots
    def plot_frames(self, tab_id: int, doc_id, max_points: int = 1_000_000):
        """Arrays for every chart the demonstrator renders for one
        series (the bounded single-series bridge): raw series, scores,
        truth, plus the visualization data layer's colored segments and
        demarcated regions."""
        from dtaianomaly_spark.workflow import visualization as V

        frame = V.series_plot_frame(
            self.results[tab_id]["scored_truth"], doc_id, max_points
        )
        frame["regions"] = V.demarcated_regions_data(frame["truth"])
        return frame

    # ----------------------------------------------------------- export
    def export_sheets(self, doc_id) -> Dict[str, pd.DataFrame]:
        """The five-sheet export of demonstrator.py:1863-1932 for one
        selected series, as plain DataFrames (the xlsx writer is the UI
        layer's one-liner; the DATA is what the engine owns): Original
        Dataset / Anomaly Scores / Thresholded Predictions (one column
        per run tab, first configured threshold) / Evaluation Metrics
        (+ fit/predict seconds)."""
        if not self.results:
            raise ValueError("no run results to export — call run() first")
        from dtaianomaly_spark.workflow import visualization as V

        sheets: Dict[str, pd.DataFrame] = {}
        scores_df = None
        preds_df = None
        metric_rows = {}
        for tab_id, res in sorted(self.results.items()):
            frame = V.series_plot_frame(res["scored_truth"], doc_id)
            label = f"tab{tab_id}: {res['detector_label']}"
            if scores_df is None:
                ts = np.arange(len(frame["score"]))
                sheets["Original Dataset"] = pd.DataFrame(
                    {
                        "Time Step": ts,
                        "Value": frame["value"],
                        "Label": frame["truth"],
                    }
                )
                scores_df = pd.DataFrame({"Time Step": ts})
                preds_df = pd.DataFrame({"Time Step": ts})
            scores_df[label] = frame["score"]
            kind, param = res["thresholds"][0]
            lab = G._labeled(
                res["scored_truth"].where(
                    res["scored_truth"]["doc_id"] == str(doc_id)
                ),
                (kind, param),
            )
            lrows = {r["pos"]: r["label"] for r in lab.collect()}
            preds_df[label] = [lrows[p] for p in sorted(lrows)]
            metric_rows[label] = {
                **res["metrics"],
                "Fit Time (s)": res["fit_time"],
                "Predict Time (s)": res["predict_time"],
            }
        sheets["Anomaly Scores"] = scores_df
        sheets["Thresholded Predictions"] = preds_df
        sheets["Evaluation Metrics"] = pd.DataFrame(metric_rows).T
        return sheets

    def close(self) -> None:
        for res in self.results.values():
            res["scored_truth"].unpersist()
        self.results.clear()
