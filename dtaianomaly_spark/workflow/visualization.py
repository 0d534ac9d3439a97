"""Visualization suite — the reference's six plotting functions
(``/root/reference/dtaianomaly/visualization/visualization.py:10-462``)
split into a PURE DATA LAYER (every array the reference computes before
touching an axis: color bins, TP/FP/FN masks, anomaly spans, zoom
slices, confidence bands) and thin matplotlib rendering gated behind an
import-try (matplotlib is not available in this container; the data
layer is fully tested, the render layer draws exactly those arrays when
matplotlib exists).

Plotting is inherently driver-side and single-series; the Spark bridge
(:func:`series_plot_frame`) collects ONE bounded series from a scored
long-form frame — never a corpus-wide collect.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

try:  # rendering is optional — the data layer never needs it
    import matplotlib.pyplot as plt  # noqa: F401

    HAS_MATPLOTLIB = True
except ImportError:  # pragma: no cover - matplotlib absent in sandbox
    HAS_MATPLOTLIB = False

__all__ = [
    "format_time_steps",
    "colored_segments_data",
    "anomaly_markers_data",
    "demarcated_regions_data",
    "zoom_data",
    "confidence_band_data",
    "series_plot_frame",
    "plot_time_series_colored_by_score",
    "plot_time_series_anomalies",
    "plot_demarcated_anomalies",
    "plot_with_zoom",
    "plot_anomaly_scores",
]


def _dimension(X: np.ndarray) -> int:
    """utils.get_dimension semantics: 1 for univariate, n_attributes
    for (n, d) input."""
    X = np.asarray(X)
    return 1 if X.ndim == 1 else X.shape[1]


def _check_feature_names(X, feature_names: Optional[List[str]]) -> None:
    if feature_names is not None and len(feature_names) != _dimension(X):
        raise ValueError(
            f"The number of feature names ({len(feature_names)}) different"
            f" from the dimension of X ({_dimension(X)})!"
        )


def _check_binary(y: np.ndarray) -> None:
    if not np.all(np.isin(y, [0, 1])):
        raise ValueError("The predicted anomaly scores must be binary.")


def format_time_steps(time_steps, n_samples: int) -> np.ndarray:
    """``[0, ..., n_samples-1]`` when None, else passthrough
    (visualization.py:442-462)."""
    return np.arange(n_samples) if time_steps is None else time_steps


def colored_segments_data(
    X: np.ndarray, y: np.ndarray, time_steps=None, nb_colors: int = 100
):
    """The per-segment color bins of plot_time_series_colored_by_score
    (visualization.py:67-76): scores min-max scaled (zeros when
    constant), binned to ``floor(scaled * nb) / nb``; segment i connects
    (t_i, X_i) to (t_{i+1}, X_{i+1}) with the color of bin_i. Returns
    (time_steps, bins) where bins has length n_samples (the last bin is
    computed but the reference draws only n-1 segments)."""
    X = np.asarray(X)
    y = np.asarray(y, dtype=np.float64)
    time_steps = format_time_steps(time_steps, X.shape[0])
    y_min, y_max = y.min(), y.max()
    y_scaled = (
        (y - y_min) / (y_max - y_min) if y_max > y_min else np.zeros_like(y)
    )
    bins = np.floor(y_scaled * nb_colors) / nb_colors
    return time_steps, bins


def anomaly_markers_data(y: np.ndarray, y_pred: np.ndarray):
    """The TP/FP/FN masks of plot_time_series_anomalies
    (visualization.py:129-138); both inputs must be binary."""
    y = np.asarray(y)
    y_pred = np.asarray(y_pred)
    _check_binary(y)
    _check_binary(y_pred)
    tp = (y == 1) & (y_pred == 1)
    fp = (y == 0) & (y_pred == 1)
    fn = (y == 1) & (y_pred == 0)
    return tp, fp, fn


def demarcated_regions_data(y: np.ndarray, time_steps=None):
    """The anomalous spans of plot_demarcated_anomalies
    (visualization.py:217-235): diff with prepend/append 0 — starts
    where diff==1, ends where diff==-1 (an anomaly running to the
    series end yields end == n, which the reference CLAMPS to the last
    time step when drawing; the clamped span times are returned too).
    Returns (starts, ends, span_times) with span_times a list of
    (t_start, t_end_clamped)."""
    y = np.asarray(y)
    _check_binary(y)
    diff = np.diff(y, prepend=0, append=0)
    starts = np.where(diff == 1)[0]
    ends = np.where(diff == -1)[0]
    ts = format_time_steps(time_steps, y.shape[0])
    span_times = [
        (ts[s], ts[min(e, ts.shape[0] - 1)]) for s, e in zip(starts, ends)
    ]
    return starts, ends, span_times


def zoom_data(
    X: np.ndarray,
    start_zoom: int,
    end_zoom: int,
    y=None,
    y_pred=None,
    time_steps=None,
):
    """The full/zoom kwarg split of plot_with_zoom
    (visualization.py:311-326): the zoom axis receives the
    [start_zoom:end_zoom) slices of every provided array."""
    X = np.asarray(X)
    kwargs_full = {"X": X}
    kwargs_zoom = {"X": X[start_zoom:end_zoom]}
    if y is not None:
        kwargs_full["y"] = np.asarray(y)
        kwargs_zoom["y"] = np.asarray(y)[start_zoom:end_zoom]
    if y_pred is not None:
        kwargs_full["y_pred"] = np.asarray(y_pred)
        kwargs_zoom["y_pred"] = np.asarray(y_pred)[start_zoom:end_zoom]
    if time_steps is not None:
        kwargs_full["time_steps"] = np.asarray(time_steps)
        kwargs_zoom["time_steps"] = np.asarray(time_steps)[
            start_zoom:end_zoom
        ]
    return kwargs_full, kwargs_zoom


def confidence_band_data(y_pred: np.ndarray, confidence: np.ndarray):
    """The confidence band of plot_anomaly_scores
    (visualization.py:427-435): ``y_pred ∓ (1 - confidence)``."""
    y_pred = np.asarray(y_pred, dtype=np.float64)
    confidence = np.asarray(confidence, dtype=np.float64)
    return y_pred - (1 - confidence), y_pred + (1 - confidence)


def series_plot_frame(scored_truth, doc_id, max_points: int = 1_000_000):
    """Spark bridge: one series' (pos-ordered) values/scores/truth from
    a scored long-form DataFrame, as NumPy arrays ready for any plot
    function. Bounded single-series collect — plotting is driver-side
    by nature; ``max_points`` fails fast on a series that no plot could
    render anyway."""
    rows = (
        scored_truth.where(scored_truth["doc_id"] == doc_id)
        .orderBy("pos")
        .limit(max_points + 1)
        .collect()
    )
    if len(rows) > max_points:
        raise ValueError(
            f"series {doc_id!r} exceeds max_points={max_points};"
            " downsample (e.g. PAA / SamplingRateUnderSampler) before"
            " plotting"
        )
    if not rows:
        raise KeyError(
            f"no rows for doc_id={doc_id!r} in the scored frame —"
            " check the series id"
        )
    cols = rows[0].asDict().keys() if rows else []
    out = {}
    for c in cols:
        if c == "doc_id":
            continue
        out[c] = np.asarray([r[c] for r in rows])
    return out


def _require_matplotlib():
    if not HAS_MATPLOTLIB:
        raise ImportError(
            "matplotlib is required for rendering (not available in this"
            " environment); the *_data functions provide every computed"
            " array without it"
        )


def plot_time_series_colored_by_score(
    X, y, time_steps=None, feature_names=None, ax=None, nb_colors=100,
    **kwargs,
):
    """Render of visualization.py:10-78 from colored_segments_data."""
    _require_matplotlib()
    _check_feature_names(X, feature_names)
    if ax is None:
        plt.figure(**kwargs)
        ax = plt.gca()
    X = np.asarray(X)
    ts, bins = colored_segments_data(X, y, time_steps, nb_colors)
    colormap = plt.get_cmap("RdYlGn", nb_colors).reversed()
    for i in range(0, X.shape[0] - 1):
        ax.plot([ts[i], ts[i + 1]], X[[i, i + 1]], c=colormap(bins[i]))
    return plt.gcf()


def plot_time_series_anomalies(
    X, y, y_pred, time_steps=None, feature_names=None, ax=None, **kwargs
):
    """Render of visualization.py:81-160 from anomaly_markers_data."""
    _require_matplotlib()
    _check_feature_names(X, feature_names)
    if ax is None:
        plt.figure(**kwargs)
        ax = plt.gca()
    X = np.asarray(X)
    tp, fp, fn = anomaly_markers_data(y, y_pred)
    ts = format_time_steps(time_steps, X.shape[0])
    ax.plot(ts, X)
    if feature_names is not None:
        if len(feature_names) == 1:
            ax.set_ylabel(feature_names[0])
        else:
            ax.add_artist(ax.legend(feature_names))
    X_reshaped = X.reshape((-1, _dimension(X)))
    tps = fps = fns = None
    for i in range(_dimension(X)):
        tps = ax.scatter(ts[tp], X_reshaped[tp, i], color="green")
        fps = ax.scatter(ts[fp], X_reshaped[fp, i], color="red")
        fns = ax.scatter(ts[fn], X_reshaped[fn, i], color="orange")
    ax.legend([tps, fps, fns], ["TP", "FP", "FN"])
    return plt.gcf()


def plot_demarcated_anomalies(
    X, y, ax=None, time_steps=None, feature_names=None,
    color_anomaly="red", alpha_anomaly=0.2, **kwargs,
):
    """Render of visualization.py:163-247 from demarcated_regions_data."""
    _require_matplotlib()
    _check_feature_names(X, feature_names)
    if ax is None:
        plt.figure(**kwargs)
        ax = plt.gca()
    X = np.asarray(X)
    _, _, span_times = demarcated_regions_data(y, time_steps)
    ts = format_time_steps(time_steps, X.shape[0])
    ax.plot(ts, X, label=feature_names)
    for t_start, t_end in span_times:
        ax.axvspan(t_start, t_end, color=color_anomaly, alpha=alpha_anomaly)
    if feature_names is not None:
        if len(feature_names) == 1:
            ax.set_ylabel(feature_names[0])
        else:
            ax.legend(
                loc="lower center", bbox_to_anchor=(0.5, 1),
                ncols=len(feature_names),
            )
    return plt.gcf()


def plot_with_zoom(
    X, start_zoom, end_zoom, y=None, y_pred=None, time_steps=None,
    feature_names=None, method_to_plot=plot_demarcated_anomalies,
    color="blue", linewidth=3, linestyle="--", **kwargs,
):
    """Render of visualization.py:250-364 from zoom_data."""
    _require_matplotlib()
    from matplotlib.patches import ConnectionPatch

    fig, (ax_main, ax_zoom) = plt.subplots(2, 1, **kwargs)
    kwargs_full, kwargs_zoom = zoom_data(
        X, start_zoom, end_zoom, y, y_pred, time_steps
    )
    if feature_names is not None:
        kwargs_full["feature_names"] = feature_names
    method_to_plot(ax=ax_main, **kwargs_full)
    method_to_plot(ax=ax_zoom, **kwargs_zoom)
    ts = format_time_steps(time_steps, np.asarray(X).shape[0])
    for ax in [ax_main, ax_zoom]:
        for x in [start_zoom, end_zoom]:
            ax.axvline(
                x=ts[x], color=color, linestyle=linestyle,
                linewidth=linewidth,
            )
    for x in [start_zoom, end_zoom]:
        fig.add_artist(
            ConnectionPatch(
                xyA=(ts[x], ax_main.get_ylim()[0]),
                coordsA=ax_main.transData,
                xyB=(ts[x], ax_zoom.get_ylim()[1]),
                coordsB=ax_zoom.transData,
                color=color, linestyle=linestyle, linewidth=linewidth,
            )
        )
    return fig


def plot_anomaly_scores(
    X, y, y_pred, time_steps=None, feature_names=None,
    method_to_plot=plot_demarcated_anomalies, confidence=None, **kwargs,
):
    """Render of visualization.py:367-439 from confidence_band_data."""
    _require_matplotlib()
    fig, (ax_data, ax_pred) = plt.subplots(
        nrows=2, ncols=1, sharex=True, **kwargs
    )
    ts = format_time_steps(time_steps, np.asarray(X).shape[0])
    ax_data.set_title("Time series data")
    method_to_plot(
        X=X, y=y, ax=ax_data, time_steps=ts, feature_names=feature_names
    )
    ax_pred.set_title("Predicted anomaly scores")
    ax_pred.plot(ts, y_pred, label="Anomaly scores")
    if confidence is not None:
        lo, hi = confidence_band_data(y_pred, confidence)
        ax_pred.fill_between(
            ts, lo, hi, color="gray", alpha=0.5, label="Confidence range"
        )
        ax_pred.legend()
    return fig
