"""Standalone detector components: the reference's ``BaseDetector``
contract (fit / decision_function / predict_proba / save / load_detector,
BaseDetector.py:54-331) over Spark DataFrames, plus the canonical
``Klass(param=value)`` strings of ``PrettyPrintable``
(PrettyPrintable.py:5-34).

Execution shape is the repo's fit→broadcast→score pattern
(operators/detectors.py): ``fit`` is a bounded driver-side action whose
result is a SMALL plain-NumPy model (centroids, node tables, ECDFs —
kilobytes), stored on the instance; ``decision_function`` broadcasts
that state in a task closure and scores every series in one shuffle-free
Arrow pass. Because the fitted state is plain NumPy, ``save`` is the
reference's pickle-with-``.dtai``-extension verbatim, and a loaded
detector scores WITHOUT refitting — the reproducibility contract
(BaseDetector.py:289-331).

At 100 TB: instances never hold DataFrames or SparkSessions (pickle
boundary == driver/executor boundary == disk boundary), so the same
object works in a task closure, a checkpoint file, and a fresh session.
"""

from __future__ import annotations

import enum
import inspect
import os
import pickle
from pathlib import Path
from typing import Optional, Union

import numpy as np
from pyspark.sql import DataFrame

from dtaianomaly_spark.kernels import detectors as KD
from dtaianomaly_spark.kernels import windowing as KW
from dtaianomaly_spark.operators import detectors as DET


class NotFittedError(RuntimeError):
    """decision_function before fit (reference CheckIsFittedError)."""


def _check_window(window_size) -> None:
    """Constructor-time window validation: a strictly positive int or an
    auto-selection mode name ('fft'/'acf'/'mwf'/'suss')
    (windowing_utils.check_is_valid_window_size semantics)."""
    if isinstance(window_size, str):
        KW.check_is_valid_window_size(window_size)
        return
    if isinstance(window_size, bool) or not isinstance(window_size, int):
        raise TypeError(f"`window_size` should be an integer, got {window_size!r}")
    if window_size < 1:
        raise ValueError(f"`window_size` must be strictly positive, got {window_size}")


def initialization_call_string(o: object) -> str:
    """Canonical ``Klass(param=value)`` string: non-default __init__
    params only, strings quoted. (PrettyPrintable.py:10-34)"""
    parameters = {
        p: getattr(o, p)
        for p, v in inspect.signature(o.__init__).parameters.items()
        if p not in ("args", "kwargs") and v.default != getattr(o, p)
    }
    if hasattr(o, "kwargs"):
        parameters.update(o.kwargs)

    def lit(v):
        return f"'{v}'" if isinstance(v, str) else v

    return (
        o.__class__.__name__
        + "("
        + ",".join(f"{p}={lit(v)}" for p, v in parameters.items())
        + ")"
    )


class PrettyPrintable:
    def __str__(self) -> str:
        return initialization_call_string(self)

    __repr__ = __str__


class Supervision(enum.Enum):
    """Supervision taxonomy (BaseDetector.py:17-33): the reference's
    Workflow routes fit data by this — UNSUPERVISED detectors fit on the
    test series itself when no train split exists (Workflow.py:426-433),
    which is exactly what the grid here does."""

    UNSUPERVISED = 1
    SEMI_SUPERVISED = 2
    SUPERVISED = 3


class SparkDetector(PrettyPrintable):
    """fit/decision_function/predict_proba/save over the canonical
    ``(doc_id, tokens, n_tok)`` arrays DataFrame."""

    supervision: Supervision = Supervision.UNSUPERVISED

    def fit(self, arrays: DataFrame, y=None) -> "SparkDetector":
        return self

    def decision_function(self, arrays: DataFrame) -> DataFrame:
        raise NotImplementedError

    def predict_proba(self, arrays: DataFrame) -> DataFrame:
        """Min-max rescale of decision scores (BaseDetector.py:140-186)."""
        return DET.predict_proba(self.decision_function(arrays))

    def predict_confidence(
        self, arrays: DataFrame, contamination: float = 0.05
    ) -> DataFrame:
        """ExCeeD confidence of the decision scores
        (BaseDetector.py:188-287; train ECDF = the series' own scores,
        the reference's X_train=None default)."""
        return _exceed_from_scored(
            self.decision_function(arrays), contamination
        )

    def save(self, path: Union[str, Path]) -> None:
        """Pickle to ``path`` with the reference's ``.dtai`` extension,
        creating parent directories (BaseDetector.py:289-311)."""
        if Path(path).suffix != ".dtai":
            path = f"{path}.dtai"
        parent = Path(path).parent
        if not os.path.exists(parent):
            os.makedirs(parent)
        with open(path, "wb") as f:
            pickle.dump(self, f)


def load_detector(path: Union[str, Path]) -> SparkDetector:
    """Unpickle a saved detector — trusted files only
    (BaseDetector.py:314-331)."""
    with open(path, "rb") as f:
        return pickle.load(f)


# ------------------------------------------------------- window-model family

class _WindowModelDetector(SparkDetector):
    """Shared skeleton: fit a small model on the bounded deterministic
    window sample; score = per-series windows → model score → reverse
    window map, one Arrow pass (PyODAnomalyDetector.py:101-113)."""

    _max_fit_windows: Optional[int] = None

    def __init__(self, window_size: int = 32, stride: int = 16):
        _check_window(window_size)
        if not isinstance(stride, int) or stride < 1:
            raise ValueError(f"invalid stride {stride!r}")
        self.window_size = window_size
        self.stride = stride

    # subclass hooks — module-level kernel functions only, so instances
    # stay picklable by reference
    def _fit_model(self, train: np.ndarray):
        raise NotImplementedError

    def _score_windows(self, wins: np.ndarray, model) -> np.ndarray:
        raise NotImplementedError

    def fit(self, arrays: DataFrame, y=None) -> "SparkDetector":
        w = self._resolve_window(arrays)
        train = DET.fit_sample_windows(
            arrays, w, self.stride,
            max_windows=self._max_fit_windows,
        )
        self.model_ = self._fit_model(train)
        return self

    def _resolve_window(self, arrays: DataFrame) -> int:
        """An auto window mode ('fft'/...) resolves AT FIT like the
        reference (`window_size_ = compute_window_size(X, window_size)`,
        MatrixProfileDetector.py:117). The reference fits one series;
        the distributed fit sample holds many, so the policy here is the
        median of the per-series computed windows over the bounded fit
        sample — deterministic, and robust to a few degenerate series."""
        if isinstance(self.window_size, int):
            self.window_size_ = self.window_size
            return self.window_size_
        from pyspark.sql import functions as F

        # numeric ids sample by value; non-numeric (UCR names) by hash —
        # try_cast, because ANSI mode throws on a malformed cast
        key = F.coalesce(
            F.expr("try_cast(doc_id AS BIGINT)"),
            F.pmod(F.xxhash64("doc_id"), F.lit(1_000_000_007)),
        )
        rows = (
            arrays.filter(key % 20 == 0)
            .orderBy("doc_id").limit(20).select("tokens").collect()
        )
        if not rows:  # tiny input missed by the 1-in-20 sample
            rows = arrays.orderBy("doc_id").limit(20).select("tokens").collect()
        ws = [
            KW.compute_window_size(
                np.asarray(r["tokens"], dtype=np.float64),
                self.window_size, default_window_size=16,
            )
            for r in rows
        ]
        self.window_size_ = int(np.median(ws)) if ws else 16
        return self.window_size_

    def check_is_fitted(self) -> None:
        if not hasattr(self, "model_"):
            raise NotFittedError(f"{type(self).__name__} is not fitted")

    def decision_function(self, arrays: DataFrame) -> DataFrame:
        self.check_is_fitted()
        me, s = self, self.stride
        w = getattr(self, "window_size_", self.window_size)

        def per_series(x: np.ndarray) -> np.ndarray:
            wins = KW.sliding_window(x, w, s)
            d = me._score_windows(wins, me.model_)
            return KW.reverse_sliding_window(d, w, s, x.shape[0])

        return DET._score_map(arrays, per_series)


class KMeansAnomalyDetector(_WindowModelDetector):
    """KMeansAnomalyDetector.py:84-98."""

    def __init__(self, window_size: int = 32, stride: int = 16,
                 n_clusters: int = 8, seed: int = 42):
        super().__init__(window_size, stride)
        self.n_clusters = n_clusters
        self.seed = seed

    def _fit_model(self, train):
        return KD.kmeans_fit(train, self.n_clusters, seed=self.seed)

    def _score_windows(self, wins, model):
        return KD.kmeans_score(wins, model)


class IsolationForest(_WindowModelDetector):
    """IsolationForest.py:7-58 (via PyODAnomalyDetector)."""

    def __init__(self, window_size: int = 32, stride: int = 16,
                 n_estimators: int = 50, seed: int = 42):
        super().__init__(window_size, stride)
        self.n_estimators = n_estimators
        self.seed = seed

    def _fit_model(self, train):
        return KD.iforest_fit(train, n_trees=self.n_estimators, seed=self.seed)

    def _score_windows(self, wins, model):
        return KD.iforest_score(wins, model)


class KNearestNeighbors(_WindowModelDetector):
    """KNearestNeighbors.py (pyod KNN semantics)."""

    _max_fit_windows = 2000

    def __init__(self, window_size: int = 32, stride: int = 16,
                 n_neighbors: int = 5):
        super().__init__(window_size, stride)
        self.n_neighbors = n_neighbors

    def _fit_model(self, train):
        return train

    def _score_windows(self, wins, model):
        from dtaianomaly_spark.kernels import detectors_ext as KX

        return KX.knn_score(wins, model, self.n_neighbors)


class LocalOutlierFactor(_WindowModelDetector):
    _max_fit_windows = 2000

    def __init__(self, window_size: int = 32, stride: int = 16,
                 n_neighbors: int = 10):
        super().__init__(window_size, stride)
        self.n_neighbors = n_neighbors

    def _fit_model(self, train):
        from dtaianomaly_spark.kernels import detectors_ext as KX

        return KX.lof_fit(train, self.n_neighbors)

    def _score_windows(self, wins, model):
        from dtaianomaly_spark.kernels import detectors_ext as KX

        return KX.lof_score(wins, model)


class HistogramBasedOutlierScore(_WindowModelDetector):
    def __init__(self, window_size: int = 32, stride: int = 16,
                 n_bins: int = 10):
        super().__init__(window_size, stride)
        self.n_bins = n_bins

    def _fit_model(self, train):
        from dtaianomaly_spark.kernels import detectors_ext as KX

        return KX.hbos_fit(train, self.n_bins)

    def _score_windows(self, wins, model):
        from dtaianomaly_spark.kernels import detectors_ext as KX

        return KX.hbos_score(wins, model)


class CopulaBasedOutlierDetector(_WindowModelDetector):
    def _fit_model(self, train):
        from dtaianomaly_spark.kernels import detectors_ext as KX

        return KX.copod_fit(train)

    def _score_windows(self, wins, model):
        from dtaianomaly_spark.kernels import detectors_ext as KX

        return KX.copod_score(wins, model)


class PrincipalComponentAnalysis(_WindowModelDetector):
    supervision = Supervision.SEMI_SUPERVISED  # PrincipalComponentAnalysis.py:58
    def __init__(self, window_size: int = 32, stride: int = 16,
                 n_components: int = 4):
        super().__init__(window_size, stride)
        self.n_components = n_components

    def _fit_model(self, train):
        from dtaianomaly_spark.kernels import detectors_ext as KX

        return KX.pca_fit(train, self.n_components)

    def _score_windows(self, wins, model):
        from dtaianomaly_spark.kernels import detectors_ext as KX

        return KX.pca_score(wins, model)


class KernelPrincipalComponentAnalysis(_WindowModelDetector):
    supervision = Supervision.SEMI_SUPERVISED  # KernelPrincipalComponentAnalysis.py:58
    _max_fit_windows = 500  # kernel matrix is quadratic in the sample

    def __init__(self, window_size: int = 32, stride: int = 16,
                 n_components: int = 4):
        super().__init__(window_size, stride)
        self.n_components = n_components

    def _fit_model(self, train):
        from dtaianomaly_spark.kernels import detectors_ext as KX

        return KX.kpca_fit(train, self.n_components)

    def _score_windows(self, wins, model):
        from dtaianomaly_spark.kernels import detectors_ext as KX

        return KX.kpca_score(wins, model)


class ClusterBasedLocalOutlierFactor(_WindowModelDetector):
    def __init__(self, window_size: int = 32, stride: int = 16,
                 n_clusters: int = 8):
        super().__init__(window_size, stride)
        self.n_clusters = n_clusters

    def _fit_model(self, train):
        from dtaianomaly_spark.kernels import detectors_ext as KX

        return KX.cblof_fit(train, self.n_clusters)

    def _score_windows(self, wins, model):
        from dtaianomaly_spark.kernels import detectors_ext as KX

        return KX.cblof_score(wins, model)


class OneClassSupportVectorMachine(_WindowModelDetector):
    supervision = Supervision.SEMI_SUPERVISED  # OneClassSupportVectorMachine.py:59
    _max_fit_windows = 500

    def __init__(self, window_size: int = 32, stride: int = 16,
                 nu: float = 0.1):
        super().__init__(window_size, stride)
        self.nu = nu

    def _fit_model(self, train):
        from dtaianomaly_spark.kernels import detectors_ext as KX

        return KX.ocsvm_fit(train, nu=self.nu)

    def _score_windows(self, wins, model):
        from dtaianomaly_spark.kernels import detectors_ext as KX

        return KX.ocsvm_score(wins, model)


class RobustPrincipalComponentAnalysis(_WindowModelDetector):
    supervision = Supervision.SEMI_SUPERVISED  # RobustPrincipalComponentAnalysis.py:95
    _max_fit_windows = 500  # iterative SVD loop on the sample

    def __init__(self, window_size: int = 32, stride: int = 16,
                 n_components: int = 4):
        super().__init__(window_size, stride)
        self.n_components = n_components

    def _fit_model(self, train):
        from dtaianomaly_spark.kernels import detectors_ext as KX

        return KX.rpca_fit(train, n_components=self.n_components)

    def _score_windows(self, wins, model):
        from dtaianomaly_spark.kernels import detectors_ext as KX

        return KX.rpca_score(wins, model)


class KShapeAnomalyDetector(_WindowModelDetector):
    """KShapeAnomalyDetector.py:142-193 — stride-1 scoring against
    z-normalized shape centroids, so the reverse map differs from the
    shared skeleton."""

    _max_fit_windows = 2000

    def __init__(self, window_size: int = 32, stride: int = 16,
                 n_clusters: int = 3):
        super().__init__(window_size, stride)
        self.n_clusters = n_clusters

    def _fit_model(self, train):
        from dtaianomaly_spark.kernels import detectors_ext as KX

        return KX.kshape_fit(train, self.n_clusters)

    def decision_function(self, arrays: DataFrame) -> DataFrame:
        self.check_is_fitted()
        from dtaianomaly_spark.kernels import detectors_ext as KX

        # fit-resolved window (auto modes like 'fft' resolve at fit)
        model, w = self.model_, getattr(self, "window_size_", self.window_size)

        def per_series(x: np.ndarray) -> np.ndarray:
            d = KX.kshape_scores(x, model, w)
            return KW.reverse_sliding_window(d, w, 1, x.shape[0])

        return DET._score_map(arrays, per_series)


# ----------------------------------------------------------- stateless family

class MedianMethod(SparkDetector):
    """MedianMethod.py:20-120 — |x - nbhd mean| / nbhd std, no fit state."""

    def __init__(self, neighborhood_size_before: int = 16,
                 neighborhood_size_after: Optional[int] = None):
        self.neighborhood_size_before = neighborhood_size_before
        self.neighborhood_size_after = neighborhood_size_after

    def decision_function(self, arrays: DataFrame) -> DataFrame:
        b, a = self.neighborhood_size_before, self.neighborhood_size_after

        def per_series(x: np.ndarray) -> np.ndarray:
            return KD.median_method_scores(x, b, a)

        return DET._score_map(arrays, per_series)


class MatrixProfileDetector(SparkDetector):
    """MatrixProfileDetector.py:82-178 with the reference's FULL
    parameter surface:

    * ``normalize`` — False switches to the non-normalized Minkowski
      ``p``-norm distance family (stumpy.aamp).
    * ``p`` — the norm (non-normalized family only, as stumpy).
    * ``k`` — the k-th nearest-neighbor distance (stump's ``[:, k-1]``).
    * ``novelty`` — AB-join against the fitted reference corpus: ``fit``
      WRITES the reference split to parquet (the distributed analog of
      the reference pickling ``X_reference_`` — never a driver collect),
      and scoring equi-joins each test series with its own reference
      row (``matrix_profile_novelty_scores_join``). A one-series
      reference scores every test series, the reference's own shape.

    Self-join mode is stateless; an auto window mode resolves PER SERIES
    inside the Arrow pass (the faithful distributed reading of the
    reference's per-series ``compute_window_size`` at fit — from the
    reference series when ``novelty=True``). Multivariate series route
    to the mstump(discords=True) composition (self-join) or the summed
    per-attribute AB-joins (novelty), matching the reference's
    branches."""

    def __init__(self, window_size=32, normalize: bool = True,
                 p: float = 2.0, k: int = 1, novelty: bool = False):
        _check_window(window_size)
        # reference validation, MatrixProfileDetector.py:94-108
        if not isinstance(normalize, bool):
            raise TypeError("`normalize` should be boolean")
        if not isinstance(p, (float, int)) or isinstance(p, bool):
            raise TypeError("`p` should be numeric")
        if p < 1.0:
            raise ValueError("`p` is a p-norm, value should be higher than 1.")
        if not isinstance(k, int) or isinstance(k, bool):
            raise TypeError("`k` should be integer")
        if k < 1:
            raise ValueError("`k` should be strictly positive")
        if not isinstance(novelty, bool):
            raise TypeError("'novelty' should be a boolean")
        self.window_size = window_size
        self.normalize = normalize
        self.p = float(p)
        self.k = k
        self.novelty = novelty

    def fit(self, arrays: DataFrame, y=None) -> "MatrixProfileDetector":
        if self.novelty:
            # Distributed fit state: the reference corpus is WRITTEN to
            # parquet, never collected to the driver — the fitted model
            # pickles as a pointer + params (instances never hold
            # DataFrames), and reference corpora scale with executors
            # exactly like test corpora. ``save()`` copies the parquet
            # next to the ``.dtai`` so a saved model stays durable.
            import shutil
            import tempfile

            from pyspark.sql import functions as F

            # a refit replaces the previous fit's scratch parquet —
            # delete it (but never a durable ``<path>.ref`` installed
            # by save(), which other loaded models may point at)
            old = getattr(self, "reference_path_", None)
            if old and getattr(self, "_ref_is_tmp", False):
                shutil.rmtree(old, ignore_errors=True)
            path = tempfile.mkdtemp(prefix="dtai_mp_novelty_ref_")
            ref = arrays.select(
                F.col("doc_id").cast("string").alias("doc_id"), "tokens"
            )
            ref.write.mode("overwrite").parquet(path)
            self.reference_path_ = path
            self._ref_is_tmp = True
            # one metadata-cheap count decides the single-reference
            # broadcast shape at scoring time (the reference's own
            # pickled-X_reference_ contract)
            self.n_reference_ = arrays.sparkSession.read.parquet(
                path
            ).count()
        return self

    def save(self, path: Union[str, Path]) -> None:
        """Besides the ``.dtai`` pickle, a novelty-fitted detector copies
        its reference parquet next to the pickle (``<path>.ref``) so the
        saved model is durable — the pickle itself stays a pointer."""
        if self.novelty and hasattr(self, "reference_path_"):
            import shutil

            base = str(path)
            if Path(base).suffix == ".dtai":
                base = base[: -len(".dtai")]
            target = f"{base}.ref"
            if os.path.abspath(target) != os.path.abspath(
                self.reference_path_
            ):
                # replace, never merge: parquet part files carry unique
                # names per write, so copytree(dirs_exist_ok=True) over
                # a previous save would UNION two reference corpora
                shutil.rmtree(target, ignore_errors=True)
                shutil.copytree(self.reference_path_, target)
                if getattr(self, "_ref_is_tmp", False):
                    # the fit-time scratch dir is now superseded by the
                    # durable copy — free it
                    shutil.rmtree(self.reference_path_, ignore_errors=True)
                self.reference_path_ = target
                self._ref_is_tmp = False
        super().save(path)

    def decision_function(self, arrays: DataFrame) -> DataFrame:
        if self.novelty:
            if not hasattr(self, "reference_path_"):
                raise NotFittedError(
                    "MatrixProfileDetector(novelty=True) is not fitted"
                )
            from pyspark.sql import functions as F

            ref = arrays.sparkSession.read.parquet(self.reference_path_)
            if self.n_reference_ == 1:
                # one reference series scores EVERY test series (the
                # reference pickles a single X_reference_ and joins any
                # test series against it): key the broadcast single row
                # to each test doc_id, then reuse the same join path.
                ref = arrays.select(
                    F.col("doc_id").cast("string").alias("doc_id")
                ).distinct().crossJoin(F.broadcast(ref.select("tokens")))
            return DET.matrix_profile_novelty_scores_join(
                arrays, ref, self.window_size,
                normalize=self.normalize, p=self.p, k=self.k,
            )
        if isinstance(self.window_size, int):
            return DET.matrix_profile_scores(
                arrays, self.window_size,
                normalize=self.normalize, p=self.p, k=self.k,
            )
        spec, normalize, p, k = self.window_size, self.normalize, self.p, self.k

        def per_series(x: np.ndarray) -> np.ndarray:
            w = KW.compute_window_size(x, spec, default_window_size=16)
            prof = DET.mp_profile(x, w, normalize=normalize, p=p, k=k)
            return KW.reverse_sliding_window(prof, w, 1, x.shape[0])

        return DET._score_map(arrays, per_series)


class _LongFormBaseline(SparkDetector):
    def _scores(self, long_form: DataFrame) -> DataFrame:
        raise NotImplementedError

    def decision_function(self, arrays: DataFrame) -> DataFrame:
        from pyspark.sql import functions as F

        # doc_id cast to string so baselines share the canonical
        # (doc_id string, pos, score) SCORE_SCHEMA of every _score_map
        # detector — truth joins must never lean on implicit
        # string<->bigint key coercion
        long_form = arrays.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.posexplode("tokens").alias("pos", "value"),
        ).select("doc_id", F.col("pos").cast("long").alias("pos"))
        return self._scores(long_form)


class AlwaysNormal(_LongFormBaseline):
    """baselines/baselines.py:8-23."""

    def _scores(self, long_form):
        return DET.always_normal_scores(long_form)


class AlwaysAnomalous(_LongFormBaseline):
    """baselines/baselines.py:26-40."""

    def _scores(self, long_form):
        return DET.always_anomalous_scores(long_form)


class RandomDetector(_LongFormBaseline):
    """baselines/baselines.py:43-64 (coordinate-seeded uniform)."""

    def __init__(self, seed: Optional[int] = None):
        self.seed = seed

    def _scores(self, long_form):
        return DET.random_scores(long_form, seed=self.seed or 0)


DETECTOR_REGISTRY = {
    cls.__name__: cls
    for cls in (
        AlwaysNormal, AlwaysAnomalous, RandomDetector,
        MedianMethod, MatrixProfileDetector,
        KMeansAnomalyDetector, IsolationForest,
        KNearestNeighbors, LocalOutlierFactor, HistogramBasedOutlierScore,
        CopulaBasedOutlierDetector, PrincipalComponentAnalysis,
        KernelPrincipalComponentAnalysis, ClusterBasedLocalOutlierFactor,
        OneClassSupportVectorMachine, RobustPrincipalComponentAnalysis,
        KShapeAnomalyDetector,
    )
}


# ----------------------------------------------------------------- pipeline

class Pipeline(SparkDetector):
    """Preprocessing + detection as ONE detector (pipeline/Pipeline.py:
    10-120): the preprocessor (a config entry — type tag, dict, or a
    list, which chains like the reference's ChainedPreprocessor) runs
    over the long form, the result is rebuilt into the canonical arrays
    shape, and the wrapped detector fits/scores on that. Supervision is
    inherited from the detector, and save/load round-trips the whole
    composite (the preprocessor entry is plain data, the detector state
    plain NumPy)."""

    def __init__(self, preprocessor, detector: SparkDetector):
        if not isinstance(detector, SparkDetector):
            raise TypeError("detector expects a SparkDetector object")
        if isinstance(preprocessor, list):
            preprocessor = {
                "type": "ChainedPreprocessor",
                "base_preprocessors": preprocessor,
            }
        self.preprocessor = preprocessor
        self.detector = detector
        self.supervision = detector.supervision

    def _transform(self, arrays: DataFrame) -> DataFrame:
        from pyspark.sql import functions as F

        from dtaianomaly_spark.workflow import grid

        name, pp_fn = grid.build_preprocessor(self.preprocessor)
        if name == "Identity":
            return arrays
        long_form = arrays.select(
            "doc_id",
            F.posexplode("tokens").alias("pos", "value"),
            F.col("n_tok").alias("n"),
        ).select(
            "doc_id", F.col("pos").cast("long").alias("pos"),
            F.col("value").cast("long").alias("value"),
            F.lit(0).alias("truth"), "n",
        )
        return grid._long_to_arrays(pp_fn(long_form))

    def fit(self, arrays: DataFrame, y=None) -> "Pipeline":
        self.detector.fit(self._transform(arrays), y)
        return self

    def decision_function(self, arrays: DataFrame) -> DataFrame:
        return self.detector.decision_function(self._transform(arrays))

    def __str__(self) -> str:
        return (
            f"Pipeline(preprocessor={self.preprocessor!r},"
            f"detector={self.detector})"
        )

    __repr__ = __str__


# ---------------------------------------------------------------- data sets

class DataSet(PrettyPrintable):
    """Train/test split container (data/DataSet.py:14-250) over Spark
    frames: ``X_*`` are canonical arrays DataFrames, ``y_*`` long-form
    ``(doc_id, pos, truth)``. The compatibility rule is the reference's:
    no train split -> unsupervised only; unlabeled train (assumed
    normal) -> + semi-supervised; labeled train -> everything."""

    def __init__(self, X_test: DataFrame, y_test: DataFrame,
                 X_train: Optional[DataFrame] = None,
                 y_train: Optional[DataFrame] = None):
        if X_train is None and y_train is not None:
            raise ValueError("y_train given without X_train")
        self.X_test, self.y_test = X_test, y_test
        self.X_train, self.y_train = X_train, y_train

    def compatible_supervision(self):
        """data/DataSet.py:221-250."""
        if self.X_train is None:
            return [Supervision.UNSUPERVISED]
        if self.y_train is None:
            return [Supervision.UNSUPERVISED, Supervision.SEMI_SUPERVISED]
        return [Supervision.UNSUPERVISED, Supervision.SEMI_SUPERVISED,
                Supervision.SUPERVISED]

    def is_compatible(self, detector: SparkDetector) -> bool:
        return detector.supervision in self.compatible_supervision()

    def fit_frame(self, detector: SparkDetector) -> DataFrame:
        """The reference's fit-data routing (Workflow.py:426-433): an
        unsupervised detector with no train split fits on the test data
        itself; otherwise fit on the train split."""
        if not self.is_compatible(detector):
            raise ValueError(
                f"detector with supervision {detector.supervision} is not"
                f" compatible with this data set"
                f" (compatible: {self.compatible_supervision()})"
            )
        if self.X_train is None:
            return self.X_test
        return self.X_train


class EvaluationPipeline(PrettyPrintable):
    """Pipeline + proba-metric set (pipeline/EvaluationPipeline.py:
    12-100): fit on the data set's fit frame, score the test frame, and
    evaluate every metric entry. ``run`` returns
    ``{metric_name: mean-over-series value}`` using the grid's metric
    machinery (type tags / dicts, same as workflow_from_config)."""

    def __init__(self, preprocessor, detector: SparkDetector, metrics):
        # keep the __init__ params as attributes so the PrettyPrintable
        # canonical string (which reflects over the signature) works
        self.preprocessor = preprocessor
        self.detector = detector
        self.pipeline = Pipeline(preprocessor, detector)
        self.metrics = metrics if isinstance(metrics, list) else [metrics]

    def run(self, data: DataSet, thresholds=None) -> dict:
        from pyspark.sql.functions import col

        from dtaianomaly_spark.workflow import grid

        self.pipeline.fit(data.fit_frame(self.pipeline.detector))
        scored = self.pipeline.decision_function(data.X_test)
        scored_truth = scored.join(
            data.y_test.select(
                col("doc_id").cast("string").alias("doc_id"), "pos", "truth"
            ),
            ["doc_id", "pos"],
        ).persist()
        try:
            out = {}
            for m in self.metrics:
                t = m["type"] if isinstance(m, dict) else m
                if t in grid.PROBA_METRICS:
                    out[grid.metric_name(m, None)] = grid.metric_value(
                        scored_truth, m, None
                    )
                else:
                    for th in thresholds or [("TopN", 20)]:
                        out[grid.metric_name(m, th)] = grid.metric_value(
                            scored_truth, m, th
                        )
            return out
        finally:
            scored_truth.unpersist()


def _exceed_from_scored(scored: DataFrame, contamination: float) -> DataFrame:
    """Long-form decision scores -> per-series ExCeeD confidence
    (groupBy + one Arrow pass; the series' own scores are the train
    ECDF — the reference's X_train=None path, BaseDetector.py:188-287)."""
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
    )

    schema = StructType(
        [
            StructField("doc_id", StringType(), False),
            StructField("pos", LongType(), False),
            StructField("confidence", DoubleType(), False),
        ]
    )

    def per_series(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("pos")
        s = pdf["score"].to_numpy(dtype=np.float64)
        conf = KD.exceed_confidence(s, s, contamination)
        return pd.DataFrame(
            {"doc_id": pdf["doc_id"], "pos": pdf["pos"], "confidence": conf}
        )

    return scored.groupBy("doc_id").applyInPandas(per_series, schema)
