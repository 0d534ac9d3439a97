"""Online MedianMethod streaming operator: chunked in-order ingest must
produce scores bit-equal to the batch kernel over the full series."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dtaianomaly_spark.kernels import detectors as KD


def _run_stream(spark, tmp_path, rows, schema, b, chunks):
    from dtaianomaly_spark.streaming.detect import stateful_median_scores

    lf = spark.createDataFrame(rows, schema)
    src = str(tmp_path / "src")
    # in-order position-range chunks: state must carry the neighborhood
    # across micro-batch boundaries
    bounds = np.linspace(0, max(r[1] for r in rows) + 1, chunks + 1).astype(int)
    for lo, hi in zip(bounds, bounds[1:]):
        lf.filter(f"pos >= {lo} AND pos < {hi}").coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = (
        spark.readStream.schema(lf.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out_dir = str(tmp_path / "out")
    q = (
        stateful_median_scores(stream, b, state_ttl_ms=None)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.read.parquet(out_dir)


def test_streamed_scores_equal_batch_kernel(spark, tmp_path):
    rng = np.random.default_rng(11)
    series = {f"doc-{d}": rng.normal(0, 1, 137) * 100 for d in range(5)}
    rows = [
        (doc, p, float(v))
        for doc, vals in series.items()
        for p, v in enumerate(vals)
    ]
    got = _run_stream(
        spark, tmp_path, rows, "doc_id string, pos long, value double",
        b=16, chunks=4,
    )
    out = {
        (r["doc_id"], r["pos"]): r["score"] for r in got.collect()
    }
    assert len(out) == 5 * 137  # every point scored exactly once
    for doc, vals in series.items():
        expect = KD.median_method_scores(vals, 16, 0)
        for p in range(len(vals)):
            assert out[(doc, p)] == expect[p], (doc, p)


def test_out_of_order_points_rejected(spark, tmp_path):
    rows = [("a", p, float(p)) for p in (0, 1, 3)]  # gap at pos 2
    with pytest.raises(Exception) as ei:
        _run_stream(
            spark, tmp_path, rows, "doc_id string, pos long, value double",
            b=4, chunks=1,
        ).collect()
    assert "in-order contiguous" in str(ei.value)


def test_cold_start_after_state_eviction_is_accepted(spark, tmp_path):
    """A series resuming at pos > 0 with NO state (TTL evicted it) must
    score from a cold window, not kill the query (regression)."""
    import numpy as np

    from dtaianomaly_spark.streaming.detect import stateful_median_scores

    # single batch starting at pos 100 — the post-eviction resume shape
    rows = [("a", 100 + p, float(p * 3 % 7)) for p in range(40)]
    lf = spark.createDataFrame(rows, "doc_id string, pos long, value double")
    src = str(tmp_path / "src")
    lf.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(lf.schema).parquet(src)
    out_dir = str(tmp_path / "out")
    q = (
        stateful_median_scores(stream, 8, state_ttl_ms=None)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["pos"]: r["score"] for r in spark.read.parquet(out_dir).collect()}
    assert len(got) == 40
    # cold window == batch kernel on the values alone
    from dtaianomaly_spark.kernels import detectors as KD

    expect = KD.median_method_scores(
        np.array([float(p * 3 % 7) for p in range(40)]), 8, 0
    )
    for i in range(40):
        assert got[100 + i] == expect[i]


def _run_mp_stream(spark, tmp_path, rows, schema, w, horizon, chunks):
    from dtaianomaly_spark.streaming.detect import stateful_left_matrix_profile

    lf = spark.createDataFrame(rows, schema)
    src = str(tmp_path / "mp_src")
    bounds = np.linspace(0, max(r[1] for r in rows) + 1, chunks + 1).astype(int)
    for lo, hi in zip(bounds, bounds[1:]):
        lf.filter(f"pos >= {lo} AND pos < {hi}").coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = (
        spark.readStream.schema(lf.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out_dir = str(tmp_path / "mp_out")
    q = (
        stateful_left_matrix_profile(
            stream, window_size=w, horizon=horizon, state_ttl_ms=None
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "mp_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.read.parquet(out_dir)


def test_streamed_left_matrix_profile_equals_batch_kernel(spark, tmp_path):
    """Second stateful streaming detector (VERDICT r2 item 7): the causal
    left matrix profile streamed over chunked in-order micro-batches is
    BIT-equal (==) to the batch kernel over each full series — the
    kernel's direct window evaluation is suffix-invariant by design."""
    rng = np.random.default_rng(23)
    series = {f"doc-{d}": rng.normal(0, 1, 151).cumsum() for d in range(4)}
    # include a flat stretch: the flat-window conventions must survive
    series["doc-flat"] = np.concatenate(
        [np.full(40, 3.25), rng.normal(0, 1, 111).cumsum()]
    )
    rows = [
        (doc, p, float(v))
        for doc, vals in series.items()
        for p, v in enumerate(vals)
    ]
    w, horizon = 16, 48
    got = _run_mp_stream(
        spark, tmp_path, rows, "doc_id string, pos long, value double",
        w=w, horizon=horizon, chunks=5,
    )
    out = {(r["doc_id"], r["idx"]): r["profile"] for r in got.collect()}
    n_win = 151 - w + 1
    assert len(out) == 5 * n_win  # every window emitted exactly once
    for doc, vals in series.items():
        expect = KD.left_matrix_profile(vals, w, horizon)
        for i in range(n_win):
            assert out[(doc, i)] == expect[i], (doc, i)


def test_streamed_fitted_window_scores_equal_batch(spark, tmp_path):
    """Fit-offline / score-online: a KMeans model fitted IN BATCH and an
    IsolationForest likewise, each streamed over chunked micro-batches,
    must reproduce the batch per-window kernel scores bit-equal — the
    production shape for every window-model detector (model immutable,
    windows formed causally from constant per-series state)."""
    from dtaianomaly_spark.kernels import windowing as KW
    from dtaianomaly_spark.streaming.detect import stateful_fitted_window_scores

    rng = np.random.default_rng(31)
    series = {f"doc-{d}": rng.normal(0, 1, 143).cumsum() for d in range(4)}
    w = 12
    train = np.concatenate(
        [KW.sliding_window(v, w, 1) for v in series.values()], axis=0
    )
    models = {
        "kmeans": (KD.kmeans_fit(train, 4, seed=7), KD.kmeans_score),
        "iforest": (KD.iforest_fit(train, n_trees=20, seed=7), KD.iforest_score),
    }
    rows = [
        (doc, p, float(v))
        for doc, vals in series.items()
        for p, v in enumerate(vals)
    ]
    lf = spark.createDataFrame(rows, "doc_id string, pos long, value double")

    for name, (model, score_fn) in models.items():
        src = str(tmp_path / f"{name}_src")
        bounds = np.linspace(0, 143, 5).astype(int)
        for lo, hi in zip(bounds, bounds[1:]):
            lf.filter(f"pos >= {lo} AND pos < {hi}").coalesce(1).write.mode(
                "append"
            ).parquet(src)
        stream = (
            spark.readStream.schema(lf.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out_dir = str(tmp_path / f"{name}_out")
        q = (
            stateful_fitted_window_scores(
                stream, w, score_fn, model, state_ttl_ms=None
            )
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", str(tmp_path / f"{name}_ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        out = {
            (r["doc_id"], r["idx"]): r["profile"]
            for r in spark.read.parquet(out_dir).collect()
        }
        n_win = 143 - w + 1
        assert len(out) == 4 * n_win, name
        for doc, vals in series.items():
            expect = score_fn(KW.sliding_window(vals, w, 1), model)
            for i in range(n_win):
                assert out[(doc, i)] == expect[i], (name, doc, i)


def test_streamed_alerts_equal_batch_decisions(spark, tmp_path):
    """Full online alerting pipeline: fitted-model scores -> fixed
    cutoff -> append alert stream. The alert SET (doc_id, idx) must
    equal the batch decisions from the same model + threshold — the
    stateless threshold stage composes with the stateful scorer without
    re-batching."""
    from pyspark.sql import functions as F

    from dtaianomaly_spark.kernels import windowing as KW
    from dtaianomaly_spark.streaming.detect import stateful_fitted_window_scores

    rng = np.random.default_rng(43)
    series = {f"doc-{d}": rng.normal(0, 1, 97).cumsum() for d in range(3)}
    w = 10
    train = np.concatenate(
        [KW.sliding_window(v, w, 1) for v in series.values()], axis=0
    )
    model = KD.kmeans_fit(train, 3, seed=5)
    # threshold fitted offline too: the 90th-percentile train score
    tau = float(np.quantile(KD.kmeans_score(train, model), 0.9))

    rows = [
        (doc, p, float(v))
        for doc, vals in series.items()
        for p, v in enumerate(vals)
    ]
    lf = spark.createDataFrame(rows, "doc_id string, pos long, value double")
    src = str(tmp_path / "al_src")
    for lo, hi in ((0, 40), (40, 97)):
        lf.filter(f"pos >= {lo} AND pos < {hi}").coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(lf.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out_dir = str(tmp_path / "al_out")
    q = (
        stateful_fitted_window_scores(
            stream, w, KD.kmeans_score, model, state_ttl_ms=None
        )
        .filter(F.col("profile") > tau)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "al_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["doc_id"], r["idx"])
        for r in spark.read.parquet(out_dir).collect()
    }
    expect = {
        (doc, i)
        for doc, vals in series.items()
        for i, s in enumerate(KD.kmeans_score(KW.sliding_window(vals, w, 1), model))
        if s > tau
    }
    assert expect, "threshold must fire on some window for the test to bite"
    assert got == expect


def test_left_matrix_profile_horizon_bounds_lookback():
    """A motif repeated outside the horizon must NOT be found; inside it
    must. Direct structural check of the horizon contract."""
    rng = np.random.default_rng(7)
    motif = rng.normal(0, 1, 16)
    x = np.concatenate([motif, rng.normal(10, 0.1, 100).cumsum(), motif])
    far = KD.left_matrix_profile(x, 16, horizon=20)
    near = KD.left_matrix_profile(x, 16, horizon=2000)
    i = len(x) - 16  # the repeated motif's window
    assert near[i] < 1e-6       # exact repeat found with a wide horizon
    assert far[i] > near[i] + 1.0  # out of horizon -> no match


def test_streamed_cusum_equals_batch_operator(spark, tmp_path):
    """O(1)-state streaming CUSUM over chunked in-order micro-batches is
    bit-equal to the relational batch operator (prefix-min identity) over
    each full series — the scalar state carries the recurrence exactly."""
    from dtaianomaly_spark.operators.detectors import cusum_scores
    from dtaianomaly_spark.streaming.detect import stateful_cusum

    rng = np.random.default_rng(17)
    rows = []
    for d in range(4):
        vals = rng.integers(-105, 106, 160)
        vals[40 + d * 7] += 400  # spike per series
        rows += [(f"doc-{d}", p, int(v)) for p, v in enumerate(vals)]
    schema = "doc_id string, pos long, value long"
    lf = spark.createDataFrame(rows, schema)

    src = str(tmp_path / "cu_src")
    bounds = np.linspace(0, 160, 5).astype(int)
    seen: set = set()
    for i, (lo, hi) in enumerate(zip(bounds, bounds[1:])):
        lf.filter(f"pos >= {lo} AND pos < {hi}").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        # The file stream orders by modification time; on a fast
        # filesystem consecutive chunks can tie on mtime and be
        # delivered out of pos order, tripping the contiguity guard.
        # Stamp each chunk's files with strictly increasing mtimes.
        base = 1_600_000_000 + i * 10
        for f in os.listdir(src):
            p = os.path.join(src, f)
            if f.endswith(".parquet") and p not in seen:
                os.utime(p, (base, base))
                seen.add(p)
    stream = (
        spark.readStream.schema(lf.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out_dir = str(tmp_path / "cu_out")
    q = (
        stateful_cusum(stream, k=60, h=300, state_ttl_ms=None)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "cu_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["doc_id"], r["pos"]): (r["cusum"], r["alarm"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert len(got) == 4 * 160
    batch = {
        (r["doc_id"], r["pos"]): (r["cusum"], r["alarm"])
        for r in cusum_scores(lf, 60, 300).collect()
    }
    assert got == batch
    assert any(a for _, a in got.values())  # the spikes really alarm


def test_streamed_holt_winters_equals_batch_operator(spark, tmp_path):
    """O(period)-state streaming Holt-Winters over chunked in-order
    micro-batches is byte-equal to the batch operator over each full
    series — warmup buffer, then the shared hw_step recursion carried
    across batches."""
    from dtaianomaly_spark.operators.detectors import holt_winters_scores
    from dtaianomaly_spark.streaming.detect import stateful_holt_winters

    rng = np.random.default_rng(23)
    m, n = 12, 160
    rows, arrays = [], []
    for d in range(4):
        t = np.arange(n, dtype=float)
        vals = (0.3 * t + 20 * np.sin(2 * np.pi * t / m)
                + rng.normal(0, 1, n)).round(3)
        vals[90 + d * 9] += 80.0
        rows += [(f"doc-{d}", p, float(v)) for p, v in enumerate(vals)]
        arrays.append((f"doc-{d}", [float(v) for v in vals]))
    lf = spark.createDataFrame(rows, "doc_id string, pos long, value double")

    src = str(tmp_path / "hw_src")
    bounds = np.linspace(0, n, 5).astype(int)
    seen: set = set()
    for i, (lo, hi) in enumerate(zip(bounds, bounds[1:])):
        lf.filter(f"pos >= {lo} AND pos < {hi}").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        base = 1_600_000_000 + i * 10
        for f in os.listdir(src):
            p = os.path.join(src, f)
            if f.endswith(".parquet") and p not in seen:
                os.utime(p, (base, base))
                seen.add(p)
    stream = (
        spark.readStream.schema(lf.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out_dir = str(tmp_path / "hw_out")
    q = (
        stateful_holt_winters(stream, period=m, state_ttl_ms=None)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "hw_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["doc_id"], r["pos"]): r["score"]
        for r in spark.read.parquet(out_dir).collect()
    }
    assert len(got) == 4 * n
    corpus = spark.createDataFrame(
        arrays, "doc_id string, tokens array<double>"
    )
    batch = {
        (r["doc_id"], r["pos"]): r["score"]
        for r in holt_winters_scores(corpus, period=m).collect()
    }
    assert got == batch  # byte-equal, warmup zeros included
    # spikes dominate: per series the argmax score sits on the spike
    for d in range(4):
        doc = f"doc-{d}"
        top = max(
            (s, p) for (dd, p), s in got.items() if dd == doc
        )
        assert top[1] == 90 + d * 9


def test_streamed_hw_restart_mid_series_phase_aligned():
    """A stream whose first point is NOT at pos 0 (a TTL restart) must
    forecast with phase-consistent seasonals: the emitted scores equal
    the batch kernel run on the suffix values — slot LABELS differ, the
    position grouping (m apart) must not."""
    import pandas as pd

    from dtaianomaly_spark.kernels.detectors_ext import hw_scores_1d
    from dtaianomaly_spark.streaming.detect import _make_hw_update
    from tests.test_stateful_streaming import _FakeState

    m, g, n = 12, 200, 160  # g % m = 8 — the misalignment case
    t = np.arange(n, dtype=float)
    x = 0.3 * t + 20 * np.sin(2 * np.pi * t / m)
    update = _make_hw_update(m, 0.3, 0.1, 0.2, None)
    st = _FakeState()
    out = list(update(
        ("d",),
        iter([pd.DataFrame({"pos": np.arange(g, g + n), "value": x})]),
        st,
    ))[0]
    got = dict(zip(out["pos"], out["score"]))
    want = hw_scores_1d(x, m)
    for i in range(n):
        assert got[g + i] == want[i], (i, got[g + i], want[i])
    # the seasonal signal is actually learned (errors shrink far below
    # the amplitude) — this is what the misaligned version fails
    tail = np.array([got[g + i] for i in range(n - 40, n)])
    assert np.abs(tail).max() < 2.0


def test_streamed_acf_snapshots_equal_batch_operator(spark, tmp_path):
    """Bounded-state streaming ACF: after EVERY micro-batch the emitted
    snapshot is bit-equal to the batch acf_report run over the same
    prefix — the 2*nlags-value + integer-moment state carries the
    n²-scaled identity exactly."""
    from dtaianomaly_spark.operators.windows import acf_report
    from dtaianomaly_spark.streaming.detect import stateful_acf

    rng = np.random.default_rng(23)
    n, n_docs = 120, 3
    rows = []
    for d in range(n_docs):
        vals = rng.integers(-105, 106, n)
        vals[1::7] += d + 1  # mild per-series structure
        rows += [(f"doc-{d}", p, int(v)) for p, v in enumerate(vals)]
    schema = "doc_id string, pos long, value long"
    lf = spark.createDataFrame(rows, schema)

    src = str(tmp_path / "acf_src")
    bounds = np.linspace(0, n, 5).astype(int)
    seen: set = set()
    for i, (lo, hi) in enumerate(zip(bounds, bounds[1:])):
        lf.filter(f"pos >= {lo} AND pos < {hi}").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        base = 1_600_000_000 + i * 10
        for f in os.listdir(src):
            p = os.path.join(src, f)
            if f.endswith(".parquet") and p not in seen:
                os.utime(p, (base, base))
                seen.add(p)
    stream = (
        spark.readStream.schema(lf.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out_dir = str(tmp_path / "acf_out")
    q = (
        stateful_acf(stream, nlags=8, state_ttl_ms=None)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "acf_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = spark.read.parquet(out_dir).collect()
    # one snapshot per (doc, chunk): 4 prefixes x 3 docs x 8 lags
    assert len(out) == 4 * n_docs * 8
    got = {(r["doc_id"], r["n"], r["lag"]): r["acf"] for r in out}
    for hi in bounds[1:]:
        prefix = lf.filter(f"pos < {hi}")
        batch = {
            (r["doc_id"], int(hi), r["lag"]): r["acf"]
            for r in acf_report(prefix, 8).collect()
        }
        snap = {k: v for k, v in got.items() if k[1] == int(hi)}
        assert snap == batch  # bit-equal floats, every prefix


def test_streamed_acf_contiguity_and_validation():
    from dtaianomaly_spark.streaming.detect import stateful_acf

    with pytest.raises(ValueError):
        stateful_acf(None, nlags=0)


def test_streamed_trend_snapshots_equal_batch_operator(spark, tmp_path):
    """O(1)-state streaming OLS trend: after EVERY micro-batch the
    emitted snapshot is bit-equal to the batch trend_report over the
    same prefix — six int64 moments carry the whole regression. One
    series is CONSTANT to pin the r2 NULL (not NaN) contract."""
    from dtaianomaly_spark.operators.windows import trend_report
    from dtaianomaly_spark.streaming.detect import stateful_trend

    rng = np.random.default_rng(29)
    n, n_docs = 96, 3
    rows = []
    for d in range(n_docs):
        if d == 2:
            vals = np.full(n, 7)  # constant: zero y-variance, r2 NULL
        else:
            vals = rng.integers(-105, 106, n) + np.arange(n) * (d + 1)
        rows += [(f"doc-{d}", p, int(v)) for p, v in enumerate(vals)]
    schema = "doc_id string, pos long, value long"
    lf = spark.createDataFrame(rows, schema)

    src = str(tmp_path / "trend_src")
    bounds = np.linspace(0, n, 5).astype(int)
    seen: set = set()
    for i, (lo, hi) in enumerate(zip(bounds, bounds[1:])):
        lf.filter(f"pos >= {lo} AND pos < {hi}").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        base = 1_600_000_000 + i * 10
        for f in os.listdir(src):
            p = os.path.join(src, f)
            if f.endswith(".parquet") and p not in seen:
                os.utime(p, (base, base))
                seen.add(p)
    stream = (
        spark.readStream.schema(lf.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out_dir = str(tmp_path / "trend_out")
    q = (
        stateful_trend(stream, horizon=64, state_ttl_ms=None)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "trend_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = spark.read.parquet(out_dir).collect()
    assert len(out) == 4 * n_docs  # one snapshot per (doc, chunk)
    got = {
        (r["doc_id"], r["n"]):
            (r["slope"], r["intercept"], r["r2"], r["forecast"])
        for r in out
    }
    for hi in bounds[1:]:
        prefix = lf.filter(f"pos < {hi}")
        batch = {
            (r["doc_id"], int(hi)):
                (r["slope"], r["intercept"], r["r2"], r["forecast"])
            for r in trend_report(prefix, 64).collect()
        }
        snap = {k: v for k, v in got.items() if k[1] == int(hi)}
        assert snap == batch  # bit-equal floats; r2 None==None
    # the constant series really exercised the NULL branch
    assert got[("doc-2", n)][2] is None


def test_streamed_trend_validation():
    from dtaianomaly_spark.streaming.detect import stateful_trend

    with pytest.raises(ValueError):
        stateful_trend(None, horizon=-1)


def test_streamed_hysteresis_equals_batch_operator(spark, tmp_path):
    """One-bit-state streaming Schmitt trigger: the streamed alarm/edge
    rows byte-match the batch last-crossing-identity operator over the
    full series, across chunk boundaries."""
    from dtaianomaly_spark.operators.detectors import hysteresis_alarm
    from dtaianomaly_spark.streaming.detect import stateful_hysteresis

    rng = np.random.default_rng(71)
    n, n_docs, hi, lo = 160, 3, 380, 250
    rows = []
    for d in range(n_docs):
        vals = rng.integers(0, 520, n)
        rows += [(f"doc-{d}", p, int(v)) for p, v in enumerate(vals)]
    schema = "doc_id string, pos long, value long"
    lf = spark.createDataFrame(rows, schema)
    src = str(tmp_path / "hyst_src")
    bounds = np.linspace(0, n, 5).astype(int)
    seen: set = set()
    for i, (lo_b, hi_b) in enumerate(zip(bounds, bounds[1:])):
        lf.filter(f"pos >= {lo_b} AND pos < {hi_b}").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        base = 1_600_000_000 + i * 10
        for f in os.listdir(src):
            p = os.path.join(src, f)
            if f.endswith(".parquet") and p not in seen:
                os.utime(p, (base, base))
                seen.add(p)
    stream = (
        spark.readStream.schema(lf.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out_dir = str(tmp_path / "hyst_out")
    q = (
        stateful_hysteresis(stream, hi, lo, state_ttl_ms=None)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "hyst_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["doc_id"], r["pos"]): (r["value"], r["alarm"], r["edge"])
        for r in spark.read.parquet(out_dir).collect()
    }
    batch = {
        (r["doc_id"], r["pos"]): (r["value"], r["alarm"], r["edge"])
        for r in hysteresis_alarm(lf, hi, lo).collect()
    }
    assert got == batch and len(got) == n * n_docs
    assert sum(a for (_, a, _e) in got.values()) > 0
