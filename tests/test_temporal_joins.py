"""Temporal join operators (as-of join, range join) vs brute-force
oracles, plus the rollup maintenance ops (incremental refresh,
mergeable distinct rollup) vs full recomputes — all Spark-vs-Spark so
they complement the driver's DuckDB adjudication of the same ops."""

import pytest
from pyspark.sql import functions as F

from dtaianomaly_spark.operators.temporal_joins import asof_join, range_join_bucketed
from dtaianomaly_spark.rollup.refresh import incremental_refresh
from dtaianomaly_spark.rollup.tiers import (
    distinct_rollup,
    distinct_rollup_sketch,
    rollup_relational,
)
from dtaianomaly_spark.sources.corpus import synthetic_corpus


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


# ---------------------------------------------------------------- as-of join

def _asof_frames(spark):
    # key 1: interleaved; key 2: probe before any build; ties at ts=50
    build = spark.createDataFrame(
        [(1, 10, 100, 5), (1, 30, 101, 6), (1, 50, 102, 7), (1, 50, 103, 8),
         (2, 90, 104, 9)],
        "k long, t long, bid long, bv long",
    )
    probe = spark.createDataFrame(
        [(1, 5, 200), (1, 30, 201), (1, 49, 202), (1, 50, 203), (1, 99, 204),
         (2, 80, 205), (2, 95, 206), (3, 10, 207)],
        "k long, t long, pid long",
    )
    return probe, build


def test_asof_join_matches_bruteforce(spark):
    probe, build = _asof_frames(spark)
    out = asof_join(probe, build, on="k", ts="t", build_cols=["bv"],
                    order_col="bid", prefix="m_")
    got = {r["pid"]: (r["m_t"], r["m_bv"]) for r in out.collect()}
    # brute force: greatest build.t <= probe.t, ties -> greatest bid
    bres = [(r["k"], r["t"], r["bid"], r["bv"]) for r in build.collect()]
    expect = {}
    for k, t, pid in [(r["k"], r["t"], r["pid"]) for r in probe.collect()]:
        cand = [b for b in bres if b[0] == k and b[1] <= t]
        if not cand:
            expect[pid] = (None, None)
        else:
            best = max(cand, key=lambda b: (b[1], b[2]))
            expect[pid] = (best[1], best[3])
    assert got == expect
    # spot checks: inclusive tie at t=50 resolves to bid=103 (bv=8);
    # probe-before-build and unseen key give NULLs
    assert expect[203] == (50, 8) and got[203] == (50, 8)
    assert got[205] == (None, None) and got[207] == (None, None)
    assert out.count() == probe.count()


def test_asof_join_single_shuffle(spark):
    probe, build = _asof_frames(spark)
    plan = asof_join(probe, build, on="k", ts="t", build_cols=["bv"],
                     order_col="bid")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2  # key shuffle (+AQE coalesce), no join


# ------------------------------------------------------------- range join

def test_range_join_matches_bruteforce(spark):
    pts = spark.createDataFrame(
        [(i, i * 7 % 100) for i in range(60)], "pid long, t long"
    )
    iv = spark.createDataFrame(
        [(1, 0, 10), (2, 5, 35), (3, 35, 35), (4, 90, 120), (5, 200, 300)],
        "wid long, lo long, hi long",
    )
    for width in (8, 16, 64):
        got = _rows(
            range_join_bucketed(pts, iv, "t", "lo", "hi", width), "wid", "pid"
        )
        brute = _rows(
            iv.crossJoin(pts).filter(F.col("t").between(F.col("lo"), F.col("hi"))),
            "wid", "pid",
        )
        assert got == brute, f"width={width}"
        assert len(got) == len(set(got))  # exactly-once, no dedup needed


def test_range_join_keyed(spark):
    pts = spark.createDataFrame(
        [(i, i % 3, i * 5 % 50) for i in range(40)], "pid long, g long, t long"
    )
    iv = spark.createDataFrame(
        [(1, 0, 10, 40), (2, 1, 0, 20), (3, 2, 25, 49)],
        "wid long, g long, lo long, hi long",
    )
    got = _rows(range_join_bucketed(pts, iv, "t", "lo", "hi", 16, on="g"),
                "wid", "pid")
    brute = _rows(
        iv.join(pts, "g").filter(F.col("t").between(F.col("lo"), F.col("hi"))),
        "wid", "pid",
    )
    assert got == brute


# ------------------------------------------ incremental refresh / distinct

@pytest.fixture(scope="module")
def long_form(spark):
    lf = synthetic_corpus(spark, n_series=40).select(
        "doc_id", F.posexplode("tokens").alias("pos", "value")
    ).select("doc_id", F.col("pos").cast("long").alias("pos"),
             F.col("value").cast("long").alias("value")).persist()
    lf.count()
    yield lf
    lf.unpersist()


def test_incremental_refresh_equals_full(spark, long_form):
    # different predicate/mutation than the driver query exercises
    pred = "doc_id LIKE '%3'"
    mutated = long_form.withColumn(
        "value",
        F.col("value")
        + F.expr(f"CASE WHEN ({pred}) AND pos % 5 = 1 THEN 11 ELSE 0 END"),
    )
    stale = rollup_relational(long_form, 16, "raw")
    inc = incremental_refresh(stale, mutated, pred, 16, "raw")
    full = rollup_relational(mutated, 16, "raw")
    cols = full.columns
    assert _rows(inc, *cols) == _rows(full, *cols)
    # the refresh really is partial: only predicate docs recompute
    n_invalid = mutated.filter(F.expr(pred)).select("doc_id").distinct().count()
    assert 0 < n_invalid < 40


def test_distinct_rollup_exact_and_non_additive(spark, long_form):
    out = distinct_rollup(long_form, fine_ticks=64, factor=4)
    direct = long_form.groupBy(
        "doc_id", (F.col("pos") / 256).cast("long").alias("bucket")
    ).agg(F.countDistinct("value").alias("ndv"))
    assert _rows(out, "doc_id", "bucket", "ndv") == _rows(
        direct, "doc_id", "bucket", "ndv"
    )
    # merging partial distinct sets can only deflate vs summing partials
    bad = out.filter(F.col("ndv") > F.col("ndv_1m_sum")).count()
    assert bad == 0
    # and on this corpus the difference is real (sum would overcount)
    assert out.filter(F.col("ndv") < F.col("ndv_1m_sum")).count() > 0


def test_distinct_rollup_sketch_tracks_exact(spark, long_form):
    exact = {(r["doc_id"], r["bucket"]): r["ndv"] for r in
             distinct_rollup(long_form, 64, 4).collect()}
    est = {(r["doc_id"], r["bucket"]): r["ndv_est"] for r in
           distinct_rollup_sketch(long_form, 64, 4, lgk=12).collect()}
    assert set(est) == set(exact)
    for k, nd in exact.items():
        assert abs(est[k] - nd) <= max(2.0, 0.05 * nd), (k, nd, est[k])


def test_asof_join_forward_and_tolerance(spark):
    probe, build = _asof_frames(spark)
    out = asof_join(probe, build, on="k", ts="t", build_cols=["bv"],
                    order_col="bid", prefix="m_", direction="forward")
    got = {r["pid"]: (r["m_t"], r["m_bv"]) for r in out.collect()}
    bres = [(r["k"], r["t"], r["bid"], r["bv"]) for r in build.collect()]
    expect = {}
    for k, t, pid in [(r["k"], r["t"], r["pid"]) for r in probe.collect()]:
        cand = [b for b in bres if b[0] == k and b[1] >= t]
        if not cand:
            expect[pid] = (None, None)
        else:
            best = min(cand, key=lambda b: (b[1], b[2]))
            expect[pid] = (best[1], best[3])
    assert got == expect
    # forward tie at t=50 resolves to SMALLEST bid (102 -> bv=7)
    assert got[203] == (50, 7)
    # tolerance nulls out matches further than 5 ticks
    tol = asof_join(probe, build, on="k", ts="t", build_cols=["bv"],
                    order_col="bid", prefix="m_", direction="forward",
                    tolerance=5)
    gt = {r["pid"]: (r["m_t"], r["m_bv"]) for r in tol.collect()}
    for pid, (mt, mv) in expect.items():
        pt = {200: 5, 201: 30, 202: 49, 203: 50, 204: 99,
              205: 80, 206: 95, 207: 10}[pid]
        if mt is not None and abs(mt - pt) <= 5:
            assert gt[pid] == (mt, mv)
        else:
            assert gt[pid] == (None, None)


def test_refresh_tail_equals_full(spark, long_form):
    from dtaianomaly_spark.rollup.refresh import refresh_tail

    # from_pos NOT on a bucket edge: the straddling bucket must recompute
    for from_pos in (100, 105):
        mutated = long_form.withColumn(
            "value",
            F.col("value")
            + F.expr(f"CASE WHEN pos >= {from_pos} THEN 7 ELSE 0 END"),
        )
        stale = rollup_relational(long_form, 16, "raw")
        inc = refresh_tail(stale, mutated, from_pos, 16, "raw")
        full = rollup_relational(mutated, 16, "raw")
        cols = full.columns
        assert _rows(inc, *cols) == _rows(full, *cols), from_pos


def test_asof_join_skew_equals_plain(spark):
    from dtaianomaly_spark.operators.temporal_joins import asof_join_skew

    # adversarial data: one hot key (0) with many rows, ties at bucket
    # edges (t multiples of width), empty buckets, key with no builds
    build = spark.createDataFrame(
        [(i % 3, (i * 13) % 200, 1000 + i, i) for i in range(120)]
        + [(0, 64, 5000, 777), (0, 64, 5001, 778)],  # tie ON a bucket edge
        "k long, t long, bid long, bv long",
    ).filter(F.col("k") != 2)  # key 2: probes only
    probe = spark.createDataFrame(
        [(i % 3, (i * 7) % 205, 2000 + i) for i in range(150)],
        "k long, t long, pid long",
    )
    for direction in ("backward", "forward"):
        for tol in (None, 10):
            ref = asof_join(probe, build, on="k", ts="t", build_cols=["bv"],
                            order_col="bid", prefix="m_",
                            direction=direction, tolerance=tol)
            for width in (16, 64, 1000):
                got = asof_join_skew(
                    probe, build, on="k", ts="t", build_cols=["bv"],
                    order_col="bid", prefix="m_", direction=direction,
                    tolerance=tol, bucket_width=width)
                assert _rows(got, "pid", "m_t", "m_bv") == \
                    _rows(ref, "pid", "m_t", "m_bv"), (direction, tol, width)


def test_asof_skew_negative_ts_floor_buckets(spark):
    """Epoch-relative (negative) timestamps: floor-division bucketing
    keeps buckets uniform around t=0 (cast-truncation used to fold
    [-width, width) into one triple-width bucket 0) and results still
    equal the plain as-of join."""
    from dtaianomaly_spark.operators.temporal_joins import asof_join_skew

    build = spark.createDataFrame(
        [(i % 2, (i * 13) % 200 - 100, 1000 + i, i) for i in range(80)],
        "k long, t long, bid long, bv long",
    )
    probe = spark.createDataFrame(
        [(i % 2, (i * 7) % 205 - 102, 2000 + i) for i in range(90)],
        "k long, t long, pid long",
    )
    for direction in ("backward", "forward"):
        ref = asof_join(probe, build, on="k", ts="t", build_cols=["bv"],
                        order_col="bid", prefix="m_", direction=direction)
        got = asof_join_skew(
            probe, build, on="k", ts="t", build_cols=["bv"],
            order_col="bid", prefix="m_", direction=direction,
            bucket_width=16)
        assert _rows(got, "pid", "m_t", "m_bv") == \
            _rows(ref, "pid", "m_t", "m_bv"), direction
    # the floor rule itself: -1 and +1 land in different width-16 buckets
    from pyspark.sql import functions as FF
    r = spark.createDataFrame([(-1,), (1,)], "t long").select(
        FF.floor(FF.col("t") / 16).cast("long").alias("b")
    ).collect()
    assert {x["b"] for x in r} == {-1, 0}


def test_range_join_negative_intervals(spark):
    pts = spark.createDataFrame(
        [(i, (i * 11) % 120 - 60) for i in range(60)], "pid long, t long"
    )
    iv = spark.createDataFrame(
        [(1, -50, -10), (2, -20, 25), (3, 5, 59), (4, -60, -60)],
        "wid long, lo long, hi long",
    )
    got = _rows(range_join_bucketed(pts, iv, "t", "lo", "hi", 16), "wid", "pid")
    brute = _rows(
        iv.crossJoin(pts).filter(F.col("t").between(F.col("lo"), F.col("hi"))),
        "wid", "pid",
    )
    assert got == brute


# ------------------------------------------------------ histogram tier

def test_hist_rollup_merge_equals_direct(spark, long_form):
    from dtaianomaly_spark.rollup.tiers import hist_bin_expr, hist_rollup

    merged = hist_rollup(long_form, fine_ticks=16, factor=4)
    direct = (
        long_form.select(
            "doc_id",
            (F.col("pos") / 64).cast("long").alias("bucket"),
            hist_bin_expr("value").alias("bin"),
        )
        .groupBy("doc_id", "bucket", "bin")
        .agg(F.count("*").alias("bcnt"))
    )
    cols = ("doc_id", "bucket", "bin", "bcnt")
    assert _rows(merged, *cols) == _rows(direct, *cols)


def test_hist_quantiles_vs_numpy_bruteforce(spark, long_form):
    import numpy as np
    from dtaianomaly_spark.rollup.tiers import (
        HIST_BINS, HIST_HI, HIST_LO, hist_quantiles, hist_rollup,
    )

    width = (HIST_HI - HIST_LO) // HIST_BINS
    got = _rows(
        hist_quantiles(hist_rollup(long_form, fine_ticks=16, factor=4)),
        "doc_id", "bucket", "cnt", "p50", "p95",
    )
    raw = long_form.select(
        "doc_id", (F.col("pos") / 64).cast("long").alias("bucket"), "value"
    ).collect()
    groups = {}
    for r in raw:
        groups.setdefault((r.doc_id, r.bucket), []).append(r.value)
    exp = []
    for (d, b), vals in groups.items():
        v = np.clip(np.asarray(vals), HIST_LO, HIST_HI - 1)
        bins = (v - HIST_LO) // width
        t = len(bins)
        counts = np.bincount(bins, minlength=HIST_BINS)
        cum = np.cumsum(counts)
        p50_bin = int(np.argmax(cum >= (t + 1) // 2))
        p95_bin = int(np.argmax(cum >= (t * 19 + 19) // 20))
        exp.append((d, b, t, HIST_LO + p50_bin * width,
                    HIST_LO + p95_bin * width))
    assert got == sorted(exp)
    # the estimate brackets the true quantile within one bin width
    for (d, b, t, p50, p95) in got:
        vals = np.sort(np.clip(np.asarray(groups[(d, b)]), HIST_LO, HIST_HI - 1))
        true50 = vals[max(0, (t + 1) // 2 - 1)]
        true95 = vals[max(0, (t * 19 + 19) // 20 - 1)]
        assert p50 <= true50 < p50 + width
        assert p95 <= true95 < p95 + width


def test_topk_sketch_bounds_and_exact_degrade(spark, long_form):
    from dtaianomaly_spark.rollup.tiers import topk_sketch

    m = 4
    sk = topk_sketch(long_form, fine_ticks=16, factor=4, m=m)
    rows = sk.collect()
    assert rows
    true = {
        (r.doc_id, r.bucket, r.value): r.cnt
        for r in long_form.groupBy(
            "doc_id", (F.col("pos") / 64).cast("long").alias("bucket"), "value"
        ).agg(F.count("*").alias("cnt")).collect()
    }
    err_by_bucket = {}
    for r in rows:
        t = true[(r.doc_id, r.bucket, r.value)]
        # underestimate, within the tracked bound
        assert 0 < r.est <= t <= r.est + r.err_bound, r
        err_by_bucket[(r.doc_id, r.bucket)] = r.err_bound
    # completeness: any value with true count > err_bound must be present
    present = {(r.doc_id, r.bucket, r.value) for r in rows}
    for (d, b, v), t in true.items():
        eb = err_by_bucket.get((d, b))
        if eb is not None and t > eb:
            assert (d, b, v) in present, (d, b, v, t, eb)

    # m >= alphabet: every subtraction is 0 -> sketch == exact counts
    big = topk_sketch(long_form, fine_ticks=16, factor=4, m=512)
    got = {(r.doc_id, r.bucket, r.value): (r.est, r.err_bound)
           for r in big.collect()}
    assert set(got) == set(true)
    assert all(got[k] == (t, 0) for k, t in true.items())


def test_asof_join_atomic_row_carry_with_nulls(spark):
    """The matched build row is carried atomically: a NULL build column
    in the matched row stays NULL (pandas merge_asof semantics), and
    NULL join keys group together like a window partition."""
    build = spark.createDataFrame(
        [(1, 10, 100, 5), (1, 20, 101, None), (None, 5, 102, 9)],
        "k long, t long, bid long, bv long",
    )
    probe = spark.createDataFrame(
        [(1, 25, 200), (None, 7, 201), (2, 9, 202)],
        "k long, t long, pid long",
    )
    got = {
        r.pid: (r.m_t, r.m_bv)
        for r in asof_join(
            probe, build, on="k", ts="t", build_cols=["bv"],
            order_col="bid", prefix="m_",
        ).collect()
    }
    # pid 200 matches the t=20 row whose bv IS NULL — no leak from t=10
    assert got[200] == (20, None)
    # NULL key matches the NULL-key build row
    assert got[201] == (5, 9)
    # no build for key 2
    assert got[202] == (None, None)
    assert len(got) == 3


def test_asof_join_skew_nulls_equal_plain(spark):
    from dtaianomaly_spark.operators.temporal_joins import asof_join_skew

    build = spark.createDataFrame(
        [(1, 10, 100, 5), (1, 20, 101, None), (None, 5, 102, 9),
         (None, 200, 103, 4), (1, 150, 104, 7)],
        "k long, t long, bid long, bv long",
    )
    probe = spark.createDataFrame(
        [(1, 25, 200), (None, 7, 201), (2, 9, 202), (None, 300, 203),
         (1, 149, 204)],
        "k long, t long, pid long",
    )
    for direction in ("backward", "forward"):
        for tol in (None, 30):
            ref = asof_join(probe, build, on="k", ts="t", build_cols=["bv"],
                            order_col="bid", prefix="m_",
                            direction=direction, tolerance=tol)
            for width in (16, 64):
                got = asof_join_skew(
                    probe, build, on="k", ts="t", build_cols=["bv"],
                    order_col="bid", prefix="m_", direction=direction,
                    tolerance=tol, bucket_width=width)
                assert _rows(got, "pid", "m_t", "m_bv") == \
                    _rows(ref, "pid", "m_t", "m_bv"), (direction, tol, width)


def test_mstump_non_normalized_variants(spark):
    """Regression: the d=2 symmetric fast path must serve the aamp
    (normalize=False) engine family too, for every p."""
    import numpy as np
    from dtaianomaly_spark.kernels.detectors import mstump_profile_sum

    rng = np.random.default_rng(7)
    X = rng.integers(-50, 51, (120, 2)).astype(float)

    def naive(X, w, normalize, p):
        import math
        n, d = X.shape
        l = n - w + 1
        excl = math.ceil(w / 4)
        D = np.empty((d, l, l))
        for a in range(d):
            for i in range(l):
                for j in range(l):
                    u, v = X[i:i+w, a], X[j:j+w, a]
                    if normalize:
                        su, sv = u.std(), v.std()
                        uz = (u - u.mean()) / su if su > 1e-14 else None
                        vz = (v - v.mean()) / sv if sv > 1e-14 else None
                        if uz is None and vz is None:
                            D[a, i, j] = 0.0
                        elif uz is None or vz is None:
                            D[a, i, j] = math.sqrt(w)
                        else:
                            D[a, i, j] = np.sqrt(((uz - vz) ** 2).sum())
                    else:
                        D[a, i, j] = (np.abs(u - v) ** p).sum() ** (1.0 / p)
        for i in range(l):
            D[:, i, max(0, i - excl):i + excl + 1] = np.inf
        ext = D.max(axis=0)
        mean = D.mean(axis=0)
        return ext.min(axis=1) + mean.min(axis=1)

    for normalize, p in [(False, 2.0), (False, 1.5), (True, 2.0)]:
        got = mstump_profile_sum(X, 10, normalize=normalize, p=p)
        want = naive(X, 10, normalize, p)
        np.testing.assert_allclose(got, want, atol=1e-8)


def test_quantile_summary_cdf_contract(spark, long_form):
    """For every value: |est_cdf - true_cdf| <= err, Σ weight = count,
    <= m rows per bucket; and the read-off quantile's true rank is
    within err of its target."""
    import numpy as np
    from dtaianomaly_spark.rollup.qsummary import (
        quantile_summary, summary_quantile,
    )

    m = 8
    summ = quantile_summary(long_form, fine_ticks=16, factor=4, m=m)
    rows = summ.collect()
    assert rows
    raw = {}
    for r in long_form.select(
        "doc_id", (F.col("pos") / 64).cast("long").alias("bucket"), "value"
    ).collect():
        raw.setdefault((r.doc_id, r.bucket), []).append(r.value)
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault((r.doc_id, r.bucket), []).append(
            (r.value, r.weight, r.err)
        )
    assert set(by_bucket) == set(raw)
    for key, items in by_bucket.items():
        vals = np.sort(np.asarray(raw[key]))
        assert len(items) <= m
        err = items[0][2]
        assert all(it[2] == err for it in items)
        assert sum(w for _, w, _ in items) == len(vals)
        svals = np.array(sorted(v for v, _, _ in items))
        wmap = dict((v, 0) for v, _, _ in items)
        for v, w, _ in items:
            wmap[v] += w
        for probe in np.unique(np.concatenate([svals, vals[::3]])):
            true = int((vals <= probe).sum())
            est = sum(w for v, w in wmap.items() if v <= probe)
            assert abs(true - est) <= err, (key, probe, true, est, err)

    # p50 read-off: true rank of the reported value within err of target
    p50 = summary_quantile(summ, 1, 2).collect()
    for r in p50:
        vals = np.sort(np.asarray(raw[(r.doc_id, r.bucket)]))
        target = (len(vals) + 1) // 2
        true_rank = int((vals <= r.q_value).sum())
        assert abs(true_rank - target) <= r.err, (r, target, true_rank)


# ------------------------------------------------- property-based skew asof

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAS_HYPOTHESIS = False


if _HAS_HYPOTHESIS:
    _row = st.tuples(
        st.one_of(st.none(), st.integers(0, 2)),       # key (incl. NULL)
        st.integers(-5, 120),                          # ts
        st.one_of(st.none(), st.integers(-9, 9)),      # build value
    )

    @settings(
        max_examples=8, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        build_rows=st.lists(_row, min_size=0, max_size=25),
        probe_rows=st.lists(_row, min_size=1, max_size=25),
        direction=st.sampled_from(["backward", "forward"]),
        tolerance=st.sampled_from([None, 7]),
        width=st.sampled_from([8, 32]),
    )
    def test_asof_skew_equivalence_property(
        spark, build_rows, probe_rows, direction, tolerance, width
    ):
        """Randomized frames (NULL keys, NULL build values, duplicate
        timestamps, ties on bucket edges): skew variant == plain."""
        from dtaianomaly_spark.operators.temporal_joins import asof_join_skew

        build = spark.createDataFrame(
            [(k, t, i, v) for i, (k, t, v) in enumerate(build_rows)],
            "k long, t long, bid long, bv long",
        )
        probe = spark.createDataFrame(
            [(k, t, 1000 + i) for i, (k, t, _) in enumerate(probe_rows)],
            "k long, t long, pid long",
        )
        ref = asof_join(
            probe, build, on="k", ts="t", build_cols=["bv"],
            order_col="bid", prefix="m_", direction=direction,
            tolerance=tolerance,
        )
        got = asof_join_skew(
            probe, build, on="k", ts="t", build_cols=["bv"],
            order_col="bid", prefix="m_", direction=direction,
            tolerance=tolerance, bucket_width=width,
        )
        assert _rows(got, "pid", "m_t", "m_bv") == _rows(ref, "pid", "m_t", "m_bv")


# ------------------------------------------------------ count-min tier

def test_countmin_merge_equals_direct_and_overestimates(spark, long_form):
    from dtaianomaly_spark.rollup.tiers import (
        countmin_estimate, countmin_rollup,
    )

    cms = countmin_rollup(long_form, fine_ticks=16, factor=4)
    direct = countmin_rollup(long_form, fine_ticks=64, factor=1)
    cols = ("doc_id", "bucket", "row", "cell", "ccnt")
    # the sketch is a commutative monoid: fine->coarse cell-wise sums
    # equal the sketch built at coarse granularity directly
    assert _rows(cms, *cols) == _rows(direct, *cols)
    # mass invariant: every row of the grid holds the bucket's count
    bucket_n = {
        (r["doc_id"], r["bucket"]): r["n"]
        for r in long_form.groupBy(
            "doc_id", (F.col("pos") / 64).cast("long").alias("bucket")
        ).agg(F.count("*").alias("n")).collect()
    }
    row_mass = {}
    for r in cms.collect():
        k = (r["doc_id"], r["bucket"], r["row"])
        row_mass[k] = row_mass.get(k, 0) + r["ccnt"]
    for (d, b, _), m in row_mass.items():
        assert m == bucket_n[(d, b)]
    assert {k[2] for k in row_mass} == {0, 1, 2, 3}
    # point queries: est >= true for EVERY present value (one-sided
    # Count-Min guarantee), and est <= bucket total trivially
    truth = long_form.groupBy(
        "doc_id", (F.col("pos") / 64).cast("long").alias("bucket"), "value"
    ).agg(F.count("*").cast("long").alias("cnt"))
    est = countmin_estimate(cms, truth).collect()
    assert len(est) > 100
    for r in est:
        assert r["cnt"] <= r["est"] <= bucket_n[(r["doc_id"], r["bucket"])]
    # absent value: estimate is bounded by the bucket total too
    absent = truth.select("doc_id", "bucket").distinct().withColumn(
        "value", F.lit(10 ** 12)
    )
    for r in countmin_estimate(cms, absent).collect():
        assert 0 <= r["est"] <= bucket_n[(r["doc_id"], r["bucket"])]
    with pytest.raises(ValueError, match="depth/width"):
        countmin_rollup(long_form, depth=0)


def test_bloom_merge_equals_direct_and_no_false_negatives(spark, long_form):
    import hashlib

    from dtaianomaly_spark.rollup.tiers import (
        BLOOM_BITS, BLOOM_K, bloom_contains, bloom_rollup,
    )

    bl = bloom_rollup(long_form, fine_ticks=16, factor=4)
    direct = bloom_rollup(long_form, fine_ticks=64, factor=1)
    cols = ("doc_id", "bucket", "bit")
    # a Bloom filter of a union of sets is the OR of the filters: the
    # fine->coarse union equals the filter built at coarse granularity
    assert _rows(bl, *cols) == _rows(direct, *cols)
    # byte-equality vs the plain-Python twin of the md5 bit family
    truth = long_form.groupBy(
        "doc_id", (F.col("pos") / 64).cast("long").alias("bucket"), "value"
    ).agg(F.count("*").cast("long").alias("cnt")).persist()
    want = set()
    for r in truth.collect():
        for i in range(BLOOM_K):
            want.add((
                r["doc_id"], r["bucket"],
                int(hashlib.md5(
                    f"{r['value']}|b{i}".encode()
                ).hexdigest()[:15], 16) % BLOOM_BITS,
            ))
    assert set(_rows(bl, *cols)) == want
    # no false negatives: EVERY truly present value probes maybe=true
    probed = bloom_contains(bl, truth).collect()
    assert len(probed) > 100
    for r in probed:
        assert r["maybe"] and 1 <= r["n_bits"] <= BLOOM_K
        assert r["n_hit"] == r["n_bits"]
    # absent probes can only over-admit; with values far outside the
    # domain at this fill ratio, at least one must be rejected
    absent = truth.select("doc_id", "bucket").distinct().withColumn(
        "value", (F.crc32(F.concat_ws("|", "doc_id", "bucket")) + 10 ** 12)
    )
    rej = bloom_contains(bl, absent).filter("NOT maybe")
    assert rej.count() > 0
    with pytest.raises(ValueError, match="m_bits/k"):
        bloom_rollup(long_form, m_bits=0)
    truth.unpersist()


def test_kmv_merge_equals_direct_exactness_and_twin(spark, long_form):
    import hashlib

    from dtaianomaly_spark.rollup.tiers import (
        KMV_M, kmv_agg, kmv_rollup,
    )

    k = 64
    kmv = kmv_rollup(long_form, fine_ticks=16, factor=4, k=k)
    direct = kmv_rollup(long_form, fine_ticks=64, factor=1, k=k)
    cols = ("doc_id", "bucket", "kmin", "ndv_est", "exact")

    def rows(df):
        return sorted(
            (r["doc_id"], r["bucket"], tuple(r["kmin"]), r["ndv_est"],
             r["exact"])
            for r in df.collect()
        )

    # union-take-k of the fine sketches IS the coarse sketch
    assert rows(kmv) == rows(direct)

    # plain-Python twin: same md5 hashes, same take-k, same IEEE divide
    truth: dict = {}
    for r in long_form.collect():
        truth.setdefault((r["doc_id"], r["pos"] // 64), set()).add(r["value"])
    want = []
    for (d, b), vals in truth.items():
        hs = sorted(
            int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
            for v in vals
        )
        kmin = tuple(hs[:k])
        est = (
            float(len(kmin)) if len(kmin) < k
            else float(k - 1) / (float(kmin[-1]) / float(KMV_M))
        )
        want.append((d, b, kmin, est, len(kmin) < k))
    assert rows(kmv) == sorted(want)

    # exact flag: sketch == full hash set and ndv_est == true NDV
    for d, b, kmin, est, exact in want:
        if exact:
            assert est == len(truth[(d, b)])
        else:
            assert abs(est - len(truth[(d, b)])) / len(truth[(d, b)]) < 0.5

    # kmv_agg on a tiny-domain key is exact and ordered
    small = kmv_agg(
        long_form.select("doc_id", (F.abs("value") % 3).alias("value")),
        ["doc_id"], "value", k,
    ).collect()
    for r in small:
        assert r["exact"] and r["ndv_est"] == len(r["kmin"])
        assert len(r["kmin"]) <= 3
        assert list(r["kmin"]) == sorted(r["kmin"])
    with pytest.raises(ValueError, match="k must be"):
        kmv_agg(long_form, ["doc_id"], "value", 1)


# ------------------------------------------------------ ddsketch tier

def test_ddsketch_merge_direct_twin_and_quantile_guarantee(spark, long_form):
    from dtaianomaly_spark.rollup.tiers import (
        dd_boundaries, dd_bounds_py, dd_index_py,
        ddsketch_quantile, ddsketch_rollup,
    )

    bounds = dd_boundaries()
    dd = ddsketch_rollup(long_form, fine_ticks=16, factor=4)
    direct = ddsketch_rollup(long_form, fine_ticks=64, factor=1)
    cols = ("doc_id", "bucket", "sidx", "dcnt")
    # commutative monoid: fine->coarse index-wise sums == direct coarse
    assert _rows(dd, *cols) == _rows(direct, *cols)
    # index map is the plain-Python twin, bit-for-bit, on every distinct
    # corpus value (negative, zero and positive stores all exercised)
    vals = [r["value"] for r in long_form.select("value").distinct().collect()]
    assert min(vals) < 0 < max(vals)
    from dtaianomaly_spark.rollup.tiers import _dd_sidx_sql
    got = {
        r["value"]: r["sidx"]
        for r in long_form.select("value").distinct().select(
            "value", F.expr(_dd_sidx_sql("value", bounds)).alias("sidx")
        ).collect()
    }
    assert got == {v: dd_index_py(v, bounds) for v in vals}
    # mass invariant + bounded state: per coarse bucket the sketch holds
    # the full count in <= 2*len(bounds)+1 rows
    per_bucket = {}
    for r in dd.collect():
        k = (r["doc_id"], r["bucket"])
        n, rows = per_bucket.get(k, (0, 0))
        per_bucket[k] = (n + r["dcnt"], rows + 1)
    truth = {}
    for r in long_form.collect():
        k = (r["doc_id"], r["pos"] // 64)
        truth.setdefault(k, []).append(r["value"])
    assert {k: v[0] for k, v in per_bucket.items()} == {
        k: len(v) for k, v in truth.items()
    }
    assert max(rows for _, rows in per_bucket.values()) <= 2 * len(bounds) + 1
    # quantile read-off: for several ranks, the EXACT r-th smallest value
    # lies in [lo, hi] (DDSketch containment) and the bucket width obeys
    # the integer relative-error pin |hi| * 50 <= |lo| * 51 - 1
    for q_num, q_den in ((0, 1), (1, 2), (19, 20), (1, 1)):
        rows = ddsketch_quantile(dd, q_num, q_den).collect()
        assert {(r["doc_id"], r["bucket"]) for r in rows} == set(truth)
        for r in rows:
            xs = sorted(truth[(r["doc_id"], r["bucket"])])
            rank = q_num * (len(xs) - 1) // q_den + 1
            assert r["n"] == len(xs) and r["rank"] == rank
            assert r["lo"] <= xs[rank - 1] <= r["hi"]
            lo, hi = dd_bounds_py(r["sidx"], bounds)
            assert (r["lo"], r["hi"]) == (lo, hi)
            if r["sidx"] != 0:
                assert abs(r["hi"] if r["sidx"] > 0 else r["lo"]) * 50 \
                    <= abs(r["lo"] if r["sidx"] > 0 else r["hi"]) * 51 - 1
    with pytest.raises(ValueError, match="q_num"):
        ddsketch_quantile(dd, 3, 2)
    with pytest.raises(ValueError, match="vmax"):
        dd_boundaries(0)


def test_entropy_rollup_twin_and_identities(spark, long_form):
    import math

    from dtaianomaly_spark.rollup.tiers import entropy_rollup

    got = {
        (r["doc_id"], r["bucket"]): (r["n"], r["ndv"], r["entropy"])
        for r in entropy_rollup(long_form, 64).collect()
    }
    truth = {}
    for r in long_form.collect():
        truth.setdefault((r["doc_id"], r["pos"] // 64), []).append(r["value"])
    assert set(got) == set(truth)
    for k, vals in truth.items():
        counts = {}
        for v in vals:
            counts[v] = counts.get(v, 0) + 1
        # the same sorted fold, in Python
        clnc = 0.0
        for v in sorted(counts):
            clnc += float(counts[v]) * math.log(float(counts[v]))
        h = math.log(len(vals)) - clnc / len(vals)
        n, ndv, ent = got[k]
        assert (n, ndv) == (len(vals), len(counts))
        # ln is not correctly-rounded; engines may differ in the last ulp
        assert abs(ent - h) < 1e-12, k
        assert -1e-12 <= ent <= math.log(ndv) + 1e-12
    # identities: constant bucket -> 0; uniform bucket -> ln(ndv)
    const = spark.createDataFrame(
        [("c", p, 7) for p in range(64)]
        + [("u", p, p % 16) for p in range(64)],
        "doc_id string, pos long, value long",
    )
    rows = {r["doc_id"]: r for r in entropy_rollup(const, 64).collect()}
    assert abs(rows["c"]["entropy"]) < 1e-12
    assert abs(rows["u"]["entropy"] - math.log(16)) < 1e-12
