"""Watermarked event-time windowed aggregate: completed windows must
byte-match the batch minute rollup on the same rows, emit exactly once,
and rows later than the watermark must be dropped."""

import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dtaianomaly_spark.pipelines.events import load_events, minute_rollup
from dtaianomaly_spark.streaming.eventtime import stream_minute_rollup

SF_DIR = "/root/testdata/sf0.001"


def _run_stream(spark, src, tmp_path, tag):
    events_schema = load_events(spark, SF_DIR).schema
    stream = (
        spark.readStream.schema(events_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out_dir = str(tmp_path / f"out_{tag}")
    q = (
        stream_minute_rollup(stream, watermark="2 minutes")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{tag}"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.read.parquet(out_dir)


def test_watermark_rollup_matches_batch(spark, tmp_path):
    ev = load_events(spark, SF_DIR).orderBy("ts").limit(600).cache()
    ev.count()
    src = str(tmp_path / "src")
    # three sequential TIME chunks: watermark advances between batches
    ts_sorted = [r.ts for r in ev.select("ts").orderBy("ts").collect()]
    cut1, cut2 = ts_sorted[200], ts_sorted[400]
    for cond in [ev.ts <= cut1, (ev.ts > cut1) & (ev.ts <= cut2), ev.ts > cut2]:
        ev.filter(cond).coalesce(1).write.mode("append").parquet(src)
        time.sleep(0.05)  # distinct mtimes -> deterministic file order

    got = _run_stream(spark, src, tmp_path, "a")
    # append mode: exactly one row per (event_type, window)
    assert (
        got.groupBy("event_type", "bucket").count().filter("count > 1").count()
        == 0
    )
    # emitted set = batch rollup restricted to the emitted windows; the
    # watermark holds back only windows near the stream head
    batch = minute_rollup(ev)
    emitted_buckets = got.select("bucket").distinct()
    ref = batch.join(emitted_buckets, "bucket", "semi").select(*got.columns)
    diff = got.exceptAll(ref).count() + ref.exceptAll(got).count()
    assert diff == 0
    assert got.count() > 0
    # every window fully below the final watermark emitted
    max_ts = ev.agg(F.max(F.expr("unix_micros(CAST(ts AS TIMESTAMP))"))).first()[0]
    wm_bucket = (max_ts - 2 * 60_000_000) // 60_000_000
    missing = (
        batch.filter(F.col("bucket") < wm_bucket)
        .join(emitted_buckets, "bucket", "anti")
    )
    assert missing.count() == 0
    ev.unpersist()


def test_watermark_drops_late_rows(spark, tmp_path):
    ev = load_events(spark, SF_DIR).orderBy("ts").limit(600).cache()
    ev.count()
    src = str(tmp_path / "src")
    ts_sorted = [r.ts for r in ev.select("ts").orderBy("ts").collect()]
    cut = ts_sorted[300]
    head, tail = ev.filter(ev.ts <= cut), ev.filter(ev.ts > cut)
    head.coalesce(1).write.mode("append").parquet(src)
    time.sleep(0.05)
    tail.coalesce(1).write.mode("append").parquet(src)
    time.sleep(0.05)
    # REPLAY the oldest rows after the watermark has passed them: every
    # row is later than the watermark -> all dropped, no double counts
    head.limit(100).coalesce(1).write.mode("append").parquet(src)

    got = _run_stream(spark, src, tmp_path, "b")
    assert (
        got.groupBy("event_type", "bucket").count().filter("count > 1").count()
        == 0
    )
    # counts match the UN-duplicated batch on emitted windows — the
    # replayed old rows contributed nothing
    batch = minute_rollup(ev)
    ref = (
        batch.join(got.select("bucket").distinct(), "bucket", "semi")
        .select(*got.columns)
    )
    diff = got.exceptAll(ref).count() + ref.exceptAll(got).count()
    assert diff == 0
    assert got.count() > 0
    ev.unpersist()


def test_streamed_funnel_prefix_equals_batch(spark, tmp_path):
    """O(1)-per-user streaming funnel: every per-user snapshot equals a
    pandas replay of the batch MIN-after-previous-step semantics over
    the same prefix, and the FINAL snapshots reproduce the batch
    funnel_conversion KPI row exactly."""
    import numpy as np
    import pandas as pd

    from dtaianomaly_spark.pipelines.events import funnel_conversion
    from dtaianomaly_spark.streaming.eventtime import stateful_funnel

    ev = load_events(spark, SF_DIR).select(
        "user_id", "event_id", "event_type", "ts",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("ts_us"),
    )
    pdf_all = ev.toPandas().sort_values(["ts_us", "event_id"])
    bounds = np.quantile(pdf_all["ts_us"], [0.25, 0.5, 0.75]).astype(
        "int64"
    ).tolist() + [int(pdf_all["ts_us"].max())]
    src = str(tmp_path / "funnel_src")
    lo = -1
    for i, hi in enumerate(bounds):
        chunk = ev.filter(
            (F.col("ts_us") > lo) & (F.col("ts_us") <= hi)
        ).drop("ts_us")
        chunk.coalesce(1).write.mode("append").parquet(src)
        base = 1_600_000_000 + i * 10
        for f in os.listdir(src):
            p = os.path.join(src, f)
            if f.endswith(".parquet"):
                cur = os.stat(p).st_mtime
                if cur > base:  # only stamp the newly written files
                    os.utime(p, (base, base))
        lo = hi
    events_schema = load_events(spark, SF_DIR).schema
    stream = (
        spark.readStream.schema(events_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out_dir = str(tmp_path / "funnel_out")
    q = (
        stateful_funnel(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "funnel_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = spark.read.parquet(out_dir).toPandas()

    def replay(prefix: pd.DataFrame) -> dict:
        steps = {}
        for uid, g in prefix.groupby("user_id"):
            t1 = t2 = t3 = None
            for ts, et in zip(g["ts_us"], g["event_type"]):
                ts = int(ts)
                if t1 is None:
                    if et == "signup":
                        t1 = ts
                elif t2 is None:
                    if et == "click" and ts > t1:
                        t2 = ts
                elif t3 is None:
                    if et == "purchase" and ts > t2:
                        t3 = ts
            steps[int(uid)] = (len(g), t1, t2, t3)
        return steps

    # every snapshot (keyed by the user's cumulative event count)
    # equals the replay of the prefix with that many user events
    for hi in bounds:
        prefix = pdf_all[pdf_all["ts_us"] <= hi]
        expect = replay(prefix)
        snap = out.merge(
            pd.DataFrame(
                [(u, n) for u, (n, *_r) in expect.items()],
                columns=["user_id", "n_seen"],
            ),
            on=["user_id", "n_seen"],
        )
        # a user silent in this chunk has no new emission — compare
        # the users that do have a matching snapshot, require most do
        assert len(snap) >= 0.9 * len(expect)
        for r in snap.itertuples(index=False):
            n, t1, t2, t3 = expect[int(r.user_id)]
            got = tuple(
                None if pd.isna(v) else int(v)
                for v in (r.t1, r.t2, r.t3)
            )
            assert got == (t1, t2, t3), (r.user_id, got, (t1, t2, t3))
    # final snapshots -> KPI row == batch funnel_conversion
    final = out.sort_values("n_seen").groupby("user_id").tail(1)
    kpi = funnel_conversion(load_events(spark, SF_DIR)).collect()[0]
    n1 = int(final["t1"].notna().sum())
    n2 = int(final["t2"].notna().sum())
    n3 = int(final["t3"].notna().sum())
    assert (n1, n2, n3) == (kpi["n_step1"], kpi["n_step2"], kpi["n_step3"])


def test_streamed_rolling_corr_equals_batch(spark, tmp_path):
    """Ring-state streaming rolling Pearson == the batch
    rolling_corr_pairs at every emitted (pair, idx), bit-equal —
    integer window sums recomputed from the ring feed the same shared
    float formula."""
    import numpy as np
    import pandas as pd

    from dtaianomaly_spark.pipelines.events import rolling_corr_pairs
    from dtaianomaly_spark.streaming.eventtime import stateful_rolling_corr

    events = load_events(spark, SF_DIR)
    W = 30  # smaller window: sf0.001's span still yields many windows
    batch = rolling_corr_pairs(events, window_min=W).toPandas()

    # reconstruct the dense pair rows the batch operator windows over
    ev = events.select(
        "event_type",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 60000000").alias("m"),
    ).toPandas()
    ev["c"] = 1
    cnts = ev.groupby(["event_type", "m"]).size().reset_index(name="c")
    mn, mx = int(cnts["m"].min()), int(cnts["m"].max())
    types = sorted(cnts["event_type"].unique())
    idx = np.arange(0, mx - mn + 1, dtype=np.int64)
    dense = {}
    for t in types:
        sub = cnts[cnts["event_type"] == t]
        arr = np.zeros(idx.shape[0], dtype=np.int64)
        arr[(sub["m"].to_numpy() - mn).astype(np.int64)] = sub["c"].to_numpy()
        dense[t] = arr
    rows = []
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            for t in idx:
                rows.append((a, b, int(t), int(dense[a][t]), int(dense[b][t])))
    pdf = pd.DataFrame(
        rows, columns=["a_type", "b_type", "idx", "ca", "cb"]
    )
    schema = "a_type string, b_type string, idx long, ca long, cb long"
    src = str(tmp_path / "rc_src")
    bounds = np.linspace(0, idx.shape[0], 4).astype(int)
    for i, (lo, hi) in enumerate(zip(bounds, bounds[1:])):
        chunk = spark.createDataFrame(
            pdf[(pdf["idx"] >= lo) & (pdf["idx"] < hi)], schema
        )
        chunk.coalesce(1).write.mode("append").parquet(src)
        base = 1_600_000_000 + i * 10
        for f in os.listdir(src):
            p = os.path.join(src, f)
            if f.endswith(".parquet") and os.stat(p).st_mtime > base:
                os.utime(p, (base, base))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out_dir = str(tmp_path / "rc_out")
    q = (
        stateful_rolling_corr(stream, window=W)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "rc_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.read.parquet(out_dir).toPandas()
    assert len(got) == len(batch) > 1000
    gm = {
        (r.a_type, r.b_type, r.idx): r.corr
        for r in got.itertuples(index=False)
    }
    for r in batch.itertuples(index=False):
        g = gm[(r.a_type, r.b_type, r.idx)]
        if r.corr is None or (isinstance(r.corr, float) and np.isnan(r.corr)):
            assert g is None or (isinstance(g, float) and np.isnan(g))
        else:
            assert g == r.corr, ((r.a_type, r.b_type, r.idx), g, r.corr)
