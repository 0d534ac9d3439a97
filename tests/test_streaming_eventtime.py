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
