"""applyInPandasWithState bucket-completion rollup: out-of-order chunked
ingest must converge to the batch rollup's full buckets, with buckets
emitted exactly once."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dtaianomaly_spark.sources import corpus as C

SF_DIR = "/root/testdata/sf0.001"


def test_stateful_rollup_converges_to_batch(spark, tmp_path):
    from dtaianomaly_spark.streaming.stateful import stateful_bucket_rollup

    lf = C.token_long_form(spark, SF_DIR).filter(F.col("doc_id") < 80).select(
        F.col("doc_id").cast("string").alias("doc_id"), "pos", "value"
    )
    src = str(tmp_path / "src")
    # three position-range chunks written OUT OF ORDER (middle, last, first):
    # a bucket's points can span micro-batches
    for i, cond in enumerate(
        ["pos % 3 = 1", "pos % 3 = 2", "pos % 3 = 0"]
    ):
        lf.filter(cond).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(lf.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out_dir = str(tmp_path / "out")

    # flush_after_ms=None: finite availableNow replay — a pending
    # processing-time timer would keep the micro-batch engine scheduling
    # batches past end-of-data (see stateful_bucket_rollup docstring)
    q = (
        stateful_bucket_rollup(stream, flush_after_ms=None)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.read.parquet(out_dir)
    # exactly-once per bucket
    assert got.groupBy("doc_id", "bucket").count().filter("count > 1").count() == 0

    # batch reference: full (16-point) buckets only — the tail bucket
    # never completes and must NOT have been emitted
    batch = (
        lf.withColumn("bucket", (F.col("pos") / 16).cast("long"))
        .groupBy("doc_id", "bucket")
        .agg(
            F.count("value").alias("cnt"),
            F.sum("value").alias("sum"),
            F.sum(F.col("value") * F.col("value")).alias("sumsq"),
            F.min("value").alias("min"),
            F.max("value").alias("max"),
        )
        .filter("cnt = 16")
    )
    diff = got.exceptAll(batch).count() + batch.exceptAll(got).count()
    assert diff == 0
    assert got.count() == batch.count() > 0


def test_stateful_rollup_flushes_idle_series(spark, tmp_path):
    """With a processing-time flush timeout, an idle series' partial tail
    bucket is emitted (and leaves state) after the timeout elapses."""
    import time

    from dtaianomaly_spark.streaming.stateful import stateful_bucket_rollup

    # doc-a: one full bucket (16 pts) + a 4-point tail that never fills
    rows = [("doc-a", p, p * 3 % 11) for p in range(20)]
    lf = spark.createDataFrame(rows, "doc_id string, pos long, value long")
    src = str(tmp_path / "src")
    lf.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(lf.schema).parquet(src)
    out_dir = str(tmp_path / "out")
    q = (
        stateful_bucket_rollup(stream, flush_after_ms=2000)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        tail = None
        for _ in range(90):
            time.sleep(1)
            try:
                got = spark.read.parquet(out_dir)
                tail_rows = got.filter("cnt < 16").collect()
            except Exception:
                continue
            if tail_rows:
                tail = tail_rows
                break
    finally:
        q.stop()

    assert tail is not None, "tail bucket was never flushed"
    got = spark.read.parquet(out_dir)
    # exactly once per bucket
    assert got.groupBy("doc_id", "bucket").count().filter("count > 1").count() == 0
    vals = {(r["doc_id"], r["bucket"]): r for r in got.collect()}
    full = vals[("doc-a", 0)]
    assert (full["cnt"], full["sum"]) == (16, sum(p * 3 % 11 for p in range(16)))
    part = vals[("doc-a", 1)]
    expect = [p * 3 % 11 for p in range(16, 20)]
    assert (part["cnt"], part["sum"], part["min"], part["max"]) == (
        4, sum(expect), min(expect), max(expect)
    )
