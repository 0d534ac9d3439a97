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

    q = (
        stateful_bucket_rollup(stream)
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
