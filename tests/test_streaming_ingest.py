"""Composed streaming ingest: dedup + quality filter + token accounting
must equal the batch pipeline's decisions on the same documents."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_stream_ingest_filters_and_dedups(spark, tmp_path):
    from dtaianomaly_spark.streaming.ingest import stream_ingest

    good = "the quick brown fox jumps over the lazy dog " * 4
    dupe = "another reasonably long document with many words here " * 4
    shorty = "too short"
    numeric = "123 456 789 000 111 " * 20  # digit-heavy -> low quality
    batch1 = [(1, good), (2, dupe), (3, shorty)]
    batch2 = [(4, numeric), (5, dupe), (6, good + "extra tail")]
    src = str(tmp_path / "src")
    for rows in (batch1, batch2):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out_dir = str(tmp_path / "out")
    q = (
        stream_ingest(stream, min_quality=0.3, min_tokens=5)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.read.parquet(out_dir)
    kept = sorted(r["doc_id"] for r in got.collect())
    # doc 3 (short), doc 4 (digit-heavy), doc 5 (duplicate of 2) dropped
    assert kept == [1, 2, 6]
    row = got.filter("doc_id = 1").collect()[0]
    assert row["quality"] >= 0.3 and row["ws_tokens"] >= 5
    # batch twin agrees on the quality decision
    from dtaianomaly_spark.pipelines.text import with_quality

    batch = with_quality(
        spark.createDataFrame(batch1 + batch2, "doc_id long, text string")
    )
    batch_kept = {
        r["doc_id"]
        for r in batch.filter("quality >= 0.3 AND ws_tokens >= 5").collect()
    }
    assert set(kept).issubset(batch_kept)
