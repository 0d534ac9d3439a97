"""Streaming exact dedup: first occurrence of each content hash wins,
across micro-batch boundaries (state carries the seen-set)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_stream_dedup_across_batches(spark, tmp_path):
    from dtaianomaly_spark.streaming.dedup import stream_exact_dedup

    batch1 = [(1, "alpha text"), (2, "beta text"), (3, "alpha text")]
    batch2 = [(4, "beta text"), (5, "gamma text"), (6, "alpha text")]
    schema = "doc_id long, text string"
    src = str(tmp_path / "src")
    for rows in (batch1, batch2):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out_dir = str(tmp_path / "out")
    q = (
        stream_exact_dedup(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.read.parquet(out_dir).collect()
    texts = sorted(r["text"] for r in got)
    assert texts == ["alpha text", "beta text", "gamma text"]
    # cross-batch duplicate suppression: one row per distinct text
    assert len({r["text_md5"] for r in got}) == 3 == len(got)
