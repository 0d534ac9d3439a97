"""Online quantile tracker: after chunked ingest, every series' final
estimate must sit within its reported error bound of the exact
quantile over all points seen — and the bound must stay useful (a
small fraction of n) at realistic chunk counts."""

import os
import sys

import numpy as np
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dtaianomaly_spark.sources import corpus as C

SF_DIR = "/root/testdata/sf0.001"


def test_quantile_tracker_within_bound(spark, tmp_path):
    from dtaianomaly_spark.streaming.quantile import stateful_quantile_tracker

    lf = C.token_long_form(spark, SF_DIR).filter(F.col("doc_id") < 60).select(
        F.col("doc_id").cast("string").alias("doc_id"), "pos", "value"
    )
    src = str(tmp_path / "src")
    # four out-of-order chunks: four merges per series
    for cond in ["pos % 4 = 2", "pos % 4 = 0", "pos % 4 = 3", "pos % 4 = 1"]:
        lf.filter(cond).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(lf.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out_dir = str(tmp_path / "out")
    q = (
        stateful_quantile_tracker(stream, m=64, q_num=19, q_den=20)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.read.parquet(out_dir)
    # one estimate per (series, batch that touched it); take the final
    final = {
        r.doc_id: r
        for r in got.orderBy("doc_id", "n_seen").collect()
    }
    truth = {}
    for r in lf.collect():
        truth.setdefault(r.doc_id, []).append(r.value)
    assert set(final) == set(truth)
    for doc_id, r in final.items():
        vals = np.sort(np.asarray(truth[doc_id]))
        n = len(vals)
        assert r.n_seen == n
        target = (n * 19 + 19) // 20
        true_rank = int((vals <= r.q_value).sum())
        assert abs(true_rank - target) <= r.err, (doc_id, true_rank, target, r)
        # the accumulated bound stays useful: < 25% of n at 4 merges
        # with m=64 (state is 64 entries vs n up to ~2k values)
        assert r.err < max(8, n // 4), (doc_id, r.err, n)


def test_fine_summary_rejects_non_integral_floats():
    """Integer-domain contract: integral floats pass (exact cast),
    fractional or non-finite floats raise instead of truncating."""
    import numpy as np
    import pytest

    from dtaianomaly_spark.rollup.qsummary import np_fine_summary

    reps, ws, d = np_fine_summary(np.array([3.0, 1.0, 2.0]), m=2)
    assert reps.tolist() == [2, 3] and ws.tolist() == [2, 1] and d == 1
    with pytest.raises(ValueError, match="integer-domain"):
        np_fine_summary(np.array([1.5, 2.0]), m=2)
    with pytest.raises(ValueError, match="integer-domain"):
        np_fine_summary(np.array([1.0, np.nan]), m=2)
