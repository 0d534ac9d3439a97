"""Streaming DQ twin: cumulative per-(source, check) counters must
equal the batch check engine's metrics over every ingested prefix."""

import os
import sys

import numpy as np

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dtaianomaly_spark.pipelines.text import load_docs
from dtaianomaly_spark.streaming.quality import stateful_dq

SF_DIR = "/root/testdata/sf0.001"

CHECKS = [
    ("c_text", "completeness", {"col": "text", "threshold": (1, 1)}),
    ("c_len", "in_range",
     {"col": "n_chars", "expr": "n_chars", "lo": 100, "hi": 100000,
      "threshold": (9, 10)}),
    ("c_lang", "in_set",
     {"col": "lang", "values": ["en", "de", "fr"], "threshold": (1, 2)}),
]


def test_streamed_dq_counters_equal_batch_prefixes(spark, tmp_path):
    docs = load_docs(spark, SF_DIR)
    src = str(tmp_path / "dq_src")
    n = docs.count()
    bounds = np.linspace(0, n, 4).astype(int)
    for i, (lo, hi) in enumerate(zip(bounds, bounds[1:])):
        chunk = docs.filter(
            (F.col("doc_id") >= int(lo)) & (F.col("doc_id") < int(hi))
        )
        chunk.coalesce(1).write.mode("append").parquet(src)
        base = 1_600_000_000 + i * 10
        for f in os.listdir(src):
            p = os.path.join(src, f)
            if f.endswith(".parquet") and os.stat(p).st_mtime > base:
                os.utime(p, (base, base))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out_dir = str(tmp_path / "dq_out")
    q = (
        stateful_dq(stream, CHECKS)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "dq_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = spark.read.parquet(out_dir).toPandas()
    # one snapshot per (source, check) per batch the source appears in
    assert out.n_total.max() > 0 and set(out.check_id) == {
        "c_text", "c_len", "c_lang"
    }
    # FINAL snapshot per (source, check) == batch counters on the full
    # table, computed independently in pandas
    pdf = docs.toPandas()
    final = out.sort_values("n_total").groupby(
        ["source", "check_id"]
    ).tail(1)
    for r in final.itertuples(index=False):
        sub = pdf[pdf["source"] == r.source]
        if r.check_id == "c_text":
            ok = int(sub["text"].notna().sum())
        elif r.check_id == "c_len":
            ok = int(((sub["n_chars"] >= 100)
                      & (sub["n_chars"] <= 100000)).sum())
        else:
            ok = int(sub["lang"].isin(["en", "de", "fr"]).sum())
        assert (r.n_ok, r.n_total) == (ok, len(sub)), r
    # verdict rule is the integer cross-multiplication
    for r in final.itertuples(index=False):
        tn, td = {c[0]: c[2]["threshold"] for c in CHECKS}[r.check_id]
        assert r.passed == (1 if td * r.n_ok >= tn * r.n_total else 0)


def test_streamed_dq_rejects_non_monoid_checks():
    import pytest

    with pytest.raises(ValueError, match="monoid"):
        from dtaianomaly_spark.streaming.quality import _compile_flags

        _compile_flags([("u", "uniqueness", {"col": "x"})])
