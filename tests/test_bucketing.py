"""Bucketed materialization: a key-matching join over bucketed tables
must plan WITHOUT any Exchange (the co-located-join property the scale
design relies on), and the same join over plain parquet must shuffle —
proving the bucketing, not the data size, removes it."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest
from pyspark.sql import functions as F

from dtaianomaly_spark.plans import bucketing as B

SF_DIR = "/root/testdata/sf0.001"


def test_bucketed_join_is_shuffle_free(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")

    # the sf0.001 tables are broadcast-sized; force the shuffle-join
    # planner so the assertion exercises what happens at fact×fact scale
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        _run(spark, li, orders)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def _run(spark, li, orders):

    # baseline: plain parquet join shuffles both sides
    plain = li.join(orders, li.l_orderkey == orders.o_orderkey)
    assert B.exchanges_in_plan(plain) >= 1

    B.write_bucketed(li.withColumnRenamed("l_orderkey", "okey"),
                     "li_bkt", "okey", n_buckets=4)
    B.write_bucketed(orders.withColumnRenamed("o_orderkey", "okey"),
                     "ord_bkt", "okey", n_buckets=4)
    try:
        joined = B.bucketed_join(spark, "li_bkt", "ord_bkt", "okey")
        assert B.exchanges_in_plan(joined) == 0, "bucketed join still shuffles"
        # the result is the same relation
        assert joined.count() == plain.count() > 0

        # bucketed groupBy on the key also skips its shuffle
        agg = spark.table("li_bkt").groupBy("okey").count()
        assert B.exchanges_in_plan(agg) == 0
    finally:
        spark.sql("DROP TABLE IF EXISTS li_bkt")
        spark.sql("DROP TABLE IF EXISTS ord_bkt")


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    """The space-filling-curve contract: against the doc_id-linear
    baseline, the z-ordered layout prunes TIME-slab scans by ~sqrt
    instead of touching every file, while keeping per-series scans far
    below a full scan — and the Morton key matches the plain-Python
    interleave bit-for-bit."""
    from dtaianomaly_spark.plans import zorder as Z

    n_files = 16
    df = spark.range(0, 100).select(
        F.col("id").alias("doc_id"),
        F.explode(F.sequence(F.lit(0), F.lit(63))).alias("bucket"),
    ).withColumn("v", F.col("doc_id") * 64 + F.col("bucket"))

    zp, lp = str(tmp_path / "z"), str(tmp_path / "lin")
    Z.zorder_write(df, zp, "doc_id", "bucket", n_files)
    Z.linear_write(df, lp, "doc_id", n_files)

    # layouts are lossless
    zread = spark.read.parquet(zp)
    assert zread.count() == 6400
    assert zread.exceptAll(df).count() == 0 and df.exceptAll(zread).count() == 0

    zr = Z.file_ranges(spark, zp, "doc_id", "bucket").persist()
    lr = Z.file_ranges(spark, lp, "doc_id", "bucket").persist()
    assert zr.count() == n_files and lr.count() == n_files

    # time-slab scan (all series, bucket in [16, 23]): the linear
    # layout opens every file; z-order opens at most half
    z_time = Z.files_touched(zr, 0, 99, 16, 23)
    l_time = Z.files_touched(lr, 0, 99, 16, 23)
    assert l_time == n_files
    assert z_time <= n_files // 2

    # per-series scan (doc_id in [40, 44], all buckets): linear is
    # near-perfect, z-order stays well below a full scan
    z_doc = Z.files_touched(zr, 40, 44, 0, 63)
    l_doc = Z.files_touched(lr, 40, 44, 0, 63)
    assert l_doc <= 2
    assert z_doc <= n_files // 2

    # Morton key: bit-equality vs the python twin
    got = spark.sql(
        f"SELECT {Z.morton_expr('41', '7')} AS m"
    ).collect()[0]["m"]

    def spread(x):
        for sh, m in Z._SPREAD_STEPS:
            x = (x | (x << sh)) & m
        return x

    assert got == (spread(41) | (spread(7) << 1))

    # out-of-range keys fail the write instead of corrupting the curve
    bad = spark.range(1).select(
        (F.col("id") - 1).alias("doc_id"), F.lit(0).alias("bucket")
    )
    with pytest.raises(Exception, match="zorder key out of range"):
        Z.zorder_write(bad, str(tmp_path / "bad"), "doc_id", "bucket", 2)
    zr.unpersist(); lr.unpersist()
