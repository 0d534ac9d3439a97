"""Bucketed materialization: a key-matching join over bucketed tables
must plan WITHOUT any Exchange (the co-located-join property the scale
design relies on), and the same join over plain parquet must shuffle —
proving the bucketing, not the data size, removes it."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
