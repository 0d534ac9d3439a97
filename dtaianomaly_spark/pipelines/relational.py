"""Relational analytics over the TPC-H-ish star schema — the engine's
general SQL surface, expressed Spark-first so Catalyst proves the
physical story: dimension joins BROADCAST (customer/nation/region are
tiny next to lineitem), filters and column pruning push into the
parquet scans (check PushedFilters/ReadSchema in PLANS.md), and every
aggregate runs map-side partial first.

Exactness discipline (see SNIPPETS/oracle rules): money/quantity
doubles are quantized to integer cents (``floor(x * 100)``) BEFORE any
aggregation, so sums are exact int64 and the derived averages are one
shared float formula; timestamp FILTERS compare the raw TIMESTAMP_NTZ
column against an NTZ literal (pushes to the parquet scan — row-group
skipping; enforced by tests/test_plan_hygiene.py) while timestamp
OUTPUT columns use ``unix_micros(CAST(ts AS TIMESTAMP))`` == DuckDB
``epoch_us(ts)``; the two forms agree at every boundary (monotone
bijection, session tz UTC).

At 100 TB: lineitem is the fact table — everything here is one pass
over it with broadcast hash joins (no shuffle on the fact side except
the final aggregate), which is exactly the plan the same SQL gets on a
warehouse-scale cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_CENTS = "CAST(floor({col} * 100) AS BIGINT)"
_REVENUE = (
    "CAST(floor(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(floor(l_discount * 100) AS BIGINT))"
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q1_pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1 shape: shipped-before cutoff, grouped pricing summary.
    All sums exact integer cents; averages one shared float formula."""
    # direct TIMESTAMP_NTZ comparison (not unix_micros(CAST(...)), which
    # blocks pushdown): the date predicate reaches the parquet scan as
    # LessThanOrEqual(l_shipdate, ...) -> row-group min/max skipping;
    # boundary-equivalent to the epoch-micros form (monotone bijection)
    filtered = lineitem.filter(
        F.expr("l_shipdate <= TIMESTAMP_NTZ'1998-09-02 00:00:00'")
    )
    agg = filtered.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").cast("long").alias("count_order"),
        F.sum(F.expr(_CENTS.format(col="l_quantity"))).alias("sum_qty"),
        F.sum(F.expr(_CENTS.format(col="l_extendedprice"))).alias("sum_base_price"),
        F.sum(F.expr(_REVENUE)).alias("sum_disc_price"),
        F.sum(
            F.expr(
                f"({_REVENUE}) * (100 + CAST(floor(l_tax * 100) AS BIGINT))"
            )
        ).alias("sum_charge"),
        F.sum(F.expr(_CENTS.format(col="l_discount"))).alias("sum_disc"),
    )
    return agg.select(
        "l_returnflag", "l_linestatus", "count_order",
        "sum_qty", "sum_base_price", "sum_disc_price", "sum_charge",
        F.expr("CAST(sum_qty AS DOUBLE) / count_order").alias("avg_qty"),
        F.expr("CAST(sum_base_price AS DOUBLE) / count_order").alias("avg_price"),
        F.expr("CAST(sum_disc AS DOUBLE) / count_order").alias("avg_disc"),
    )


def q3_top_orders(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
    segment: str = "BUILDING", topn: int = 10,
) -> DataFrame:
    """TPC-H Q3 shape: unshipped-order revenue for one market segment,
    top-N. The segment-filtered customer key set broadcasts; orders
    filter pushes to its scan; the only fact-side shuffle is the final
    per-order aggregate."""
    cust = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    ords = orders.filter(
        F.expr("o_orderdate < TIMESTAMP_NTZ'1995-03-15 00:00:00'")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = lineitem.filter(
        F.expr("l_shipdate > TIMESTAMP_NTZ'1995-03-15 00:00:00'")
    ).select("l_orderkey", F.expr(_REVENUE).alias("rev"))
    joined = (
        li.join(
            F.broadcast(ords.join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy(
            "o_orderkey",
            F.expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))").alias("odate_us"),
            "o_orderpriority",
        )
        .agg(F.sum("rev").alias("revenue"))
    )
    # top-N via sort+limit: Spark plans this as TakeOrderedAndProject
    # (per-partition heaps + driver merge) — the global row_number window
    # would funnel EVERY order through one task. The rank window then
    # runs on the N surviving rows only.
    top = joined.orderBy(F.col("revenue").desc(), F.col("o_orderkey")).limit(topn)
    w = Window.orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
    return top.select(
        "o_orderkey", "revenue", "odate_us", "o_orderpriority",
        F.row_number().over(w).cast("long").alias("rk"),
    )


def q5_region_revenue(
    region: DataFrame, nation: DataFrame, customer: DataFrame,
    orders: DataFrame, lineitem: DataFrame, region_name: str = "ASIA",
) -> DataFrame:
    """TPC-H Q5 shape (supplier leg dropped — this schema's lineitem
    suppliers are unconstrained): per-nation revenue of one region's
    customers. The region→nation→customer dimension chain folds into
    ONE broadcast map against the fact table."""
    dim = (
        customer.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.filter(F.col("r_name") == region_name)),
                    nation.n_regionkey == region.r_regionkey,
                ).select("n_nationkey", "n_name")
            ),
            customer.c_nationkey == F.col("n_nationkey"),
        ).select("c_custkey", "n_name")
    )
    ords = orders.select("o_orderkey", "o_custkey")
    li = lineitem.select("l_orderkey", F.expr(_REVENUE).alias("rev"))
    return (
        li.join(F.broadcast(ords.join(F.broadcast(dim), ords.o_custkey == dim.c_custkey)),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy("n_name")
        .agg(F.sum("rev").alias("revenue"), F.count("*").cast("long").alias("n_items"))
    )


def q7_volume_shipping(
    nation: DataFrame, supplier: DataFrame, customer: DataFrame,
    orders: DataFrame, lineitem: DataFrame,
) -> DataFrame:
    """TPC-H Q7 shape: cross-border shipping volume by (supplier nation,
    customer nation, ship year) — the one query where the SAME dimension
    table (nation) plays two roles against one fact pass. Both nation
    maps and supplier/customer fold into broadcasts; the single
    at-scale shuffle is lineitem↔orders, which on a cluster runs as a
    bucketed/sort-merge pair on the order key (see plans/bucketing.py) —
    at bench scale AQE turns it into a broadcast too. Revenue exact in
    integer cents x basis points, as the whole relational suite."""
    supp_nat = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust_nat = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    li = lineitem.select(
        "l_suppkey", "l_orderkey",
        F.expr(_REVENUE).alias("rev"),
        F.expr(
            "CAST(date_format(CAST(l_shipdate AS TIMESTAMP), 'yyyy') AS BIGINT)"
        ).alias("l_year"),
    )
    return (
        li.join(F.broadcast(supp_nat), li.l_suppkey == supp_nat.s_suppkey)
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust_nat), F.col("o_custkey") == cust_nat.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            F.sum("rev").alias("revenue"),
            F.count("*").cast("long").alias("n_items"),
        )
    )


def order_month_rollup(orders: DataFrame) -> DataFrame:
    """Orders rolled to calendar month (the relational twin of the
    token-tier rollup): counts + exact integer cent sums + shared-float
    mean."""
    g = orders.groupBy(
        F.expr(
            "CAST(date_format(CAST(o_orderdate AS TIMESTAMP), 'yyyyMM') AS BIGINT)"
        ).alias("month"),
        "o_orderstatus",
    ).agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum(F.expr(_CENTS.format(col="o_totalprice"))).alias("sum_price"),
    )
    return g.select(
        "month", "o_orderstatus", "n_orders", "sum_price",
        F.expr("CAST(sum_price AS DOUBLE) / n_orders").alias("avg_price"),
    )


def q10_returned_items(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
    nation: DataFrame, topn: int = 20,
) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer for
    one quarter, top-N. Order-quarter filter pushes to the orders scan,
    the return-flag filter to lineitem; customer+nation fold into one
    broadcast; the fact side shuffles once (per-order aggregate is
    fused into the final customer aggregate). Top-N is sort+limit →
    TakeOrderedAndProject, deterministic tie-break on c_custkey."""
    ords = orders.filter(
        F.expr(
            "o_orderdate >= TIMESTAMP_NTZ'1996-01-01 00:00:00'"
            " AND o_orderdate < TIMESTAMP_NTZ'1996-04-01 00:00:00'"
        )
    ).select("o_orderkey", "o_custkey")
    li = lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", F.expr(_REVENUE).alias("rev")
    )
    cust = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).select(
        "c_custkey", "c_name",
        F.expr(_CENTS.format(col="c_acctbal")).alias("acctbal_cents"),
        F.col("n_name"),
    )
    agg = (
        # quarter-filtered orders: small at bench scale (AQE broadcasts
        # it), a genuine shuffle pair at 100 TB — don't pin a broadcast
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum("rev").alias("revenue"), F.count("*").cast("long").alias("n_items"))
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .select("c_custkey", "c_name", "n_name", "acctbal_cents",
                "revenue", "n_items")
    )
    return agg.orderBy(F.col("revenue").desc(), F.col("c_custkey")).limit(topn)


def q18_large_volume(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
    qty_threshold_cents: int = 25_000, topn: int = 100,
) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold,
    with their customer — the group-then-semi-join pattern (aggregate
    the fact table per order, filter on the AGGREGATE, then enrich).
    The per-order quantity sum is the only fact-side shuffle. The
    HAVING keeps ~1.4%% of orders at this threshold — selective, but a
    fixed FRACTION of a 100 TB orders table is not broadcast-small in
    absolute terms, so the join strategy is left to AQE (runtime stats
    broadcast it exactly when the surviving set really is small) rather
    than pinned. Quantities exact in centi-units. Top-N deterministic:
    (o_totalprice cents DESC, o_orderkey)."""
    qty = (
        lineitem.select(
            "l_orderkey", F.expr(_CENTS.format(col="l_quantity")).alias("qc")
        )
        .groupBy("l_orderkey")
        .agg(F.sum("qc").alias("sum_qty_cents"))
        .filter(F.col("sum_qty_cents") > qty_threshold_cents)
    )
    ords = orders.select(
        "o_orderkey", "o_custkey",
        F.expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))").alias("odate_us"),
        F.expr(_CENTS.format(col="o_totalprice")).alias("totalprice_cents"),
    )
    out = (
        ords.join(qty, ords.o_orderkey == qty.l_orderkey)
        .join(
            F.broadcast(customer.select("c_custkey", "c_name")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("c_custkey", "c_name", "o_orderkey", "odate_us",
                "totalprice_cents", "sum_qty_cents")
    )
    return out.orderBy(
        F.col("totalprice_cents").desc(), F.col("o_orderkey")
    ).limit(topn)
