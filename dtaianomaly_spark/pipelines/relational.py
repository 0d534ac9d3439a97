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


def q6_forecast_revenue(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q6 shape: forecast-revenue-change — one ship-year of
    discounted small-quantity items, no joins at all. The whole query
    is predicates + a scalar aggregate, so the physical story IS the
    scan: all three filters (date range, discount band, quantity cap)
    reach the parquet reader as PushedFilters → row-group min/max
    skipping, and the aggregate is a map-side partial + 1-row final.
    At 100 TB this is the cheapest query in the suite — it reads only
    the row groups the date range admits and only 4 columns.

    Revenue here is TPC-H's ``extendedprice * discount`` (the revenue
    GAINED by dropping the discount), exact in cents x basis points.
    Discount band [0.02, 0.04] is compared in integer cents — the
    floor(*100) quantization shared with the DuckDB oracle."""
    f = lineitem.filter(
        F.expr(
            "l_shipdate >= TIMESTAMP_NTZ'1996-01-01 00:00:00'"
            " AND l_shipdate < TIMESTAMP_NTZ'1997-01-01 00:00:00'"
        )
        & F.expr("CAST(floor(l_discount * 100) AS BIGINT) BETWEEN 2 AND 4")
        & F.expr("CAST(floor(l_quantity * 100) AS BIGINT) < 2400")
    )
    return f.agg(
        F.sum(
            F.expr(
                "CAST(floor(l_extendedprice * 100) AS BIGINT)"
                " * CAST(floor(l_discount * 100) AS BIGINT)"
            )
        ).alias("revenue"),
        F.count("*").cast("long").alias("n_items"),
    )


def q4_priority_semi(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q4 shape: order-priority checking — orders from one
    quarter having AT LEAST ONE flagged line item, counted by priority.
    The reference predicate (l_commitdate < l_receiptdate) needs
    columns this schema omits, so the flag is l_returnflag = 'R'
    (a returned line) — the JOIN SHAPE is the point: an EXISTS
    subquery planned as a LEFT SEMI join, the one join type the rest
    of the relational suite doesn't exercise. The semi join needs only
    l_orderkey from the build side (duplicate order keys are collapsed
    by the semi-join semantics — no pre-distinct needed, the hash set
    dedups), the quarter filter pushes to the orders scan, and the
    final aggregate is 5 groups."""
    ords = orders.filter(
        F.expr(
            "o_orderdate >= TIMESTAMP_NTZ'1996-01-01 00:00:00'"
            " AND o_orderdate < TIMESTAMP_NTZ'1996-04-01 00:00:00'"
        )
    ).select("o_orderkey", "o_orderpriority")
    flagged = lineitem.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        ords.join(flagged, ords.o_orderkey == flagged.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("order_count"))
    )


def q8_market_share(
    region: DataFrame, nation: DataFrame, customer: DataFrame,
    supplier: DataFrame, orders: DataFrame, lineitem: DataFrame,
    part: DataFrame, region_name: str = "ASIA",
    supp_nation: str = "NATION_2", part_type: str = "STANDARD",
) -> DataFrame:
    """TPC-H Q8 shape: national market share — for one part type sold
    into one region's customer base, the fraction of revenue supplied
    by one nation, per order year. The share is a ratio of two exact
    int64 cent sums (numerator = revenue from the target supplier
    nation, denominator = all revenue), so the one float divide is a
    shared formula the oracle reproduces bit-for-bit.

    Physical shape: part (type filter), supplier→nation flag map and
    the region's customer key set are all broadcasts folded against a
    single lineitem pass; the only fact-side shuffle is lineitem ↔
    orders on the order key (bucketed/sort-merge at scale, AQE
    broadcast at bench scale), then a per-year aggregate of a handful
    of rows."""
    pk = part.filter(F.col("p_type") == part_type).select("p_partkey")
    sflag = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).select(
        "s_suppkey",
        F.expr(f"CASE WHEN n_name = '{supp_nation}' THEN 1 ELSE 0 END")
        .cast("long").alias("is_target"),
    )
    cust = customer.join(
        F.broadcast(
            nation.join(
                F.broadcast(region.filter(F.col("r_name") == region_name)),
                nation.n_regionkey == region.r_regionkey,
            ).select("n_nationkey")
        ),
        customer.c_nationkey == F.col("n_nationkey"),
    ).select("c_custkey")
    ords = orders.select(
        "o_orderkey", "o_custkey",
        F.expr(
            "CAST(date_format(CAST(o_orderdate AS TIMESTAMP), 'yyyy') AS BIGINT)"
        ).alias("o_year"),
    ).join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
    li = (
        lineitem.select("l_orderkey", "l_partkey", "l_suppkey",
                        F.expr(_REVENUE).alias("rev"))
        .join(F.broadcast(pk), F.col("l_partkey") == pk.p_partkey)
        .join(F.broadcast(sflag), F.col("l_suppkey") == sflag.s_suppkey)
    )
    g = (
        li.join(ords, F.col("l_orderkey") == ords.o_orderkey)
        .groupBy("o_year")
        .agg(
            F.sum(F.expr("rev * is_target")).alias("target_revenue"),
            F.sum("rev").alias("total_revenue"),
            F.count("*").cast("long").alias("n_items"),
        )
    )
    return g.select(
        "o_year", "target_revenue", "total_revenue", "n_items",
        F.expr(
            "CAST(target_revenue AS DOUBLE) / total_revenue"
        ).alias("mkt_share"),
    )


def q14_promo_effect(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q14 shape: promotion effect — the percentage of one ship
    year's revenue carried by PROMO-type parts. Part is the only join
    (broadcast; two columns survive pruning), the date filter pushes to
    the lineitem scan, and both sums are exact int64 so the percentage
    is one shared float formula. A 1-row result: the canonical
    KPI-query plan (scan → broadcast probe → 1-row aggregate)."""
    li = lineitem.filter(
        F.expr(
            "l_shipdate >= TIMESTAMP_NTZ'1996-01-01 00:00:00'"
            " AND l_shipdate < TIMESTAMP_NTZ'1997-01-01 00:00:00'"
        )
    ).select("l_partkey", F.expr(_REVENUE).alias("rev"))
    pt = part.select(
        "p_partkey",
        F.expr("CASE WHEN p_type = 'PROMO' THEN 1 ELSE 0 END")
        .cast("long").alias("is_promo"),
    )
    g = li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey).agg(
        F.sum(F.expr("rev * is_promo")).alias("promo_revenue"),
        F.sum("rev").alias("total_revenue"),
        F.count("*").cast("long").alias("n_items"),
    )
    return g.select(
        "promo_revenue", "total_revenue", "n_items",
        F.expr(
            "CAST(100 AS DOUBLE) * promo_revenue / total_revenue"
        ).alias("promo_pct"),
    )


def q15_top_supplier(supplier: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q15 shape: top supplier — the supplier(s) whose one-quarter
    revenue equals the maximum over all suppliers. The reference nests
    a view used twice (once aggregated to MAX, once probed); here the
    per-supplier aggregate is computed ONCE and the 1-row MAX scalar
    broadcast-joins back against it — the revenue view is shared, not
    recomputed, which is exactly how the view-based SQL plans on a
    warehouse engine with CTE reuse. Revenue exact int64; ties (all
    suppliers matching the max) all return, ordered by s_suppkey."""
    li = lineitem.filter(
        F.expr(
            "l_shipdate >= TIMESTAMP_NTZ'1996-01-01 00:00:00'"
            " AND l_shipdate < TIMESTAMP_NTZ'1996-04-01 00:00:00'"
        )
    ).select("l_suppkey", F.expr(_REVENUE).alias("rev"))
    per_supp = li.groupBy("l_suppkey").agg(
        F.sum("rev").alias("total_revenue"),
        F.count("*").cast("long").alias("n_items"),
    )
    # lazy localCheckpoint: the scalar-max branch and the probe branch
    # both read the materialized per-supplier aggregate (100 rows at
    # any scale bounded by |supplier|), not two passes over lineitem
    per_supp = per_supp.localCheckpoint(eager=False)
    mx = per_supp.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        per_supp.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "total_revenue", "n_items")
    )


def q17_small_quantity(lineitem: DataFrame, part: DataFrame,
                       brand: str = "Brand#4") -> DataFrame:
    """TPC-H Q17 shape: small-quantity-order revenue — average yearly
    revenue lost if orders below 20%% of a part's average order
    quantity were not taken. The correlated subquery
    (l_quantity < 0.2 * avg(l_quantity) per part) decorrelates into a
    per-part aggregate joined back to the fact rows; the 20%% cutoff is
    compared in EXACT integers (5 * qty_cents * cnt < sum_qty_cents ⟺
    qty < 0.2 * avg), so no float enters until the final /7.0 — both
    sides of the oracle share every formula bit-for-bit.

    Physical: the per-part quantity stats aggregate over the
    brand-filtered keys only (broadcast semi of the part keys BEFORE
    the agg — at 100 TB you never aggregate all parts to probe one
    brand), then a self-join of two brand-pruned streams on partkey."""
    pk = part.filter(F.col("p_brand") == brand).select("p_partkey")
    li = lineitem.select(
        "l_partkey",
        F.expr(_CENTS.format(col="l_quantity")).alias("qty_cents"),
        F.expr(_CENTS.format(col="l_extendedprice")).alias("price_cents"),
    ).join(F.broadcast(pk), F.col("l_partkey") == pk.p_partkey, "left_semi")
    stats = li.groupBy("l_partkey").agg(
        F.sum("qty_cents").alias("sum_qty_cents"),
        F.count("*").cast("long").alias("cnt"),
    )
    small = li.join(stats, "l_partkey").filter(
        F.expr("5 * qty_cents * cnt < sum_qty_cents")
    )
    g = small.agg(
        F.sum("price_cents").alias("total_price_cents"),
        F.count("*").cast("long").alias("n_items"),
    )
    return g.select(
        "total_price_cents", "n_items",
        F.expr(
            "CAST(total_price_cents AS DOUBLE) / CAST(700 AS DOUBLE)"
        ).alias("avg_yearly"),
    )


def q19_disjunctive(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19 shape: discounted revenue under an OR-of-ANDs predicate
    — three (brand, size range, quantity band) branches. The point is
    the PLAN under disjunction: the quantity bounds (union of the three
    bands, qty ∈ [1, 30]) and the part-side brand/size disjunction each
    still prune their own scans, and the per-branch conjunctions
    evaluate post-join on the broadcast probe. Container/shipmode
    columns don't exist in this schema; brand x size x quantity keeps
    the three-branch disjunctive structure. Quantity compared in exact
    cents."""
    pt = part.filter(
        (F.col("p_brand").isin("Brand#4", "Brand#2", "Brand#19"))
        & (F.col("p_size") >= 1) & (F.col("p_size") <= 15)
    ).select("p_partkey", "p_brand", "p_size")
    li = lineitem.select(
        "l_partkey",
        F.expr(_CENTS.format(col="l_quantity")).alias("qty_cents"),
        F.expr(_REVENUE).alias("rev"),
    ).filter(F.expr("qty_cents BETWEEN 100 AND 3000"))
    cond = (
        "(p_brand = 'Brand#4' AND p_size <= 5"
        " AND qty_cents BETWEEN 100 AND 1100)"
        " OR (p_brand = 'Brand#2' AND p_size <= 10"
        " AND qty_cents BETWEEN 1000 AND 2000)"
        " OR (p_brand = 'Brand#19' AND p_size <= 15"
        " AND qty_cents BETWEEN 2000 AND 3000)"
    )
    return (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .filter(F.expr(cond))
        .agg(
            F.sum("rev").alias("revenue"),
            F.count("*").cast("long").alias("n_items"),
        )
    )


def q22_no_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q22 shape: global sales opportunity — customers with
    above-average positive balances and NO RECENT order (none since
    1999 — this synthetic corpus gives every customer SOME order, so
    the dormancy window keeps the predicate non-vacuous; the schema
    has no phone country codes, so grouping is by market segment).
    Two decorrelated pieces: the scalar average over positive balances
    becomes a 1-row broadcast compared in EXACT integers
    (acctbal_cents * n_pos > sum_pos_cents ⟺ acctbal > avg), and the
    NOT EXISTS becomes a LEFT ANTI join against the recent-order
    customer keys — the anti-join completing the semi/anti pair with
    Q4. At 100 TB the anti join is the one real shuffle (customer ↔
    date-pruned order keys); the scalar side is two int64 aggregates
    broadcast as one row."""
    bal = customer.select(
        "c_custkey", "c_mktsegment",
        F.expr(_CENTS.format(col="c_acctbal")).alias("acctbal_cents"),
    )
    pos = bal.filter(F.col("acctbal_cents") > 0).agg(
        F.sum("acctbal_cents").alias("sum_pos_cents"),
        F.count("*").cast("long").alias("n_pos"),
    )
    rich = bal.crossJoin(F.broadcast(pos)).filter(
        F.expr("acctbal_cents * n_pos > sum_pos_cents")
    )
    recent = orders.filter(
        F.expr("o_orderdate >= TIMESTAMP_NTZ'1999-01-01 00:00:00'")
    ).select("o_custkey")
    never = rich.join(
        recent, rich.c_custkey == F.col("o_custkey"), "left_anti"
    )
    g = never.groupBy("c_mktsegment").agg(
        F.count("*").cast("long").alias("numcust"),
        F.sum("acctbal_cents").alias("totacctbal_cents"),
    )
    return g.select(
        "c_mktsegment", "numcust", "totacctbal_cents",
        F.expr(
            "CAST(totacctbal_cents AS DOUBLE) / numcust"
        ).alias("avg_acctbal_cents"),
    )


def running_month_share(orders: DataFrame) -> DataFrame:
    """Cumulative-window analytics over the month rollup: per order
    status, the month's exact revenue cents, the RUNNING cumulative
    revenue since the start of history (an unbounded-preceding window
    over the bounded month grid), and the month's share of its
    calendar year — the year-to-date dashboard shape the suite's other
    relational queries don't exercise (cumulative frame + two-level
    ratio). All sums exact int64; the two ratios shared float
    formulas.

    Scale shape: ONE hash aggregate over orders to the (month, status)
    grid (map-side combined — months × statuses is bounded), then
    windows/joins on that tiny grid only."""
    g = orders.groupBy(
        F.expr(
            "CAST(date_format(CAST(o_orderdate AS TIMESTAMP), 'yyyyMM')"
            " AS BIGINT)"
        ).alias("month"),
        "o_orderstatus",
    ).agg(
        F.sum(F.expr(_CENTS.format(col="o_totalprice"))).alias("rev"),
        F.count("*").cast("long").alias("n_orders"),
    )
    w_run = (
        Window.partitionBy("o_orderstatus").orderBy("month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_year = Window.partitionBy("o_orderstatus", F.expr("month DIV 100"))
    return g.select(
        "month", "o_orderstatus", "rev", "n_orders",
        F.sum("rev").over(w_run).alias("run_rev"),
        F.sum("rev").over(w_year).alias("year_rev"),
    ).select(
        "month", "o_orderstatus", "rev", "n_orders", "run_rev",
        "year_rev",
        F.expr("CAST(rev AS DOUBLE) / year_rev").alias("share_of_year"),
    )


def status_year_rollup(orders: DataFrame) -> DataFrame:
    """Multi-granularity aggregate via SQL ROLLUP — the construct the
    engine's tier system generalizes, exercised in its native
    relational form: order counts + exact cent sums at (status, year),
    (status) and () granularities in ONE pass (Spark plans an Expand +
    single hash aggregate; no re-scan per level). ``lvl`` is the
    grouping-set id (0 = finest), NULL dimension values mark rolled-up
    levels, exactly as GROUPING SETS defines.

    Output: (o_orderstatus, o_year, lvl, n_orders, sum_price_cents,
    avg_price) — integers + the one shared float mean."""
    g = orders.select(
        "o_orderstatus",
        F.expr(
            "CAST(date_format(CAST(o_orderdate AS TIMESTAMP), 'yyyy')"
            " AS BIGINT)"
        ).alias("o_year"),
        F.expr(_CENTS.format(col="o_totalprice")).alias("cents"),
    ).rollup("o_orderstatus", "o_year").agg(
        F.expr("CAST(grouping_id() AS BIGINT)").alias("lvl"),
        F.count("*").cast("long").alias("n_orders"),
        F.sum("cents").alias("sum_price_cents"),
    )
    return g.select(
        "o_orderstatus", "o_year", "lvl", "n_orders", "sum_price_cents",
        F.expr(
            "CAST(sum_price_cents AS DOUBLE) / n_orders"
        ).alias("avg_price"),
    )
