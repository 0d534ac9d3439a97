"""Event-stream relational ops over the ``events`` table
(event_id, ts timestamp, user_id, event_type, value double, props).

Timestamps are reduced to exact integer microseconds
(``unix_micros`` / DuckDB ``epoch_us``) before any arithmetic — float
seconds would round differently across engines. ``value`` doubles are
quantized (``floor(value * 1000)``) before summing: double SUM order is
nondeterministic under parallelism, integer SUM is exact and
order-free — the same discipline the rollup tiers use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SESSION_GAP_US = 1800 * 1_000_000  # 30 min


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def sessionize(events: DataFrame, gap_us: int = SESSION_GAP_US) -> DataFrame:
    """Classic gap-based sessionization: a new session starts when the
    time since the user's previous event exceeds the gap. One window
    partitioning (user_id) shared by both passes. Output: per-user
    session/event counts."""
    marked = events.select(
        "user_id", "event_id",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("ts_us"),
    ).withColumn(
        "is_new",
        F.expr(
            f"CASE WHEN ts_us - coalesce(lag(ts_us) OVER (PARTITION BY user_id"
            f" ORDER BY ts_us, event_id), -{2 * gap_us}) > {gap_us}"
            " THEN 1 ELSE 0 END"
        ),
    )
    return marked.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum("is_new").alias("n_sessions"),
        F.min("ts_us").alias("first_us"),
        F.max("ts_us").alias("last_us"),
    )


def minute_rollup(events: DataFrame) -> DataFrame:
    """Tumbling 1-minute buckets per event type — the events-table twin of
    the token rollup tiers (same partial+final hash aggregate shape)."""
    return (
        events.select(
            "event_type",
            F.expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 60000000").alias("bucket"),
            F.expr("CAST(floor(value * 1000) AS BIGINT)").alias("mval"),
        )
        .groupBy("event_type", "bucket")
        .agg(
            F.count("*").alias("cnt"),
            F.sum("mval").alias("vsum"),
            F.min("mval").alias("vmin"),
            F.max("mval").alias("vmax"),
        )
    )


def rate_anomaly(events: DataFrame, neighborhood: int = 16) -> DataFrame:
    """Event-rate anomaly scores: the minute-bucket event count per
    event_type becomes a time series, scored with the MedianMethod
    formula (|cnt - nbhd mean| / nbhd std over ±neighborhood buckets) —
    the cross-domain composition a monitoring pipeline runs (stream →
    rollup → detector), entirely relational so the DuckDB oracle is
    bit-exact. Missing minutes count as zero-rate buckets via a dense
    per-type bucket grid (an absent bucket IS an anomaly signal)."""
    b = events.select(
        "event_type",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 60000000").alias("bucket"),
    ).groupBy("event_type", "bucket").agg(F.count("*").cast("long").alias("cnt"))
    span = b.groupBy("event_type").agg(
        F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi")
    )
    grid = span.select(
        "event_type",
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("bucket"),
    )
    dense = grid.join(b, ["event_type", "bucket"], "left").select(
        "event_type", "bucket", F.coalesce("cnt", F.lit(0)).cast("long").alias("cnt")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(-neighborhood, neighborhood)
    )
    stats = dense.select(
        "event_type", "bucket", "cnt",
        F.count("cnt").over(w).alias("_n"),
        F.sum("cnt").over(w).alias("_s"),
        F.sum(F.col("cnt") * F.col("cnt")).over(w).alias("_ss"),
    )
    return stats.select(
        "event_type", "bucket", "cnt",
        F.expr(
            "CASE WHEN sqrt(greatest(CAST(_ss AS DOUBLE) / _n"
            " - (CAST(_s AS DOUBLE) / _n) * (CAST(_s AS DOUBLE) / _n), 0.0)) = 0.0"
            " THEN 0.0 ELSE abs(CAST(cnt AS DOUBLE) - CAST(_s AS DOUBLE) / _n)"
            " / sqrt(greatest(CAST(_ss AS DOUBLE) / _n"
            " - (CAST(_s AS DOUBLE) / _n) * (CAST(_s AS DOUBLE) / _n), 0.0)) END"
        ).alias("score"),
    )


def _typed(events: DataFrame) -> DataFrame:
    """Integer-exact event projection shared by the temporal joins."""
    return events.select(
        "event_id", "user_id", "event_type",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("ts_us"),
        F.expr("CAST(floor(value * 1000) AS BIGINT)").alias("mval"),
    )


def asof_view_before_purchase(events: DataFrame, skew: bool = False) -> DataFrame:
    """As-of join composition: every 'purchase' event is enriched with
    the user's most recent 'view' event at-or-before it (ts, quantized
    value, and the gap in µs). NULLs when the user never viewed before
    buying. The operator is :func:`operators.temporal_joins.asof_join`
    — one shuffle on user_id, no range join. Ties inside the build side
    resolve to the greatest event_id. ``skew=True`` routes through the
    two-level :func:`asof_join_skew` (hour-bucketed) instead — same
    rows, hot keys parallelized; the driver adjudicates both paths
    against ONE oracle."""
    from dtaianomaly_spark.operators.temporal_joins import asof_join, asof_join_skew

    e = _typed(events)
    probe = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us", "mval"
    )
    build = e.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts_us", "mval"
    )
    if skew:
        out = asof_join_skew(
            probe, build, on="user_id", ts="ts_us",
            build_cols=["mval"], order_col="event_id", prefix="view_",
            bucket_width=3_600_000_000,
        )
    else:
        out = asof_join(
            probe, build, on="user_id", ts="ts_us",
            build_cols=["mval"], order_col="event_id", prefix="view_",
        )
    return out.select(
        "event_id", "user_id", "ts_us", "mval",
        F.col("view_ts_us"),
        F.col("view_mval"),
        (F.col("ts_us") - F.col("view_ts_us")).alias("gap_us"),
    )


ALERT_SPIKE_MIN = 2       # error events per minute that define a spike
ALERT_PAD_MIN = 2         # alert window = spike minute ± 2 minutes


def alert_window_counts(events: DataFrame) -> DataFrame:
    """Range-join composition: minutes where the 'error' rate spikes
    (>= ALERT_SPIKE_MIN events) become alert windows of
    [spike-2min, spike+3min) in µs; every event of ANY type inside a
    window is range-joined in and counted per (window, event_type) —
    the "what else happened around the incident" query. The operator is
    :func:`operators.temporal_joins.range_join_bucketed` (minute-
    bucketed equi-join + residual BETWEEN, never all-pairs)."""
    from dtaianomaly_spark.operators.temporal_joins import range_join_bucketed

    minute = 60_000_000
    e = _typed(events)
    spikes = (
        e.filter(F.col("event_type") == "error")
        .groupBy((F.col("ts_us") / minute).cast("long").alias("spike_bucket"))
        .agg(F.count("*").alias("n_err"))
        .filter(F.col("n_err") >= ALERT_SPIKE_MIN)
    )
    windows = spikes.select(
        "spike_bucket",
        ((F.col("spike_bucket") - ALERT_PAD_MIN) * minute).alias("lo"),
        ((F.col("spike_bucket") + ALERT_PAD_MIN + 1) * minute - 1).alias("hi"),
    )
    joined = range_join_bucketed(
        e.select("event_id", "event_type", "ts_us"),
        windows, point_ts="ts_us", lo="lo", hi="hi", bucket_width=minute,
    )
    return joined.groupBy("spike_bucket", "event_type").agg(
        F.count("*").alias("cnt"),
        F.min("ts_us").alias("first_us"),
        F.max("ts_us").alias("last_us"),
    )


ASOF_FWD_TOL_US = 600 * 1_000_000  # time-to-failure horizon: 10 minutes


def asof_error_after_click(events: DataFrame) -> DataFrame:
    """Forward as-of join with tolerance: each 'click' gets the user's
    NEXT 'error' at-or-after it, nulled out when it is more than 10
    minutes away — the time-to-failure enrichment. Ties inside the
    build side resolve to the smallest event_id (forward direction)."""
    from dtaianomaly_spark.operators.temporal_joins import asof_join

    e = _typed(events)
    probe = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts_us"
    )
    build = e.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts_us", "mval"
    )
    out = asof_join(
        probe, build, on="user_id", ts="ts_us",
        build_cols=["mval"], order_col="event_id", prefix="err_",
        direction="forward", tolerance=ASOF_FWD_TOL_US,
    )
    return out.select(
        "event_id", "user_id", "ts_us",
        F.col("err_ts_us"), F.col("err_mval"),
        (F.col("err_ts_us") - F.col("ts_us")).alias("ttf_us"),
    )
