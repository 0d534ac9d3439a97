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


# Counter-reset semantics (TimescaleDB `counter_agg` / PromQL `increase`):
# a step's contribution is the non-negative increment, and a decrease is
# a RESET — the counter restarted, so the new sample itself is the
# increment. Every step term is a BIGINT on quantized values, so the
# per-group sum is integer-exact and order-free.
COUNTER_STEP_SQL = (
    "CASE WHEN prev IS NULL THEN CAST(0 AS BIGINT)"
    " WHEN mval >= prev THEN mval - prev ELSE mval END"
)
COUNTER_RESET_SQL = (
    "CASE WHEN prev IS NOT NULL AND mval < prev THEN 1 ELSE 0 END"
)
# rate in ORIGINAL value units / second: delta is in milli-units, the
# duration in µs — one float divide at the end, shared verbatim with
# the oracle so the double is bit-reproducible.
COUNTER_RATE_SQL = (
    "CASE WHEN last_us > first_us THEN"
    " CAST(delta AS DOUBLE) * 1000.0 / CAST(last_us - first_us AS DOUBLE)"
    " ELSE CAST(NULL AS DOUBLE) END"
)


def counter_agg(events: DataFrame, bucket_us: int | None = None) -> DataFrame:
    """Counter-reset-corrected delta + rate per event_type — the
    TimescaleDB ``counter_agg`` / PromQL ``increase``/``rate`` semantics
    the reference's monotone-cumulative loaders never needed but every
    production metrics rollup does. Each series (event_type) is a
    sampled counter: ordered by (ts_us, event_id), a non-negative step
    adds ``mval - prev``; a decrease is a counter RESET and adds the new
    sample value itself (``COUNTER_STEP_SQL``).

    ``bucket_us=None`` → one row per event_type:
    (event_type, n_samples, n_resets, delta, first_us, last_us,
    rate_per_s). With ``bucket_us`` → tumbling-bucket rollup rows
    (event_type, bucket, n_samples, n_resets, delta, first_us, last_us,
    rate_per_s) where each STEP is assigned to the LATER sample's bucket
    (the deterministic PromQL-style attribution; a bucket's delta is the
    increase that LANDED in it), first_us/last_us are the bucket's own
    sample extent, and rate uses that extent.

    Scale shape: ONE window pass partitioned by the series key computes
    prev via lag; the per-series aggregate reuses that hash partitioning
    (1 exchange), the bucketed variant adds the (series, bucket) partial
    +final hash aggregate. At 100 TB the series key is the natural
    partitioner (series count >> executor count for metrics workloads);
    a single mega-hot series would use the rollup tiers' two-level
    bucket-partial trick — steps are associative once prev is attached.
    All step terms integer; the only float is the final rate divide."""
    w = Window.partitionBy("event_type").orderBy("ts_us", "event_id")
    stepped = (
        _typed(events)
        .select("event_type", "ts_us", "event_id", "mval")
        .withColumn("prev", F.lag("mval").over(w))
        .select(
            "event_type", "ts_us",
            F.expr(COUNTER_STEP_SQL).alias("step"),
            F.expr(COUNTER_RESET_SQL).alias("is_reset"),
        )
    )
    keys = ["event_type"]
    if bucket_us is not None:
        if bucket_us < 1:
            raise ValueError(f"bucket_us must be >= 1, got {bucket_us}")
        stepped = stepped.withColumn(
            "bucket", F.expr(f"ts_us DIV {int(bucket_us)}")
        )
        keys = ["event_type", "bucket"]
    agg = stepped.groupBy(*keys).agg(
        F.count("*").cast("long").alias("n_samples"),
        F.sum("is_reset").cast("long").alias("n_resets"),
        F.sum("step").cast("long").alias("delta"),
        F.min("ts_us").alias("first_us"),
        F.max("ts_us").alias("last_us"),
    )
    return agg.select(*keys, "n_samples", "n_resets", "delta",
                      "first_us", "last_us",
                      F.expr(COUNTER_RATE_SQL).alias("rate_per_s"))


# Time-weighted average (TimescaleDB `time_weight`): the integral of the
# interpolated value curve divided by the observed span. Products are
# DECIMAL(18,0) x DECIMAL(18,0) — exact at any magnitude this table can
# produce (|mval| < 10^18 / span_us) — and the sums are decimal-exact and
# order-free; ONE float divide at the end converts back to original value
# units (mval is value*1000, the trapezoid carries a further factor 2).
TWA_LOCF_SQL = (
    "CASE WHEN dur_us > 0 THEN CAST(s_locf AS DOUBLE)"
    " / (CAST(dur_us AS DOUBLE) * 1000.0) ELSE CAST(NULL AS DOUBLE) END"
)
TWA_LINEAR_SQL = (
    "CASE WHEN dur_us > 0 THEN CAST(s_lin AS DOUBLE)"
    " / (CAST(dur_us AS DOUBLE) * 2000.0) ELSE CAST(NULL AS DOUBLE) END"
)


def time_weight(events: DataFrame) -> DataFrame:
    """Time-weighted average of ``value`` per event_type under BOTH
    standard interpolations — LOCF (step function: each sample holds
    until the next) and linear (trapezoid between consecutive samples)
    — the irregular-sampling average that a plain AVG gets wrong
    whenever sampling density correlates with level (TimescaleDB
    ``time_weight('LOCF'|'Linear', ts, value)``).

    Output: (event_type, n_samples, first_us, last_us, twa_locf,
    twa_linear); NULL averages for series with zero observed span.

    Scale shape: one lead() window pass partitioned by the series key
    attaches the next timestamp (and value, for the trapezoid); the
    per-series aggregate reuses the window's hash partitioning — 1
    exchange total. Integrals are decimal-exact: each step contributes
    mval * dt_us (LOCF) / (mval + next_mval) * dt_us (linear) as
    DECIMAL(18,0) products summed without float order-sensitivity; the
    single final divide is the shared ``TWA_*_SQL`` formula."""
    w = Window.partitionBy("event_type").orderBy("ts_us", "event_id")
    stepped = (
        _typed(events)
        .select("event_type", "ts_us", "event_id", "mval")
        .withColumn("nxt_us", F.lead("ts_us").over(w))
        .withColumn("nxt_mval", F.lead("mval").over(w))
        .select(
            "event_type", "ts_us",
            F.expr(
                "CASE WHEN nxt_us IS NULL THEN CAST(0 AS DECIMAL(18,0))"
                " ELSE CAST(mval AS DECIMAL(18,0))"
                " * CAST(nxt_us - ts_us AS DECIMAL(18,0)) END"
            ).alias("a_locf"),
            F.expr(
                "CASE WHEN nxt_us IS NULL THEN CAST(0 AS DECIMAL(18,0))"
                " ELSE CAST(mval + nxt_mval AS DECIMAL(18,0))"
                " * CAST(nxt_us - ts_us AS DECIMAL(18,0)) END"
            ).alias("a_lin"),
        )
    )
    agg = stepped.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_samples"),
        F.min("ts_us").alias("first_us"),
        F.max("ts_us").alias("last_us"),
        F.sum("a_locf").alias("s_locf"),
        F.sum("a_lin").alias("s_lin"),
    ).withColumn("dur_us", F.expr("last_us - first_us"))
    return agg.select(
        "event_type", "n_samples", "first_us", "last_us",
        F.expr(TWA_LOCF_SQL).alias("twa_locf"),
        F.expr(TWA_LINEAR_SQL).alias("twa_linear"),
    )


# Lead-lag cross-correlation: all integer aggregates; r is assembled
# from three exact int64 moments (each < 2^53, so the DOUBLE casts are
# exact) with ONE float divide + sqrt — bit-equal across engines.
LEADLAG_R_SQL = (
    "CAST(n * sxy - sx * sy AS DOUBLE)"
    " / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)"
    "        * CAST(n * syy - sy * sy AS DOUBLE))"
)


def leadlag_pairs(events: DataFrame, max_lag: int = 5) -> DataFrame:
    """Lead-lag discovery — "which metric LEADS which": for every
    unordered pair of event types, the minute offset ``l`` in
    [-max_lag, max_lag] that maximizes Pearson corr(A_t, B_{t+l}) over
    the pair's dense zero-filled minute-count series (a positive best
    lag means A leads B by ``l`` minutes). The classic TSDB
    root-cause / metric-graph primitive (cross-correlation function,
    Box & Jenkins ch. 11) that none of the rigid-alignment similarity
    ops (`series_corr_pairs` at lag 0, DTW's elastic alignment)
    answers.

    Correctness discipline: counts on the shared global minute grid
    are integers, zero-filled via a left join from the (types x grid)
    frame (an absent minute IS zero traffic — skipping it would bias
    every moment); all five moments (n, sx, sy, sxx(=sum a*a), sxy) are
    exact int64 sums; Pearson is ONE double divide over exact DOUBLE
    casts (LEADLAG_R_SQL) so the DuckDB oracle reproduces it
    bit-for-bit. Zero-variance windows (denominator 0) are excluded
    before ranking; the winner per pair is row_number over
    (r DESC, abs(lag), lag) — fully deterministic.

    Scale shape: the dense grid is |types| x span/60s rows — bounded by
    time span x series cardinality, NOT event count (100 TB of events
    over a month at 1k series is a 43M-row grid). The global bounds
    row is a broadcast scalar cross join (never a collect); the
    lag-exploded A side joins the B side on the single equi-key
    ``idx`` (both sides co-partitioned by the shuffle on idx, the
    type-pair inequality is a post-join filter on co-located rows);
    the (a, b, lag) aggregate is a partial+final hash agg over
    (2*max_lag+1) * |pairs| groups. No window over the raw grid — the
    only window ranks the tiny per-pair lag table."""
    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    ev = events.select(
        "event_type",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 60000000").alias("m"),
    )
    cnts = ev.groupBy("event_type", "m").agg(
        F.count("*").cast("long").alias("c")
    )
    bounds = cnts.groupBy().agg(
        F.min("m").alias("mn"), F.max("m").alias("mx")
    )
    cnts_n = cnts.crossJoin(F.broadcast(bounds)).select(
        "event_type", F.expr("m - mn").alias("idx"), "c"
    )
    grid = (
        cnts.select("event_type").distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.expr("sequence(0, mx - mn)")).alias("idx"),
        )
    )
    dense = (
        grid.join(cnts_n, ["event_type", "idx"], "left")
        .select("event_type", "idx", F.expr("coalesce(c, 0)").alias("c"))
    )
    a = dense.select(
        F.col("event_type").alias("a_type"),
        F.col("idx").alias("t"),
        F.col("c").alias("ca"),
        F.explode(
            F.expr(f"sequence({-max_lag}, {max_lag})")
        ).alias("lag"),
    ).withColumn("idx", F.expr("t + lag"))
    b = dense.select(
        F.col("event_type").alias("b_type"), "idx", F.col("c").alias("cb")
    )
    moments = (
        a.join(b, "idx")
        .filter(F.col("a_type") < F.col("b_type"))
        .groupBy("a_type", "b_type", "lag")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("ca").alias("sx"),
            F.sum("cb").alias("sy"),
            F.sum(F.expr("ca * ca")).alias("sxx"),
            F.sum(F.expr("cb * cb")).alias("syy"),
            F.sum(F.expr("ca * cb")).alias("sxy"),
        )
        .filter(F.expr("n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0"))
        .withColumn("corr", F.expr(LEADLAG_R_SQL))
    )
    wbest = Window.partitionBy("a_type", "b_type").orderBy(
        F.desc("corr"), F.abs(F.col("lag")), F.col("lag")
    )
    return (
        moments.withColumn("rk", F.row_number().over(wbest))
        .filter(F.col("rk") == 1)
        .select("a_type", "b_type",
                F.col("lag").cast("long").alias("best_lag"), "n", "corr")
    )


def funnel_conversion(events: DataFrame) -> DataFrame:
    """Strict-order funnel: signup → (first click AFTER the signup) →
    (first purchase AFTER that click), the product-analytics
    conversion query. Each step is a per-user MIN-timestamp aggregate
    over events later than the previous step's timestamp — the
    textbook decorrelation of the ``MIN(ts) WHERE ts > prev`` chain.

    Output: one KPI row (n_step1, n_step2, n_step3, conv_12, conv_23,
    conv_13) — integer user counts, shared-float ratios.

    Scale shape: every per-step aggregate and every step-to-step join
    is keyed on user_id, so the whole chain runs inside ONE hash
    partitioning (Exchange reuse); the step frames shrink
    monotonically, and the final KPI is a 1-row fold. Ties
    (click at exactly the signup microsecond) are NOT counted as
    after — strict >, microsecond-exact in integer epoch_us."""
    ev = events.select(
        "user_id", "event_type",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("ts_us"),
    )
    t1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id").agg(F.min("ts_us").alias("t1"))
        # lazy checkpoint: t1 feeds BOTH the t2 join and the final KPI
        # join — without it the signup aggregate's whole subtree (scan +
        # user shuffle) plans twice
        .localCheckpoint(eager=False)
    )
    t2 = (
        ev.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter(F.col("ts_us") > F.col("t1"))
        .groupBy("user_id").agg(F.min("ts_us").alias("t2"))
        .localCheckpoint(eager=False)
    )
    t3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter(F.col("ts_us") > F.col("t2"))
        .groupBy("user_id").agg(F.min("ts_us").alias("t3"))
    )
    g = (
        t1.join(t2.select("user_id", F.lit(1).alias("s2")), "user_id", "left")
        .join(t3.select("user_id", F.lit(1).alias("s3")), "user_id", "left")
        .agg(
            F.count("*").cast("long").alias("n_step1"),
            F.sum(F.coalesce(F.col("s2"), F.lit(0))).cast("long").alias("n_step2"),
            F.sum(F.coalesce(F.col("s3"), F.lit(0))).cast("long").alias("n_step3"),
        )
    )
    return g.select(
        "n_step1", "n_step2", "n_step3",
        F.expr("CAST(n_step2 AS DOUBLE) / n_step1").alias("conv_12"),
        F.expr("CAST(n_step3 AS DOUBLE) / n_step2").alias("conv_23"),
        F.expr("CAST(n_step3 AS DOUBLE) / n_step1").alias("conv_13"),
    )


def cohort_retention(events: DataFrame) -> DataFrame:
    """Day-cohort retention matrix: cohort = the user's first SIGNUP
    day; a (cohort, offset) cell counts the cohort's users active (ANY
    event) exactly ``offset`` days after their cohort day — the
    classic warehouse retention triangle.

    Output: (cohort_day, offset_days, n_active, cohort_size,
    retention) — integer counts, shared-float rate; offset 0 always
    includes the signup itself (retention 1.0 by construction).

    Scale shape: the user→cohort map and the distinct (user, day)
    activity set are both user_id-keyed aggregates (one partitioning
    shared through the join); the retention matrix itself is bounded
    by |cohorts| x |offsets| (days², not users), and the cohort-size
    frame that joins onto it is broadcast-tiny."""
    ev = events.select(
        "user_id", "event_type",
        F.expr(
            "unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000"
        ).alias("day"),
    )
    first = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id").agg(F.min("day").alias("cohort_day"))
        # lazy checkpoint: the cohort map feeds both the activity join
        # and the cohort-size aggregate
        .localCheckpoint(eager=False)
    )
    act = ev.select("user_id", "day").distinct()
    cells = (
        act.join(first, "user_id")
        .filter(F.col("day") >= F.col("cohort_day"))
        .groupBy(
            "cohort_day", (F.col("day") - F.col("cohort_day")).alias("offset_days")
        )
        .agg(F.count("*").cast("long").alias("n_active"))
    )
    size = first.groupBy("cohort_day").agg(
        F.count("*").cast("long").alias("cohort_size")
    )
    return cells.join(F.broadcast(size), "cohort_day").select(
        "cohort_day", "offset_days", "n_active", "cohort_size",
        F.expr("CAST(n_active AS DOUBLE) / cohort_size").alias("retention"),
    )


def type_transitions(events: DataFrame) -> DataFrame:
    """First-order event-type transition counts (the Markov/path-
    analysis table behind sankey funnels): for each user's
    time-ordered event stream, count (prev_type → type) pairs, then
    rank globally. ONE lag window over the (user_id, ts, event_id)
    order + one pair aggregate — the window partitioning is user_id,
    so the shuffle is the same user-keyed exchange every op in this
    module uses. Deterministic total order: microsecond ts, then
    event_id (unique) breaks ties; rank over the bounded |types|²
    pair table breaks count ties by pair name.

    Output: (prev_type, event_type, n_trans, rnk, frac) — counts,
    global rank, and the row's share of all transitions."""
    ev = events.select(
        "user_id", "event_type", "event_id",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("ts_us"),
    )
    marked = ev.withColumn(
        "prev_type",
        F.expr(
            "lag(event_type) OVER (PARTITION BY user_id"
            " ORDER BY ts_us, event_id)"
        ),
    ).filter(F.col("prev_type").isNotNull())
    pairs = marked.groupBy("prev_type", "event_type").agg(
        F.count("*").cast("long").alias("n_trans")
    ).localCheckpoint(eager=False)  # |types|² rows, shared by total + output
    total = pairs.agg(F.sum("n_trans").alias("n_total"))
    w = Window.orderBy(
        F.col("n_trans").desc(), F.col("prev_type"), F.col("event_type")
    )
    return (
        pairs.crossJoin(F.broadcast(total))
        .select(
            "prev_type", "event_type", "n_trans",
            F.row_number().over(w).cast("long").alias("rnk"),
            F.expr("CAST(n_trans AS DOUBLE) / n_total").alias("frac"),
        )
    )


def sliding_distinct_users(events: DataFrame, window_min: int = 30) -> DataFrame:
    """Sliding-window distinct users: for every ACTIVE minute t, the
    number of distinct users with any event in the trailing
    ``window_min``-minute window (t − w + 1 .. t] — the live-audience /
    rolling-MAU-style NDV query that grouped rollups cannot answer
    (distinct does not sum across buckets).

    Exact and oracle-checkable: the (user, minute) activity set is
    deduplicated FIRST (the corpus-sized step — one hash aggregate over
    pairs, a tiny fraction of raw events), each pair then fans out to
    the ≤ w windows it can serve, the fan-out is deduplicated on
    (window, user), and the per-window count is exact. Emitted windows
    are restricted to minutes that actually have events (left-semi
    against the distinct-minute set), so quiet gaps produce no rows.

    Scale shape at 100 TB: the only corpus-sized stage is the first
    dedup; everything after operates on |users|·|active minutes| pairs
    × w fan-out with keyed hash aggregates — the standard interval-
    expansion trade (w× more rows, zero self-joins). Window length is
    the knob: the fan-out is linear in w, never quadratic."""
    if window_min < 1:
        raise ValueError(f"window_min must be >= 1, got {window_min}")
    pairs = (
        events.select(
            "user_id",
            F.expr(
                "unix_micros(CAST(ts AS TIMESTAMP)) DIV 60000000"
            ).alias("m"),
        )
        .distinct()
        # shared by the fan-out AND the active-minute set
        .localCheckpoint(eager=False)
    )
    active = pairs.select("m").distinct()
    fanned = (
        pairs.select(
            "user_id",
            F.explode(
                F.expr(f"sequence(m, m + {int(window_min) - 1})")
            ).alias("t"),
        )
        .distinct()
        .join(active.select(F.col("m").alias("t")), "t", "left_semi")
    )
    return fanned.groupBy("t").agg(
        F.count("*").cast("long").alias("n_users")
    )


def interarrival_stats(events: DataFrame) -> DataFrame:
    """Exact inter-arrival-time statistics per event type: consecutive
    event gaps in integer microseconds (one lag window on the
    event-type partitioning), then exact p50/p90/p99 via the engine's
    ceil-rank sorted-array selection plus the exact integer mean parts
    — the operational latency/burstiness report (the events-table twin
    of the token tiers' quantile summaries, but exact).

    Output: (event_type, n_gaps, sum_gap_us, p50_us, p90_us, p99_us,
    mean_us) — integers except the one shared-float mean.

    Scale shape: ONE event_type hash partitioning shared by the lag
    window and the aggregate; per-type sorted arrays are bounded by
    the type's event count — at 100 TB swap the exact tail for the
    qsummary tier; this operator is the exact-tier member."""
    gaps = events.select(
        "event_type",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("ts_us"),
        "event_id",
    ).withColumn(
        "gap",
        F.expr(
            "ts_us - lag(ts_us) OVER (PARTITION BY event_type"
            " ORDER BY ts_us, event_id)"
        ),
    ).filter(F.col("gap").isNotNull())
    sel = {
        "p50_us": (1, 2), "p90_us": (9, 10), "p99_us": (99, 100),
    }
    cols = [
        F.expr(
            f"CAST(element_at(arr, CAST(({num} * size(arr) + {den} - 1)"
            f" DIV {den} AS INT)) AS BIGINT)"
        ).alias(nm)
        for nm, (num, den) in sel.items()
    ]
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_gaps"),
            F.sum("gap").cast("long").alias("sum_gap_us"),
            F.expr("array_sort(collect_list(gap))").alias("arr"),
        )
        .select(
            "event_type", "n_gaps", "sum_gap_us", *cols,
            F.expr(
                "CAST(sum_gap_us AS DOUBLE) / n_gaps"
            ).alias("mean_us"),
        )
    )


def rolling_corr_pairs(events: DataFrame, window_min: int = 60) -> DataFrame:
    """TIME-VARYING correlation — the rolling sibling of
    :func:`leadlag_pairs`' whole-history CCF: for every unordered
    event-type pair, Pearson corr over a trailing ``window_min``-minute
    window at every full-window minute of the dense zero-filled grid.
    The "did these metrics decouple this hour" drill-down a single
    whole-span coefficient cannot answer.

    Exactness: grid counts are integers; per-type rolling (s, ss) and
    per-pair rolling cross-product sums are exact int64 window sums;
    Pearson is the ONE shared double formula (``LEADLAG_R_SQL``).
    Zero-variance windows emit NULL corr (kept — a flat window is
    information, not noise).

    Output: (a_type, b_type, idx, n, corr) for idx ≥ window−1.

    Scale shape: per-type moments need ONE event_type-partitioned
    running window over the bounded grid; the pair stage joins the
    grid to itself on the single equi-key idx (co-partitioned), then
    runs the same running window per pair — |pairs| × grid rows, still
    span-bounded, never event-bounded. The final three-way join is
    idx-keyed and AQE-handled."""
    if window_min < 2:
        raise ValueError(f"window_min must be >= 2, got {window_min}")
    ev = events.select(
        "event_type",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 60000000").alias("m"),
    )
    cnts = ev.groupBy("event_type", "m").agg(
        F.count("*").cast("long").alias("c")
    )
    bounds = cnts.groupBy().agg(
        F.min("m").alias("mn"), F.max("m").alias("mx")
    )
    cnts_n = cnts.crossJoin(F.broadcast(bounds)).select(
        "event_type", F.expr("m - mn").alias("idx"), "c"
    )
    grid = (
        cnts.select("event_type").distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.expr("sequence(0, mx - mn)")).alias("idx"),
        )
    )
    dense = (
        grid.join(cnts_n, ["event_type", "idx"], "left")
        .select("event_type", "idx", F.expr("coalesce(c, 0)").alias("c"))
        .localCheckpoint(eager=False)
    )
    w = int(window_min)
    wt = (
        Window.partitionBy("event_type").orderBy("idx")
        .rowsBetween(-(w - 1), 0)
    )
    typ = dense.select(
        "event_type", "idx",
        F.sum("c").over(wt).alias("s"),
        F.sum(F.expr("c * c")).over(wt).alias("ss"),
        F.count("*").over(wt).alias("full"),
    ).filter(F.col("full") == w)
    prod = (
        dense.alias("a")
        .join(dense.alias("b"), "idx")
        .filter(F.expr("a.event_type < b.event_type"))
        .select(
            F.expr("a.event_type").alias("a_type"),
            F.expr("b.event_type").alias("b_type"),
            "idx",
            F.expr("a.c * b.c").alias("cab"),
        )
    )
    wp = (
        Window.partitionBy("a_type", "b_type").orderBy("idx")
        .rowsBetween(-(w - 1), 0)
    )
    pr = prod.select(
        "a_type", "b_type", "idx",
        F.sum("cab").over(wp).alias("sxy"),
        F.count("*").over(wp).alias("full"),
    ).filter(F.col("full") == w)
    ta = typ.select(
        F.col("event_type").alias("a_type"), "idx",
        F.col("s").alias("sx"), F.col("ss").alias("sxx"),
    )
    tb = typ.select(
        F.col("event_type").alias("b_type"), "idx",
        F.col("s").alias("sy"), F.col("ss").alias("syy"),
    )
    return (
        pr.join(ta, ["a_type", "idx"])
        .join(tb, ["b_type", "idx"])
        .select(
            "a_type", "b_type", "idx",
            F.lit(w).cast("long").alias("n"),
            F.expr(
                "CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0"
                f" THEN {LEADLAG_R_SQL} ELSE NULL END"
            ).alias("corr"),
        )
    )


def stickiness_daily(events: DataFrame, mau_days: int = 30) -> DataFrame:
    """DAU / MAU stickiness per active day — the canonical engagement
    KPI: daily active users over trailing-``mau_days`` active users,
    exact on both sides (no sketches at this tier; the qsummary family
    is the approximate tier). The same dedup-first interval-expansion
    shape as :func:`sliding_distinct_users`, at day granularity, with
    the DAU side read off the un-fanned pairs.

    Output: (day, dau, mau, stickiness).

    Scale shape: ONE corpus-sized dedup to (user, day) pairs
    (checkpointed, shared by both sides and the active-day set); the
    MAU fan-out is linear in ``mau_days``; both counts are keyed hash
    aggregates; the final join is day-keyed over |days| rows."""
    if mau_days < 1:
        raise ValueError(f"mau_days must be >= 1, got {mau_days}")
    pairs = (
        events.select(
            "user_id",
            F.expr(
                "unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000"
            ).alias("d"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    active = pairs.select("d").distinct()
    dau = pairs.groupBy("d").agg(F.count("*").cast("long").alias("dau"))
    mau = (
        pairs.select(
            "user_id",
            F.explode(
                F.expr(f"sequence(d, d + {int(mau_days) - 1})")
            ).alias("t"),
        )
        .distinct()
        .join(active.select(F.col("d").alias("t")), "t", "left_semi")
        .groupBy("t")
        .agg(F.count("*").cast("long").alias("mau"))
    )
    return (
        dau.join(mau, dau.d == mau.t)
        .select(
            "d", "dau", "mau",
            F.expr("CAST(dau AS DOUBLE) / mau").alias("stickiness"),
        )
    )


def funnel_latency(events: DataFrame) -> DataFrame:
    """Conversion-latency distribution for the strict-order funnel:
    exact integer-microsecond gaps t2−t1 (signup→first click) and
    t3−t2 (click→first purchase) across converting users, summarized
    with the engine's ceil-rank exact percentiles + shared-float mean
    — "how long does conversion take", the companion KPI to
    :func:`funnel_conversion`'s "how many convert".

    Output: one row per step gap: (step, n_users, p50_us, p90_us,
    mean_us, sum_gap_us).

    Scale shape: the funnel chain's user-keyed aggregates (identical
    partitioning reuse), then a 2-group aggregate over |users| rows
    with bounded sorted arrays."""
    ev = events.select(
        "user_id", "event_type",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("ts_us"),
    )
    t1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id").agg(F.min("ts_us").alias("t1"))
        .localCheckpoint(eager=False)
    )
    t2 = (
        ev.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter(F.col("ts_us") > F.col("t1"))
        .groupBy("user_id").agg(F.min("ts_us").alias("t2"))
        .localCheckpoint(eager=False)
    )
    t3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter(F.col("ts_us") > F.col("t2"))
        .groupBy("user_id").agg(F.min("ts_us").alias("t3"))
    )
    gaps = (
        t1.join(t2, "user_id")
        .select(F.lit("signup_to_click").alias("step"),
                F.expr("t2 - t1").alias("gap"))
        .unionByName(
            t2.join(t3, "user_id")
            .select(F.lit("click_to_purchase").alias("step"),
                    F.expr("t3 - t2").alias("gap"))
        )
    )
    return (
        gaps.groupBy("step")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum("gap").cast("long").alias("sum_gap_us"),
            F.expr("array_sort(collect_list(gap))").alias("arr"),
        )
        .select(
            "step", "n_users", "sum_gap_us",
            F.expr(
                "CAST(element_at(arr, CAST((size(arr) + 1) DIV 2 AS INT))"
                " AS BIGINT)"
            ).alias("p50_us"),
            F.expr(
                "CAST(element_at(arr, CAST((9 * size(arr) + 9) DIV 10"
                " AS INT)) AS BIGINT)"
            ).alias("p90_us"),
            F.expr("CAST(sum_gap_us AS DOUBLE) / n_users").alias("mean_us"),
        )
    )


ASOF_TOL_US = 600 * 1_000_000  # 10-minute staleness cutoff


def asof_view_tolerance(events: DataFrame, tol_us: int = ASOF_TOL_US) -> DataFrame:
    """As-of join WITH TOLERANCE (pandas ``merge_asof(tolerance=...)``
    parity): each purchase is enriched with the most recent view
    at-or-before it ONLY IF that view is within ``tol_us``
    microseconds — a stale match is as bad as no match for "what did
    the user last see before buying" attribution, so it nulls out.
    Same one-shuffle union-window operator as the base as-of; the
    tolerance is a post-match null-out, never a second join."""
    from dtaianomaly_spark.operators.temporal_joins import asof_join

    e = _typed(events)
    probe = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us", "mval"
    )
    build = e.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts_us", "mval"
    )
    out = asof_join(
        probe, build, on="user_id", ts="ts_us",
        build_cols=["mval"], order_col="event_id", prefix="view_",
        tolerance=int(tol_us),
    )
    return out.select(
        "event_id", "user_id", "ts_us", "mval",
        F.col("view_ts_us"), F.col("view_mval"),
        (F.col("ts_us") - F.col("view_ts_us")).alias("gap_us"),
    )


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def minute_type_pivot(events: DataFrame) -> DataFrame:
    """PIVOT the minute rollup: one row per minute, one count column
    per event type (the wide layout dashboards and correlation
    consumers want) — Spark's relational pivot over the FIXED type
    domain (a pivot over an unknown domain needs a collect; pinning
    the domain keeps the plan one hash aggregate with conditional
    counts, which is also exactly how the oracle expresses it).

    Output: (m, click, error, purchase, signup, view, total)."""
    ev = events.select(
        F.expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 60000000").alias("m"),
        "event_type",
    )
    p = (
        ev.groupBy("m")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))  # count(*) is rejected inside pivot
    )
    cols = [
        F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t)
        for t in EVENT_TYPES
    ]
    return p.select("m", *cols).select(
        "m", *[F.col(t) for t in EVENT_TYPES],
        F.expr(" + ".join(EVENT_TYPES)).cast("long").alias("total"),
    )


ATTR_WINDOW_US = 3600 * 1_000_000  # 1-hour attribution lookback


def linear_attribution(
    events: DataFrame, window_us: int = ATTR_WINDOW_US
) -> DataFrame:
    """LINEAR multi-touch attribution: every view within the lookback
    window before a purchase shares the conversion credit equally —
    the marketing-analytics complement of the as-of join's last-touch
    model (which gives the final view everything). Credit per touch is
    the exact rational 1/n_touches materialized as one shared float;
    touch counts and window bounds are exact integers.

    Output: one row per purchase: (event_id, user_id, ts_us,
    n_touches, first_touch_us, last_touch_us, credit_per_touch).

    Scale shape: the purchase↔view join is user_id-keyed with the
    window predicate applied post-join on co-located rows (the
    standard decorrelated range join; per-user event counts bound the
    pair fan-out), then one purchase-keyed aggregate. Zero-touch
    purchases keep NULL bounds and NULL credit — visible, not
    dropped."""
    e = _typed(events)
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us"
    )
    v = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts_us").alias("v_ts")
    )
    joined = p.join(
        v,
        (p.user_id == v.v_user)
        & (F.col("v_ts") <= p.ts_us)
        & (F.col("v_ts") > p.ts_us - int(window_us)),
        "left",
    )
    g = joined.groupBy("event_id", "user_id", "ts_us").agg(
        F.count("v_ts").cast("long").alias("n_touches"),
        F.min("v_ts").alias("first_touch_us"),
        F.max("v_ts").alias("last_touch_us"),
    )
    return g.select(
        "event_id", "user_id", "ts_us", "n_touches",
        "first_touch_us", "last_touch_us",
        F.expr(
            "CASE WHEN n_touches > 0 THEN CAST(1 AS DOUBLE) / n_touches"
            " ELSE NULL END"
        ).alias("credit_per_touch"),
    )
