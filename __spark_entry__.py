"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship all-tier rollup on sf0.001.
``queries()`` / ``oracle_sql()`` expose every oracle-verifiable operator;
keys without an oracle entry get the driver's rows-only check.

Correctness discipline: every oracle-verified query keeps aggregation in
the *integer* domain (token values are integer-derived) and computes float
columns with one shared IEEE-754 formula on both sides, so value hashes
match bit-for-bit — see dtaianomaly_spark/rollup/tiers.py docstring.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dtaianomaly_spark.sources import corpus as C
from dtaianomaly_spark.rollup import tiers as T

SF0001 = "/root/testdata/sf0.001"

# Shared SQL fragments (DuckDB oracle side) -------------------------------

_MEAN = "CAST(sum AS DOUBLE) / cnt"
_STD = (
    "sqrt(greatest(CAST(sumsq AS DOUBLE) / cnt "
    "- (CAST(sum AS DOUBLE) / cnt) * (CAST(sum AS DOUBLE) / cnt), 0.0))"
)


def _rollup_oracle(bucket_ticks: int, tier: str, where: str = "TRUE") -> str:
    return f"""
{C.TOKEN_SQL_CTE},
agg AS (
    SELECT
        doc_id,
        CAST(pos // {bucket_ticks} AS BIGINT) AS bucket,
        CAST(COUNT(value) AS BIGINT) AS cnt,
        CAST(SUM(value) AS BIGINT) AS sum,
        CAST(SUM(value * value) AS BIGINT) AS sumsq,
        CAST(MIN(value) AS BIGINT) AS min,
        CAST(MAX(value) AS BIGINT) AS max,
        CAST(ARG_MIN(value, pos) AS BIGINT) AS first,
        CAST(ARG_MAX(value, pos) AS BIGINT) AS last
    FROM long_form
    WHERE {where}
    GROUP BY doc_id, bucket
)
SELECT doc_id, '{tier}' AS tier, bucket, cnt, sum, sumsq, min, max, first, last,
       {_MEAN} AS mean, {_STD} AS std
FROM agg
"""


def _spark_long_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.token_long_form(spark, sf_dir)


# Spark-side queries -------------------------------------------------------

def _q_rollup_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.rollup_relational(_spark_long_form(spark, sf_dir), 16, "raw")


def _q_rollup_1m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1m tier composed from raw partials (the continuous-aggregate path);
    oracle aggregates tokens directly at 960 ticks — equality proves the
    partial+final composition is exact."""
    raw = T.rollup_relational(_spark_long_form(spark, sf_dir), 16, "raw")
    return T.compose_tier(raw, T.M1_FACTOR, "1m")


def _q_rollup_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = T.rollup_relational(_spark_long_form(spark, sf_dir), 16, "raw")
    m1 = T.compose_tier(raw, T.M1_FACTOR, "1m")
    return T.compose_tier(m1, T.H1_FACTOR, "1h")


def _q_rollup_map_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The zero-shuffle Arrow-kernel engine path (mapInPandas over per-row
    token arrays) vs the same direct-SQL oracle: proves the engine's scale
    path computes byte-identical rollups."""
    arrays = C.token_arrays(spark, sf_dir)
    out = T.rollup_tiers_map(arrays, tiers=("raw",))
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "tier", "bucket", "cnt", "sum", "sumsq", "min", "max", "first", "last",
        "mean", "std",
    )


def _q_gapfill_1m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup over a gappy stream (every pos % 7 == 3 dropped), then
    gap-fill the 1m bucket grid: missing buckets surface with cnt = 0."""
    lf = _spark_long_form(spark, sf_dir).filter(F.col("pos") % 7 != 3)
    rolled = T.rollup_relational(lf, 960, "1m").drop("tier")
    series_n = C.documents_series(spark, sf_dir)
    filled = T.gap_fill(rolled, series_n, 960)
    return filled.select(
        "doc_id", "bucket", "cnt", "sum", "sumsq", "min", "max", "mean", "std"
    )


def _q_median_method(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MedianMethod anomaly scores (reference MedianMethod.py:82-107) as a
    pure window-aggregate plan: |x - mean(nbhd)| / std_pop(nbhd) over the
    centered neighborhood [t-16, t+16], 0 where undefined."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(-16, 16)
    lf = _spark_long_form(spark, sf_dir)
    stats = lf.select(
        "doc_id", "pos", "value",
        F.count("value").over(w).alias("cnt"),
        F.sum("value").over(w).alias("sum"),
        F.sum(F.col("value") * F.col("value")).over(w).alias("sumsq"),
    )
    return stats.select(
        "doc_id", "pos",
        F.expr(
            f"CASE WHEN {T.DERIVE_STD_SQL} = 0.0 THEN 0.0 "
            f"ELSE abs(CAST(value AS DOUBLE) - ({T.DERIVE_MEAN_SQL})) / ({T.DERIVE_STD_SQL}) END"
        ).alias("score"),
    )


# Preprocessor queries ----------------------------------------------------

def _q_pp_standard(spark, sf_dir):
    from dtaianomaly_spark.operators import preprocessing as PP

    return PP.standard_scale(_spark_long_form(spark, sf_dir))


def _q_pp_minmax(spark, sf_dir):
    from dtaianomaly_spark.operators import preprocessing as PP

    return PP.minmax_scale(_spark_long_form(spark, sf_dir))


def _q_pp_robust(spark, sf_dir):
    from dtaianomaly_spark.operators import preprocessing as PP

    return PP.robust_scale(_spark_long_form(spark, sf_dir))


def _q_pp_movavg(spark, sf_dir):
    from dtaianomaly_spark.operators import preprocessing as PP

    return PP.moving_average(_spark_long_form(spark, sf_dir), 8)


def _q_pp_diff(spark, sf_dir):
    from dtaianomaly_spark.operators import preprocessing as PP

    return PP.differencing(_spark_long_form(spark, sf_dir), order=2, window_size=3)


def _q_pp_under_rate(spark, sf_dir):
    from dtaianomaly_spark.operators import preprocessing as PP

    return PP.undersample_rate(_spark_long_form(spark, sf_dir), 4)


def _q_pp_under_nb(spark, sf_dir):
    from dtaianomaly_spark.operators import preprocessing as PP

    return PP.undersample_nb(_spark_long_form(spark, sf_dir), 100)


def _q_pp_paa(spark, sf_dir):
    from dtaianomaly_spark.operators import preprocessing as PP

    return PP.paa(_spark_long_form(spark, sf_dir), 32)


def _q_pp_ema(spark, sf_dir):
    """EMA is sequentially recursive — Arrow kernel; rows-only check."""
    from dtaianomaly_spark.operators import preprocessing as PP

    return PP.ema(C.token_arrays(spark, sf_dir), alpha=0.9)


# Thresholding / evaluation queries ---------------------------------------

_SPIKE = "(doc_id * 7919 + pos * 104729) % 997 = 0"
_BLOCK = "pos % 50 < 5"


def _scored(spark, sf_dir, truth_expr=_SPIKE):
    lf = _spark_long_form(spark, sf_dir)
    return lf.select(
        "doc_id", "pos",
        F.col("value").alias("score"),
        F.expr(f"CASE WHEN {truth_expr} THEN 1 ELSE 0 END").alias("truth"),
    )


def _q_th_contamination(spark, sf_dir):
    from dtaianomaly_spark.operators import evaluation as EV

    return EV.contamination_rate(_scored(spark, sf_dir), rate=0.05).select(
        "doc_id", "pos", "label"
    )


def _q_th_top_n(spark, sf_dir):
    from dtaianomaly_spark.operators import evaluation as EV

    return EV.top_n(_scored(spark, sf_dir), 20).select("doc_id", "pos", "label")


def _q_ev_confusion(spark, sf_dir):
    from dtaianomaly_spark.operators import evaluation as EV

    return EV.confusion_metrics(EV.top_n(_scored(spark, sf_dir), 20))


def _q_ev_auc_roc(spark, sf_dir):
    from dtaianomaly_spark.operators import evaluation as EV

    return EV.auc_roc(_scored(spark, sf_dir))


def _q_ev_point_adjust(spark, sf_dir):
    from dtaianomaly_spark.operators import evaluation as EV

    scored = _scored(spark, sf_dir, truth_expr=_BLOCK)
    return EV.point_adjusted_metrics(EV.contamination_rate(scored, rate=0.05))


def _q_ev_best_f1(spark, sf_dir):
    from dtaianomaly_spark.operators import evaluation as EV

    return EV.best_threshold_f1(_scored(spark, sf_dir))


# Sliding-window queries ---------------------------------------------------

SW_W, SW_S = 64, 32


def _q_sw_stats(spark, sf_dir):
    from dtaianomaly_spark.operators import windows as W

    return W.sliding_stats(
        C.token_arrays(spark, sf_dir).select(
            F.col("doc_id").cast("long").alias("doc_id"), "tokens", "n_tok"
        ),
        SW_W, SW_S,
    )


def _q_sw_reverse(spark, sf_dir):
    from dtaianomaly_spark.operators import windows as W

    arrays = C.token_arrays(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "tokens", "n_tok"
    )
    win = W.sliding_stats(arrays, SW_W, SW_S).select(
        "doc_id", "idx", F.col("sum").alias("score")
    )
    series_n = C.documents_series(spark, sf_dir)
    return W.reverse_scores(win, series_n, SW_W, SW_S)


def _q_ws_select_fft(spark, sf_dir):
    """Auto window-size (dominant FFT frequency) per series — Arrow
    kernel, rows-only check (FFT is not SQL-expressible)."""
    from dtaianomaly_spark.operators import windows as W

    return W.window_size_select(
        C.token_arrays(spark, sf_dir), "fft", default_window_size=16
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: all-tier zero-shuffle rollup of the sf0.001-derived corpus."""
    arrays = C.token_arrays(spark, SF0001)
    return T.rollup_tiers_map(arrays)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "rollup_raw": _q_rollup_raw,
        "rollup_1m": _q_rollup_1m,
        "rollup_1h": _q_rollup_1h,
        "rollup_map_raw": _q_rollup_map_raw,
        "gapfill_1m": _q_gapfill_1m,
        "median_method": _q_median_method,
        "pp_standard_scale": _q_pp_standard,
        "pp_minmax_scale": _q_pp_minmax,
        "pp_robust_scale": _q_pp_robust,
        "pp_moving_average": _q_pp_movavg,
        "pp_differencing": _q_pp_diff,
        "pp_undersample_rate": _q_pp_under_rate,
        "pp_undersample_nb": _q_pp_under_nb,
        "pp_paa32": _q_pp_paa,
        "pp_ema": _q_pp_ema,
        "th_contamination": _q_th_contamination,
        "th_top_n": _q_th_top_n,
        "ev_confusion": _q_ev_confusion,
        "ev_auc_roc": _q_ev_auc_roc,
        "ev_point_adjust_f1": _q_ev_point_adjust,
        "ev_best_f1": _q_ev_best_f1,
        "sw_stats": _q_sw_stats,
        "sw_reverse": _q_sw_reverse,
        "ws_select_fft": _q_ws_select_fft,
    }


def oracle_sql() -> dict[str, str]:
    gapfill = f"""
{C.TOKEN_SQL_CTE},
gappy AS (SELECT * FROM long_form WHERE pos % 7 != 3),
agg AS (
    SELECT doc_id, CAST(pos // 960 AS BIGINT) AS bucket,
        CAST(COUNT(value) AS BIGINT) AS cnt,
        CAST(SUM(value) AS BIGINT) AS sum,
        CAST(SUM(value * value) AS BIGINT) AS sumsq,
        CAST(MIN(value) AS BIGINT) AS min,
        CAST(MAX(value) AS BIGINT) AS max
    FROM gappy GROUP BY doc_id, bucket
),
grid AS (
    SELECT s.doc_id, CAST(g.bucket AS BIGINT) AS bucket
    FROM (SELECT doc_id, 64 + ((n_chars * 13) % 1985) AS n FROM documents) s,
         LATERAL (SELECT UNNEST(range(0, CAST(CEIL(s.n / 960.0) AS BIGINT))) AS bucket) g
)
SELECT grid.doc_id, grid.bucket,
       COALESCE(agg.cnt, 0) AS cnt,
       COALESCE(agg.sum, 0) AS sum,
       COALESCE(agg.sumsq, 0) AS sumsq,
       agg.min AS min, agg.max AS max,
       CASE WHEN agg.cnt IS NULL THEN NULL ELSE {_MEAN.replace('sum', 'agg.sum').replace('cnt', 'agg.cnt')} END AS mean,
       CASE WHEN agg.cnt IS NULL THEN NULL ELSE
           sqrt(greatest(CAST(agg.sumsq AS DOUBLE) / agg.cnt
                - (CAST(agg.sum AS DOUBLE) / agg.cnt) * (CAST(agg.sum AS DOUBLE) / agg.cnt), 0.0)) END AS std
FROM grid LEFT JOIN agg ON grid.doc_id = agg.doc_id AND grid.bucket = agg.bucket
"""

    median = f"""
{C.TOKEN_SQL_CTE},
stats AS (
    SELECT doc_id, pos, value,
        CAST(COUNT(value) OVER w AS BIGINT) AS cnt,
        CAST(SUM(value) OVER w AS BIGINT) AS sum,
        CAST(SUM(value * value) OVER w AS BIGINT) AS sumsq
    FROM long_form
    WINDOW w AS (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN 16 PRECEDING AND 16 FOLLOWING)
)
SELECT doc_id, pos,
    CASE WHEN {_STD} = 0.0 THEN 0.0
         ELSE abs(CAST(value AS DOUBLE) - ({_MEAN})) / ({_STD}) END AS score
FROM stats
"""

    _F1 = ("CASE WHEN 2 * tp + fp + fn = 0 THEN 0.0 "
           "ELSE CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn) END")
    _PREC = "CASE WHEN tp + fp = 0 THEN 0.0 ELSE CAST(tp AS DOUBLE) / (tp + fp) END"
    _REC = "CASE WHEN tp + fn = 0 THEN 0.0 ELSE CAST(tp AS DOUBLE) / (tp + fn) END"

    _SERIES_PARTIALS = """
st AS (
    SELECT doc_id, CAST(COUNT(value) AS BIGINT) AS cnt,
           CAST(SUM(value) AS BIGINT) AS sum,
           CAST(SUM(value * value) AS BIGINT) AS sumsq,
           CAST(MIN(value) AS BIGINT) AS mn, CAST(MAX(value) AS BIGINT) AS mx
    FROM long_form GROUP BY doc_id
)"""

    pp_standard = f"""
{C.TOKEN_SQL_CTE},
{_SERIES_PARTIALS},
d AS (SELECT doc_id, {_MEAN} AS mean, {_STD} AS std FROM st)
SELECT l.doc_id, l.pos,
       CASE WHEN d.std < 1e-09 THEN CAST(l.value AS DOUBLE)
            ELSE (CAST(l.value AS DOUBLE) - d.mean) / d.std END AS out
FROM long_form l JOIN d ON l.doc_id = d.doc_id
"""

    pp_minmax = f"""
{C.TOKEN_SQL_CTE},
{_SERIES_PARTIALS}
SELECT l.doc_id, l.pos,
       CASE WHEN st.mn = st.mx THEN CAST(l.value AS DOUBLE)
            ELSE CAST(l.value - st.mn AS DOUBLE) / CAST(st.mx - st.mn AS DOUBLE) END AS out
FROM long_form l JOIN st ON l.doc_id = st.doc_id
"""

    pp_robust = f"""
{C.TOKEN_SQL_CTE},
q AS (
    SELECT doc_id, quantile_cont(value, 0.25) AS qlo,
           quantile_cont(value, 0.5) AS med, quantile_cont(value, 0.75) AS qhi
    FROM long_form GROUP BY doc_id
)
SELECT l.doc_id, l.pos,
       CASE WHEN q.qhi - q.qlo = 0.0 THEN CAST(l.value AS DOUBLE)
            ELSE (CAST(l.value AS DOUBLE) - q.med) / (q.qhi - q.qlo) END AS out
FROM long_form l JOIN q ON l.doc_id = q.doc_id
"""

    pp_movavg = f"""
{C.TOKEN_SQL_CTE},
stats AS (
    SELECT doc_id, pos, CAST(SUM(value) OVER w AS BIGINT) AS sum,
           CAST(COUNT(value) OVER w AS BIGINT) AS cnt
    FROM long_form
    WINDOW w AS (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN 4 PRECEDING AND 3 FOLLOWING)
)
SELECT doc_id, pos, {_MEAN} AS out FROM stats
"""

    pp_diff = f"""
{C.TOKEN_SQL_CTE},
d1 AS (
    SELECT doc_id, pos,
           value - COALESCE(LAG(value, 3) OVER (PARTITION BY doc_id ORDER BY pos), value) AS out
    FROM long_form
),
d2 AS (
    SELECT doc_id, pos,
           out - COALESCE(LAG(out, 3) OVER (PARTITION BY doc_id ORDER BY pos), out) AS out
    FROM d1
)
SELECT doc_id, pos, CAST(out AS BIGINT) AS out FROM d2
"""

    pp_under_rate = f"""
{C.TOKEN_SQL_CTE}
SELECT doc_id, CAST(pos // 4 AS BIGINT) AS pos, value
FROM long_form WHERE pos % 4 = 0
"""

    pp_under_nb = f"""
{C.TOKEN_SQL_CTE},
idx AS (
    SELECT s.doc_id, k.k,
           CASE WHEN s.n <= 100 THEN k.k
                WHEN k.k = 100 - 1 THEN CAST(s.n - 1 AS BIGINT)
                ELSE CAST(floor(k.k * (CAST(s.n - 1 AS DOUBLE) / (100 - 1))) AS BIGINT)
           END AS pos
    FROM series s, LATERAL (SELECT UNNEST(range(0, 100)) AS k) k
)
SELECT i.doc_id, CAST(i.k AS BIGINT) AS pos, l.value
FROM idx i JOIN long_form l ON i.doc_id = l.doc_id AND i.pos = l.pos
"""

    pp_paa = f"""
{C.TOKEN_SQL_CTE},
framed AS (
    SELECT doc_id,
           CAST(CASE WHEN n <= 32 THEN pos ELSE ((pos + 1) * 32 - 1) // n END AS BIGINT) AS frame,
           value
    FROM long_form
),
agg AS (
    SELECT doc_id, frame, CAST(COUNT(value) AS BIGINT) AS cnt,
           CAST(SUM(value) AS BIGINT) AS sum
    FROM framed GROUP BY doc_id, frame
)
SELECT doc_id, frame, cnt, sum, {_MEAN} AS out FROM agg
"""

    _CONTAM_CUT = """
ranked AS (
    SELECT doc_id, pos, value AS score,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY value) - 1 AS rk,
           COUNT(*) OVER (PARTITION BY doc_id) AS cnt
    FROM long_form
),
wi AS (SELECT *, 0.95 * (cnt - 1) AS idx FROM ranked),
cut AS (
    SELECT doc_id, MIN(score) AS lo, MAX(score) AS hi, MIN(idx) AS idx
    FROM wi WHERE rk = floor(idx) OR rk = ceil(idx) GROUP BY doc_id
),
cutv AS (
    SELECT doc_id,
           CAST(lo AS DOUBLE) + (CAST(hi AS DOUBLE) - CAST(lo AS DOUBLE)) * (idx - floor(idx)) AS cutoff
    FROM cut
)"""

    th_contamination = f"""
{C.TOKEN_SQL_CTE},
{_CONTAM_CUT}
SELECT l.doc_id, l.pos,
       CASE WHEN CAST(l.value AS DOUBLE) >= c.cutoff THEN 1 ELSE 0 END AS label
FROM long_form l JOIN cutv c ON l.doc_id = c.doc_id
"""

    _TOPN_CUT = """
cut AS (
    SELECT doc_id, score AS cutoff FROM (
        SELECT doc_id, value AS score,
               ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY value DESC) AS rk
        FROM long_form
    ) WHERE rk = 20
)"""

    th_top_n = f"""
{C.TOKEN_SQL_CTE},
{_TOPN_CUT}
SELECT l.doc_id, l.pos,
       CASE WHEN l.value >= c.cutoff THEN 1 ELSE 0 END AS label
FROM long_form l JOIN cut c ON l.doc_id = c.doc_id
"""

    _CONFUSION = f"""
agg AS (
    SELECT doc_id,
        CAST(SUM(CASE WHEN label = 1 AND truth = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        CAST(SUM(CASE WHEN label = 1 AND truth = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        CAST(SUM(CASE WHEN label = 0 AND truth = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
        CAST(SUM(CASE WHEN label = 0 AND truth = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
    FROM lab GROUP BY doc_id
)
SELECT doc_id, tp, fp, fn, tn, {_PREC} AS precision, {_REC} AS recall, {_F1} AS f1
FROM agg
"""

    ev_confusion = f"""
{C.TOKEN_SQL_CTE},
{_TOPN_CUT},
lab AS (
    SELECT l.doc_id, l.pos,
           CASE WHEN l.value >= c.cutoff THEN 1 ELSE 0 END AS label,
           CASE WHEN {_SPIKE.replace('doc_id', 'l.doc_id').replace('pos', 'l.pos')} THEN 1 ELSE 0 END AS truth
    FROM long_form l JOIN cut c ON l.doc_id = c.doc_id
),
{_CONFUSION}
"""

    ev_auc_roc = f"""
{C.TOKEN_SQL_CTE},
ranked AS (
    SELECT doc_id,
           CASE WHEN {_SPIKE} THEN 1 ELSE 0 END AS truth,
           2 * RANK() OVER (PARTITION BY doc_id ORDER BY value)
             + COUNT(*) OVER (PARTITION BY doc_id, value) - 1 AS mr2
    FROM long_form
),
agg AS (
    SELECT doc_id,
        CAST(SUM(CASE WHEN truth = 1 THEN mr2 ELSE 0 END) AS BIGINT) AS sum_mr2,
        CAST(SUM(CASE WHEN truth = 1 THEN 1 ELSE 0 END) AS BIGINT) AS p,
        CAST(SUM(CASE WHEN truth = 0 THEN 1 ELSE 0 END) AS BIGINT) AS neg
    FROM ranked GROUP BY doc_id
)
SELECT doc_id,
       (CAST(sum_mr2 AS DOUBLE) / 2 - CAST(p AS DOUBLE) * (p + 1) / 2)
       / (CAST(p AS DOUBLE) * neg) AS auc
FROM agg WHERE p > 0 AND neg > 0
"""

    ev_point_adjust = f"""
{C.TOKEN_SQL_CTE},
{_CONTAM_CUT},
lab0 AS (
    SELECT l.doc_id, l.pos,
           CASE WHEN CAST(l.value AS DOUBLE) >= c.cutoff THEN 1 ELSE 0 END AS label,
           CASE WHEN l.pos % 50 < 5 THEN 1 ELSE 0 END AS truth
    FROM long_form l JOIN cutv c ON l.doc_id = c.doc_id
),
chg AS (
    SELECT doc_id, pos, truth, label,
           CASE WHEN truth != COALESCE(LAG(truth) OVER (PARTITION BY doc_id ORDER BY pos), -1)
                THEN 1 ELSE 0 END AS is_chg
    FROM lab0
),
ev AS (
    SELECT doc_id, pos, truth, label,
           SUM(is_chg) OVER (PARTITION BY doc_id ORDER BY pos) AS event
    FROM chg
),
lab AS (
    SELECT doc_id, pos, truth,
           CASE WHEN truth = 1 THEN MAX(label) OVER (PARTITION BY doc_id, event)
                ELSE label END AS label
    FROM ev
),
{_CONFUSION}
"""

    ev_best_f1 = f"""
{C.TOKEN_SQL_CTE},
per_score AS (
    SELECT doc_id, value AS score, CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(CASE WHEN {_SPIKE} THEN 1 ELSE 0 END) AS BIGINT) AS pos_cnt
    FROM long_form GROUP BY doc_id, value
),
cum AS (
    SELECT doc_id,
           SUM(pos_cnt) OVER wd AS tp,
           SUM(cnt) OVER wd - SUM(pos_cnt) OVER wd AS fp,
           SUM(pos_cnt) OVER wall - SUM(pos_cnt) OVER wd AS fn
    FROM per_score
    WINDOW wd AS (PARTITION BY doc_id ORDER BY score DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           wall AS (PARTITION BY doc_id)
)
SELECT doc_id, MAX({_F1}) AS best_f1 FROM cum GROUP BY doc_id
"""

    _SW_GRID = """
wins AS (
    SELECT doc_id, n,
           CASE WHEN n <= 64 THEN 1 ELSE (n - 64 + 31) // 32 + 1 END AS nw
    FROM series
),
wstart AS (
    SELECT w.doc_id, CAST(g.idx AS BIGINT) AS idx,
           CAST(CASE WHEN g.idx = w.nw - 1 THEN w.n - 64 ELSE g.idx * 32 END AS BIGINT) AS start
    FROM wins w, LATERAL (SELECT UNNEST(range(0, CAST(w.nw AS BIGINT))) AS idx) g
)"""

    sw_stats = f"""
{C.TOKEN_SQL_CTE},
{_SW_GRID},
agg AS (
    SELECT w.doc_id, w.idx, w.start,
        CAST(COUNT(l.value) AS BIGINT) AS cnt,
        CAST(SUM(l.value) AS BIGINT) AS sum,
        CAST(SUM(l.value * l.value) AS BIGINT) AS sumsq,
        CAST(MIN(l.value) AS BIGINT) AS min,
        CAST(MAX(l.value) AS BIGINT) AS max
    FROM wstart w JOIN long_form l
      ON w.doc_id = l.doc_id AND l.pos >= w.start AND l.pos < w.start + 64
    GROUP BY w.doc_id, w.idx, w.start
)
SELECT doc_id, idx, start, cnt, sum, sumsq, min, max,
       {_MEAN} AS mean, {_STD} AS std
FROM agg
"""

    sw_reverse = f"""
{C.TOKEN_SQL_CTE},
{_SW_GRID},
ws AS (
    SELECT w.doc_id, w.idx, CAST(SUM(l.value) AS BIGINT) AS score
    FROM wstart w JOIN long_form l
      ON w.doc_id = l.doc_id AND l.pos >= w.start AND l.pos < w.start + 64
    GROUP BY w.doc_id, w.idx
),
cum AS (
    SELECT doc_id, idx,
           SUM(score) OVER (PARTITION BY doc_id ORDER BY idx) AS cs
    FROM ws
),
nwt AS (SELECT doc_id, MAX(idx) AS max_idx FROM ws GROUP BY doc_id),
posn AS (
    SELECT l.doc_id, l.pos,
        LEAST(CASE WHEN l.pos >= 64 THEN (l.pos - 64) // 32 + 1 ELSE CAST(0 AS BIGINT) END,
              t.max_idx + 1) AS a,
        LEAST(CASE WHEN l.pos < l.n - 64 THEN l.pos // 32 + 1 ELSE t.max_idx + 1 END,
              t.max_idx + 1) AS b
    FROM long_form l JOIN nwt t ON l.doc_id = t.doc_id
)
SELECT p.doc_id, p.pos,
       CAST(cb.cs - COALESCE(ca.cs, CAST(0 AS BIGINT)) AS DOUBLE) / (p.b - p.a) AS score
FROM posn p
JOIN cum cb ON p.doc_id = cb.doc_id AND cb.idx + 1 = p.b
LEFT JOIN cum ca ON p.doc_id = ca.doc_id AND ca.idx + 1 = p.a
"""

    return {
        "rollup_raw": _rollup_oracle(16, "raw"),
        "rollup_1m": _rollup_oracle(960, "1m"),
        "rollup_1h": _rollup_oracle(57600, "1h"),
        "rollup_map_raw": _rollup_oracle(16, "raw"),
        "gapfill_1m": gapfill,
        "median_method": median,
        "pp_standard_scale": pp_standard,
        "pp_minmax_scale": pp_minmax,
        "pp_robust_scale": pp_robust,
        "pp_moving_average": pp_movavg,
        "pp_differencing": pp_diff,
        "pp_undersample_rate": pp_under_rate,
        "pp_undersample_nb": pp_under_nb,
        "pp_paa32": pp_paa,
        "th_contamination": th_contamination,
        "th_top_n": th_top_n,
        "ev_confusion": ev_confusion,
        "ev_auc_roc": ev_auc_roc,
        "ev_point_adjust_f1": ev_point_adjust,
        "ev_best_f1": ev_best_f1,
        "sw_stats": sw_stats,
        "sw_reverse": sw_reverse,
    }
