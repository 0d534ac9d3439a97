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

    return {
        "rollup_raw": _rollup_oracle(16, "raw"),
        "rollup_1m": _rollup_oracle(960, "1m"),
        "rollup_1h": _rollup_oracle(57600, "1h"),
        "rollup_map_raw": _rollup_oracle(16, "raw"),
        "gapfill_1m": gapfill,
        "median_method": median,
    }
