"""Z-order (Morton-curve) clustering layout — the multi-dimensional
file-pruning maintenance op (Delta's ``OPTIMIZE ZORDER BY``, Iceberg's
``rewrite_data_files(strategy => 'sort', sort_order => zorder(...))``)
rebuilt from first principles for the rollup tier.

Why it matters at 100 TB: a rollup table range-partitioned by
``doc_id`` prunes per-series scans perfectly but a per-time-window scan
("bucket BETWEEN a AND b across all series") touches EVERY file; laid
out by ``bucket`` it's the reverse. Interleaving the bits of both keys
(the Morton code) makes file min/max ranges cover roughly square tiles
of the (doc_id, bucket) plane, so BOTH scan shapes prune — the classic
space-filling-curve trade: each dimension's pruning degrades from
perfect to ~sqrt(files), instead of one perfect and one total scan.

Everything is expression-only integer arithmetic: the bit-spread is a
fixed ladder of ``shiftleft``/``&`` masks (the standard magic-number
interleave), the layout is one ``repartitionByRange`` on the Morton
key, and the pruning evidence is read back from real parquet footers
(min/max per file) — see :func:`file_ranges` and
:func:`files_touched`. Cited reference surface: the reference engine
stores each dataset as one flat file per series
(``dtaianomaly/data/UCRLoader.py`` path-per-dataset); multi-dim layout
is a concern its single-machine design never meets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# 64-bit magic-mask bit-spread (Morton encode): after the ladder each
# input bit i of a 31-bit int sits at position 2i. Shared verbatim with
# the plain-Python twin in the tests.
_SPREAD_STEPS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)

MORTON_BITS = 31  # 2x31 = 62 bits -> fits a BIGINT with headroom


def _spread_sql(col: str) -> str:
    """The bit-spread ladder as one nested SQL expression."""
    e = f"CAST({col} AS BIGINT)"
    for shift, mask in _SPREAD_STEPS:
        e = f"((({e}) | shiftleft(({e}), {shift})) & {mask})"
    return e


def morton_expr(col_a: str, col_b: str) -> str:
    """Morton interleave of two non-negative ints (< 2^31): a's bits on
    even positions, b's on odd. Pure integer expression — usable in any
    select/orderBy; raises nothing itself (the caller guards range)."""
    return (
        f"({_spread_sql(col_a)} | shiftleft({_spread_sql(col_b)}, 1))"
    )


def zorder_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 16,
) -> None:
    """Materialize ``df`` at ``path`` clustered by the Morton code of
    (``col_a``, ``col_b``): compute the key, ``repartitionByRange`` on
    it (one range shuffle — each output file owns a contiguous Morton
    range, i.e. a tile of the plane), sort within partitions, drop the
    key, write parquet. Both columns must be non-negative and < 2^31
    (rollup doc ids / bucket ids after dictionary-encoding at scale);
    violations fail the job via an ANSI assertion column rather than
    silently corrupting the curve."""
    guarded = df.withColumn(
        "_zkey",
        F.expr(
            f"CASE WHEN {col_a} >= 0 AND {col_a} < {1 << MORTON_BITS}"
            f" AND {col_b} >= 0 AND {col_b} < {1 << MORTON_BITS}"
            f" THEN {morton_expr(col_a, col_b)}"
            f" ELSE raise_error(concat('zorder key out of range: ',"
            f" CAST({col_a} AS STRING), ',', CAST({col_b} AS STRING)))"
            f" END"
        ),
    )
    (
        guarded.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def linear_write(
    df: DataFrame, path: str, col: str, n_files: int = 16
) -> None:
    """The single-dimension baseline layout: range-partitioned and
    sorted by ``col`` alone (perfect pruning on ``col``, none on the
    other dimension) — what :func:`zorder_write` is compared against."""
    (
        df.repartitionByRange(n_files, col)
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .parquet(path)
    )


def file_ranges(
    spark: SparkSession, path: str, col_a: str, col_b: str
) -> DataFrame:
    """Per-file (min, max) of both layout columns, read from the data
    itself via ``input_file_name()`` — the same statistics a footer-
    aware scanner prunes with (parquet row-group stats), surfaced as a
    DataFrame so tests and operators can reason about them."""
    return (
        spark.read.parquet(path)
        .select(
            F.input_file_name().alias("file"),
            F.col(col_a).alias("a"),
            F.col(col_b).alias("b"),
        )
        .groupBy("file")
        .agg(
            F.min("a").alias("min_a"), F.max("a").alias("max_a"),
            F.min("b").alias("min_b"), F.max("b").alias("max_b"),
        )
    )


def files_touched(
    ranges: DataFrame,
    a_lo: int, a_hi: int, b_lo: int, b_hi: int,
) -> int:
    """How many files a box query (a in [a_lo, a_hi], b in [b_lo,
    b_hi]) must read under min/max pruning: count files whose stats
    ranges intersect the box. The number a Delta/Iceberg data-skipping
    scan would open."""
    return ranges.filter(
        (F.col("max_a") >= a_lo) & (F.col("min_a") <= a_hi)
        & (F.col("max_b") >= b_lo) & (F.col("min_b") <= b_hi)
    ).count()
