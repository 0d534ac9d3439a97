"""Bucketed materialization: the co-located-join story made executable.

At 100 TB the fact table is written ONCE bucketed by its join/agg key
(`bucketBy` + `sortBy`), and every subsequent key-matching join or
aggregate skips its shuffle entirely — Spark's scan reports the bucket
spec as the output partitioning, so Catalyst drops the Exchange. This
module materializes any DataFrame as a bucketed managed table and
exposes the check the tests assert: a self/fact join on the bucket key
over the bucketed table plans with ZERO Exchange on the bucketed sides.

(The parquet-plus-commit-log stand-in note in README applies here too:
`bucketBy` needs `saveAsTable`, i.e. the session catalog + warehouse
dir — all local-filesystem in this container, an Iceberg/HMS catalog on
a cluster.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Materialize ``df`` as a managed table bucketed (and optionally
    sorted) by ``key``. Overwrites an existing table of the same name."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    w = df.write.bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def exchanges_in_plan(df: DataFrame) -> int:
    """Count SHUFFLE Exchange operators in the final physical tree
    (BroadcastExchange moves only the small side and is not the shuffle
    the bucketing exists to remove)."""
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    tree = plan.split("\n\n")[0]
    return tree.count("Exchange") - tree.count("BroadcastExchange")


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str) -> DataFrame:
    """Equi-join of two tables bucketed on the same key with the same
    bucket count — plans shuffle-free (SortMergeJoin over the bucketed
    scans, no Exchange)."""
    return spark.table(left_table).join(spark.table(right_table), key)
