"""Regenerate the PLANS.md physical-plan audit table: for every
queries() entry, count Exchange nodes, detect Arrow python stages and
extract the parquet ReadSchema columns from .explain("formatted")."""
from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")
import __spark_entry__ as E  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from dtaianomaly_spark.session import get_spark

    spark = get_spark()
    rows = []
    for name, q in E.queries().items():
        try:
            # isolate each query's plan: a cache left materialized by an
            # earlier query (e.g. the funnel's shared shingle stage) makes
            # later plans expand the cached subtree in explain output and
            # inflates their exchange counts non-comparably
            spark.catalog.clearCache()
            df = q(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # noqa: BLE001
            rows.append((name, "ERR", "", str(ex)[:60]))
            continue
        exchanges = len(re.findall(r"\bExchange\b", plan.split("\n\n")[0]))
        arrow = bool(
            re.search(
                r"MapInArrow|MapInPandas|FlatMap(Co)?GroupsInPandas", plan
            )
        )
        cols = sorted(
            {
                c
                for m in re.findall(r"ReadSchema: struct<([^>]*)>", plan)
                for c in re.findall(r"(\w+):", m)
            }
        )
        rows.append((name, exchanges, "yes" if arrow else "", ",".join(cols)))
    print("| query | exchanges | arrow stage | scanned columns |")
    print("|---|---|---|---|")
    for name, ex, ar, cols in sorted(rows):
        print(f"| {name} | {ex} | {ar} | {cols} |")


if __name__ == "__main__":
    main()
