"""Local stand-in for the driver's correctness pass: run queries()
vs oracle_sql() side by side on a small SF and report row/schema/value
matches. Usage: python scripts/oracle_check.py [sf_dir] [query ...]
"""
from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")
import __spark_entry__ as E  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)]
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    pdf = pdf.sort_values(list(pdf.columns)).reset_index(drop=True)
    for c in pdf.columns:
        if np.issubdtype(pdf[c].dtype, np.floating):
            pdf[c] = pdf[c].round(6)
    return pdf


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:]
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .appName("oracle_check")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, os_ = E.queries(), E.oracle_sql()
    if not names:
        names = [n for n in qs if n in os_]
    fails = []
    for n in names:
        try:
            sp = _canon(qs[n](spark, sf_dir).toPandas())
            if n not in os_:
                print(f"{n}: rows={len(sp)} (no oracle)")
                continue
            du = _canon(con.execute(os_[n]).fetchdf())
            rows = len(sp) == len(du)
            schema = list(sp.columns) == list(du.columns) and all(
                str(a) == str(b) for a, b in zip(sp.dtypes, du.dtypes)
            )
            vals = rows and schema and sp.equals(du)
            if not vals and rows and schema:
                # tolerate tiny float diffs
                vals = True
                for c in sp.columns:
                    if np.issubdtype(sp[c].dtype, np.floating):
                        if not np.allclose(sp[c], du[c], rtol=1e-9, atol=1e-9, equal_nan=True):
                            vals = False
                    elif not sp[c].equals(du[c]):
                        vals = False
            status = "OK" if (rows and schema and vals) else "FAIL"
            if status == "FAIL":
                fails.append(n)
                print(f"{n}: {status} rows={rows}({len(sp)}/{len(du)}) schema={schema} vals={vals}")
                if rows and not schema:
                    print("  spark:", list(zip(sp.columns, map(str, sp.dtypes))))
                    print("  duck :", list(zip(du.columns, map(str, du.dtypes))))
            else:
                print(f"{n}: OK ({len(sp)} rows)")
        except Exception as ex:  # noqa: BLE001
            fails.append(n)
            print(f"{n}: ERROR {type(ex).__name__}: {ex}")
    print(f"\n{len(names) - len(fails)}/{len(names)} ok; fails: {fails}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
