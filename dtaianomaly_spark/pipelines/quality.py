"""Declarative data-quality constraint engine — the Deequ /
Great-Expectations capability a training-data pipeline runs before
anything else touches a snapshot, rebuilt Spark-first: a check suite
(completeness, uniqueness, value range, set membership, referential
integrity) COMPILES into one conditional-aggregate pass per table plus
one left-anti-style aggregate per referential rule — never a pass per
check, which is the difference between auditing 100 TB once and
auditing it |checks| times.

Exactness discipline: every metric is an exact integer (numerator,
denominator) pair; the reported fraction is the engine's one shared
float divide, and pass/fail is decided by INTEGER cross-multiplication
against the rational threshold (den·num_ok ≥ t_num·den_total — no
float ever gates a decision), so the DuckDB oracle reproduces
metrics AND verdicts bit-for-bit.

Check spec: a tuple (check_id, kind, params):
  ("c1", "completeness", {"col": "o_custkey", "threshold": (1, 1)})
  ("c2", "uniqueness",   {"col": "o_orderkey", "threshold": (1, 1)})
  ("c3", "in_range",     {"expr": "...BIGINT expr...", "lo": 0, "hi": 10**12,
                           "threshold": (999, 1000)})
  ("c4", "in_set",       {"col": "o_orderstatus", "values": [...],
                           "threshold": (1, 1)})
  ("c5", "referential",  {"col": "l_orderkey", "ref": other_df,
                           "ref_col": "o_orderkey", "threshold": (1, 1)})

Output: (check_id, kind, column, n_ok, n_total, metric, passed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dq_report(df: DataFrame, checks: list) -> DataFrame:
    """Compile ``checks`` against ``df``. Row-level checks fold into
    ONE aggregate over the table; ``uniqueness`` adds one distinct
    aggregate; each ``referential`` check adds one semi-join
    aggregate against its (deduplicated, broadcast when small)
    reference keys. Everything integer until the final shared
    divide."""
    aggs = []
    meta = []  # (check_id, kind, column, t_num, t_den, ok_idx, tot_idx)
    extra_frames = []
    for check_id, kind, p in checks:
        t_num, t_den = p.get("threshold", (1, 1))
        if kind == "completeness":
            col = p["col"]
            aggs.append(F.sum(
                F.expr(f"CASE WHEN {col} IS NOT NULL THEN 1 ELSE 0 END")
            ).cast("long").alias(f"ok_{check_id}"))
            aggs.append(F.count(F.lit(1)).cast("long").alias(f"tot_{check_id}"))
            meta.append((check_id, kind, col, t_num, t_den))
        elif kind == "in_range":
            ex = p.get("expr") or p["col"]
            lo, hi = int(p["lo"]), int(p["hi"])
            aggs.append(F.sum(F.expr(
                f"CASE WHEN ({ex}) BETWEEN {lo} AND {hi}"
                " THEN 1 ELSE 0 END"
            )).cast("long").alias(f"ok_{check_id}"))
            aggs.append(F.count(F.lit(1)).cast("long").alias(f"tot_{check_id}"))
            meta.append((check_id, kind, p.get("col", "expr"), t_num, t_den))
        elif kind == "in_set":
            col = p["col"]
            vals = ", ".join(f"'{v}'" for v in p["values"])
            aggs.append(F.sum(F.expr(
                f"CASE WHEN {col} IN ({vals}) THEN 1 ELSE 0 END"
            )).cast("long").alias(f"ok_{check_id}"))
            aggs.append(F.count(F.lit(1)).cast("long").alias(f"tot_{check_id}"))
            meta.append((check_id, kind, col, t_num, t_den))
        elif kind == "uniqueness":
            col = p["col"]
            aggs.append(
                F.countDistinct(F.col(col)).cast("long")
                .alias(f"ok_{check_id}")
            )
            aggs.append(F.sum(
                F.expr(f"CASE WHEN {col} IS NOT NULL THEN 1 ELSE 0 END")
            ).cast("long").alias(f"tot_{check_id}"))
            meta.append((check_id, kind, col, t_num, t_den))
        elif kind == "referential":
            col, ref, ref_col = p["col"], p["ref"], p["ref_col"]
            keys = ref.select(F.col(ref_col).alias(col)).distinct()
            matched = (
                df.select(col)
                .join(F.broadcast(keys), col, "left_semi")
                .agg(F.count(F.lit(1)).cast("long").alias(f"ok_{check_id}"))
            )
            total = df.agg(
                F.count(F.lit(1)).cast("long").alias(f"tot_{check_id}")
            )
            extra_frames.append(
                (check_id, kind, col, t_num, t_den,
                 matched.crossJoin(total).localCheckpoint(eager=False))
            )
        else:
            raise ValueError(f"unknown check kind {kind!r}")
    rows = []
    if aggs:
        # lazy checkpoint: the 1-row aggregate is read by ONE union
        # branch per check — without it each branch re-plans (and
        # re-scans for) the whole aggregate
        base = df.agg(*aggs).localCheckpoint(eager=False)
        for check_id, kind, col, t_num, t_den in meta:
            rows.append(base.select(
                F.lit(check_id).alias("check_id"),
                F.lit(kind).alias("kind"),
                F.lit(col).alias("column"),
                F.col(f"ok_{check_id}").alias("n_ok"),
                F.col(f"tot_{check_id}").alias("n_total"),
                F.expr(
                    f"CAST(ok_{check_id} AS DOUBLE) / tot_{check_id}"
                ).alias("metric"),
                # integer cross-multiplied verdict: den*ok >= num*total
                F.expr(
                    f"CAST({t_den} * ok_{check_id} >="
                    f" {t_num} * tot_{check_id} AS BIGINT)"
                ).alias("passed"),
            ))
    for check_id, kind, col, t_num, t_den, frame in extra_frames:
        rows.append(frame.select(
            F.lit(check_id).alias("check_id"),
            F.lit(kind).alias("kind"),
            F.lit(col).alias("column"),
            F.col(f"ok_{check_id}").alias("n_ok"),
            F.col(f"tot_{check_id}").alias("n_total"),
            F.expr(
                f"CAST(ok_{check_id} AS DOUBLE) / tot_{check_id}"
            ).alias("metric"),
            F.expr(
                f"CAST({t_den} * ok_{check_id} >="
                f" {t_num} * tot_{check_id} AS BIGINT)"
            ).alias("passed"),
        ))
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def dq_profile(df: DataFrame, columns: list) -> DataFrame:
    """Column profiler (the Deequ/GE profiling half that FEEDS check
    authoring): per column — row count, nulls, exact distinct count,
    and for string columns the length min/max and exact integer length
    sum (mean via the shared divide). ONE aggregate pass computes
    every column's counters side by side (column-stacked output via a
    checkpointed 1-row frame, like :func:`dq_report`); the distinct
    counts ride the same pass as Expand-planned distinct aggregates.

    Output: (column, n_rows, n_nulls, n_distinct, len_min, len_max,
    len_sum, len_mean) — length fields NULL for non-string columns."""
    if not columns:
        raise ValueError("need at least one column")
    str_cols = {
        f.name for f in df.schema.fields if f.dataType.simpleString() == "string"
    }
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for c in columns:
        aggs.append(F.sum(
            F.expr(f"CASE WHEN {c} IS NULL THEN 1 ELSE 0 END")
        ).cast("long").alias(f"nul_{c}"))
        aggs.append(F.countDistinct(F.col(c)).cast("long").alias(f"nd_{c}"))
        if c in str_cols:
            aggs.append(F.min(F.length(c)).cast("long").alias(f"lmin_{c}"))
            aggs.append(F.max(F.length(c)).cast("long").alias(f"lmax_{c}"))
            aggs.append(F.sum(F.length(c)).cast("long").alias(f"lsum_{c}"))
    base = df.agg(*aggs).localCheckpoint(eager=False)
    rows = []
    for c in columns:
        if c in str_cols:
            lmin, lmax, lsum = f"lmin_{c}", f"lmax_{c}", f"lsum_{c}"
            lmean = (
                f"CAST({lsum} AS DOUBLE) / (_n - nul_{c})"
            )
        else:
            lmin = lmax = lsum = "CAST(NULL AS BIGINT)"
            lmean = "CAST(NULL AS DOUBLE)"
        rows.append(base.select(
            F.lit(c).alias("column"),
            F.col("_n").alias("n_rows"),
            F.col(f"nul_{c}").alias("n_nulls"),
            F.col(f"nd_{c}").alias("n_distinct"),
            F.expr(lmin).alias("len_min"),
            F.expr(lmax).alias("len_max"),
            F.expr(lsum).alias("len_sum"),
            F.expr(lmean).alias("len_mean"),
        ))
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out
