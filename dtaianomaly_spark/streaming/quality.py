"""Streaming twin #23: the data-quality gate on the INGEST path —
per-source monoid counters for the row-level checks of
``pipelines/quality.dq_report`` (completeness / in_range / in_set),
keyed by source so state stays |sources| × |checks| int64s and the
counters shard across the cluster instead of funnelling through one
task. Uniqueness and referential integrity are deliberately absent
from the streaming tier: they are not monoids over bounded state
(distinct-ness needs the key set) — run them in the batch gate, the
same split every production DQ system makes.

Each micro-batch emits the cumulative (n_ok, n_total) snapshot per
(source, check); because integer counter addition is associative and
commutative, every snapshot is EXACTLY the batch metric over the
prefix ingested so far (byte-matched in pytest), and the
cross-multiplied verdict rule is identical to the batch engine's.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType, LongType, StringType, StructField, StructType,
)

DQ_OUT_SCHEMA = StructType(
    [
        StructField("source", StringType(), False),
        StructField("check_id", StringType(), False),
        StructField("n_ok", LongType(), False),
        StructField("n_total", LongType(), False),
        StructField("passed", LongType(), False),
    ]
)

DQ_STATE_SCHEMA = StructType(
    [
        StructField("oks", ArrayType(LongType()), True),
        StructField("tots", ArrayType(LongType()), True),
    ]
)


def _compile_flags(checks: list):
    """Per-check SQL predicates (row passes -> 1) for the monoid
    subset; mirrors pipelines/quality.dq_report's expressions."""
    flags = []
    for check_id, kind, p in checks:
        t_num, t_den = p.get("threshold", (1, 1))
        if kind == "completeness":
            pred = f"CASE WHEN {p['col']} IS NOT NULL THEN 1 ELSE 0 END"
        elif kind == "in_range":
            ex = p.get("expr") or p["col"]
            pred = (
                f"CASE WHEN ({ex}) BETWEEN {int(p['lo'])} AND"
                f" {int(p['hi'])} THEN 1 ELSE 0 END"
            )
        elif kind == "in_set":
            vals = ", ".join(f"'{v}'" for v in p["values"])
            pred = f"CASE WHEN {p['col']} IN ({vals}) THEN 1 ELSE 0 END"
        else:
            raise ValueError(
                f"streaming DQ supports monoid checks only, got {kind!r}"
            )
        flags.append((check_id, pred, int(t_num), int(t_den)))
    return flags


def stateful_dq(stream_df, checks: list, source_col: str = "source"):
    """Document stream → append stream of cumulative per-(source,
    check) DQ counter snapshots. The per-row predicates evaluate
    JVM-side BEFORE the stateful operator (expression-only map), so
    the Python state update only adds pre-aggregated int columns."""
    flags = _compile_flags(checks)
    proj = stream_df.select(
        F.col(source_col).alias("source"),
        *[F.expr(pred).cast("long").alias(f"f{i}")
          for i, (_cid, pred, _n, _d) in enumerate(flags)],
    )
    n = len(flags)
    ids = [cid for cid, _p, _n, _d in flags]
    thr = [(tn, td) for _cid, _p, tn, td in flags]

    def update(key, pdfs, state: GroupState):
        source = key[0]
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            oks, tots = (list(v) for v in state.get)
        else:
            oks, tots = [0] * n, [0] * n
        got = False
        for pdf in pdfs:
            if not len(pdf):
                continue
            got = True
            for i in range(n):
                oks[i] += int(pdf[f"f{i}"].sum())
                tots[i] += len(pdf)
        if not got:
            return
        state.update((oks, tots))
        yield pd.DataFrame({
            "source": [source] * n,
            "check_id": ids,
            "n_ok": pd.Series(oks, dtype="int64"),
            "n_total": pd.Series(tots, dtype="int64"),
            "passed": pd.Series(
                [1 if thr[i][1] * oks[i] >= thr[i][0] * tots[i] else 0
                 for i in range(n)],
                dtype="int64",
            ),
        })

    return proj.groupBy("source").applyInPandasWithState(
        update, DQ_OUT_SCHEMA, DQ_STATE_SCHEMA, "append",
        GroupStateTimeout.NoTimeout,
    )
