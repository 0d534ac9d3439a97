"""Event-time windowed aggregation with a watermark — the BUILT-IN
Structured Streaming late-data path, complementing the custom
``applyInPandasWithState`` operators (streaming/stateful.py) which key
completion on processing-time/count.

Where the stateful rollup completes a bucket when its point count
arrives, this operator completes a window when EVENT TIME passes it:
``withWatermark(ts, delay)`` bounds how late a row may arrive, the
engine drops state for windows older than ``max(event time) - delay``,
and in append mode each window emits exactly once when the watermark
crosses its end. That is the right completion rule for wall-clock
telemetry (the events table) where counts per window are unknown a
priori — and the watermark is what bounds state at 100 TB: without it
an event-time groupBy would keep every window ever seen.

The aggregate mirrors ``pipelines/events.minute_rollup`` exactly (same
integer quantization, same stats), so completed windows byte-match the
batch rollup on the same rows (tested), and late rows beyond the
watermark are DROPPED — re-ingesting an old file after the watermark
has passed adds nothing (tested), the documented contract for a
dedup-free replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["stream_minute_rollup"]


def stream_minute_rollup(
    events_stream: DataFrame, watermark: str = "5 minutes"
) -> DataFrame:
    """events stream -> append stream of completed 1-minute windows per
    event type, identical columns to the batch ``minute_rollup``
    (bucket = epoch minute). A window's row emits exactly once, when
    the watermark (max observed event time minus ``watermark``) passes
    the window end; rows arriving later than the watermark are dropped.
    State is bounded by the number of windows inside the watermark
    horizon per event type — independent of stream length."""
    typed = (
        events_stream.select(
            "event_type",
            F.col("ts").cast("timestamp").alias("ts"),
            F.expr("CAST(floor(value * 1000) AS BIGINT)").alias("mval"),
        )
        .withWatermark("ts", watermark)
    )
    return (
        typed.groupBy(F.window("ts", "1 minute").alias("w"), "event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.sum("mval").alias("vsum"),
            F.min("mval").alias("vmin"),
            F.max("mval").alias("vmax"),
        )
        .select(
            "event_type",
            F.expr("unix_micros(w.start) DIV 60000000").alias("bucket"),
            "cnt", "vsum", "vmin", "vmax",
        )
    )


# ---------------------------------------------------------------- funnel
# Streaming twin #20: the strict-order signup→click→purchase funnel
# (pipelines/events.py:funnel_conversion) as a per-user
# applyInPandasWithState operator. State per user is O(1): the three
# step timestamps (t1, t2, t3), the cumulative event count and the last
# seen timestamp (in-order guard). With per-user time-ordered delivery
# the greedy update IS the batch semantics: t1 = first signup,
# t2 = first click strictly after t1, t3 = first purchase strictly
# after t2 — each pinned once, exactly the MIN-after-previous-step
# chain the batch query aggregates.

import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

FUNNEL_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_seen", LongType(), False),
        StructField("t1", LongType(), True),
        StructField("t2", LongType(), True),
        StructField("t3", LongType(), True),
    ]
)

FUNNEL_STATE_SCHEMA = StructType(
    [
        StructField("t1", LongType(), True),
        StructField("t2", LongType(), True),
        StructField("t3", LongType(), True),
        StructField("n_seen", LongType(), True),
        StructField("last_ts", LongType(), True),
    ]
)


def _funnel_update(key, pdfs, state: GroupState):
    user_id = key[0]
    if state.hasTimedOut:
        state.remove()
        return
    if state.exists:
        t1, t2, t3, n_seen, last_ts = state.get
    else:
        t1 = t2 = t3 = None
        n_seen, last_ts = 0, -1
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if not chunks:
        return
    batch = pd.concat(chunks).sort_values(["ts_us", "event_id"])
    for ts, et in zip(batch["ts_us"], batch["event_type"]):
        ts = int(ts)
        if ts < last_ts:
            raise ValueError(
                f"streaming funnel requires per-user time-ordered"
                f" delivery; user {user_id} saw ts {ts} after {last_ts}"
            )
        last_ts = ts
        n_seen += 1
        if t1 is None:
            if et == "signup":
                t1 = ts
        elif t2 is None:
            if et == "click" and ts > t1:
                t2 = ts
        elif t3 is None:
            if et == "purchase" and ts > t2:
                t3 = ts
    state.update((t1, t2, t3, n_seen, last_ts))
    yield pd.DataFrame(
        {
            "user_id": pd.Series([user_id], dtype="int64"),
            "n_seen": pd.Series([n_seen], dtype="int64"),
            "t1": pd.Series([t1], dtype="Int64"),
            "t2": pd.Series([t2], dtype="Int64"),
            "t3": pd.Series([t3], dtype="Int64"),
        }
    )


def stateful_funnel(stream_events):
    """Events stream (user_id, event_id, event_type, ts) → append
    stream of per-user funnel snapshots (n_seen, t1, t2, t3), one per
    (user, micro-batch). The latest snapshot per user reproduces the
    batch funnel EXACTLY: aggregating the final snapshots' step
    non-NULL counts equals ``funnel_conversion``'s KPI row, and every
    prefix snapshot equals the batch operator run over that prefix
    (pinned in pytest). State per user: three nullable int64 step
    timestamps + two counters."""
    ev = stream_events.select(
        "user_id", "event_id", "event_type",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("ts_us"),
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        _funnel_update,
        FUNNEL_OUT_SCHEMA,
        FUNNEL_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
