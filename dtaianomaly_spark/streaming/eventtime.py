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
from pyspark.sql.types import (
    ArrayType, DoubleType, LongType, StringType, StructField, StructType,
)

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


# --------------------------------------------------------- rolling corr
# Streaming twin #21: the rolling-window Pearson of
# pipelines/events.py:rolling_corr_pairs as a per-pair
# applyInPandasWithState operator. State per (a_type, b_type): the ring
# of the last ``window`` (ca, cb) integer pairs + the next expected idx —
# window sums are recomputed from the ring in EXACT integer arithmetic,
# so the one shared float formula reproduces the batch operator
# bit-for-bit at every emitted index.

RCORR_OUT_SCHEMA = StructType(
    [
        StructField("a_type", StringType(), False),
        StructField("b_type", StringType(), False),
        StructField("idx", LongType(), False),
        StructField("n", LongType(), False),
        StructField("corr", DoubleType(), True),
    ]
)

RCORR_STATE_SCHEMA = StructType(
    [
        StructField("ring_a", ArrayType(LongType()), True),
        StructField("ring_b", ArrayType(LongType()), True),
        StructField("nxt", LongType(), True),
    ]
)


def _make_rcorr_update(window: int):
    import numpy as np

    def update(key, pdfs, state: GroupState):
        a_type, b_type = key
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            ring_a, ring_b, nxt = state.get
            ring_a, ring_b = list(ring_a), list(ring_b)
        else:
            ring_a, ring_b, nxt = [], [], 0
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            return
        batch = pd.concat(chunks).sort_values("idx")
        idxs = batch["idx"].to_numpy(dtype=np.int64)
        cas = batch["ca"].to_numpy(dtype=np.int64)
        cbs = batch["cb"].to_numpy(dtype=np.int64)
        if not np.array_equal(idxs, nxt + np.arange(idxs.shape[0])):
            raise ValueError(
                f"streaming rolling corr requires contiguous idx from 0;"
                f" pair ({a_type},{b_type}) expected {nxt},"
                f" got {idxs[:5].tolist()}..."
            )
        out_i, out_c = [], []
        for i, ca, cb in zip(idxs, cas, cbs):
            ring_a.append(int(ca)); ring_b.append(int(cb))
            if len(ring_a) > window:
                ring_a.pop(0); ring_b.pop(0)
            if len(ring_a) == window:
                sx = sum(ring_a); sy = sum(ring_b)
                sxx = sum(v * v for v in ring_a)
                syy = sum(v * v for v in ring_b)
                sxy = sum(x * y for x, y in zip(ring_a, ring_b))
                n = window
                vx = n * sxx - sx * sx
                vy = n * syy - sy * sy
                corr = (
                    float(n * sxy - sx * sy)
                    / np.sqrt(float(vx) * float(vy))
                    if vx > 0 and vy > 0 else None
                )
                out_i.append(int(i)); out_c.append(corr)
        nxt = int(idxs[-1]) + 1
        state.update((ring_a, ring_b, nxt))
        if out_i:
            yield pd.DataFrame({
                "a_type": np.repeat(a_type, len(out_i)),
                "b_type": np.repeat(b_type, len(out_i)),
                "idx": pd.Series(out_i, dtype="int64"),
                "n": pd.Series([window] * len(out_i), dtype="int64"),
                "corr": pd.array(out_c, dtype="Float64"),
            })

    return update


def stateful_rolling_corr(stream_pairs, window: int = 60):
    """(a_type, b_type, idx, ca, cb) stream (the dense-grid pair rows
    the batch operator windows over) → append stream of rolling
    Pearson values, bit-equal to ``rolling_corr_pairs`` at every full
    window. State per pair: the ``window``-length integer ring — the
    sums are recomputed per step from exact ints, so no accumulation
    drift is possible by construction."""
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    return stream_pairs.groupBy("a_type", "b_type").applyInPandasWithState(
        _make_rcorr_update(window),
        RCORR_OUT_SCHEMA,
        RCORR_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
