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
