"""Streaming exact deduplication over a document stream: the online twin
of ``pipelines.text.exact_dedup`` (first occurrence of each content hash
wins). A training-data ingest runs this continuously so downstream
shuffles never see duplicate payloads.

Spark mapping: ``dropDuplicates`` over a streaming DataFrame keeps the
seen-key set in state — exactly-once per content hash across
micro-batches. With an event-time column + watermark, state for a hash
is dropped once its watermark passes (bounded state, the production
shape); without one, state grows with the number of DISTINCT documents
ever seen (fine for bounded replays, documented here because at 100 TB
you always want the watermark: duplicates in web-scale corpora cluster
in time, so a horizon of days catches the mass while keeping state
proportional to the window, and the batch dedup pass sweeps the rest).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_exact_dedup(
    doc_stream: DataFrame,
    event_time_col: Optional[str] = None,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """(.., text) stream -> stream of first-seen documents with their
    content hash. Pass ``event_time_col`` to bound the seen-hash state
    by watermark; duplicates arriving later than the delay may then be
    re-emitted (caught by the periodic batch dedup)."""
    hashed = doc_stream.withColumn("text_md5", F.md5("text"))
    if event_time_col is not None:
        # state for a hash expires once the watermark passes it
        return hashed.withWatermark(
            event_time_col, watermark_delay
        ).dropDuplicatesWithinWatermark(["text_md5"])
    return hashed.dropDuplicates(["text_md5"])
