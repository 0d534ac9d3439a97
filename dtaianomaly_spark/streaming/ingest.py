"""Continuous training-data ingest: the composed streaming pipeline a
corpus builder runs — exact dedup (first occurrence wins, stateful),
quality scoring and filtering (map-only), token accounting — over a
document stream, writing only the documents worth training on.

Every stage is the SAME code the batch pipeline uses
(`pipelines.text.with_quality`, `streaming.dedup.stream_exact_dedup`):
Structured Streaming's incremental execution of the identical logical
plan is the point — no second implementation to drift.

At scale: dedup is the only stateful stage (seen-hash set, bounded by
watermark when an event-time column exists); everything after it is
map-side, so the pipeline's throughput ceiling is the dedup shuffle on
the content hash.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame

from dtaianomaly_spark.pipelines.text import with_quality
from dtaianomaly_spark.streaming.dedup import stream_exact_dedup


def stream_ingest(
    doc_stream: DataFrame,
    min_quality: float = 0.3,
    min_tokens: int = 5,
    event_time_col: Optional[str] = None,
) -> DataFrame:
    """(.., text) stream -> deduplicated, quality-filtered stream with
    quality/token columns attached."""
    deduped = stream_exact_dedup(doc_stream, event_time_col=event_time_col)
    scored = with_quality(deduped)
    return scored.filter(
        (scored.quality >= min_quality) & (scored.ws_tokens >= min_tokens)
    )
