"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, decoded / featurized via Arrow-batched Python.

The container has no image/audio codecs, so the decode step is STUBBED
(``decode_image`` raises ``NotImplementedError``; ``byte_histogram`` is
the deterministic fake featurizer standing in for it) — but the
Spark-side plumbing is real and what a production pipeline needs:
binary column in/out, schema'd struct metadata, ``mapInPandas`` with
Arrow binary transfer, per-batch vectorization, and deterministic
frame-sampling over the byte stream.

At scale: payloads are the dominant bytes — the plumbing never shuffles
them (map-only featurize), and metadata-only queries prune the binary
column at the parquet scan (check ReadSchema in .explain).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, LongType, StructField, StructType,
)

N_BINS = 16

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("hist", ArrayType(LongType(), False), False),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("frame", BinaryType(), False),
    ]
)


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary payload column (utf-8 bytes of ``text``
    stand in for image/audio bytes) plus typed metadata."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("fake/raw").alias("mime"),
            F.length("text").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image(payload: bytes):
    """Real image decode — requires an image codec library not present in
    this container. The pipeline wiring (schema, batching, partitioning)
    is exercised through :func:`byte_histogram` instead."""
    raise NotImplementedError(
        "image decoding requires a codec library (e.g. Pillow) not "
        "available in this environment; use byte_histogram as the "
        "deterministic stand-in featurizer"
    )


def byte_histogram(payloads: DataFrame) -> DataFrame:
    """Deterministic fake featurizer: 16-bin histogram of the high nibble
    of every payload byte, vectorized per Arrow batch. This is exactly
    the shape a decode+embed UDF takes (binary in, fixed-size vector
    out) — swap the np.bincount for the real model call."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(arr >> 4, minlength=N_BINS).astype(np.int64)
                out.append((int(doc_id), int(arr.shape[0]), hist.tolist()))
            if out:
                yield pd.DataFrame(out, columns=["doc_id", "n_bytes", "hist"])

    return payloads.select("doc_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


def byte_histogram_long(payloads: DataFrame) -> DataFrame:
    """Driver-facing long form of :func:`byte_histogram`:
    ``(doc_id, bin, cnt)`` with zero-count bins dropped, so result
    canonicalizers that sort/hash scalar cells can check it (the
    ``array<long>`` wide form stays the internal API)."""
    wide = byte_histogram(payloads)
    return (
        wide.select("doc_id", F.posexplode("hist").alias("bin", "cnt"))
        .where(F.col("cnt") > 0)
        .select("doc_id", F.col("bin").cast("long").alias("bin"), "cnt")
    )


def frame_sample(payloads: DataFrame, n_frames: int = 4, frame_bytes: int = 32) -> DataFrame:
    """Deterministic frame sampling over the byte stream (the video
    analog): n evenly spaced fixed-size byte windows per payload."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                for j in range(n_frames):
                    start = 0 if n <= frame_bytes else (j * (n - frame_bytes)) // max(n_frames - 1, 1)
                    out.append((int(doc_id), j, payload[start:start + frame_bytes]))
            if out:
                yield pd.DataFrame(out, columns=["doc_id", "frame_idx", "frame"])

    return payloads.select("doc_id", "payload").mapInPandas(run, FRAME_SCHEMA)
