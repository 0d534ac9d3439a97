"""Compressed rollup tier: Gorilla XOR + delta-of-delta columns.

North-rule feature: per-window statistics at each retention tier are
stored as per-series compressed blocks — delta-of-delta for the integer
stats (bucket ids are arithmetic sequences → ~1 bit/point; counts and
sums are locally smooth), Gorilla XOR for the derived floats — one
``BinaryType`` column per statistic (kernels/codec.py; Facebook Gorilla,
VLDB'15 §4.1, reimplemented from the paper's bit layouts).

Physical shape: one ``collect_list(struct)`` per (series, tier) —
co-partitioned with the rollup output, so at scale this is the only
shuffle — followed by a vectorized Arrow encode pass. Decompression is
the exact inverse; round-trip equality is part of the test suite, and
the rollup store can therefore serve queries straight from compressed
blocks (decode is a narrow map).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, DoubleType, LongType, StringType, StructField, StructType,
)

from dtaianomaly_spark.kernels import codec as KC
from dtaianomaly_spark.rollup.tiers import ROLLUP_SCHEMA

INT_COLS = ("bucket", "cnt", "sum", "sumsq", "min", "max", "first", "last")
FLOAT_COLS = ("mean", "std")

COMPRESSED_SCHEMA = StructType(
    [StructField("doc_id", StringType(), False),
     StructField("tier", StringType(), False),
     StructField("n_points", LongType(), False)]
    + [StructField(f"{c}_enc", BinaryType(), False) for c in INT_COLS]
    + [StructField(f"{c}_enc", BinaryType(), False) for c in FLOAT_COLS]
    + [StructField("raw_bytes", LongType(), False),
       StructField("enc_bytes", LongType(), False)]
)


def compress_tiers(rollup: DataFrame) -> DataFrame:
    """Rollup rows -> one compressed block row per (doc_id, tier)."""
    packed = (
        rollup.groupBy("doc_id", "tier")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(*INT_COLS, *FLOAT_COLS))
            ).alias("pts")
        )
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, tier, pts in zip(pdf["doc_id"], pdf["tier"], pdf["pts"]):
                n = len(pts)
                row = [doc_id, tier, n]
                enc_bytes = 0
                for c in INT_COLS:
                    enc = KC.dod_encode(
                        np.array([p[c] for p in pts], dtype=np.int64)
                    )
                    enc_bytes += len(enc)
                    row.append(enc)
                for c in FLOAT_COLS:
                    vals = np.array(
                        [np.nan if p[c] is None else p[c] for p in pts],
                        dtype=np.float64,
                    )
                    enc = KC.xor_encode(vals)
                    enc_bytes += len(enc)
                    row.append(enc)
                raw = n * (8 * len(INT_COLS) + 8 * len(FLOAT_COLS))
                row += [raw, enc_bytes]
                rows.append(tuple(row))
            if rows:
                yield pd.DataFrame(rows, columns=COMPRESSED_SCHEMA.names)

    return packed.mapInPandas(run, COMPRESSED_SCHEMA)


def rollup_compress_map(corpus: DataFrame, tiers=("raw", "1m", "1h")) -> DataFrame:
    """FUSED rollup + compress: one Arrow pass from token arrays straight
    to compressed tier blocks — no intermediate point rows, no
    collect_list shuffle. This is the production write path at scale:
    scan → mapInArrow → parquet append, zero wide dependencies; the
    separate :func:`compress_tiers` regroup exists for compressing an
    already-materialized rollup table."""
    import pyarrow as pa

    from dtaianomaly_spark.kernels import stats as K
    from dtaianomaly_spark.rollup.tiers import rollup_series

    def run(batches):
        for batch in batches:
            la = batch.column(batch.schema.get_field_index("tokens"))
            doc_ids = batch.column(
                batch.schema.get_field_index("doc_id")
            ).to_pylist()
            rows = []
            for doc_id, tokens in zip(doc_ids, la.to_pylist()):
                x = np.asarray(tokens, dtype=np.int64)
                if x.shape[0] == 0:
                    continue
                stats = rollup_series(x)
                for tier in tiers:
                    st = stats[tier]
                    n = st["count"].shape[0]
                    mean, std = K.derive_mean_std(
                        st["count"], st["sum"], st["sumsq"]
                    )
                    cols = {
                        "bucket": np.arange(n, dtype=np.int64),
                        "cnt": st["count"], "sum": st["sum"],
                        "sumsq": st["sumsq"], "min": st["min"],
                        "max": st["max"], "first": st["first"],
                        "last": st["last"],
                    }
                    row = [doc_id, tier, n]
                    enc_bytes = 0
                    for c in INT_COLS:
                        enc = KC.dod_encode(cols[c])
                        enc_bytes += len(enc)
                        row.append(enc)
                    for vals in (mean, std):
                        enc = KC.xor_encode(vals)
                        enc_bytes += len(enc)
                        row.append(enc)
                    row += [n * 80, enc_bytes]
                    rows.append(tuple(row))
            if rows:
                yield pa.RecordBatch.from_pandas(
                    pd.DataFrame(rows, columns=COMPRESSED_SCHEMA.names),
                    preserve_index=False,
                )

    return corpus.select(
        F.col("doc_id").cast("string").alias("doc_id"), "tokens"
    ).mapInArrow(run, COMPRESSED_SCHEMA)


def decompress_tiers(compressed: DataFrame) -> DataFrame:
    """Exact inverse of :func:`compress_tiers`: back to rollup rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for _, r in pdf.iterrows():
                cols = {"doc_id": r["doc_id"], "tier": r["tier"]}
                for c in INT_COLS:
                    cols[c] = KC.dod_decode(bytes(r[f"{c}_enc"]))
                for c in FLOAT_COLS:
                    cols[c] = KC.xor_decode(bytes(r[f"{c}_enc"]))
                frames.append(pd.DataFrame(cols))
            if frames:
                yield pd.concat(frames, ignore_index=True)[
                    list(ROLLUP_SCHEMA.names)
                ]

    return compressed.mapInPandas(run, ROLLUP_SCHEMA)


def compression_report(compressed: DataFrame) -> DataFrame:
    """Per-tier compression summary (ratio from exact integer byte
    counts with the shared float formula)."""
    return (
        compressed.groupBy("tier")
        .agg(
            F.count("*").alias("series"),
            F.sum("n_points").alias("points"),
            F.sum("raw_bytes").alias("raw_bytes"),
            F.sum("enc_bytes").alias("enc_bytes"),
        )
        .select(
            "tier", "series", "points", "raw_bytes", "enc_bytes",
            F.expr("CAST(raw_bytes AS DOUBLE) / enc_bytes").alias("ratio"),
        )
    )


# --------------------------------------------- Swing-filter PLA (lossy)

PLA_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("n", LongType(), False),
        StructField("n_segments", LongType(), False),
        StructField("knots", LongType(), False),
        StructField("ratio", DoubleType(), False),
        StructField("max_err", DoubleType(), False),
    ]
)

PLA_SEG_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("seg", LongType(), False),
        StructField("t_start", LongType(), False),
        StructField("t_end", LongType(), False),
        StructField("y_start", DoubleType(), False),
        StructField("y_end", DoubleType(), False),
    ]
)


def pla_segments_map(corpus: DataFrame, eps: float) -> DataFrame:
    """Per-series Swing-filter PLA segments (kernels/codec.swing_encode;
    Elmeleegy et al., VLDB 2009): the LOSSY compression leg next to the
    exact Gorilla blocks — raw token streams become connected linear
    segments with a hard ``|recon - x| <= eps`` guarantee, the form a
    dashboard or a downsampled retention tier can serve directly.
    Map-only Arrow stage, no shuffle; output one row per segment."""

    def run(batches):
        for pdf in batches:
            rows = []
            for doc_id, tokens in zip(pdf["doc_id"], pdf["tokens"]):
                segs = KC.swing_encode(
                    np.asarray(tokens, dtype=np.float64), eps
                )
                rows.extend(
                    (str(doc_id), i, int(s[0]), int(s[1]), s[2], s[3])
                    for i, s in enumerate(segs)
                )
            yield pd.DataFrame(rows, columns=PLA_SEG_SCHEMA.names)

    return corpus.select(
        F.col("doc_id").cast("string").alias("doc_id"), "tokens"
    ).mapInPandas(run, PLA_SEG_SCHEMA)


def pla_report_map(corpus: DataFrame, eps: float) -> DataFrame:
    """Per-series PLA compression report: encode, DECODE, and verify in
    one Arrow pass — ``max_err`` is the actual reconstruction error
    (guaranteed <= eps, and visible in every row), ``ratio`` the
    points-per-knot compression (n / (n_segments + 1): connected
    segments share knots). The fused encode+verify keeps the audit on
    the executors — nothing but the bounded report crosses the wire."""

    def run(batches):
        for pdf in batches:
            rows = []
            for doc_id, tokens in zip(pdf["doc_id"], pdf["tokens"]):
                x = np.asarray(tokens, dtype=np.float64)
                segs = KC.swing_encode(x, eps)
                rec = KC.swing_decode(segs, x.shape[0])
                err = float(np.abs(rec - x).max()) if x.shape[0] else 0.0
                m = segs.shape[0]
                # connected segments share endpoints: m + 1 knots, except
                # the degenerate single-point segment (one knot) and the
                # empty series (none)
                knots = 0 if m == 0 else (1 if x.shape[0] == 1 else m + 1)
                rows.append(
                    (str(doc_id), x.shape[0], m, knots,
                     x.shape[0] / knots if knots else 0.0, err)
                )
            yield pd.DataFrame(rows, columns=PLA_SCHEMA.names)

    return corpus.select(
        F.col("doc_id").cast("string").alias("doc_id"), "tokens"
    ).mapInPandas(run, PLA_SCHEMA)
