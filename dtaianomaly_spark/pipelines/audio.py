"""Audio columns: opaque ``binary`` WAV payloads decoded with a REAL
pure-NumPy RIFF/WAVE PCM parser (public file-format knowledge — the
canonical header layout from the Microsoft/IBM WAVE spec; no codec
library), plus the two featurizers a training-data pipeline runs over
audio: whole-clip sample statistics and framed short-time energy (the
zeroth MFCC stage / VAD signal).

This closes the audio leg of the multimodal brief the same way
``pipelines/multimodal.py`` closed images (BMP/PNG/JPEG): the decode is
real, the synthetic corpus samples follow a CLOSED-FORM formula of
(doc_id, channel, i) so a DuckDB oracle integrates the decoded
statistics without touching bytes, and the encode -> decode -> stat
loop is verified bit-exactly end to end.

Compressed audio (MP3/AAC/Opus, IEEE-float or ADPCM WAV) raises a clear
error naming the field — swap in ffmpeg outside this container; every
caller is agnostic to which decoder runs.

At scale: payloads are the dominant bytes — both featurizers are
map-only (``mapInPandas`` over an Arrow binary column, payloads never
shuffle), and metadata-only queries prune the binary column at the
parquet scan.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, DoubleType, LongType, StructField, StructType,
)

# ---------------------------------------------------------- WAV codec
# RIFF/WAVE layout: 12-byte RIFF header ("RIFF", riff_size, "WAVE"),
# then word-aligned chunks of (id 4B, size u32 LE, data, 1 pad byte when
# size is odd). "fmt " carries (audio_format, n_channels, sample_rate,
# byte_rate, block_align, bits_per_sample); "data" carries interleaved
# little-endian frames. audio_format 1 = integer PCM — the only variant
# decodable without a codec; 3/6/7/0xFFFE (IEEE float, A-law, mu-law,
# extensible) name themselves in the raised error.

_WAV_FORMATS = {3: "IEEE float", 6: "A-law", 7: "mu-law", 0xFFFE: "extensible"}


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 PCM samples -> WAV bytes. Accepts (n,) mono or
    (n, channels) interleaved-on-write."""
    a = np.asarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2 or a.shape[1] < 1:
        raise ValueError(f"expected (n,) or (n, channels), got {samples.shape}")
    if sample_rate <= 0:
        raise ValueError(f"sample_rate must be positive, got {sample_rate}")
    n, ch = a.shape
    block_align = ch * 2
    data = np.ascontiguousarray(a, dtype="<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block_align,
        block_align, 16,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> ((n, channels) int16 array, sample_rate).

    Walks the word-aligned chunk list (unknown chunks like LIST/INFO are
    skipped, as real recorders emit them), validates every field it
    depends on, and raises ``ValueError`` naming the offending field for
    corrupt streams or ``NotImplementedError`` for valid-but-compressed
    variants (IEEE float, A-law, mu-law, extensible, non-16-bit PCM)."""
    if len(payload) < 12 or payload[:4] != b"RIFF":
        raise ValueError("not a WAV payload (missing 'RIFF' magic)")
    if payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload (RIFF form is not 'WAVE')")
    off, fmt, data = 12, None, None
    while off + 8 <= len(payload):
        cid = payload[off:off + 4]
        (size,) = struct.unpack_from("<I", payload, off + 4)
        chunk = payload[off + 8:off + 8 + size]
        if len(chunk) < size:
            raise ValueError(f"truncated {cid!r} chunk at offset {off}")
        if cid == b"fmt ":
            fmt = chunk
        elif cid == b"data":
            data = chunk
        off += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt is None:
        raise ValueError("missing 'fmt ' chunk")
    if data is None:
        raise ValueError("missing 'data' chunk")
    if len(fmt) < 16:
        raise ValueError(f"'fmt ' chunk is {len(fmt)} bytes, need >= 16")
    audio_format, ch, rate, _, block_align, bits = struct.unpack_from(
        "<HHIIHH", fmt
    )
    if audio_format != 1:
        name = _WAV_FORMATS.get(audio_format, f"format {audio_format}")
        raise NotImplementedError(
            f"only integer-PCM WAV decodes without a codec library"
            f" (audio_format={audio_format}: {name}); compressed audio"
            " needs ffmpeg, not available in this environment"
        )
    if bits != 16:
        raise NotImplementedError(
            f"only 16-bit PCM is supported (bits_per_sample={bits})"
        )
    if ch < 1:
        raise ValueError(f"corrupt fmt chunk: n_channels={ch}")
    if rate <= 0:
        raise ValueError(f"corrupt fmt chunk: sample_rate={rate}")
    if block_align != ch * 2:
        raise ValueError(
            f"corrupt fmt chunk: block_align={block_align} != channels*2"
            f"={ch * 2}"
        )
    if len(data) % block_align:
        raise ValueError(
            f"data chunk of {len(data)} bytes is not a whole number of"
            f" {block_align}-byte frames"
        )
    samples = np.frombuffer(data, dtype="<i2").reshape(-1, ch)
    return samples.astype(np.int16, copy=False), int(rate)


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """Audio decode for formats parsable without a codec library —
    currently RIFF/WAVE integer PCM. Other containers raise with a
    clear message (swap in ffmpeg outside this container)."""
    if payload[:4] == b"RIFF":
        return decode_wav(payload)
    raise NotImplementedError(
        "only PCM WAV decodes without a codec library; compressed audio"
        " (MP3, AAC, Opus, ...) requires ffmpeg, not available in this"
        " environment"
    )


# ------------------------------------------------- synthetic WAV corpus
# Sample values follow a CLOSED-FORM formula of (doc_id, channel, i) so
# a SQL oracle can integrate the decoded statistics without touching
# bytes (the pattern of multimodal.PX_FORMULA). All terms are
# non-negative, so Python/NumPy % and DuckDB % agree.

SAMPLE_FORMULA = "((doc_id*37 + c*101 + i*13) % 4001) - 2000"


def _audio_dims(doc_id: int) -> tuple[int, int, int]:
    """(n_samples, n_channels, sample_rate) for a doc's synthetic clip."""
    return 40 + doc_id % 30, 1 + doc_id % 2, 8000 + 1000 * (doc_id % 3)


def _audio_clip(doc_id: int, n: int, ch: int) -> np.ndarray:
    i, c = np.ogrid[0:n, 0:ch]
    return (((doc_id * 37 + c * 101 + i * 13) % 4001) - 2000).astype(np.int16)


def with_wav_payload(docs: DataFrame) -> DataFrame:
    """Attach a deterministic PCM WAV payload per doc (40-69 samples,
    mono/stereo alternating by doc, one of three sample rates) plus the
    sample-rate metadata column. Samples follow ``SAMPLE_FORMULA``."""
    schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n, ch, rate = _audio_dims(d)
                out.append((d, encode_wav(_audio_clip(d, n, ch), rate)))
            if out:
                yield pd.DataFrame(out, columns=["doc_id", "payload"])

    return docs.select("doc_id").mapInPandas(run, schema)


AUDIO_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_samples", LongType(), False),
        StructField("n_channels", LongType(), False),
        StructField("sample_rate", LongType(), False),
        StructField("s_sum", LongType(), False),
        StructField("s_sq_sum", LongType(), False),
        StructField("s_min", LongType(), False),
        StructField("s_max", LongType(), False),
    ]
)


def audio_stats_decoded(payloads: DataFrame) -> DataFrame:
    """DECODE each WAV payload and emit whole-clip sample statistics
    (exact integer sum / energy / min / max over all channels) —
    map-only, payload bytes never shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples, rate = decode_audio(bytes(payload))
                s = samples.astype(np.int64)
                out.append(
                    (
                        int(doc_id), samples.shape[0], samples.shape[1],
                        rate, int(s.sum()), int((s * s).sum()),
                        int(s.min()), int(s.max()),
                    )
                )
            if out:
                yield pd.DataFrame(out, columns=AUDIO_STATS_SCHEMA.names)

    return payloads.select("doc_id", "payload").mapInPandas(
        run, AUDIO_STATS_SCHEMA
    )


FRAME_ENERGY_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("n_in_frame", LongType(), False),
        StructField("energy", LongType(), False),
    ]
)


ZCR_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("channel", LongType(), False),
        StructField("n_samples", LongType(), False),
        StructField("zcr", LongType(), False),
        StructField("ac_lag1", LongType(), False),
    ]
)


def zcr_autocorr_decoded(payloads: DataFrame) -> DataFrame:
    """Per-channel zero-crossing count and lag-1 autocorrelation over
    decoded WAV clips — the classic voiced/unvoiced + pitch-presence
    signals, both exact integers (a crossing is a sign-bit flip,
    ``(v[i] >= 0) != (v[i-1] >= 0)``; the autocorrelation is the raw
    integer inner product ``sum(v[i] * v[i-1])``). Map-only."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples, _ = decode_audio(bytes(payload))
                s = samples.astype(np.int64)
                nonneg = s >= 0
                flips = (nonneg[1:] != nonneg[:-1]).sum(axis=0)
                ac = (s[1:] * s[:-1]).sum(axis=0)
                for c in range(s.shape[1]):
                    out.append(
                        (int(doc_id), c, s.shape[0], int(flips[c]),
                         int(ac[c]))
                    )
            if out:
                yield pd.DataFrame(out, columns=ZCR_SCHEMA.names)

    return payloads.select("doc_id", "payload").mapInPandas(run, ZCR_SCHEMA)


def frame_energy_decoded(payloads: DataFrame, frame_len: int = 16) -> DataFrame:
    """Framed short-time energy: decode each WAV payload, cut the sample
    axis into non-overlapping ``frame_len``-sample frames (last frame
    ragged), and emit the exact integer energy (sum of squared samples
    across all channels) per frame — the zeroth stage of any MFCC/VAD
    audio featurizer. Map-only."""
    if frame_len < 1:
        raise ValueError(f"frame_len must be >= 1, got {frame_len}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples, _ = decode_audio(bytes(payload))
                sq = (samples.astype(np.int64) ** 2).sum(axis=1)
                n = sq.shape[0]
                for f in range(0, n, frame_len):
                    seg = sq[f:f + frame_len]
                    out.append(
                        (int(doc_id), f // frame_len, int(seg.shape[0]),
                         int(seg.sum()))
                    )
            if out:
                yield pd.DataFrame(out, columns=FRAME_ENERGY_SCHEMA.names)

    return payloads.select("doc_id", "payload").mapInPandas(
        run, FRAME_ENERGY_SCHEMA
    )


SPECTRAL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_samples", LongType(), False),
        StructField("sample_rate", LongType(), False),
        StructField("dom_k", LongType(), False),
        StructField("dom_freq", DoubleType(), False),
        StructField("centroid_hz", DoubleType(), False),
        StructField("rolloff_hz", DoubleType(), False),
        StructField("spec_entropy", DoubleType(), True),
    ]
)


def wav_spectral_decoded(payloads: DataFrame) -> DataFrame:
    """DECODE each WAV payload and emit channel-0 spectral features —
    the audio-curation sibling of pp_periodogram: dominant frequency
    bin (ties to the longer period, as spectral_peaks), spectral
    centroid (power-weighted mean frequency), 85% spectral rolloff
    and normalized spectral entropy, all from the shared
    ``kernels.windowing.periodogram``. Map-only Arrow pass; payload
    bytes never shuffle. Rows-only: the FFT kernel is pinned in
    test_windowing_kernels against a naive DFT; this operator's
    assembly is pinned by a direct NumPy replay in test_pipelines."""
    from dtaianomaly_spark.kernels import windowing as KW

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples, rate = decode_audio(bytes(payload))
                x = samples[:, 0].astype(np.float64)
                n = x.shape[0]
                p = KW.periodogram(x)
                total = float(p.sum())
                if total <= 0.0:
                    out.append((int(doc_id), n, rate, 0, 0.0, 0.0, 0.0,
                                None))
                    continue
                dom = int(KW.spectral_peaks(p, 1)[0]) + 1
                ks = np.arange(1, p.shape[0] + 1, dtype=np.float64)
                hz = rate / float(n)
                centroid = float((ks * p).sum()) / total * hz
                cum = np.cumsum(p)
                roll_k = int(np.searchsorted(cum, 0.85 * total)) + 1
                out.append((
                    int(doc_id), n, rate, dom, dom * hz, centroid,
                    roll_k * hz, KW.spectral_entropy(p),
                ))
            if out:
                yield pd.DataFrame(out, columns=SPECTRAL_SCHEMA.names)

    return payloads.select("doc_id", "payload").mapInPandas(
        run, SPECTRAL_SCHEMA
    )


AFP_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("afp", LongType(), False),
        StructField("n_bits", LongType(), False),
    ]
)


def audio_fingerprint_decoded(payloads: DataFrame, n_bits: int = 16) -> DataFrame:
    """Spectral-shape audio fingerprint per decoded clip: the sign
    bits of adjacent periodogram ordinates (P[k+1] > P[k]) over the
    first ``n_bits``+1 frequency bins of channel 0 — the
    Haitsma-Kalker-style sub-fingerprint idea reduced to one frame
    (these clips are sub-second), robust to uniform gain (periodogram
    ratios are gain-invariant) and exactly reproducible (integer PCM →
    one FFT → boolean compares). Map-only Arrow pass."""
    from dtaianomaly_spark.kernels import windowing as KW

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples, _rate = decode_audio(bytes(payload))
                x = samples[:, 0].astype(np.float64)
                p = KW.periodogram(x)
                m = min(n_bits, p.shape[0] - 1)
                bits = (p[1:m + 1] > p[:m]).astype(np.uint64)
                afp = int((bits << np.arange(m, dtype=np.uint64)).sum())
                out.append((int(doc_id), afp, m))
            if out:
                yield pd.DataFrame(out, columns=AFP_SCHEMA.names)

    return payloads.select("doc_id", "payload").mapInPandas(
        run, AFP_SCHEMA
    )


def audio_neardup_groups(payloads: DataFrame, n_bits: int = 16) -> DataFrame:
    """Audio near-duplicate GROUPS by exact fingerprint match (same
    spectral shape under gain changes): groupBy the fingerprint —
    embarrassingly parallel, the audio member of the dedup family.
    Output: (afp, n_bits, n_clips, keep_doc_id) for groups of ≥ 2."""
    fp = audio_fingerprint_decoded(payloads, n_bits)
    return (
        fp.groupBy("afp", "n_bits")
        .agg(
            F.count("*").cast("long").alias("n_clips"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .filter(F.col("n_clips") >= 2)
    )
