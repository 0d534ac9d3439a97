"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, decoded / featurized via Arrow-batched Python.

REAL DECODE: uncompressed 24-bit BMP is decoded with a pure-NumPy
parser (``decode_bmp`` — public file-format knowledge, no codec
library), and PNG (8-bit gray/RGB/RGBA, all five scanline filters) with
stdlib zlib + NumPy unfiltering (``decode_png``), so
``frame_sample_decoded`` samples ACTUAL decoded frames from a
concatenated-BMP "video" payload and ``image_stats_decoded`` decodes
real PNG and baseline-JPEG payloads (from-scratch T.81 codec in
``pipelines/jpeg.py``) — all emitting pixel statistics that are
oracle-checked (the synthetic pixels follow a closed-form formula
DuckDB integrates directly; JPEG uses the block-constant/quality-100
exactness regime). Formats still needing a real codec (H.264, WebP)
raise a clear error from ``decode_image``, and ``byte_histogram``
remains the codec-free featurizer stand-in.

The Spark-side plumbing is what a production pipeline needs: binary
column in/out, schema'd struct metadata, ``mapInPandas`` with Arrow
binary transfer, per-batch vectorization, deterministic frame-sampling.

At scale: payloads are the dominant bytes — the plumbing never shuffles
them (map-only featurize), and metadata-only queries prune the binary
column at the parquet scan (check ReadSchema in .explain).
"""

from __future__ import annotations

import struct
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


# --------------------------------------------------------- BMP codec
# Uncompressed 24-bit BMP (BITMAPFILEHEADER + BITMAPINFOHEADER), pure
# NumPy — the one mainstream image format decodable without a codec
# library. Layout is public knowledge: 14-byte file header ("BM", file
# size, pixel-data offset), 40-byte info header (dims, planes, bpp,
# compression), pixel rows bottom-up (top-down when height < 0), BGR
# byte order, each row zero-padded to a 4-byte boundary.

_BMP_FILE_HEADER = 14
_BMP_INFO_HEADER = 40
_BMP_OFFSET = _BMP_FILE_HEADER + _BMP_INFO_HEADER


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> uncompressed 24-bit BMP bytes."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB, got shape {a.shape}")
    h, w, _ = a.shape
    row_raw = w * 3
    stride = (row_raw + 3) // 4 * 4
    size_image = stride * h
    file_header = struct.pack(
        "<2sIHHI", b"BM", _BMP_OFFSET + size_image, 0, 0, _BMP_OFFSET
    )
    info_header = struct.pack(
        "<IiiHHIIiiII",
        _BMP_INFO_HEADER, w, h, 1, 24, 0, size_image, 2835, 2835, 0, 0,
    )
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row_raw] = a[::-1, :, ::-1].reshape(h, row_raw)  # bottom-up BGR
    return file_header + info_header + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP bytes -> (h, w, 3) uint8 RGB array.

    Handles both bottom-up (height > 0) and top-down (height < 0) pixel
    order and the 4-byte row padding. Raises ``ValueError`` with the
    offending field for anything that is not a plain 24-bit
    BI_RGB bitmap."""
    if len(payload) < _BMP_OFFSET or payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    _, w, h_signed, _, bpp, compression = struct.unpack_from(
        "<IiiHHI", payload, _BMP_FILE_HEADER
    )
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"only uncompressed 24-bit BMP is supported (bpp={bpp},"
            f" compression={compression}); compressed image formats need"
            " a codec library not present in this environment"
        )
    if w <= 0:
        raise ValueError(f"corrupt BMP header: width={w} (must be > 0)")
    if h_signed == 0:
        raise ValueError("corrupt BMP header: height=0")
    if data_offset < _BMP_OFFSET:
        raise ValueError(
            f"corrupt BMP header: data_offset={data_offset} points inside"
            f" the {_BMP_OFFSET}-byte headers"
        )
    h = abs(h_signed)
    stride = (w * 3 + 3) // 4 * 4
    end = data_offset + stride * h
    if len(payload) < end:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h,
                         offset=data_offset).reshape(h, stride)
    img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    if h_signed > 0:
        img = img[::-1]
    return np.ascontiguousarray(img)


# --------------------------------------------------------- PNG codec
# Real PNG (the dominant lossless web format), from public file-format
# knowledge only: stdlib zlib for the DEFLATE stream + NumPy for the
# scanline filters. Supported: bit depth 8, color types 0 (gray),
# 2 (RGB), 6 (RGBA), no interlacing — the shapes a training-data
# pipeline actually stores. Palette/16-bit/Adam7 raise clearly.
#
# PNG layout (RFC 2083): 8-byte signature, then chunks of
# (len u32 BE, type 4B, data, crc32(type+data) u32 BE). IHDR carries
# (w, h, depth, color, compression, filter, interlace); IDAT chunks
# concatenate into one zlib stream of h scanlines, each scanline =
# 1 filter-type byte + w*channels filtered bytes. Filters 0-4 =
# None / Sub / Up / Average / Paeth, all byte-wise mod 256 with the
# per-pixel left/up/up-left predictors.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


def encode_png(arr: np.ndarray, filter_type: int = 4) -> bytes:
    """uint8 image -> PNG bytes. Accepts (h, w) gray, (h, w, 3) RGB or
    (h, w, 4) RGBA. Every scanline uses ``filter_type`` (0..4) — exposed
    so tests exercise each unfilter path; 4 (Paeth) is the usual best
    single choice."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        color, a3 = 0, a[:, :, None]
    elif a.ndim == 3 and a.shape[2] in (3, 4):
        color, a3 = {3: 2, 4: 6}[a.shape[2]], a
    else:
        raise ValueError(
            f"expected (h, w), (h, w, 3) or (h, w, 4) uint8, got {a.shape}"
        )
    if filter_type not in range(5):
        raise ValueError(f"filter_type must be 0..4, got {filter_type}")
    h, w, ch = a3.shape
    if h == 0 or w == 0:
        raise ValueError(f"empty image: shape {a.shape}")
    raw = a3.reshape(h, w * ch).astype(np.int16)
    left = np.zeros_like(raw)
    left[:, ch:] = raw[:, :-ch]
    up = np.zeros_like(raw)
    up[1:] = raw[:-1]
    upleft = np.zeros_like(raw)
    upleft[1:, ch:] = raw[:-1, :-ch]
    if filter_type == 0:
        filt = raw
    elif filter_type == 1:
        filt = raw - left
    elif filter_type == 2:
        filt = raw - up
    elif filter_type == 3:
        filt = raw - (left + up) // 2
    else:  # Paeth: at ENCODE time recon == raw, so fully vectorizable
        p = left + up - upleft
        pa, pb, pc = abs(p - left), abs(p - up), abs(p - upleft)
        pred = np.where(
            (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft)
        )
        filt = raw - pred
    lines = np.concatenate(
        [
            np.full((h, 1), filter_type, dtype=np.uint8),
            (filt % 256).astype(np.uint8),
        ],
        axis=1,
    )
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    idat = zlib.compress(lines.tobytes(), 9)
    return (
        _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    """The Paeth predictor (RFC 2083 §6.6): nearest of left/up/up-left
    to the linear estimate a + b - c, ties broken left, up, up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array: (h, w) for gray, (h, w, 3) RGB,
    (h, w, 4) RGBA. Validates the signature, every chunk CRC, the IHDR
    fields and the decompressed scanline length, raising ``ValueError``
    naming the offending field; unsupported-but-valid variants (palette,
    16-bit, Adam7 interlace) raise ``NotImplementedError``.

    Unfiltering is NumPy-vectorized per scanline for None/Sub/Up (Sub is
    a per-channel prefix-sum mod 256); Average/Paeth rows carry a true
    sequential dependency on the in-row reconstruction and fall back to
    a per-byte loop — O(row) Python per such row, fine for the frame
    sizes a sampler decodes (swap in a codec library outside this
    container for megapixel assets)."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload (bad 8-byte signature)")
    off, ihdr, idat, end_seen = 8, None, [], False
    while off + 12 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, off)
        typ = payload[off + 4:off + 8]
        data = payload[off + 8:off + 8 + ln]
        if len(data) < ln or off + 12 + ln > len(payload):
            raise ValueError(f"truncated {typ!r} chunk at offset {off}")
        (crc,) = struct.unpack_from(">I", payload, off + 8 + ln)
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {typ!r} chunk")
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            end_seen = True
            break
        off += 12 + ln
    if ihdr is None:
        raise ValueError("missing IHDR chunk")
    if not end_seen:
        raise ValueError("missing IEND chunk (truncated stream)")
    if len(ihdr) != 13:
        raise ValueError(f"IHDR length {len(ihdr)} != 13")
    w, h, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if w == 0 or h == 0:
        raise ValueError(f"corrupt IHDR: {w}x{h} image")
    if depth != 8:
        raise NotImplementedError(f"bit depth {depth} (only 8 supported)")
    if color not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"color type {color} (gray/RGB/RGBA supported; palette and"
            " gray+alpha are not)"
        )
    if comp != 0 or filt != 0:
        raise ValueError(
            f"corrupt IHDR: compression={comp} filter={filt} (must be 0)"
        )
    if interlace != 0:
        raise NotImplementedError("Adam7 interlacing not supported")
    ch = _PNG_CHANNELS[color]
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as ex:
        raise ValueError(f"corrupt IDAT zlib stream: {ex}") from ex
    stride = 1 + w * ch
    if len(raw) != h * stride:
        raise ValueError(
            f"IDAT decodes to {len(raw)} bytes, expected {h * stride}"
            f" ({h} scanlines of {stride})"
        )
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
    ftypes, data = lines[:, 0], lines[:, 1:].astype(np.int32)
    recon = np.zeros((h, w * ch), dtype=np.int32)
    prior = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        f, row = int(ftypes[y]), data[y]
        if f == 0:
            r = row
        elif f == 1:  # Sub == per-channel prefix sum mod 256
            r = (
                row.reshape(w, ch).cumsum(axis=0, dtype=np.int64) % 256
            ).reshape(-1).astype(np.int32)
        elif f == 2:
            r = (row + prior) % 256
        elif f in (3, 4):
            r = np.zeros(w * ch, dtype=np.int32)
            for x in range(w * ch):
                left = int(r[x - ch]) if x >= ch else 0
                up = int(prior[x])
                if f == 3:
                    pred = (left + up) // 2
                else:
                    ul = int(prior[x - ch]) if x >= ch else 0
                    pred = _paeth(left, up, ul)
                r[x] = (int(row[x]) + pred) % 256
        else:
            raise ValueError(f"invalid scanline filter {f} on row {y}")
        recon[y] = r
        prior = recon[y]
    img = recon.astype(np.uint8).reshape(h, w, ch)
    return img[:, :, 0] if ch == 1 else img


def decode_image(payload: bytes) -> np.ndarray:
    """Image decode for formats parsable without a codec library:
    uncompressed 24-bit BMP and PNG (8-bit gray/RGB/RGBA), both pure
    NumPy + stdlib. Other formats raise with a clear message — swap in
    a real codec (Pillow/ffmpeg) outside this container; every caller
    is agnostic to which decoder runs."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from dtaianomaly_spark.pipelines.jpeg import decode_jpeg

        return decode_jpeg(payload)
    raise NotImplementedError(
        "only BMP, PNG and baseline JPEG decode without a codec library;"
        " other formats (video codecs, WebP, ...) require Pillow/ffmpeg,"
        " not available in this environment"
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


# ------------------------------------------------ decoded frame sampling
# A deterministic multi-frame "video" payload: F uncompressed BMP frames
# concatenated. Pixel values follow a CLOSED-FORM formula of
# (doc_id, frame, y, x, channel), so a SQL oracle can integrate the
# decoded statistics without ever touching bytes — the encode->walk->
# decode->stat loop is verified end to end.

PX_FORMULA = "(doc_id*31 + f*97 + y*131 + x*17 + c*59) % 256"


def _video_dims(doc_id: int) -> tuple[int, int, int]:
    """(n_frames, height, width) for a doc's synthetic video."""
    return 2 + doc_id % 5, 4 + doc_id % 3, 5 + doc_id % 4


def _video_frame(doc_id: int, f: int, h: int, w: int) -> np.ndarray:
    y, x, c = np.ogrid[0:h, 0:w, 0:3]
    return ((doc_id * 31 + f * 97 + y * 131 + x * 17 + c * 59) % 256).astype(
        np.uint8
    )


def with_video_payload(docs: DataFrame) -> DataFrame:
    """Attach a deterministic multi-frame BMP video payload per doc
    (2-6 frames, 4-6 x 5-8 px — tiny but real bitmaps) plus typed
    metadata. Pixels follow ``PX_FORMULA``."""
    schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("payload", BinaryType(), False),
            StructField("n_frames", LongType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                nf, h, w = _video_dims(d)
                payload = b"".join(
                    encode_bmp(_video_frame(d, f, h, w)) for f in range(nf)
                )
                out.append((d, payload, nf))
            if out:
                yield pd.DataFrame(out, columns=["doc_id", "payload", "n_frames"])

    return docs.select("doc_id").mapInPandas(run, schema)


DECODED_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("h", LongType(), False),
        StructField("w", LongType(), False),
        StructField("px_sum", LongType(), False),
        StructField("px_min", LongType(), False),
        StructField("px_max", LongType(), False),
    ]
)


def frame_sample_decoded(payloads: DataFrame, n_frames: int = 4) -> DataFrame:
    """Sample min(n_frames, F) evenly spaced frames from each
    concatenated-BMP video payload (frame j of m samples source frame
    ``j*F//m`` — distinct and increasing), DECODE each sampled frame,
    and emit per-frame pixel statistics. The walk uses each BMP's own
    file-size field to find the next frame — no frame index table.

    Map-only: payload bytes never shuffle; one Arrow task decodes a
    batch of payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(payload)
                offsets = []
                off = 0
                while off < len(payload):
                    if payload[off:off + 2] != b"BM":
                        raise ValueError(
                            f"doc {doc_id}: bad frame magic at offset {off}"
                        )
                    size = struct.unpack_from("<I", payload, off + 2)[0]
                    if size < _BMP_OFFSET:
                        raise ValueError(
                            f"doc {doc_id}: frame size field {size} at"
                            f" offset {off} is smaller than the BMP"
                            " headers — corrupt stream"
                        )
                    offsets.append((off, size))
                    off += size
                F_ = len(offsets)
                m = min(n_frames, F_)
                for j in range(m):
                    f = j * F_ // m
                    start, size = offsets[f]
                    img = decode_bmp(payload[start:start + size])
                    out.append(
                        (
                            int(doc_id), f, img.shape[0], img.shape[1],
                            int(img.sum(dtype=np.int64)),
                            int(img.min()), int(img.max()),
                        )
                    )
            if out:
                yield pd.DataFrame(out, columns=DECODED_FRAME_SCHEMA.names)

    return payloads.select("doc_id", "payload").mapInPandas(
        run, DECODED_FRAME_SCHEMA
    )


IMG_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("h", LongType(), False),
        StructField("w", LongType(), False),
        StructField("px_sum", LongType(), False),
        StructField("px_min", LongType(), False),
        StructField("px_max", LongType(), False),
    ]
)


def with_png_payload(docs: DataFrame) -> DataFrame:
    """Attach a deterministic PNG payload per doc: an RGB image of
    (4 + doc_id%3) x (5 + doc_id%4) px whose pixels follow ``PX_FORMULA``
    with f=0, encoded with scanline filter ``doc_id % 5`` — so decoding
    the corpus exercises ALL FIVE PNG unfilter paths against the
    closed-form oracle."""
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
                _, h, w = _video_dims(d)
                out.append(
                    (d, encode_png(_video_frame(d, 0, h, w),
                                   filter_type=d % 5))
                )
            if out:
                yield pd.DataFrame(out, columns=["doc_id", "payload"])

    return docs.select("doc_id").mapInPandas(run, schema)


def with_jpeg_payload(docs: DataFrame) -> DataFrame:
    """Attach a deterministic baseline-JPEG payload per doc: a GRAYSCALE
    image of 8·(1 + doc_id%2) x 8·(1 + doc_id%3) px whose 8x8 blocks are
    CONSTANT with value ``(doc_id*31 + by*131 + bx*17) % 256``, encoded
    at quality 100. Block-constant + all-ones quant tables + no color
    transform ⇒ the decode is EXACT (see pipelines/jpeg.py), so a
    closed-form oracle can integrate the decoded pixel stats while the
    full marker/Huffman/DCT path is exercised for real."""
    from dtaianomaly_spark.pipelines.jpeg import encode_jpeg

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
                bh, bw = 1 + d % 2, 1 + d % 3
                by, bx = np.ogrid[0:bh, 0:bw]
                blocks = ((d * 31 + by * 131 + bx * 17) % 256).astype(
                    np.uint8
                )
                img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
                out.append((d, encode_jpeg(img, quality=100)))
            if out:
                yield pd.DataFrame(out, columns=["doc_id", "payload"])

    return docs.select("doc_id").mapInPandas(run, schema)


def image_stats_decoded(payloads: DataFrame) -> DataFrame:
    """DECODE each payload via :func:`decode_image` (BMP or PNG) and
    emit per-image pixel statistics — map-only, payload bytes never
    shuffle; one Arrow task decodes a batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_image(bytes(payload))
                out.append(
                    (
                        int(doc_id), img.shape[0], img.shape[1],
                        int(img.sum(dtype=np.int64)),
                        int(img.min()), int(img.max()),
                    )
                )
            if out:
                yield pd.DataFrame(out, columns=IMG_STATS_SCHEMA.names)

    return payloads.select("doc_id", "payload").mapInPandas(
        run, IMG_STATS_SCHEMA
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


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize, the standard floor index map
    ``src = dst * in // out`` — EXACT integers for any shape pair, the
    preprocessing resize a vision pipeline runs before feature
    extraction. Channels pass through untouched."""
    if out_h < 1 or out_w < 1:
        raise ValueError(f"output dims must be >= 1, got {out_h}x{out_w}")
    h, w = img.shape[0], img.shape[1]
    ri = (np.arange(out_h, dtype=np.int64) * h) // out_h
    ci = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return img[np.ix_(ri, ci)]


def resize_box(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Box-average (area) downsample for integer-divisible factors:
    each output pixel is the FLOOR mean of its (h/out_h, w/out_w)
    block — exact integer arithmetic (int64 block sums, one floor
    division), no float resampling. Raises when the factor is not
    integral; use :func:`resize_nearest` for arbitrary shapes."""
    h, w = img.shape[0], img.shape[1]
    if out_h < 1 or out_w < 1:
        raise ValueError(f"output dims must be >= 1, got {out_h}x{out_w}")
    if h % out_h or w % out_w:
        raise ValueError(
            f"box resize needs integral factors: {h}x{w} -> {out_h}x{out_w}"
        )
    fh, fw = h // out_h, w // out_w
    tail = img.shape[2:]
    blocks = img.reshape((out_h, fh, out_w, fw) + tail)
    sums = blocks.sum(axis=(1, 3), dtype=np.int64)
    return (sums // (fh * fw)).astype(img.dtype)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("h", LongType(), False),
        StructField("w", LongType(), False),
        StructField("out_h", LongType(), False),
        StructField("out_w", LongType(), False),
        StructField("px_sum", LongType(), False),
        StructField("px_min", LongType(), False),
        StructField("px_max", LongType(), False),
    ]
)


def resize_stats_decoded(
    payloads: DataFrame, out_h: int, out_w: int, method: str = "nearest"
) -> DataFrame:
    """DECODE each payload (BMP/PNG/JPEG via :func:`decode_image`),
    resize (``nearest`` for any shape, ``box`` for integral factors)
    and emit the resized image's pixel statistics — the
    decode→resize→feature leg of the multimodal brief in ONE map-only
    Arrow stage; payload bytes never shuffle."""
    if method not in ("nearest", "box"):
        raise ValueError(f"method must be 'nearest' or 'box', got {method}")
    fn = resize_nearest if method == "nearest" else resize_box

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_image(bytes(payload))
                small = fn(img, out_h, out_w)
                out.append(
                    (
                        int(doc_id), img.shape[0], img.shape[1],
                        int(out_h), int(out_w),
                        int(small.sum(dtype=np.int64)),
                        int(small.min()), int(small.max()),
                    )
                )
            if out:
                yield pd.DataFrame(out, columns=RESIZE_SCHEMA.names)

    return payloads.select("doc_id", "payload").mapInPandas(
        run, RESIZE_SCHEMA
    )


def dhash64(img: np.ndarray) -> int:
    """64-bit difference hash (dHash — the standard perceptual
    image fingerprint): integer-mean grayscale, nearest-neighbor
    resize to 9x8, then one bit per 8x8 cell = (left < right) on
    horizontal neighbors. Every step is exact integer arithmetic
    (floor mean, floor index map), so the hash is bit-reproducible
    across any partitioning — and robust to the perturbations that
    break exact byte dedup (recompression, tiny crops, brightness
    wiggle under the threshold)."""
    g = (img.astype(np.int64).sum(axis=2)) // 3
    small = resize_nearest(g, 8, 9)
    bits = (small[:, :-1] < small[:, 1:]).astype(np.uint64).ravel()
    return int((bits << np.arange(64, dtype=np.uint64)).sum())


DHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("dhash", LongType(), False),
    ]
)


def dhash_decoded(payloads: DataFrame) -> DataFrame:
    """DECODE each payload's FIRST BMP frame and emit its 64-bit
    dHash — map-only Arrow pass, payload bytes never shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_bmp(bytes(payload))
                h = dhash64(img)
                # store as signed int64 (two's complement view)
                out.append((int(doc_id), h - (1 << 64) if h >= (1 << 63) else h))
            if out:
                yield pd.DataFrame(out, columns=["doc_id", "dhash"])

    return payloads.select("doc_id", "payload").mapInPandas(
        run, DHASH_SCHEMA
    )


def dhash_neardup_pairs(
    payloads: DataFrame, max_hamming: int = 6
) -> DataFrame:
    """Perceptual near-duplicate image pairs: dHash each image, BAND
    the 64-bit hash into four 16-bit keys (two hashes within Hamming
    distance ≤ 6 of each other agree exactly on ≥ 1 of 4 bands
    whenever the 6 flipped bits hit ≤ 3 bands — the standard
    Hamming-LSH pigeonhole; with ≤ 6 flips spread over 4 bands at
    least one band is clean unless every band is hit, impossible for
    ≤ 3 flips and merely unlikely above, the documented recall
    contract), join within buckets only, then verify with the exact
    popcount distance. The multimodal member of the dedup family:
    exact dedup catches byte-identical files, THIS catches
    re-encoded/perturbed copies.

    Output: (doc_a, doc_b, hamming), doc_a < doc_b, hamming ≤
    ``max_hamming``.

    Scale shape: identical to SimHash text dedup — banded buckets
    bound the join (never all-pairs), the verify popcount is a cheap
    JVM expression (``bit_count(a ^ b)``), and the only corpus-sized
    stages are the map-only decode and the bucket exchange."""
    hashes = dhash_decoded(payloads).localCheckpoint(eager=False)
    bands = hashes.select(
        "doc_id", "dhash",
        F.explode(F.expr(
            "transform(sequence(0, 3), b -> struct(b AS band,"
            " shiftright(dhash, b * 16) & 65535 AS key))"
        )).alias("bk"),
    ).select("doc_id", "dhash", F.col("bk.band").alias("band"),
             F.col("bk.key").alias("key"))
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, ["band", "key"])
        .filter(F.expr("a.doc_id < b.doc_id"))
        .select(
            F.expr("a.doc_id").alias("doc_a"),
            F.expr("b.doc_id").alias("doc_b"),
            F.expr("bit_count(a.dhash ^ b.dhash)").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
