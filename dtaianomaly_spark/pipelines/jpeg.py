"""Baseline JPEG codec — pure NumPy + stdlib, from public spec knowledge
only (ITU-T T.81 / JFIF 1.1): the DCT compressed-image format the
multimodal tier was missing.

Encoder: 8-bit baseline sequential DCT, grayscale or RGB as 4:4:4 YCbCr
(no chroma subsampling), Annex-K quantization tables scaled by the IJG
quality mapping, per-image OPTIMAL Huffman tables built with the spec's
own code-length algorithm (T.81 Annex K.2, Figures K.1-K.3, including
the reserved-symbol trick that guarantees no all-ones code), canonical
code assignment (Figure K.4), 0xFF byte stuffing.

Decoder: baseline SOF0 only, components with 1x1 sampling (grayscale or
4:4:4 — what this encoder emits), multiple DQT/DHT segments, interleaved
MCU entropy decode, dequantize -> inverse zigzag -> IDCT -> level shift,
JFIF YCbCr->RGB. Progressive (SOF2), subsampled, 12-bit, arithmetic
coding and restart intervals raise ``NotImplementedError`` /
``ValueError`` naming the feature.

Exactness contract (what makes a closed-form oracle possible): JPEG is
lossy, but an image whose every 8x8 block is CONSTANT has an exact DCT
of one integer DC coefficient and zero ACs; at quality 100 the quant
tables are all ones, so quantize(round) -> dequantize -> IDCT -> round
recovers every pixel EXACTLY (float noise is ~1e-13, far below the 0.5
rounding radius). Grayscale avoids the lossy color transform, so
grayscale block-constant images round-trip bit-exactly through the FULL
marker/Huffman/DCT path — `pipelines/multimodal.py` builds its
oracle-checked `mm_jpeg_stats` query on this. General images round-trip
within a small bounded error (pytest-pinned).

Performance note: entropy coding is per-bit Python — fine for the small
frames a sampler decodes inside an Arrow batch; swap a codec library
outside this container for megapixel assets. The DCT itself is a NumPy
matrix product over all blocks at once.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables


def _zigzag() -> np.ndarray:
    """Flat block indices in zigzag scan order (T.81 Figure 5): diagonal
    s = r + c, even diagonals walked with r decreasing."""
    order = []
    for s in range(15):
        rng = range(min(s, 7), max(0, s - 7) - 1, -1) if s % 2 == 0 else \
            range(max(0, s - 7), min(s, 7) + 1)
        for r in rng:
            order.append(r * 8 + (s - r))
    return np.array(order, dtype=np.int64)


_ZZ = _zigzag()          # zigzag position k -> block flat index
_UNZZ = np.argsort(_ZZ)  # block flat index -> zigzag position

# T.81 Annex K.1 example quantization tables (the universal defaults)
_Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)
_Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality mapping: 50 -> base tables, 100 -> all ones."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be 1..100, got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix A: FDCT S = A B A^T (T.81
    A.3.3), IDCT B = A^T S A."""
    k = np.arange(8)
    A = 0.5 * np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    A[0] *= 1.0 / np.sqrt(2.0)
    return A


_A = _dct_matrix()

# ------------------------------------------------- optimal Huffman (K.2)


def _code_sizes(freq_in: np.ndarray) -> np.ndarray:
    """T.81 Figure K.1: code sizes from frequencies over 257 symbols
    (index 256 is the reserved symbol). Ties pick the LARGEST value, so
    the reserved symbol always sinks to the longest code."""
    freq = freq_in.astype(np.int64).copy()
    codesize = np.zeros(257, dtype=np.int64)
    others = np.full(257, -1, dtype=np.int64)
    while True:
        nz = np.nonzero(freq > 0)[0]
        if len(nz) < 2:
            break
        fmin = freq[nz].min()
        v1 = int(nz[freq[nz] == fmin].max())
        rest = nz[nz != v1]
        fmin2 = freq[rest].min()
        v2 = int(rest[freq[rest] == fmin2].max())
        freq[v1] += freq[v2]
        freq[v2] = 0
        codesize[v1] += 1
        while others[v1] != -1:
            v1 = int(others[v1])
            codesize[v1] += 1
        others[v1] = v2
        codesize[v2] += 1
        while others[v2] != -1:
            v2 = int(others[v2])
            codesize[v2] += 1
    return codesize


def build_huffman_table(freqs: dict[int, int]) -> tuple[list[int], list[int]]:
    """Symbol frequencies -> (BITS[1..16], HUFFVAL): the DHT payload.
    Implements T.81 Figures K.1 (code sizes, with reserved symbol 256),
    K.3 (limit lengths to 16) and K.4 (value ordering by code size then
    symbol)."""
    freq = np.zeros(257, dtype=np.int64)
    for s, c in freqs.items():
        if not 0 <= s <= 255:
            raise ValueError(f"symbol {s} out of byte range")
        freq[s] = c
    freq[256] = 1  # reserved: claims the all-ones longest code
    codesize = _code_sizes(freq)
    bits = np.zeros(33, dtype=np.int64)
    for s in range(257):
        if codesize[s] > 0:
            bits[codesize[s]] += 1
    i = 32  # Figure K.3: fold lengths > 16 down
    while i > 16:
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    i = 16  # drop the reserved symbol from the longest used length
    while bits[i] == 0:
        i -= 1
    bits[i] -= 1
    huffval = [
        s
        for s in sorted(range(256), key=lambda s: (codesize[s], s))
        if codesize[s] > 0
    ]
    return [int(b) for b in bits[1:17]], huffval


def _canonical_codes(
    bits: list[int], huffval: list[int]
) -> dict[int, tuple[int, int]]:
    """(BITS, HUFFVAL) -> {symbol: (code, length)} (T.81 Annex C)."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[huffval[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


# --------------------------------------------------------- bit plumbing


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._n += 1
            if self._n == 8:
                self.buf.append(self._acc)
                if self._acc == 0xFF:  # byte stuffing
                    self.buf.append(0x00)
                self._acc = 0
                self._n = 0

    def flush(self) -> None:
        while self._n:
            self.write(1, 1)  # pad with 1-bits (spec convention)


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def read_bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy-coded segment")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated entropy-coded segment")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError(
                        f"marker 0xFF{nxt:02X} inside entropy-coded data"
                        " (restart intervals are not supported)"
                    )
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, lut: dict[tuple[int, int], int]) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = lut.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy-coded data")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map `size` received bits to a signed value."""
    return v - ((1 << size) - 1) if v < (1 << (size - 1)) else v


def _category(v: int) -> int:
    """Bit size of |v| (DC/AC magnitude category)."""
    return int(abs(v)).bit_length()


# --------------------------------------------------------------- encode


def _to_blocks(chan: np.ndarray) -> np.ndarray:
    """(h, w) -> (n_blocks, 8, 8) float64, edge-replicated to 8x8."""
    h, w = chan.shape
    H, W = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    pad = np.pad(chan, ((0, H - h), (0, W - w)), mode="edge")
    return (
        pad.reshape(H // 8, 8, W // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        .astype(np.float64)
    )


def _encode_channel_coefs(chan: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """(h, w) uint8 channel -> (n_blocks, 64) int quantized zigzag
    coefficients. All-blocks-at-once NumPy: FDCT is one einsum."""
    blocks = _to_blocks(chan) - 128.0
    S = np.einsum("ur,brc,vc->buv", _A, blocks, _A, optimize=True)
    q = np.round(S / qtab.astype(np.float64)).astype(np.int64)
    return q.reshape(-1, 64)[:, _ZZ]


def _rle_symbols(coefs: np.ndarray, prev_dc: int) -> tuple[list, int]:
    """One block's zigzag coefficients -> [(dc_or_ac, symbol, value_bits,
    n_bits), ...] token list (T.81 F.1.2)."""
    out = []
    diff = int(coefs[0]) - prev_dc
    size = _category(diff)
    bits = diff if diff >= 0 else diff + (1 << size) - 1
    out.append(("dc", size, bits, size))
    run = 0
    nz = np.nonzero(coefs[1:])[0]
    last_nz = int(nz[-1]) + 1 if len(nz) else 0
    for k in range(1, last_nz + 1):
        v = int(coefs[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            out.append(("ac", 0xF0, 0, 0))  # ZRL
            run -= 16
        size = _category(v)
        bits = v if v >= 0 else v + (1 << size) - 1
        out.append(("ac", (run << 4) | size, bits, size))
        run = 0
    if last_nz < 63:
        out.append(("ac", 0x00, 0, 0))  # EOB
    return out, int(coefs[0])


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def encode_jpeg(arr: np.ndarray, quality: int = 90) -> bytes:
    """uint8 image -> baseline JFIF bytes. (h, w) grayscale or (h, w, 3)
    RGB (encoded as non-subsampled YCbCr). Per-image optimal Huffman
    tables; quality 100 = all-ones quantization tables."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        comps = [a.astype(np.float64)]
    elif a.ndim == 3 and a.shape[2] == 3:
        r, g, b = (a[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        comps = [
            np.clip(np.round(c), 0, 255) for c in (y, cb, cr)
        ]
    else:
        raise ValueError(
            f"expected (h, w) gray or (h, w, 3) RGB uint8, got {a.shape}"
        )
    h, w = a.shape[:2]
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError(f"unencodable dimensions {h}x{w}")
    n_comp = len(comps)
    qtabs = [_quality_scale(_Q_LUMA, quality)]
    if n_comp == 3:
        qtabs.append(_quality_scale(_Q_CHROMA, quality))
    # quantized coefficients per component (luma -> table 0, chroma -> 1)
    coef = [
        _encode_channel_coefs(c, qtabs[0 if i == 0 else -1])
        for i, c in enumerate(comps)
    ]
    # token streams + symbol frequencies per table class
    dc_freq = [dict() for _ in range(min(n_comp, 2))]
    ac_freq = [dict() for _ in range(min(n_comp, 2))]
    tokens = []
    n_blocks = coef[0].shape[0]
    prev = [0] * n_comp
    for bi in range(n_blocks):  # interleaved MCU order (1x1: one block per comp)
        for ci in range(n_comp):
            toks, prev[ci] = _rle_symbols(coef[ci][bi], prev[ci])
            cls = 0 if ci == 0 else 1
            for kind, sym, _bits, _n in toks:
                tgt = dc_freq[cls] if kind == "dc" else ac_freq[cls]
                tgt[sym] = tgt.get(sym, 0) + 1
            tokens.append((cls, toks))
    dc_tabs = [build_huffman_table(f) for f in dc_freq]
    ac_tabs = [build_huffman_table(f) for f in ac_freq]
    dc_codes = [_canonical_codes(*t) for t in dc_tabs]
    ac_codes = [_canonical_codes(*t) for t in ac_tabs]
    bw = _BitWriter()
    for cls, toks in tokens:
        for kind, sym, bits, n in toks:
            code, ln = (dc_codes if kind == "dc" else ac_codes)[cls][sym]
            bw.write(code, ln)
            if n:
                bw.write(bits, n)
    bw.flush()
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq, qt in enumerate(qtabs):
        out += _seg(
            0xDB, bytes([tq]) + bytes(qt.reshape(-1)[_ZZ].astype(np.uint8))
        )
    sof = struct.pack(">BHHB", 8, h, w, n_comp)
    for ci in range(n_comp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += _seg(0xC0, sof)
    for cls in range(len(dc_tabs)):
        bits, vals = dc_tabs[cls]
        out += _seg(0xC4, bytes([cls]) + bytes(bits) + bytes(vals))
        bits, vals = ac_tabs[cls]
        out += _seg(0xC4, bytes([0x10 | cls]) + bytes(bits) + bytes(vals))
    sos = bytes([n_comp])
    for ci in range(n_comp):
        cls = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (cls << 4) | cls])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------- decode


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> uint8 array: (h, w) for grayscale, (h, w,
    3) RGB for 3-component YCbCr. Supports what :func:`encode_jpeg`
    emits plus any baseline file with 1x1 sampling factors; progressive,
    subsampled, 12-bit, arithmetic-coded and restart-interval streams
    raise naming the feature."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI marker)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    sof = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("truncated JPEG: no SOS marker found")
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker code — skip them (the marker byte is the first non-FF)
        while payload[pos + 1] == 0xFF:
            pos += 1
            if pos + 4 > len(payload):
                raise ValueError("truncated JPEG: no SOS marker found")
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        (seglen,) = struct.unpack_from(">H", payload, pos)
        seg = payload[pos + 2:pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError(f"truncated segment 0xFF{marker:02X}")
        pos += seglen
        if marker == 0xDB:  # DQT (possibly multiple tables per segment)
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quantization tables")
                zz = np.frombuffer(seg[o + 1:o + 65], dtype=np.uint8)
                tab = np.zeros(64, dtype=np.int64)
                tab[_ZZ] = zz
                qtabs[tq] = tab.reshape(8, 8)
                o += 65
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 0x0F
                bits = list(seg[o + 1:o + 17])
                nv = sum(bits)
                vals = list(seg[o + 17:o + 17 + nv])
                codes = _canonical_codes(bits, vals)
                huff[(tc, th)] = {
                    (ln, code): sym for sym, (code, ln) in codes.items()
                }
                o += 17 + nv
        elif marker == 0xC0:
            sof = seg
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"SOF{marker - 0xC0} (only baseline sequential SOF0 is"
                " supported)"
            )
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals (DRI)")
        elif marker == 0xDA:
            sos = seg
            break
        # APPn / COM / others: skipped
    if sof is None:
        raise ValueError("missing SOF0 before SOS")
    precision, h, w, n_comp = struct.unpack_from(">BHHB", sof, 0)
    if precision != 8:
        raise NotImplementedError(f"{precision}-bit precision")
    comps = []
    for ci in range(n_comp):
        cid, hv, tq = sof[6 + 3 * ci:9 + 3 * ci]
        if hv != 0x11:
            raise NotImplementedError(
                f"sampling factors {hv >> 4}x{hv & 15} (only 1x1 / 4:4:4)"
            )
        comps.append((cid, tq))
    ns = sos[0]
    if ns != n_comp:
        raise NotImplementedError("multi-scan files (Ns != Nf)")
    scan_tabs = {}
    for si in range(ns):
        cid, tdta = sos[1 + 2 * si:3 + 2 * si]
        scan_tabs[cid] = (tdta >> 4, tdta & 0x0F)
    br = _BitReader(payload, pos)
    bh, bwid = (h + 7) // 8, (w + 7) // 8
    n_blocks = bh * bwid
    coefs = [
        np.zeros((n_blocks, 64), dtype=np.int64) for _ in range(n_comp)
    ]
    prev = [0] * n_comp
    for bi in range(n_blocks):
        for ci, (cid, _tq) in enumerate(comps):
            td, ta = scan_tabs[cid]
            dct = huff.get((0, td))
            act = huff.get((1, ta))
            if dct is None or act is None:
                raise ValueError(f"missing Huffman table for component {cid}")
            size = br.decode_symbol(dct)
            diff = _extend(br.receive(size), size) if size else 0
            prev[ci] += diff
            block = coefs[ci][bi]
            block[0] = prev[ci]
            k = 1
            while k <= 63:
                sym = br.decode_symbol(act)
                if sym == 0x00:  # EOB
                    break
                run, size = sym >> 4, sym & 0x0F
                if size == 0:
                    if run != 15:
                        raise ValueError(f"invalid AC symbol 0x{sym:02X}")
                    k += 16  # ZRL
                    continue
                k += run
                if k > 63:
                    raise ValueError("AC run past end of block")
                block[k] = _extend(br.receive(size), size)
                k += 1
    planes = []
    for ci, (_cid, tq) in enumerate(comps):
        if tq not in qtabs:
            raise ValueError(f"missing quantization table {tq}")
        deq = coefs[ci] * qtabs[tq].reshape(-1)[_ZZ][None, :]
        S = np.zeros((n_blocks, 64), dtype=np.float64)
        S[:, _ZZ] = deq  # inverse zigzag
        S = S.reshape(-1, 8, 8)
        B = np.einsum("ur,buv,vc->brc", _A, S, _A, optimize=True) + 128.0
        plane = (
            B.reshape(bh, bwid, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bwid * 8)[:h, :w]
        )
        planes.append(plane)
    if n_comp == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    if n_comp != 3:
        raise NotImplementedError(f"{n_comp}-component images")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(
        np.round(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)
