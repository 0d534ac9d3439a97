"""Pipeline-operator invariants that the SQL-oracle parity can't see:
multimodal plumbing (rows-only queries) and semantic sanity of the dedup
and similarity outputs."""

import os
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    from dtaianomaly_spark.pipelines import text as TX

    return TX.load_docs(spark, SF_DIR)


def test_byte_histogram_conserves_bytes(spark):
    from dtaianomaly_spark.pipelines import multimodal as MM

    payloads = MM.with_payload(_docs(spark))
    feats = MM.byte_histogram(payloads)
    bad = feats.filter(
        F.expr("aggregate(hist, CAST(0 AS BIGINT), (a, x) -> a + x) != n_bytes")
    ).count()
    assert bad == 0
    n_chars = {r["doc_id"]: r["n_chars"] for r in _docs(spark).collect()}
    for r in feats.limit(20).collect():
        assert r["n_bytes"] == n_chars[r["doc_id"]]  # ascii text: bytes == chars


def test_decode_image_rejects_codec_formats():
    from dtaianomaly_spark.pipelines import multimodal as MM

    with pytest.raises(NotImplementedError, match="codec"):
        MM.decode_image(b"GIF89a" + b"\x00" * 16)


def test_png_roundtrip_all_filters_and_colortypes():
    """encode->decode is identity for every scanline filter (0..4),
    gray/RGB/RGBA, and widths hitting 1-pixel rows and ch-alignment
    edges."""
    from dtaianomaly_spark.pipelines import multimodal as MM

    rng = np.random.default_rng(7)
    shapes = [(1, 1, 3), (3, 2, 3), (5, 7, 3), (4, 4, 4), (6, 3, 4)]
    for ft in range(5):
        for shape in shapes:
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            got = MM.decode_png(MM.encode_png(img, filter_type=ft))
            assert np.array_equal(got, img), (ft, shape)
        gray = rng.integers(0, 256, (5, 6), dtype=np.uint8)
        got = MM.decode_png(MM.encode_png(gray, filter_type=ft))
        assert got.shape == (5, 6) and np.array_equal(got, gray), ft
    # decode_image routes PNG by signature
    img = rng.integers(0, 256, (4, 5, 3), dtype=np.uint8)
    assert np.array_equal(MM.decode_image(MM.encode_png(img)), img)


def test_jpeg_block_constant_exact_roundtrip():
    """The oracle contract: grayscale images with CONSTANT 8x8 blocks at
    quality 100 decode EXACTLY (one integer DC, zero ACs, all-ones quant
    tables) — across block-grid shapes and extreme values."""
    from dtaianomaly_spark.pipelines import jpeg as J

    rng = np.random.default_rng(5)
    for bh, bw in [(1, 1), (1, 3), (2, 2), (3, 1), (4, 5)]:
        blocks = rng.integers(0, 256, (bh, bw), dtype=np.uint8)
        img = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
        got = J.decode_jpeg(J.encode_jpeg(img, quality=100))
        assert np.array_equal(got, img), (bh, bw)
    flat = np.repeat(np.repeat(
        np.array([[0, 255], [255, 0]], dtype=np.uint8), 8, 0), 8, 1)
    assert np.array_equal(
        J.decode_jpeg(J.encode_jpeg(flat, quality=100)), flat
    )


def test_jpeg_lossy_roundtrip_bounded_error():
    """General content: q100 error <= 1 gray / <= 3 RGB (DCT + color
    rounding only); a smooth gradient stays tight down to q50; non-
    multiple-of-8 dims pad+crop correctly; decode is deterministic."""
    from dtaianomaly_spark.pipelines import jpeg as J

    rng = np.random.default_rng(6)
    gray = rng.integers(0, 256, (17, 23), dtype=np.uint8)
    d = J.decode_jpeg(J.encode_jpeg(gray, quality=100))
    assert d.shape == gray.shape
    assert np.abs(d.astype(int) - gray.astype(int)).max() <= 1
    rgb = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    d3 = J.decode_jpeg(J.encode_jpeg(rgb, quality=100))
    assert d3.shape == rgb.shape
    assert np.abs(d3.astype(int) - rgb.astype(int)).max() <= 3
    yy, xx = np.mgrid[0:24, 0:24]
    smooth = np.minimum(yy * 3 + xx * 2, 255).astype(np.uint8)
    for q in (95, 75, 50):
        dq = J.decode_jpeg(J.encode_jpeg(smooth, quality=q))
        assert np.abs(dq.astype(int) - smooth.astype(int)).max() <= 8, q
    enc = J.encode_jpeg(gray, quality=90)
    assert J.decode_jpeg(enc).tobytes() == J.decode_jpeg(enc).tobytes()
    # decode_image routes by SOI magic
    from dtaianomaly_spark.pipelines import multimodal as MM

    assert np.array_equal(MM.decode_image(enc), J.decode_jpeg(enc))


def test_jpeg_huffman_table_builder_is_valid():
    """Spec-built tables are canonical prefix codes: <= 16-bit lengths,
    Kraft sum <= 1, no code is a prefix of another, and every symbol
    round-trips through a writer/reader pair."""
    from dtaianomaly_spark.pipelines import jpeg as J

    rng = np.random.default_rng(9)
    cases = [
        {0: 1},                                    # single symbol
        {i: 1 for i in range(162)},                # uniform, many symbols
        {i: int(v) for i, v in enumerate(rng.integers(1, 1000, 40))},
        {0: 10**9, 1: 1, 2: 1},                    # extreme skew
    ]
    for freqs in cases:
        bits, huffval = J.build_huffman_table(freqs)
        assert len(huffval) == len(freqs)
        assert sum(bits) == len(freqs)
        codes = J._canonical_codes(bits, huffval)
        assert set(codes) == set(freqs)
        assert all(1 <= ln <= 16 for _, ln in codes.values())
        assert sum(2.0 ** -ln for _, ln in codes.values()) <= 1.0
        strs = sorted(format(c, f"0{ln}b") for c, ln in codes.values())
        for s1, s2 in zip(strs, strs[1:]):
            assert not s2.startswith(s1), (s1, s2)
        bw = J._BitWriter()
        syms = list(freqs) * 3
        for s in syms:
            c, ln = codes[s]
            bw.write(c, ln)
        bw.flush()
        br = J._BitReader(bytes(bw.buf), 0)
        lut = {(ln, c): s for s, (c, ln) in codes.items()}
        assert [br.decode_symbol(lut) for _ in syms] == syms


def test_jpeg_unsupported_and_malformed_raise():
    from dtaianomaly_spark.pipelines import jpeg as J

    with pytest.raises(ValueError, match="SOI"):
        J.decode_jpeg(b"nope")
    img = np.zeros((8, 8), dtype=np.uint8)
    good = J.encode_jpeg(img)
    with pytest.raises(ValueError, match="truncated|marker"):
        J.decode_jpeg(good[:20])
    # progressive SOF2 flagged by name
    prog = bytearray(good)
    sof_at = prog.find(b"\xff\xc0")
    prog[sof_at + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="SOF2"):
        J.decode_jpeg(bytes(prog))
    with pytest.raises(ValueError, match="quality"):
        J.encode_jpeg(img, quality=0)
    with pytest.raises(ValueError, match="expected"):
        J.encode_jpeg(np.zeros((4, 4, 2), dtype=np.uint8))


def test_jpeg_fill_bytes_before_markers_accepted():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
    code — a conformant stream with padding must decode identically."""
    from dtaianomaly_spark.pipelines import jpeg as J

    rng = np.random.default_rng(11)
    blocks = rng.integers(0, 256, (2, 3), dtype=np.uint8)
    img = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
    good = J.encode_jpeg(img, quality=100)
    # pad before the first header marker (after SOI) and before the
    # second header segment's marker
    padded = good[:2] + b"\xff\xff\xff" + good[2:]
    assert np.array_equal(J.decode_jpeg(padded), img)
    second = padded.find(b"\xff\xdb")  # a DQT marker further in
    padded2 = padded[:second] + b"\xff" + padded[second:]
    assert np.array_equal(J.decode_jpeg(padded2), img)


def test_png_malformed_payloads_raise():
    from dtaianomaly_spark.pipelines import multimodal as MM

    img = np.arange(60, dtype=np.uint8).reshape(4, 5, 3)
    good = MM.encode_png(img)
    with pytest.raises(ValueError, match="signature"):
        MM.decode_png(b"not a png at all")
    # flip one IDAT byte -> CRC catches it
    bad = bytearray(good)
    bad[len(bad) - 20] ^= 0xFF
    with pytest.raises(ValueError, match="CRC|truncated"):
        MM.decode_png(bytes(bad))
    with pytest.raises(ValueError, match="IEND|truncated"):
        MM.decode_png(good[:-12])  # drop the IEND chunk
    # 16-bit depth and interlacing are valid PNG but unsupported
    import struct as _s
    import zlib as _z

    def chunk(t, d):
        return (
            _s.pack(">I", len(d)) + t + d
            + _s.pack(">I", _z.crc32(t + d) & 0xFFFFFFFF)
        )

    sig = good[:8]
    ihdr16 = _s.pack(">IIBBBBB", 5, 4, 16, 2, 0, 0, 0)
    with pytest.raises(NotImplementedError, match="bit depth"):
        MM.decode_png(sig + chunk(b"IHDR", ihdr16) + chunk(b"IEND", b""))
    ihdr_i = _s.pack(">IIBBBBB", 5, 4, 8, 2, 0, 0, 1)
    with pytest.raises(NotImplementedError, match="interlac"):
        MM.decode_png(sig + chunk(b"IHDR", ihdr_i) + chunk(b"IEND", b""))
    ihdr_pal = _s.pack(">IIBBBBB", 5, 4, 8, 3, 0, 0, 0)
    with pytest.raises(NotImplementedError, match="color type"):
        MM.decode_png(sig + chunk(b"IHDR", ihdr_pal) + chunk(b"IEND", b""))


def test_bmp_roundtrip_and_edge_layouts():
    """Pure-NumPy BMP codec: encode->decode is identity across widths
    that exercise every row-padding residue (w*3 % 4 in {0,1,2,3}),
    top-down (negative height) decodes, and malformed payloads raise
    with the offending field."""
    from dtaianomaly_spark.pipelines import multimodal as MM

    rng = np.random.default_rng(11)
    for h, w in [(1, 1), (3, 2), (4, 3), (5, 4), (7, 5), (16, 16)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(MM.decode_bmp(MM.encode_bmp(img)), img), (h, w)
        assert np.array_equal(MM.decode_image(MM.encode_bmp(img)), img)
    # top-down variant: flip rows, negate the height field
    import struct

    img = rng.integers(0, 256, (4, 5, 3), dtype=np.uint8)
    buf = bytearray(MM.encode_bmp(img[::-1]))
    h_field = struct.unpack_from("<i", buf, 22)[0]
    struct.pack_into("<i", buf, 22, -h_field)
    assert np.array_equal(MM.decode_bmp(bytes(buf)), img)
    # malformed payloads
    with pytest.raises(ValueError, match="magic"):
        MM.decode_bmp(b"XX" + bytes(60))
    with pytest.raises(ValueError, match="bpp=32"):
        bad = bytearray(MM.encode_bmp(img))
        struct.pack_into("<H", bad, 28, 32)
        MM.decode_bmp(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        MM.decode_bmp(MM.encode_bmp(img)[:-4])


def test_wav_roundtrip_and_chunk_walk():
    """Pure-NumPy WAV codec: encode->decode is identity for mono/stereo
    16-bit PCM across lengths hitting odd data sizes (word-alignment
    pad), and the chunk walk skips unknown chunks like real recorders
    emit (LIST/INFO, including odd-length ones)."""
    import struct

    from dtaianomaly_spark.pipelines import audio as AU

    rng = np.random.default_rng(13)
    for n, ch, rate in [(1, 1, 8000), (7, 1, 44100), (5, 2, 16000),
                        (64, 2, 48000), (3, 3, 9000)]:
        a = rng.integers(-32768, 32768, (n, ch)).astype(np.int16)
        got, got_rate = AU.decode_wav(AU.encode_wav(a, rate))
        assert got_rate == rate and np.array_equal(got, a), (n, ch)
    # mono 1-D input round-trips as (n, 1)
    m = rng.integers(-32768, 32768, 9).astype(np.int16)
    got, _ = AU.decode_wav(AU.encode_wav(m, 8000))
    assert np.array_equal(got, m[:, None])
    # insert an odd-length LIST chunk before fmt: walk must skip it
    # (with its pad byte) and still find fmt/data
    a = rng.integers(-32768, 32768, (6, 2)).astype(np.int16)
    wav = AU.encode_wav(a, 22050)
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    patched = wav[:12] + extra + wav[12:]
    got, got_rate = AU.decode_wav(patched)
    assert got_rate == 22050 and np.array_equal(got, a)
    # decode_audio routes by RIFF magic
    got2, _ = AU.decode_audio(wav)
    assert np.array_equal(got2, a)


def test_wav_malformed_and_compressed_raise():
    import struct

    from dtaianomaly_spark.pipelines import audio as AU

    a = np.arange(-8, 8, dtype=np.int16).reshape(8, 2)
    good = AU.encode_wav(a, 8000)
    with pytest.raises(ValueError, match="RIFF"):
        AU.decode_wav(b"XXXX" + good[4:])
    with pytest.raises(ValueError, match="WAVE"):
        AU.decode_wav(good[:8] + b"AVI " + good[12:])
    with pytest.raises(ValueError, match="truncated"):
        AU.decode_wav(good[:-6])
    # audio_format 3 (IEEE float) names itself
    buf = bytearray(good)
    struct.pack_into("<H", buf, 20, 3)
    with pytest.raises(NotImplementedError, match="IEEE float"):
        AU.decode_wav(bytes(buf))
    # 8-bit PCM is valid-but-unsupported
    buf = bytearray(good)
    struct.pack_into("<H", buf, 34, 8)
    with pytest.raises(NotImplementedError, match="bits_per_sample=8"):
        AU.decode_wav(bytes(buf))
    # block_align must match channels * 2
    buf = bytearray(good)
    struct.pack_into("<H", buf, 32, 6)
    with pytest.raises(ValueError, match="block_align"):
        AU.decode_wav(bytes(buf))
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        AU.decode_audio(b"\xff\xfbMP3 frames" + bytes(16))
    with pytest.raises(ValueError, match="sample_rate"):
        AU.encode_wav(a, 0)


def test_wav_frame_energy_matches_numpy(spark):
    """Framed short-time energy over the synthetic WAV corpus equals a
    direct NumPy computation on the same closed-form clips, including
    the ragged tail frame."""
    from dtaianomaly_spark.pipelines import audio as AU

    docs = _docs(spark).limit(12)
    rows = AU.frame_energy_decoded(
        AU.with_wav_payload(docs), frame_len=16
    ).collect()
    got = {(r["doc_id"], r["frame_idx"]): (r["n_in_frame"], r["energy"])
           for r in rows}
    want = {}
    for r in docs.select("doc_id").collect():
        d = int(r["doc_id"])
        n, ch, _ = AU._audio_dims(d)
        sq = (AU._audio_clip(d, n, ch).astype(np.int64) ** 2).sum(axis=1)
        for f in range(0, n, 16):
            seg = sq[f:f + 16]
            want[(d, f // 16)] = (int(seg.shape[0]), int(seg.sum()))
    assert got == want
    with pytest.raises(ValueError, match="frame_len"):
        AU.frame_energy_decoded(AU.with_wav_payload(docs), frame_len=0)


def test_avi_roundtrip_and_container_walk():
    """Pure-NumPy AVI codec: encode->decode is identity for
    uncompressed-DIB clips across shapes hitting row padding, and the
    chunk walk survives what real writers emit — JUNK chunks, LIST
    'rec ' frame grouping, interleaved audio-stream chunks, odd-length
    chunks (word-alignment pad)."""
    import struct

    from dtaianomaly_spark.pipelines import video as VI

    rng = np.random.default_rng(17)
    for nf, h, w, rate, scale in [(1, 1, 1, 30, 1), (2, 4, 5, 24, 1),
                                  (3, 6, 8, 30000, 1001), (6, 5, 7, 10, 1)]:
        a = rng.integers(0, 256, (nf, h, w, 3)).astype(np.uint8)
        got, got_rate, got_scale = VI.decode_avi(VI.encode_avi(a, rate, scale))
        assert (got_rate, got_scale) == (rate, scale)
        assert np.array_equal(got, a), (nf, h, w)

    # rebuild the container the way an interleaved writer would: first
    # frame inside a LIST 'rec ' next to an odd-length audio chunk, a
    # JUNK chunk between hdrl and movi — the walk must skip all of it
    a = rng.integers(0, 256, (3, 4, 5), dtype=np.uint8)
    a = np.stack([a, a + 1, a + 2], axis=-1).astype(np.uint8)
    avi = VI.encode_avi(a, 12)
    hdrl_raw = None
    for cid, start, size in VI._walk(avi, 12, len(avi)):
        if cid == b"LIST" and avi[start:start + 4] == b"hdrl":
            hdrl_raw = avi[start - 8:start + size + (size % 2)]
    stride = (5 * 3 + 3) // 4 * 4
    frame_cks = [VI._ck(b"00db", VI._dib_rows(a[f], stride)) for f in range(3)]
    movi = VI._list(
        b"rec ", frame_cks[0] + VI._ck(b"01wb", b"\x01" * 7)
    ) + b"".join(frame_cks[1:])
    body = (b"AVI " + hdrl_raw + VI._ck(b"JUNK", b"x" * 3)
            + VI._list(b"movi", movi))
    patched = b"RIFF" + struct.pack("<I", len(body)) + body
    got, got_rate, _ = VI.decode_avi(patched)
    assert got_rate == 12 and np.array_equal(got, a)


def test_avi_malformed_and_compressed_raise():
    import struct

    from dtaianomaly_spark.pipelines import video as VI

    a = np.arange(2 * 4 * 5 * 3, dtype=np.uint8).reshape(2, 4, 5, 3)
    good = VI.encode_avi(a, 25)
    with pytest.raises(ValueError, match="RIFF"):
        VI.decode_avi(b"XXXX" + good[4:])
    with pytest.raises(ValueError, match="'AVI '"):
        VI.decode_avi(good[:8] + b"WAVE" + good[12:])
    with pytest.raises(ValueError, match="truncated"):
        VI.decode_avi(good[:-10])
    # compressed codec names its fourcc
    buf = bytearray(good)
    i = good.find(b"strf")
    struct.pack_into("<I", buf, i + 8 + 16, struct.unpack("<I", b"MJPG")[0])
    with pytest.raises(NotImplementedError, match="MJPG"):
        VI.decode_avi(bytes(buf))
    # 8-bit DIB is valid-but-unsupported
    buf = bytearray(good)
    struct.pack_into("<H", buf, i + 8 + 14, 8)
    with pytest.raises(NotImplementedError, match="biBitCount=8"):
        VI.decode_avi(bytes(buf))
    # avih/strf dimension disagreement names both
    buf = bytearray(good)
    j = good.find(b"avih")
    struct.pack_into("<I", buf, j + 8 + 32, 99)
    with pytest.raises(ValueError, match="header mismatch"):
        VI.decode_avi(bytes(buf))
    # a stream that is not video is not a 'vids' stream
    buf = bytearray(good)
    k = good.find(b"strh")
    buf[k + 8:k + 12] = b"auds"
    with pytest.raises(ValueError, match="no 'vids' stream"):
        VI.decode_avi(bytes(buf))
    # frame chunk whose size is not one whole DIB
    buf = bytearray(good)
    m = good.find(b"00db")
    (fsize,) = struct.unpack_from("<I", good, m + 4)
    struct.pack_into("<I", buf, m + 4, fsize - 4)
    with pytest.raises(ValueError, match="24-bit DIB"):
        VI.decode_avi(bytes(buf))
    with pytest.raises(ValueError, match="rate/scale"):
        VI.encode_avi(a, 0)
    with pytest.raises(ValueError, match="n_frames"):
        VI.encode_avi(a[0], 25)


def test_wav_zcr_autocorr_matches_numpy(spark):
    """Zero-crossing count and lag-1 autocorrelation over the synthetic
    WAV corpus equal a direct NumPy computation per channel."""
    from dtaianomaly_spark.pipelines import audio as AU

    docs = _docs(spark).limit(10)
    rows = AU.zcr_autocorr_decoded(AU.with_wav_payload(docs)).collect()
    got = {(r["doc_id"], r["channel"]): (r["n_samples"], r["zcr"],
                                         r["ac_lag1"])
           for r in rows}
    want = {}
    for r in docs.select("doc_id").collect():
        d = int(r["doc_id"])
        n, ch, _ = AU._audio_dims(d)
        s = AU._audio_clip(d, n, ch).astype(np.int64)
        nonneg = s >= 0
        for c in range(ch):
            want[(d, c)] = (
                n, int((nonneg[1:, c] != nonneg[:-1, c]).sum()),
                int((s[1:, c] * s[:-1, c]).sum()),
            )
    assert got == want


def test_pii_redact_counts_and_scrub(spark):
    """PII scrub: per-doc counts follow the splice's closed form, the
    redacted text carries the placeholder tags, and re-running the
    patterns over the redacted text finds nothing left."""
    import re

    from dtaianomaly_spark.pipelines import text as TX

    docs = _docs(spark).limit(40)
    red = {r["doc_id"]: r for r in TX.pii_redact(docs).collect()}
    raw = {r["doc_id"]: r["ptext"]
           for r in TX.with_pii_text(docs).collect()}
    assert len(red) == 40
    for d, r in red.items():
        want_emails = (1 if d % 3 > 0 else 0) + (1 if d % 5 == 0 else 0)
        assert r["n_emails"] == want_emails, d
        assert r["n_phones"] == (1 if d % 2 == 0 else 0), d
        assert r["n_ips"] == 1, d
        # redact independently in Python and md5-compare
        t = raw[d]
        for kind, tag in (("email", "[EMAIL]"), ("phone", "[PHONE]"),
                          ("ip", "[IP]")):
            t = re.sub(TX.PII_PATTERNS[kind], tag, t)
        import hashlib

        assert r["redacted_md5"] == hashlib.md5(t.encode()).hexdigest(), d
        assert r["redacted_len"] == len(t)
        for pat in TX.PII_PATTERNS.values():
            assert not re.search(pat, t), (d, pat)


def test_mm_curation_funnel_matches_direct_recompute(spark):
    """Cross-modal funnel tallies equal a direct per-doc recompute of
    all four modality rules from the closed forms, and the split is
    nontrivial (some kept, some dropped, every rule fires somewhere
    at this SF)."""
    import re

    from dtaianomaly_spark.pipelines import audio as AU
    from dtaianomaly_spark.pipelines import mm_curation as MC
    from dtaianomaly_spark.pipelines import multimodal as MM
    from dtaianomaly_spark.pipelines import text as TX

    docs = _docs(spark)
    got = {r["source"]: r for r in
           MC.multimodal_curation_funnel(docs).collect()}
    raw = {r["doc_id"]: r["ptext"]
           for r in TX.with_pii_text(docs).collect()}
    want: dict = {}
    for r in docs.select("doc_id", "source", "text").collect():
        d, text = int(r["doc_id"]), r["text"]
        spaces = text.count(" ")
        digits = sum(ch.isdigit() for ch in text)
        text_ok = digits * 4 < len(text) and spaces + 1 >= MC.MIN_WORDS
        pii_ok = (
            len(re.findall(TX.PII_PATTERNS["email"], raw[d]))
            + len(re.findall(TX.PII_PATTERNS["phone"], raw[d]))
        ) <= 1
        _, h, w = MM._video_dims(d)
        px = int(MM._video_frame(d, 0, h, w).sum(dtype=np.int64))
        img_ok = MC.PX_MEAN_LO * h * w * 3 <= px <= MC.PX_MEAN_HI * h * w * 3
        n, ch, _ = AU._audio_dims(d)
        s = AU._audio_clip(d, n, ch).astype(np.int64)
        audio_ok = int((s * s).sum()) >= MC.MEANSQ_MIN * n * ch
        agg = want.setdefault(r["source"], [0] * 6)
        agg[0] += 1
        agg[1] += text_ok and pii_ok and img_ok and audio_ok
        agg[2] += not text_ok
        agg[3] += not pii_ok
        agg[4] += not img_ok
        agg[5] += not audio_ok
    assert set(got) == set(want)
    for src, (nd, nk, tf, pf, mf, af) in want.items():
        g = got[src]
        assert (g["n_docs"], g["n_keep"], g["n_text_fail"], g["n_pii_fail"],
                g["n_img_fail"], g["n_audio_fail"]) == (nd, nk, tf, pf,
                                                        mf, af), src
    tot = [sum(v[i] for v in want.values()) for i in range(6)]
    assert 0 < tot[1] < tot[0]
    assert all(t > 0 for t in tot[2:])


def test_avi_motion_matches_numpy(spark):
    """Frame-to-frame SAD over the synthetic AVI corpus equals a direct
    NumPy computation on the same closed-form clips."""
    from dtaianomaly_spark.pipelines import multimodal as MM
    from dtaianomaly_spark.pipelines import video as VI

    docs = _docs(spark).limit(10)
    rows = VI.avi_motion_decoded(VI.with_avi_payload(docs)).collect()
    got = {(r["doc_id"], r["frame_idx"]): (r["n_px"], r["sad"],
                                           r["max_px_diff"])
           for r in rows}
    want = {}
    for r in docs.select("doc_id").collect():
        d = int(r["doc_id"])
        nf, h, w = MM._video_dims(d)
        clip = np.stack(
            [MM._video_frame(d, f, h, w) for f in range(nf)]
        ).astype(np.int64)
        diff = np.abs(clip[1:] - clip[:-1])
        for f in range(nf - 1):
            want[(d, f + 1)] = (int(diff[f].size), int(diff[f].sum()),
                                int(diff[f].max()))
    assert got == want


def test_frame_sample_decoded_matches_formula(spark):
    """Decoded-frame sampling: per-doc frame count is min(4, F), sampled
    indices follow j*F//m, and the decoded pixel stats equal the
    closed-form synthesis recomputed in NumPy."""
    from dtaianomaly_spark.pipelines import multimodal as MM

    docs = _docs(spark).filter("doc_id < 25")
    got = MM.frame_sample_decoded(
        MM.with_video_payload(docs), n_frames=4
    ).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d in range(25):
        nf, h, w = MM._video_dims(d)
        m = min(4, nf)
        rows = sorted(by_doc[d], key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in rows] == [j * nf // m for j in range(m)]
        for r in rows:
            img = MM._video_frame(d, r["frame_idx"], h, w)
            assert (r["h"], r["w"]) == img.shape[:2]
            assert r["px_sum"] == int(img.sum(dtype=np.int64))
            assert r["px_min"] == int(img.min())
            assert r["px_max"] == int(img.max())


def test_frame_sample_shape(spark):
    from dtaianomaly_spark.pipelines import multimodal as MM

    payloads = MM.with_payload(_docs(spark))
    frames = MM.frame_sample(payloads, n_frames=4, frame_bytes=32)
    n_docs = _docs(spark).count()
    assert frames.count() == 4 * n_docs
    r = frames.filter("doc_id = 0 AND frame_idx = 0").collect()[0]
    assert len(r["frame"]) == 32


def test_cosine_topk_self_consistency(spark):
    """Top-1 neighbor of q must have cos <= 1 and the kernel-side NumPy
    cosine over the same quantization must agree."""
    from dtaianomaly_spark.pipelines import similarity as SIM

    emb = SIM.load_embeddings(spark, SF_DIR)
    top = SIM.cosine_topk(emb, n_queries=4, k=3).collect()
    vecs = {
        r["vec_id"]: np.floor(np.asarray(r["embedding"], dtype=np.float64) * 10000)
        for r in emb.filter("vec_id < 500").collect()
    }
    for r in top:
        q, c = vecs[r["qid"]], vecs[r["vid"]]
        dot = int((q * c).sum())
        assert dot == r["dot"]
        cos = dot / np.sqrt((q * q).sum() * (c * c).sum())
        assert abs(cos - r["cos"]) < 1e-12
        assert -1.0000001 <= r["cos"] <= 1.0000001


def test_srp_is_subset_ranking_of_bruteforce(spark):
    """SRP-LSH candidates are a subset of all vectors, so every reported
    neighbor must appear in the brute-force ranking with the same cos."""
    from dtaianomaly_spark.pipelines import similarity as SIM

    emb = SIM.load_embeddings(spark, SF_DIR)
    brute = {
        (r["qid"], r["vid"]): r["cos"]
        for r in SIM.cosine_topk(emb, n_queries=4, k=500).collect()
    }
    srp = SIM.srp_lsh_topk(emb, n_queries=4, k=5).collect()
    assert len(srp) > 0
    for r in srp:
        assert brute[(r["qid"], r["vid"])] == r["cos"]


def test_exact_dedup_partitions_docs(spark):
    from dtaianomaly_spark.pipelines import text as TX

    docs = _docs(spark)
    groups = TX.exact_dedup(docs)
    assert groups.agg(F.sum("dup_cnt")).collect()[0][0] == docs.count()


def test_jaccard_pairs_bounded(spark):
    from dtaianomaly_spark.pipelines import text as TX

    pairs = TX.jaccard_pairs(_docs(spark), threshold=0.0).limit(200).collect()
    for r in pairs:
        assert 0.0 < r["jaccard"] <= 1.0
        assert r["inter"] <= min(r["na"], r["nb"])


def test_informative_shingles_strategies_agree(spark):
    """window (one-pass, full sort) and anti (partial counts + broadcast
    anti-join, the 100-TB shape) must produce identical shingle sets."""
    from dtaianomaly_spark.pipelines import text as TX

    docs = TX.load_docs(spark, "/root/testdata/sf0.001")
    w = TX.informative_shingles(docs, strategy="window")
    a = TX.informative_shingles(docs, strategy="anti")
    assert w.count() == a.count() > 0
    assert w.exceptAll(a).count() == 0
    assert a.exceptAll(w).count() == 0


def test_dedup_suite_shares_shingle_stage(spark):
    from dtaianomaly_spark.pipelines import text as TX

    docs = TX.load_docs(spark, "/root/testdata/sf0.001")
    suite = TX.dedup_suite(docs)
    try:
        assert suite["minhash"].count() == TX.minhash_signatures(docs).count()
        assert suite["simhash"].count() == TX.simhash(docs).count()
        assert suite["lsh_pairs"].count() == TX.lsh_candidate_pairs(docs).count()
        assert suite["jaccard"].count() == TX.jaccard_pairs(docs).count()
    finally:
        suite["shingles"].unpersist()


def test_srp_multiprobe_improves_recall(spark):
    """Multi-probe (1-bit-flip buckets) must beat single-probe recall@5
    against the exact brute-force top-k, at the same table count."""
    from dtaianomaly_spark.pipelines import similarity as SIM

    emb = SIM.load_embeddings(spark, "/root/testdata/sf0.001")
    exact = {(r["qid"], r["vid"]) for r in SIM.cosine_topk(emb).collect()}
    single = {
        (r["qid"], r["vid"])
        for r in SIM.srp_lsh_topk(emb, probe_bits=0).collect()
    }
    multi = {
        (r["qid"], r["vid"])
        for r in SIM.srp_lsh_topk(emb, probe_bits=1).collect()
    }
    r_single = len(exact & single) / len(exact)
    r_multi = len(exact & multi) / len(exact)
    assert r_multi > r_single  # deterministic data + hashes: stable
    assert r_multi >= 0.6


def test_ivf_topk_recall_scales_with_probes(spark):
    """IVF coarse quantizer: recall@5 vs exact brute force grows with
    n_probe and is exact when every cell is probed."""
    from dtaianomaly_spark.pipelines import similarity as SIM

    emb = SIM.load_embeddings(spark, "/root/testdata/sf0.001")
    exact = {(r["qid"], r["vid"]) for r in SIM.cosine_topk(emb).collect()}
    r = {}
    for npb in (2, 8, 16):
        got = {
            (r_["qid"], r_["vid"])
            for r_ in SIM.ivf_topk(emb, n_cells=16, n_probe=npb).collect()
        }
        r[npb] = len(exact & got) / len(exact)
    assert r[2] <= r[8] <= r[16]
    assert r[16] == 1.0  # probing all cells == brute force
    assert r[8] >= 0.6


def test_ivfpq_topk_recall_and_compression(spark):
    """IVF-PQ (ADC + exact re-rank): recall@5 vs the exact brute force is
    monotone in n_probe and >= 0.9 at full probe, on PQ's hardest data
    (near-random synthetic embeddings). The code payload is 16 ints per
    vector (vs 64 floats) — the 16x memory story."""
    from dtaianomaly_spark.pipelines import similarity as SIM

    emb = SIM.load_embeddings(spark, "/root/testdata/sf0.001")
    exact = {(r["qid"], r["vid"]) for r in SIM.cosine_topk(emb).collect()}
    r = {}
    for npb in (4, 16):
        got = {
            (r_["qid"], r_["vid"])
            for r_ in SIM.ivfpq_topk(emb, n_cells=16, n_probe=npb).collect()
        }
        r[npb] = len(exact & got) / len(exact)
    assert r[4] <= r[16]
    assert r[16] >= 0.9
    # every returned neighbor's cosine is exact (the re-rank pass)
    full = SIM.ivfpq_topk(emb, n_cells=16, n_probe=16).collect()
    by_q = {}
    for row in full:
        by_q.setdefault(row["qid"], []).append(row)
    for rows in by_q.values():
        cs = [row["cos"] for row in sorted(rows, key=lambda x: x["rk"])]
        assert cs == sorted(cs, reverse=True)


def test_embed_neardup_pairs_subset_of_exact(spark):
    """Every emitted near-dup pair really has cosine >= threshold (the
    exact rescore guarantees no false positives)."""
    from dtaianomaly_spark.pipelines import similarity as SIM

    emb = SIM.load_embeddings(spark, "/root/testdata/sf0.001")
    rows = SIM.embed_neardup_pairs(emb, 0.4).collect()
    assert len(rows) > 0
    assert all(r["cos"] >= 0.4 and r["va"] < r["vb"] for r in rows)


def test_source_mix_weights_equalize(spark):
    """Mixing weights must satisfy Σ group_tokens·weight = total tokens /
    n_groups · n_groups (i.e. weighted mass is uniform across groups)."""
    from dtaianomaly_spark.pipelines import text as TX

    rows = TX.source_mix(TX.load_docs(spark, "/root/testdata/sf0.001")).collect()
    assert len(rows) > 1
    masses = [r["est_tokens"] * r["mix_weight"] for r in rows]
    assert max(masses) - min(masses) < 1e-6 * max(masses)


def test_dup_ngram_rate_bounds(spark):
    from dtaianomaly_spark.pipelines import text as TX

    rows = TX.dup_ngram_rate(TX.load_docs(spark, "/root/testdata/sf0.001")).collect()
    assert len(rows) == 500
    assert all(0.0 <= r["dup_rate"] <= 1.0 and r["n_dup"] <= r["n_shingles"] for r in rows)


def test_boilerplate_segments_flags_shared_segments(spark):
    """A segment pasted into >= 3 docs is boilerplate; unique tails are
    kept; word accounting is conserved."""
    from dtaianomaly_spark.pipelines import text as TX

    boiler = "a b c d e f g h"  # exactly one 8-word segment
    docs = spark.createDataFrame(
        [
            (0, boiler + " u0 v0 w0"),
            (1, boiler + " u1 v1 w1"),
            (2, boiler + " u2 v2 w2"),
            (3, "x y z only unique words here none shared at all ok"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in TX.boilerplate_segments(docs).collect()}
    for d in (0, 1, 2):
        r = out[d]
        assert r["n_seg"] == 2 and r["n_boiler"] == 1
        assert r["words_total"] == 11 and r["words_kept"] == 3
        assert r["boiler_rate"] == 0.5
    r = out[3]
    assert r["n_boiler"] == 0 and r["words_kept"] == r["words_total"] == 12
    assert r["n_seg"] == 2  # 8 + 4-word tail segment


def test_char_bigram_rarity_flags_garbled_doc(spark):
    """A doc of characters the rest of the corpus never emits must score
    a strictly higher rare_rate than the repetitive majority docs."""
    from dtaianomaly_spark.pipelines import text as TX

    common = "the data the data the data the data the data"
    docs = spark.createDataFrame(
        [(i, common) for i in range(20)] + [(99, "qxzj qvkz zzqx jxqv")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in TX.char_bigram_rarity(docs).collect()}
    assert out[99]["rare_rate"] > out[0]["rare_rate"]
    assert out[99]["n_rare"] == out[99]["n_bigrams"]  # every bigram rare
    for r in out.values():
        assert r["n_rare"] <= r["n_bigrams"]
        assert r["freq_mass"] >= r["n_bigrams"]  # each bigram counts itself


def test_dedup_clusters_min_label_components(spark):
    """Connected components via min-label propagation: chain, triangle,
    singleton, and a two-hop bridge all resolve to the component min."""
    from dtaianomaly_spark.pipelines import text as TX

    docs = spark.createDataFrame(
        [(i,) for i in range(10)], "doc_id long"
    )
    # components: {0,1,2,3} chain, {5,6,7} triangle, {8,9} pair, {4} singleton
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (5, 6), (6, 7), (5, 7), (9, 8)],
        "doc_a long, doc_b long",
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in TX.dedup_clusters(docs, pairs).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 5, 6: 5, 7: 5, 8: 8, 9: 8}


def test_curation_funnel_monotone_and_consistent(spark):
    """Funnel stages only shrink, raw totals match the corpus, and the
    near-dedup keep-set is one doc per non-singleton cluster."""
    from dtaianomaly_spark.pipelines import text as TX

    docs = TX.load_docs(spark, "/root/testdata/sf0.001")
    rows = {r["stage"]: r for r in TX.curation_funnel(docs).collect()}
    assert set(rows) == {"raw", "exact_dedup", "near_dedup", "quality"}
    assert rows["raw"]["n_docs"] == docs.count()
    seq = [rows[s] for s in ("raw", "exact_dedup", "near_dedup", "quality")]
    for a, b in zip(seq, seq[1:]):
        assert b["n_docs"] <= a["n_docs"]
        assert b["n_tokens"] <= a["n_tokens"]
    assert rows["quality"]["n_docs"] > 0


def test_decontaminate_flags_eval_copy(spark):
    """A training doc that copies an eval doc's text verbatim must show
    contamination ~1.0; unrelated docs with disjoint vocabulary show 0."""
    from dtaianomaly_spark.pipelines import text as TX

    eval_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = spark.createDataFrame(
        [
            (0, eval_text),          # doc_id % 97 == 0 -> eval set
            (1, eval_text),          # verbatim copy -> fully contaminated
            (2, "one two three four five six seven eight nine ten"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in TX.decontaminate(rows).collect()}
    assert set(out) == {1, 2}  # eval doc itself excluded
    assert out[1]["n_hits"] == out[1]["n_ngrams"] > 0
    assert out[1]["contam_rate"] == 1.0
    assert out[2]["n_hits"] == 0 and out[2]["contam_rate"] == 0.0


def test_gopher_rules_flags(spark):
    """Rule flags respond to the right signals and keep is conjunctive."""
    from dtaianomaly_spark.pipelines import text as TX

    long_ok = "the " + " ".join(f"word{i}" for i in range(30))
    short = "the cat"  # fails word-count bound
    no_stop = " ".join(f"tok{i}" for i in range(30))  # no stop words
    repeats = "the " + " ".join(["dup"] * 40)  # dup_word_rate ~ 1
    rows = spark.createDataFrame(
        [(0, long_ok), (1, short), (2, no_stop), (3, repeats)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in TX.gopher_rules(rows).collect()}
    assert out[0]["keep"] == 1
    assert out[1]["pass_words"] == 0 and out[1]["keep"] == 0
    assert out[2]["pass_stop"] == 0 and out[2]["keep"] == 0
    assert out[3]["pass_dup"] == 0 and out[3]["keep"] == 0
    for r in out.values():
        expected = int(
            r["pass_words"] and r["pass_mwl"] and r["pass_dup"] and r["pass_stop"]
        )
        assert r["keep"] == expected


def test_mixture_sample_equalizes_and_bounds(spark):
    """Lightest source keeps everything (rate 1.0); kept mass is bounded
    by the per-source mass; the sample is deterministic across runs."""
    from dtaianomaly_spark.pipelines import text as TX

    docs = _docs(spark)
    rows = TX.mixture_sample(docs).collect()
    assert len(rows) > 1
    floor = min(r["est_tokens"] for r in rows)
    for r in rows:
        assert r["keep_rate"] == pytest.approx(floor / r["est_tokens"])
        assert 0 <= r["kept_docs"] <= r["n_docs"]
        assert 0 <= r["kept_tokens"] <= r["est_tokens"]
    lightest = min(rows, key=lambda r: r["est_tokens"])
    assert lightest["kept_docs"] == lightest["n_docs"]
    again = {r["source"]: r for r in TX.mixture_sample(docs).collect()}
    assert all(again[r["source"]] == r for r in rows)


def test_vocab_topk_matches_pandas_wordcount(spark):
    """Top-k head equals an exact pandas word count on the same corpus."""
    from collections import Counter

    from dtaianomaly_spark.pipelines import text as TX

    docs = _docs(spark)
    pdf = docs.select("doc_id", "text").toPandas()
    cnt, dfc = Counter(), Counter()
    for t in pdf["text"]:
        words = t.split(" ")
        cnt.update(words)
        dfc.update(set(words))
    expect = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    got = TX.vocab_topk(docs).collect()
    assert [(r["word"], r["cnt"]) for r in got] == expect
    assert all(r["df"] == dfc[r["word"]] for r in got)


def test_substring_dedup_known_spans(spark):
    """Hand-built corpus: an 8-word span shared by two docs is removed
    from BOTH (span dedup keeps neither copy — Lee et al. semantics);
    a same-doc repeat is removed too; unique prose survives in order."""
    from dtaianomaly_spark.pipelines import text as TX

    span = "a b c d e f g h"
    docs = spark.createDataFrame(
        [
            (0, f"x1 x2 {span} y1 y2"),
            (1, f"z1 z2 z3 {span}"),
            (2, f"{span} m1 {span}"),          # same-doc repeat
            (3, "u1 u2 u3 u4 u5 u6 u7"),       # < 8 words: no grams
            (4, span),                          # fully covered
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in TX.substring_dedup(docs, w=8).collect()
    }
    assert got[0]["cleaned_text"] == "x1 x2 y1 y2"
    assert got[1]["cleaned_text"] == "z1 z2 z3"
    assert got[2]["cleaned_text"] == "m1"
    assert got[3]["cleaned_text"] == "u1 u2 u3 u4 u5 u6 u7"
    assert got[3]["n_covered"] == 0
    assert got[4]["cleaned_text"] == "" and got[4]["n_covered"] == 8
    for r in got.values():
        kept_words = len(r["cleaned_text"].split()) if r["cleaned_text"] else 0
        assert kept_words == r["n_words"] - r["n_covered"]


def test_substring_dedup_spans_known_spans(spark):
    """Variable-length variant: only merged duplicate islands of at
    least min_len words are removed — a lone duplicated 8-gram
    survives min_len=16, a 16-word duplicated run is removed, and
    adjacent duplicated grams chain into one island."""
    from dtaianomaly_spark.pipelines import text as TX

    s8 = "a b c d e f g h"                      # 8-word duplicated span
    s16 = "p1 p2 p3 p4 p5 p6 p7 p8 q1 q2 q3 q4 q5 q6 q7 q8"
    docs = spark.createDataFrame(
        [
            (0, f"x1 x2 {s8} y1 y2"),           # island len 8 < 16: kept
            (1, f"z1 {s8} z2"),
            (2, f"m1 {s16} m2"),                # island len 16: removed
            (3, f"{s16} n1"),
            # adjacency chain: s8 twice back-to-back = 16 covered words
            (4, f"w1 {s8} {s8} w2"),
            (5, f"v1 {s8} v2 {s8} v3"),         # two separate len-8 islands
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in TX.substring_dedup_spans(docs, w=8, min_len=16).collect()
    }
    assert got[0]["cleaned_text"] == f"x1 x2 {s8} y1 y2"
    assert got[0]["n_covered"] == 0
    assert got[1]["n_covered"] == 0
    assert got[2]["cleaned_text"] == "m1 m2"
    assert got[2]["n_covered"] == 16
    assert got[3]["cleaned_text"] == "n1"
    assert got[4]["cleaned_text"] == "w1 w2"
    assert got[4]["n_covered"] == 16
    assert got[5]["n_covered"] == 0            # islands len 8 each: kept
    for r in got.values():
        kept = len(r["cleaned_text"].split()) if r["cleaned_text"] else 0
        assert kept == r["n_words"] - r["n_covered"]


def _spans_oracle(texts, w, min_len):
    """Brute-force Python oracle for substring_dedup_spans."""
    from collections import Counter

    grams = Counter()
    for t in texts.values():
        for i in range(len(t) - w + 1):
            grams[tuple(t[i : i + w])] += 1
    out = {}
    for d, t in texts.items():
        ivs = [
            (i, i + w - 1)
            for i in range(len(t) - w + 1)
            if grams[tuple(t[i : i + w])] >= 2
        ]
        merged = []
        for s, e in ivs:  # already sorted by s
            if merged and s <= merged[-1][1] + 1:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        cov = set()
        for s, e in merged:
            if e - s + 1 >= min_len:
                cov.update(range(s, e + 1))
        kept = [x for i, x in enumerate(t) if i not in cov]
        out[d] = (len(t), len(cov), " ".join(kept))
    return out


def test_substring_dedup_spans_matches_bruteforce(spark):
    """On the real sf0.001 corpus, the distributed gaps-and-islands
    pass matches a brute-force Python implementation exactly — for two
    (w, min_len) settings, including min_len == w (the degenerate case
    equal to plain substring_dedup coverage up to adjacency merging)."""
    from dtaianomaly_spark.pipelines import text as TX

    docs = _docs(spark)
    texts = {r["doc_id"]: r["text"].split() for r in docs.collect()}
    for w, min_len in [(8, 16), (4, 4)]:
        got = {
            r["doc_id"]: (r["n_words"], r["n_covered"], r["cleaned_text"])
            for r in TX.substring_dedup_spans(
                docs, w=w, min_len=min_len
            ).collect()
        }
        assert got == _spans_oracle(texts, w, min_len), (w, min_len)


def test_substring_dedup_spans_min_len_validation(spark):
    from dtaianomaly_spark.pipelines import text as TX

    with pytest.raises(ValueError, match="min_len"):
        TX.substring_dedup_spans(_docs(spark), w=8, min_len=4)


def test_bigram_fluency_matches_python_oracle(spark):
    """Mean add-one-smoothed bigram probability: exact match (bit-level)
    vs a pure-Python reimplementation on a hand corpus that includes a
    1-word doc (n_bigrams=0, NULL fluency) and repeated bigrams."""
    from collections import Counter

    from dtaianomaly_spark.pipelines import text as TX

    rows = [
        (0, "the cat sat on the mat"),
        (1, "the cat ran"),
        (2, "solo"),
        (3, "the cat sat on the cat"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["fluency"])
        for r in TX.bigram_fluency(docs).collect()
    }
    texts = {d: t.split() for d, t in rows}
    cbg = Counter(
        (t[i], t[i + 1]) for t in texts.values() for i in range(len(t) - 1)
    )
    cun = Counter(w for t in texts.values() for w in t)
    V = len(cun)
    for d, t in texts.items():
        n = max(len(t) - 1, 0)
        assert got[d][0] == n
        if n == 0:
            assert got[d][1] is None
        else:
            s = 0.0
            for i in range(n):  # position order == the engines' fold
                s = s + float(cbg[(t[i], t[i + 1])] + 1) / float(
                    cun[t[i]] + V
                )
            assert got[d][1] == s / n, d


def test_bm25_topk_invariants(spark):
    """Rational-idf BM25: per query the ranks are dense 1..k, scores
    non-increasing and positive, and every returned doc contains at
    least one query term (inverted-index candidates only)."""
    from dtaianomaly_spark.pipelines import retrieval as RET

    docs = _docs(spark)
    got = RET.bm25_topk(docs, n_queries=4, query_terms=5, k=10).collect()
    texts = {r["doc_id"]: r["text"].split() for r in docs.collect()}
    by_q = {}
    for r in got:
        by_q.setdefault(r["qid"], []).append(r)
    assert set(by_q) == {0, 1, 2, 3}
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))
        scores = [r["score"] for r in rows]
        assert all(s > 0 for s in scores)
        assert all(a >= b for a, b in zip(scores, scores[1:]))
        qset = set(texts[qid][:5])
        for r in rows:
            assert qset & set(texts[r["doc_id"]]), (qid, r["doc_id"])


def test_bm25_topk_frame_arbitrary_queries(spark):
    """The frame API scores an ARBITRARY (qid, term) query frame —
    string qids, non-prefix terms, duplicate terms deduplicated — and
    matches an exact Python reimplementation of the rational-idf
    formula (sorted-term fold, IEEE doubles) bit-for-bit."""
    from dtaianomaly_spark.pipelines import retrieval as RET

    docs = _docs(spark)
    texts = {r["doc_id"]: r["text"].split() for r in docs.collect()}
    # terms drawn from the MIDDLE of documents (never a prefix), one
    # duplicated on purpose
    q_rows = [
        ("qa", texts[7][len(texts[7]) // 2]),
        ("qa", texts[11][-1]),
        ("qa", texts[7][len(texts[7]) // 2]),  # dup -> dedup
        ("qb", texts[3][len(texts[3]) // 3]),
    ]
    queries = spark.createDataFrame(q_rows, "qid string, term string")
    got = RET.bm25_topk_frame(docs, queries, k=5).collect()

    # exact Python oracle with the same integer aggregates + formula
    N = len(texts)
    W = sum(len(t) for t in texts.values())
    tf = {}
    for d, t in texts.items():
        for w in t:
            tf[(d, w)] = tf.get((d, w), 0) + 1
    df = {}
    for (d, w), _ in tf.items():
        df[w] = df.get(w, 0) + 1
    qsets = {"qa": {q_rows[0][1], q_rows[1][1]}, "qb": {q_rows[3][1]}}
    expect = {}
    for qid, qset in qsets.items():
        scored = []
        for d, t in texts.items():
            terms = sorted(w for w in qset if (d, w) in tf)
            if not terms:
                continue
            s = 0.0
            dl = len(t)
            for w in terms:
                c = (
                    float(2 * N - 2 * df[w] + 1) / (2 * df[w] + 1)
                    * (float(22 * tf[(d, w)]) * W)
                    / (float(10 * W) * tf[(d, w)] + float(3 * W)
                       + 9.0 * dl * N)
                )
                s = s + c
            scored.append((d, s))
        scored.sort(key=lambda x: (-x[1], x[0]))
        expect[qid] = scored[:5]
    by_q = {}
    for r in sorted(got, key=lambda r: (r["qid"], r["rnk"])):
        by_q.setdefault(r["qid"], []).append((r["doc_id"], r["score"]))
    assert by_q == expect


def test_bm25_topk_wrapper_equals_frame(spark):
    """bm25_topk is exactly bm25_topk_frame fed the corpus-derived
    prefix query frame."""
    from pyspark.sql import functions as F

    from dtaianomaly_spark.pipelines import retrieval as RET

    docs = _docs(spark)
    queries = (
        docs.orderBy("doc_id").limit(3)
        .select(
            F.col("doc_id").alias("qid"),
            F.explode(
                F.expr("array_distinct(slice(split(text, ' '), 1, 5))")
            ).alias("term"),
        )
    )
    a = RET.bm25_topk(docs, n_queries=3, query_terms=5, k=7)
    b = RET.bm25_topk_frame(docs, queries, k=7)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_bm25_uses_lowest_doc_ids_not_literal_range(spark):
    """Queries are the n_queries LOWEST doc_ids — a corpus whose ids
    start at 1000 still yields full results."""
    from pyspark.sql import functions as F

    from dtaianomaly_spark.pipelines import retrieval as RET

    docs = _docs(spark).select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text"
    )
    got = RET.bm25_topk(docs, n_queries=3, query_terms=5, k=5).collect()
    qids = {r["qid"] for r in got}
    assert qids == {1000, 1001, 1002}
    assert all(r["doc_id"] >= 1000 for r in got)


def test_resize_kernels_match_naive_loops():
    import numpy as np
    from dtaianomaly_spark.pipelines import multimodal as MM

    rng = np.random.default_rng(17)
    for _ in range(60):
        h, w = int(rng.integers(1, 24)), int(rng.integers(1, 24))
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        oh, ow = int(rng.integers(1, 16)), int(rng.integers(1, 16))
        got = MM.resize_nearest(img, oh, ow)
        for i in range(oh):
            for j in range(ow):
                assert (got[i, j] == img[i * h // oh, j * w // ow]).all()
        # box mode on an integral factor
        f1, f2 = int(rng.integers(1, 4)), int(rng.integers(1, 4))
        big = rng.integers(0, 256, (oh * f1, ow * f2, 3)).astype(np.uint8)
        gb = MM.resize_box(big, oh, ow)
        for i in range(oh):
            for j in range(ow):
                blk = big[i * f1:(i + 1) * f1, j * f2:(j + 1) * f2]
                want = blk.reshape(-1, 3).sum(0, dtype=np.int64) // (f1 * f2)
                assert (gb[i, j] == want).all()
    import pytest as _pytest

    with _pytest.raises(ValueError, match="integral factors"):
        MM.resize_box(np.zeros((5, 4), dtype=np.uint8), 2, 2)
    with _pytest.raises(ValueError, match="output dims"):
        MM.resize_nearest(np.zeros((5, 4), dtype=np.uint8), 0, 2)


def test_resize_stats_decoded_matches_local_decode(spark):
    import numpy as np
    from dtaianomaly_spark.pipelines import multimodal as MM
    from dtaianomaly_spark.pipelines import text as TX

    docs = TX.load_docs(spark, SF_DIR).filter("doc_id < 40")
    payloads = MM.with_png_payload(docs)
    got = {
        r["doc_id"]: (
            r["h"], r["w"], r["out_h"], r["out_w"],
            r["px_sum"], r["px_min"], r["px_max"],
        )
        for r in MM.resize_stats_decoded(payloads, 7, 5).collect()
    }
    for r in payloads.select("doc_id", "payload").collect():
        img = MM.decode_image(bytes(r["payload"]))
        h, w = img.shape[0], img.shape[1]
        small = np.stack(
            [
                np.stack(
                    [img[i * h // 7, j * w // 5] for j in range(5)]
                )
                for i in range(7)
            ]
        )
        assert got[r["doc_id"]] == (
            h, w, 7, 5,
            int(small.sum(dtype=np.int64)),
            int(small.min()), int(small.max()),
        )


def test_split_assign_matches_python_md5_twin(spark):
    import hashlib

    from dtaianomaly_spark.pipelines import text as TX

    docs = TX.load_docs(spark, SF_DIR)
    got = {
        r["doc_id"]: r["split"]
        for r in TX.split_assign(docs).select("doc_id", "split").collect()
    }

    def twin(doc_id, salt="split-v1", bounds=(("train", 98), ("val", 99), ("test", 100))):
        b = int(
            hashlib.md5(f"{doc_id}|{salt}".encode()).hexdigest()[:15], 16
        ) % 100
        for name, hi in bounds:
            if b < hi:
                return name
        return bounds[-1][0]

    assert got == {d: twin(d) for d in got}
    # growth stability: assignments on a subset equal the full corpus
    sub = {
        r["doc_id"]: r["split"]
        for r in TX.split_assign(docs.filter("doc_id < 100"))
        .select("doc_id", "split")
        .collect()
    }
    assert sub == {d: s for d, s in got.items() if d < 100}
    # different salt reshuffles, same salt is stable
    other = {
        r["doc_id"]: r["split"]
        for r in TX.split_assign(docs, salt="v2")
        .select("doc_id", "split")
        .collect()
    }
    assert other != got
    # schema: input columns preserved + one split column
    out = TX.split_assign(docs)
    assert out.columns == docs.columns + ["split"]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="weights"):
        TX.split_assign(docs, weights=(("train", 0),))


def test_split_contamination_matches_python_twin(spark):
    import hashlib

    from dtaianomaly_spark.pipelines import text as TX

    P31 = TX.P31
    n_words = 3  # narrower than the driver default: more hits at sf0.001
    docs = _docs(spark)
    got = {
        r["doc_id"]: (r["split"], r["n_grams"], r["n_hits"])
        for r in TX.split_contamination(docs, n_words=n_words).collect()
    }

    def split_of(doc_id, salt="split-v1"):
        b = int(
            hashlib.md5(f"{doc_id}|{salt}".encode()).hexdigest()[:15], 16
        ) % 100
        return "train" if b < 98 else ("val" if b < 99 else "test")

    def grams(text):
        ws = text.split(" ")
        return {
            int(
                hashlib.md5(" ".join(ws[j:j + n_words]).encode())
                .hexdigest()[:15], 16
            ) % P31
            for j in range(len(ws) - n_words + 1)
        } if len(ws) >= n_words else set()

    rows = docs.select("doc_id", "text").collect()
    gsets = {r["doc_id"]: grams(r["text"]) for r in rows}
    train = set().union(
        *(g for d, g in gsets.items() if split_of(d) == "train")
    )
    exp = {
        d: (split_of(d), len(g), len(g & train))
        for d, g in gsets.items()
        if split_of(d) != "train" and g
    }
    assert got == exp
    # the report is the exact rollup of the per-doc frame
    rep = {
        r["split"]: (r["n_docs"], r["n_contam_docs"], r["n_grams"], r["n_hits"])
        for r in TX.split_contamination_report(docs, n_words=n_words).collect()
    }
    for sp in ("val", "test"):
        mine = [(s, ng, nh) for (s, ng, nh) in exp.values() if s == sp]
        assert rep[sp] == (
            len(mine),
            sum(1 for _, _, nh in mine if nh > 0),
            sum(ng for _, ng, _ in mine),
            sum(nh for _, _, nh in mine),
        )
    with pytest.raises(ValueError, match="n_words"):
        TX.split_contamination(docs, n_words=0)


def test_temperature_mix_matches_math_sqrt_twin(spark):
    import math

    from dtaianomaly_spark.pipelines import text as TX

    docs = _docs(spark).select(
        "doc_id", "source", F.col("n_chars").alias("n_tok")
    )
    for passes in (1, 2):
        got = {
            r["source"]: (
                r["n_docs"], r["token_mass"], r["nat_share"],
                r["temp_prob"], r["boost"],
            )
            for r in TX.temperature_mix(docs, sqrt_passes=passes).collect()
        }
        rows = docs.collect()
        mass, n = {}, {}
        for r in rows:
            mass[r["source"]] = mass.get(r["source"], 0) + r["n_tok"]
            n[r["source"]] = n.get(r["source"], 0) + 1
        total = sum(mass.values())

        def w(m):
            x = float(m)
            for _ in range(passes):
                x = math.sqrt(x)
            return x

        # normalizer folds in sorted source order — replicate exactly
        wt = 0.0
        for s in sorted(mass):
            wt += w(mass[s])
        exp = {
            s: (
                n[s], mass[s], mass[s] / total,
                w(mass[s]) / wt, (w(mass[s]) / wt) / (mass[s] / total),
            )
            for s in mass
        }
        assert got == exp  # bit-exact: sqrt is correctly rounded IEEE
        # temperature flattens: hot sources damped, cold sources boosted
        hot = max(mass, key=lambda s: (mass[s], s))
        cold = min(mass, key=lambda s: (mass[s], s))
        if mass[hot] != mass[cold]:
            assert got[hot][3] < got[hot][2] or got[hot][4] <= 1.0
            assert got[cold][4] >= 1.0
    with pytest.raises(ValueError, match="sqrt_passes"):
        TX.temperature_mix(docs, sqrt_passes=0)


def test_gopher_repetition_matches_python_twin(spark):
    import hashlib

    from dtaianomaly_spark.pipelines import text as TX

    docs = _docs(spark).filter(F.col("doc_id") < 120)
    # inject an adversarial doc: heavy bigram repetition + a long
    # duplicated 6-gram so the dup columns are exercised non-trivially
    rep = ("alpha beta " * 30 + "one two three four five six "
           "junk filler words here " + "one two three four five six").strip()
    docs = docs.unionByName(
        spark.createDataFrame(
            [(999999, rep, "en", "synthetic", len(rep))],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
    )
    out = {r["doc_id"]: r.asDict() for r in TX.gopher_repetition(docs).collect()}

    P31 = TX.P31

    def twin(text):
        ws = text.split(" ")
        total = len(text)
        res = {}
        for n, thr in list(TX.GOPHER_TOP_NGRAM_MAX_FRAC) + list(
            TX.GOPHER_DUP_NGRAM_MAX_FRAC
        ):
            counts = {}
            for j in range(len(ws) - n + 1):
                g = " ".join(ws[j:j + n])
                h = int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % P31
                c, _ = counts.get(h, (0, len(g)))
                counts[h] = (c + 1, len(g))
            kind = "top" if n <= 4 else "dup"
            if not counts:
                frac = 0.0
            elif kind == "top":
                cnt, chars, negh = max(
                    (c, ch, -h) for h, (c, ch) in counts.items()
                )
                frac = float(cnt * chars) / total
            else:
                frac = float(
                    sum(c * ch for c, ch in counts.values() if c > 1)
                ) / total
            res[f"{kind}{n}_frac"] = frac
            res[f"pass_{kind}{n}"] = int(frac <= thr)
        res["keep"] = int(
            all(v for k, v in res.items() if k.startswith("pass_"))
        )
        return res

    rows = docs.select("doc_id", "text").collect()
    assert set(out) == {r["doc_id"] for r in rows}
    for r in rows:
        exp = twin(r["text"])
        got = {k: v for k, v in out[r["doc_id"]].items() if k != "doc_id"}
        assert got == exp, r["doc_id"]
    # the adversarial doc must actually trip both rule families
    bad = out[999999]
    assert bad["pass_top2"] == 0 and bad["pass_dup6"] == 0 and bad["keep"] == 0
    # and ordinary synthetic docs mostly survive
    keeps = [v["keep"] for k, v in out.items() if k != 999999]
    assert sum(keeps) > len(keeps) * 0.5


def test_source_vocab_overlap_matches_python_twin(spark):
    import hashlib

    from dtaianomaly_spark.pipelines import text as TX
    from dtaianomaly_spark.rollup.tiers import KMV_M

    k = 64
    got = {
        (r["source_a"], r["source_b"]): r
        for r in TX.source_vocab_overlap(_docs(spark), k).collect()
    }
    assert len(got) > 0

    # plain-Python twin: same md5 hash family, same take-k, same IEEE ops
    vocab: dict = {}
    for r in _docs(spark).select("source", "text").collect():
        vocab.setdefault(r["source"], set()).update(r["text"].split(" "))
    hsets = {
        s: sorted(
            int(hashlib.md5(w.encode()).hexdigest()[:15], 16) for w in ws
        )
        for s, ws in vocab.items()
    }

    def est(kmin):
        return (
            float(len(kmin)) if len(kmin) < k
            else float(k - 1) / (float(kmin[k - 1]) / float(KMV_M))
        )

    srcs = sorted(hsets)
    n_pairs = 0
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1:]:
            n_pairs += 1
            a, b = hsets[sa][:k], hsets[sb][:k]
            x = sorted(set(a) | set(b))[:k]
            k_int = len(set(x) & set(a) & set(b))
            r = got[(sa, sb)]
            assert r["ndv_a_est"] == est(a) and r["ndv_b_est"] == est(b)
            assert r["union_est"] == est(x)
            assert r["jaccard_est"] == float(k_int) / float(len(x))
            assert r["inter_est"] == (
                float(k_int) / float(len(x))
            ) * est(x)
            assert r["exact"] == (len(x) < k)
            # estimator quality against the exact sets (k=64 -> loose)
            true_j = len(vocab[sa] & vocab[sb]) / len(vocab[sa] | vocab[sb])
            assert abs(r["jaccard_est"] - true_j) < 0.35
    assert len(got) == n_pairs


def test_quota_sample_exact_deterministic_twin(spark):
    import hashlib

    from dtaianomaly_spark.pipelines import text as TX

    docs = _docs(spark).select("doc_id", "source", "n_chars")
    rows = docs.collect()
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    quotas = spark.createDataFrame(
        [(s, max(1, len(ids) // 3)) for s, ids in by_src.items()],
        "source string, quota long",
    )
    sel = TX.quota_sample(docs, quotas)
    got = {
        (r["source"], r["doc_id"]): r["rank"] for r in sel.collect()
    }
    # exact counts: taken == min(quota, n_docs) per source
    taken: dict = {}
    for s, _ in got:
        taken[s] = taken.get(s, 0) + 1
    for s, ids in by_src.items():
        assert taken[s] == min(max(1, len(ids) // 3), len(ids))

    # plain-Python md5-rank twin: same key, same order, same cut
    def key(d):
        return (
            int(
                hashlib.md5(f"{d}:quota-v1".encode()).hexdigest()[:15], 16
            ),
            d,
        )

    want = {}
    for s, ids in by_src.items():
        for i, d in enumerate(sorted(ids, key=key)[: max(1, len(ids) // 3)]):
            want[(s, d)] = i + 1
    assert got == want

    # partition invariance: any physical layout selects the same set
    sel7 = TX.quota_sample(docs.repartition(7), quotas)
    got7 = {(r["source"], r["doc_id"]): r["rank"] for r in sel7.collect()}
    assert got7 == got

    # a different salt selects a different set (the knob is real)
    other = TX.quota_sample(docs, quotas, salt="quota-v2")
    got2 = {(r["source"], r["doc_id"]) for r in other.collect()}
    assert got2 != set(got)


def test_dup_source_matrix_constructed_and_conservation(spark):
    from dtaianomaly_spark.pipelines import text as TX

    docs = spark.createDataFrame(
        [("d1", "web"), ("d2", "web"), ("d3", "books"), ("d4", "code")],
        "doc_id string, source string",
    )
    pairs = spark.createDataFrame(
        [("d1", "d2", 0.9), ("d1", "d3", 0.4), ("d3", "d1", 0.6),
         ("d2", "d4", 0.3)],
        "doc_a string, doc_b string, jaccard double",
    )
    got = {
        (r["source_a"], r["source_b"]): (
            r["n_pairs"], r["min_jaccard"], r["max_jaccard"]
        )
        for r in TX.dup_source_matrix(docs, pairs).collect()
    }
    # unordered normalization folds (web, books) and (books, web)
    assert got == {
        ("web", "web"): (1, 0.9, 0.9),
        ("books", "web"): (2, 0.4, 0.6),
        ("code", "web"): (1, 0.3, 0.3),
    }

    # real pair stage: every pair lands in exactly one cell, cells are
    # normalized (source_a <= source_b), min <= max within each
    real_docs = _docs(spark)
    real_pairs = TX.jaccard_pairs(real_docs, threshold=0.2).persist()
    m = TX.dup_source_matrix(real_docs, real_pairs).collect()
    assert sum(r["n_pairs"] for r in m) == real_pairs.count()
    for r in m:
        assert r["source_a"] <= r["source_b"]
        assert 0.2 <= r["min_jaccard"] <= r["max_jaccard"]
    real_pairs.unpersist()


def test_canonical_select_invariants_and_constructed(spark):
    from dtaianomaly_spark.pipelines import text as TX

    # constructed: quality favors longer low-digit text; d2 beats d1
    docs = spark.createDataFrame(
        [("d1", "ab 12", "web", 5), ("d2", "aa bb cc dd", "web", 11),
         ("d3", "zz", "web", 2)],
        "doc_id string, text string, source string, n_chars int",
    )
    pairs = spark.createDataFrame(
        [("d1", "d2")], "doc_a string, doc_b string"
    )
    got = {r["doc_id"]: r for r in TX.canonical_select(docs, pairs).collect()}
    assert got["d2"]["keep"] and not got["d1"]["keep"]
    assert got["d1"]["kept_doc_id"] == "d2" == got["d2"]["kept_doc_id"]
    assert got["d1"]["cluster_size"] == 2 == got["d2"]["cluster_size"]
    assert got["d3"]["keep"] and got["d3"]["cluster_size"] == 1

    # real pair stage invariants
    real_docs = _docs(spark)
    real_pairs = TX.jaccard_pairs(real_docs, threshold=0.2).select(
        "doc_a", "doc_b"
    )
    rows = TX.canonical_select(real_docs, real_pairs).collect()
    assert len(rows) == real_docs.count()
    by_cl: dict = {}
    for r in rows:
        by_cl.setdefault(r["cluster_id"], []).append(r)
    q = {r["doc_id"]: r["quality"]
         for r in TX.quality(real_docs).collect()}
    for cid, members in by_cl.items():
        keeps = [m for m in members if m["keep"]]
        assert len(keeps) == 1
        want = min(members, key=lambda m: (-q[m["doc_id"]], m["doc_id"]))
        assert keeps[0]["doc_id"] == want["doc_id"]
        for m in members:
            assert m["kept_doc_id"] == want["doc_id"]
            assert m["cluster_size"] == len(members)


def test_length_drift_matches_exact_ks_twin(spark):
    from dtaianomaly_spark.pipelines import text as TX

    docs = _docs(spark)
    got = {
        r["source"]: (r["n_docs"], r["dn"], r["ks_d"])
        for r in TX.length_drift(docs).collect()
    }

    rows = docs.select("source", F.length("text").alias("len")).collect()
    by_src: dict = {}
    all_len = []
    for r in rows:
        by_src.setdefault(r["source"], []).append(r["len"])
        all_len.append(r["len"])
    n = len(all_len)
    xs = sorted(set(all_len))
    assert len(got) == len(by_src)
    for s, ls in by_src.items():
        ls_sorted = sorted(ls)
        n_s = len(ls)
        import bisect

        dn = max(
            abs(
                bisect.bisect_right(ls_sorted, x) * n
                - bisect.bisect_right(sorted(all_len), x) * n_s
            )
            for x in xs
        )
        assert got[s] == (n_s, dn, float(dn) / float(n_s * n))
        # KS is a probability distance: within [0, 1]
        assert 0.0 <= got[s][2] <= 1.0

    # identical distributions drift zero: a single-source corpus
    one = docs.withColumn("source", F.lit("only"))
    z = TX.length_drift(one).collect()
    assert len(z) == 1 and z[0]["dn"] == 0 and z[0]["ks_d"] == 0.0


def test_mix_plan_waterfill_matches_python_twin(spark):
    from dtaianomaly_spark.pipelines import text as TX

    docs = _docs(spark).select(
        "doc_id", "source", F.col("n_chars").alias("n_tok")
    )
    tm = TX.temperature_mix(docs)
    tm_rows = tm.collect()
    total = sum(r["token_mass"] for r in tm_rows)

    def twin(rows, budget, cap):
        items = sorted(
            rows,
            key=lambda r: (
                -(r["temp_prob"] / float(r["token_mass"])), r["source"]
            ),
        )
        b, p = float(budget), 1.0
        for x in items:
            m = float(x["token_mass"])
            if p > 0.0 and x["temp_prob"] * b / (p * m) > cap:
                b, p = b - cap * m, p - x["temp_prob"]
        out = {}
        for x in rows:
            m = float(x["token_mass"])
            capped = p <= 0.0 or x["temp_prob"] * b / (p * m) > cap
            t = cap * m if capped else x["temp_prob"] * b / p
            out[x["source"]] = (t, t / m, capped)
        return out

    for budget, cap in ((3 * total, 4.0), (total // 2, 4.0),
                        (20 * total, 4.0), (3 * total, 1.5)):
        got = {
            r["source"]: (r["target_tokens"], r["epochs"], r["capped"])
            for r in TX.mix_plan(tm, budget, cap).collect()
        }
        want = twin(tm_rows, budget, cap)
        assert got == want
        # invariants: epoch cap respected; uncapped budget conserved
        eps = 1e-9 * max(budget, 1)
        spent = sum(t for t, _, _ in got.values())
        if all(c for _, _, c in got.values()):
            assert spent <= budget + eps  # leftover visible to caller
        else:
            assert abs(spent - budget) <= eps
        for t, e, c in got.values():
            assert e <= cap + 1e-12

    # lazy budget frame: same result as the int path, no collect needed
    bframe = tm.agg((F.sum("token_mass") * 3).cast("long").alias("b"))
    got_lazy = {
        r["source"]: (r["target_tokens"], r["epochs"], r["capped"])
        for r in TX.mix_plan(tm, bframe, 4.0).collect()
    }
    assert got_lazy == twin(tm_rows, 3 * total, 4.0)
    with pytest.raises(ValueError, match="max_epochs"):
        TX.mix_plan(tm, 10, 0.0)
    with pytest.raises(ValueError, match="budget_tokens"):
        TX.mix_plan(tm, -1)


# ------------------------------------------------ correlated series

def test_series_corr_pairs_exact_pearson_and_recall(spark):
    import collections

    from dtaianomaly_spark.pipelines.similarity import series_corr_pairs
    from dtaianomaly_spark.sources.corpus import token_long_form

    lf = token_long_form(spark, "/root/testdata/sf0.001")
    got = {
        (r["va"], r["vb"]): r["cos"]
        for r in series_corr_pairs(lf, threshold=0.9).collect()
    }
    assert got and all(a < b for a, b in got)
    # ground truth: numpy Pearson over every eligible pair
    rows = lf.filter("pos < 1024").collect()
    series = collections.defaultdict(dict)
    for r in rows:
        series[r["doc_id"]][r["pos"]] = r["value"]
    profs = {}
    for d, vals in series.items():
        if len(vals) == 1024:
            xs = np.array([vals[p] for p in range(1024)], dtype=np.float64)
            pr = xs.reshape(16, 64).sum(axis=1)
            if pr.std() > 0:
                profs[d] = pr
    docs = sorted(profs)
    true_pairs = {}
    for i, a in enumerate(docs):
        for b in docs[i + 1:]:
            c = float(np.corrcoef(profs[a], profs[b])[0, 1])
            if c >= 0.9:
                true_pairs[(a, b)] = c
    # every emitted pair is a true pair with the EXACT Pearson value
    for (a, b), c in got.items():
        assert (a, b) in true_pairs
        assert abs(c - true_pairs[(a, b)]) < 1e-9
    # LSH recall floor over the true pair set
    assert len(got) / len(true_pairs) > 0.5, (len(got), len(true_pairs))
    with pytest.raises(ValueError, match="n_buckets"):
        series_corr_pairs(lf, n_buckets=1)


def test_wav_spectral_matches_numpy_replay(spark):
    """mm_wav_spectral's assembly == a direct NumPy replay of the
    decode → periodogram → centroid/rolloff/entropy chain."""
    import numpy as np

    from dtaianomaly_spark.kernels import windowing as KW
    from dtaianomaly_spark.pipelines import audio as AU
    from dtaianomaly_spark.pipelines import text as TX

    docs = TX.load_docs(spark, "/root/testdata/sf0.001").limit(24)
    out = AU.wav_spectral_decoded(AU.with_wav_payload(docs)).collect()
    assert len(out) == 24
    for r in out:
        d = int(r["doc_id"])
        n, ch, rate = AU._audio_dims(d)
        x = AU._audio_clip(d, n, ch)[:, 0].astype(np.float64)
        p = KW.periodogram(x)
        total = float(p.sum())
        assert r["n_samples"] == n and r["sample_rate"] == rate
        dom = int(KW.spectral_peaks(p, 1)[0]) + 1
        assert r["dom_k"] == dom
        hz = rate / float(n)
        ks = np.arange(1, p.shape[0] + 1, dtype=np.float64)
        assert r["centroid_hz"] == float((ks * p).sum()) / total * hz
        roll_k = int(np.searchsorted(np.cumsum(p), 0.85 * total)) + 1
        assert r["rolloff_hz"] == roll_k * hz
        assert r["spec_entropy"] == KW.spectral_entropy(p)


def test_lz78_kernel_closed_forms_and_ordering(spark):
    from dtaianomaly_spark.pipelines.text import _lz78_phrases, lz_complexity

    # all-same-char: phrases a, aa, aaa ... triangular closure
    for k in (1, 3, 6):
        n = k * (k + 1) // 2
        assert _lz78_phrases("a" * n) == k
    assert _lz78_phrases("a" * 7) == 4  # 1+2+3 then ragged "a"
    assert _lz78_phrases("") == 0
    assert _lz78_phrases("abcd") == 4  # all-new single chars
    # repetitive < prose-ish < near-random per-char complexity
    import numpy as np
    rng = np.random.default_rng(11)
    rep = "the cat sat " * 60
    rand = "".join(chr(33 + int(c)) for c in rng.integers(0, 90, len(rep)))
    assert _lz78_phrases(rep) / len(rep) < _lz78_phrases(rand) / len(rand)
    # operator end-to-end over real docs
    from dtaianomaly_spark.pipelines.text import load_docs

    out = lz_complexity(load_docs(spark, "/root/testdata/sf0.001").limit(8)).collect()
    assert len(out) == 8
    for r in out:
        assert r["n_phrases"] >= 1 and 0 < r["lz_ratio"] <= 1


def test_dup_pagerank_matches_numpy_replay(spark):
    """Distributed damped power iteration == a NumPy replay folding
    per-target contributions in the SAME sorted-source order; isolated
    nodes keep exactly the teleport rank."""
    import numpy as np

    from dtaianomaly_spark.pipelines.text import dup_pagerank

    docs = spark.createDataFrame(
        [(i,) for i in range(8)], "doc_id long"
    )
    #  triangle 0-1-2, chain 3-4, star 5->6 ... node 7 isolated
    raw = [(0, 1), (1, 2), (0, 2), (3, 4), (5, 6)]
    pairs = spark.createDataFrame(raw, "doc_a long, doc_b long")
    out = {
        r["doc_id"]: (r["degree"], r["rank"])
        for r in dup_pagerank(docs, pairs, iters=10).collect()
    }
    # numpy replay with identical float op order
    n = 8
    edges = sorted(
        [(a, b) for a, b in raw] + [(b, a) for a, b in raw]
    )
    deg = {}
    for s, d in edges:
        deg[s] = deg.get(s, 0) + 1
    base = np.float64(15) / (100 * n)
    damp = np.float64(85) / 100
    rank = {i: np.float64(1) / n for i in range(8)}
    for _ in range(10):
        contribs = {}
        for s, d in edges:  # sorted by (src, dst); regroup per dst
            contribs.setdefault(d, []).append((s, rank[s] / deg[s]))
        new = {}
        for i in range(8):
            acc = np.float64(0)
            for _, c in sorted(contribs.get(i, [])):
                acc = acc + c
            new[i] = base + damp * acc
        rank = new
    for i in range(8):
        assert out[i][1] == rank[i], (i, out[i][1], rank[i])
    assert out[7] == (0, base)  # isolated: teleport only, degree 0
    assert out[0][0] == 2 and out[3][0] == 1


def test_dhash_neardup_kernel_and_pairs(spark):
    """dHash: a perturbed copy lands within small Hamming distance and
    the banded pair op finds it; an unrelated image does not."""
    import numpy as np

    from dtaianomaly_spark.pipelines import multimodal as MM

    rng = np.random.default_rng(61)
    base = rng.integers(0, 256, (16, 18, 3)).astype(np.uint8)
    # flip ONE resized-grid comparison: bump one sampled pixel hard
    pert = base.copy()
    pert[0, 0] = 255  # cell (0,0) sampled by the floor index map
    other = rng.integers(0, 256, (16, 18, 3)).astype(np.uint8)
    h_base, h_pert = MM.dhash64(base), MM.dhash64(pert)
    d = bin(h_base ^ h_pert).count("1")
    assert 0 < d <= 4  # few comparisons touch the bumped pixel
    assert bin(h_base ^ MM.dhash64(other)).count("1") > 10
    # determinism + brightness robustness (uniform shift, no flips)
    bright = np.clip(base.astype(np.int64) + 3, 0, 255).astype(np.uint8)
    assert MM.dhash64(bright) == h_base or bin(
        MM.dhash64(bright) ^ h_base
    ).count("1") <= 4
    rows = [
        (1, MM.encode_bmp(base)),
        (2, MM.encode_bmp(pert)),
        (3, MM.encode_bmp(other)),
    ]
    pay = spark.createDataFrame(rows, "doc_id long, payload binary")
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in MM.dhash_neardup_pairs(pay, max_hamming=6).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == d
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_audio_fingerprint_gain_invariance_and_groups(spark):
    """The spectral-shape fingerprint is invariant to uniform gain and
    discriminates different clips; the group op clusters matches."""
    import numpy as np

    from dtaianomaly_spark.pipelines import audio as AU

    rng = np.random.default_rng(73)
    base = rng.integers(-1500, 1500, (60, 1)).astype(np.int16)
    gained = np.clip(base.astype(np.int64) * 2, -32768, 32767).astype(
        np.int16
    )
    other = rng.integers(-1500, 1500, (60, 1)).astype(np.int16)
    rows = [
        (1, AU.encode_wav(base, 8000)),
        (2, AU.encode_wav(gained, 8000)),
        (3, AU.encode_wav(other, 8000)),
    ]
    pay = spark.createDataFrame(rows, "doc_id long, payload binary")
    fp = {r["doc_id"]: r["afp"]
          for r in AU.audio_fingerprint_decoded(pay).collect()}
    assert fp[1] == fp[2]      # gain-invariant (P scales by 4 everywhere)
    assert fp[1] != fp[3]      # different content -> different shape
    groups = AU.audio_neardup_groups(pay).collect()
    assert len(groups) == 1
    assert groups[0]["n_clips"] == 2 and groups[0]["keep_doc_id"] == 1


def test_dq_engine_verdicts_and_single_pass(spark):
    """The declarative DQ engine: correct integer verdicts (including
    a deliberately failing threshold), unknown kinds raise, and all
    row-level checks compile into ONE aggregate over the table."""
    import re

    from dtaianomaly_spark.pipelines import quality as DQ

    df = spark.createDataFrame(
        [(1, "a", 5), (2, "b", 50), (2, None, 500), (4, "a", -3)],
        "k long, s string, v long",
    )
    ref = spark.createDataFrame([(1,), (2,)], "rk long")
    checks = [
        ("comp", "completeness", {"col": "s", "threshold": (3, 4)}),
        ("uniq", "uniqueness", {"col": "k", "threshold": (1, 1)}),
        ("rng", "in_range", {"col": "v", "lo": 0, "hi": 100,
                             "threshold": (3, 4)}),
        ("dom", "in_set", {"col": "s", "values": ["a", "b"],
                           "threshold": (3, 4)}),
    ]
    out = {r["check_id"]: r for r in DQ.dq_report(df, checks).collect()}
    assert out["comp"]["n_ok"] == 3 and out["comp"]["passed"] == 1
    assert out["uniq"]["n_ok"] == 3 and out["uniq"]["n_total"] == 4 \
        and out["uniq"]["passed"] == 0  # duplicate k=2 fails 1/1
    assert out["rng"]["n_ok"] == 2 and out["rng"]["passed"] == 0
    assert out["dom"]["n_ok"] == 3 and out["dom"]["passed"] == 1
    fk = DQ.dq_report(
        df, [("fk", "referential",
              {"col": "k", "ref": ref, "ref_col": "rk",
               "threshold": (1, 1)})]
    ).collect()[0]
    assert fk["n_ok"] == 3 and fk["n_total"] == 4 and fk["passed"] == 0
    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown check kind"):
        DQ.dq_report(df, [("x", "nope", {})])
    # single-pass claim: the aggregate runs ONCE at the checkpoint
    # boundary; every union branch then reads the materialized 1-row
    # frame, so the final plan contains NO aggregate at all and no
    # scan of the input table — only checkpoint-RDD reads
    rep = DQ.dq_report(df, checks)
    plan = rep._sc._jvm.PythonSQLUtils.explainString(
        rep._jdf.queryExecution(), "formatted"
    )
    assert "HashAggregate" not in plan and "LocalTableScan" not in plan
