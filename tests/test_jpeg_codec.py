"""Baseline JPEG decode (operators/jpeg_codec.py) against an
INDEPENDENT forward encoder written here: RGB→YCbCr, optional 4:2:0
subsampling, forward DCT, quantization, two-pass huffman (tables built
from the actual symbol sets and written into DHT — the decoder must
consume whatever valid tables the file declares), byte stuffing,
restart markers. Entropy coding must be lossless on coefficients, so
with an all-ones quantizer the decoder's output is bounded only by
float IDCT rounding (±1); lossy paths compare against the test's own
spec reconstruction."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from kafka_elasticsearch_injector_spark.operators import jpeg_codec as J
from kafka_elasticsearch_injector_spark.operators import pixels as P

_DCT = np.array([[(1 / np.sqrt(8)) if k == 0 else
                  0.5 * np.cos((2 * n + 1) * k * np.pi / 16)
                  for n in range(8)] for k in range(8)])

_ZIG = J._ZIGZAG  # the zigzag ORDER is spec (Figure A.6), shared


def _fdct(block):
    return _DCT @ (block - 128.0) @ _DCT.T


def _to_ycbcr(rgb):
    r, g, b = (rgb[:, :, i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return y, cb, cr


def _pad(plane, bh, bw):
    h, w = plane.shape
    return np.pad(plane, ((0, bh - h), (0, bw - w)), mode="edge")


def _mag(v):
    """(size, amplitude-bits) per T.81 F.12's inverse."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    return size, (v if v > 0 else v + (1 << size) - 1)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)       # byte stuffing
                self.acc = 0
                self.n = 0

    def align(self):
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s


def _build_table(symbols):
    """Equal-length canonical table over the observed symbol set —
    valid prefix code, emitted verbatim into DHT."""
    syms = sorted(set(symbols))
    length = max(1, (len(syms)).bit_length())   # n < 2^length strictly
    counts = [0] * 16
    counts[length - 1] = len(syms)
    codes = {s: i for i, s in enumerate(syms)}
    return counts, syms, codes, length


def _encode_jpeg(img, quant_luma=None, quant_chroma=None, subsample=False,
                 restart_interval=0):
    """Forward baseline JPEG. img: (H, W) gray or (H, W, 3) RGB uint8.
    Returns the full byte stream (SOI..EOI)."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    ql = np.ones((8, 8), np.int64) if quant_luma is None else quant_luma
    qc = ql if quant_chroma is None else quant_chroma
    if gray:
        comps = [{"id": 1, "h": 1, "v": 1, "q": ql, "tq": 0,
                  "plane": img.astype(np.float64)}]
    else:
        y, cb, cr = _to_ycbcr(img)
        if subsample:
            # 4:2:0 box average over the edge-padded even grid
            ph, pw = (h + 1) & ~1, (w + 1) & ~1
            cbp, crp = _pad(cb, ph, pw), _pad(cr, ph, pw)
            cb = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            sampl, sampc = (2, 2), (1, 1)
        else:
            sampl, sampc = (1, 1), (1, 1)
        comps = [
            {"id": 1, "h": sampl[0], "v": sampl[1], "q": ql, "tq": 0,
             "plane": y},
            {"id": 2, "h": sampc[0], "v": sampc[1], "q": qc, "tq": 1,
             "plane": cb},
            {"id": 3, "h": sampc[0], "v": sampc[1], "q": qc, "tq": 1,
             "plane": cr},
        ]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    for c in comps:
        bh, bw = mcuy * 8 * c["v"], mcux * 8 * c["h"]
        c["plane"] = _pad(c["plane"], bh, bw)

    # pass 1: quantized blocks in MCU emission order + symbol sets
    units = []                                  # (comp_idx, zz[64])
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, c in enumerate(comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        blk = c["plane"][y0:y0 + 8, x0:x0 + 8]
                        coef = np.round(_fdct(blk) / c["q"]).astype(
                            np.int64)
                        units.append((ci, coef.reshape(64)[_ZIG]))
    ncls = 1 if gray else 2                      # table class per comp
    cls_of = [0] + ([1, 1] if not gray else [])
    dc_syms = [[] for _ in range(ncls)]
    ac_syms = [[] for _ in range(ncls)]
    pred = [0] * len(comps)
    mcu_units = sum(c["h"] * c["v"] for c in comps)

    def _symbols(zz, ci):
        cls = cls_of[ci]
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        dc_syms[cls].append(_mag(diff)[0])
        run = 0
        for k in range(1, 64):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                ac_syms[cls].append(0xF0)
                run -= 16
            size = _mag(int(zz[k]))[0]
            ac_syms[cls].append((run << 4) | size)
            run = 0
        if run:
            ac_syms[cls].append(0x00)           # EOB

    ui = 0
    for u, (ci, zz) in enumerate(units):
        if restart_interval and ui and ui % (restart_interval
                                             * mcu_units) == 0:
            pred = [0] * len(comps)
        _symbols(zz, ci)
        ui += 1
    dc_tabs = [_build_table(s if s else [0]) for s in dc_syms]
    ac_tabs = [_build_table(s if s else [0]) for s in ac_syms]

    # pass 2: bitstream
    bw_ = _BitWriter()
    pred = [0] * len(comps)
    body = bytearray()
    rst = 0
    for u, (ci, zz) in enumerate(units):
        if restart_interval and u and u % (restart_interval
                                           * mcu_units) == 0:
            bw_.align()
            body.extend(bw_.out)
            bw_.out = bytearray()
            body.extend(bytes([0xFF, 0xD0 + rst]))
            rst = (rst + 1) & 7
            pred = [0] * len(comps)
        cls = cls_of[ci]
        _, _, dcodes, dlen = dc_tabs[cls]
        _, _, acodes, alen = ac_tabs[cls]
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        size, amp = _mag(diff)
        bw_.put(dcodes[size], dlen)
        if size:
            bw_.put(amp, size)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                bw_.put(acodes[0xF0], alen)
                run -= 16
            size, amp = _mag(v)
            bw_.put(acodes[(run << 4) | size], alen)
            bw_.put(amp, size)
            run = 0
        if run:
            bw_.put(acodes[0x00], alen)
    bw_.align()
    body.extend(bw_.out)

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    # DQT in zigzag order: entry i holds q at zigzag position i
    out += seg(0xDB, bytes([0x00]) + bytes(
        int(ql.reshape(64)[_ZIG][i]) for i in range(64)))
    if not gray:
        out += seg(0xDB, bytes([0x01]) + bytes(
            int(qc.reshape(64)[_ZIG][i]) for i in range(64)))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    out += seg(0xC0, sof)
    for cls in range(ncls):
        for is_ac, tabs in ((0, dc_tabs), (1, ac_tabs)):
            counts, syms, _, _ = tabs[cls]
            out += seg(0xC4, bytes([(is_ac << 4) | cls])
                       + bytes(counts) + bytes(syms))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for ci, c in enumerate(comps):
        cls = cls_of[ci]
        sos += bytes([c["id"], (cls << 4) | cls])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += body
    out += b"\xff\xd9"
    return bytes(out)


GRAD = (np.add.outer(np.arange(24) * 5, np.arange(16) * 3) % 256) \
    .astype(np.uint8)


def test_gray_lossless_quantizer_roundtrip():
    # q=1: entropy coding is exact on coefficients, so error is float
    # DCT→IDCT rounding only
    got = J.decode_jpeg(_encode_jpeg(GRAD))
    assert got.shape == (24, 16)
    assert int(np.abs(got.astype(int) - GRAD.astype(int)).max()) <= 1


def test_gray_constant_block_exact():
    img = np.full((8, 8), 130, np.uint8)
    assert np.array_equal(J.decode_jpeg(_encode_jpeg(img)), img)


def test_gray_non_multiple_of_8_crops_padding():
    img = GRAD[:10, :13]
    got = J.decode_jpeg(_encode_jpeg(img))
    assert got.shape == (10, 13)
    assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= 1


def test_rgb_444_roundtrip_tolerance():
    rng = np.random.default_rng(3)
    # smooth image: low-frequency content keeps color-transform and
    # rounding error tight
    base = rng.integers(40, 216, (3, 2, 3))
    img = np.kron(base, np.ones((8, 8, 1))).astype(np.uint8)
    got = J.decode_jpeg(_encode_jpeg(img))
    assert got.shape == img.shape
    assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= 3


def test_rgb_420_subsampled_constant_color_regions():
    img = np.zeros((16, 16, 3), np.uint8)
    img[:, :8] = (200, 40, 90)
    img[:, 8:] = (30, 180, 220)
    got = J.decode_jpeg(_encode_jpeg(img, subsample=True))
    assert got.shape == img.shape
    # away from the color seam both halves must reconstruct tightly
    assert int(np.abs(got[:, :6].astype(int)
                      - img[:, :6].astype(int)).max()) <= 4
    assert int(np.abs(got[:, 10:].astype(int)
                      - img[:, 10:].astype(int)).max()) <= 4


def test_restart_markers_match_unrestarted_decode():
    img = GRAD[:24, :16]
    plain = J.decode_jpeg(_encode_jpeg(img))
    with_rst = J.decode_jpeg(_encode_jpeg(img, restart_interval=2))
    assert np.array_equal(plain, with_rst)


def test_lossy_quantizer_matches_spec_reconstruction():
    # a real quantizer loses information; the DECODER must still agree
    # with the test's own dequantize→IDCT reconstruction to ±1
    q = np.full((8, 8), 16, np.int64)
    q[0, 0] = 8
    img = GRAD[:16, :16]
    got = J.decode_jpeg(_encode_jpeg(img, quant_luma=q))
    expect = np.zeros((16, 16))
    for by in range(2):
        for bx in range(2):
            blk = img[8 * by:8 * by + 8, 8 * bx:8 * bx + 8] \
                .astype(np.float64)
            coef = np.round(_fdct(blk) / q) * q
            expect[8 * by:8 * by + 8, 8 * bx:8 * bx + 8] = \
                np.clip(np.floor(_DCT.T @ coef @ _DCT + 128.0 + 0.5),
                        0, 255)
    assert int(np.abs(got.astype(int) - expect.astype(int)).max()) <= 1


def test_gray_scan_is_noninterleaved_regardless_of_sampling():
    """T.81 A.2.2: an Ns=1 scan ignores sampling factors (one 8x8 unit
    per MCU, raster order). Grayscale files routinely keep the color
    default 2x2 in SOF — patching our 1x1 fixture to declare 2x2 must
    not change the decode."""
    img = GRAD[:10, :13]                        # non-multiple-of-8 dims
    buf = _encode_jpeg(img)
    i = buf.index(b"\xff\xc0")
    # SOF payload: len(2) prec(1) h(2) w(2) ncomp(1) cid(1) samp(1) ...
    samp_off = i + 2 + 2 + 1 + 4 + 1 + 1
    assert buf[samp_off] == 0x11
    patched = buf[:samp_off] + bytes([0x22]) + buf[samp_off + 1:]
    assert np.array_equal(J.decode_jpeg(patched), J.decode_jpeg(buf))


def test_fill_bytes_before_markers_are_skipped():
    """0xFF fill bytes between segments are legal padding
    (T.81 B.1.1.2) — conformant files must not spuriously side-drop."""
    buf = _encode_jpeg(GRAD[:8, :8])
    i = buf.index(b"\xff\xda")                  # pad before SOS
    padded = buf[:i] + b"\xff\xff\xff" + buf[i + 1:]
    assert np.array_equal(J.decode_jpeg(padded), J.decode_jpeg(buf))


def test_unsupported_and_corrupt_reasons():
    good = _encode_jpeg(GRAD)
    with pytest.raises(P.PixelDecodeError, match="progressive"):
        J.decode_jpeg(good.replace(b"\xff\xc0", b"\xff\xc2", 1))
    with pytest.raises(P.PixelDecodeError, match="truncated|ended"):
        J.decode_jpeg(good[:len(good) // 2])
    with pytest.raises(P.PixelDecodeError, match="bad SOI"):
        J.decode_jpeg(b"not jpeg")
    # 12-bit precision flag in SOF
    i = good.index(b"\xff\xc0")
    bad = good[:i + 4] + bytes([12]) + good[i + 5:]
    with pytest.raises(P.PixelDecodeError, match="12-bit"):
        J.decode_jpeg(bad)


def test_dispatch_and_header_parser_agree():
    from kafka_elasticsearch_injector_spark.operators.multimodal import (
        parse_image_header,
    )

    buf = _encode_jpeg(GRAD)
    assert parse_image_header(buf) == ("jpeg", 16, 24)
    fmt, arr = P.decode_pixels(buf)
    assert fmt == "jpeg" and arr.shape == (24, 16)


def test_jpeg_rides_the_spark_kernels(spark):
    img = np.kron(np.array([[[90, 140, 200]]]),
                  np.ones((16, 16, 1))).astype(np.uint8)
    rows = [(1, bytearray(_encode_jpeg(img))),
            (2, bytearray(_encode_jpeg(GRAD)))]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    got = {r.doc_id: r for r in P.image_pixel_stats(df).collect()}
    assert got[1].format == "jpeg" and got[1].channels == 3
    assert got[1].channel_mean == pytest.approx([90, 140, 200], abs=2)
    assert got[2].channels == 1
    thumbs = {r.doc_id: r for r in P.resize_images(df, 4, 4).collect()}
    arr = P.decode_png(bytes(thumbs[1].thumb))
    assert arr.shape == (4, 4, 3)
    assert np.abs(arr.astype(int) - [90, 140, 200]).max() <= 2
