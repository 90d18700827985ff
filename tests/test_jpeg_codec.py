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


def _comp_setup(img, quant_luma=None, quant_chroma=None, subsample=False):
    """Component planes (MCU-padded) + geometry, shared by the baseline
    and progressive forward encoders."""
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
    return comps, h, w, hmax, vmax, mcux, mcuy, ql, qc, gray


def _encode_jpeg(img, quant_luma=None, quant_chroma=None, subsample=False,
                 restart_interval=0, scan_order=None):
    """Forward baseline JPEG. img: (H, W) gray or (H, W, 3) RGB uint8.
    Returns the full byte stream (SOI..EOI). scan_order permutes the
    SOS component listing AND the in-MCU emission order to match
    (T.81 B.2.3: the scan header defines the interleave order)."""
    comps, h, w, hmax, vmax, mcux, mcuy, ql, qc, gray = _comp_setup(
        img, quant_luma, quant_chroma, subsample)
    order = list(range(len(comps))) if scan_order is None \
        else list(scan_order)

    # pass 1: quantized blocks in MCU emission order + symbol sets
    units = []                                  # (comp_idx, zz[64])
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in order:
                c = comps[ci]
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
    for ci in order:
        cls = cls_of[ci]
        sos += bytes([comps[ci]["id"], (cls << 4) | cls])
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
    # arithmetic coding (SOF9) stays a declared unsupported boundary
    with pytest.raises(P.PixelDecodeError, match="SOF9.*unsupported"):
        J.decode_jpeg(good.replace(b"\xff\xc0", b"\xff\xc9", 1))
    # a progressive FRAME whose scan header is still the sequential
    # one (byte-swapped SOF0->SOF2) must side-drop as an invalid
    # progressive scan header, not decode garbage
    with pytest.raises(P.PixelDecodeError,
                       match="progressive scan header"):
        J.decode_jpeg(good.replace(b"\xff\xc0", b"\xff\xc2", 1))
    with pytest.raises(P.PixelDecodeError, match="truncated|ended"):
        J.decode_jpeg(good[:len(good) // 2])
    with pytest.raises(P.PixelDecodeError, match="bad SOI"):
        J.decode_jpeg(b"not jpeg")
    # 16-bit precision flag in SOF (12-bit is supported since r15;
    # anything else still side-drops)
    i = good.index(b"\xff\xc0")
    bad = good[:i + 4] + bytes([16]) + good[i + 5:]
    with pytest.raises(P.PixelDecodeError, match="16-bit"):
        J.decode_jpeg(bad)


def test_dispatch_and_header_parser_agree():
    from kafka_elasticsearch_injector_spark.operators.multimodal import (
        parse_image_header,
    )

    buf = _encode_jpeg(GRAD)
    assert parse_image_header(buf) == ("jpeg", 16, 24)
    fmt, arr = P.decode_pixels(buf)
    assert fmt == "jpeg" and arr.shape == (24, 16)


# --- independent forward PROGRESSIVE encoder (T.81 Annex G) -----------------

def _ni_grid_dims(w, h, c, hmax, vmax):
    """Non-interleaved block counts: ceil over the component's OWN
    downsampled dims (T.81 A.2.2) — NOT the MCU-padded counts."""
    cw = -(-w * c["h"] // hmax)
    ch = -(-h * c["v"] // vmax)
    return -(-ch // 8), -(-cw // 8)


class _Collect:
    """Pass-1 emitter: records huffman symbols, drops raw bits."""

    def __init__(self):
        self.dc, self.ac = [], []

    def dc_sym(self, s):
        self.dc.append(s)

    def ac_sym(self, s):
        self.ac.append(s)

    def bits(self, v, n):
        pass

    def restart(self):
        pass


class _Emit:
    """Pass-2 emitter: huffman codes + raw bits + RSTn markers."""

    def __init__(self, dc_tab, ac_tab):
        self.dc_tab, self.ac_tab = dc_tab, ac_tab
        self.bw = _BitWriter()
        self.body = bytearray()
        self.rst = 0

    def dc_sym(self, s):
        _, _, codes, ln = self.dc_tab
        self.bw.put(codes[s], ln)

    def ac_sym(self, s):
        _, _, codes, ln = self.ac_tab
        self.bw.put(codes[s], ln)

    def bits(self, v, n):
        if n:
            self.bw.put(v, n)

    def restart(self):
        self.bw.align()
        self.body.extend(self.bw.out)
        self.bw.out = bytearray()
        self.body.extend(bytes([0xFF, 0xD0 + self.rst]))
        self.rst = (self.rst + 1) & 7

    def finish(self):
        self.bw.align()
        self.body.extend(self.bw.out)
        self.bw.out = bytearray()
        return bytes(self.body)


def _run_prog_scan(sel, ss, se, ah, al, grids, comps, geo,
                   restart_interval, E):
    """One progressive scan through emitter E (pass 1 or pass 2)."""
    w, h, hmax, vmax, mcux, mcuy = geo

    def dc_blocks():
        if len(sel) == 1:
            ci = sel[0]
            nby, nbx = _ni_grid_dims(w, h, comps[ci], hmax, vmax)
            for by in range(nby):
                for bx in range(nbx):
                    yield [(ci, by, bx)]
        else:
            for my in range(mcuy):
                for mx in range(mcux):
                    mcu = []
                    for ci in sel:
                        c = comps[ci]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                mcu.append((ci, my * c["v"] + by,
                                            mx * c["h"] + bx))
                    yield mcu

    if ss == 0:                                  # DC scan
        pred = {ci: 0 for ci in sel}
        for m, mcu in enumerate(dc_blocks()):
            if restart_interval and m and m % restart_interval == 0:
                E.restart()
                pred = {ci: 0 for ci in sel}
            for ci, by, bx in mcu:
                v = int(grids[ci][by, bx][0]) >> al
                if ah == 0:
                    size, amp = _mag(v - pred[ci])
                    pred[ci] = v
                    E.dc_sym(size)
                    E.bits(amp, size)
                else:
                    E.bits(v & 1, 1)
        return

    # AC scan: single component, band ss..se in zigzag space
    ci = sel[0]
    nby, nbx = _ni_grid_dims(w, h, comps[ci], hmax, vmax)
    eobrun = 0
    pending_bits = []        # correction bits tied to the pending EOB run

    def flush_eob():
        nonlocal eobrun
        if eobrun > 0:
            nb = eobrun.bit_length() - 1
            E.ac_sym(nb << 4)
            E.bits(eobrun & ((1 << nb) - 1), nb)
            eobrun = 0
        for b in pending_bits:
            E.bits(b, 1)
        pending_bits.clear()

    for m in range(nby * nbx):
        if restart_interval and m and m % restart_interval == 0:
            flush_eob()
            E.restart()
        zz = grids[ci][m // nbx, m % nbx]
        vals = [int(zz[k]) for k in range(ss, se + 1)]
        if ah == 0:                              # first scan (G.1.2.2)
            band = [(abs(v) >> al) * (1 if v >= 0 else -1) for v in vals]
            if not any(band):
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
                continue
            flush_eob()
            run = 0
            last_nz = max(i for i, v in enumerate(band) if v)
            for i, v in enumerate(band):
                if i > last_nz:
                    eobrun = 1               # trailing zeros: EOB run
                    break
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    E.ac_sym(0xF0)
                    run -= 16
                size, amp = _mag(v)
                E.ac_sym((run << 4) | size)
                E.bits(amp, size)
                run = 0
            continue
        # refinement scan (G.1.2.3, the libjpeg-equivalent shape
        # re-derived from the spec figures)
        absv = [abs(v) >> al for v in vals]
        eobpos = max((i for i, a in enumerate(absv) if a == 1),
                     default=-1)
        run = 0
        br = []                   # correction bits since the last code
        for i, (v, a) in enumerate(zip(vals, absv)):
            if a == 0:
                run += 1
                continue
            while run > 15 and i <= eobpos:
                flush_eob()
                E.ac_sym(0xF0)
                run -= 16
                for b in br:
                    E.bits(b, 1)
                br = []
            if a > 1:             # history coefficient: correction bit
                br.append(a & 1)
                continue
            flush_eob()           # newly-nonzero coefficient
            E.ac_sym((run << 4) | 1)
            E.bits(0 if v < 0 else 1, 1)
            for b in br:
                E.bits(b, 1)
            br = []
            run = 0
        if run > 0 or br:
            eobrun += 1
            pending_bits.extend(br)
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def _run_seq_scan(sel, grids, comps, geo, restart_interval, E):
    """One full-band sequential scan (baseline block coding) through
    emitter E — non-interleaved when the scan has one component."""
    w, h, hmax, vmax, mcux, mcuy = geo

    def gen():
        if len(sel) == 1:
            ci = sel[0]
            nby, nbx = _ni_grid_dims(w, h, comps[ci], hmax, vmax)
            for by in range(nby):
                for bx in range(nbx):
                    yield [(ci, by, bx)]
        else:
            for my in range(mcuy):
                for mx in range(mcux):
                    mcu = []
                    for ci in sel:
                        c = comps[ci]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                mcu.append((ci, my * c["v"] + by,
                                            mx * c["h"] + bx))
                    yield mcu

    pred = {ci: 0 for ci in sel}
    for m, mcu in enumerate(gen()):
        if restart_interval and m and m % restart_interval == 0:
            E.restart()
            pred = {ci: 0 for ci in sel}
        for ci, by, bx in mcu:
            zz = grids[ci][by, bx]
            dc = int(zz[0])
            size, amp = _mag(dc - pred[ci])
            pred[ci] = dc
            E.dc_sym(size)
            E.bits(amp, size)
            run = 0
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    E.ac_sym(0xF0)
                    run -= 16
                s_, a_ = _mag(v)
                E.ac_sym((run << 4) | s_)
                E.bits(a_, s_)
                run = 0
            if run:
                E.ac_sym(0x00)


def _encode_sequential(img, quant_luma=None, quant_chroma=None,
                       subsample=False, groups=None,
                       restart_interval=0):
    """Forward SEQUENTIAL multi-scan JPEG (T.81 A.2): components split
    across full-band scans, each coded exactly once; Ns=1 scans are
    non-interleaved. groups: list of component-index tuples, default
    one scan per component."""
    comps, h, w, hmax, vmax, mcux, mcuy, ql, qc, gray = _comp_setup(
        img, quant_luma, quant_chroma, subsample)
    geo = (w, h, hmax, vmax, mcux, mcuy)
    grids = []
    for c in comps:
        nby, nbx = mcuy * c["v"], mcux * c["h"]
        g = np.zeros((nby, nbx, 64), np.int64)
        for by in range(nby):
            for bx in range(nbx):
                blk = c["plane"][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                g[by, bx] = np.round(_fdct(blk) / c["q"]) \
                    .astype(np.int64).reshape(64)[_ZIG]
        grids.append(g)
    if groups is None:
        groups = [(i,) for i in range(len(comps))]

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes(
        int(ql.reshape(64)[_ZIG][i]) for i in range(64)))
    if not gray:
        out += seg(0xDB, bytes([0x01]) + bytes(
            int(qc.reshape(64)[_ZIG][i]) for i in range(64)))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    out += seg(0xC0, sof)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    for sel in groups:
        col = _Collect()
        _run_seq_scan(sel, grids, comps, geo, restart_interval, col)
        dc_tab = _build_table(col.dc if col.dc else [0])
        ac_tab = _build_table(col.ac if col.ac else [0])
        counts, syms, _, _ = dc_tab
        out += seg(0xC4, bytes([0x00]) + bytes(counts) + bytes(syms))
        counts, syms, _, _ = ac_tab
        out += seg(0xC4, bytes([0x10]) + bytes(counts) + bytes(syms))
        emit = _Emit(dc_tab, ac_tab)
        _run_seq_scan(sel, grids, comps, geo, restart_interval, emit)
        sos = bytes([len(sel)])
        for ci in sel:
            sos += bytes([comps[ci]["id"], 0x00])
        sos += bytes([0, 63, 0x00])
        out += seg(0xDA, sos)
        out += emit.finish()
    out += b"\xff\xd9"
    return bytes(out)


def test_sequential_per_component_scans_match_interleaved():
    """T.81 A.2: a sequential frame may code each component in its own
    non-interleaved scan — same coefficients, so the decode must be
    bit-identical to the single interleaved scan."""
    rng = np.random.default_rng(5)
    img = np.kron(rng.integers(30, 226, (3, 2, 3)),
                  np.ones((8, 8, 1))).astype(np.uint8)
    base = J.decode_jpeg(_encode_jpeg(img))
    assert np.array_equal(J.decode_jpeg(_encode_sequential(img)), base)
    # 4:2:0, lossy quantizer, odd dims: per-component block grids
    # genuinely differ between luma and chroma
    q = np.full((8, 8), 14, np.int64)
    q[0, 0] = 6
    img2 = np.kron(rng.integers(30, 226, (3, 3, 3)),
                   np.ones((8, 8, 1))).astype(np.uint8)[:19, :21]
    assert np.array_equal(
        J.decode_jpeg(_encode_sequential(img2, quant_luma=q,
                                         subsample=True)),
        J.decode_jpeg(_encode_jpeg(img2, quant_luma=q, subsample=True)))


def test_sequential_mixed_groups_and_restart():
    rng = np.random.default_rng(9)
    img = np.kron(rng.integers(30, 226, (2, 3, 3)),
                  np.ones((8, 8, 1))).astype(np.uint8)
    base = J.decode_jpeg(_encode_jpeg(img))
    # luma alone, then the chroma pair interleaved in SWAPPED order
    got = J.decode_jpeg(_encode_sequential(img, groups=[(0,), (2, 1)]))
    assert np.array_equal(got, base)
    with_rst = J.decode_jpeg(_encode_sequential(img, groups=[(0,), (2, 1)],
                                                restart_interval=2))
    assert np.array_equal(with_rst, base)


def test_sequential_ns_zero_rejected():
    """Ns=0 scans add nothing to coverage but would sweep every MCU
    per ~14-byte scan — unbounded CPU (r14 review finding). T.81
    B.2.3 bounds Ns to 1..4; both values outside it must side-drop."""
    good = _encode_sequential(GRAD)
    i = good.index(b"\xff\xda")
    # SOS payload: len(2) ns(1) ... — patch ns to 0 (and 5)
    for bad_ns in (0, 5):
        patched = good[:i + 4] + bytes([bad_ns]) + good[i + 5:]
        with pytest.raises(P.PixelDecodeError, match="components in"):
            J.decode_jpeg(patched)


def test_sequential_component_scanned_twice_rejected():
    img = np.kron(np.array([[[90, 140, 200]]]),
                  np.ones((8, 8, 1))).astype(np.uint8)
    with pytest.raises(P.PixelDecodeError, match="scanned twice"):
        J.decode_jpeg(_encode_sequential(
            img, groups=[(0,), (0,), (1,), (2,)]))
    # a complete frame ignores trailing garbage after its last scan
    # (the single-scan fast path has always returned at coverage)
    ok = _encode_sequential(img) + b"\x00garbage"
    assert J.decode_jpeg(ok).shape == img.shape


def test_sequential_incomplete_at_eoi_reconstructs_leniently():
    """A sequential stream missing a component's scan reconstructs at
    EOI with the absent plane flat (zero coefficients = 128) rather
    than failing the whole record — same leniency as partial
    progressive. Uses a spatially VARYING image so a decoder that
    wrongly decoded or wrongly zeroed the other planes cannot pass."""
    rng = np.random.default_rng(13)
    img = np.kron(rng.integers(40, 216, (2, 2, 3)),
                  np.ones((8, 8, 1))).astype(np.uint8)
    full = _encode_sequential(img)                # scans: Y, Cb, Cr
    full_dec = J.decode_jpeg(full).astype(np.float64)
    # cut just before the THIRD scan's DHT pair and close with EOI
    third_sos = -1
    for _ in range(3):
        third_sos = full.index(b"\xff\xda", third_sos + 1)
    cut = full.rindex(b"\xff\xc4", 0, third_sos)
    second_dht = full.rindex(b"\xff\xc4", 0, cut)
    got = J.decode_jpeg(full[:second_dht] + b"\xff\xd9").astype(
        np.float64)
    assert got.shape == img.shape
    # Cr missing -> Cr plane sits at 128: blue (no Cr term) matches the
    # full decode, red shifts by exactly -1.402*(Cr-128), and the
    # spatial variation of Y/Cb still came through
    y, cb, cr = (p.astype(np.float64) for p in _to_ycbcr(img))
    assert np.abs(got[..., 2] - full_dec[..., 2]).max() <= 1
    want_red_shift = -1.402 * (cr - 128.0)
    assert np.abs((got[..., 0] - full_dec[..., 0])
                  - want_red_shift).max() <= 2
    assert got[..., 2].std() > 5          # Y/Cb variation survived


def _default_script(ncomp):
    if ncomp == 1:
        return [((0,), 0, 0, 0, 1), ((0,), 1, 5, 0, 2),
                ((0,), 6, 63, 0, 2), ((0,), 1, 63, 2, 1),
                ((0,), 0, 0, 1, 0), ((0,), 1, 63, 1, 0)]
    return [((0, 1, 2), 0, 0, 0, 1),
            ((0,), 1, 5, 0, 2), ((2,), 1, 63, 0, 1),
            ((1,), 1, 63, 0, 1), ((0,), 6, 63, 0, 2),
            ((0,), 1, 63, 2, 1), ((0, 1, 2), 0, 0, 1, 0),
            ((2,), 1, 63, 1, 0), ((1,), 1, 63, 1, 0),
            ((0,), 1, 63, 1, 0)]


def _encode_progressive(img, quant_luma=None, quant_chroma=None,
                        subsample=False, scans=None, restart_interval=0):
    """Forward progressive (SOF2) JPEG: spectral selection +
    successive approximation over per-component quantized coefficient
    grids, per-scan two-pass huffman tables (redefined via DHT before
    each scan), EOB-run coding, optional restart markers. scans: list
    of (comp_indices, Ss, Se, Ah, Al); default is a cjpeg-like
    script."""
    comps, h, w, hmax, vmax, mcux, mcuy, ql, qc, gray = _comp_setup(
        img, quant_luma, quant_chroma, subsample)
    geo = (w, h, hmax, vmax, mcux, mcuy)
    grids = []                     # zigzag-ordered (nby, nbx, 64) int64
    for c in comps:
        nby, nbx = mcuy * c["v"], mcux * c["h"]
        g = np.zeros((nby, nbx, 64), np.int64)
        for by in range(nby):
            for bx in range(nbx):
                blk = c["plane"][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                g[by, bx] = np.round(_fdct(blk) / c["q"]) \
                    .astype(np.int64).reshape(64)[_ZIG]
        grids.append(g)
    if scans is None:
        scans = _default_script(len(comps))

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes(
        int(ql.reshape(64)[_ZIG][i]) for i in range(64)))
    if not gray:
        out += seg(0xDB, bytes([0x01]) + bytes(
            int(qc.reshape(64)[_ZIG][i]) for i in range(64)))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    out += seg(0xC2, sof)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    for sel, ss, se, ah, al in scans:
        col = _Collect()
        _run_prog_scan(sel, ss, se, ah, al, grids, comps, geo,
                       restart_interval, col)
        dc_tab = _build_table(col.dc) if col.dc else None
        ac_tab = _build_table(col.ac) if col.ac else None
        if dc_tab:
            counts, syms, _, _ = dc_tab
            out += seg(0xC4, bytes([0x00]) + bytes(counts) + bytes(syms))
        if ac_tab:
            counts, syms, _, _ = ac_tab
            out += seg(0xC4, bytes([0x10]) + bytes(counts) + bytes(syms))
        emit = _Emit(dc_tab, ac_tab)
        _run_prog_scan(sel, ss, se, ah, al, grids, comps, geo,
                       restart_interval, emit)
        sos = bytes([len(sel)])
        for ci in sel:
            sos += bytes([comps[ci]["id"], 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, sos)
        out += emit.finish()
    out += b"\xff\xd9"
    return bytes(out)


def test_progressive_matches_baseline_gray():
    """Full progressive transmission accumulates the SAME coefficients
    the baseline scan codes in one pass — with identical quantizers the
    decodes must be bit-identical, not merely close."""
    prog = J.decode_jpeg(_encode_progressive(GRAD))
    base = J.decode_jpeg(_encode_jpeg(GRAD))
    assert np.array_equal(prog, base)
    assert int(np.abs(prog.astype(int) - GRAD.astype(int)).max()) <= 1


def test_progressive_matches_baseline_color_444_and_420():
    rng = np.random.default_rng(7)
    img = np.kron(rng.integers(30, 226, (3, 2, 3)),
                  np.ones((8, 8, 1))).astype(np.uint8)
    assert np.array_equal(J.decode_jpeg(_encode_progressive(img)),
                          J.decode_jpeg(_encode_jpeg(img)))
    q = np.full((8, 8), 12, np.int64)
    q[0, 0] = 4
    assert np.array_equal(
        J.decode_jpeg(_encode_progressive(img, quant_luma=q,
                                          subsample=True)),
        J.decode_jpeg(_encode_jpeg(img, quant_luma=q, subsample=True)))


def test_progressive_odd_dims_and_lossy_quantizer():
    img = GRAD[:19, :13]
    q = np.full((8, 8), 16, np.int64)
    q[0, 0] = 8
    prog = J.decode_jpeg(_encode_progressive(img, quant_luma=q))
    base = J.decode_jpeg(_encode_jpeg(img, quant_luma=q))
    assert prog.shape == (19, 13)
    assert np.array_equal(prog, base)


def test_progressive_scan_script_variants():
    """Different spectral splits / approximation depths are different
    bitstreams for the same coefficients — all must decode identically
    to baseline."""
    img = GRAD
    base = J.decode_jpeg(_encode_jpeg(img))
    scripts = [
        # single DC + single full-band AC, no successive approximation
        [((0,), 0, 0, 0, 0), ((0,), 1, 63, 0, 0)],
        # fine band splits
        [((0,), 0, 0, 0, 0), ((0,), 1, 2, 0, 0), ((0,), 3, 9, 0, 0),
         ((0,), 10, 62, 0, 0), ((0,), 63, 63, 0, 0)],
        # deep successive approximation (3 refinement levels)
        [((0,), 0, 0, 0, 3), ((0,), 1, 63, 0, 3), ((0,), 0, 0, 3, 2),
         ((0,), 1, 63, 3, 2), ((0,), 0, 0, 2, 1), ((0,), 1, 63, 2, 1),
         ((0,), 0, 0, 1, 0), ((0,), 1, 63, 1, 0)],
    ]
    for scans in scripts:
        got = J.decode_jpeg(_encode_progressive(img, scans=scans))
        assert np.array_equal(got, base), scans


def test_progressive_restart_markers_match_unrestarted():
    img = GRAD[:24, :16]
    plain = J.decode_jpeg(_encode_progressive(img))
    with_rst = J.decode_jpeg(_encode_progressive(img,
                                                 restart_interval=2))
    assert np.array_equal(plain, with_rst)


def test_progressive_dc_only_scan_reconstructs_block_means():
    """A stream with only the DC band transmitted must reconstruct
    each 8x8 block as its (quantized) mean — the spec's own partial
    reconstruction."""
    img = GRAD[:16, :16]
    buf = _encode_progressive(img, scans=[((0,), 0, 0, 0, 0)])
    got = J.decode_jpeg(buf)
    for by in range(2):
        for bx in range(2):
            blk = img[8 * by:8 * by + 8, 8 * bx:8 * bx + 8] \
                .astype(np.float64)
            dc = np.round(_fdct(blk)[0, 0])
            want = np.clip(np.floor(dc / 8.0 + 128.0 + 0.5), 0, 255)
            assert np.all(got[8 * by:8 * by + 8, 8 * bx:8 * bx + 8]
                          == want)


def test_progressive_rejects_invalid_scan_headers():
    good = _encode_progressive(GRAD, scans=[((0,), 0, 0, 0, 0),
                                            ((0,), 1, 63, 0, 0)])

    def patch_sos(buf, nth, ss, se, ahal):
        i = -1
        for _ in range(nth + 1):
            i = buf.index(b"\xff\xda", i + 1)
        # SOS: marker(2) len(2) ns(1) comp(2)*ns then Ss Se AhAl
        j = i + 4 + 1 + 2
        return buf[:j] + bytes([ss, se, ahal]) + buf[j + 3:]

    # DC band with Se != 0 (also what a relabeled baseline looks like)
    with pytest.raises(P.PixelDecodeError, match="progressive"):
        J.decode_jpeg(patch_sos(good, 0, 0, 63, 0))
    # successive approximation jumping two bits
    with pytest.raises(P.PixelDecodeError, match="one bit"):
        J.decode_jpeg(patch_sos(good, 1, 1, 63, 0x20))
    # inverted spectral band
    with pytest.raises(P.PixelDecodeError, match="spectral band"):
        J.decode_jpeg(patch_sos(good, 1, 9, 3, 0))
    # interleaved AC scan (patch a color stream's full SOS to AC band)
    rgb = np.kron(np.array([[[80, 120, 160]]]),
                  np.ones((8, 8, 1))).astype(np.uint8)
    cbuf = _encode_progressive(rgb)
    i = cbuf.index(b"\xff\xda")
    ns = cbuf[i + 4]
    assert ns == 3                                # the DC scan
    j = i + 4 + 1 + 2 * ns
    bad = cbuf[:j] + bytes([1, 63, 0]) + cbuf[j + 3:]
    with pytest.raises(P.PixelDecodeError, match="single-component"):
        J.decode_jpeg(bad)
    # EOI with zero scans decoded
    hdr = good[:good.index(b"\xff\xda")] + b"\xff\xd9"
    with pytest.raises(P.PixelDecodeError, match="EOI before scan"):
        J.decode_jpeg(hdr)


def test_baseline_sos_component_order_defines_interleave():
    """T.81 B.2.3: the MCU interleave follows the SOS listing, not
    SOF — a file listing Cr,Cb,Y must decode identically to the
    Y,Cb,Cr encoding of the same image."""
    rng = np.random.default_rng(11)
    img = np.kron(rng.integers(30, 226, (2, 2, 3)),
                  np.ones((8, 8, 1))).astype(np.uint8)
    normal = J.decode_jpeg(_encode_jpeg(img))
    reordered = J.decode_jpeg(_encode_jpeg(img, scan_order=(2, 0, 1)))
    assert np.array_equal(normal, reordered)
    # and with subsampling, where per-component block counts differ
    normal420 = J.decode_jpeg(_encode_jpeg(img, subsample=True))
    reord420 = J.decode_jpeg(_encode_jpeg(img, subsample=True,
                                          scan_order=(1, 2, 0)))
    assert np.array_equal(normal420, reord420)


def test_truncated_ff_tail_is_side_drop_not_index_error():
    """A stream ending in 0xFF 0xFF at a marker position must raise
    the side-drop error, not IndexError (r14 review finding: the
    fill-byte skip loop could read past the end)."""
    with pytest.raises(P.PixelDecodeError, match="truncated"):
        J.decode_jpeg(b"\xff\xd8\xff\xff")
    # same tail after a valid progressive scan (via _resync)
    good = _encode_progressive(GRAD, scans=[((0,), 0, 0, 0, 0)])
    assert good.endswith(b"\xff\xd9")
    with pytest.raises(P.PixelDecodeError, match="truncated"):
        J.decode_jpeg(good[:-2] + b"\xff\xff")


def test_progressive_scan_count_cap():
    """A crafted stream of tiny EOB-run scans buys a full block sweep
    per ~20 bytes — unbounded CPU with no side-drop (r14 review
    finding). More than 100 scans must side-drop."""
    base = _encode_progressive(GRAD, scans=[((0,), 0, 0, 0, 0),
                                            ((0,), 1, 63, 0, 0)])
    i = base.index(b"\xff\xda")                  # before the DC scan
    j = base.index(b"\xff\xda", i + 1)           # the AC scan
    k = base.index(b"\xff\xd9")                  # EOI
    ac_scan = base[j:k]                          # DHT-less SOS + body
    crafted = base[:k] + ac_scan * 120 + b"\xff\xd9"
    with pytest.raises(P.PixelDecodeError, match="100 progressive"):
        J.decode_jpeg(crafted)
    # 40 repeats stays under the cap and must still decode fine
    ok = base[:k] + ac_scan * 40 + b"\xff\xd9"
    assert np.array_equal(J.decode_jpeg(ok), J.decode_jpeg(base))


def test_progressive_fuzz_side_drop_contract():
    """Bit-flipped progressive streams must surface as PixelDecodeError
    (the side-drop), never IndexError/OverflowError tracebacks."""
    base = _encode_progressive(GRAD)
    rng = np.random.default_rng(42)
    for _ in range(400):
        buf = bytearray(base)
        for _ in range(rng.integers(1, 4)):
            buf[rng.integers(0, len(buf))] ^= 1 << rng.integers(0, 8)
        try:
            arr = J.decode_jpeg(bytes(buf))
            assert arr.dtype == np.uint8 and arr.shape[0] > 0
        except P.PixelDecodeError:
            pass


def _seg(marker, payload):
    return bytes([0xFF, marker]) + struct.pack(
        ">H", len(payload) + 2) + payload


def _dht(cls, counts_values):
    counts = [0] * 16
    counts[0] = len(counts_values)        # all codes 1 bit (canonical)
    return _seg(0xC4, bytes([cls << 4]) + bytes(counts)
                + bytes(counts_values))


def test_progressive_hand_derived_wire_vector_first_scans():
    """Decoder vector hand-assembled from T.81 itself (independent of
    this file's encoder): 16x8 gray, q=1, a DC-first scan then an
    AC-first scan whose EOB1 run must cover the remainder of block A
    AND all of block B. Expected coefficients: A: DC=3, zigzag-1=5;
    B: DC=-1."""
    dqt = _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = _seg(0xC2, bytes([8]) + struct.pack(">HH", 8, 16)
               + bytes([1, 1, 0x11, 0]))
    # DC scan: table {2: '0', 3: '1'}; A: size2 '0'+diff 3 '11';
    # B: size3 '1'+diff -4 '011' -> bits 0111011 +pad1 = 0x77
    sos_dc = _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00]))
    # AC scan: table {0x03: '0', 0x10: '1'}; A: k=1 coef 5 = '0'+'101',
    # then EOB1 '1' + ext '0' (run of 2: rest of A + all of B)
    # -> bits 010110 +pad11 = 0x5B
    sos_ac = _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00]))
    buf = (b"\xff\xd8" + dqt + sof
           + _dht(0, [2, 3]) + sos_dc + bytes([0x77])
           + _dht(1, [0x03, 0x10]) + sos_ac + bytes([0x5B])
           + b"\xff\xd9")
    got = J.decode_jpeg(buf)
    ca, cb_ = np.zeros((8, 8)), np.zeros((8, 8))
    ca[0, 0] = 3
    ca[0, 1] = 5                                  # zigzag index 1
    cb_[0, 0] = -1
    want = np.hstack([
        np.clip(np.floor(_DCT.T @ ca @ _DCT + 128.0 + 0.5), 0, 255),
        np.clip(np.floor(_DCT.T @ cb_ @ _DCT + 128.0 + 0.5), 0, 255),
    ]).astype(np.uint8)
    assert np.array_equal(got, want)


def test_progressive_hand_derived_wire_vector_ac_refinement():
    """Hand-assembled AC refinement (T.81 G.1.2.3): after an Al=1
    first scan leaves zigzag-1 = 4, the refinement must apply a
    correction bit (4 -> 5) and insert a newly-nonzero -1 at zigzag-2,
    with the wire order code, sign bit, then buffered correction
    bits."""
    dqt = _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = _seg(0xC2, bytes([8]) + struct.pack(">HH", 8, 8)
               + bytes([1, 1, 0x11, 0]))
    # DC: single symbol {0} -> code '0'; bits '0'+pad = 0x7F
    sos_dc = _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00]))
    # AC first at Al=1: coef 5 -> 5>>1 = 2: sym 0x02 '1' + amp '10',
    # then EOB0 '0' -> 1100 +pad = 0xCF  (table {0x00:'0', 0x02:'1'})
    sos_ac1 = _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x01]))
    # AC refine Ah=1 Al=0: sym 0x01 '1' (newly nonzero after 0-run),
    # sign '0' (negative), buffered correction bit '1' (5 & 1), then
    # EOB0 '0' -> 1010 +pad = 0xAF  (table {0x00:'0', 0x01:'1'})
    sos_ac2 = _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x10]))
    buf = (b"\xff\xd8" + dqt + sof
           + _dht(0, [0]) + sos_dc + bytes([0x7F])
           + _dht(1, [0x00, 0x02]) + sos_ac1 + bytes([0xCF])
           + _dht(1, [0x00, 0x01]) + sos_ac2 + bytes([0xAF])
           + b"\xff\xd9")
    got = J.decode_jpeg(buf)
    coef = np.zeros((8, 8))
    coef[0, 1] = 5                                # zigzag 1, refined
    coef[1, 0] = -1                               # zigzag 2, new
    want = np.clip(np.floor(_DCT.T @ coef @ _DCT + 128.0 + 0.5),
                   0, 255).astype(np.uint8)
    assert np.array_equal(got, want)


def test_progressive_dispatch_and_spark_kernels(spark):
    from kafka_elasticsearch_injector_spark.operators.multimodal import (
        parse_image_header,
    )

    img = np.kron(np.array([[[70, 150, 210]]]),
                  np.ones((16, 16, 1))).astype(np.uint8)
    buf = _encode_progressive(img)
    assert parse_image_header(buf) == ("jpeg", 16, 16)
    fmt, arr = P.decode_pixels(buf)
    assert fmt == "jpeg" and arr.shape == (16, 16, 3)
    rows = [(1, bytearray(buf)),
            (2, bytearray(_encode_progressive(GRAD)))]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    got = {r.doc_id: r for r in P.image_pixel_stats(df).collect()}
    assert got[1].format == "jpeg" and got[1].channels == 3
    assert got[1].channel_mean == pytest.approx([70, 150, 210], abs=2)
    assert got[2].channels == 1


def _with_exif(jpeg: bytes, orientation: int) -> bytes:
    """Insert a minimal Exif APP1 (II order, one IFD0 entry) after
    SOI."""
    tiff = (b"II" + struct.pack("<H", 42) + struct.pack("<I", 8)
            + struct.pack("<H", 1)
            + struct.pack("<HHI", 0x0112, 3, 1)
            + struct.pack("<H", orientation) + b"\x00\x00"
            + struct.pack("<I", 0))
    payload = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    assert jpeg[:2] == b"\xff\xd8"
    return jpeg[:2] + app1 + jpeg[2:]


def test_exif_orientation_applied_in_spark_kernels(spark):
    """Orientation-6 (90° CW to display) JPEGs must report DISPLAY
    dims in image_pixel_stats and produce upright thumbnails in
    resize_images; decode_jpeg itself stays raster-order (Exif is
    container metadata, not scan data)."""
    img = GRAD[:8, :16]                           # wide stored raster
    buf = _with_exif(_encode_jpeg(img), 6)
    raw = J.decode_jpeg(buf)
    assert raw.shape == (8, 16)                   # decoder: stored raster
    df = spark.createDataFrame(
        [(1, bytearray(buf)), (2, bytearray(_encode_jpeg(img)))],
        "doc_id long, media binary")
    got = {r.doc_id: r for r in P.image_pixel_stats(df).collect()}
    assert (got[1].width, got[1].height) == (8, 16)   # display dims
    assert (got[2].width, got[2].height) == (16, 8)   # no Exif: raster
    thumbs = {r.doc_id: r for r in P.resize_images(df, 4, 8,
                                                   method="nearest")
              .collect()}
    up = P.decode_png(bytes(thumbs[1].thumb))
    want = P.resize_nearest(P.apply_exif_orientation(raw, 6)[:, :, None],
                            4, 8)
    assert np.array_equal(up, want)


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


def test_batched_scatter_flush_boundary_roundtrip():
    """The r15 entropy rework batches coefficient writes through
    Python lists flushed every 64k entries: a dense q=1 image with
    ~92k coded coefficients per scan must cross the flush boundary
    and still round-trip exactly like any other q=1 stream."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (304, 304), np.uint8)
    got = J.decode_jpeg(_encode_jpeg(img))
    assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= 1


def test_overfull_dht_side_drops():
    """A DHT whose counts describe more codes than the prefix space
    holds (three 1-bit codes) is spec-invalid (T.81 C.2) and must
    side-drop when a scan first compiles the table, not decode with
    garbage rows or grow the LUT."""
    dqt = _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = _seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8)
               + bytes([1, 1, 0x11, 0]))
    counts = [0] * 16
    counts[0] = 3                       # 1-bit codes: only 2 exist
    bad_dht = _seg(0xC4, bytes([0x00]) + bytes(counts) + bytes([0, 1, 2]))
    ac_dht = _dht(1, [0x00])
    sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0x00]))
    buf = (b"\xff\xd8" + dqt + sof + bad_dht + ac_dht + sos
           + bytes([0x00]) + b"\xff\xd9")
    with pytest.raises(P.PixelDecodeError, match="overfull"):
        J.decode_jpeg(buf)


def test_progressive_dc_drift_side_drops():
    """A crafted Al=13 DC-first scan whose per-block DIFFs keep
    climbing drives pred << 13 past int32 after ~193 blocks; the
    decoder must side-drop (r14 guard — now load-bearing again since
    the batched int32 scatter would silently wrap where the old
    scalar store raised OverflowError)."""
    dqt = _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = _seg(0xC2, bytes([8]) + struct.pack(">HH", 104, 128)
               + bytes([1, 1, 0x11, 0]))              # 16x13 = 208 blocks
    counts = [0] * 16
    counts[0] = 1                       # single 1-bit code: size 11
    dht = _seg(0xC4, bytes([0x00]) + bytes(counts) + bytes([11]))
    sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x0D]))  # Ah=0 Al=13
    # per block: code '0' + amplitude '10101010101' (= +1365), so the
    # 12-bit pattern tiles as 0x55 bytes with no 0xFF to stuff
    body = bytes([0x55]) * 312                         # 208 blocks
    buf = b"\xff\xd8" + dqt + sof + dht + sos + body + b"\xff\xd9"
    with pytest.raises(P.PixelDecodeError, match="out of range"):
        J.decode_jpeg(buf)


def test_progressive_subsampled_unaligned_width_matches_baseline():
    """Progressive AC scans raster the component's NON-interleaved
    block grid, which is narrower than the MCU-padded coefficient
    array whenever width is not a multiple of the MCU width (24x24
    4:2:0: luma NI width 3 vs padded 4) — the flat block index must go
    through the padded row stride (r15 review finding: m * 64 scattered
    luma AC into padding blocks). Per-pixel random data keeps AC energy
    nonzero in every block."""
    rng = np.random.default_rng(11)
    for w, h in [(24, 24), (24, 8), (40, 24)]:
        img = rng.integers(0, 256, (h, w, 3), np.uint8)
        base = J.decode_jpeg(_encode_jpeg(img, subsample=True))
        prog = J.decode_jpeg(_encode_progressive(img, subsample=True))
        assert np.array_equal(base, prog), (w, h)


def _encode_jpeg_cmyk(planes: np.ndarray, transform: int,
                      quant=None) -> bytes:
    """Forward 3- or 4-component baseline JPEG with an Adobe APP14
    marker. `planes` is (H, W, 3|4) uint8 of the STORED samples — for
    4 components, the Adobe inverted-ink C'M'Y'K'; for 3 with
    transform 0, direct RGB. transform 2 (YCCK) forward-transforms the
    first three channels through the standard RGB→YCbCr matrix before
    coding, as Adobe encoders do; transform 0 codes them directly.
    4:4:4, one quant/huffman class shared by all components."""
    h, w, nc = planes.shape
    q = np.ones((8, 8), np.int64) if quant is None else quant
    chans = [planes[:, :, i].astype(np.float64) for i in range(nc)]
    if transform == 2:
        y, cb, cr = _to_ycbcr(planes[:, :, :3])
        chans[0], chans[1], chans[2] = y, cb, cr
    bh, bw = -(-h // 8) * 8, -(-w // 8) * 8
    chans = [_pad(c, bh, bw) for c in chans]

    units = []
    for my in range(bh // 8):
        for mx in range(bw // 8):
            for ci in range(nc):
                blk = chans[ci][my * 8:my * 8 + 8, mx * 8:mx * 8 + 8]
                coef = np.round(_fdct(blk) / q).astype(np.int64)
                units.append((ci, coef.reshape(64)[_ZIG]))
    dc_syms, ac_syms = [], []
    pred = [0] * nc
    for ci, zz in units:
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        dc_syms.append(_mag(diff)[0])
        run = 0
        for k in range(1, 64):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                ac_syms.append(0xF0)
                run -= 16
            ac_syms.append((run << 4) | _mag(int(zz[k]))[0])
            run = 0
        if run:
            ac_syms.append(0x00)
    dcounts, dsyms, dcodes, dlen = _build_table(dc_syms or [0])
    acounts, asyms, acodes, alen = _build_table(ac_syms or [0])

    bw_ = _BitWriter()
    pred = [0] * nc
    for ci, zz in units:
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

    out = bytearray(b"\xff\xd8")
    out += _seg(0xEE, b"Adobe" + bytes([0, 100, 0, 0, 0, 0, transform]))
    out += _seg(0xDB, bytes([0x00]) + bytes(
        int(q.reshape(64)[_ZIG][i]) for i in range(64)))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for cid in range(1, nc + 1):
        sof += bytes([cid, 0x11, 0])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(dcounts) + bytes(dsyms))
    out += _seg(0xC4, bytes([0x10]) + bytes(acounts) + bytes(asyms))
    sos = bytes([nc])
    for cid in range(1, nc + 1):
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += bw_.out
    out += b"\xff\xd9"
    return bytes(out)


def test_cmyk_adobe_transform0_composites_to_rgb():
    """Adobe CMYK (transform 0): stored inverted-ink planes composite
    as RGB = channel' * K' / 255 (round-half-up) — the expected image
    is computed here from the source planes, independent of the
    decoder."""
    rng = np.random.default_rng(5)
    planes = rng.integers(0, 256, (24, 16, 4), np.uint8)
    got = J.decode_jpeg(_encode_jpeg_cmyk(planes, transform=0))
    p = planes.astype(np.float64)
    want = np.floor(p[:, :, :3] * p[:, :, 3:4] / 255.0 + 0.5)
    # q=1 entropy coding is exact; IDCT rounding moves a stored sample
    # by at most 1, which the /255 composite keeps within 1 count
    assert got.shape == (24, 16, 3)
    assert int(np.abs(got.astype(int) - want.astype(int)).max()) <= 2


def test_ycck_adobe_transform2_round_trips():
    """YCCK (transform 2): the first three stored channels ride the
    YCbCr forward/inverse pair, then composite with K like CMYK. The
    inverse must recover the inverted C'M'Y' within the same ±1 the
    3-component path guarantees before the K composite."""
    rng = np.random.default_rng(6)
    planes = rng.integers(0, 256, (16, 24, 4), np.uint8)
    got = J.decode_jpeg(_encode_jpeg_cmyk(planes, transform=2))
    p = planes.astype(np.float64)
    want = np.floor(p[:, :, :3] * p[:, :, 3:4] / 255.0 + 0.5)
    assert got.shape == (16, 24, 3)
    # YCbCr float round-trip adds ±1 on the primes before the composite
    assert int(np.abs(got.astype(int) - want.astype(int)).max()) <= 3


def test_cmyk_without_app14_assumes_adobe_convention():
    """A 4-component frame with no APP14 is decoded as direct CMYK
    with the inverted-ink convention (libjpeg's assumption; these
    files all come from Adobe tooling in practice)."""
    rng = np.random.default_rng(7)
    planes = rng.integers(0, 256, (8, 8, 4), np.uint8)
    buf = _encode_jpeg_cmyk(planes, transform=0)
    i = buf.index(b"\xff\xee")
    (ln,) = struct.unpack(">H", buf[i + 2:i + 4])
    stripped = buf[:i] + buf[i + 2 + ln:]         # drop APP14 entirely
    assert np.array_equal(J.decode_jpeg(stripped),
                          J.decode_jpeg(buf))


def test_cmyk_fuzz_side_drop_contract():
    """Bit-flipped 4-component streams must surface as PixelDecodeError
    or decode — never an uncaught traceback."""
    rng = np.random.default_rng(8)
    base = _encode_jpeg_cmyk(
        rng.integers(0, 256, (16, 16, 4), np.uint8), transform=2)
    for _ in range(300):
        buf = bytearray(base)
        for _ in range(rng.integers(1, 4)):
            buf[rng.integers(0, len(buf))] ^= 1 << rng.integers(0, 8)
        try:
            arr = J.decode_jpeg(bytes(buf))
            assert arr.dtype == np.uint8 and arr.shape[0] > 0
        except P.PixelDecodeError:
            pass


def test_rgb_coded_adobe_transform0_skips_ycbcr_inverse():
    """APP14 transform 0 on a THREE-component frame means the
    components are coded RGB directly (Adobe tooling emits these);
    the decoder must pass them through instead of running the YCbCr
    inverse (r15 review finding: it silently scrambled the colors)."""
    rng = np.random.default_rng(9)
    rgb = rng.integers(0, 256, (16, 16, 3), np.uint8)
    got = J.decode_jpeg(_encode_jpeg_cmyk(rgb, transform=0))
    assert got.shape == (16, 16, 3)
    assert int(np.abs(got.astype(int) - rgb.astype(int)).max()) <= 1


def _encode_jpeg12(planes: np.ndarray, quant=None) -> bytes:
    """Forward 12-bit extended-sequential JPEG (SOF1, the legal
    carrier for 12-bit precision). `planes` is (H, W) gray or
    (H, W, 3) STORED 12-bit samples (0..4095; for color these are the
    YCbCr planes as coded). Level shift 2048, 4:4:4, one quant and one
    huffman class shared by all components."""
    arr = planes if planes.ndim == 3 else planes[:, :, None]
    h, w, nc = arr.shape
    q = np.ones((8, 8), np.int64) if quant is None else quant
    chans = [_pad(arr[:, :, i].astype(np.float64),
                  -(-h // 8) * 8, -(-w // 8) * 8) for i in range(nc)]
    bh, bw = chans[0].shape

    units = []
    for my in range(bh // 8):
        for mx in range(bw // 8):
            for ci in range(nc):
                blk = chans[ci][my * 8:my * 8 + 8, mx * 8:mx * 8 + 8]
                coef = np.round(
                    (_DCT @ (blk - 2048.0) @ _DCT.T) / q).astype(np.int64)
                units.append((ci, coef.reshape(64)[_ZIG]))
    dc_syms, ac_syms = [], []
    pred = [0] * nc
    for ci, zz in units:
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        dc_syms.append(_mag(diff)[0])
        run = 0
        for k in range(1, 64):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                ac_syms.append(0xF0)
                run -= 16
            ac_syms.append((run << 4) | _mag(int(zz[k]))[0])
            run = 0
        if run:
            ac_syms.append(0x00)
    dcounts, dsyms, dcodes, dlen = _build_table(dc_syms or [0])
    acounts, asyms, acodes, alen = _build_table(ac_syms or [0])

    bw_ = _BitWriter()
    pred = [0] * nc
    for ci, zz in units:
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

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes(
        int(q.reshape(64)[_ZIG][i]) for i in range(64)))
    sof = bytes([12]) + struct.pack(">HH", h, w) + bytes([nc])
    for cid in range(1, nc + 1):
        sof += bytes([cid, 0x11, 0])
    out += _seg(0xC1, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(dcounts) + bytes(dsyms))
    out += _seg(0xC4, bytes([0x10]) + bytes(acounts) + bytes(asyms))
    sos = bytes([nc])
    for cid in range(1, nc + 1):
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += bw_.out
    out += b"\xff\xd9"
    return bytes(out)


def test_12bit_grayscale_high_nibble():
    """12-bit gray (SOF1): decode reconstructs at 12-bit scale and
    returns the uint8 high nibble. The checker pattern makes the DC
    DIFFs swing +-16384, exercising DC size categories 12-15 that are
    illegal (and rejected) in 8-bit streams."""
    rng = np.random.default_rng(21)
    plane = rng.integers(0, 4096, (24, 16)).astype(np.uint16)
    plane[:8, :8] = 0                      # extreme DC swings
    plane[:8, 8:16] = 4095
    got = J.decode_jpeg(_encode_jpeg12(plane))
    want = (plane >> 4).astype(np.uint8)
    assert got.shape == plane.shape
    assert int(np.abs(got.astype(int) - want.astype(int)).max()) <= 1


def test_12bit_ycbcr_color():
    """12-bit 3-component: the YCbCr inverse runs at 12-bit scale
    (center 2048, clip 0..4095) before the high-nibble reduction; the
    expected image is computed here from the stored planes,
    independent of the decoder."""
    rng = np.random.default_rng(22)
    ycc = rng.integers(0, 4096, (16, 8, 3)).astype(np.uint16)
    got = J.decode_jpeg(_encode_jpeg12(ycc))
    y = ycc[:, :, 0].astype(np.float64)
    cb = ycc[:, :, 1].astype(np.float64) - 2048.0
    cr = ycc[:, :, 2].astype(np.float64) - 2048.0
    want = np.stack([
        np.clip(np.floor(y + 1.402 * cr + 0.5), 0, 4095),
        np.clip(np.floor(y - 0.344136 * cb - 0.714136 * cr + 0.5),
                0, 4095),
        np.clip(np.floor(y + 1.772 * cb + 0.5), 0, 4095)], -1) // 16
    assert got.shape == (16, 8, 3)
    assert int(np.abs(got.astype(int) - want.astype(int)).max()) <= 1


def test_12bit_rejections():
    """Still-unsupported precision combinations side-drop: 12-bit
    4-component, and any precision outside {8, 12}."""
    base = _encode_jpeg_cmyk(
        np.zeros((8, 8, 4), np.uint8), transform=0)
    i = base.index(b"\xff\xc0")
    patched = base[:i + 4] + bytes([12]) + base[i + 5:]
    with pytest.raises(P.PixelDecodeError, match="12-bit 4-component"):
        J.decode_jpeg(patched)
    g = _encode_jpeg(GRAD)
    i = g.index(b"\xff\xc0")
    with pytest.raises(P.PixelDecodeError, match="10-bit"):
        J.decode_jpeg(g[:i + 4] + bytes([10]) + g[i + 5:])


def test_12bit_progressive_dc_hand_vector():
    """Hand-assembled 12-bit SOF2 stream (r15 review finding: the
    progressive DC path's widened size cap had no coverage): one 8x8
    block, DC-first scan coding size category 12 — illegal in 8-bit
    streams — with DIFF +2730; expected pixels computed from the
    coefficient independently of the decoder."""
    dqt = _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = _seg(0xC2, bytes([12]) + struct.pack(">HH", 8, 8)
               + bytes([1, 1, 0x11, 0]))
    dht = _seg(0xC4, bytes([0x00]) + bytes([1] + [0] * 15) + bytes([12]))
    sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00]))
    # bits: code '0' + amplitude '101010101010' (+2730), pad with 1s
    buf = (b"\xff\xd8" + dqt + sof + dht + sos
           + bytes([0x55, 0x57]) + b"\xff\xd9")
    got = J.decode_jpeg(buf)
    coef = np.zeros((8, 8))
    coef[0, 0] = 2730
    want = (np.clip(np.floor(_DCT.T @ coef @ _DCT + 2048.5), 0, 4095)
            // 16).astype(np.uint8)
    assert np.array_equal(got, want)
