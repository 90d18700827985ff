"""Baseline JPEG pixel decode — pure Python + numpy, public ITU T.81
spec only (no libjpeg).

Scope (the curation-gate subset): baseline and extended-sequential
huffman JPEG (SOF0/SOF1), 8-bit samples, grayscale or YCbCr with
sampling factors 1-2 in each axis (4:4:4, 4:2:2, 4:2:0, 4:1:1),
restart markers, multiple DQT/DHT segments, 16-bit quantizer entries.
Progressive (SOF2), arithmetic coding (SOF9+), hierarchical, and
12-bit precision raise PixelDecodeError with the reason — the Spark
kernels in operators/pixels.py turn that into the side-drop column.

Faithfulness: huffman decode and dequantization are exact; the inverse
DCT runs in float64 (a separable orthonormal DCT-III matrix product)
with round-half-up to uint8 — the same math every conformant decoder
approximates (T.81 Annex A leaves IDCT precision to the
implementation, so decoders legitimately differ by ±1 count; tests
bound the error against an independent forward encoder instead of
byte-comparing against another library). Chroma upsampling is pixel
replication (the nearest-neighbor upsample JFIF permits).

Throughput: the entropy decoder is a per-bit Python loop — honest and
correct, sized for curation-gate thumbnails and tests, not bulk pixel
serving; at full 100 TB pixel volume a native codec slots in behind
the same decode_pixels contract (operators/pixels.py docstring).
"""

from __future__ import annotations

import struct

import numpy as np

# PixelDecodeError lives in pixels.py; import lazily to avoid a cycle
# (pixels.py imports decode_jpeg from here).


def _err(msg: str):
    from .pixels import PixelDecodeError

    return PixelDecodeError(msg)


_ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

# Orthonormal 8-point DCT-II basis: C[k, n] = a(k) cos((2n+1)kπ/16).
_DCT = np.array([[ (1 / np.sqrt(8)) if k == 0 else
                   0.5 * np.cos((2 * n + 1) * k * np.pi / 16)
                   for n in range(8)] for k in range(8)])


def _idct2(block: np.ndarray) -> np.ndarray:
    """2-D inverse DCT of an 8x8 coefficient block (orthonormal
    convention matching the forward A @ b @ A.T)."""
    return _DCT.T @ block @ _DCT


class _Huff:
    """Canonical huffman table from a DHT segment: 16 length counts +
    values, decoded by walking one bit at a time against the canonical
    (length, code) map (T.81 Annex C)."""

    def __init__(self, counts: bytes, values: bytes):
        self.lut: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(counts[ln - 1]):
                if k >= len(values):
                    raise _err("jpeg: DHT values truncated")
                self.lut[(ln, code)] = values[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """Entropy-segment bit reader: MSB-first, 0xFF00 byte-unstuffing;
    stops at any non-stuffing marker (the caller handles RSTn)."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.buf[self.pos]
        if b == 0xFF:
            nxt = self.buf[self.pos + 1] if self.pos + 1 < len(self.buf) \
                else None
            if nxt == 0x00:
                self.pos += 2          # stuffed 0xFF data byte
            else:
                raise _err("jpeg: entropy data ended at a marker")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.buf):
                raise _err("jpeg: entropy data truncated")
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: _Huff) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.lut.get((ln, code))
            if sym is not None:
                return sym
        raise _err("jpeg: invalid huffman code")

    def align_and_expect_rst(self, n: int) -> None:
        """Byte-align and consume the next RSTn marker (T.81 E.2.4);
        0xFF fill bytes before the marker code are skipped."""
        self.nbits = 0
        while self.pos + 1 < len(self.buf) \
                and self.buf[self.pos] == 0xFF \
                and self.buf[self.pos + 1] == 0xFF:
            self.pos += 1
        if self.pos + 2 > len(self.buf) \
                or self.buf[self.pos] != 0xFF \
                or self.buf[self.pos + 1] != 0xD0 + (n & 7):
            raise _err("jpeg: missing restart marker")
        self.pos += 2


def _extend(v: int, size: int) -> int:
    """DIFF/AC amplitude decode (T.81 F.12): `size` magnitude bits,
    top bit 0 means negative (offset binary)."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Baseline/extended-sequential huffman JPEG → (H, W) gray or
    (H, W, 3) RGB uint8. Raises PixelDecodeError (reason included) for
    anything outside the documented scope or malformed streams."""
    if buf[:2] != b"\xff\xd8":
        raise _err("jpeg: bad SOI")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            raise _err("jpeg: lost marker sync")
        # 0xFF fill bytes before a marker are legal padding
        # (T.81 B.1.1.2): the marker code is the first non-FF byte
        while pos + 1 < len(buf) and buf[pos + 1] == 0xFF:
            pos += 1
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xD8 or (0xD0 <= marker <= 0xD7) or marker == 0x01:
            continue
        if marker == 0xD9:
            raise _err("jpeg: EOI before scan")
        (seg_len,) = struct.unpack(">H", buf[pos:pos + 2])
        if seg_len < 2 or pos + seg_len > len(buf):
            raise _err("jpeg: truncated segment")
        seg = buf[pos + 2:pos + seg_len]
        if marker == 0xDB:                               # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                n = 64 * (2 if prec else 1)
                if p + n > len(seg):
                    raise _err("jpeg: DQT truncated")
                if prec:
                    vals = np.frombuffer(seg, ">u2", count=64, offset=p)
                else:
                    vals = np.frombuffer(seg, np.uint8, count=64, offset=p)
                tbl = np.zeros(64, np.int64)
                tbl[_ZIGZAG] = vals.astype(np.int64)
                qt[tid] = tbl.reshape(8, 8)
                p += n
        elif marker == 0xC4:                             # DHT
            p = 0
            while p + 17 <= len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0x0F
                counts = seg[p + 1:p + 17]
                nval = sum(counts)
                values = seg[p + 17:p + 17 + nval]
                if len(values) != nval:
                    raise _err("jpeg: DHT truncated")
                (huff_dc if cls == 0 else huff_ac)[tid] = \
                    _Huff(counts, values)
                p += 17 + nval
        elif marker in (0xC0, 0xC1):                     # SOF0/SOF1
            if len(seg) < 6:
                raise _err("jpeg: SOF truncated")
            prec, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if len(seg) < 6 + 3 * ncomp:
                raise _err("jpeg: SOF truncated")
            if prec != 8:
                raise _err(f"jpeg: {prec}-bit precision unsupported")
            if h == 0 or w == 0:
                raise _err("jpeg: bad dimensions")
            if ncomp not in (1, 3):
                raise _err(f"jpeg: {ncomp} components unsupported")
            from .pixels import MAX_PIXELS

            if w * h > MAX_PIXELS:
                raise _err(f"jpeg: {w}x{h} exceeds the decode pixel cap")
            comps = []
            for c in range(ncomp):
                cid, samp, tq = seg[6 + 3 * c:9 + 3 * c]
                hs, vs = samp >> 4, samp & 0x0F
                if hs not in (1, 2, 4) or vs not in (1, 2, 4):
                    raise _err(f"jpeg: sampling {hs}x{vs} unsupported")
                comps.append({"id": cid, "h": hs, "v": vs, "tq": tq})
            if ncomp == 1:
                # T.81 A.2.2: a single-component scan is NON-interleaved
                # — one 8x8 unit per MCU in raster order, sampling
                # factors ignored (grayscale files routinely declare
                # the color default 2x2)
                comps[0]["h"] = comps[0]["v"] = 1
            frame = {"w": w, "h": h, "comps": comps}
        elif marker == 0xC2:
            raise _err("jpeg: progressive (SOF2) unsupported")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise _err(f"jpeg: SOF{marker - 0xC0} coding unsupported")
        elif marker == 0xDD:                             # DRI
            if len(seg) < 2:
                raise _err("jpeg: DRI truncated")
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:                             # SOS
            if frame is None:
                raise _err("jpeg: SOS before SOF")
            if len(seg) < 1 or len(seg) < 1 + 2 * seg[0] + 3:
                raise _err("jpeg: SOS truncated")
            ns = seg[0]
            if ns != len(frame["comps"]):
                raise _err("jpeg: partial-scan SOS unsupported")
            scan = {}
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                scan[cid] = (tabs >> 4, tabs & 0x0F)
            return _decode_scan(buf, pos + seg_len, frame, scan, qt,
                                huff_dc, huff_ac, restart_interval)
        # all other segments (APPn, COM, ...) skip
        pos += seg_len
    raise _err("jpeg: no scan found")


def _decode_scan(buf, pos, frame, scan, qt, huff_dc, huff_ac,
                 restart_interval) -> np.ndarray:
    comps = frame["comps"]
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        pw, ph = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes.append(np.zeros((ph, pw), np.float64))
        if c["tq"] not in qt:
            raise _err(f"jpeg: missing quant table {c['tq']}")
    r = _BitReader(buf, pos)
    pred = [0] * len(comps)
    rst = 0
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count \
                    and mcu_count % restart_interval == 0:
                r.align_and_expect_rst(rst)
                rst = (rst + 1) & 7
                pred = [0] * len(comps)
            mcu_count += 1
            for ci, c in enumerate(comps):
                dct_t, act_t = scan.get(c["id"], (None, None))
                if dct_t not in huff_dc or act_t not in huff_ac:
                    raise _err("jpeg: missing huffman table for scan")
                dc_tab, ac_tab = huff_dc[dct_t], huff_ac[act_t]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, np.int64)
                        size = r.huff(dc_tab)
                        if size > 11:
                            raise _err("jpeg: bad DC size")
                        pred[ci] += _extend(r.bits(size), size)
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = r.huff(ac_tab)
                            run, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if run == 15:      # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break              # EOB
                            k += run
                            if k > 63:
                                raise _err("jpeg: AC run past block")
                            zz[k] = _extend(r.bits(size), size)
                            k += 1
                        coef = np.zeros(64, np.int64)
                        coef[_ZIGZAG] = zz
                        block = _idct2(coef.reshape(8, 8) * q) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = block
    out_planes = []
    for ci, c in enumerate(comps):
        p = np.clip(np.floor(planes[ci] + 0.5), 0, 255)
        # replicate-upsample to full resolution, crop padding
        p = p.repeat(vmax // c["v"], axis=0).repeat(hmax // c["h"], axis=1)
        out_planes.append(p[:h, :w])
    if len(comps) == 1:
        return out_planes[0].astype(np.uint8)
    y, cb, cr = out_planes
    r_ = y + 1.402 * (cr - 128.0)
    g_ = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b_ = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r_, g_, b_], axis=2)
    return np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)
