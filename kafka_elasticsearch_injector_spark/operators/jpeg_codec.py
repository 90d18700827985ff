"""Baseline + progressive JPEG pixel decode — pure Python + numpy,
public ITU T.81 spec only (no libjpeg).

Scope (the curation-gate subset): huffman-coded JPEG with 8-bit or
12-bit samples (12-bit reconstructs at its own scale — level shift
2048, clip 0..4095 — and reduces to the uint8 high nibble, the PNG
16-bit high-byte convention) — baseline and extended-sequential
(SOF0/SOF1, including
multi-scan frames that split components across full-band scans per
T.81 A.2) and progressive (SOF2, spectral selection + successive
approximation, T.81 Annex G) — grayscale, YCbCr, or Adobe
4-component CMYK/YCCK (APP14 ColorTransform: 0 → direct, 2 → YCCK;
the inverted-ink convention, composited to RGB) with sampling
factors 1-2 in each axis (4:4:4, 4:2:2, 4:2:0, 4:1:1), restart
markers, multiple DQT/DHT segments (including redefinition between
scans), 16-bit quantizer entries. Arithmetic coding (SOF9+) and
hierarchical raise PixelDecodeError with the reason — the Spark
kernels in operators/pixels.py turn that into the side-drop column.

Faithfulness: huffman decode and dequantization are exact; both frame
types accumulate exact integer coefficients (progressive scans refine
them bit-by-bit per Annex G) and share one reconstruction: a
vectorized float64 inverse DCT (separable orthonormal DCT-III as
BLAS-batched matmuls over all blocks) with round-half-up to uint8 —
the same math every conformant decoder approximates (T.81 Annex A leaves IDCT
precision to the implementation, so decoders legitimately differ by
±1 count; tests bound the error against independent forward encoders
instead of byte-comparing against another library). Chroma upsampling
is pixel replication (the nearest-neighbor upsample JFIF permits).

Allocation safety: every buffer is bounded by a BYTE budget checked
against the header before anything is allocated — w*h*ncomp at 8
bytes per sample must stay within 4x MAX_PIXELS (the ~256 MB RGBA
budget pixels.py documents), so a crafted 3-component 8000x8000
header is rejected up front instead of zero-filling ~1.5 GB of
planes. Reconstruction is slab-chunked and in-place (coefficient grid
+ one preallocated float64 plane ≈ 12 B/sample in the transform,
~40 B/pixel at the color convert; the entropy scans batch sparse
coefficient writes through Python lists flushed every 64k entries, so
a crafted fully-dense stream cannot grow them past a few MB):
measured peak RSS 534 MB decoding a crafted header AT the 32 MP
grayscale cap (~2.1x the budget; 1552 MB before r14's review fixes),
a few MB at real web-image sizes. A crafted stream
of tiny EOB-run scans cannot buy unbounded CPU either: progressive
streams are capped at 100 scans (real encoders emit ~6-12).

Throughput: the entropy decoder reads a pre-unstuffed chunk through
an integer accumulator (8-byte refills) and resolves huffman symbols
with one flat 16-bit LUT peek per symbol instead of a per-bit tree
walk — still pure Python per symbol, sized for curation-gate
thumbnails and tests, not bulk pixel serving; at full 100 TB pixel
volume a native codec slots in behind the same decode_pixels contract
(operators/pixels.py docstring).
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

# natural position of zigzag index k is _ZIGZAG[k]; the scans store
# coefficients in ZIGZAG order (run/band indices address the grid
# directly, no per-coefficient reorder) and _reconstruct applies the
# inverse permutation once, vectorized, per slab
_INVZ = np.argsort(_ZIGZAG)

# Orthonormal 8-point DCT-II basis: C[k, n] = a(k) cos((2n+1)kπ/16).
_DCT = np.array([[ (1 / np.sqrt(8)) if k == 0 else
                   0.5 * np.cos((2 * n + 1) * k * np.pi / 16)
                   for n in range(8)] for k in range(8)])

# YCbCr inverse coefficients (ITU T.871) — ONE set of constants shared
# by the 3-component emit path and the YCCK branch in _reconstruct
_CR_R, _CB_G, _CR_G, _CB_B = 1.402, 0.344136, 0.714136, 1.772


class _Huff:
    """Canonical huffman table from a DHT segment (T.81 Annex C),
    compiled to a flat 16-bit lookup table: lut16[next16bits] =
    (symbol << 5) | code_length, 0 = no code. Max code length is 16,
    so one peek + one list index resolves any symbol — no per-bit tree
    walk. Compilation is LAZY (first use in a scan): the table costs
    65536 slots, and an eager build would let a crafted stream of tiny
    DHT segments buy ~1 ms per ~20 bytes — with the 100-scan cap the
    lazy build is bounded at ~8 tables per scan."""

    __slots__ = ("counts", "values", "_lut16")

    def __init__(self, counts: bytes, values: bytes):
        if sum(counts) > len(values):
            raise _err("jpeg: DHT values truncated")
        self.counts = counts
        self.values = values
        self._lut16 = None

    @property
    def lut16(self) -> list[int]:
        lut = self._lut16
        if lut is None:
            # canonical codes fill the scaled 16-bit space contiguously
            # from 0 (next code's start is always the previous range's
            # end), so the table is a prefix of ranges + invalid zeros
            lut = [0] * 65536
            code = 0
            k = 0
            for ln in range(1, 17):
                shift = 16 - ln
                for _ in range(self.counts[ln - 1]):
                    if code >= (1 << ln):
                        raise _err("jpeg: DHT code table overfull")
                    packed = (self.values[k] << 5) | ln
                    lut[code << shift:(code + 1) << shift] = \
                        [packed] * (1 << shift)
                    code += 1
                    k += 1
                code <<= 1
            self._lut16 = lut
        return lut


class _BitReader:
    """Entropy-segment bit reader: MSB-first over a pre-unstuffed
    chunk (0xFF00 → 0xFF, chunk ends at any real marker — the caller
    handles RSTn), refilled into an integer accumulator 8 bytes at a
    time instead of per bit. `pos` always tracks the original-buffer
    position of the chunk-ending marker (or EOF), which is what
    `_resync` / `align_and_expect_rst` consume."""

    __slots__ = ("buf", "pos", "acc", "nbits", "data", "dlen", "dpos",
                 "end_is_marker")

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self._load_chunk()

    def _load_chunk(self) -> None:
        buf, pos = self.buf, self.pos
        n = len(buf)
        idx = buf.find(b"\xff", pos)
        while idx != -1 and idx + 1 < n and buf[idx + 1] == 0x00:
            idx = buf.find(b"\xff", idx + 2)
        if idx == -1:
            end, self.end_is_marker = n, False
        else:
            # a marker, or a lone trailing 0xFF (read attempts on it
            # surface as "ended at a marker", like the per-byte reader)
            end, self.end_is_marker = idx, True
        self.data = buf[pos:end].replace(b"\xff\x00", b"\xff")
        self.dlen = len(self.data)
        self.dpos = 0
        self.pos = end

    def _end_err(self):
        if self.end_is_marker:
            return _err("jpeg: entropy data ended at a marker")
        return _err("jpeg: entropy data truncated")

    def _refill(self) -> None:
        d = self.dpos
        avail = self.dlen - d
        if avail >= 8:
            self.acc = (self.acc << 64) | \
                int.from_bytes(self.data[d:d + 8], "big")
            self.nbits += 64
            self.dpos = d + 8
        elif avail > 0:
            self.acc = (self.acc << (avail * 8)) | \
                int.from_bytes(self.data[d:], "big")
            self.nbits += avail * 8
            self.dpos = self.dlen

    def bit(self) -> int:
        nb = self.nbits
        if nb == 0:
            self._refill()
            nb = self.nbits
            if nb == 0:
                raise self._end_err()
        nb -= 1
        v = self.acc >> nb
        self.acc &= (1 << nb) - 1
        self.nbits = nb
        return v

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        nb = self.nbits
        if nb < n:
            self._refill()
            nb = self.nbits
            if nb < n:
                raise self._end_err()
        nb -= n
        v = self.acc >> nb
        self.acc &= (1 << nb) - 1
        self.nbits = nb
        return v

    def huff(self, lut: list[int]) -> int:
        """Decode one symbol against a compiled `_Huff.lut16` list."""
        nb = self.nbits
        if nb < 16:
            self._refill()
            nb = self.nbits
        if nb >= 16:
            code = (self.acc >> (nb - 16)) & 0xFFFF
        else:
            code = (self.acc << (16 - nb)) & 0xFFFF  # zero-pad peek
        e = lut[code]
        ln = e & 31
        if ln == 0:
            if nb >= 16:
                raise _err("jpeg: invalid huffman code")
            raise self._end_err()       # ran out mid-code
        if ln > nb:
            raise self._end_err()       # matched only via pad bits
        nb -= ln
        self.acc &= (1 << nb) - 1
        self.nbits = nb
        return e >> 5

    def align_and_expect_rst(self, n: int) -> None:
        """Byte-align and consume the next RSTn marker (T.81 E.2.4).
        Unconsumed pad before the marker: partial-byte pad bits are
        dropped; whole unconsumed bytes must be 0xFF (a stuffed
        0xFF 0x00 pad unstuffs to that; anything else is not pad);
        bare 0xFF fill bytes sit past the chunk end and are skipped."""
        nb = self.nbits & ~7
        self.acc &= (1 << nb) - 1
        if self.acc != (1 << nb) - 1 or \
                self.data[self.dpos:] != b"\xff" * (self.dlen - self.dpos):
            raise _err("jpeg: missing restart marker")
        buf, p = self.buf, self.pos
        if not self.end_is_marker:
            raise _err("jpeg: missing restart marker")
        while p + 2 < len(buf) and buf[p + 1] == 0xFF:
            p += 1                                   # 0xFF fill bytes
        if p + 2 > len(buf) or buf[p] != 0xFF \
                or buf[p + 1] != 0xD0 + (n & 7):
            raise _err("jpeg: missing restart marker")
        self.pos = p + 2
        self.acc = 0
        self.nbits = 0
        self._load_chunk()


def _extend(v: int, size: int) -> int:
    """DIFF/AC amplitude decode (T.81 F.12): `size` magnitude bits,
    top bit 0 means negative (offset binary)."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _resync(buf: bytes, pos: int) -> int:
    """Position of the next marker after a progressive scan's entropy
    data: skips pad bits/bytes and stuffed 0xFF 0x00 pairs — any 0xFF
    followed by a non-zero byte IS a marker (T.81 B.1.1.2)."""
    while pos + 1 < len(buf):
        if buf[pos] == 0xFF and buf[pos + 1] != 0x00:
            return pos
        pos += 1
    raise _err("jpeg: truncated after scan")


def _geometry(frame) -> tuple[int, int, int, int]:
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    return hmax, vmax, mcux, mcuy


def _ni_blocks(frame, c, hmax, vmax) -> tuple[int, int]:
    """Non-interleaved block grid (T.81 A.2.2): raster over the
    component's OWN downsampled dimensions ceil(w*h_i/hmax) x
    ceil(h*v_i/vmax), one 8x8 unit per MCU."""
    cw = -(-frame["w"] * c["h"] // hmax)
    ch = -(-frame["h"] * c["v"] // vmax)
    return -(-ch // 8), -(-cw // 8)              # (nby, nbx)


def _scan_mcus(frame, scomps):
    """Shared MCU enumeration for full-band sequential and progressive
    DC scans: (total_mcus, blocks(m)) where blocks(m) lists the
    (scan_index, comp_index, block_y, block_x) units of MCU m — one
    block per MCU in raster order over the component's own grid for a
    single-component (non-interleaved, T.81 A.2.2) scan, else the
    frame MCU grid with each scan component's v x h blocks in SOS
    order."""
    comps = frame["comps"]
    hmax, vmax, mcux, mcuy = _geometry(frame)
    if len(scomps) == 1:
        ci0 = scomps[0][0]
        nby, nbx = _ni_blocks(frame, comps[ci0], hmax, vmax)

        def blocks(m):
            return [(0, ci0, m // nbx, m % nbx)]

        return nby * nbx, blocks

    def blocks(m):
        my, mx = divmod(m, mcux)
        out = []
        for si, (ci, _, _) in enumerate(scomps):
            c = comps[ci]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    out.append((si, ci, my * c["v"] + by,
                                mx * c["h"] + bx))
        return out

    return mcux * mcuy, blocks


def _alloc_coefs(frame) -> list[np.ndarray]:
    """ZIGZAG-order coefficient grids, one (nby, nbx, 64) int32 array
    per component at the interleaved (MCU-padded) block counts —
    progressive scans refine these across the whole stream; the
    byte-budget check at SOF bounds the allocation. _reconstruct
    permutes to natural order slab-by-slab."""
    _, _, mcux, mcuy = _geometry(frame)
    return [np.zeros((mcuy * c["v"], mcux * c["h"], 64), np.int32)
            for c in frame["comps"]]


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Huffman JPEG (baseline, extended-sequential, or progressive) →
    (H, W) gray or (H, W, 3) RGB uint8. Raises PixelDecodeError
    (reason included) for anything outside the documented scope or
    malformed streams."""
    if buf[:2] != b"\xff\xd8":
        raise _err("jpeg: bad SOI")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    frame = None
    coefs = None
    scans_done = 0
    seq_scanned: set[int] = set()
    restart_interval = 0
    adobe = None                # APP14 ColorTransform byte, if present
    while pos + 2 <= len(buf):
        if buf[pos] != 0xFF:
            raise _err("jpeg: lost marker sync")
        # 0xFF fill bytes before a marker are legal padding
        # (T.81 B.1.1.2): the marker code is the first non-FF byte
        while pos + 1 < len(buf) and buf[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(buf):
            raise _err("jpeg: truncated at marker")
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xD8 or (0xD0 <= marker <= 0xD7) or marker == 0x01:
            continue
        if marker == 0xD9:                       # EOI
            # progressive streams normally end here; a sequential
            # stream missing components reconstructs leniently with
            # the absent planes flat (zero coefficients)
            if frame is not None and scans_done:
                return _reconstruct(frame, coefs, qt, adobe)
            raise _err("jpeg: EOI before scan")
        if pos + 2 > len(buf):
            raise _err("jpeg: truncated segment")
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
        elif marker in (0xC0, 0xC1, 0xC2):               # SOF0/SOF1/SOF2
            if frame is not None:
                raise _err("jpeg: multiple SOF frames")
            if len(seg) < 6:
                raise _err("jpeg: SOF truncated")
            prec, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if len(seg) < 6 + 3 * ncomp:
                raise _err("jpeg: SOF truncated")
            if prec not in (8, 12):
                raise _err(f"jpeg: {prec}-bit precision unsupported")
            if h == 0 or w == 0:
                raise _err("jpeg: bad dimensions")
            if ncomp not in (1, 3, 4):
                raise _err(f"jpeg: {ncomp} components unsupported")
            if prec == 12 and ncomp == 4:
                raise _err("jpeg: 12-bit 4-component unsupported")
            from .pixels import MAX_PIXELS

            # the decode budget is BYTES, not pixels: every component
            # costs an int32 coefficient grid plus float64 IDCT
            # intermediates (8 B/sample worst case), so a 3-component
            # frame weighs 3x a grayscale one — a flat pixel cap would
            # admit a crafted 8000x8000x3 header that zero-fills ~1.5
            # GB before any entropy decode can fail
            if w * h * ncomp * 8 > 4 * MAX_PIXELS:
                raise _err(f"jpeg: {w}x{h}x{ncomp} exceeds the decode "
                           "byte budget")
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
            frame = {"w": w, "h": h, "comps": comps, "prec": prec,
                     "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise _err(f"jpeg: SOF{marker - 0xC0} coding unsupported")
        elif marker == 0xDD:                             # DRI
            if len(seg) < 2:
                raise _err("jpeg: DRI truncated")
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xEE:                             # APP14 (Adobe)
            # "Adobe" + version(2) + flags0(2) + flags1(2) + transform:
            # the transform byte disambiguates 4-component color
            # (0 = CMYK as-coded, 2 = YCCK)
            if len(seg) >= 12 and seg[:5] == b"Adobe":
                adobe = seg[11]
        elif marker == 0xDA:                             # SOS
            if frame is None:
                raise _err("jpeg: SOS before SOF")
            if len(seg) < 1:
                raise _err("jpeg: SOS truncated")
            ns = seg[0]
            if not 1 <= ns <= 4:
                # T.81 B.2.3 bounds Ns to 1..4; Ns=0 in particular
                # would sweep every MCU per ~14-byte scan while adding
                # nothing to coverage — an unbounded-CPU hole
                raise _err(f"jpeg: {ns} components in scan")
            if len(seg) < 1 + 2 * ns + 3:
                raise _err("jpeg: SOS truncated")
            comps = frame["comps"]
            by_id = {c["id"]: i for i, c in enumerate(comps)}
            scomps = []                 # (comp_idx, dc_tid, ac_tid)
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                ci = by_id.get(cid)
                if ci is None:
                    raise _err("jpeg: SOS references unknown component")
                if any(s[0] == ci for s in scomps):
                    raise _err("jpeg: duplicate component in SOS")
                scomps.append((ci, tabs >> 4, tabs & 0x0F))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0x0F
            if coefs is None:
                coefs = _alloc_coefs(frame)
            data_pos = pos + seg_len
            if not frame["progressive"]:
                if (ss, se, ah, al) != (0, 63, 0, 0):
                    raise _err("jpeg: bad sequential scan header")
                # sequential frames may split components across scans
                # (T.81 A.2) — each component coded exactly once
                for ci, _, _ in scomps:
                    if ci in seq_scanned:
                        raise _err("jpeg: component scanned twice in "
                                   "sequential mode")
                    seq_scanned.add(ci)
                scans_done += 1
                r = _decode_baseline_scan(buf, data_pos, frame, scomps,
                                          coefs, huff_dc, huff_ac,
                                          restart_interval)
                if len(seq_scanned) == len(comps):
                    return _reconstruct(frame, coefs, qt, adobe)
                pos = _resync(buf, r.pos)
                continue
            # progressive scan (T.81 Annex G): spectral band Ss..Se,
            # successive-approximation step Ah -> Al
            if al > 13 or ah > 13:
                raise _err("jpeg: progressive point transform out of "
                           "range")
            if ah != 0 and ah != al + 1:
                raise _err("jpeg: progressive successive approximation "
                           "must refine one bit at a time")
            r = _BitReader(buf, data_pos)
            if ss == 0:
                if se != 0:
                    raise _err("jpeg: progressive scan header invalid "
                               "(DC band must be Ss=Se=0)")
                _decode_dc_scan(r, frame, scomps, ah, al, coefs,
                                huff_dc, restart_interval)
            else:
                if ns != 1:
                    raise _err("jpeg: progressive AC scan must be "
                               "single-component")
                if se > 63 or ss > se:
                    raise _err("jpeg: progressive spectral band invalid")
                _decode_ac_scan(r, frame, scomps[0], ss, se, ah, al,
                                coefs, huff_ac, restart_interval)
            scans_done += 1
            # a crafted stream of tiny EOB-run scans buys a full block
            # sweep per ~20 bytes — unbounded CPU with no side-drop
            # (the classic progressive-JPEG DoS class). Real encoders
            # emit ~6-12 scans; 100 is generous headroom.
            if scans_done > 100:
                raise _err("jpeg: more than 100 progressive scans")
            pos = _resync(buf, r.pos)
            continue
        # all other segments (APPn, COM, ...) skip
        pos += seg_len
    raise _err("jpeg: no scan found")


def _decode_baseline_scan(buf, pos, frame, scomps, coefs, huff_dc,
                          huff_ac, restart_interval) -> _BitReader:
    """Sequential scan (T.81 F.2): full-band DC+AC per block,
    components in SOS order within each MCU (T.81 B.2.3 — the scan
    header, not SOF, defines the interleave order). An Ns=1 scan is
    NON-interleaved (A.2.2): one block per MCU in raster order over
    the component's own downsampled grid — sequential frames may code
    each component in its own scan."""
    tabs = []
    for ci, dct_t, act_t in scomps:
        if dct_t not in huff_dc or act_t not in huff_ac:
            raise _err("jpeg: missing huffman table for scan")
        tabs.append((huff_dc[dct_t].lut16, huff_ac[act_t].lut16))
    total, blocks_of = _scan_mcus(frame, scomps)
    # coded coefficients accumulate in Python lists and scatter into
    # the int32 grids in batches — one fancy-index store per ~64k
    # coefficients instead of a numpy scalar store per coefficient.
    # The bounded flush keeps the transient at a few MB regardless of
    # how dense a crafted stream codes the blocks.
    nbxs = [g.shape[1] for g in coefs]
    flats = [g.reshape(-1) for g in coefs]
    idxs: list[list[int]] = [[] for _ in coefs]
    vals: list[list[int]] = [[] for _ in coefs]

    def flush(ci: int) -> None:
        flats[ci][np.array(idxs[ci], np.int64)] = \
            np.array(vals[ci], np.int64)
        idxs[ci].clear()
        vals[ci].clear()

    r = _BitReader(buf, pos)
    pred = [0] * len(scomps)
    rst = 0
    # T.81 Table F.1: DC DIFF categories reach 11 for 8-bit samples,
    # 15 for 12-bit
    dc_cap = 11 if frame["prec"] == 8 else 15
    for m in range(total):
        if restart_interval and m and m % restart_interval == 0:
            r.align_and_expect_rst(rst)
            rst = (rst + 1) & 7
            pred = [0] * len(scomps)
        for si, ci, by, bx in blocks_of(m):
            dc_lut, ac_lut = tabs[si]
            base = (by * nbxs[ci] + bx) * 64
            ix, vx = idxs[ci], vals[ci]
            size = r.huff(dc_lut)
            if size > dc_cap:
                raise _err("jpeg: bad DC size")
            p = pred[si] + _extend(r.bits(size), size)
            pred[si] = p
            # a crafted stream can drift the predictor past int32; the
            # batched scatter below would silently wrap where a scalar
            # store raised OverflowError — side-drop explicitly
            if not -2147483648 <= p <= 2147483647:
                raise _err("jpeg: DC coefficient out of range")
            ix.append(base)
            vx.append(p)
            k = 1
            while k < 64:
                rs = r.huff(ac_lut)
                run, size = rs >> 4, rs & 0x0F
                if size == 0:
                    if run == 15:      # ZRL: 16 zeros
                        k += 16
                        continue
                    break              # EOB
                k += run
                if k > 63:
                    raise _err("jpeg: AC run past block")
                ix.append(base + k)
                vx.append(_extend(r.bits(size), size))
                k += 1
            if len(ix) >= 65536:
                flush(ci)
    for ci in range(len(coefs)):
        if idxs[ci]:
            flush(ci)
    return r


def _decode_dc_scan(r, frame, scomps, ah, al, coefs, huff_dc,
                    restart_interval) -> None:
    """Progressive DC scan (T.81 G.1.2.1): first scan (Ah=0) DIFF-codes
    the point-transformed DC values; refinement scans (Ah>0) append one
    raw bit per block at position Al."""
    tabs = []
    for ci, dct_t, _ in scomps:
        if ah == 0:
            if dct_t not in huff_dc:
                raise _err("jpeg: missing huffman table for scan")
            tabs.append(huff_dc[dct_t].lut16)
        else:
            tabs.append(None)      # refinement is raw bits, no table
    total, blocks_of = _scan_mcus(frame, scomps)
    # batched like the sequential scan: DC positions/values collect in
    # Python lists (bounded at one entry per block) and scatter once
    nbxs = [g.shape[1] for g in coefs]
    idxs: list[list[int]] = [[] for _ in coefs]
    vals: list[list[int]] = [[] for _ in coefs]
    pred = [0] * len(scomps)
    rst = 0
    dc_cap = 11 if frame["prec"] == 8 else 15   # T.81 Table F.1
    for m in range(total):
        if restart_interval and m and m % restart_interval == 0:
            r.align_and_expect_rst(rst)
            rst = (rst + 1) & 7
            pred = [0] * len(scomps)
        for si, ci, by, bx in blocks_of(m):
            if ah == 0:
                size = r.huff(tabs[si])
                if size > dc_cap:
                    raise _err("jpeg: bad DC size")
                pred[si] += _extend(r.bits(size), size)
                v = pred[si] << al
                # a crafted stream can drift the predictor without
                # bound; the int32 scatter would silently wrap where a
                # scalar store raised OverflowError
                if not -2147483648 <= v <= 2147483647:
                    raise _err("jpeg: DC coefficient out of range")
                idxs[ci].append((by * nbxs[ci] + bx) * 64)
                vals[ci].append(v)
            else:
                if r.bit():
                    idxs[ci].append((by * nbxs[ci] + bx) * 64)
    for ci, g in enumerate(coefs):
        if idxs[ci]:
            ia = np.array(idxs[ci], np.int64)
            if ah == 0:
                g.reshape(-1)[ia] = np.array(vals[ci], np.int64)
            else:
                g.reshape(-1)[ia] |= np.int32(1 << al)


def _decode_ac_scan(r, frame, scomp, ss, se, ah, al, coefs, huff_ac,
                    restart_interval) -> None:
    """Progressive AC scan over one component's band Ss..Se. First
    scans (Ah=0, T.81 G.1.2.2) code point-transformed coefficients
    with EOB-run codes; refinement scans (Ah>0, G.1.2.3) emit one
    correction bit per already-nonzero coefficient and insert newly
    nonzero ones as ±1<<Al."""
    ci, _, act_t = scomp
    c = frame["comps"][ci]
    hmax, vmax, _, _ = _geometry(frame)
    nby, nbx = _ni_blocks(frame, c, hmax, vmax)
    tab = huff_ac.get(act_t)
    if tab is None:
        raise _err("jpeg: missing huffman table for scan")
    lut = tab.lut16
    grid = coefs[ci]
    p1, m1 = 1 << al, -(1 << al)
    eobrun = 0
    rst = 0
    # the scan rasters the component's NON-interleaved (nby, nbx) block
    # grid, but the coefficient array is allocated at the MCU-padded
    # counts — its row stride (gnbx) can be wider than nbx, so flat
    # indices must go through the 2D position, not m directly
    gnbx = grid.shape[1]
    if ah == 0:
        # first scans write sparse coefficients: collect (flat index,
        # value) in Python lists and scatter in bounded batches — the
        # zigzag-order grid makes the band index the grid index
        flat = grid.reshape(-1)
        ix: list[int] = []
        vx: list[int] = []
        for m in range(nby * nbx):
            if restart_interval and m and m % restart_interval == 0:
                r.align_and_expect_rst(rst)
                rst = (rst + 1) & 7
                eobrun = 0
            if eobrun:
                eobrun -= 1
                continue
            base = ((m // nbx) * gnbx + m % nbx) * 64
            k = ss
            while k <= se:
                rs = r.huff(lut)
                run, size = rs >> 4, rs & 0x0F
                if size == 0:
                    if run == 15:                  # ZRL: 16 zeros
                        k += 16
                        continue
                    eobrun = (1 << run) - 1        # EOBn: this block +
                    if run:                        # 2^run-1+ext more
                        eobrun += r.bits(run)
                    break
                k += run
                if k > se:
                    raise _err("jpeg: AC run past band")
                ix.append(base + k)
                vx.append(_extend(r.bits(size), size) << al)
                k += 1
            if len(ix) >= 65536:
                flat[np.array(ix, np.int64)] = np.array(vx, np.int64)
                ix.clear()
                vx.clear()
        if ix:
            flat[np.array(ix, np.int64)] = np.array(vx, np.int64)
        return
    # refinement scans read every in-band coefficient: one C-level
    # tolist/writeback per block instead of a numpy scalar read per
    # coefficient (the write-back only happens when a bit landed)
    blocks = grid.reshape(-1, 64)
    for m in range(nby * nbx):
        if restart_interval and m and m % restart_interval == 0:
            r.align_and_expect_rst(rst)
            rst = (rst + 1) & 7
            eobrun = 0
        gm = (m // nbx) * gnbx + m % nbx
        bl = blocks[gm].tolist()
        changed = False
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = r.huff(lut)
                run, size = rs >> 4, rs & 0x0F
                val = 0
                if size == 0:
                    if run != 15:
                        eobrun = 1 << run          # incl. this block's
                        if run:                    # correction sweep
                            eobrun += r.bits(run)
                        break
                    # run == 15: ZRL — skip 16 zero-history coefficients
                else:
                    if size != 1:
                        raise _err("jpeg: bad AC refinement magnitude")
                    val = p1 if r.bit() else m1
                # advance: already-nonzero coefficients take a
                # correction bit; zero-history ones consume the run
                while k <= se:
                    cur = bl[k]
                    if cur != 0:
                        if r.bit() and (cur & p1) == 0:
                            bl[k] = cur + (p1 if cur >= 0 else m1)
                            changed = True
                    else:
                        if run == 0:
                            break
                        run -= 1
                    k += 1
                if val != 0:
                    if k > se:
                        raise _err("jpeg: AC refinement run past band")
                    bl[k] = val
                    changed = True
                k += 1
        if eobrun:
            # within an EOB run each block still carries correction
            # bits for its remaining nonzero coefficients
            while k <= se:
                cur = bl[k]
                if cur != 0:
                    if r.bit() and (cur & p1) == 0:
                        bl[k] = cur + (p1 if cur >= 0 else m1)
                        changed = True
                k += 1
            eobrun -= 1
        if changed:
            blocks[gm] = bl


def _reconstruct(frame, coefs, qt, adobe=None) -> np.ndarray:
    """Dequantize + inverse-DCT the accumulated coefficient grids and
    assemble the image: batched matmul IDCT per component (every 8x8
    block at once, BLAS-dispatched), replicate-upsample subsampled
    chroma, crop the MCU padding, then color per the APP14 transform
    byte (`adobe`): 3 components → YCbCr inverse, or pass-through for
    transform 0 (Adobe RGB-coded); 4 components → CMYK/YCCK composite
    with the inverted-ink convention."""
    comps = frame["comps"]
    w, h = frame["w"], frame["h"]
    hmax, vmax, _, _ = _geometry(frame)
    # 12-bit frames (SOF1/SOF2 extended precision) reconstruct at
    # their own scale (level shift 2048, clip 0..4095) and reduce to
    # the uint8 HIGH nibble at the end — the same high-bits convention
    # the PNG 16-bit and WAV 24-bit paths use
    prec = frame.get("prec", 8)
    mid = 128.5 if prec == 8 else 2048.5
    maxv = 255.0 if prec == 8 else 4095.0
    center = 128.0 if prec == 8 else 2048.0

    def narrow(t):
        # in place: 12-bit sample plane -> uint8 high nibble
        if prec != 8:
            t *= 0.0625
            np.floor(t, out=t)
        return t

    out_planes = []
    for ci, c in enumerate(comps):
        if c["tq"] not in qt:
            raise _err(f"jpeg: missing quant table {c['tq']}")
        q = qt[c["tq"]]
        arr = coefs[ci]
        nby, nbx = arr.shape[:2]
        # batched IDCT: @ broadcasts over the leading block dims and
        # dispatches to BLAS (einsum's greedy path never does for
        # 8-wide contractions — measured ~400x slower). Chunked by
        # block-rows into a preallocated plane so the float64
        # temporaries stay slab-sized: peak ≈ coefficient grid
        # (4 B/sample) + plane (8 B/sample), not 3 full-frame float64
        # arrays live at once
        plane = np.empty((nby * 8, nbx * 8), np.float64)
        rows = max(1, 32768 // max(1, nbx))      # ~2M samples per slab
        for y0 in range(0, nby, rows):
            # grids are zigzag-ordered (see _alloc_coefs): permute to
            # natural order here, once per slab, vectorized
            sl = arr[y0:y0 + rows].take(_INVZ, axis=-1) \
                .astype(np.float64).reshape(-1, nbx, 8, 8)
            sl *= q
            sl = _DCT.T @ sl @ _DCT
            plane[y0 * 8:(y0 + rows) * 8] = \
                np.ascontiguousarray(sl.transpose(0, 2, 1, 3)) \
                .reshape(-1, nbx * 8)
        coefs[ci] = None
        del arr
        plane += mid                   # level shift, +0.5 for the
        np.floor(plane, out=plane)     # round-half-up floor
        np.clip(plane, 0, maxv, out=plane)
        # replicate-upsample to full resolution, crop padding (repeat
        # at factor 1 still copies the full plane — skip the no-op)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1:
            plane = plane.repeat(ry, axis=0)
        if rx > 1:
            plane = plane.repeat(rx, axis=1)
        out_planes.append(plane[:h, :w])
    if len(comps) == 1:
        return narrow(out_planes[0]).astype(np.uint8)
    if len(comps) == 4:
        # Adobe 4-component color (APP14): samples are stored with the
        # Adobe INVERTED-ink convention (255 = no ink). transform 2
        # (YCCK) runs the standard YCbCr inverse to recover the
        # inverted C'M'Y'; transform 0 (or a missing APP14 — libjpeg's
        # assumption for 4-component frames, and in practice these
        # files all come from Adobe tooling) codes C'M'Y'K' directly.
        # RGB = channel' * K' / 255, round-half-up like every other
        # sample path here. Buffer discipline matches the 3-component
        # path: one scratch plane + in-place ops, no full-frame temps.
        c0, c1, c2, k = out_planes
        k *= 1.0 / 255.0                          # K' scaled in place
        out = np.empty((h, w, 3), np.uint8)
        t = np.empty((h, w), np.float64)

        def composite(ch, t=t):
            # t holds the linear inverted channel; finish its rounding,
            # then apply the K composite with its own round-half-up
            t += 0.5
            np.floor(t, out=t)
            np.clip(t, 0, 255, out=t)
            t *= k
            t += 0.5
            np.floor(t, out=t)
            out[..., ch] = t

        if adobe == 2:                            # YCCK
            y4, cb4, cr4 = c0, c1, c2
            cb4 -= 128.0
            cr4 -= 128.0
            np.multiply(cr4, _CR_R, out=t)
            t += y4
            composite(0)
            np.multiply(cb4, -_CB_G, out=t)
            cr4 *= _CR_G                          # cr4 consumed here
            t -= cr4
            t += y4
            composite(1)
            np.multiply(cb4, _CB_B, out=cb4)      # cb4 consumed here
            np.add(cb4, y4, out=t)
            composite(2)
        else:                                     # direct C'M'Y'K'
            for ch, p in enumerate((c0, c1, c2)):
                # planes are already floored/clipped samples; skip the
                # first rounding and apply only the K composite
                np.multiply(p, k, out=t)
                t += 0.5
                np.floor(t, out=t)
                out[..., ch] = t
        return out
    if adobe == 0:
        # APP14 transform 0 on a 3-component frame: the components are
        # coded RGB directly (Adobe tooling emits these) — running the
        # YCbCr inverse here would silently scramble the colors
        out = np.empty((h, w, 3), np.uint8)
        for ch, p in enumerate(out_planes):
            out[..., ch] = narrow(p)
        return out
    y, cb, cr = out_planes
    cb = cb - center
    cr = cr - center
    out = np.empty((h, w, 3), np.uint8)
    t = np.empty((h, w), np.float64)   # reused per channel

    def emit(ch, t=t):
        t += y
        t += 0.5
        np.floor(t, out=t)
        np.clip(t, 0, maxv, out=t)
        out[..., ch] = narrow(t)

    np.multiply(cr, _CR_R, out=t)
    emit(0)
    np.multiply(cb, -_CB_G, out=t)
    t -= _CR_G * cr
    emit(1)
    np.multiply(cb, _CB_B, out=t)
    emit(2)
    return out
