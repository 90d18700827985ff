"""Real pixel decode/resize for image binary columns — pure stdlib +
numpy, no image libraries.

The container has no PIL/opencv, but that never blocked PIXELS for the
formats whose codecs the stdlib already ships: PNG is zlib (stdlib)
plus five byte-level scanline filters (public spec, RFC 2083 /
ISO 15948), and uncompressed BMP is a raw pixel grid behind the DIB
header multimodal.parse_image_header already walks. This module
implements both ends to the spec — a CRC-verifying PNG reader (all
five filters, gray/RGB/RGBA/gray+alpha, palette at depths 1/2/4/8,
sub-byte grayscale, Adam7 de-interlacing, 16-bit reduced to the 8-bit
high-byte view with tRNS keys matched at full 16-bit precision), a
BMP reader (BI_RGB 24/32-bit truecolor plus 1/4/8-bit palettized and
RLE8/RLE4 compressed, top-down and bottom-up), a first-frame GIF
reader (pure-Python LZW per the
public GIF89a spec appendix F, interlace, local color tables,
transparency → alpha, sub-rectangle compositing), a deterministic PNG
writer (for thumbnail output and byte-stable fixtures), and numpy
nearest/bilinear resize — then wires them into the same Arrow-batched
mapInPandas shape the rest of the multimodal lane uses
(operators/multimodal.py), with the injector's malformed-record
side-drop idiom: undecodable rows carry a reason, the batch never
fails. JPEG decode — baseline, extended-sequential, AND progressive
(huffman + dequant + IDCT + YCbCr, ITU T.81 incl. Annex G) — lives in
the sibling operators/jpeg_codec.py and rides the same dispatch, as
does WebP VP8L lossless decode (RFC 9649 §5, operators/webp_codec.py —
stills, VP8X layouts, and first frames of VP8L-coded animations);
out-of-scope encodings (arithmetic-coded JPEG, lossy VP8 still or
animated, JPEG-in-TIFF/CCITT/tiled TIFF) side-drop with a reason.

100 TB design: decode runs where the bytes already are — one Python
worker per core per executor, Arrow batch at a time, no shuffle (the
kernels are row-local projections). Python-loop filters (Average/Paeth
rows) make this a correctness-first decoder; a production deployment
at full pixel volume swaps `_decode_png`'s unfilter loop for a native
codec behind the SAME column contract, which is the part that matters
at plan level. Sub/Up/None filters — what our own writer and most
encoders' default heuristics emit for synthetic corpora — are fully
vectorized.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .multimodal import _PNG_SIG, parse_exif_orientation


class PixelDecodeError(ValueError):
    """Raised with a human-readable reason; the Spark kernels convert
    it into the side-drop reason column instead of failing the batch."""


# Header-declared dimensions cap every allocation: a ~100-byte crafted
# file can otherwise declare 65535x65535 and OOM-kill the executor
# BEFORE any decode error can fire — a process kill is not a catchable
# side-drop. 64 MP ≈ 256 MB of RGBA, comfortably inside a worker.
MAX_PIXELS = 64_000_000


# --- PNG reader -------------------------------------------------------------

# color type → samples per pixel (before palette expansion)
_PNG_SAMPLES = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunks(buf: bytes) -> Iterator[tuple[bytes, bytes]]:
    pos = 8
    while pos + 8 <= len(buf):
        (length,) = struct.unpack(">I", buf[pos:pos + 4])
        ctype = buf[pos + 4:pos + 8]
        data = buf[pos + 8:pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(buf):
            raise PixelDecodeError("png: truncated chunk")
        (crc,) = struct.unpack(
            ">I", buf[pos + 8 + length:pos + 12 + length])
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise PixelDecodeError(f"png: bad CRC in {ctype!r}")
        yield ctype, data
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise PixelDecodeError("png: no IEND")


def _unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline filters (spec §6): returns (h, stride)
    uint8. None/Up are whole-row numpy (uint8 wraps = the spec's
    mod-256); Sub is an exact per-lane prefix sum mod 256; Average and
    Paeth carry a left-neighbor dependency and run as per-byte loops."""
    if len(raw) != h * (stride + 1):
        raise PixelDecodeError("png: decompressed size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        line = np.frombuffer(raw, np.uint8, count=stride,
                             offset=pos + 1).copy()
        pos += stride + 1
        if ft == 0:
            rec = line
        elif ft == 1:  # Sub: recon[x] = filt[x] + recon[x-bpp]
            rec = line
            for c in range(bpp):   # prefix sum per byte lane, mod 256
                lane = rec[c::bpp]
                rec[c::bpp] = np.cumsum(lane, dtype=np.uint64) & 0xFF
        elif ft == 2:  # Up
            rec = line + prev      # uint8 addition wraps mod 256
        elif ft == 3:  # Average
            rec = line
            for x in range(stride):
                left = int(rec[x - bpp]) if x >= bpp else 0
                rec[x] = (int(rec[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            rec = line
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (int(rec[x]) + pr) & 0xFF
        else:
            raise PixelDecodeError(f"png: unknown filter type {ft}")
        out[y] = rec
        prev = rec
    return out


def _expand_subbyte(rows: np.ndarray, depth: int, width: int) -> np.ndarray:
    """(h, stride_bytes) packed MSB-first samples → (h, width) sample
    values (spec §7.2: pixels packed high-bit-first, rows padded to a
    byte boundary)."""
    bits = np.unpackbits(rows, axis=1)[:, :width * depth]
    weights = 1 << np.arange(depth - 1, -1, -1)
    return bits.reshape(rows.shape[0], width, depth).dot(weights) \
        .astype(np.uint8)


# Adam7 pass grid (spec §8.2): x-origin, y-origin, x-step, y-step.
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _rows_to_samples(rows: np.ndarray, wp: int, depth: int,
                     samples: int) -> np.ndarray:
    """(hp, stride) unfiltered bytes → (hp, wp, samples) uint8 RAW
    sample values: 16-bit reduces to the high byte (the standard 8-bit
    view), sub-byte depths unpack MSB-first (always 1 sample/pixel)."""
    hp = rows.shape[0]
    if depth == 8:
        return rows.reshape(hp, wp, samples)
    if depth == 16:
        return rows.reshape(hp, wp, samples, 2)[..., 0]
    return _expand_subbyte(rows, depth, wp).reshape(hp, wp, 1)


def _rows_to_samples16(rows: np.ndarray, wp: int,
                       samples: int) -> np.ndarray:
    """(hp, stride) unfiltered bytes of a 16-bit raster → (hp, wp,
    samples) uint16 FULL sample values (big-endian pairs) — needed
    only to match a 16-bit tRNS key exactly before the 8-bit
    reduction."""
    hp = rows.shape[0]
    v = rows.reshape(hp, wp, samples, 2).astype(np.uint16)
    return (v[..., 0] << 8) | v[..., 1]


def decode_png(buf: bytes) -> np.ndarray:
    """PNG bytes → (H, W, C) uint8, C ∈ {1, 2, 3, 4} (gray, gray+alpha,
    RGB, RGBA; palette expands to RGB, or RGBA when a tRNS chunk is
    present). CRC-verified per chunk; Adam7 interlace is de-interlaced;
    16-bit samples reduce to the high byte (the standard 8-bit view);
    a tRNS key on a 16-bit image is matched against the FULL 16-bit
    samples before the reduction. Raises PixelDecodeError with the reason
    for anything outside the supported subset, as for any corruption."""
    if buf[:8] != _PNG_SIG:
        raise PixelDecodeError("png: bad signature")
    ihdr = None
    plte = trns = None
    idat = bytearray()
    for ctype, data in _chunks(buf):
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"tRNS":
            trns = data
        elif ctype == b"IDAT":
            idat.extend(data)
    if ihdr is None or len(ihdr) != 13:
        raise PixelDecodeError("png: missing IHDR")
    w, h, depth, ctype_n, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr)
    if not (0 < w < 1 << 24 and 0 < h < 1 << 24):
        raise PixelDecodeError("png: bad dimensions")
    if comp != 0 or filt != 0:
        raise PixelDecodeError("png: unknown compression/filter method")
    if interlace not in (0, 1):
        raise PixelDecodeError(f"png: unknown interlace {interlace}")
    if ctype_n not in _PNG_SAMPLES:
        raise PixelDecodeError(f"png: unknown color type {ctype_n}")
    ok_depths = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
                 4: (8, 16), 6: (8, 16)}[ctype_n]
    if depth not in ok_depths:
        raise PixelDecodeError(
            f"png: depth {depth} invalid for color type {ctype_n}")
    samples = _PNG_SAMPLES[ctype_n]
    # the decode budget is RASTER BYTES, not pixels: 16-bit rasters
    # weigh double, so halve the allowed pixel count there — otherwise
    # a crafted 16-bit file doubles the worst-case memory the cap
    # bounds
    if w * h * (2 if depth == 16 else 1) > MAX_PIXELS:
        raise PixelDecodeError("png: bad dimensions")
    bpp = max(1, samples * depth // 8)
    passes = _ADAM7 if interlace else ((0, 0, 1, 1),)
    plan = []                            # (x0, y0, dx, dy, wp, hp, stride)
    expected = 0
    for x0, y0, dx, dy in passes:
        wp = (w - x0 + dx - 1) // dx if w > x0 else 0
        hp = (h - y0 + dy - 1) // dy if h > y0 else 0
        if wp == 0 or hp == 0:
            continue                     # empty pass (small images)
        stride = (wp * samples * depth + 7) // 8
        plan.append((x0, y0, dx, dy, wp, hp, stride))
        expected += hp * (stride + 1)
    try:
        # bounded inflate: the exact raster size is known from IHDR, so
        # a zlib bomb (KBs inflating to GBs) stops at expected+1 bytes
        # and fails the size check instead of exhausting memory
        raw = zlib.decompressobj().decompress(bytes(idat), expected + 1)
    except zlib.error as ex:
        raise PixelDecodeError(f"png: zlib {ex}") from None
    if len(raw) != expected:
        raise PixelDecodeError("png: decompressed size mismatch")
    # a 16-bit tRNS key must be matched against the FULL 16-bit
    # samples (spec §11.3.2) before the 8-bit reduction
    need16 = depth == 16 and trns is not None and ctype_n in (0, 2)
    vals16 = None
    if not interlace:
        _, _, _, _, wp, hp, stride = plan[0]
        rows = _unfilter(raw, hp, stride, bpp)
        vals = _rows_to_samples(rows, wp, depth, samples)
        if need16:
            vals16 = _rows_to_samples16(rows, wp, samples)
    else:
        # every pixel belongs to exactly one Adam7 pass, so the canvas
        # needs no zero-fill
        vals = np.empty((h, w, samples), np.uint8)  # RAW sample values
        if need16:
            vals16 = np.empty((h, w, samples), np.uint16)
        off = 0
        for x0, y0, dx, dy, wp, hp, stride in plan:
            n = hp * (stride + 1)
            rows = _unfilter(raw[off:off + n], hp, stride, bpp)
            off += n
            vals[y0::dy, x0::dx] = _rows_to_samples(
                rows, wp, depth, samples)
            if need16:
                vals16[y0::dy, x0::dx] = _rows_to_samples16(
                    rows, wp, samples)
    raw_gray = None                      # pre-scale samples for tRNS
    if ctype_n == 0:
        raw_gray = vals[:, :, 0]
        if depth < 8:                    # scale to the full 8-bit range
            arr = (raw_gray.astype(np.uint16)
                   * (255 // ((1 << depth) - 1))).astype(np.uint8) \
                .reshape(h, w, 1)
        else:
            arr = vals
    elif ctype_n == 3:
        arr = vals.reshape(h, w)         # palette indices
    else:
        arr = vals
    if ctype_n == 3:
        if plte is None or len(plte) % 3:
            raise PixelDecodeError("png: palette image without PLTE")
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        idx = arr.reshape(h, w)
        if int(idx.max()) >= pal.shape[0]:
            raise PixelDecodeError("png: palette index out of range")
        rgb = pal[idx]
        if trns is not None:
            if len(trns) > pal.shape[0]:
                raise PixelDecodeError("png: tRNS longer than palette")
            alpha = np.full(pal.shape[0], 255, np.uint8)
            alpha[:len(trns)] = np.frombuffer(trns, np.uint8)
            return np.dstack([rgb, alpha[idx]])
        return rgb
    if trns is not None and ctype_n in (0, 2):
        # tRNS for gray (one key) / truecolor (RGB key): 16-bit
        # big-endian sample values, compared PRE-scaling (spec §11.3.2;
        # for depth ≤ 8 the value lives in the low byte)
        nkeys = 1 if ctype_n == 0 else 3
        if len(trns) < 2 * nkeys:
            raise PixelDecodeError("png: tRNS too short")
        full = [struct.unpack(">H", trns[2 * i:2 * i + 2])[0]
                for i in range(nkeys)]
        if depth == 16:
            # exact 16-bit match on the pre-reduction samples — the
            # high-byte view alone would alias 256 distinct values
            # onto the key
            if ctype_n == 0:
                match = vals16[:, :, 0] == full[0]
            else:
                match = (vals16 == np.array(full, np.uint16)) \
                    .all(axis=2)
        else:
            keys = [k & 0xFF for k in full]
            if ctype_n == 0:
                match = raw_gray == keys[0]
            else:
                match = (arr == np.array(keys, np.uint8)).all(axis=2)
        alpha = np.where(match, 0, 255).astype(np.uint8)
        return np.dstack([arr, alpha])
    return arr


# --- PNG writer (deterministic; thumbnails + fixtures) ----------------------

def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def encode_png(arr: np.ndarray) -> bytes:
    """(H, W) or (H, W, C) uint8 with C ∈ {1, 2, 3, 4} → PNG bytes.
    Filter 0 scanlines + one zlib stream at a fixed level: byte-stable
    across runs (zlib is deterministic for a given level/input), so
    thumbnail re-runs reproduce identical content hashes — the same
    determinism contract as the dataset sinks (sinks/_staging.py)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 2, 3, 4):
        raise ValueError(f"encode_png wants (H,W,C<=4), got {arr.shape}")
    h, w, c = a.shape
    ctype_n = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype_n, 0, 0, 0)
    body = bytearray()
    for y in range(h):
        body.append(0)                      # filter type 0 per scanline
        body.extend(a[y].tobytes())
    return (_PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(body), 6))
            + _chunk(b"IEND", b""))


# --- BMP reader -------------------------------------------------------------

def _bmp_rle(data: bytes, w: int, h: int, four: bool) -> np.ndarray:
    """BI_RLE8/BI_RLE4 expansion (the public BITMAPINFOHEADER spec):
    encoded runs, absolute runs (word-aligned), and the 0-escapes
    end-of-line / end-of-bitmap / delta. Returns (h, w) palette
    indices in STORED (bottom-up) row order; pixels no run covers stay
    index 0, the common renderer behavior. Bounded: every write lands
    inside the (h, w) canvas or raises."""
    out = np.zeros((h, w), np.uint8)
    x = y = i = 0
    while i + 2 <= len(data):
        cnt, val = data[i], data[i + 1]
        i += 2
        if cnt:                              # encoded run
            if y >= h or x + cnt > w:
                raise PixelDecodeError("bmp: RLE run past the row")
            if four:
                pair = np.array([val >> 4, val & 0x0F], np.uint8)
                out[y, x:x + cnt] = np.tile(pair, (cnt + 1) // 2)[:cnt]
            else:
                out[y, x:x + cnt] = val
            x += cnt
            continue
        if val == 0:                         # end of line
            x, y = 0, y + 1
        elif val == 1:                       # end of bitmap
            return out
        elif val == 2:                       # delta
            if i + 2 > len(data):
                raise PixelDecodeError("bmp: RLE delta truncated")
            x += data[i]
            y += data[i + 1]
            i += 2
            if x > w or y > h:
                raise PixelDecodeError("bmp: RLE delta out of bounds")
        else:                                # absolute mode: val pixels
            n = val
            nbytes = (n + 1) // 2 if four else n
            nbytes += nbytes & 1             # runs are word-aligned
            if i + nbytes > len(data):
                raise PixelDecodeError("bmp: RLE absolute truncated")
            if y >= h or x + n > w:
                raise PixelDecodeError("bmp: RLE run past the row")
            chunk = np.frombuffer(data, np.uint8, count=nbytes, offset=i)
            if four:
                nib = np.empty(nbytes * 2, np.uint8)
                nib[0::2] = chunk >> 4
                nib[1::2] = chunk & 0x0F
                out[y, x:x + n] = nib[:n]
            else:
                out[y, x:x + n] = chunk[:n]
            x += n
            i += nbytes
    raise PixelDecodeError("bmp: RLE data ended without end-of-bitmap")


def decode_bmp(buf: bytes) -> np.ndarray:
    """BMP → (H, W, 3) uint8 RGB: uncompressed (BI_RGB) 24/32-bit
    truecolor, palettized 1/4/8-bit, and RLE-compressed palette images
    (BI_RLE8/BI_RLE4) — the full classic BITMAPINFOHEADER surface.
    File order is BGR with rows 4-byte padded, bottom-up unless the
    height is negative (RLE is bottom-up only, per spec). The 4th byte
    of 32-bit BI_RGB pixels is RESERVED, not alpha (alpha needs
    BI_BITFIELDS/V4+ headers, out of scope) — real files zero it, so
    surfacing it would render every thumbnail fully transparent; it is
    dropped, matching what PIL does for this case. Other bit depths
    and compressions raise PixelDecodeError — parse_image_header still
    serves their dims."""
    if len(buf) < 54 or buf[:2] != b"BM":
        raise PixelDecodeError("bmp: bad header")
    (off,) = struct.unpack("<I", buf[10:14])
    (dib,) = struct.unpack("<I", buf[14:18])
    if dib < 40:
        raise PixelDecodeError("bmp: only BITMAPINFOHEADER+ supported")
    w, h_signed = struct.unpack("<ii", buf[18:26])
    bits, comp = struct.unpack("<HI", buf[28:34])
    if (bits, comp) not in ((24, 0), (32, 0), (8, 0), (4, 0), (1, 0),
                            (8, 1), (4, 2)):
        raise PixelDecodeError(
            f"bmp: {bits}-bit compression {comp} unsupported")
    if w <= 0 or h_signed == 0:
        raise PixelDecodeError("bmp: bad dimensions")
    if comp and h_signed < 0:
        raise PixelDecodeError("bmp: RLE bitmaps must be bottom-up")
    h = abs(h_signed)
    if w * h > MAX_PIXELS:
        raise PixelDecodeError(f"bmp: {w}x{h} exceeds the decode "
                               "pixel cap")
    pal = None
    if bits <= 8:
        (clr_used,) = struct.unpack("<I", buf[46:50])
        n_pal = clr_used or (1 << bits)
        if n_pal > 1 << bits:
            raise PixelDecodeError("bmp: palette larger than the "
                                   "index space")
        pal_at = 14 + dib
        if pal_at + 4 * n_pal > len(buf):
            raise PixelDecodeError("bmp: truncated palette")
        pal = np.frombuffer(buf, np.uint8, count=4 * n_pal,
                            offset=pal_at).reshape(n_pal, 4)[:, [2, 1, 0]]
        header_end = pal_at + 4 * n_pal
    else:
        header_end = 14 + dib
    # bfOffBits below the end of the headers would reinterpret header
    # bytes as pixels — plausible-looking garbage instead of a
    # side-drop; reject it like every other malformed case
    if off < header_end or off > len(buf):
        raise PixelDecodeError("bmp: pixel-data offset inside header")
    if comp:                                 # RLE8 / RLE4
        idx = _bmp_rle(buf[off:], w, h, four=comp == 2)[::-1]
    elif bits <= 8:                          # uncompressed palette
        stride = ((w * bits + 31) // 32) * 4
        if off + stride * h > len(buf):
            raise PixelDecodeError("bmp: truncated pixel data")
        rows = np.frombuffer(buf, np.uint8, count=stride * h,
                             offset=off).reshape(h, stride)
        if bits == 8:
            idx = rows[:, :w]
        elif bits == 4:
            nib = np.empty((h, stride * 2), np.uint8)
            nib[:, 0::2] = rows >> 4
            nib[:, 1::2] = rows & 0x0F
            idx = nib[:, :w]
        else:
            idx = np.unpackbits(rows, axis=1)[:, :w]
        if h_signed > 0:                     # bottom-up storage
            idx = idx[::-1]
    else:
        nch = bits // 8
        stride = (w * nch + 3) & ~3
        if off + stride * h > len(buf):
            raise PixelDecodeError("bmp: truncated pixel data")
        rows = np.frombuffer(buf, np.uint8, count=stride * h,
                             offset=off) \
            .reshape(h, stride)[:, :w * nch].reshape(h, w, nch)
        if h_signed > 0:                     # bottom-up storage
            rows = rows[::-1]
        return np.ascontiguousarray(rows[:, :, [2, 1, 0]])  # BGR(X)→RGB
    if int(idx.max()) >= pal.shape[0]:
        raise PixelDecodeError("bmp: palette index out of range")
    return np.ascontiguousarray(pal[idx])


# --- GIF reader (LZW is fully specified in the public GIF89a spec) ---------

def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> bytes:
    """GIF-variant LZW: variable-width codes 3..12 bits, LSB-first bit
    packing, clear/EOI control codes, table grows by one entry per
    emitted code until the 12-bit ceiling (then holds until a clear).
    Returns exactly n_pixels index bytes (spec appendix F)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    table: list[bytes] = []
    tlen = 0                    # == len(table), tracked: the per-code
    n_out = 0                   # loop calls len() ~5x otherwise
    dlen = len(data)
    code_size = min_code_size + 1
    prev: bytes | None = None
    acc = nbits = 0
    pos = 0

    def reset():
        nonlocal table, tlen, code_size, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        tlen = clear + 2
        code_size = min_code_size + 1
        prev = None

    reset()
    while n_out < n_pixels:
        while nbits < code_size:
            if pos >= dlen:
                raise PixelDecodeError("gif: LZW stream truncated")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            reset()
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= clear:
                # first code after clear must be a literal root
                raise PixelDecodeError("gif: bad first LZW code")
            entry = table[code]
        elif code < tlen:
            entry = table[code]
            if tlen < 4096:                # table freezes when full
                table.append(prev + entry[:1])
                tlen += 1
        elif code == tlen and tlen < 4096:  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
            tlen += 1
        else:
            raise PixelDecodeError("gif: LZW code out of range")
        out.extend(entry)
        n_out += len(entry)
        prev = entry
        if tlen == (1 << code_size) and code_size < 12:
            code_size += 1
    if n_out < n_pixels:
        raise PixelDecodeError("gif: LZW ended before raster complete")
    return bytes(out[:n_pixels])


# Adam-style GIF interlace passes: (first row, step) per spec.
_GIF_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(buf: bytes) -> np.ndarray:
    """GIF87a/89a FIRST frame → (H, W, 3) uint8, or (H, W, 4) when the
    frame's graphic-control extension marks a transparent index. Full
    logical-screen compositing (sub-rectangle frames paste over the
    background color), local color tables override the global one, and
    interlaced rasters are de-interlaced. Later animation frames are
    out of scope for curation gates — the first frame is the image."""
    if len(buf) < 13 or buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise PixelDecodeError("gif: bad signature")
    sw, sh = struct.unpack("<HH", buf[6:10])
    packed, bg_idx = buf[10], buf[11]
    if sw == 0 or sh == 0 or sw * sh > MAX_PIXELS:
        raise PixelDecodeError("gif: bad screen dimensions")
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if len(buf) < pos + 3 * n:
            raise PixelDecodeError("gif: truncated color table")
        gct = np.frombuffer(buf, np.uint8, count=3 * n,
                            offset=pos).reshape(n, 3)
        pos += 3 * n
    transparent = None
    while pos < len(buf):
        block = buf[pos]
        pos += 1
        if block == 0x3B:                      # trailer before any image
            raise PixelDecodeError("gif: no image descriptor")
        if block == 0x21:                      # extension
            if pos + 1 > len(buf):
                raise PixelDecodeError("gif: truncated extension")
            label = buf[pos]
            pos += 1
            if label == 0xF9 and pos + 5 <= len(buf) and buf[pos] == 4:
                flags = buf[pos + 1]
                if flags & 1:
                    transparent = buf[pos + 4]
            # skip sub-blocks (incl. the GCE's own)
            while pos < len(buf) and buf[pos] != 0:
                pos += 1 + buf[pos]
            pos += 1                           # block terminator
            continue
        if block != 0x2C:
            raise PixelDecodeError(f"gif: unknown block 0x{block:02x}")
        if pos + 9 > len(buf):
            raise PixelDecodeError("gif: truncated image descriptor")
        fx, fy, fw, fh = struct.unpack("<HHHH", buf[pos:pos + 8])
        ipacked = buf[pos + 8]
        pos += 9
        if fw == 0 or fh == 0 or fx + fw > sw or fy + fh > sh:
            raise PixelDecodeError("gif: frame outside logical screen")
        lct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            if len(buf) < pos + 3 * n:
                raise PixelDecodeError("gif: truncated color table")
            lct = np.frombuffer(buf, np.uint8, count=3 * n,
                                offset=pos).reshape(n, 3)
            pos += 3 * n
        if lct is None:
            raise PixelDecodeError("gif: no color table")
        if pos >= len(buf):
            raise PixelDecodeError("gif: missing LZW minimum code size")
        min_code = buf[pos]
        pos += 1
        # roots are palette indices (single bytes), so 2..8 only
        if not 2 <= min_code <= 8:
            raise PixelDecodeError(f"gif: bad LZW min code {min_code}")
        sub = bytearray()
        while True:
            if pos >= len(buf):
                raise PixelDecodeError("gif: unterminated data sub-blocks")
            ln = buf[pos]
            pos += 1
            if ln == 0:
                break
            sub.extend(buf[pos:pos + ln])
            if len(buf) < pos + ln:
                raise PixelDecodeError("gif: truncated data sub-block")
            pos += ln
        idx = np.frombuffer(
            _lzw_decode(min_code, bytes(sub), fw * fh), np.uint8)
        if int(idx.max()) >= lct.shape[0]:
            raise PixelDecodeError("gif: color index out of range")
        frame = idx.reshape(fh, fw)
        if ipacked & 0x40:                     # interlaced: reorder rows
            ordered = np.empty_like(frame)
            src = 0
            for first, step in _GIF_PASSES:
                rows = range(first, fh, step)
                ordered[list(rows)] = frame[src:src + len(rows)]
                src += len(rows)
            frame = ordered
        # composite in RGB space: the frame indexes its own (local)
        # table while the background color indexes the global one —
        # index spaces must not mix
        canvas = np.zeros((sh, sw, 3), np.uint8)
        if gct is not None and bg_idx < gct.shape[0]:
            canvas[:] = gct[bg_idx]
        canvas[fy:fy + fh, fx:fx + fw] = lct[frame]
        if transparent is not None:
            alpha = np.full((sh, sw), 255, np.uint8)
            alpha[fy:fy + fh, fx:fx + fw] = np.where(
                frame == transparent, 0, 255).astype(np.uint8)
            return np.dstack([canvas, alpha])
        return np.ascontiguousarray(canvas)
    raise PixelDecodeError("gif: no image descriptor")


def apply_exif_orientation(arr: np.ndarray, orientation) -> np.ndarray:
    """Upright a pixel array per Exif orientation 1-8 (TIFF 6.0 /
    Exif 2.x): the stored raster is transformed so row 0 becomes the
    visual top and column 0 the visual left. None/1/unknown values are
    identity; 5-8 swap width and height."""
    if orientation == 2:
        return arr[:, ::-1]
    if orientation == 3:
        return arr[::-1, ::-1]
    if orientation == 4:
        return arr[::-1]
    if orientation == 5:                     # transpose (main diagonal)
        return arr.swapaxes(0, 1)
    if orientation == 6:                     # rotate 90 CW to display
        return np.rot90(arr, -1)
    if orientation == 7:                     # transverse (anti-diagonal)
        return arr[::-1, ::-1].swapaxes(0, 1)
    if orientation == 8:                     # rotate 90 CCW to display
        return np.rot90(arr, 1)
    return arr


def _packbits(src: bytes, need: int) -> bytes:
    """PackBits run-length decode (TIFF 6.0 §9) for one strip: control
    byte n<128 copies n+1 literals, n>128 repeats the next byte 257-n
    times, 128 is a no-op. Output is bounded at `need` (runs never
    cross row — and hence strip — boundaries per the spec)."""
    out = bytearray()
    i = 0
    n_src = len(src)
    while len(out) < need and i < n_src:
        n = src[i]
        i += 1
        if n < 128:
            if i + n + 1 > n_src:
                raise PixelDecodeError("tiff: PackBits truncated")
            out += src[i:i + n + 1]
            i += n + 1
        elif n > 128:
            if i >= n_src:
                raise PixelDecodeError("tiff: PackBits truncated")
            out += bytes([src[i]]) * (257 - n)
            i += 1
    if len(out) != need:
        raise PixelDecodeError("tiff: PackBits strip size mismatch")
    return bytes(out)


def _tiff_lzw(src: bytes, need: int) -> bytes:
    """TIFF-variant LZW decode (TIFF 6.0 §13) for one strip: MSB-first
    code packing (unlike GIF's LSB-first), Clear=256/EOI=257, codes
    start at 9 bits and grow with the EARLY-CHANGE rule — the width
    bumps when the table reaches 2^width - 1, one code sooner than the
    GIF variant. Output is bounded at `need`; the 4096-entry table
    freezes until a clear."""
    out = bytearray()
    table: list[bytes] = []
    width = 9
    prev: bytes | None = None
    acc = nbits = 0
    pos = 0
    n_src = len(src)

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    while len(out) < need:
        while nbits < width:
            if pos >= n_src:
                raise PixelDecodeError("tiff: LZW strip truncated")
            acc = (acc << 8) | src[pos]
            pos += 1
            nbits += 8
        nbits -= width
        code = acc >> nbits
        acc &= (1 << nbits) - 1
        if code == 256:                        # Clear
            reset()
            continue
        if code == 257:                        # EOI
            break
        if prev is None:
            if code >= 256:
                raise PixelDecodeError("tiff: bad first LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]            # KwKwK
            table.append(entry)
        else:
            raise PixelDecodeError("tiff: LZW code out of range")
        out += entry
        prev = entry
        if len(table) >= (1 << width) - 1 and width < 12:
            width += 1                         # early change
    if len(out) < need:
        raise PixelDecodeError("tiff: LZW strip size mismatch")
    return bytes(out[:need])


def decode_tiff(buf: bytes) -> np.ndarray:
    """Baseline TIFF 6.0 raster subset: uncompressed, PackBits, or LZW
    compression (with the optional horizontal-differencing predictor),
    chunky (PlanarConfiguration 1), 8-bit grayscale (Photometric 0 —
    inverted — or 1) or RGB (2), strip-organized with validated strip
    sizes. Everything else — JPEG-in-TIFF/CCITT compression, tiles,
    planar, 16-bit, palette — side-drops with the reason; this subset
    plus the standalone JPEG path covers the scanned-document slice of
    a web corpus."""
    from .multimodal import _tiff_ifd0_tags

    tags = _tiff_ifd0_tags(buf, frozenset(
        (256, 257, 258, 259, 262, 273, 277, 278, 279, 284, 317,
         322, 323)))
    if tags is None or 256 not in tags or 257 not in tags:
        raise PixelDecodeError("tiff: malformed IFD")
    if 322 in tags or 323 in tags:
        raise PixelDecodeError("tiff: tiled layout unsupported")
    w, h = tags[256][0], tags[257][0]
    if w <= 0 or h <= 0:
        raise PixelDecodeError("tiff: bad dimensions")
    comp = tags.get(259, [1])[0]
    if comp not in (1, 5, 32773):
        raise PixelDecodeError(f"tiff: compression {comp} unsupported")
    predictor = tags.get(317, [1])[0]
    if predictor not in (1, 2):
        raise PixelDecodeError(f"tiff: predictor {predictor} "
                               "unsupported")
    if tags.get(284, [1])[0] != 1:
        raise PixelDecodeError("tiff: planar layout unsupported")
    photo = tags.get(262, [1])[0]
    spp = tags.get(277, [1])[0]
    if photo == 2:
        if spp != 3:
            raise PixelDecodeError(
                f"tiff: {spp} samples for RGB unsupported")
    elif photo in (0, 1):
        if spp != 1:
            raise PixelDecodeError(
                "tiff: multi-sample grayscale unsupported")
    else:
        raise PixelDecodeError(f"tiff: photometric {photo} unsupported")
    bps = tags.get(258, [8] * spp)
    if len(bps) < spp or any(b != 8 for b in bps[:spp]):
        raise PixelDecodeError("tiff: only 8-bit samples supported")
    if w * h > MAX_PIXELS:                 # the same per-pixel cap the
        raise PixelDecodeError(            # other 8-bit formats use
            f"tiff: {w}x{h} exceeds the decode budget")
    offs = tags.get(273)
    cnts = tags.get(279)
    if not offs or not cnts or len(offs) != len(cnts):
        raise PixelDecodeError("tiff: missing strip layout")
    rps = tags.get(278, [h])[0]
    if rps <= 0:
        raise PixelDecodeError("tiff: bad rows-per-strip")
    row_bytes = w * spp
    rows_left = h
    parts = []
    for off, cnt in zip(offs, cnts):
        if rows_left == 0:
            break                      # extra declared strips: ignore
        rows_here = min(rps, rows_left)
        need = rows_here * row_bytes
        if off + cnt > len(buf):
            raise PixelDecodeError("tiff: strip out of bounds")
        raw = buf[off:off + cnt]
        if comp == 1:
            # uncompressed strips have exact sizes (TIFF 6.0 §3) — a
            # mismatch means a layout this subset doesn't model
            if cnt != need:
                raise PixelDecodeError("tiff: strip size mismatch")
            parts.append(raw)
        elif comp == 32773:
            parts.append(_packbits(raw, need))
        else:                          # 5: LZW
            parts.append(_tiff_lzw(raw, need))
        rows_left -= rows_here
    if rows_left:
        raise PixelDecodeError("tiff: truncated strip data")
    arr = np.frombuffer(b"".join(parts), np.uint8)
    arr = arr.reshape(h, w, spp)
    if predictor == 2:
        # horizontal differencing (TIFF 6.0 §14): each sample is a
        # delta from the same sample one pixel left — invert with a
        # per-channel cumulative sum along the row; the uint8
        # accumulator wraps mod 256 natively (an int64 intermediate
        # would cost 8x the frame in executor memory for nothing)
        arr = arr.cumsum(axis=1, dtype=np.uint8)
    else:
        arr = arr.copy()
    if photo == 0:                     # white-is-zero: invert
        arr = 255 - arr
    return arr


def decode_pixels(buf: bytes) -> tuple[str, np.ndarray]:
    """Dispatch by magic: ('png'|'bmp'|'gif'|'jpeg'|'webp'|'tiff',
    pixels) — (H, W, C) uint8, or (H, W) for grayscale JPEG. Unknown
    magics and out-of-scope encodings (arithmetic-coded JPEG, lossy
    VP8 WebP, JPEG-in-TIFF/CCITT/tiled TIFF, non-PCM audio codecs,
    ...) raise PixelDecodeError with the reason."""
    if buf[:8] == _PNG_SIG:
        return "png", decode_png(buf)
    if buf[:2] == b"BM":
        return "bmp", decode_bmp(buf)
    if buf[:6] in (b"GIF87a", b"GIF89a"):
        return "gif", decode_gif(buf)
    if buf[:2] == b"\xff\xd8":
        from .jpeg_codec import decode_jpeg

        return "jpeg", decode_jpeg(buf)
    if buf[:4] == b"RIFF" and buf[8:12] == b"WEBP":
        from .webp_codec import decode_webp

        return "webp", decode_webp(buf)
    if buf[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff", decode_tiff(buf)
    raise PixelDecodeError("unknown image format")


# --- resize kernels ---------------------------------------------------------

def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample to (height, width): pixel-center
    mapping (the standard (i+0.5)*scale-0.5 grid, clamped)."""
    h, w = arr.shape[:2]
    ys = np.clip(((np.arange(height) + 0.5) * h / height - 0.5).round()
                 .astype(np.int64), 0, h - 1)
    xs = np.clip(((np.arange(width) + 0.5) * w / width - 0.5).round()
                 .astype(np.int64), 0, w - 1)
    return arr[ys][:, xs]


def resize_bilinear(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Bilinear resample to (height, width), pixel-center grid, edge
    clamp; float64 lerp rounded half-up to uint8 — deterministic across
    platforms (no SIMD reassociation: pure numpy elementwise)."""
    h, w = arr.shape[:2]
    a = arr if arr.ndim == 3 else arr[:, :, None]
    fy = np.clip((np.arange(height) + 0.5) * h / height - 0.5, 0, h - 1)
    fx = np.clip((np.arange(width) + 0.5) * w / width - 0.5, 0, w - 1)
    y0 = np.floor(fy).astype(np.int64)
    x0 = np.floor(fx).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (fy - y0)[:, None, None]
    wx = (fx - x0)[None, :, None]
    top = a[y0][:, x0] * (1 - wx) + a[y0][:, x1] * wx
    bot = a[y1][:, x0] * (1 - wx) + a[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    out = np.floor(out + 0.5).astype(np.uint8)
    return out if arr.ndim == 3 else out[:, :, 0]


# --- Spark kernels (mapInPandas, side-drop on undecodable) ------------------

PIXEL_STATS_SCHEMA = (
    "doc_id bigint, format string, width int, height int, channels int, "
    "channel_mean array<double>, channel_std array<double>, "
    "decode_error string"
)


def image_pixel_stats(df_media: DataFrame,
                      media_col: str = "media") -> DataFrame:
    """Per-image pixel statistics over Arrow batches: real decode of
    every supported format (PNG/BMP/GIF/baseline JPEG via
    decode_pixels), per-channel mean/std — the numeric gate a curation
    pipeline puts in front of training (near-black/near-white frames,
    dead channels). Undecodable rows side-drop with a reason, batch
    never fails; shuffle-free (row-local projection)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "format", "width", "height",
                                    "channels", "channel_mean",
                                    "channel_std", "decode_error")}
            for doc_id, media in zip(pdf["doc_id"], pdf[media_col]):
                rows["doc_id"].append(doc_id)
                try:
                    data = bytes(media)
                    fmt, arr = decode_pixels(data)
                    # phone cameras store the sensor raster plus an
                    # Exif tag instead of rotating pixels — width/
                    # height must be the DISPLAY dims or aspect gates
                    # misfire on a large slice of real photos. The
                    # parser returns None for formats without an Exif
                    # carrier, so no format list to keep in sync.
                    arr = apply_exif_orientation(
                        arr, parse_exif_orientation(data))
                except Exception as ex:  # noqa: BLE001 — side-drop idiom
                    reason = (str(ex) if isinstance(ex, PixelDecodeError)
                              else f"decode failed: {ex}")
                    for k in ("format", "width", "height", "channels",
                              "channel_mean", "channel_std"):
                        rows[k].append(None)
                    rows["decode_error"].append(reason)
                    continue
                if arr.ndim == 2:
                    arr = arr[:, :, None]
                flat = arr.reshape(-1, arr.shape[2]).astype(np.float64)
                rows["format"].append(fmt)
                rows["width"].append(arr.shape[1])
                rows["height"].append(arr.shape[0])
                rows["channels"].append(arr.shape[2])
                rows["channel_mean"].append(flat.mean(axis=0).tolist())
                rows["channel_std"].append(flat.std(axis=0).tolist())
                rows["decode_error"].append(None)
            yield pd.DataFrame(rows)

    return df_media.mapInPandas(kernel, schema=PIXEL_STATS_SCHEMA)


THUMBNAIL_SCHEMA = ("doc_id bigint, thumb binary, width int, height int, "
                    "decode_error string")


def resize_images(df_media: DataFrame, width: int, height: int,
                  method: str = "bilinear",
                  media_col: str = "media") -> DataFrame:
    """REAL image resize for every supported format (PNG/BMP/GIF/
    baseline JPEG via decode_pixels — multimodal.resize_stub now marks
    only the out-of-scope codecs): decode, resample to (width, height),
    re-encode as a deterministic PNG thumbnail. Byte-stable across
    re-runs (decode and encode are both exact), so downstream
    content-hash dedup of thumbnails is meaningful. Undecodable rows
    side-drop with a reason."""
    if method not in ("nearest", "bilinear"):
        raise ValueError(f"method must be nearest|bilinear, got {method!r}")
    if width < 1 or height < 1:
        raise ValueError(f"bad thumbnail dims {width}x{height}")
    resample = resize_nearest if method == "nearest" else resize_bilinear

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "thumb", "width", "height",
                                    "decode_error")}
            for doc_id, media in zip(pdf["doc_id"], pdf[media_col]):
                rows["doc_id"].append(doc_id)
                try:
                    data = bytes(media)
                    fmt, arr = decode_pixels(data)
                    arr = apply_exif_orientation(
                        arr, parse_exif_orientation(data))
                    thumb = encode_png(resample(arr, width, height))
                except Exception as ex:  # noqa: BLE001 — side-drop idiom
                    reason = (str(ex) if isinstance(ex, PixelDecodeError)
                              else f"decode failed: {ex}")
                    rows["thumb"].append(None)
                    rows["width"].append(None)
                    rows["height"].append(None)
                    rows["decode_error"].append(reason)
                    continue
                rows["thumb"].append(thumb)
                rows["width"].append(width)
                rows["height"].append(height)
                rows["decode_error"].append(None)
            yield pd.DataFrame(rows)

    return df_media.mapInPandas(kernel, schema=THUMBNAIL_SCHEMA)
