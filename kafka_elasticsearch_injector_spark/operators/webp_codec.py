"""WebP decode for the pixel lane — pure stdlib + numpy, no image libs.

VP8L (lossless) decodes FULLY to pixels per the public WebP Lossless
Bitstream Specification (RFC 9649 §5 / Google's webp_lossless
specification): LSB-first bit reader, canonical prefix codes (simple
and normal forms, code-length codes with 16/17/18 repeats and the
max_symbol early stop), meta prefix codes, color cache, LZ77 backward
references with the 120-entry close-neighbor distance map, and all
four transforms inverted in reverse stream order — predictor (14
spatial modes), cross-color, subtract-green, and color-indexing with
sub-byte pixel bundling. Animations with VP8L-coded frames decode
their FIRST frame composited onto the VP8X canvas over the ANIM
background color (the first-frame GIF reader's contract). Lossy VP8
(a full video intra-frame codec: boolean arithmetic coder + loop
filter) is the documented out-of-scope boundary, like
arithmetic-coded JPEG in jpeg_codec.py: still or animated, it
side-drops with a reason while its DIMENSIONS still parse via
multimodal.parse_image_header, so dims-based curation gates see every
WebP row.

Reference parity note: the reference engine (inloco/
kafka-elasticsearch-injector, Go) has no media path at all — this
module is extension-lane for the training-data pipeline, matching the
column contract of operators/pixels.py (decode_pixels → (H, W, C)
uint8).

100 TB note: same shape as the PNG/JPEG decoders — a row-local Arrow
kernel, no shuffle, header-declared dims cap every allocation (a
5-byte header can otherwise declare 16383x16383 and OOM before any
decode error fires). The per-symbol Python loop is the documented
correctness-first boundary with the native-codec seam at bulk scale;
transform inversion and unbundling are vectorized numpy.
"""

from __future__ import annotations

import struct

import numpy as np

from .multimodal import _walk_chunks, _walk_riff_webp
from .pixels import MAX_PIXELS, PixelDecodeError


def _err(msg: str) -> PixelDecodeError:
    return PixelDecodeError(f"webp: {msg}")


# --- LSB-first bit reader (spec §3) ------------------------------------------

class _Bits:
    __slots__ = ("buf", "pos", "acc", "n")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read(self, k: int) -> int:
        acc, n, pos, buf = self.acc, self.n, self.pos, self.buf
        while n < k:
            if pos >= len(buf):
                raise _err("bitstream truncated")
            acc |= buf[pos] << n
            pos += 1
            n += 8
        self.acc = acc >> k
        self.n = n - k
        self.pos = pos
        return acc & ((1 << k) - 1)

    def peek(self, k: int) -> int:
        # zero-padded past end-of-stream: a short code word near the
        # end must still decode; drop() re-checks the consumed count
        acc, n, pos, buf = self.acc, self.n, self.pos, self.buf
        while n < k and pos < len(buf):
            acc |= buf[pos] << n
            pos += 1
            n += 8
        self.acc, self.n, self.pos = acc, n, pos
        return acc & ((1 << k) - 1)

    def drop(self, k: int) -> None:
        if k > self.n:
            raise _err("bitstream truncated")
        self.acc >>= k
        self.n -= k


# --- canonical prefix codes (spec §5.2.2) -------------------------------------

class _Code:
    """One prefix code: a single-symbol 0-bit code, or a peek table of
    size 1<<max_len mapping LSB-first bit windows to packed
    (symbol << 4) | code_length ints (lengths are capped at 15)."""
    __slots__ = ("single", "table", "max_len")

    def __init__(self, single=None, table=None, max_len=0):
        self.single = single
        self.table = table
        self.max_len = max_len

    def decode(self, br: _Bits) -> int:
        if self.single is not None:
            return self.single
        e = self.table[br.peek(self.max_len)]
        br.drop(e & 15)
        return e >> 4


def _build_code(lengths: list[int], budget: list[int]) -> _Code:
    """Canonical code from per-symbol lengths: DEFLATE-style canonical
    assignment (shorter first, ties by symbol), each code word
    bit-reversed for the LSB-first stream. Exactly one used symbol →
    0-bit code; otherwise the code must be complete (Kraft sum 1)."""
    used = sorted((ln, s) for s, ln in enumerate(lengths) if ln > 0)
    if not used:
        raise _err("empty prefix code")
    if len(used) == 1:
        return _Code(single=used[0][1])
    max_len = used[-1][0]
    if max_len > 15:
        raise _err("prefix code length > 15")
    if sum(1 << (max_len - ln) for ln, _ in used) != 1 << max_len:
        raise _err("invalid prefix code (not complete)")
    # crafted streams can declare tens of thousands of codes (one per
    # meta group); bound the total table memory like the byte budgets
    # in the other decoders — a parse error, not an allocation
    budget[0] -= 1 << max_len
    if budget[0] < 0:
        raise _err("prefix-code table budget exceeded")
    table = [0] * (1 << max_len)
    code = 0
    cur_len = 0
    for ln, s in used:
        code <<= ln - cur_len
        cur_len = ln
        rev = int(f"{code:0{ln}b}"[::-1], 2)
        entry = (s << 4) | ln
        for t in range(rev, 1 << max_len, 1 << ln):
            table[t] = entry
        code += 1
    return _Code(table=table, max_len=max_len)


# code-length-code symbol order (spec §5.2.2)
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13,
              14, 15)


def _read_code_lengths(br: _Bits, alphabet_size: int,
                       budget: list[int]) -> list[int]:
    """Normal-code form: symbol code lengths are themselves coded with
    a 19-symbol prefix code (16 = repeat previous nonzero 3-6, 17 =
    3-10 zeros, 18 = 11-138 zeros), with an optional max_symbol count
    capping how many coded lengths follow (the rest are zero)."""
    num_clc = br.read(4) + 4
    clc_lengths = [0] * 19
    for i in range(num_clc):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _build_code(clc_lengths, budget)
    if br.read(1):                            # explicit max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
        if max_symbol > alphabet_size:
            raise _err("max_symbol exceeds the alphabet")
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    symbol = 0
    prev_len = 8                              # spec-defined initial value
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1                       # one decrement per coded
        cl = clc.decode(br)                   # symbol, repeats included
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl:
                prev_len = cl
        else:
            if cl == 16:
                repeat, fill = 3 + br.read(2), prev_len
            elif cl == 17:
                repeat, fill = 3 + br.read(3), 0
            else:
                repeat, fill = 11 + br.read(7), 0
            if symbol + repeat > alphabet_size:
                raise _err("code-length repeat overflows the alphabet")
            for _ in range(repeat):
                lengths[symbol] = fill
                symbol += 1
    return lengths


def _read_prefix_code(br: _Bits, alphabet_size: int,
                      budget: list[int]) -> _Code:
    if br.read(1):                            # simple code: 1-2 symbols
        num_symbols = br.read(1) + 1
        syms = [br.read(8) if br.read(1) else br.read(1)]
        if num_symbols == 2:
            syms.append(br.read(8))
        if any(s >= alphabet_size for s in syms):
            raise _err("simple-code symbol outside the alphabet")
        if num_symbols == 1:
            return _Code(single=syms[0])
        if syms[0] == syms[1]:
            raise _err("duplicate simple-code symbols")
        lengths = [0] * alphabet_size
        lengths[syms[0]] = lengths[syms[1]] = 1
        return _build_code(lengths, budget)
    return _build_code(_read_code_lengths(br, alphabet_size, budget),
                       budget)


# --- LZ77 close-neighbor distance map (the prefix-value rule lives in
# the hot loop's lz77 closure in _decode_entropy_pixels) ----------------------

def _distance_map() -> list[tuple[int, int]]:
    """The 120-entry (dx, dy) close-neighbor table of spec §5.2.3,
    reproduced by its generation rule: all offsets with dy in 0..7 and
    dx in -7..8 (dy=0 restricted to dx>=1), sorted by squared euclidean
    distance, larger dy first on ties, positive dx before negative."""
    cand = [(dx, 0) for dx in range(1, 9)] + \
           [(dx, dy) for dy in range(1, 8) for dx in range(-7, 9)]
    cand.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], p[0] < 0))
    return cand


_DIST_MAP = _distance_map()
assert len(_DIST_MAP) == 120

_HASH_MUL = 0x1E35A7BD                        # color-cache hash (spec §4.3)


# --- entropy-coded image data (spec §5.2.3) -----------------------------------

def _decode_entropy_pixels(br, w, h, groups, meta_idx, meta_bits,
                           cache_bits):
    """The per-symbol pixel loop → flat array('I') of ARGB values.
    Sequential by construction (LZ77 + cache state) — the documented
    pure-Python boundary, same as the JPEG entropy decoder. The buffer
    is an unboxed 4-bytes-per-pixel array, NOT a Python list — a list
    of fresh PyLongs weighs ~44 bytes/pixel (measured), which would
    let a 12-byte crafted header allocate ~11x what the byte-weighted
    budget in decode_vp8l thinks it capped."""
    from array import array

    n = w * h
    out = array("I", bytes(4 * n))
    cache = [0] * (1 << cache_bits) if cache_bits else None
    shift = 32 - cache_bits if cache_bits else 0
    multi = meta_idx is not None
    # the hot loop keeps the bit state in locals and decodes inline
    # against pre-resolved (table, mask) pairs — a single-symbol 0-bit
    # code becomes a 1-entry table with mask 0, so every channel is
    # the same unconditional lookup + shift (the same rework the JPEG
    # entropy decoder got; state syncs back to `br` on return). One
    # 64-bit refill per pixel covers the worst case of four 15-bit
    # literal codes; the per-decode ln > nb check catches truncation.
    gs = [tuple(
        ((c.table, (1 << c.max_len) - 1) if c.single is None
         else ([c.single << 4], 0))
        for c in g) for g in groups]
    buf = br.buf
    blen = len(buf)
    acc, nb, pos_b = br.acc, br.n, br.pos

    def rd(k):
        nonlocal acc, nb, pos_b
        while nb < k:
            if pos_b >= blen:
                raise _err("bitstream truncated")
            acc |= buf[pos_b] << nb
            pos_b += 1
            nb += 8
        v = acc & ((1 << k) - 1)
        acc >>= k
        nb -= k
        return v

    def lz77(code):
        if code < 4:
            return code + 1
        extra = (code - 2) >> 1
        return ((2 + (code & 1)) << extra) + rd(extra) + 1

    (g_tbl, g_mask), (r_tbl, r_mask), (b_tbl, b_mask), \
        (a_tbl, a_mask), (d_tbl, d_mask) = gs[0]
    pos = x = y = 0
    while pos < n:
        if multi:
            g_row = meta_idx[y >> meta_bits]
            (g_tbl, g_mask), (r_tbl, r_mask), (b_tbl, b_mask), \
                (a_tbl, a_mask), (d_tbl, d_mask) = \
                gs[g_row[x >> meta_bits]]
        if nb < 60:
            if pos_b + 8 <= blen:
                acc |= int.from_bytes(buf[pos_b:pos_b + 8],
                                      "little") << nb
                pos_b += 8
                nb += 64
            else:
                while nb < 60 and pos_b < blen:
                    acc |= buf[pos_b] << nb
                    pos_b += 1
                    nb += 8
        e = g_tbl[acc & g_mask]
        ln = e & 15
        if ln > nb:
            raise _err("bitstream truncated")
        acc >>= ln
        nb -= ln
        s = e >> 4
        if s < 256:                           # literal: G then R, B, A
            e = r_tbl[acc & r_mask]           # stream order matters —
            ln = e & 15                       # decode in spec order,
            if ln > nb:                       # not expression order
                raise _err("bitstream truncated")
            acc >>= ln
            nb -= ln
            r = e >> 4
            e = b_tbl[acc & b_mask]
            ln = e & 15
            if ln > nb:
                raise _err("bitstream truncated")
            acc >>= ln
            nb -= ln
            b = e >> 4
            e = a_tbl[acc & a_mask]
            ln = e & 15
            if ln > nb:
                raise _err("bitstream truncated")
            acc >>= ln
            nb -= ln
            px = ((e >> 4) << 24) | (r << 16) | (s << 8) | b
            out[pos] = px
            if cache is not None:
                cache[((px * _HASH_MUL) & 0xFFFFFFFF) >> shift] = px
            pos += 1
            if multi:
                x += 1
                if x == w:
                    x = 0
                    y += 1
        elif s < 280:                         # LZ77 backward reference
            length = lz77(s - 256)
            if nb < 15:
                while nb < 60 and pos_b < blen:
                    acc |= buf[pos_b] << nb
                    pos_b += 1
                    nb += 8
            e = d_tbl[acc & d_mask]
            ln = e & 15
            if ln > nb:
                raise _err("bitstream truncated")
            acc >>= ln
            nb -= ln
            dcode = lz77(e >> 4)
            if dcode > 120:
                dist = dcode - 120
            else:
                dx, dy = _DIST_MAP[dcode - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            if dist > pos:
                raise _err("backward reference before image start")
            if pos + length > n:
                raise _err("backward reference overruns the image")
            if cache is None:
                for _ in range(length):
                    out[pos] = out[pos - dist]
                    pos += 1
            else:
                for _ in range(length):
                    px = out[pos - dist]
                    out[pos] = px
                    cache[((px * _HASH_MUL) & 0xFFFFFFFF) >> shift] = px
                    pos += 1
            if multi:
                x = pos % w
                y = pos // w
        else:                                 # color-cache reference
            idx = s - 280
            if cache is None or idx >= len(cache):
                raise _err("color-cache index out of range")
            px = cache[idx]
            out[pos] = px
            pos += 1
            if multi:
                x += 1
                if x == w:
                    x = 0
                    y += 1
    br.acc, br.n, br.pos = acc, nb, pos_b
    return out


# --- transforms (spec §4), inverted in reverse stream order ------------------

def _div_ceil(a: int, b: int) -> int:
    return -(-a // b)


def _s8(arr):
    """uint8-valued array → signed int8 semantics, kept in int32."""
    return ((arr.astype(np.int32) + 128) & 255) - 128


def _inverse_subtract_green(img):
    g = (img >> 8) & 0xFF
    r = (((img >> 16) & 0xFF) + g) & 0xFF
    b = ((img & 0xFF) + g) & 0xFF
    return (img & np.uint32(0xFF00FF00)) | (r << 16) | b


def _inverse_color(img, size_bits, sub):
    """Cross-color inverse (spec §4.2.3): per-block multipliers
    green_to_red (blue byte), green_to_blue (green byte), red_to_blue
    (red byte); delta = (int8 multiplier * int8 channel) >> 5, added
    mod 256 — fully vectorized (elementwise, no neighbor deps)."""
    h, w = img.shape
    cte = sub[np.arange(h) >> size_bits][:, np.arange(w) >> size_bits]
    g2r = _s8(cte & 0xFF)
    g2b = _s8((cte >> 8) & 0xFF)
    r2b = _s8((cte >> 16) & 0xFF)
    g = _s8((img >> 8) & 0xFF)
    red = (((img >> 16) & 0xFF).astype(np.int32) + ((g2r * g) >> 5)) & 0xFF
    blue = (img & 0xFF).astype(np.int32) + ((g2b * g) >> 5)
    blue = (blue + ((r2b * _s8(red)) >> 5)) & 0xFF
    return (img & np.uint32(0xFF00FF00)) | (red.astype(np.uint32) << 16) \
        | blue.astype(np.uint32)


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _avg2(p, q):
    return ((p[0] + q[0]) >> 1, (p[1] + q[1]) >> 1,
            (p[2] + q[2]) >> 1, (p[3] + q[3]) >> 1)


def _select(left, top, tl):
    pred = tuple(lc + tc - tlc for lc, tc, tlc in zip(left, top, tl))
    p_l = sum(abs(pc - lc) for pc, lc in zip(pred, left))
    p_t = sum(abs(pc - tc) for pc, tc in zip(pred, top))
    return left if p_l < p_t else top


def _casf(left, top, tl):                     # clamp-add-subtract full
    return tuple(_clamp(lc + tc - tlc)
                 for lc, tc, tlc in zip(left, top, tl))


def _cash(left, top, tl):                     # clamp-add-subtract half
    ave = _avg2(left, top)
    out = []
    for ac, tlc in zip(ave, tl):
        d = ac - tlc
        half = d // 2 if d >= 0 else -((-d) // 2)   # C truncation
        out.append(_clamp(ac + half))
    return tuple(out)


def _inverse_predictor(img, size_bits, sub):
    """Spatial-predictor inverse (spec §4.2.2): residual + predicted
    neighbor per channel mod 256, mode per block from the subimage's
    green byte. Edge rules: (0,0) predicts opaque black, row 0
    predicts L, column 0 predicts T; the TR neighbor of the rightmost
    column is the leftmost pixel of the SAME row (the spec's
    contiguous-row addressing). Sequential per pixel by definition —
    decoded neighbors feed the next prediction."""
    h, w = img.shape
    modes = ((sub >> 8) & 0xF).tolist()       # libwebp masks to 4 bits;
    # modes 14/15 (outside the 14 defined) predict like mode 0
    # completed rows land in an unboxed (h, w, 4) uint8 array; only the
    # current and previous rows exist as Python objects (residual rows
    # are extracted per y, never the whole image — an (h, w, 4) int64
    # residual array measured ~69 bytes/pixel, 17x the budget's 4)
    out = np.empty((h, w, 4), np.uint8)
    black = (0xFF, 0, 0, 0)
    prev = None
    for y in range(h):
        iy = img[y]
        res_row = np.stack([(iy >> 24) & 0xFF, (iy >> 16) & 0xFF,
                            (iy >> 8) & 0xFF, iy & 0xFF], 1).tolist()
        row = [black] * w
        mrow = modes[y >> size_bits] if y else None
        for x in range(w):
            if y == 0:
                p = black if x == 0 else row[x - 1]
            elif x == 0:
                p = prev[0]
            else:
                m = mrow[x >> size_bits]
                if m == 1:
                    p = row[x - 1]
                elif m == 2:
                    p = prev[x]
                elif m == 0 or m > 13:
                    p = black
                else:
                    left = row[x - 1]
                    top = prev[x]
                    if m == 3:
                        p = prev[x + 1] if x + 1 < w else row[0]
                    elif m == 4:
                        p = prev[x - 1]
                    elif m == 5:
                        tr = prev[x + 1] if x + 1 < w else row[0]
                        p = _avg2(_avg2(left, tr), top)
                    elif m == 6:
                        p = _avg2(left, prev[x - 1])
                    elif m == 7:
                        p = _avg2(left, top)
                    elif m == 8:
                        p = _avg2(prev[x - 1], top)
                    elif m == 9:
                        tr = prev[x + 1] if x + 1 < w else row[0]
                        p = _avg2(top, tr)
                    elif m == 10:
                        tr = prev[x + 1] if x + 1 < w else row[0]
                        p = _avg2(_avg2(left, prev[x - 1]),
                                  _avg2(top, tr))
                    elif m == 11:
                        p = _select(left, top, prev[x - 1])
                    elif m == 12:
                        p = _casf(left, top, prev[x - 1])
                    else:                     # m == 13
                        p = _cash(left, top, prev[x - 1])
            r = res_row[x]
            row[x] = ((r[0] + p[0]) & 0xFF, (r[1] + p[1]) & 0xFF,
                      (r[2] + p[2]) & 0xFF, (r[3] + p[3]) & 0xFF)
        out[y] = row
        prev = row
    # (a, r, g, b) bytes reversed to (b, g, r, a) read little-endian
    # ARE the ARGB words — one 4-byte/px copy, no uint32 temporaries
    return out[:, :, ::-1].copy().view("<u4").reshape(h, w)


def _inverse_color_indexing(img, width_bits, palette, full_w):
    """Palette lookup + sub-byte unbundling (spec §4.2.4): for
    palettes of ≤16 colors several pixel indices ride one green byte,
    little-end first. Vectorized gather."""
    if width_bits == 0:
        idx = (img >> 8) & 0xFF
    else:
        per = 1 << width_bits                 # indices per packed byte
        bits = 8 >> width_bits                # bits per index
        xs = np.arange(full_w)
        packed = ((img >> 8) & 0xFF)[:, xs >> width_bits]
        idx = (packed >> ((xs & (per - 1)) * bits)) & ((1 << bits) - 1)
    if int(idx.max()) >= len(palette):
        raise _err("palette index out of range")
    return palette[idx]


# --- image streams (spec §5.2) ------------------------------------------------

def _decode_image_stream(br, w, h, level0, budget):
    """One entropy-coded image: [transforms (main image only)] →
    [color cache] → [meta prefix codes (main image only)] → prefix
    code groups → pixel data → inverse transforms in reverse order.
    Subresolution images (entropy/predictor/color/palette) recurse
    with level0=False."""
    transforms = []
    seen_transforms = set()
    cur_w = w
    if level0:
        while br.read(1):
            ttype = br.read(2)
            if ttype in seen_transforms:
                raise _err("duplicate transform")
            seen_transforms.add(ttype)
            if ttype in (0, 1):               # predictor / cross-color
                size_bits = br.read(3) + 2
                sub = _decode_image_stream(
                    br, _div_ceil(cur_w, 1 << size_bits),
                    _div_ceil(h, 1 << size_bits), False, budget)
                transforms.append((ttype, size_bits, sub, cur_w))
            elif ttype == 2:                  # subtract green
                transforms.append((2, None, None, cur_w))
            else:                             # color indexing
                psize = br.read(8) + 1
                prow = _decode_image_stream(br, psize, 1, False, budget)
                # palette entries are componentwise delta-coded
                pal = np.stack([
                    np.cumsum((prow[0] >> s) & 0xFF) & 0xFF
                    for s in (24, 16, 8, 0)])
                palette = ((pal[0] << 24) | (pal[1] << 16)
                           | (pal[2] << 8) | pal[3]).astype(np.uint32)
                width_bits = (3 if psize <= 2 else 2 if psize <= 4
                              else 1 if psize <= 16 else 0)
                transforms.append((3, width_bits, palette, cur_w))
                cur_w = _div_ceil(cur_w, 1 << width_bits)
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise _err(f"invalid color-cache size bits {cache_bits}")
    meta_idx = None
    meta_bits = 0
    num_groups = 1
    if level0 and br.read(1):                 # meta prefix codes
        meta_bits = br.read(3) + 2
        meta_img = _decode_image_stream(
            br, _div_ceil(cur_w, 1 << meta_bits),
            _div_ceil(h, 1 << meta_bits), False, budget)
        meta_idx = ((meta_img >> 8) & 0xFFFF).astype(np.int64).tolist()
        num_groups = max(max(r) for r in meta_idx) + 1
    sizes = (280 + ((1 << cache_bits) if cache_bits else 0),
             256, 256, 256, 40)
    groups = [tuple(_read_prefix_code(br, s, budget) for s in sizes)
              for _ in range(num_groups)]
    flat = _decode_entropy_pixels(br, cur_w, h, groups, meta_idx,
                                  meta_bits, cache_bits)
    img = np.frombuffer(flat, dtype=np.uint32).reshape(h, cur_w).copy()
    for ttype, p1, p2, t_w in reversed(transforms):
        if ttype == 0:
            img = _inverse_predictor(img, p1, p2)
        elif ttype == 1:
            img = _inverse_color(img, p1, p2)
        elif ttype == 2:
            img = _inverse_subtract_green(img)
        else:
            img = _inverse_color_indexing(img, p1, p2, t_w)
    return img


def decode_vp8l(data: bytes) -> np.ndarray:
    """VP8L chunk payload → (H, W, 3|4) uint8 (RGB when fully opaque,
    RGBA otherwise — the PNG decoder's convention)."""
    if len(data) < 5 or data[0] != 0x2F:
        raise _err("bad VP8L signature")
    br = _Bits(data)
    br.read(8)                                # signature byte
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)                                # alpha-is-used hint
    if br.read(3):
        raise _err("unknown VP8L version")
    # byte-weighted budget: ARGB is 4 bytes/pixel (the jpeg_codec
    # convention) — caps every allocation below from header fields
    if w * h * 4 > MAX_PIXELS:
        raise _err(f"{w}x{h} exceeds the decode budget")
    # 16M table entries (~128 MB ceiling) covers hundreds of meta
    # groups at worst-case 15-bit code depth — real encoders emit far
    # fewer — while a crafted 65k-group stream fails the budget check
    # instead of exhausting memory
    img = _decode_image_stream(br, w, h, True, [1 << 24])
    a = ((img >> 24) & 0xFF).astype(np.uint8)
    rgb = [((img >> s) & 0xFF).astype(np.uint8) for s in (16, 8, 0)]
    if int(a.min()) < 255:
        return np.dstack(rgb + [a])
    return np.dstack(rgb)


def _decode_first_frame(buf, body, size, canvas, bg):
    """First ANMF frame of an animation (the GIF first-frame
    precedent): the frame's VP8L payload composites onto the VP8X
    canvas at the ANMF offset over the ANIM background color (stored
    B,G,R,A). Lossy (VP8) frames side-drop like still lossy files."""
    if size < 16:
        raise _err("ANMF chunk too short")
    fx = int.from_bytes(buf[body:body + 3], "little") * 2
    fy = int.from_bytes(buf[body + 3:body + 6], "little") * 2
    fw = int.from_bytes(buf[body + 6:body + 9], "little") + 1
    fh = int.from_bytes(buf[body + 9:body + 12], "little") + 1
    frame = None
    # frame data = chunks after the 16-byte prologue (duration+flags)
    for cc, cb, csz in _walk_chunks(buf, body + 16, body + size):
        if cc == b"VP8L":
            frame = decode_vp8l(buf[cb:cb + csz])
            break
        if cc == b"VP8 ":
            raise _err("animated WebP with lossy (VP8) frames "
                       "unsupported")
        # ALPH etc.: skip
    if frame is None:
        raise _err("ANMF frame without an image chunk")
    if canvas is None:
        raise _err("animation without a VP8X canvas")
    cw, ch = canvas
    if cw * ch * 4 > MAX_PIXELS:
        raise _err(f"{cw}x{ch} canvas exceeds the decode budget")
    if frame.shape[1] != fw or frame.shape[0] != fh:
        raise _err("ANMF frame dims disagree with its image chunk")
    if fx + fw > cw or fy + fh > ch:
        raise _err("frame outside the canvas")
    b, g, r, a = bg if bg is not None else (255, 255, 255, 255)
    out = np.empty((ch, cw, 4), np.uint8)
    out[:] = (r, g, b, a)
    if frame.shape[2] == 3:
        frame = np.dstack(
            [frame, np.full(frame.shape[:2], 255, np.uint8)])
    out[fy:fy + fh, fx:fx + fw] = frame
    if int(out[:, :, 3].min()) == 255:
        return out[:, :, :3]
    return out


def decode_webp(buf: bytes) -> np.ndarray:
    """RIFF/WEBP container → pixels for the VP8L (lossless) payload —
    a plain still, inside a VP8X extended layout, or the FIRST frame
    of an animation (composited onto the canvas over the background
    color, the same contract as the first-frame GIF reader). Lossy
    VP8 side-drops with a reason (documented out-of-scope boundary —
    dims still parse header-only via multimodal.parse_image_header)."""
    saw_any = saw_anim = False
    canvas = None
    anim_bg = None
    for fourcc, body, size in _walk_riff_webp(buf):
        saw_any = True
        if fourcc == b"VP8X":
            if size >= 10:
                canvas = (
                    int.from_bytes(buf[body + 4:body + 7], "little") + 1,
                    int.from_bytes(buf[body + 7:body + 10], "little") + 1)
        elif fourcc == b"VP8L":
            return decode_vp8l(buf[body:body + size])
        elif fourcc == b"VP8 ":
            raise _err("lossy VP8 decode unsupported (out-of-scope "
                       "codec; dims parse header-only)")
        elif fourcc == b"ANIM":
            if size < 6:
                raise _err("ANIM chunk too short")
            saw_anim = True
            anim_bg = tuple(buf[body:body + 4])
        elif fourcc == b"ANMF":
            return _decode_first_frame(buf, body, size, canvas, anim_bg)
        # ICCP/EXIF/XMP/ALPH: metadata — keep walking
    if saw_anim:
        raise _err("animation without frames")
    raise _err("no VP8L image chunk" if saw_any
               else "bad RIFF/WEBP container")
