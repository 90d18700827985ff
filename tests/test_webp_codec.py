"""VP8L (WebP lossless) decoder tests.

Grounding strategy (the jpeg_codec pattern): an INDEPENDENT forward
VP8L encoder lives in this file — written from the public spec (RFC
9649 §5), sharing no code with the decoder — so encoder/decoder
agreement is a cross-check, not a tautology; plus HAND-DERIVED wire
vectors assembled bit-by-bit from the spec's field listing; plus fuzz
asserting malformed bytes only ever raise the side-drop error type.
"""

from __future__ import annotations

import heapq
import itertools
import struct

import numpy as np
import pytest

from kafka_elasticsearch_injector_spark.operators import pixels as P
from kafka_elasticsearch_injector_spark.operators import webp_codec as W
from kafka_elasticsearch_injector_spark.operators.multimodal import (
    parse_image_header,
)

# --- independent forward encoder (RFC 9649 §5) -------------------------------


class _BitW:
    """LSB-first bit writer (the VP8L packing order)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def w(self, val: int, nbits: int) -> None:
        assert 0 <= val < (1 << nbits), (val, nbits)
        self.acc |= val << self.n
        self.n += nbits
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def bytes(self) -> bytes:
        out = bytes(self.out)
        if self.n:
            out += bytes([self.acc & 0xFF])
        return out


def _huff_lengths(freqs: dict[int, int]) -> dict[int, int]:
    """Code lengths via the classic heap merge (NOT the decoder's
    canonical-table builder)."""
    if len(freqs) == 1:
        return {next(iter(freqs)): 1}
    cnt = itertools.count()
    heap = [(f, next(cnt), (s,)) for s, f in sorted(freqs.items())]
    heapq.heapify(heap)
    depth = {s: 0 for s in freqs}
    while len(heap) > 1:
        f1, _, g1 = heapq.heappop(heap)
        f2, _, g2 = heapq.heappop(heap)
        for s in g1 + g2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, next(cnt), g1 + g2))
    assert max(depth.values()) <= 15, "test fixture too skewed"
    return depth


def _canonical(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """Canonical (code, len) per symbol, MSB-first values."""
    out = {}
    code = 0
    cur = 0
    for ln, s in sorted((ln, s) for s, ln in lengths.items() if ln):
        code <<= ln - cur
        cur = ln
        out[s] = (code, ln)
        code += 1
    return out


def _emit_sym(bw: _BitW, codes, s) -> None:
    code, ln = codes[s]
    rev = int(f"{code:0{ln}b}"[::-1], 2) if ln else 0
    bw.w(rev, ln)


_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13,
              14, 15)


def _cl_tokens(lengths: list[int], upto: int):
    """RLE the code-length sequence for symbols [0, upto): literals,
    16 = repeat prev nonzero 3-6, 17 = 3-10 zeros, 18 = 11-138."""
    toks = []
    i = 0
    while i < upto:
        v = lengths[i]
        run = 1
        while i + run < upto and lengths[i + run] == v:
            run += 1
        if v == 0:
            while run >= 3:
                r = min(run, 138)
                if r >= 11:
                    toks.append((18, r - 11, 7))
                else:
                    toks.append((17, r - 3, 3))
                run -= r
                i += r
            for _ in range(run):
                toks.append((0, 0, 0))
                i += 1
        else:
            toks.append((v, 0, 0))
            i += 1
            run -= 1
            while run >= 3:
                r = min(run, 6)
                toks.append((16, r - 3, 2))
                run -= r
                i += r
            for _ in range(run):
                toks.append((v, 0, 0))
                i += 1
    return toks


def _write_code(bw: _BitW, lengths_map: dict[int, int],
                alphabet_size: int, use_max_symbol: bool = False) -> None:
    """One prefix-code definition: the simple form when 1-2 symbols all
    fit in 8 bits, the normal (code-length-coded) form otherwise."""
    used = sorted(s for s, ln in lengths_map.items() if ln)
    if not used:
        used = [0]
        lengths_map = {0: 1}
    if len(used) <= 2 and max(used) <= 255:
        bw.w(1, 1)                           # simple
        bw.w(len(used) - 1, 1)
        if used[0] > 1:
            bw.w(1, 1)
            bw.w(used[0], 8)
        else:
            bw.w(0, 1)
            bw.w(used[0], 1)
        if len(used) == 2:
            bw.w(used[1], 8)
        return
    bw.w(0, 1)                               # normal form
    lengths = [0] * alphabet_size
    for s in used:
        lengths[s] = lengths_map[s]
    upto = alphabet_size
    if use_max_symbol:
        upto = used[-1] + 1
    toks = _cl_tokens(lengths, upto)
    if use_max_symbol and len(toks) < 2:
        toks.append((0, 0, 0))               # pad: field stores count-2
    clc_len = _huff_lengths(
        {s: f for s, f in
         zip(*np.unique([t[0] for t in toks], return_counts=True))})
    assert max(clc_len.values()) <= 7, "cl code too deep for 3-bit field"
    num_clc = max(4, max(_CLC_ORDER.index(s) for s in clc_len) + 1)
    bw.w(num_clc - 4, 4)
    for i in range(num_clc):
        bw.w(clc_len.get(_CLC_ORDER[i], 0), 3)
    if use_max_symbol:
        bw.w(1, 1)
        nbits, k = 2, 0
        while len(toks) - 2 >= (1 << nbits):
            nbits += 2
            k += 1
        bw.w(k, 3)
        bw.w(len(toks) - 2, nbits)
    else:
        bw.w(0, 1)
    codes = _canonical(clc_len)
    for sym, extra, ebits in toks:
        _emit_sym(bw, codes, sym)
        if ebits:
            bw.w(extra, ebits)


def _prefix_encode(v: int) -> tuple[int, int, int]:
    """Inverse of the LZ77 prefix value coding: (code, extra, ebits)."""
    x = v - 1
    if x < 4:
        return x, 0, 0
    n = x.bit_length() - 1
    b = (x >> (n - 1)) & 1
    return 2 * n + b, x & ((1 << (n - 1)) - 1), n - 1


_HASH_MUL = 0x1E35A7BD


def _fwd_predict(pix, w, h, mode):
    """Forward predictor residuals, written independently from the
    decoder: channel tuples, spec edge rules (top-left → opaque black,
    row 0 → L, column 0 → T, rightmost TR → leftmost of same row)."""
    def ch(p):
        return ((p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF,
                p & 0xFF)

    def avg2(p, q):
        return tuple((a + b) >> 1 for a, b in zip(p, q))

    def clamp(v):
        return max(0, min(255, v))

    out = []
    for y in range(h):
        for x in range(w):
            cur = ch(pix[y * w + x])
            if x == 0 and y == 0:
                pred = (255, 0, 0, 0)
            elif y == 0:
                pred = ch(pix[y * w + x - 1])
            elif x == 0:
                pred = ch(pix[(y - 1) * w])
            else:
                left = ch(pix[y * w + x - 1])
                top = ch(pix[(y - 1) * w + x])
                tl = ch(pix[(y - 1) * w + x - 1])
                tr = ch(pix[(y - 1) * w + x + 1]) if x + 1 < w \
                    else ch(pix[y * w])
                if mode == 0:
                    pred = (255, 0, 0, 0)
                elif mode == 1:
                    pred = left
                elif mode == 2:
                    pred = top
                elif mode == 3:
                    pred = tr
                elif mode == 4:
                    pred = tl
                elif mode == 5:
                    pred = avg2(avg2(left, tr), top)
                elif mode == 6:
                    pred = avg2(left, tl)
                elif mode == 7:
                    pred = avg2(left, top)
                elif mode == 8:
                    pred = avg2(tl, top)
                elif mode == 9:
                    pred = avg2(top, tr)
                elif mode == 10:
                    pred = avg2(avg2(left, tl), avg2(top, tr))
                elif mode == 11:
                    p = [lc + tc - tlc
                         for lc, tc, tlc in zip(left, top, tl)]
                    pl = sum(abs(pc - lc) for pc, lc in zip(p, left))
                    pt = sum(abs(pc - tc) for pc, tc in zip(p, top))
                    pred = left if pl < pt else top
                elif mode == 12:
                    pred = tuple(clamp(lc + tc - tlc)
                                 for lc, tc, tlc in zip(left, top, tl))
                else:                         # mode 13
                    ave = avg2(left, top)
                    pred = []
                    for ac, tlc in zip(ave, tl):
                        d = ac - tlc
                        half = d // 2 if d >= 0 else -((-d) // 2)
                        pred.append(clamp(ac + half))
                    pred = tuple(pred)
            res = tuple((c - p) & 0xFF for c, p in zip(cur, pred))
            out.append((res[0] << 24) | (res[1] << 16) | (res[2] << 8)
                       | res[3])
    return out


def _sub_pixels(p, q):
    return (((((p >> 24) & 0xFF) - ((q >> 24) & 0xFF)) & 0xFF) << 24) \
        | (((((p >> 16) & 0xFF) - ((q >> 16) & 0xFF)) & 0xFF) << 16) \
        | (((((p >> 8) & 0xFF) - ((q >> 8) & 0xFF)) & 0xFF) << 8) \
        | ((((p & 0xFF) - (q & 0xFF)) & 0xFF))


def _encode_body(bw, pix, w, h, *, level0, cache_bits=0, lz77=False,
                 meta_groups=None, use_max_symbol=False):
    """Entropy-coded image data: cache bit, meta codes (level0), code
    groups, then the symbol stream. Mirrors decoder state (cache
    inserts on every emitted pixel, including inside copies)."""
    if cache_bits:
        bw.w(1, 1)
        bw.w(cache_bits, 4)
    else:
        bw.w(0, 1)
    group_of = None
    num_groups = 1
    meta_bits = 0
    if level0:
        if meta_groups:
            meta_bits, group_rows = meta_groups
            bw.w(1, 1)
            bw.w(meta_bits - 2, 3)
            mw = -(-w // (1 << meta_bits))
            mh = -(-h // (1 << meta_bits))
            assert len(group_rows) == mh and len(group_rows[0]) == mw
            mpix = [(0xFF << 24) | (g << 8)
                    for row in group_rows for g in row]
            _encode_body(bw, mpix, mw, mh, level0=False)
            num_groups = max(max(r) for r in group_rows) + 1

            def group_of(pos):
                y, x = divmod(pos, w)
                return group_rows[y >> meta_bits][x >> meta_bits]
        else:
            bw.w(0, 1)
    # tokenize: (group, kind, payload)
    cache = [0] * (1 << cache_bits) if cache_bits else None
    shift = 32 - cache_bits if cache_bits else 0
    # reverse neighbor map: smallest code per realized distance
    near = {}
    for i, (dx, dy) in enumerate(W._DIST_MAP):
        d = dy * w + dx
        if d >= 1 and d not in near:
            near[d] = i + 1
    ops = []
    n = len(pix)
    pos = 0
    while pos < n:
        g = group_of(pos) if group_of else 0
        best_len = 0
        best_dist = 0
        if lz77 and pos:
            for dist in range(1, pos + 1):
                ln = 0
                while pos + ln < n and ln < 4000 \
                        and pix[pos + ln - dist] == pix[pos + ln]:
                    ln += 1
                if ln > best_len:
                    best_len, best_dist = ln, dist
        if best_len >= 3:
            ops.append((g, "copy", (best_len, best_dist)))
            for k in range(best_len):
                if cache is not None:
                    px = pix[pos + k]
                    cache[((px * _HASH_MUL) & 0xFFFFFFFF) >> shift] = px
            pos += best_len
            continue
        px = pix[pos]
        if cache is not None \
                and cache[((px * _HASH_MUL) & 0xFFFFFFFF) >> shift] == px:
            ops.append((g, "cached",
                        ((px * _HASH_MUL) & 0xFFFFFFFF) >> shift))
        else:
            ops.append((g, "lit", px))
            if cache is not None:
                cache[((px * _HASH_MUL) & 0xFFFFFFFF) >> shift] = px
        pos += 1
    # frequencies per group for the 5 alphabets
    freqs = [[{} for _ in range(5)] for _ in range(num_groups)]

    def bump(g, i, s):
        freqs[g][i][s] = freqs[g][i].get(s, 0) + 1

    for g, kind, payload in ops:
        if kind == "lit":
            px = payload
            bump(g, 0, (px >> 8) & 0xFF)
            bump(g, 1, (px >> 16) & 0xFF)
            bump(g, 2, px & 0xFF)
            bump(g, 3, (px >> 24) & 0xFF)
        elif kind == "cached":
            bump(g, 0, 280 + payload)
        else:
            ln, dist = payload
            bump(g, 0, 256 + _prefix_encode(ln)[0])
            dcode = near.get(dist, dist + 120)
            bump(g, 4, _prefix_encode(dcode)[0])
    cache_size = (1 << cache_bits) if cache_bits else 0
    sizes = (280 + cache_size, 256, 256, 256, 40)
    all_codes = []
    for g in range(num_groups):
        codes = []
        for i in range(5):
            ln_map = _huff_lengths(freqs[g][i]) if freqs[g][i] else {}
            _write_code(bw, ln_map, sizes[i],
                        use_max_symbol=use_max_symbol)
            codes.append(_canonical(ln_map) if len(ln_map) > 1
                         else {s: (0, 0) for s in ln_map})
        all_codes.append(codes)
    for g, kind, payload in ops:
        green, red, blue, alpha, distc = all_codes[g]
        if kind == "lit":
            px = payload
            _emit_sym(bw, green, (px >> 8) & 0xFF)
            _emit_sym(bw, red, (px >> 16) & 0xFF)
            _emit_sym(bw, blue, px & 0xFF)
            _emit_sym(bw, alpha, (px >> 24) & 0xFF)
        elif kind == "cached":
            _emit_sym(bw, green, 280 + payload)
        else:
            ln, dist = payload
            code, extra, ebits = _prefix_encode(ln)
            _emit_sym(bw, green, 256 + code)
            bw.w(extra, ebits)
            dcode = near.get(dist, dist + 120)
            code, extra, ebits = _prefix_encode(dcode)
            _emit_sym(bw, distc, code)
            bw.w(extra, ebits)


def encode_vp8l(rgba: np.ndarray, *, subtract_green=False,
                predictor=None, palette=False, cache_bits=0,
                lz77=False, meta_groups=None,
                use_max_symbol=False) -> bytes:
    """Forward VP8L: RGBA/RGB (H, W, C) uint8 → chunk payload bytes.
    predictor = (mode, size_bits) applies one spatial mode everywhere;
    meta_groups = (meta_bits, group_rows) splits code groups by tile."""
    h, w = rgba.shape[:2]
    a = (rgba[:, :, 3].astype(np.uint32) if rgba.shape[2] == 4
         else np.full((h, w), 255, np.uint32))
    pix = ((a << 24) | (rgba[:, :, 0].astype(np.uint32) << 16)
           | (rgba[:, :, 1].astype(np.uint32) << 8)
           | rgba[:, :, 2].astype(np.uint32)).ravel().tolist()
    bw = _BitW()
    bw.w(0x2F, 8)
    bw.w(w - 1, 14)
    bw.w(h - 1, 14)
    bw.w(int(rgba.shape[2] == 4), 1)
    bw.w(0, 3)                                # version
    cur_w = w
    if subtract_green:
        bw.w(1, 1)
        bw.w(2, 2)
        pix = [(p & 0xFF00FF00)
               | (((((p >> 16) & 0xFF) - ((p >> 8) & 0xFF)) & 0xFF) << 16)
               | ((((p & 0xFF) - ((p >> 8) & 0xFF)) & 0xFF))
               for p in pix]
    if predictor is not None:
        mode, size_bits = predictor
        bw.w(1, 1)
        bw.w(0, 2)
        bw.w(size_bits - 2, 3)
        bwid = -(-cur_w // (1 << size_bits))
        bhei = -(-h // (1 << size_bits))
        _encode_body(bw, [(0xFF << 24) | (mode << 8)] * (bwid * bhei),
                     bwid, bhei, level0=False)
        pix = _fwd_predict(pix, cur_w, h, mode)
    if palette:
        pal = list(dict.fromkeys(pix))
        assert len(pal) <= 256
        bw.w(1, 1)
        bw.w(3, 2)
        bw.w(len(pal) - 1, 8)
        deltas = [pal[0]] + [_sub_pixels(pal[i], pal[i - 1])
                             for i in range(1, len(pal))]
        _encode_body(bw, deltas, len(pal), 1, level0=False)
        index = {p: i for i, p in enumerate(pal)}
        width_bits = (3 if len(pal) <= 2 else 2 if len(pal) <= 4
                      else 1 if len(pal) <= 16 else 0)
        per = 1 << width_bits
        bits = 8 >> width_bits
        packed_w = -(-cur_w // per)
        packed = []
        for y in range(h):
            row = [index[pix[y * cur_w + x]] for x in range(cur_w)]
            for bx in range(packed_w):
                byte = 0
                for k, v in enumerate(row[bx * per:(bx + 1) * per]):
                    byte |= v << (k * bits)
                packed.append((0xFF << 24) | (byte << 8))
        pix = packed
        cur_w = packed_w
    bw.w(0, 1)                                # end of transforms
    _encode_body(bw, pix, cur_w, h, level0=True, cache_bits=cache_bits,
                 lz77=lz77, meta_groups=meta_groups,
                 use_max_symbol=use_max_symbol)
    return bw.bytes()


def _webp_wrap(payload: bytes) -> bytes:
    body = b"WEBPVP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _rand_rgba(rng, h, w, c=4, levels=None):
    if levels:
        vals = rng.choice(levels, size=(h, w, c))
    else:
        vals = rng.integers(0, 256, size=(h, w, c))
    return vals.astype(np.uint8)


# --- round trips: encoder and decoder written independently ------------------

def test_roundtrip_literals_only():
    rng = np.random.default_rng(7)
    img = _rand_rgba(rng, 13, 9)
    img[:, :, 3] = 255                        # fully opaque → RGB out
    got = W.decode_vp8l(encode_vp8l(img))
    assert got.shape == (13, 9, 3)
    assert np.array_equal(got, img[:, :, :3])


def test_roundtrip_preserves_alpha():
    rng = np.random.default_rng(8)
    img = _rand_rgba(rng, 6, 11)
    img[0, 0, 3] = 254
    got = W.decode_vp8l(encode_vp8l(img))
    assert got.shape == (6, 11, 4)
    assert np.array_equal(got, img)


def test_roundtrip_subtract_green():
    rng = np.random.default_rng(9)
    img = _rand_rgba(rng, 8, 8)
    got = W.decode_vp8l(encode_vp8l(img, subtract_green=True))
    assert np.array_equal(got, img if img[:, :, 3].min() < 255
                          else img[:, :, :3])


@pytest.mark.parametrize("mode", range(14))
def test_roundtrip_every_predictor_mode(mode):
    rng = np.random.default_rng(100 + mode)
    img = _rand_rgba(rng, 11, 14)
    img[:, :, 3] = 255
    raw = encode_vp8l(img, predictor=(mode, 4))
    assert np.array_equal(W.decode_vp8l(raw), img[:, :, :3]), mode


def test_roundtrip_predictor_plus_subtract_green():
    rng = np.random.default_rng(10)
    img = _rand_rgba(rng, 9, 17)
    raw = encode_vp8l(img, subtract_green=True, predictor=(11, 2))
    assert np.array_equal(W.decode_vp8l(raw), img)


@pytest.mark.parametrize("ncolors,width_bits", [(2, 3), (3, 2), (4, 2),
                                                (9, 1), (16, 1),
                                                (40, 0), (250, 0)])
def test_roundtrip_palette_bundling(ncolors, width_bits):
    rng = np.random.default_rng(200 + ncolors)
    levels = rng.integers(0, 256, size=(ncolors, 4)).astype(np.uint8)
    levels[:, 3] = 255
    idx = rng.integers(0, ncolors, size=(7, 13))
    img = levels[idx]
    # ensure every color appears (palette = first-appearance order)
    img[0, :min(13, ncolors)] = levels[:min(13, ncolors)]
    got = W.decode_vp8l(encode_vp8l(img, palette=True))
    assert np.array_equal(got, img[:, :, :3])


def test_roundtrip_color_cache_and_lz77():
    rng = np.random.default_rng(11)
    # few distinct colors + repetition → caches hit, copies fire
    levels = np.array([10, 200, 77], np.uint8)
    img = np.stack([levels[rng.integers(0, 3, (12, 12))]
                    for _ in range(3)] + [np.full((12, 12), 255, np.uint8)],
                   axis=2)
    for cache_bits, lz77 in [(0, True), (4, False), (6, True), (11, True)]:
        raw = encode_vp8l(img, cache_bits=cache_bits, lz77=lz77)
        assert np.array_equal(W.decode_vp8l(raw), img[:, :, :3]), \
            (cache_bits, lz77)


def test_roundtrip_meta_prefix_groups():
    rng = np.random.default_rng(12)
    img = _rand_rgba(rng, 10, 16)
    img[:, :8] //= 4                          # statistically split halves
    img[:, :, 3] = 255
    group_rows = [[0, 1, 1, 1]] * 3           # 16 px wide, meta_bits=2 → 4
    raw = encode_vp8l(img, meta_groups=(2, group_rows))
    assert np.array_equal(W.decode_vp8l(raw), img[:, :, :3])


def test_roundtrip_max_symbol_form():
    rng = np.random.default_rng(13)
    img = _rand_rgba(rng, 9, 9)
    img[:, :, 3] = 255
    raw = encode_vp8l(img, use_max_symbol=True)
    assert np.array_equal(W.decode_vp8l(raw), img[:, :, :3])


def test_roundtrip_everything_at_once():
    rng = np.random.default_rng(14)
    img = _rand_rgba(rng, 16, 16, levels=[5, 99, 180])
    raw = encode_vp8l(img, subtract_green=True, predictor=(7, 3),
                      cache_bits=3, lz77=True, use_max_symbol=True)
    assert np.array_equal(W.decode_vp8l(raw),
                          img if img[:, :, 3].min() < 255
                          else img[:, :, :3])


def test_hypothesis_style_many_seeds():
    for seed in range(30):
        rng = np.random.default_rng(1000 + seed)
        h, w = int(rng.integers(1, 20)), int(rng.integers(1, 20))
        img = _rand_rgba(rng, h, w,
                         levels=[0, 3, 250] if seed % 2 else None)
        kw = {}
        if seed % 3 == 0:
            kw["cache_bits"] = int(rng.integers(1, 8))
        if seed % 3 == 1:
            kw["lz77"] = True
        if seed % 5 == 0:
            kw["subtract_green"] = True
        raw = encode_vp8l(img, **kw)
        got = W.decode_vp8l(raw)
        want = img if img[:, :, 3].min() < 255 else img[:, :, :3]
        assert np.array_equal(got, want), (seed, kw)


# --- hand-derived wire vectors (spec field listing, no encoder) --------------

def test_hand_vector_single_pixel_simple_codes():
    """1x1 image, five 1-symbol simple codes → zero data bits. Every
    field below is written straight from the RFC 9649 §5 field order,
    independently of the encoder above."""
    bw = _BitW()
    bw.w(0x2F, 8)                             # signature
    bw.w(0, 14)                               # width - 1
    bw.w(0, 14)                               # height - 1
    bw.w(0, 1)                                # alpha hint
    bw.w(0, 3)                                # version
    bw.w(0, 1)                                # no transforms
    bw.w(0, 1)                                # no color cache
    bw.w(0, 1)                                # no meta prefix codes
    for sym in (42, 7, 9, 255, 0):            # green, red, blue, alpha, dist
        bw.w(1, 1)                            # simple code
        bw.w(0, 1)                            # one symbol
        bw.w(1, 1)                            # 8-bit symbol
        bw.w(sym, 8)
    got = W.decode_vp8l(bw.bytes())
    assert got.shape == (1, 1, 3)
    assert got.tolist() == [[[7, 42, 9]]]     # r, g, b


def test_hand_vector_two_symbol_code_bit_order():
    """2x1, green via a 2-symbol simple code: canonical order means the
    SMALLER symbol takes bit 0 regardless of listing order."""
    bw = _BitW()
    bw.w(0x2F, 8)
    bw.w(1, 14)                               # width 2
    bw.w(0, 14)                               # height 1
    bw.w(0, 1)
    bw.w(0, 3)
    bw.w(0, 1)                                # no transforms
    bw.w(0, 1)                                # no cache
    bw.w(0, 1)                                # no meta
    bw.w(1, 1)                                # green: simple
    bw.w(1, 1)                                # two symbols
    bw.w(1, 1)                                # first is 8-bit
    bw.w(200, 8)                              # listed first, but LARGER
    bw.w(3, 8)                                # so 3 ← bit 0, 200 ← bit 1
    for sym in (1, 2, 254, 0):                # red, blue, alpha, dist
        bw.w(1, 1)
        bw.w(0, 1)
        bw.w(1, 1)
        bw.w(sym, 8)
    bw.w(1, 1)                                # pixel 0: green 200
    bw.w(0, 1)                                # pixel 1: green 3
    got = W.decode_vp8l(bw.bytes())
    # alpha 254 < 255 → RGBA output
    assert got.tolist() == [[[1, 200, 2, 254], [1, 3, 2, 254]]]


def test_hand_vector_normal_code_lz77_neighbor_distance():
    """3x1: literal then a length-2 copy at neighbor-map code 2 =
    (dx 1, dy 0) → distance 1. Exercises the normal-code path:
    code-length code, 17/18 zero runs, max_symbol early stop, LZ77
    length prefix, and the close-neighbor distance table."""
    bw = _BitW()
    bw.w(0x2F, 8)
    bw.w(2, 14)                               # width 3
    bw.w(0, 14)                               # height 1
    bw.w(0, 1)
    bw.w(0, 3)
    bw.w(0, 1)                                # no transforms
    bw.w(0, 1)                                # no cache
    bw.w(0, 1)                                # no meta
    # GREEN: normal code; used symbols: 5 (literal green) and 257
    # (length prefix code 1 → length 2), both code length 1.
    # cl tokens: 17(run 5 zeros) lit1 18(138 zeros) 18(113 zeros) lit1
    # → 5 tokens, max_symbol form. cl code lengths: {1:2, 17:2, 18:1}
    bw.w(0, 1)                                # not simple
    # _CLC_ORDER = 17 18 0 1 2 3 4 5 16 6 7 ... — need through index 3
    bw.w(0, 4)                                # num_code_lengths = 4
    bw.w(2, 3)                                # len(17) = 2
    bw.w(1, 3)                                # len(18) = 1
    bw.w(0, 3)                                # len(0)  = 0
    bw.w(2, 3)                                # len(1)  = 2
    # canonical over cl alphabet: 18→0; 1→10; 17→11 (MSB-first)
    bw.w(1, 1)                                # use max_symbol
    bw.w(0, 3)                                # length_nbits = 2
    bw.w(3, 2)                                # max_symbol = 2 + 3 = 5
    bw.w(0b11, 2)                             # 17: canonical 11, rev 11
    bw.w(2, 3)                                # 3+2 = 5 zeros (syms 0-4)
    bw.w(0b01, 2)                             # literal 1: rev(10) = 01
    bw.w(0, 1)                                # 18: code '0'
    bw.w(127, 7)                              # 138 zeros
    bw.w(0, 1)                                # 18 again
    bw.w(102, 7)                              # 113 zeros → at symbol 257
    bw.w(0b01, 2)                             # literal 1 at symbol 257
    # RED, BLUE, ALPHA: single-symbol simple codes
    for sym in (8, 6, 255):
        bw.w(1, 1)
        bw.w(0, 1)
        bw.w(1, 1)
        bw.w(sym, 8)
    # DIST: single-symbol simple code, symbol 1 → lz77 value 2 →
    # neighbor entry 2 = (1, 0) → distance 1
    bw.w(1, 1)
    bw.w(0, 1)
    bw.w(0, 1)                                # 1-bit symbol form
    bw.w(1, 1)                                # symbol 1
    # pixel data: green code: 5→'0', 257→'1' (canonical, 1 bit each)
    bw.w(0, 1)                                # literal green 5
    bw.w(1, 1)                                # copy: green symbol 257
    # length prefix code 1 has no extra bits; dist code is 0-bit
    got = W.decode_vp8l(bw.bytes())
    assert got.tolist() == [[[8, 5, 6]] * 3]


# --- container dispatch, side-drops, budget -----------------------------------

def test_container_dispatch_and_lossy_side_drop():
    rng = np.random.default_rng(15)
    img = _rand_rgba(rng, 4, 5)
    img[:, :, 3] = 255
    buf = _webp_wrap(encode_vp8l(img))
    assert parse_image_header(buf) == ("webp", 5, 4)
    fmt, arr = P.decode_pixels(buf)
    assert fmt == "webp" and np.array_equal(arr, img[:, :, :3])
    lossy = (b"RIFF" + struct.pack("<I", 24) + b"WEBPVP8 "
             + struct.pack("<I", 12) + b"\x10\x00\x00\x9d\x01\x2a"
             + struct.pack("<HH", 5, 4) + b"\x00\x00")
    with pytest.raises(P.PixelDecodeError, match="lossy VP8"):
        P.decode_pixels(lossy)
    anim = (b"RIFF" + struct.pack("<I", 18) + b"WEBPANIM"
            + struct.pack("<I", 6) + b"\x00" * 6)
    with pytest.raises(P.PixelDecodeError, match="animation without"):
        P.decode_pixels(anim)
    with pytest.raises(P.PixelDecodeError, match="no VP8L"):
        W.decode_webp(b"RIFF" + struct.pack("<I", 14) + b"WEBPXMP "
                      + struct.pack("<I", 2) + b"hi")
    with pytest.raises(P.PixelDecodeError, match="container"):
        W.decode_webp(b"RIFF\x00\x00\x00\x00WAVE")


def test_vp8x_wrapped_vp8l_decodes():
    rng = np.random.default_rng(16)
    img = _rand_rgba(rng, 3, 3)
    img[:, :, 3] = 255
    payload = encode_vp8l(img)
    vp8x = b"\x00\x00\x00\x00" + (2).to_bytes(3, "little") \
        + (2).to_bytes(3, "little")
    body = (b"WEBPVP8X" + struct.pack("<I", 10) + vp8x
            + b"VP8L" + struct.pack("<I", len(payload)) + payload)
    if len(payload) & 1:
        body += b"\x00"
    buf = b"RIFF" + struct.pack("<I", len(body)) + body
    fmt, arr = P.decode_pixels(buf)
    assert fmt == "webp" and np.array_equal(arr, img[:, :, :3])


def _anim_webp(frames, canvas_wh, bg=(0, 0, 0, 255), loop=0):
    """Animated container: VP8X + ANIM + one ANMF per (payload, fx,
    fy, fw, fh). bg is (B, G, R, A) — the container's byte order."""
    cw, chh = canvas_wh
    chunks = [(b"VP8X", b"\x02\x00\x00\x00"
               + (cw - 1).to_bytes(3, "little")
               + (chh - 1).to_bytes(3, "little")),
              (b"ANIM", bytes(bg) + struct.pack("<H", loop))]
    for payload, fx, fy, fw, fh in frames:
        anmf = ((fx // 2).to_bytes(3, "little")
                + (fy // 2).to_bytes(3, "little")
                + (fw - 1).to_bytes(3, "little")
                + (fh - 1).to_bytes(3, "little")
                + b"\x64\x00\x00" + b"\x00"    # duration 100ms, flags
                + b"VP8L" + struct.pack("<I", len(payload)) + payload)
        if len(payload) & 1:
            anmf += b"\x00"
        chunks.append((b"ANMF", anmf))
    body = b"WEBP"
    for cc, pl in chunks:
        body += cc + struct.pack("<I", len(pl)) + pl
        if len(pl) & 1:
            body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_animation_first_frame_composites_onto_canvas():
    """First-frame decode for VP8L-coded animations — the GIF
    first-frame contract: frame at its offset over the ANIM
    background color (stored B,G,R,A), canvas dims from VP8X."""
    rng = np.random.default_rng(20)
    img = _rand_rgba(rng, 2, 3)
    img[:, :, 3] = 255
    payload = encode_vp8l(img)
    # bg bytes B=9 G=8 R=7 A=255 → canvas pixels RGB (7, 8, 9)
    buf = _anim_webp([(payload, 2, 4, 3, 2)], (8, 8), bg=(9, 8, 7, 255))
    fmt, arr = P.decode_pixels(buf)
    assert fmt == "webp" and arr.shape == (8, 8, 3)
    assert np.array_equal(arr[4:6, 2:5], img[:, :, :3])
    assert arr[0, 0].tolist() == [7, 8, 9]
    assert (arr[:4] == [7, 8, 9]).all() and (arr[6:] == [7, 8, 9]).all()
    # a second frame is ignored: FIRST frame only, like the GIF reader
    two = _anim_webp([(payload, 0, 0, 3, 2), (payload, 4, 4, 3, 2)],
                     (8, 8))
    _, arr2 = P.decode_pixels(two)
    assert np.array_equal(arr2[0:2, 0:3], img[:, :, :3])
    assert (arr2[4:6, 4:7] == 0).all()        # second frame NOT drawn
    # transparent background → RGBA out
    _, arr3 = P.decode_pixels(
        _anim_webp([(payload, 0, 0, 3, 2)], (4, 4), bg=(0, 0, 0, 0)))
    assert arr3.shape == (4, 4, 4)
    assert arr3[3, 3].tolist() == [0, 0, 0, 0]
    assert arr3[0, 0, 3] == 255


def test_animation_reasons():
    rng = np.random.default_rng(21)
    img = _rand_rgba(rng, 2, 2)
    payload = encode_vp8l(img)
    with pytest.raises(P.PixelDecodeError, match="outside the canvas"):
        W.decode_webp(_anim_webp([(payload, 6, 6, 2, 2)], (7, 7)))
    with pytest.raises(P.PixelDecodeError, match="dims disagree"):
        W.decode_webp(_anim_webp([(payload, 0, 0, 3, 2)], (8, 8)))
    # lossy frame: ANMF wrapping a VP8 chunk
    lossy_anmf = (bytes(6) + (1).to_bytes(3, "little")
                  + (1).to_bytes(3, "little") + bytes(4)
                  + b"VP8 " + struct.pack("<I", 4) + b"\x10\x00\x00\x9d")
    body = (b"WEBPVP8X" + struct.pack("<I", 10) + b"\x02\x00\x00\x00"
            + (1).to_bytes(3, "little") + (1).to_bytes(3, "little")
            + b"ANIM" + struct.pack("<I", 6) + bytes(6)
            + b"ANMF" + struct.pack("<I", len(lossy_anmf)) + lossy_anmf)
    buf = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(P.PixelDecodeError, match="lossy.*frames"):
        W.decode_webp(buf)
    # ANMF too short / no image chunk / missing canvas
    def riff(body):
        return b"RIFF" + struct.pack("<I", len(body)) + body

    with pytest.raises(P.PixelDecodeError, match="ANMF chunk too short"):
        W.decode_webp(riff(b"WEBPANIM" + struct.pack("<I", 6) + bytes(6)
                           + b"ANMF" + struct.pack("<I", 2) + b"\x00\x00"))
    anmf16 = bytes(6) + (2).to_bytes(3, "little") \
        + (2).to_bytes(3, "little") + bytes(4)
    with pytest.raises(P.PixelDecodeError, match="without an image"):
        W.decode_webp(riff(b"WEBPANIM" + struct.pack("<I", 6) + bytes(6)
                           + b"ANMF" + struct.pack("<I", 16) + anmf16))
    with pytest.raises(P.PixelDecodeError, match="without a VP8X"):
        body = (b"WEBPANIM" + struct.pack("<I", 6) + bytes(6)
                + b"ANMF" + struct.pack("<I", 16 + 8 + len(payload))
                + bytes(6) + (1).to_bytes(3, "little")
                + (1).to_bytes(3, "little") + bytes(4)
                + b"VP8L" + struct.pack("<I", len(payload)) + payload)
        W.decode_webp(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_header_budget_rejects_before_allocating():
    bw = _BitW()
    bw.w(0x2F, 8)
    bw.w(16383, 14)                           # 16384 x 16384 declared
    bw.w(16383, 14)
    bw.w(0, 1)
    bw.w(0, 3)
    with pytest.raises(P.PixelDecodeError, match="decode budget"):
        W.decode_vp8l(bw.bytes())


def test_pixel_buffer_stays_unboxed():
    """The budget charges 4 bytes/pixel; a Python-list pixel buffer of
    fresh PyLongs weighs ~44 (r15 review finding: a 12-byte header
    could allocate ~11x the cap). 0.36 MPix via 0-bit codes must peak
    well under the boxed regime (~44 B/px ≈ 15.8 MB here); the
    unboxed array('I') + numpy path stays ~25 B/px ≈ 9 MB. (The
    contract is the per-pixel ratio — the image was shrunk from 1 MPix
    to keep the tracemalloc run seconds, not minutes, with the
    thresholds scaled by the same factor.)"""
    import tracemalloc

    bw = _BitW()
    bw.w(0x2F, 8)
    bw.w(599, 14)                             # 600 x 600
    bw.w(599, 14)
    bw.w(0, 1)
    bw.w(0, 3)
    bw.w(0, 1)                                # no transforms
    bw.w(0, 1)                                # no cache
    bw.w(0, 1)                                # no meta
    for sym in (42, 7, 9, 255, 0):            # five 0-bit codes
        bw.w(1, 1)
        bw.w(0, 1)
        bw.w(1, 1)
        bw.w(sym, 8)
    buf = bw.bytes()
    assert len(buf) < 20                      # the amplification vector
    tracemalloc.start()
    arr = W.decode_vp8l(buf)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert arr.shape == (600, 600, 3)
    assert (arr == [7, 42, 9]).all()
    assert peak < 12.6e6, f"pixel buffer boxing regressed: peak {peak}"
    # and the predictor-inverse path (second review finding: a whole-
    # image int64 residual array measured ~69 B/px; residuals must be
    # extracted per row)
    bw = _BitW()
    bw.w(0x2F, 8)
    bw.w(599, 14)
    bw.w(599, 14)
    bw.w(0, 1)
    bw.w(0, 3)
    bw.w(1, 1)                                # a transform follows
    bw.w(0, 2)                                # predictor transform
    bw.w(7, 3)                                # size_bits 9 → 2x2 blocks
    bw.w(0, 1)                                # subimage: no cache
    for sym in (2, 0, 0, 255, 0):             # mode 2 (T) everywhere
        bw.w(1, 1)
        bw.w(0, 1)
        bw.w(1, 1)
        bw.w(sym, 8)
    bw.w(0, 1)                                # end of transforms
    bw.w(0, 1)                                # no cache
    bw.w(0, 1)                                # no meta
    for sym in (1, 1, 1, 0, 0):               # residual (0,1,1,1) px
        bw.w(1, 1)
        bw.w(0, 1)
        bw.w(1, 1)
        bw.w(sym, 8)
    buf = bw.bytes()
    assert len(buf) < 30
    tracemalloc.start()
    arr = W.decode_vp8l(buf)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert arr.shape == (600, 600, 3)
    # row 0 follows L (accumulates x), then mode T accumulates down
    # each column: arr[y, x] = (x + 1 + y) mod 256 per channel
    assert arr[0, 0].tolist() == [1, 1, 1]
    assert arr[0, 3].tolist() == [4, 4, 4]
    assert arr[500, 3].tolist() == [248, 248, 248]   # 504 mod 256
    assert peak < 14.4e6, f"predictor residual boxing regressed: {peak}"


def test_corrupt_reasons():
    rng = np.random.default_rng(17)
    img = _rand_rgba(rng, 5, 5)
    raw = encode_vp8l(img)
    with pytest.raises(P.PixelDecodeError, match="signature"):
        W.decode_vp8l(b"\x30" + raw[1:])
    with pytest.raises(P.PixelDecodeError, match="version"):
        W.decode_vp8l(raw[:4] + bytes([raw[4] | 0x80]) + raw[5:])
    with pytest.raises(P.PixelDecodeError):
        W.decode_vp8l(raw[:6])                # truncated mid-header
    with pytest.raises(P.PixelDecodeError):
        W.decode_vp8l(raw[:-2])               # truncated pixel data


def test_fuzz_mutations_never_crash_or_hang():
    """Byte/bit mutations of valid streams and random tails must only
    ever raise the side-drop error type — never segfault-class numpy
    errors, unbounded allocation, or silent wrong exceptions."""
    rng = np.random.default_rng(18)
    img = _rand_rgba(rng, 6, 7, levels=[1, 128, 255])
    base = encode_vp8l(img, cache_bits=2, lz77=True)
    wrapped = _webp_wrap(base)
    for trial in range(400):
        b = bytearray(wrapped)
        for _ in range(int(rng.integers(1, 4))):
            b[int(rng.integers(12, len(b)))] = int(rng.integers(0, 256))
        try:
            fmt, arr = P.decode_pixels(bytes(b))
            assert fmt == "webp" and arr.ndim == 3
        except P.PixelDecodeError:
            pass
    for trial in range(200):
        junk = bytes(rng.integers(0, 256, size=int(rng.integers(0, 60)),
                                  dtype=np.uint8))
        try:
            W.decode_vp8l(b"\x2f" + junk)
        except P.PixelDecodeError:
            pass


def test_distance_map_matches_spec_head():
    """First rows of the spec §5.2.3 distance table, transcribed by
    hand — guards the generation rule."""
    assert W._DIST_MAP[:18] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2),
        (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0),
        (1, 3), (-1, 3), (3, 1), (-3, 1)]
    assert len(W._DIST_MAP) == 120
    assert W._DIST_MAP[96] == (8, 0)          # first |dx|=8 entry
    assert W._DIST_MAP[-1] == (8, 7)


def test_pixel_stats_and_resize_ride_webp(spark):
    rng = np.random.default_rng(19)
    img = _rand_rgba(rng, 8, 6)
    img[:, :, 3] = 255
    good = _webp_wrap(encode_vp8l(img))
    lossy = (b"RIFF" + struct.pack("<I", 24) + b"WEBPVP8 "
             + struct.pack("<I", 12) + b"\x10\x00\x00\x9d\x01\x2a"
             + struct.pack("<HH", 6, 8) + b"\x00\x00")
    df = spark.createDataFrame(
        [(1, good, "image/webp"), (2, lossy, "image/webp")],
        "doc_id long, media binary, media_type string")
    stats = {r.doc_id: r for r in P.image_pixel_stats(df).collect()}
    assert (stats[1].format, stats[1].width, stats[1].height,
            stats[1].channels) == ("webp", 6, 8, 3)
    assert stats[1].channel_mean == pytest.approx(
        img[:, :, :3].reshape(-1, 3).mean(axis=0).tolist())
    assert stats[1].decode_error is None
    assert "lossy VP8" in stats[2].decode_error
    thumbs = {r.doc_id: r for r in
              P.resize_images(df, 3, 3, "nearest").collect()}
    assert thumbs[1].decode_error is None
    want = P.resize_nearest(img[:, :, :3], 3, 3)
    assert np.array_equal(P.decode_png(bytes(thumbs[1].thumb)), want)
    assert "lossy VP8" in thumbs[2].decode_error
