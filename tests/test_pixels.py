"""Real pixel decode/resize (operators/pixels.py): spec wire vectors
with INDEPENDENT forward implementations (PNG scanline filters and the
GIF LZW encoder are both re-implemented here in the forward direction,
so decoder agreement is a real cross-check, not self-validation),
hypothesis encode⇄decode round-trips, corrupt side-drops, resize math,
and the Spark mapInPandas e2e with the injector's side-drop idiom."""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_elasticsearch_injector_spark.operators import pixels as P

# --- hand-rolled PNG container (independent of the module's writer) --------

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def _png(w, h, depth, color_type, scanlines: bytes, plte=None, trns=None,
         interlace=0) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    out = _SIG + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    if trns is not None:
        out += _chunk(b"tRNS", trns)
    return out + _chunk(b"IDAT", zlib.compress(scanlines)) \
        + _chunk(b"IEND", b"")


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)


def _filter_forward(img: np.ndarray, ftypes: list[int]) -> bytes:
    """Forward scanline filtering per the spec — the test-side twin of
    the module's reverse path."""
    h, w, c = img.shape
    bpp = c
    prev = np.zeros(w * c, dtype=np.int32)
    out = bytearray()
    for y in range(h):
        raw = img[y].reshape(-1).astype(np.int32)
        ft = ftypes[y]
        out.append(ft)
        for x in range(w * c):
            left = int(raw[x - bpp]) if x >= bpp else 0
            up = int(prev[x])
            ul = int(prev[x - bpp]) if x >= bpp else 0
            if ft == 0:
                v = raw[x]
            elif ft == 1:
                v = raw[x] - left
            elif ft == 2:
                v = raw[x] - up
            elif ft == 3:
                v = raw[x] - ((left + up) >> 1)
            elif ft == 4:
                v = raw[x] - _paeth(left, up, ul)
            out.append(v & 0xFF)
        prev = raw
    return bytes(out)


RGB = np.array([[[10, 200, 30], [250, 5, 100], [0, 0, 255]],
                [[90, 90, 90], [12, 34, 56], [200, 100, 50]],
                [[1, 2, 3], [254, 253, 252], [128, 128, 128]],
                [[77, 66, 55], [44, 33, 22], [11, 99, 111]],
                [[0, 255, 0], [255, 0, 255], [17, 17, 17]]],
               dtype=np.uint8)


def test_png_all_five_filters_wire_vector():
    # one scanline per filter type, forward-filtered by the independent
    # test implementation — decode must reconstruct the exact pixels
    body = _filter_forward(RGB, [0, 1, 2, 3, 4])
    buf = _png(3, 5, 8, 2, body)
    assert np.array_equal(P.decode_png(buf), RGB)


def test_png_gray_and_alpha_color_types():
    gray = np.arange(12, dtype=np.uint8).reshape(3, 4, 1) * 20
    buf = _png(4, 3, 8, 0, _filter_forward(gray, [0, 4, 2]))
    assert np.array_equal(P.decode_png(buf), gray)
    ga = np.dstack([gray[:, :, 0], 255 - gray[:, :, 0]])
    buf = _png(4, 3, 8, 4, _filter_forward(ga, [1, 3, 0]))
    assert np.array_equal(P.decode_png(buf), ga)
    rgba = np.dstack([RGB[:3, :3], np.full((3, 3), 7, np.uint8)])
    buf = _png(3, 3, 8, 6, _filter_forward(rgba, [4, 4, 4]))
    assert np.array_equal(P.decode_png(buf), rgba)


def test_png_palette_depths_and_trns():
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])  # R G B gray
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], dtype=np.uint8)
    expect = np.array([[[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]],
                       [[9, 9, 9], [0, 0, 255], [0, 255, 0], [255, 0, 0]]],
                      dtype=np.uint8)
    # depth 8
    body = _filter_forward(idx[:, :, None], [0, 0])
    assert np.array_equal(P.decode_png(_png(4, 2, 8, 3, body, plte=pal)),
                          expect)
    # depth 2: 4 samples/byte, MSB first → one byte per row
    packed = bytes([0b00011011]) , bytes([0b11100100])
    body = b"\x00" + packed[0] + b"\x00" + packed[1]
    assert np.array_equal(P.decode_png(_png(4, 2, 2, 3, body, plte=pal)),
                          expect)
    # tRNS adds alpha (missing entries default 255)
    got = P.decode_png(_png(4, 2, 8, 3,
                            _filter_forward(idx[:, :, None], [0, 0]),
                            plte=pal, trns=bytes([128, 64])))
    assert got.shape == (2, 4, 4)
    assert list(got[0, :, 3]) == [128, 64, 255, 255]


def test_png_subbyte_grayscale_scales_to_8bit():
    # depth 1, width 10: 10 bits MSB-first → 2 bytes per scanline
    bits = [1, 0, 1, 1, 0, 0, 1, 0, 1, 1]
    b0 = int("".join(map(str, bits[:8])), 2)
    b1 = int("".join(map(str, bits[8:])) + "000000", 2)
    body = bytes([0, b0, b1])
    got = P.decode_png(_png(10, 1, 1, 0, body))
    assert got.shape == (1, 10, 1)
    assert list(got[0, :, 0]) == [v * 255 for v in bits]


def test_png_corrupt_and_unsupported_side_drop_reasons():
    good = P.encode_png(RGB)
    with pytest.raises(P.PixelDecodeError, match="CRC"):
        P.decode_png(good[:-5] + bytes(5))        # smashed IEND CRC
    with pytest.raises(P.PixelDecodeError, match="signature"):
        P.decode_png(b"not a png at all")
    with pytest.raises(P.PixelDecodeError, match="truncated"):
        P.decode_png(good[:30])
    with pytest.raises(P.PixelDecodeError, match="unknown interlace"):
        P.decode_png(_png(3, 5, 8, 2,
                          _filter_forward(RGB, [0] * 5), interlace=2))
    # an Adam7 flag on a sequential-layout body is a size lie
    with pytest.raises(P.PixelDecodeError, match="size mismatch"):
        P.decode_png(_png(3, 5, 8, 2,
                          _filter_forward(RGB, [0] * 5), interlace=1))
    with pytest.raises(P.PixelDecodeError, match="invalid for color"):
        P.decode_png(_png(1, 1, 16, 3, b"\x00\x00\x00"))
    with pytest.raises(P.PixelDecodeError, match="zlib"):
        P.decode_png(_SIG + _chunk(
            b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0))
            + _chunk(b"IDAT", b"\xff\xff\xff") + _chunk(b"IEND", b""))
    with pytest.raises(P.PixelDecodeError, match="PLTE"):
        P.decode_png(_png(1, 1, 8, 3, b"\x00\x00"))
    with pytest.raises(P.PixelDecodeError, match="size mismatch"):
        P.decode_png(_png(3, 5, 8, 2, _filter_forward(RGB, [0] * 5)[:-1]))


def test_bmp_24_and_32_bit_bottom_up_and_top_down():
    img = RGB[:2, :3]                             # 2x3 RGB

    def bmp(pixels: np.ndarray, bits: int, flip: bool) -> bytes:
        h, w = pixels.shape[:2]
        nch = bits // 8
        stride = (w * nch + 3) & ~3
        rows = []
        ys = range(h - 1, -1, -1) if flip else range(h)
        for y in ys:
            row = bytearray()
            for x in range(w):
                r, g, b = pixels[y, x]
                row += bytes([b, g, r] + ([0xAB] if nch == 4 else []))
            row += bytes(stride - len(row))
            rows.append(bytes(row))
        data = b"".join(rows)
        dib = struct.pack("<IiiHHIIiiII", 40, w, h if flip else -h, 1,
                          bits, 0, len(data), 2835, 2835, 0, 0)
        head = b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
        return head + dib + data

    got24 = P.decode_bmp(bmp(img, 24, flip=True))
    assert np.array_equal(got24, img)
    # the 4th byte of 32-bit BI_RGB is RESERVED, not alpha — it must be
    # dropped (surfacing it would make zeroed-reserved files, the
    # common case, fully transparent)
    got32 = P.decode_bmp(bmp(img, 32, flip=False))
    assert got32.shape == img.shape
    assert np.array_equal(got32, img)
    # 16-bit (BI_RGB) and BI_BITFIELDS stay out of scope
    for bad_bits, bad_comp in ((16, 0), (32, 3)):
        with pytest.raises(P.PixelDecodeError, match="unsupported"):
            P.decode_bmp(bmp(img, 24, flip=True)[:28]
                         + struct.pack("<HI", bad_bits, bad_comp)
                         + bmp(img, 24, flip=True)[34:])
    with pytest.raises(P.PixelDecodeError, match="truncated"):
        P.decode_bmp(bmp(img, 24, flip=True)[:-4])
    # bfOffBits pointing back into the headers would silently decode
    # header bytes as pixels — must side-drop, not return garbage
    good = bmp(img, 24, flip=True)
    for bad_off in (0, 13, 53):
        with pytest.raises(P.PixelDecodeError, match="offset"):
            P.decode_bmp(good[:10] + struct.pack("<I", bad_off)
                         + good[14:] + bytes(64))
    with pytest.raises(P.PixelDecodeError, match="offset"):
        P.decode_bmp(good[:10] + struct.pack("<I", len(good) + 1)
                     + good[14:])


def _bmp_pal(w, h, bits, comp, pal_rgb, body, clr_used=None):
    """Hand-built palettized BMP: pal_rgb is [(r,g,b), ...], body is
    the raw (already strided/encoded) pixel data. biClrUsed defaults
    to the actual table size (0 would declare a full 2^bits table)."""
    n = len(pal_rgb)
    if clr_used is None:
        clr_used = n
    pal = b"".join(bytes([b_, g, r, 0]) for r, g, b_ in pal_rgb)
    off = 14 + 40 + len(pal)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bits, comp,
                      len(body), 2835, 2835, clr_used, 0)
    head = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    return head + dib + pal + body


PAL_RGB = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)]


def test_bmp_palettized_1_4_8_bit():
    idx = np.array([[0, 1, 2, 3, 2], [3, 2, 1, 0, 1]], np.uint8)
    expect = np.array(PAL_RGB, np.uint8)[idx]
    # 8-bit: stride pads 5 -> 8 bytes; bottom-up storage
    body8 = b"".join(bytes(row) + bytes(3) for row in idx[::-1])
    got = P.decode_bmp(_bmp_pal(5, 2, 8, 0, PAL_RGB, body8))
    assert np.array_equal(got, expect)
    # 4-bit: high nibble first, 3 data bytes -> padded to 4
    def nibrow(row):
        out = bytearray()
        for i in range(0, len(row), 2):
            hi = row[i] << 4
            lo = row[i + 1] if i + 1 < len(row) else 0
            out.append(hi | lo)
        return bytes(out) + bytes(4 - len(out))
    body4 = b"".join(nibrow(list(row)) for row in idx[::-1])
    got = P.decode_bmp(_bmp_pal(5, 2, 4, 0, PAL_RGB, body4))
    assert np.array_equal(got, expect)
    # 1-bit: MSB-first, two colors
    bits1 = np.array([[1, 0, 1, 1, 0], [0, 1, 0, 0, 1]], np.uint8)
    body1 = b"".join(
        bytes([int("".join(map(str, row)) + "000", 2)]) + bytes(3)
        for row in bits1[::-1])
    got = P.decode_bmp(_bmp_pal(5, 2, 1, 0, PAL_RGB[:2], body1))
    assert np.array_equal(got, np.array(PAL_RGB[:2], np.uint8)[bits1])
    # biClrUsed shrinks the table; an index past it must side-drop
    with pytest.raises(P.PixelDecodeError, match="index out of range"):
        P.decode_bmp(_bmp_pal(5, 2, 8, 0, PAL_RGB[:2], body8,
                              clr_used=2))
    with pytest.raises(P.PixelDecodeError, match="truncated palette"):
        P.decode_bmp(_bmp_pal(5, 2, 8, 0, PAL_RGB, body8)[:60])


def test_bmp_rle8_and_rle4():
    # RLE8: encoded runs + absolute mode + delta + EOL + EOB over a
    # 6x3 canvas (bottom-up: first decoded row is the BOTTOM one)
    body = bytes([
        3, 1,                 # bottom row: 1 1 1
        0, 3, 0, 1, 2, 0,     # absolute 0 1 2 (+word-align pad byte)
        0, 0,                 # EOL
        0, 2, 2, 1,           # delta dx=2 dy=1: lands on stored row 2
        4, 3,                 # 3 3 3 3
        0, 1,                 # EOB
    ])
    got = P.decode_bmp(_bmp_pal(6, 3, 8, 1, PAL_RGB, body))
    exp_idx = np.zeros((3, 3 + 3), np.uint8)   # stored bottom-up
    exp_idx[0] = [1, 1, 1, 0, 1, 2]            # bottom
    exp_idx[2, 2:6] = 3                        # after delta(2,1)
    expect = np.array(PAL_RGB, np.uint8)[exp_idx[::-1]]
    assert np.array_equal(got, expect)
    # RLE4: a run alternates the byte's two nibbles; absolute packs
    # nibbles high-first, byte count rounded up to a word boundary
    # (3 nibbles -> 2 bytes, already even -> no pad)
    body4 = bytes([
        5, 0x12,              # 1 2 1 2 1
        0, 3, 0x23, 0x10,     # absolute 3 px: 2 3 1
        0, 0,                 # EOL
        8, 0x30,              # 3 0 3 0 3 0 3 0
        0, 1,                 # EOB
    ])
    got = P.decode_bmp(_bmp_pal(8, 2, 4, 2, PAL_RGB, body4))
    exp_idx = np.zeros((2, 8), np.uint8)
    exp_idx[0] = [1, 2, 1, 2, 1, 2, 3, 1]
    exp_idx[1] = [3, 0, 3, 0, 3, 0, 3, 0]
    assert np.array_equal(got,
                          np.array(PAL_RGB, np.uint8)[exp_idx[::-1]])
    # malformed RLE: run past the row, missing EOB, truncated delta
    with pytest.raises(P.PixelDecodeError, match="past the row"):
        P.decode_bmp(_bmp_pal(4, 2, 8, 1, PAL_RGB, bytes([9, 1, 0, 1])))
    with pytest.raises(P.PixelDecodeError, match="without end-of-bitmap"):
        P.decode_bmp(_bmp_pal(4, 2, 8, 1, PAL_RGB, bytes([2, 1])))
    with pytest.raises(P.PixelDecodeError, match="delta truncated"):
        P.decode_bmp(_bmp_pal(4, 2, 8, 1, PAL_RGB, bytes([0, 2])))
    # RLE requires bottom-up storage (positive height)
    neg = bytearray(_bmp_pal(4, 2, 8, 1, PAL_RGB, bytes([2, 1, 0, 1])))
    neg[22:26] = struct.pack("<i", -2)
    with pytest.raises(P.PixelDecodeError, match="bottom-up"):
        P.decode_bmp(bytes(neg))


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(1, 17), st.integers(1, 17),
       st.sampled_from([1, 2, 3, 4]))
def test_encode_decode_roundtrip_property(seed, h, w, c):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
    assert np.array_equal(P.decode_png(P.encode_png(img)), img)


_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _adam7_body(img: np.ndarray, ftype: int = 0) -> bytes:
    """Forward Adam7: each pass is an independent sub-image with its
    own scanline filtering (spec §8.2) — the test-side twin."""
    out = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = np.ascontiguousarray(img[y0::dy, x0::dx])
        if sub.size == 0:
            continue
        out += _filter_forward(sub, [ftype] * sub.shape[0])
    return bytes(out)


def test_png_adam7_interlace_roundtrip():
    got = P.decode_png(_png(3, 5, 8, 2, _adam7_body(RGB), interlace=1))
    assert np.array_equal(got, RGB)
    # with non-trivial per-pass filtering (Up needs the pass-local
    # previous row, not the image row)
    got = P.decode_png(_png(3, 5, 8, 2, _adam7_body(RGB, ftype=2),
                            interlace=1))
    assert np.array_equal(got, RGB)
    # large enough that every one of the 7 passes is non-empty
    rng = np.random.default_rng(11)
    big = rng.integers(0, 256, (10, 9, 4), dtype=np.uint8)
    got = P.decode_png(_png(9, 10, 8, 6, _adam7_body(big), interlace=1))
    assert np.array_equal(got, big)
    # tiny 1x1: six of seven passes are empty
    one = np.array([[[1, 2, 3]]], dtype=np.uint8)
    got = P.decode_png(_png(1, 1, 8, 2, _adam7_body(one), interlace=1))
    assert np.array_equal(got, one)


def test_png_16bit_reduces_to_high_byte():
    rng = np.random.default_rng(5)
    img16 = rng.integers(0, 1 << 16, (3, 4), dtype=np.uint16)
    body = b"".join(b"\x00" + row.astype(">u2").tobytes() for row in img16)
    got = P.decode_png(_png(4, 3, 16, 0, body))
    assert got.shape == (3, 4, 1)
    assert np.array_equal(got[:, :, 0], (img16 >> 8).astype(np.uint8))
    rgb16 = rng.integers(0, 1 << 16, (2, 3, 3), dtype=np.uint16)
    body = b"".join(b"\x00" + row.astype(">u2").tobytes() for row in rgb16)
    got = P.decode_png(_png(3, 2, 16, 2, body))
    assert np.array_equal(got, (rgb16 >> 8).astype(np.uint8))
    # 16-bit + tRNS (r14): the key is matched against the FULL 16-bit
    # samples BEFORE the high-byte reduction — two pixels sharing a
    # high byte must get different alphas when only one equals the key
    rgb16 = rgb16.copy()
    rgb16[0, 0] = (0x1234, 0x5678, 0x9ABC)
    rgb16[0, 1] = (0x1235, 0x5679, 0x9ABD)       # same high bytes
    body = b"".join(b"\x00" + row.astype(">u2").tobytes()
                    for row in rgb16)
    got = P.decode_png(_png(3, 2, 16, 2, body,
                            trns=struct.pack(">HHH", 0x1234, 0x5678,
                                             0x9ABC)))
    assert got.shape == (2, 3, 4)
    assert got[0, 0, 3] == 0 and got[0, 1, 3] == 255
    assert np.array_equal(got[:, :, :3], (rgb16 >> 8).astype(np.uint8))
    # a high-byte-only match would alias these; and the gray variant
    g16 = np.array([[0x0100, 0x0101, 0x01FF]], dtype=np.uint16)
    gbody = b"\x00" + g16.astype(">u2").tobytes()
    got = P.decode_png(_png(3, 1, 16, 0, gbody,
                            trns=struct.pack(">H", 0x0101)))
    assert got.shape == (1, 3, 2)
    assert list(got[0, :, 1]) == [255, 0, 255]
    assert list(got[0, :, 0]) == [1, 1, 1]       # high-byte view


def test_png_trns_gray_and_truecolor_keys():
    # truecolor: the keyed RGB becomes alpha 0, everything else 255
    img = RGB[:2, :3]
    key = img[0, 1]                              # (250, 5, 100)
    trns = b"".join(struct.pack(">H", int(v)) for v in key)
    got = P.decode_png(_png(3, 2, 8, 2, _filter_forward(img, [0, 0]),
                            trns=trns))
    assert got.shape == (2, 3, 4)
    assert got[0, 1, 3] == 0 and got[0, 0, 3] == 255
    assert np.array_equal(got[:, :, :3], img)
    # grayscale: single 16-bit key, compared pre-scaling
    gray = np.array([[[7], [9], [7]]], dtype=np.uint8)
    got = P.decode_png(_png(3, 1, 8, 0, _filter_forward(gray, [0]),
                            trns=struct.pack(">H", 7)))
    assert got.shape == (1, 3, 2)
    assert list(got[0, :, 1]) == [0, 255, 0]
    # tRNS longer than the palette is malformed, not a numpy traceback
    pal = bytes(6)
    with pytest.raises(P.PixelDecodeError, match="tRNS"):
        P.decode_png(_png(2, 1, 8, 3, b"\x00\x00\x01", plte=pal,
                          trns=bytes(5)))


def test_allocation_caps_and_zlib_bomb():
    # header-declared dims beyond the pixel cap must fail BEFORE any
    # allocation, for every decoder
    huge_png = _SIG + _chunk(b"IHDR", struct.pack(
        ">IIBBBBB", 65535, 65535, 8, 2, 0, 0, 0)) + _chunk(b"IEND", b"")
    with pytest.raises(P.PixelDecodeError, match="dimensions"):
        P.decode_png(huge_png)
    with pytest.raises(P.PixelDecodeError, match="dimensions"):
        P.decode_gif(b"GIF89a" + struct.pack("<HH", 65535, 65535)
                     + bytes(3))
    from kafka_elasticsearch_injector_spark.operators.jpeg_codec \
        import decode_jpeg

    def jpeg_header(w, h, ncomp):
        sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
        for cid in range(1, ncomp + 1):
            sof += bytes([cid, 0x11, 0])
        return b"\xff\xd8\xff\xc0" + struct.pack(
            ">H", len(sof) + 2) + sof + b"\xff\xd9\x00\x00"

    with pytest.raises(P.PixelDecodeError, match="byte budget"):
        decode_jpeg(jpeg_header(65535, 65535, 1))
    # the budget is BYTE-weighted: a 3-component 8000x8000 frame
    # would zero-fill ~1.5 GB of planes despite passing a flat 64 MP
    # pixel cap — it must be rejected at the header
    with pytest.raises(P.PixelDecodeError, match="byte budget"):
        decode_jpeg(jpeg_header(8000, 8000, 3))
    # the same dims in grayscale fit the budget: the header gate
    # passes and the failure moves to the (truncated) scan
    with pytest.raises(P.PixelDecodeError, match="EOI before scan"):
        decode_jpeg(jpeg_header(4000, 4000, 1))
    # zlib bomb: a few-KB IDAT declaring a 1x1 image must stop at the
    # bounded inflate, not materialize the payload
    bomb = zlib.compress(bytes(10_000_000), 9)
    buf = _SIG + _chunk(b"IHDR", struct.pack(
        ">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)) + _chunk(b"IDAT", bomb) \
        + _chunk(b"IEND", b"")
    with pytest.raises(P.PixelDecodeError, match="size mismatch"):
        P.decode_png(buf)


# --- GIF: independent forward LZW encoder + hand-built containers ----------

def _lzw_encode(min_code_size: int, data: bytes) -> bytes:
    """Forward GIF-LZW (spec appendix F), the test-side twin of the
    module's decoder: LSB-first packing, leading clear code, code size
    grows in lockstep with the table."""
    clear = 1 << min_code_size
    eoi = clear + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = clear + 2
    code_size = min_code_size + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    w = bytes([data[0]])
    for byte in data[1:]:
        c = bytes([byte])
        if w + c in table:
            w += c
            continue
        emit(table[w])
        if next_code < 4096:           # table freezes at the 12-bit
            table[w + c] = next_code   # ceiling, mirroring the decoder
            next_code += 1             # (which stops appending at 4096
            if next_code - 1 == (1 << code_size) and code_size < 12:
                code_size += 1         # and keeps decoding old codes)
        w = c
    emit(table[w])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif(sw, sh, palette: bytes, indices: bytes, min_code=2, fx=0, fy=0,
         fw=None, fh=None, interlace=False, transparent=None,
         ver=b"GIF89a") -> bytes:
    fw = sw if fw is None else fw
    fh = sh if fh is None else fh
    n = len(palette) // 3
    gct_bits = max(1, (n - 1).bit_length()) - 1
    pad = (2 << gct_bits) * 3 - len(palette)
    out = ver + struct.pack("<HH", sw, sh) \
        + bytes([0x80 | gct_bits, 0, 0]) + palette + bytes(pad)
    if transparent is not None:
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
    ipacked = 0x40 if interlace else 0
    out += bytes([0x2C]) + struct.pack("<HHHH", fx, fy, fw, fh) \
        + bytes([ipacked, min_code])
    lzw = _lzw_encode(min_code, indices)
    for i in range(0, len(lzw), 255):
        blk = lzw[i:i + 255]
        out += bytes([len(blk)]) + blk
    return out + bytes([0, 0x3B])


PAL4 = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])  # R G B gray


def test_gif_basic_full_frame_and_kwkwk():
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], dtype=np.uint8)
    got = P.decode_gif(_gif(4, 2, PAL4, idx.tobytes()))
    expect = np.frombuffer(PAL4, np.uint8).reshape(4, 3)[idx]
    assert np.array_equal(got, expect)
    # a run of identical pixels exercises the KwKwK code path
    run = bytes([1] * 9 + [2] * 7)
    got = P.decode_gif(_gif(16, 1, PAL4, run))
    assert np.array_equal(got[0, :, 1], np.where(
        np.frombuffer(run, np.uint8) == 1, 255, 0))


def test_gif_code_size_growth_roundtrip():
    # 8-color palette, 600 pseudo-random pixels: the LZW table crosses
    # several code-width boundaries — decoder must stay bit-synced
    rng = np.random.default_rng(7)
    pal = bytes(range(24))                       # 8 colors
    idx = rng.integers(0, 8, 600, dtype=np.uint8)
    got = P.decode_gif(_gif(30, 20, pal, idx.tobytes(), min_code=3))
    expect = np.frombuffer(pal, np.uint8).reshape(8, 3)[
        idx.reshape(20, 30)]
    assert np.array_equal(got, expect)


def test_gif_interlaced_rows_restored():
    h, w = 9, 3
    img = np.arange(h, dtype=np.uint8)[:, None].repeat(w, 1)  # row = its y
    # store rows in the spec's 4-pass order
    order = [y for first, step in ((0, 8), (4, 8), (2, 4), (1, 2))
             for y in range(first, h, step)]
    stored = img[order]
    pal = bytes(v for y in range(16) for v in (y, y, y))
    got = P.decode_gif(_gif(w, h, pal, stored.tobytes(), min_code=4,
                            interlace=True))
    assert np.array_equal(got[:, :, 0], img)


def test_gif_transparency_and_subrect_composite():
    idx = np.array([[1, 2]], dtype=np.uint8)
    buf = _gif(4, 3, PAL4, idx.tobytes(), fx=1, fy=1, fw=2, fh=1,
               transparent=2)
    got = P.decode_gif(buf)
    assert got.shape == (3, 4, 4)
    assert list(got[1, 1, :3]) == [0, 255, 0]    # palette 1 at (1,1)
    assert got[1, 1, 3] == 255
    assert got[1, 2, 3] == 0                     # transparent index 2
    assert list(got[0, 0, :3]) == [255, 0, 0]    # bg = global index 0
    assert got[0, 0, 3] == 255


def test_gif_corrupt_reasons():
    idx = bytes([0, 1, 2, 3])
    good = _gif(4, 1, PAL4, idx)
    with pytest.raises(P.PixelDecodeError, match="signature"):
        P.decode_gif(b"GIF88a" + good[6:])
    with pytest.raises(P.PixelDecodeError, match="truncated|unterminated"):
        P.decode_gif(good[:-6])
    with pytest.raises(P.PixelDecodeError, match="no image"):
        P.decode_gif(good[:13 + 12] + bytes([0x3B]))
    # frame rectangle outside the logical screen
    with pytest.raises(P.PixelDecodeError, match="outside"):
        P.decode_gif(_gif(2, 1, PAL4, idx, fw=4, fh=1))
    # index beyond the palette: 2-entry palette, index 3 in the data
    with pytest.raises(P.PixelDecodeError, match="index out of range"):
        P.decode_gif(_gif(4, 1, bytes(6), idx))


@settings(max_examples=150, deadline=None)
@given(st.integers(0, 2**32 - 1), st.sampled_from(["png", "bmp", "gif",
                                                   "bmp_rle", "rand"]),
       st.integers(0, 3))
def test_decode_pixels_fuzz_never_crashes(seed, kind, n_mut):
    """Malformed bytes must surface as PixelDecodeError (the side-drop
    reason), never IndexError/struct.error/zlib tracebacks: random
    buffers and bit-flipped valid images through every decoder."""
    rng = np.random.default_rng(seed)
    if kind == "rand":
        buf = bytes(rng.integers(0, 256, rng.integers(0, 200),
                                 dtype=np.uint8))
        # steer some samples into each parser's magic
        magic = [b"", _SIG, b"BM", b"GIF89a", b"\xff\xd8"][seed % 5]
        buf = magic + buf
    else:
        img = rng.integers(0, 256, (5, 4, 3), dtype=np.uint8)
        if kind == "png":
            buf = P.encode_png(img)
        elif kind == "gif":
            buf = _gif(4, 2, PAL4, bytes([0, 1, 2, 3, 3, 2, 1, 0]))
        elif kind == "bmp_rle":
            buf = _bmp_pal(6, 3, 8, 1, PAL_RGB,
                           bytes([3, 1, 0, 3, 0, 1, 2, 0, 0, 0,
                                  0, 2, 2, 1, 4, 3, 0, 1]))
        else:
            buf = (b"BM" + struct.pack("<IHHI", 0, 0, 0, 54)
                   + struct.pack("<IiiHHIIiiII", 40, 4, 2, 1, 24, 0,
                                 24, 0, 0, 0, 0) + bytes(24))
        buf = bytearray(buf)
        for _ in range(n_mut):
            buf[rng.integers(0, len(buf))] ^= 1 << rng.integers(0, 8)
        buf = bytes(buf)
    try:
        fmt, arr = P.decode_pixels(buf)
        assert arr.dtype == np.uint8 and arr.shape[0] > 0
    except P.PixelDecodeError:
        pass  # the side-drop contract


def test_decode_pixels_dispatch_and_dims_agree_with_header_parse():
    from kafka_elasticsearch_injector_spark.operators.multimodal import (
        parse_image_header,
    )

    buf = P.encode_png(RGB)
    fmt, arr = P.decode_pixels(buf)
    assert fmt == "png" and arr.shape == (5, 3, 3)
    assert parse_image_header(buf) == ("png", 3, 5)  # (w, h) vs (h, w, c)
    for bad, reason in ((b"\xff\xd8\xff\xe0rest", "jpeg"),
                        (b"GIF89a" + bytes(8), "gif"),
                        (b"????", "unknown")):
        with pytest.raises(P.PixelDecodeError, match=reason):
            P.decode_pixels(bad)


def test_apply_exif_orientation_all_eight():
    """Hand-derived expectations for every orientation on a 2x3 array
    (TIFF 6.0 semantics: the transform makes row 0 the visual top and
    column 0 the visual left)."""
    a = np.array([[1, 2, 3], [4, 5, 6]], np.uint8)
    want = {
        1: [[1, 2, 3], [4, 5, 6]],
        2: [[3, 2, 1], [6, 5, 4]],            # mirror horizontal
        3: [[6, 5, 4], [3, 2, 1]],            # rotate 180
        4: [[4, 5, 6], [1, 2, 3]],            # mirror vertical
        5: [[1, 4], [2, 5], [3, 6]],          # transpose
        6: [[4, 1], [5, 2], [6, 3]],          # rotate 90 CW
        7: [[6, 3], [5, 2], [4, 1]],          # transverse
        8: [[3, 6], [2, 5], [1, 4]],          # rotate 90 CCW
    }
    for o, exp in want.items():
        got = P.apply_exif_orientation(a, o)
        assert np.array_equal(got, np.array(exp)), o
    assert np.array_equal(P.apply_exif_orientation(a, None), a)
    assert np.array_equal(P.apply_exif_orientation(a, 0), a)
    # 3-channel arrays keep the channel axis untouched
    rgb = np.stack([a, a + 10, a + 20], axis=2)
    got = P.apply_exif_orientation(rgb, 6)
    assert got.shape == (3, 2, 3)
    assert np.array_equal(got[..., 1], np.array(want[6]) + 10)


def test_resize_nearest_exact_block_upscale_and_identity():
    img = np.array([[[0, 0, 0], [255, 255, 255]],
                    [[255, 0, 0], [0, 0, 255]]], dtype=np.uint8)
    assert np.array_equal(P.resize_nearest(img, 2, 2), img)
    up = P.resize_nearest(img, 4, 4)
    for by in range(2):
        for bx in range(2):
            block = up[2 * by:2 * by + 2, 2 * bx:2 * bx + 2]
            assert (block == img[by, bx]).all()


def test_resize_bilinear_identity_constant_and_hand_vector():
    img = RGB
    assert np.array_equal(P.resize_bilinear(img, 3, 5), img)  # exact grid
    const = np.full((4, 6, 3), 42, np.uint8)
    assert (P.resize_bilinear(const, 3, 2) == 42).all()
    # 1x2 [0, 255] → width 3: centers map to 0, midpoint (127.5→128), 1
    line = np.array([[[0], [255]]], dtype=np.uint8)
    assert list(P.resize_bilinear(line, 3, 1)[0, :, 0]) == [0, 128, 255]


def test_image_pixel_stats_spark_e2e(spark):
    rows = [
        (1, bytearray(P.encode_png(RGB))),
        (2, bytearray(b"\xff\xd8\xff\xe0 jpeg-ish")),
        (3, bytearray(b"garbage bytes")),
        (4, bytearray(P.encode_png(np.full((2, 2), 9, np.uint8)))),
        (5, bytearray(_gif(4, 2, PAL4, bytes([0, 1, 2, 3, 3, 2, 1, 0])))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    got = {r.doc_id: r for r in P.image_pixel_stats(df).collect()}
    assert got[5].format == "gif" and (got[5].width, got[5].height) == (4, 2)
    assert got[1].format == "png" and (got[1].width, got[1].height) == (3, 5)
    assert got[1].channels == 3
    exp_mean = RGB.reshape(-1, 3).astype(np.float64).mean(axis=0)
    assert got[1].channel_mean == pytest.approx(list(exp_mean))
    assert "jpeg" in got[2].decode_error and got[2].width is None
    assert "unknown" in got[3].decode_error
    assert got[4].channel_mean == [9.0] and got[4].channel_std == [0.0]


def test_resize_images_spark_e2e_deterministic_thumbnails(spark):
    img = np.arange(8 * 6 * 3, dtype=np.uint8).reshape(8, 6, 3)
    rows = [(1, bytearray(P.encode_png(img))),
            (2, bytearray(b"GIF89a" + bytes(10)))]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    out = {r.doc_id: r for r in P.resize_images(df, 4, 4).collect()}
    assert "gif" in out[2].decode_error and out[2].thumb is None
    thumb = bytes(out[1].thumb)
    arr = P.decode_png(thumb)
    assert arr.shape == (4, 4, 3)
    assert np.array_equal(arr, P.resize_bilinear(img, 4, 4))  # same kernel
    # byte-stable re-run: identical thumbnail content hash
    again = {r.doc_id: r for r in P.resize_images(df, 4, 4).collect()}
    assert hashlib.md5(bytes(again[1].thumb)).hexdigest() == \
        hashlib.md5(thumb).hexdigest()
    with pytest.raises(ValueError, match="method"):
        P.resize_images(df, 4, 4, method="lanczos")


def test_gif_table_freeze_long_stream_roundtrip():
    """A photo-sized frame overflows the 4096-entry LZW table, so the
    stream keeps coding against the frozen table — the decoder's
    freeze branch had no round-trip coverage before r15 (the forward
    encoder used to keep assigning codes past the ceiling, which no
    decoder accepts)."""
    rng = np.random.default_rng(3)
    h, w = 240, 320
    yy, xx = np.mgrid[0:h, 0:w]
    idx = ((xx * 255 // (w - 1) + yy * 131 // (h - 1)
            + rng.integers(0, 8, (h, w))) % 256).astype(np.uint8)
    palette = bytes(range(256)) * 3
    pal = np.frombuffer(palette, np.uint8).reshape(3, 256).T.copy()
    gif = _gif(w, h, pal.tobytes(), idx.tobytes(), min_code=8)
    got = P.decode_gif(gif)
    want = pal[idx]
    assert np.array_equal(got, want)


# --- hand-rolled TIFF container (independent of the module's reader) -------

def _tiff(w, h, raster: bytes, endian="<", compression=1, photometric=2,
          spp=3, bps=None, rows_per_strip=None, planar=1,
          extra_entries=()):
    """Forward baseline TIFF writer: header + strip data + IFD0 with
    offset-stored arrays where they don't fit inline (TIFF 6.0 §2).
    Strips split the raster at rows_per_strip boundaries."""
    e = endian
    magic = b"II*\x00" if e == "<" else b"MM\x00*"
    rps = h if rows_per_strip is None else rows_per_strip
    row_bytes = w * spp
    strips = []
    y = 0
    while y < h:
        rows = min(rps, h - y)
        strips.append(raster[y * row_bytes:(y + rows) * row_bytes])
        y += rows
    # layout: 8-byte header, strip data, IFD, then offset-stored arrays
    data_start = 8
    offs, pos = [], data_start
    for s in strips:
        offs.append(pos)
        pos += len(s)
    ifd_off = pos
    bps = [8] * spp if bps is None else bps

    entries = []                       # (tag, type, count, values)
    entries.append((256, 4, 1, [w]))
    entries.append((257, 4, 1, [h]))
    entries.append((258, 3, len(bps), bps))
    entries.append((259, 3, 1, [compression]))
    entries.append((262, 3, 1, [photometric]))
    entries.append((273, 4, len(offs), offs))
    entries.append((277, 3, 1, [spp]))
    entries.append((278, 4, 1, [rps]))
    entries.append((279, 4, len(strips), [len(s) for s in strips]))
    entries.append((284, 3, 1, [planar]))
    entries.extend(extra_entries)
    entries.sort()

    n = len(entries)
    tail_off = ifd_off + 2 + 12 * n + 4
    ifd = struct.pack(e + "H", n)
    tail = b""
    for tag, typ, cnt, vals in entries:
        width, fmt = (2, "H") if typ == 3 else (4, "I")
        raw = struct.pack(e + str(cnt) + fmt, *vals)
        if len(raw) <= 4:
            val_bytes = raw + bytes(4 - len(raw))
        else:
            val_bytes = struct.pack(e + "I", tail_off + len(tail))
            tail += raw
        ifd += struct.pack(e + "HHI", tag, typ, cnt) + val_bytes
    ifd += struct.pack(e + "I", 0)     # no next IFD
    return (magic + struct.pack(e + "I", ifd_off)
            + b"".join(strips) + ifd + tail)


def test_tiff_rgb_multistrip_roundtrip_both_endians():
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (7, 5, 3), np.uint8)
    for e in ("<", ">"):
        buf = _tiff(5, 7, img.tobytes(), endian=e, rows_per_strip=3)
        fmt, got = P.decode_pixels(buf)
        assert fmt == "tiff"
        assert np.array_equal(got, img), e


def test_tiff_grayscale_both_photometrics():
    img = np.arange(24, dtype=np.uint8).reshape(4, 6) * 10
    buf = _tiff(6, 4, img.tobytes(), photometric=1, spp=1)
    assert np.array_equal(P.decode_tiff(buf), img[:, :, None])
    # photometric 0: white-is-zero, decoder inverts
    buf = _tiff(6, 4, img.tobytes(), photometric=0, spp=1)
    assert np.array_equal(P.decode_tiff(buf), 255 - img[:, :, None])


def test_tiff_header_dims_and_kernel_ride(spark):
    from kafka_elasticsearch_injector_spark.operators.multimodal import (
        parse_image_header,
    )
    img = np.full((4, 6, 3), 200, np.uint8)
    buf = _tiff(6, 4, img.tobytes(), endian=">", rows_per_strip=2)
    assert parse_image_header(buf) == ("tiff", 6, 4)
    df = spark.createDataFrame([(1, bytearray(buf))],
                               "doc_id long, media binary")
    row = P.image_pixel_stats(df).collect()[0]
    assert row.format == "tiff" and (row.width, row.height) == (6, 4)
    assert row.channels == 3
    assert row.channel_mean == pytest.approx([200.0, 200.0, 200.0])


def test_tiff_unsupported_and_corrupt_reasons():
    img = np.zeros((2, 2, 3), np.uint8)
    raster = img.tobytes()
    with pytest.raises(P.PixelDecodeError, match="compression 7"):
        P.decode_tiff(_tiff(2, 2, raster, compression=7))  # JPEG-in-TIFF
    with pytest.raises(P.PixelDecodeError, match="planar"):
        P.decode_tiff(_tiff(2, 2, raster, planar=2))
    with pytest.raises(P.PixelDecodeError, match="8-bit"):
        P.decode_tiff(_tiff(2, 2, raster, bps=[16, 16, 16]))
    with pytest.raises(P.PixelDecodeError, match="photometric 3"):
        P.decode_tiff(_tiff(2, 2, raster, photometric=3))
    with pytest.raises(P.PixelDecodeError, match="tiled"):
        P.decode_tiff(_tiff(2, 2, raster,
                            extra_entries=[(322, 4, 1, [16])]))
    # declared strip byte count disagreeing with rows*row_bytes: patch
    # the inline 279 value (last strip count) of a valid single-strip
    # file from 12 to 13
    good = _tiff(2, 2, raster)
    i = good.rindex(struct.pack("<I", 12))
    with pytest.raises(P.PixelDecodeError, match="strip size"):
        P.decode_tiff(good[:i] + struct.pack("<I", 13) + good[i + 4:])
    with pytest.raises(P.PixelDecodeError, match="malformed IFD"):
        P.decode_tiff(b"II*\x00\xff\xff\xff\xff")
    # budget: a crafted huge header must fail before allocation
    with pytest.raises(P.PixelDecodeError, match="decode budget"):
        P.decode_tiff(_huge_tiff())


def _huge_tiff():
    # header declaring 60000x60000x3 with a single (bogus) strip
    e = "<"
    entries = [
        (256, 4, 1, [60000]), (257, 4, 1, [60000]),
        (258, 3, 3, [8, 8, 8]), (259, 3, 1, [1]), (262, 3, 1, [2]),
        (273, 4, 1, [8]), (277, 3, 1, [3]), (278, 4, 1, [60000]),
        (279, 4, 1, [4]), (284, 3, 1, [1]),
    ]
    ifd_off = 12
    n = len(entries)
    tail_off = ifd_off + 2 + 12 * n + 4
    ifd = struct.pack(e + "H", n)
    tail = b""
    for tag, typ, cnt, vals in entries:
        width, fmt = (2, "H") if typ == 3 else (4, "I")
        raw = struct.pack(e + str(cnt) + fmt, *vals)
        if len(raw) <= 4:
            vb = raw + bytes(4 - len(raw))
        else:
            vb = struct.pack(e + "I", tail_off + len(tail))
            tail += raw
        ifd += struct.pack(e + "HHI", tag, typ, cnt) + vb
    ifd += struct.pack(e + "I", 0)
    return b"II*\x00" + struct.pack(e + "I", ifd_off) + bytes(4) \
        + ifd + tail


def test_tiff_fuzz_side_drop_contract():
    rng = np.random.default_rng(13)
    base = _tiff(8, 8, rng.integers(0, 256, (8, 8, 3), np.uint8)
                 .tobytes(), rows_per_strip=3)
    for _ in range(400):
        buf = bytearray(base)
        for _ in range(rng.integers(1, 4)):
            buf[rng.integers(0, len(buf))] ^= 1 << rng.integers(0, 8)
        try:
            fmt, arr = P.decode_pixels(bytes(buf))
            assert arr.dtype == np.uint8
        except P.PixelDecodeError:
            pass


def test_tiff_review_fixes(spark):
    """r15 second-review findings on the TIFF add: crafted 2^31 dims
    must not reach the Int32 dims kernel; a bare TIFF's own IFD0
    Orientation must flow through the Exif path (TIFF IS the carrier
    structure); a truncated entry list keeps tags read before the
    cut."""
    from kafka_elasticsearch_injector_spark.operators.multimodal import (
        parse_exif_orientation,
        parse_image_header,
    )
    img = np.full((4, 6, 3), 0, np.uint8)
    img[:, :, 0] = 255                                # red raster
    # 1. dims at/over 2^31 → None (the PNG-branch bound)
    big = _tiff(6, 4, img.tobytes(),
                extra_entries=())
    i = big.index(struct.pack("<HHI", 256, 4, 1))
    patched = big[:i + 8] + struct.pack("<I", 1 << 31) + big[i + 12:]
    assert parse_image_header(patched) is None
    # 2. bare-TIFF orientation: tag 0x0112 in IFD0
    rot = _tiff(6, 4, img.tobytes(),
                extra_entries=[(0x0112, 3, 1, [6])])
    assert parse_exif_orientation(rot) == 6
    df = spark.createDataFrame([(1, bytearray(rot))],
                               "doc_id long, media binary")
    row = P.image_pixel_stats(df).collect()[0]
    assert (row.width, row.height) == (4, 6)          # rotated display
    # 3. truncated entry list: entries read before the cut survive —
    # bump the declared entry count past the real one
    tr = _tiff(6, 4, img.tobytes(),
               extra_entries=[(0x0112, 3, 1, [6])])
    e_ifd = struct.unpack("<I", tr[4:8])[0]
    (n,) = struct.unpack("<H", tr[e_ifd:e_ifd + 2])
    bumped = tr[:e_ifd] + struct.pack("<H", n + 4) + tr[e_ifd + 2:]
    assert parse_exif_orientation(bumped) == 6


def _packbits_encode(row: bytes) -> bytes:
    """Forward PackBits (TIFF 6.0 §9), one row at a time (runs must
    not cross row boundaries): repeat packets for runs >= 3, literal
    packets otherwise."""
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        run = 1
        while i + run < n and run < 128 and row[i + run] == row[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, row[i]])
            i += run
            continue
        lit_start = i
        while i < n and i - lit_start < 128:
            run = 1
            while i + run < n and run < 3 and row[i + run] == row[i]:
                run += 1
            if run >= 3:
                break
            i += 1
        out += bytes([i - lit_start - 1]) + row[lit_start:i]
    return bytes(out)


def _tiff_lzw_encode(data: bytes) -> bytes:
    """Forward TIFF-LZW (TIFF 6.0 §13): MSB-first packing, 9-bit
    start, EARLY CHANGE (width grows when the next free code reaches
    2^width — one sooner than GIF), clear at table-full."""
    out = bytearray()
    acc = nbits = 0
    width = 9

    def emit(code):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
            acc &= (1 << nbits) - 1

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(256)                              # leading Clear
    w_s = bytes([data[0]])
    for b in data[1:]:
        c = bytes([b])
        if w_s + c in table:
            w_s += c
            continue
        emit(table[w_s])
        if next_code < 4094:
            table[w_s + c] = next_code
            next_code += 1
            if next_code >= (1 << width) and width < 12:
                width += 1
        else:                              # table full: clear + reset
            emit(256)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w_s = c
    emit(table[w_s])
    emit(257)                              # EOI
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _pack_codes_msb(codes, widths):
    """Bit-pack an explicit (code, width) list MSB-first — the
    hand-vector path, independent of the forward encoder."""
    acc = nbits = 0
    out = bytearray()
    for code, width in zip(codes, widths):
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
            acc &= (1 << nbits) - 1
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def test_tiff_lzw_hand_derived_wire_vector():
    """Spec-walked vector: [7,7,7,8,8,7] codes as Clear,7,258(KwKwK),
    8,8,7,EOI — all 9-bit. Packed here from the explicit code list,
    independent of the forward encoder."""
    wire = _pack_codes_msb([256, 7, 258, 8, 8, 7, 257], [9] * 7)
    assert P._tiff_lzw(wire, 6) == bytes([7, 7, 7, 8, 8, 7])


def test_tiff_lzw_and_packbits_roundtrip():
    rng = np.random.default_rng(14)
    # enough distinct sequences to cross the 9->10->11-bit widths
    img = rng.integers(0, 256, (40, 40, 3), np.uint8)
    raster = img.tobytes()
    out = P._tiff_lzw(_tiff_lzw_encode(raster), len(raster))
    assert out == raster
    # low-entropy data exercises long runs + table reuse
    img2 = np.repeat(np.arange(64, dtype=np.uint8), 200).reshape(80, -1)
    r2 = img2.tobytes()
    assert P._tiff_lzw(_tiff_lzw_encode(r2), len(r2)) == r2
    rows = [r2[i:i + img2.shape[1]] for i in range(0, len(r2),
                                                   img2.shape[1])]
    pb = b"".join(_packbits_encode(r) for r in rows)
    assert P._packbits(pb, len(r2)) == r2


def _tiff_compressed(w, h, raster, comp, spp=3, rows_per_strip=None,
                     predictor=1, photometric=2):
    """Build a compressed TIFF through the uncompressed writer's
    container, swapping in encoded strips."""
    rps = h if rows_per_strip is None else rows_per_strip
    row_bytes = w * spp
    if predictor == 2:
        arr = np.frombuffer(raster, np.uint8).reshape(h, w, spp)
        diff = arr.astype(np.int64)
        diff[:, 1:] -= arr[:, :-1].astype(np.int64)
        raster = (diff & 0xFF).astype(np.uint8).tobytes()
    strips = []
    y = 0
    while y < h:
        rows = min(rps, h - y)
        chunk = raster[y * row_bytes:(y + rows) * row_bytes]
        if comp == 5:
            strips.append(_tiff_lzw_encode(chunk))
        else:
            strips.append(b"".join(
                _packbits_encode(chunk[i:i + row_bytes])
                for i in range(0, len(chunk), row_bytes)))
        y += rows
    # container: header + strips + IFD (reuse _tiff's layout manually)
    e = "<"
    data_start = 8
    offs, pos = [], data_start
    for s in strips:
        offs.append(pos)
        pos += len(s)
    ifd_off = pos
    entries = [
        (256, 4, 1, [w]), (257, 4, 1, [h]), (258, 3, spp, [8] * spp),
        (259, 3, 1, [comp]), (262, 3, 1, [photometric]),
        (273, 4, len(offs), offs), (277, 3, 1, [spp]),
        (278, 4, 1, [rps]), (279, 4, len(strips),
                             [len(s) for s in strips]),
        (284, 3, 1, [1]), (317, 3, 1, [predictor]),
    ]
    entries.sort()
    n = len(entries)
    tail_off = ifd_off + 2 + 12 * n + 4
    ifd = struct.pack(e + "H", n)
    tail = b""
    for tag, typ, cnt, vals in entries:
        width_b, fmt = (2, "H") if typ == 3 else (4, "I")
        raw = struct.pack(e + str(cnt) + fmt, *vals)
        if len(raw) <= 4:
            vb = raw + bytes(4 - len(raw))
        else:
            vb = struct.pack(e + "I", tail_off + len(tail))
            tail += raw
        ifd += struct.pack(e + "HHI", tag, typ, cnt) + vb
    ifd += struct.pack(e + "I", 0)
    return (b"II*\x00" + struct.pack(e + "I", ifd_off)
            + b"".join(strips) + ifd + tail)


def test_tiff_lzw_and_packbits_full_file_roundtrip():
    rng = np.random.default_rng(15)
    img = rng.integers(0, 256, (13, 9, 3), np.uint8)
    for comp in (5, 32773):
        buf = _tiff_compressed(9, 13, img.tobytes(), comp,
                               rows_per_strip=4)
        fmt, got = P.decode_pixels(buf)
        assert fmt == "tiff" and np.array_equal(got, img), comp
    # LZW + horizontal-differencing predictor (the common pairing)
    buf = _tiff_compressed(9, 13, img.tobytes(), 5, rows_per_strip=4,
                           predictor=2)
    assert np.array_equal(P.decode_tiff(buf), img)
    # grayscale LZW with predictor
    g = rng.integers(0, 256, (6, 11), np.uint8)
    buf = _tiff_compressed(11, 6, g.tobytes(), 5, spp=1, predictor=2,
                           photometric=1)
    assert np.array_equal(P.decode_tiff(buf), g[:, :, None])


def test_tiff_compressed_fuzz_side_drop_contract():
    rng = np.random.default_rng(16)
    base = _tiff_compressed(
        8, 8, rng.integers(0, 256, (8, 8, 3), np.uint8).tobytes(), 5,
        rows_per_strip=3, predictor=2)
    for _ in range(400):
        buf = bytearray(base)
        for _ in range(rng.integers(1, 4)):
            buf[rng.integers(0, len(buf))] ^= 1 << rng.integers(0, 8)
        try:
            fmt, arr = P.decode_pixels(bytes(buf))
            assert arr.dtype == np.uint8
        except P.PixelDecodeError:
            pass
