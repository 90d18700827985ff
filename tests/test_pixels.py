"""Real pixel decode/resize (operators/pixels.py): spec wire vectors
with an INDEPENDENT forward-filter implementation (the module only
implements the reverse direction, so agreement is a real cross-check),
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
    with pytest.raises(P.PixelDecodeError, match="interlace"):
        P.decode_png(_png(3, 5, 8, 2,
                          _filter_forward(RGB, [0] * 5), interlace=1))
    with pytest.raises(P.PixelDecodeError, match="16-bit"):
        P.decode_png(_png(1, 1, 16, 0, b"\x00\x00\x00"))
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
    got32 = P.decode_bmp(bmp(img, 32, flip=False))
    assert np.array_equal(got32[:, :, :3], img)
    assert (got32[:, :, 3] == 0xAB).all()
    with pytest.raises(P.PixelDecodeError, match="unsupported"):
        P.decode_bmp(bmp(img, 24, flip=True)[:28]
                     + struct.pack("<HI", 8, 0)
                     + bmp(img, 24, flip=True)[34:])
    with pytest.raises(P.PixelDecodeError, match="truncated"):
        P.decode_bmp(bmp(img, 24, flip=True)[:-4])


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(1, 17), st.integers(1, 17),
       st.sampled_from([1, 2, 3, 4]))
def test_encode_decode_roundtrip_property(seed, h, w, c):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
    assert np.array_equal(P.decode_png(P.encode_png(img)), img)


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
    ]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    got = {r.doc_id: r for r in P.image_pixel_stats(df).collect()}
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
