#!/usr/bin/env python
"""Pixel-lane throughput: image_pixel_stats / resize_images over a
synthetic mixed-format corpus, measured warm on local[N].

Why a tool: the r14 BASELINE.md pixel-lane figure (68 rec/s = 5.7
MPix/s on a 400-image corpus) was produced by a one-off script; this
makes the measurement reproducible round over round, the same way
tools/bench_control.py mechanized the drift adjudication. The corpus
mix is JPEG-heavy on purpose — JPEG entropy decode dominates the
pure-Python boundary being quantified — and since r15 includes WebP
VP8L rows so the newest decoder carries a number too.

The forward encoders live in tests/ (they are spec-grounding fixtures,
kept with their decoders' tests); this dev tool imports them from
there — it never runs in production paths.

Usage:
    python tools/bench_pixels.py [--images 400] [--cpus 32] \
        [--out BENCH_PIXELS.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np  # noqa: E402


# ITU T.81 Annex K.1 example quantization tables (quality ~50) — the
# published tables virtually every encoder scales from. The test
# encoder's DEFAULT is an all-ones (lossless) quantizer for its +-1
# round trips; benching with that produces dense coefficient grids no
# camera emits and a ~100x slower, meaningless number.
_ANNEX_K_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], np.int64)
_ANNEX_K_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99]], np.int64)


def build_corpus(n_images: int, seed: int = 42):
    """(doc_id, media, media_type) rows: 20% PNG / 15% BMP / 15% WebP
    (VP8L) / 50% JPEG (baseline 4:2:0, progressive, grayscale),
    128x128 - 512x384, photo-ish gradients + mild dither."""
    from test_jpeg_codec import _encode_jpeg, _encode_progressive
    from test_webp_codec import _webp_wrap, encode_vp8l

    from kafka_elasticsearch_injector_spark.operators.pixels import (
        encode_png,
    )

    jq = {"quant_luma": _ANNEX_K_LUMA, "quant_chroma": _ANNEX_K_CHROMA}
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_images):
        w = int(rng.integers(128, 513))
        h = int(rng.integers(128, 385))
        yy, xx = np.mgrid[0:h, 0:w]
        base = (xx * 255 // max(1, w - 1) + yy * 131 // max(1, h - 1))
        img = np.stack([(base + k * 37) % 256 for k in range(3)],
                       axis=2).astype(np.uint8)
        # photo-like, NOT white noise: heavy noise quantizes to dense
        # JPEG coefficient grids and the per-bit entropy loop price
        # explodes ~70x (r15 measurement) — real photos sit near the
        # r14 corpus' ~0.7 bytes/pixel, which mild dither preserves
        img += rng.integers(0, 6, size=img.shape, dtype=np.uint8)
        kind = i % 20
        if kind < 4:                                    # 20% PNG
            buf, mt = encode_png(img), "image/png"
        elif kind < 7:                                  # 15% BMP
            hdr = (b"BM" + int(54 + w * h * 3).to_bytes(4, "little")
                   + b"\x00\x00\x00\x00" + (54).to_bytes(4, "little")
                   + (40).to_bytes(4, "little")
                   + w.to_bytes(4, "little") + h.to_bytes(4, "little")
                   + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
                   + b"\x00" * 24)
            pad = (-(w * 3)) % 4
            rowbytes = b"".join(
                img[y, :, ::-1].tobytes() + b"\x00" * pad
                for y in range(h - 1, -1, -1))
            buf, mt = hdr + rowbytes, "image/bmp"
        elif kind < 10:                                 # 15% WebP VP8L
            buf, mt = _webp_wrap(encode_vp8l(img)), "image/webp"
        elif kind < 16:                                 # 30% baseline 4:2:0
            buf, mt = _encode_jpeg(img, subsample=True, **jq), "image/jpeg"
        elif kind < 18:                                 # 10% progressive
            buf, mt = _encode_progressive(img, **jq), "image/jpeg"
        else:                                           # 10% grayscale
            buf, mt = _encode_jpeg(img[:, :, 0], **jq), "image/jpeg"
        rows.append((i, bytearray(buf), mt, w * h))
    return rows


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--images", type=int, default=400)
    ap.add_argument("--cpus", default=os.environ.get(
        "SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--thumb", type=int, default=32)
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "BENCH_PIXELS.json"))
    args = ap.parse_args()

    t0 = time.time()
    rows = build_corpus(args.images)
    total_bytes = sum(len(r[1]) for r in rows)
    total_mpix = sum(r[3] for r in rows) / 1e6
    print(f"corpus: {args.images} images, {total_bytes / 1e6:.1f} MB, "
          f"{total_mpix:.1f} MPix, built in {time.time() - t0:.1f}s",
          flush=True)

    from pyspark.sql import SparkSession

    from kafka_elasticsearch_injector_spark.operators.pixels import (
        image_pixel_stats,
        resize_images,
    )

    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .config("spark.sql.shuffle.partitions", args.cpus)
             .appName("bench_pixels").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.createDataFrame(
        [r[:3] for r in rows],
        "doc_id long, media binary, media_type string") \
        .repartition(int(args.cpus)).cache()
    df.count()

    result = {"n_images": args.images, "mbytes": round(total_bytes / 1e6, 1),
              "mpix": round(total_mpix, 1), "cpus": int(args.cpus),
              "load_1min": round(os.getloadavg()[0], 2)}
    for label, frame in (
            ("pixel_stats", image_pixel_stats(df)),
            ("resize", resize_images(df, args.thumb, args.thumb))):
        # collect only the tiny columns — never thumbnail binaries
        probe = frame.select("format", "decode_error") \
            if label == "pixel_stats" else frame.select("decode_error")
        probe.count()                                   # warm the lane
        t0 = time.time()
        rows = probe.collect()
        wall = time.time() - t0
        decoded = sum(r.decode_error is None for r in rows)
        result[label] = {
            "decoded": decoded, "wall_sec": round(wall, 2),
            "rec_per_sec": round(args.images / wall, 1),
            "mpix_per_sec": round(total_mpix / wall, 2)}
        print(f"{label}: {decoded}/{args.images} decoded, "
              f"{wall:.1f}s warm = {args.images / wall:.1f} rec/s, "
              f"{total_mpix / wall:.2f} MPix/s", flush=True)
        if label == "pixel_stats":
            result["by_format"] = {}
            for r in rows:
                k = r.format or "undecoded"
                result["by_format"][k] = result["by_format"].get(k, 0) + 1
            print("by format:", result["by_format"], flush=True)
        # coverage must be total: a side-dropping decoder would shrink
        # the work while the rec/s divides by the FULL corpus — the
        # recorded number would go UP as coverage silently went down
        if decoded != args.images:
            drops = sorted({r.decode_error for r in rows
                            if r.decode_error})[:5]
            raise SystemExit(
                f"{label}: only {decoded}/{args.images} decoded — "
                f"refusing to record inflated throughput; reasons: "
                f"{drops}")
    history = []
    if os.path.exists(args.out):
        with open(args.out) as f:
            history = json.load(f)
    history.append(result)
    with open(args.out, "w") as f:
        json.dump(history, f, indent=1)
    print(f"wrote {args.out}")
    spark.stop()


if __name__ == "__main__":
    main()
