"""Export manifest persistence + distributed integrity verification.

The tar and JSONL shard writers compute a per-shard sha256 manifest as
part of the export, but a manifest that only lives in the returned
DataFrame is gone when the session ends — at which point an export on
shared storage has no self-describing integrity record. This module
persists it as `_manifest.json` inside the export directory and can
re-verify the files against it later, distributed.

Reference parity note: the reference injector has no batch exports at
all (its terminal store is the ES bulk sink,
src/elasticsearch/elasticsearch.go:60-124); this belongs to the
training-corpus extension, where multi-TB exports on object stores
rot (partial copies, bitflips, concurrent writers) and re-hashing on
one machine is not an option.

Design:
- `_manifest.json` is atomic (tmp + rename), byte-deterministic
  (sorted shards, sorted keys, compact separators), and INVISIBLE to
  Spark readers: file names starting with `_` are filtered by Spark's
  file index, so `spark.read.json(path)` on a JSONL export still sees
  only the shard files.
- Verification is one distributed scan: `binaryFile` source over the
  shard glob, `sha2(content, 256)` JVM-side per file (one task per
  shard — same parallelism as the export itself), full-outer-joined
  against the manifest. No bytes ever reach the driver or Python.
- At 100 TB: cost is exactly one read of the export; shards must stay
  under the 2 GB `binaryFile` single-file limit, which the writers'
  own sizing guidance (one shard per task's memory) already implies.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

MANIFEST_NAME = "_manifest.json"

VERIFY_SCHEMA = ("shard int, file string, status string, "
                 "expected_sha256 string, actual_sha256 string, "
                 "expected_bytes long, actual_bytes long")


def publish_manifest(path: str, rows) -> str:
    """Persist manifest `rows` (Rows or dicts with at least `shard`,
    `n_bytes`, `sha256`) as `path/_manifest.json`, atomically and
    byte-deterministically. Returns the manifest path. Called by the
    shard writers AFTER staged publication succeeds, so a failed
    export leaves the previous manifest describing the intact previous
    files. A crash in the narrow window between the shard swap and
    this write leaves a stale manifest over new files — a state
    verify_shard_export reports as mismatches, which is exactly the
    re-export signal wanted there."""
    shards = sorted((dict(r) if isinstance(r, dict) else r.asDict()
                     for r in rows), key=lambda d: d["shard"])
    payload = (json.dumps({"shards": shards}, sort_keys=True,
                          separators=(",", ":")) + "\n").encode()
    target = os.path.join(path, MANIFEST_NAME)
    tmp = target + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, target)
    return target


def read_manifest(path: str) -> list[dict]:
    """The persisted shard list (empty export → [])."""
    with open(os.path.join(path, MANIFEST_NAME)) as f:
        return json.load(f)["shards"]


def verify_shard_export(spark: SparkSession, path: str,
                        ext: str) -> DataFrame:
    """Re-hash every `shard-*{ext}` file under `path` (distributed,
    JVM-side) and reconcile against `_manifest.json`. Returns one row
    per manifest entry or on-disk file (VERIFY_SCHEMA) with status:

    - ``ok``             — present, size and sha256 match
    - ``hash_mismatch``  — present, right size, wrong bytes (bitrot,
                           torn write)
    - ``size_mismatch``  — present, wrong length (truncated/partial
                           copy; hash necessarily differs too)
    - ``missing``        — in the manifest, not on disk
    - ``extra``          — on disk, not in the manifest (foreign or
                           leftover file a reader would pick up)

    An intact export verifies to all-``ok``; ``df.filter("status !=
    'ok'")`` is the alert predicate. `ext` is the shard extension the
    writer used (".jsonl.gz", ".tar")."""
    man = spark.createDataFrame(
        [(d["shard"], f"shard-{d['shard']:05d}{ext}",
          d["sha256"], d["n_bytes"]) for d in read_manifest(path)],
        "shard int, file string, expected_sha256 string, "
        "expected_bytes long")
    # pathGlobFilter on the directory (not a glob path): a valid empty
    # export — zero shards, or every shard deleted — must verify to an
    # empty/miss result, not throw PATH_NOT_FOUND.
    actual = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", f"shard-*{ext}")
        .load(path)
        .select(
            F.element_at(F.split("path", "/"), -1).alias("file"),
            F.sha2("content", 256).alias("actual_sha256"),
            F.col("length").alias("actual_bytes"))
    )
    joined = man.join(actual, "file", "full_outer")
    status = (
        F.when(F.col("expected_sha256").isNull(), F.lit("extra"))
        .when(F.col("actual_sha256").isNull(), F.lit("missing"))
        .when(F.col("expected_bytes") != F.col("actual_bytes"),
              F.lit("size_mismatch"))
        .when(F.col("expected_sha256") != F.col("actual_sha256"),
              F.lit("hash_mismatch"))
        .otherwise(F.lit("ok")))
    return (joined
            .select("shard", "file", status.alias("status"),
                    "expected_sha256", "actual_sha256",
                    "expected_bytes", "actual_bytes")
            .orderBy(F.col("file")))
