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
    `file`, `n_bytes`, `sha256`) as `path/_manifest.json`, atomically
    and byte-deterministically. Returns the manifest path. The shard
    writers do not call this directly: `_staging.staged_publish`
    writes the manifest INTO the staging dir and renames it into place
    as the final step of the shard swap, so the only
    shards-without-matching-manifest window is the swap's own rename
    sequence — a state verify_shard_export reports as mismatches (or,
    for a first-ever export with no prior manifest, as all-``extra``),
    which is exactly the re-export signal wanted there."""
    shards = sorted((dict(r) if isinstance(r, dict) else r.asDict()
                     for r in rows), key=lambda d: d["shard"])
    payload = (json.dumps({"shards": shards}, sort_keys=True,
                          separators=(",", ":")) + "\n").encode()
    target = os.path.join(path, MANIFEST_NAME)
    tmp = target + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
        # fsync before the rename: os.replace can become durable
        # before the data blocks on ext4/object-store FUSE, and a
        # 0-byte manifest breaks the verifier this file exists for.
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, target)
    return target


def read_manifest(path: str) -> list[dict]:
    """The persisted shard list (empty export → []; no manifest at all
    → FileNotFoundError — verify_shard_export catches that case and
    reports every on-disk shard as ``extra``)."""
    with open(os.path.join(path, MANIFEST_NAME)) as f:
        return json.load(f)["shards"]


_GLOB_META = '\\*?[]{}'


def _escape_glob(path: str) -> str:
    """Backslash-escape Hadoop glob metacharacters in a literal path.
    DataFrameReader.load globs its path argument, so an export written
    to e.g. `/data/run[1]/out` (plain os IO — fine for the writers)
    would otherwise verify against `[1]` as a character class."""
    return "".join(f"\\{c}" if c in _GLOB_META else c for c in path)


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
    writer used (".jsonl.gz", ".tar"). A directory with shards but NO
    manifest (a crash inside the swap's final rename, or a foreign
    directory) reports every file as ``extra`` — alerting, not
    crashing, is the contract monitoring builds on."""
    try:
        manifest = read_manifest(path)
    except FileNotFoundError:
        manifest = []
    # File names come from the manifest itself (the writers record
    # them), so the shard naming convention lives only in the writers.
    man = spark.createDataFrame(
        [(d["shard"], d["file"], d["sha256"], d["n_bytes"])
         for d in manifest],
        "shard int, file string, expected_sha256 string, "
        "expected_bytes long")
    # pathGlobFilter on the directory (not a glob path): a valid empty
    # export — zero shards, or every shard deleted — must verify to an
    # empty/miss result, not throw PATH_NOT_FOUND. The directory path
    # itself is still globbed by Hadoop, hence the metachar escape.
    actual = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", f"shard-*{ext}")
        .load(_escape_glob(path))
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
