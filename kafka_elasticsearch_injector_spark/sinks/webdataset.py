"""WebDataset-style tar shard export.

The other training-export convention (besides the parquet shards in
sinks/dataset.py): a directory of `shard-00000.tar` files whose members
are `{key}.{suffix}` entries, streamed sequentially by dataloaders
(the WebDataset convention popularized for large-scale multimodal
training). The reference's terminal store is an order-free ES bulk sink
(src/elasticsearch/elasticsearch.go:60-124); a tar export is the
opposite contract — deterministic placement, member order, and bytes.

Spark-first shape:
- shard assignment is a pure function of the id (xxhash64 mod n) —
  never round-robin/rand/monotonically_increasing_id, which depend on
  task scheduling;
- ONE shuffle (the groupBy on shard); each shard's tar is written by
  exactly one task via applyInArrow (Arrow groups are lossless where
  Arrow→pandas is not — exact int64 next to nulls, null never aliasing
  NaN/NaT), so there is no cross-task append coordination and a re-run
  cannot interleave differently;
- byte determinism: members sorted by key, tar metadata pinned
  (mtime=0, uid/gid=0, mode=0644, USTAR format), atomic tmp+rename
  publication — the manifest's sha256 is reproducible bit-for-bit;
- the returned manifest (shard, n_members, n_bytes, sha256) is
  computed from the written bytes, so it doubles as the export's
  integrity record;
- write_webdataset EXECUTES the export before returning: shards are
  staged into a hidden tmp dir and the previous export is replaced
  only after the job succeeds, so a failed or never-run job leaves
  the prior export intact (the returned manifest DataFrame is already
  materialized — collecting it does not re-run the export).

FILESYSTEM CONTRACT: shard tasks write tars with plain local file IO
on the executors, so `path` must be a filesystem shared between the
driver and every executor (local mode, NFS, or a FUSE-mounted object
store). On a cluster without a shared mount, point `path` at such a
mount or swap the open()/os.replace calls for an fsspec/Hadoop-FS
abstraction so the path scheme decides placement.

At 100 TB: size n_shards for ~1 GB tars (one shard = one task = one
in-memory Arrow group — the same bound every WebDataset writer has);
skewed shards are impossible by construction (hash of unique ids).
"""

from __future__ import annotations

import hashlib
import io
import os
import tarfile
from collections.abc import Iterable
from datetime import datetime

import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._staging import staged_publish, write_shard_file

MANIFEST_SCHEMA = ("shard int, file string, n_members long, n_bytes long, "
                   "sha256 string")

_MANIFEST_ARROW = pa.schema([
    ("shard", pa.int32()), ("file", pa.string()),
    ("n_members", pa.int64()), ("n_bytes", pa.int64()),
    ("sha256", pa.string()),
])


def with_hash_shard(df: DataFrame, n_shards: int,
                    id_col: str = "doc_id") -> DataFrame:
    """Deterministic shard assignment: pmod(xxhash64(id), n)."""
    return df.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
        .cast("int"))


def _tar_bytes(table: pa.Table, id_col: str,
               members: dict[str, str]) -> tuple[bytes, int]:
    """Serialize one shard's rows into deterministic tar bytes:
    members sorted by zero-padded key, all metadata pinned.

    Takes a pyarrow Table (the applyInArrow group), because Arrow's
    to_pylist is lossless where the pandas path was not: a nullable
    integer member stays an exact Python int (never a rounded float64
    — >2⁵³ ids/refs corrupted on the old path), a null is always None
    (no NaT/NaN sentinel aliasing), and a float NaN is a genuine VALUE
    that now writes b"nan" bytes instead of being silently swallowed
    by the null skip."""
    buf = io.BytesIO()
    n = 0
    member_cols = sorted(members.items())
    ids = table.column(id_col).to_pylist()
    col_values = [table.column(col).to_pylist() for _, col in member_cols]
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.USTAR_FORMAT) as tar:
        for i, rid in enumerate(ids):
            key = f"{int(rid):012d}"
            for (suffix, col), vals in zip(member_cols, col_values):
                val = vals[i]
                # NULL member value → no tar member for this sample
                # (read_webdataset returns None for absent members, so
                # nulls round-trip instead of serializing as "None").
                if val is None:
                    continue
                # TIMESTAMP arrives session-tz-aware from Arrow; write
                # the naive session-local form (the pandas-era bytes).
                if isinstance(val, datetime) and val.tzinfo is not None:
                    val = val.replace(tzinfo=None)
                data = (val if isinstance(val, (bytes, bytearray))
                        else str(val).encode("utf-8"))
                info = tarfile.TarInfo(name=f"{key}.{suffix}")
                info.size = len(data)
                info.mtime = 0
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                info.mode = 0o644
                tar.addfile(info, io.BytesIO(data))
                n += 1
    return buf.getvalue(), n


def write_webdataset(df: DataFrame, path: str, n_shards: int,
                     id_col: str = "doc_id",
                     members: dict[str, str] | None = None,
                     allow_empty: bool = False) -> DataFrame:
    """Export `df` as WebDataset tar shards at `path`; returns the
    per-shard manifest DataFrame (MANIFEST_SCHEMA).

    `members` maps tar-member suffix -> source column (default
    {"txt": "text"}); every row contributes one `{key}.{suffix}`
    member per mapping, key = zero-padded `id_col`. Binary columns
    pass through; everything else is utf-8 text. A NULL member value
    omits the member; a float NaN is a VALUE and writes b"nan" (the
    Arrow writer kernel sees validity bitmaps, so null never aliases
    NaN/NaT). Numeric-vector payloads still belong in the JSONL
    export, which round-trips them typed (sinks/jsonl.py).

    The export runs INSIDE this call: shard tasks write into a hidden
    staging dir under `path`, the manifest is collected (triggering
    the job), and only then are the previous export's shard files
    replaced — so a crash or job failure at any point leaves the old
    export untouched. Requires a driver/executor-shared filesystem
    (see module docstring).

    PRECONDITION for the manifest's byte-reproducibility claim: ids
    are unique. Duplicate-id rows all land (same shard, correctness
    holds) but their relative order after the id sort follows upstream
    arrival — Arrow sort stability across versions is not a documented
    contract — so re-runs may produce differing shard bytes/sha256.
    """
    members = members or {"txt": "text"}
    # de-dup against id_col too: members may legitimately export the key
    cols = list(dict.fromkeys([id_col, *members.values()]))
    if "shard" in cols:
        raise ValueError(
            "column name 'shard' is reserved: the writer's hash-shard "
            "assignment would silently overwrite it (rename the column "
            "before exporting)")

    def run(staging: str) -> list:
        def write_shard(table: pa.Table) -> pa.Table:
            shard = table.column("shard")[0].as_py()
            fname = f"shard-{shard:05d}.tar"
            # Arrow's sort_indices is stable — duplicate ids keep
            # their incoming order, same as the old mergesort.
            ordered = table.sort_by([(id_col, "ascending")])
            data, n = _tar_bytes(ordered, id_col, members)
            write_shard_file(staging, fname, data)
            return pa.table({
                "shard": [shard], "file": [fname], "n_members": [n],
                "n_bytes": [len(data)],
                "sha256": [hashlib.sha256(data).hexdigest()],
            }, schema=_MANIFEST_ARROW)

        sharded = with_hash_shard(df.select(*cols), n_shards, id_col)
        return (sharded.groupBy("shard")
                .applyInArrow(write_shard, MANIFEST_SCHEMA)
                .collect())                     # executes the export

    # manifest=True: the integrity record (atomic, deterministic,
    # invisible to Spark readers — see sinks/integrity.py) is renamed
    # into place as the swap's final step.
    rows = staged_publish(path, ".tar", run, allow_empty=allow_empty,
                          manifest=True)
    return df.sparkSession.createDataFrame(rows, MANIFEST_SCHEMA)


def read_webdataset_keys(path: str) -> Iterable[tuple[int, str]]:
    """Driver-side audit helper: yield (shard, member_name) for every
    member across the export — small-scale verification only (a
    distributed readback would map tar parsing over binaryFile rows)."""
    for fname in sorted(os.listdir(path)):
        if not fname.startswith("shard-") or not fname.endswith(".tar"):
            continue
        shard = int(fname[len("shard-"):-len(".tar")])
        with tarfile.open(os.path.join(path, fname)) as tar:
            for m in tar.getmembers():
                yield shard, m.name


def read_webdataset(spark, path: str,
                    members: dict[str, str] | None = None,
                    on_corrupt: str = "fail",
                    on_corrupt_log_dir: str | None = None) -> DataFrame:
    """Distributed WebDataset reader — the inverse of write_webdataset,
    and the interop path for externally-produced tar-shard corpora.

    `members` maps tar-member suffix -> output column (default
    {"txt": "text"}, mirroring the writer); returns one row per SAMPLE:
    (shard STRING, key STRING, <col> BINARY per requested suffix).
    Payloads come back as raw bytes — utf-8/image/audio decode belongs
    downstream, where the consumer knows the modality. Members whose
    suffix isn't requested are skipped without being materialized.

    Suffix semantics follow the WebDataset convention: a member name
    splits at the FIRST dot after the last `/` — key = directories +
    dot-free stem, suffix = everything after that dot. So grouped
    multi-member samples (`000123.jpg` + `000123.cls` + `000123.json`)
    share key `000123`, and a dotted suffix like `key.aug.txt` has
    suffix `aug.txt`, which must be requested VERBATIM in `members`
    (requesting `txt` does NOT match `aug.txt`). Directories may
    contain dots (`v1.0/doc.txt` → key `v1.0/doc`, suffix `txt`).
    Extensionless members have no suffix and are skipped.

    `on_corrupt` mirrors the registered source's onCorrupt option
    ("fail" default | "skip"); with "skip", `on_corrupt_log_dir` is the
    optional shared-filesystem directory where each dropped shard
    leaves a durable `<shard>.<hash8>.skipped` marker — see onCorruptLogDir in
    sources/webdataset_source.py (the reference's side-drop metric
    analog; without it skips only reach the task logger).

    Scale shape: `binaryFile` yields one row per tar, so one task
    parses one whole shard — the same ~1 GB in-memory bound the writer
    sizes n_shards for, and parallelism = shard count (thousands of
    shards at 100 TB). Column pruning/predicate pushdown cannot reach
    inside a tar; that is WebDataset's known trade vs parquet — use
    sinks/dataset.py for analytics, this format for sequential
    dataloaders.
    """
    if on_corrupt not in ("fail", "skip"):
        raise ValueError(
            f"on_corrupt must be 'fail' or 'skip', got {on_corrupt!r}")
    members = members or {"txt": "text"}
    ordered = sorted(members.items())           # deterministic columns
    out_cols = ["shard", "key", *[col for _, col in ordered]]
    schema = ("shard string, key string, "
              + ", ".join(f"`{col}` binary" for _, col in ordered))
    suffix_to_col = dict(ordered)

    def parse(batches):
        # Suffix semantics live in ONE place, shared with the
        # registered `format("webdataset")` data source
        # (sources/webdataset_source._parse_tar_samples) so the two
        # readers cannot drift.
        from ..sources.webdataset_source import _parse_tar_samples

        import tarfile as _tarfile

        for pdf in batches:
            for _, row in pdf.iterrows():
                try:
                    samples = _parse_tar_samples(row["content"],
                                                 suffix_to_col)
                except _tarfile.TarError as e:
                    # same contract as the registered source's
                    # onCorrupt option: fail loudly by default, or
                    # drop the whole corrupt shard AUDITABLY — task-log
                    # warning + optional durable `<shard>.<hash8>.skipped`
                    # marker (shared _record_skip, see
                    # sources/webdataset_source.py onCorruptLogDir)
                    if on_corrupt == "skip":
                        from ..sources.webdataset_source import \
                            _record_skip

                        _record_skip(row["path"], e, on_corrupt_log_dir)
                        continue
                    raise ValueError(
                        f"corrupt webdataset shard {row['path']}: {e} "
                        "(pass on_corrupt='skip' to drop corrupt "
                        "shards)") from e
                shard = os.path.basename(row["path"])
                rows = [
                    {"shard": shard, "key": k,
                     **{col: d.get(col) for _, col in ordered}}
                    for k, d in sorted(samples.items())
                ]
                if rows:
                    yield pd.DataFrame(rows, columns=out_cols)

    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tar").load(path)
        .select("path", "content")
        .mapInPandas(parse, schema)
    )
