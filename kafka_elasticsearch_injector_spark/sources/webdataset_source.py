"""WebDataset tar shards as a REGISTERED Spark data source.

Spark 4's Python DataSource API (`pyspark.sql.datasource`) lets a
format participate in the engine's own planning protocol instead of
being a helper function: after `register_webdataset_source(spark)`,

    spark.read.format("webdataset")
         .option("members", '{"txt": "text", "cls": "label"}')
         .load("/corpus/tars")

plans ONE input partition per `shard-*.tar` (parallelism = shard
count, the same contract the writer sizes shards for) and each task
streams its tar straight from the shared filesystem into Arrow
RecordBatches — the file bytes never round-trip through the JVM the
way the `binaryFile`-based helper's do (sinks/webdataset.
read_webdataset keeps working as the no-registration path; both
readers share _parse_tar_samples, so suffix semantics cannot drift).

Nothing in the reference corresponds (its only source is the Kafka
consumer, src/kafka/consumer.go:61-135); this is engine-surface work:
the point of a training-data engine is that EXISTING tar corpora read
as first-class tables.

Options:
- `members` (JSON object, default {"txt": "text"}): tar-member suffix
  → output column. Suffix matching follows the WebDataset convention
  documented on sinks/webdataset.read_webdataset (first dot after the
  last slash; dotted suffixes must be requested verbatim).
- `path`: directory of `*.tar` shards (the `.load(path)` argument).
- `maxShardsPerTrigger` (stream only, default unbounded): cap shards
  ingested per micro-batch — backlog backpressure, see
  WebDatasetStreamReader.
- `onCorrupt` ("fail" default | "skip"): what an unreadable tar does —
  fail the job, or drop the whole shard with a warning (the injector's
  malformed side-drop posture; essential for streams, where a poison
  shard would fail every retry of its micro-batch).
- `onCorruptLogDir` (optional, with `onCorrupt=skip`): directory on the
  driver/executor-shared filesystem where every skipped shard leaves a
  durable `<shard>.<hash8>.skipped` marker (shard path + error,
  hash8 = 8 hex of the full shard path so same-named shards from
  different corpora sharing one log dir cannot collide; written via
  temp+rename so task retries are idempotent). The reference never
  drops data silently — its malformed side-drop increments a metric
  (src/kafka/consumer.go:154-159, src/metrics/metrics.go); this is the
  batch/stream analog: count the markers to audit corrupt-shard loss.
  Without it, a skip is still logged through the task logger (executor
  stderr), but long-running streams should set the log dir.

Schema: (shard string, key string, <col> binary ...), one row per
sample key — identical to read_webdataset.

At 100 TB: partitions() lists shard files driver-side (cheap: one
listing of ~thousands of names); each read() holds one shard's
samples in memory — the same ~1 GB bound as the writer. The task
reads local/NFS/FUSE paths; on an object store without a mount, front
it with fsspec inside _open_shard.
"""

from __future__ import annotations

import io
import json
import logging
import os
import tarfile
from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from .appended_shards import AppendedShardStreamReader, _ShardPartition

_DEFAULT_MEMBERS = {"txt": "text"}

_log = logging.getLogger(__name__)


def _record_skip(shard_path: str, err: Exception,
                 log_dir: str | None) -> None:
    """Make an onCorrupt=skip drop OBSERVABLE (shared by the registered
    source and sinks/webdataset.read_webdataset). Always logs through
    the task logger (executor stderr — a plain warnings.warn inside an
    executor task is typically invisible); when `log_dir` is set, also
    writes a durable `<shard>.<hash8>.skipped` sidecar marker via
    temp+rename, so a task retry rewrites the same marker instead of
    double-counting and an audit is `len(*.skipped)` — the
    side-manifest analog of the reference's side-drop metric
    (src/kafka/consumer.go:154-159)."""
    _log.warning("webdataset: skipping corrupt shard %s: %s",
                 shard_path, err)
    if not log_dir:
        return
    import hashlib

    os.makedirs(log_dir, exist_ok=True)
    # basename + 8-hex of the FULL path: two corpora sharing one log
    # dir can both drop a "shard-00002.tar" without the markers
    # colliding (the audit is len(*.skipped) — an overwrite would
    # undercount), while a task RETRY of the same shard still rewrites
    # the same marker instead of double-counting.
    digest = hashlib.sha256(shard_path.encode()).hexdigest()[:8]
    name = f"{os.path.basename(shard_path)}.{digest}.skipped"
    tmp = os.path.join(log_dir, f"._{name}.{os.getpid()}.tmp")
    with open(tmp, "w") as f:
        f.write(f"{shard_path}\t{err}\n")
    os.replace(tmp, os.path.join(log_dir, name))


def _members_from_options(options) -> dict[str, str]:
    raw = options.get("members")
    members = json.loads(raw) if raw else dict(_DEFAULT_MEMBERS)
    if (not isinstance(members, dict) or not members
            or not all(isinstance(k, str) and isinstance(v, str)
                       for k, v in members.items())):
        raise ValueError(
            "webdataset `members` option must be a non-empty JSON "
            f"object of suffix -> column strings, got: {raw!r}")
    return members


def _parse_tar_samples(data: bytes, members: dict[str, str]):
    """tar bytes → {key: {col: payload}} under the WebDataset suffix
    convention (shared by read_webdataset and this data source)."""
    samples: dict[str, dict[str, bytes]] = {}
    with tarfile.open(fileobj=io.BytesIO(data)) as tar:
        for m in tar.getmembers():
            if not m.isfile():
                continue
            # First dot AFTER the last slash — dotted directories
            # stay in the key; extensionless members have no suffix.
            dirname, _, base = m.name.rpartition("/")
            stem, dot, suffix = base.partition(".")
            if not dot:
                continue
            col = members.get(suffix)
            if col is None:
                continue
            key = f"{dirname}/{stem}" if dirname else stem
            samples.setdefault(key, {})[col] = tar.extractfile(m).read()
    return samples


class WebDatasetReader(DataSourceReader):
    def __init__(self, options):
        self._path = options.get("path")
        if not self._path:
            raise ValueError(
                "webdataset source needs a path: "
                "spark.read.format('webdataset').load(<dir of *.tar>)")
        self._members = _members_from_options(options)
        # onCorrupt (lowercased by Spark's option map): "fail" (default)
        # raises on an unreadable tar — a batch job should stop on a
        # broken input; "skip" drops the WHOLE corrupt shard and keeps
        # going — the malformed side-drop posture of the injector's
        # decode stage (reference §2.1 op 8), for corpora where one
        # truncated tar must not poison a 100 TB read (a stream retry
        # would replay the same broken bytes forever).
        mode = (options.get("oncorrupt") or "fail").lower()
        if mode not in ("fail", "skip"):
            raise ValueError(
                f"webdataset onCorrupt must be 'fail' or 'skip', "
                f"got {mode!r}")
        self._skip_corrupt = mode == "skip"
        # Durable skip markers (module docstring: onCorruptLogDir).
        self._skip_log_dir = options.get("oncorruptlogdir") or None

    def partitions(self) -> list[InputPartition]:
        import glob

        shards = sorted(glob.glob(os.path.join(self._path, "*.tar")))
        if not shards:
            raise FileNotFoundError(
                f"no *.tar shards under {self._path}")
        return [_ShardPartition(p) for p in shards]

    def read(self, partition: _ShardPartition) -> Iterator[pa.RecordBatch]:
        with open(partition.path, "rb") as f:
            data = f.read()
        try:
            samples = _parse_tar_samples(data, self._members)
        except tarfile.TarError as e:
            if self._skip_corrupt:
                _record_skip(partition.path, e, self._skip_log_dir)
                return
            raise ValueError(
                f"corrupt webdataset shard {partition.path}: {e} "
                "(set onCorrupt=skip to drop corrupt shards)") from e
        ordered = sorted(self._members.items())
        shard = os.path.basename(partition.path)
        keys = sorted(samples)
        arrays = [
            pa.array([shard] * len(keys), pa.string()),
            pa.array(keys, pa.string()),
            *[pa.array([samples[k].get(col) for k in keys], pa.binary())
              for _, col in ordered],
        ]
        names = ["shard", "key", *[col for _, col in ordered]]
        yield pa.RecordBatch.from_arrays(arrays, names=names)


class WebDatasetStreamReader(AppendedShardStreamReader):
    """Micro-batch tar-shard stream: each batch reads the shards that
    APPEARED since the last committed offset — the ingest path for a
    corpus being produced shard-by-shard upstream (a writer fleet
    dropping `shard-NNNNN.tar` files as it finishes them).

    Offset model, append-only producer contract, parallelism, and the
    `maxShardsPerTrigger` backpressure semantics (incl. the
    first-batch-unbounded caveat) are the shared filename-watermark
    protocol — documented ONCE on sources/appended_shards.
    AppendedShardStreamReader, reused verbatim by the tfrecord stream.
    The tar analog of the Kafka source's maxOffsetsPerTrigger
    (reference §2.1 op 2, KAFKA_CONSUMER_BUFFER_SIZE in
    src/injector/injector.go:31-34)."""

    format_name = "webdataset"
    shard_glob = "*.tar"

    def __init__(self, options):
        super().__init__(options)
        self._members = _members_from_options(options)
        # Same onCorrupt contract as the batch reader (read() is
        # shared); "skip" matters doubly here — a corrupt shard would
        # otherwise fail every retry of the same micro-batch forever.
        mode = (options.get("oncorrupt") or "fail").lower()
        if mode not in ("fail", "skip"):
            raise ValueError(
                f"webdataset onCorrupt must be 'fail' or 'skip', "
                f"got {mode!r}")
        self._skip_corrupt = mode == "skip"
        self._skip_log_dir = options.get("oncorruptlogdir") or None

    # the batch reader's parse/skip/Arrow handoff, one shard per task
    _read_shard = WebDatasetReader.read


class WebDatasetDataSource(DataSource):
    """`format("webdataset")` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "webdataset"

    def schema(self) -> str:
        ordered = sorted(_members_from_options(self.options).items())
        return ("shard string, key string, "
                + ", ".join(f"`{col}` binary" for _, col in ordered))

    def reader(self, schema) -> WebDatasetReader:
        return WebDatasetReader(self.options)

    def streamReader(self, schema) -> WebDatasetStreamReader:
        return WebDatasetStreamReader(self.options)


def register_webdataset_source(spark) -> None:
    """Idempotently register `format("webdataset")` on this session."""
    spark.dataSource.register(WebDatasetDataSource)
