"""TFRecord shards as a REGISTERED Spark data source.

After `register_tfrecord_source(spark)`,

    spark.read.format("tfrecord")
         .option("features", '{"doc_id": "int64", "text": "bytes"}')
         .load("/corpus/tfrecords")

plans ONE input partition per `shard-*.tfrecord`/`*.tfrecord` file
(parallelism = shard count) and each task streams its file straight
into Arrow RecordBatches — the same planning contract as the
registered webdataset source, for the tf.data ecosystem's format.
Framing + Example codec live in sinks/tfrecord.py (public-spec
implementations, no TensorFlow dependency) and are SHARED with the
binaryFile-based helper reader `sinks.tfrecord.read_tfrecord`, so the
two readers cannot drift.

Options:
- `features` (JSON object, column -> kind, see sinks/tfrecord.py
  module docstring; omitted = raw mode: one BINARY `record` column of
  undecoded tf.train.Example payloads).
- `path`: directory of `*.tfrecord` shards (the `.load(path)` arg).
- `onCorrupt` ("fail" default | "skip") and `onCorruptLogDir`: the
  exact webdataset-source contract — fail the job on a truncated/CRC-
  mismatched shard, or drop the WHOLE shard auditable (task-logger
  warning + durable `<shard>.<hash8>.skipped` marker, shared
  `_record_skip`).
- `verifyCrc` ("true" default | "false"): per-record CRC-32C checks;
  disable only for trusted re-reads where the Python CRC table would
  bound throughput.
- `maxShardsPerTrigger` (stream only, default unbounded): per-batch
  ingest cap under `spark.readStream.format("tfrecord")` — the stream
  reads shards APPENDED since the last committed offset via the same
  filename-watermark protocol as the webdataset stream (shared base:
  sources/appended_shards.py; append-only producer contract and the
  first-batch-unbounded caveat documented there).

Schema: (shard string, <col> typed ...) per `features`, one row per
record — identical to read_tfrecord.

At 100 TB: partitions() lists shard files driver-side (one listing of
~thousands of names); each read() holds one shard in memory — the
same ~1 GB bound the writer sizes n_shards for.

Known divergence from the helper reader (deliberate, same as the
webdataset pair): batch partitions() FAILS FAST (FileNotFoundError)
on a directory with zero shards — a misconfigured path should stop
the job — while the binaryFile-based helper returns an empty
DataFrame. Point an intentionally-empty export (allow_empty=True) at
the helper, or at the stream reader (an empty directory is a normal
stream state).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from .appended_shards import AppendedShardStreamReader, _ShardPartition
from .webdataset_source import _record_skip


def _features_from_options(options) -> dict[str, str] | None:
    from ..sinks.tfrecord import KINDS

    raw = options.get("features")
    if not raw:
        return None
    features = json.loads(raw)
    if (not isinstance(features, dict) or not features
            or not all(isinstance(k, str) and v in KINDS
                       for k, v in features.items())):
        raise ValueError(
            "tfrecord `features` option must be a non-empty JSON "
            f"object of column -> kind (kinds: {KINDS}), got: {raw!r}")
    return features


def _parse_read_options(reader, options) -> None:
    """features/onCorrupt/onCorruptLogDir/verifyCrc parsing shared by
    the batch and stream readers (read() itself is shared too)."""
    reader._features = _features_from_options(options)
    mode = (options.get("oncorrupt") or "fail").lower()
    if mode not in ("fail", "skip"):
        raise ValueError(
            f"tfrecord onCorrupt must be 'fail' or 'skip', "
            f"got {mode!r}")
    reader._skip_corrupt = mode == "skip"
    reader._skip_log_dir = options.get("oncorruptlogdir") or None
    reader._verify_crc = (
        (options.get("verifycrc") or "true").lower() != "false")


class TFRecordReader(DataSourceReader):
    def __init__(self, options):
        self._path = options.get("path")
        if not self._path:
            raise ValueError(
                "tfrecord source needs a path: "
                "spark.read.format('tfrecord').load(<dir of *.tfrecord>)")
        _parse_read_options(self, options)

    def partitions(self) -> list[InputPartition]:
        import glob

        shards = sorted(glob.glob(os.path.join(self._path,
                                               "*.tfrecord")))
        if not shards:
            raise FileNotFoundError(
                f"no *.tfrecord shards under {self._path}")
        return [_ShardPartition(p) for p in shards]

    def read(self, partition: _ShardPartition
             ) -> Iterator[pa.RecordBatch]:
        from ..sinks.tfrecord import ARROW_TYPES, columns_for, rows_from_file

        with open(partition.path, "rb") as f:
            data = f.read()
        try:
            rows = list(rows_from_file(data, self._features,
                                       verify_crc=self._verify_crc))
        except ValueError as e:
            if self._skip_corrupt:
                _record_skip(partition.path, e, self._skip_log_dir)
                return
            raise ValueError(
                f"corrupt TFRecord shard {partition.path}: {e} "
                "(set onCorrupt=skip to drop corrupt shards)") from e
        if not rows:
            return
        shard = os.path.basename(partition.path)
        # column order/types come from the features DICT (columns_for;
        # never re-parsed out of the DDL string, whose names may
        # contain spaces/commas/backticks)
        names = columns_for(self._features)
        arrays = [pa.array([shard] * len(rows), pa.string())]
        if not self._features:
            arrays.append(pa.array([r["record"] for r in rows],
                                   pa.binary()))
        else:
            for name in names[1:]:
                arrays.append(pa.array(
                    [r[name] for r in rows],
                    ARROW_TYPES[self._features[name]]))
        yield pa.RecordBatch.from_arrays(arrays, names=names)


class TFRecordStreamReader(AppendedShardStreamReader):
    """Micro-batch TFRecord-shard stream: reads shards that APPEARED
    since the last committed offset. Offset model, append-only
    producer contract, and `maxShardsPerTrigger` backpressure (incl.
    the first-batch-unbounded caveat) are the shared filename-
    watermark protocol documented on sources/appended_shards.
    AppendedShardStreamReader — the same reader the webdataset stream
    uses, parameterized by glob; record decode is the batch reader's,
    so onCorrupt=skip keeps a poison shard from failing every retry of
    its micro-batch forever."""

    format_name = "tfrecord"
    shard_glob = "*.tfrecord"

    def __init__(self, options):
        super().__init__(options)
        _parse_read_options(self, options)

    # the batch reader's decode/skip/Arrow handoff, one shard per task
    _read_shard = TFRecordReader.read


class TFRecordDataSource(DataSource):
    """`format("tfrecord")` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "tfrecord"

    def schema(self) -> str:
        from ..sinks.tfrecord import schema_for

        return schema_for(_features_from_options(self.options))

    def reader(self, schema) -> TFRecordReader:
        return TFRecordReader(self.options)

    def streamReader(self, schema) -> TFRecordStreamReader:
        return TFRecordStreamReader(self.options)


def register_tfrecord_source(spark) -> None:
    """Idempotently register `format("tfrecord")` on this session."""
    spark.dataSource.register(TFRecordDataSource)
