"""Shared micro-batch offset model for APPEND-ONLY shard directories.

One implementation of the filename-watermark stream protocol, reused
by the registered webdataset (tar) and tfrecord sources — the ingest
path for a corpus being produced shard-by-shard upstream (a writer
fleet dropping `shard-NNNNN.<ext>` files as it finishes them).

Offset model: the lexicographic high-water mark of processed shard
FILENAMES (`{"last": "shard-00042.tar"}`), so offsets stay O(1)
regardless of how many shards ever existed. The producer contract is
APPEND-ONLY: each shard is published once via atomic rename, names
sort in production order, and published bytes never change. A name
sorting BELOW the watermark after its directory was scanned is
silently ignored, exactly like a late file under Spark's own file
source. NOTE this is NOT the contract of the repo's own
staged_publish exporters — a re-export REPLACES shard files under the
SAME names, which a watermark (or any replayable offset log) cannot
represent: don't point a stream at a directory that gets re-exported;
stream from a directory a producer only appends to.

Parallelism: partitions(start, end) lists the new names driver-side;
each task streams ONE shard — the same per-task memory bound and
Arrow handoff as the batch readers.

Backpressure: `maxShardsPerTrigger` (option, default unbounded) caps
how many shards each micro-batch ingests — the shard analog of the
Kafka source's maxOffsetsPerTrigger (reference §2.1 op 2,
KAFKA_CONSUMER_BUFFER_SIZE in src/injector/injector.go:31-34), so a
producer burst drains in bounded batches. Scope caveat: each RUN's
first batch is unbounded — the Python stream API gives latestOffset
no view of the committed start (verified empirically: it even fires
BEFORE initialOffset), and answering below a restart's committed
start regresses the watermark into re-delivery, so the cap engages
only once this run has PLANNED a batch (partitions()/commit() advance
the cap's floor; latestOffset never does, so an engine that polls it
several times before planning gets idempotent answers instead of one
batch widened by a cap-width per poll). Bound a large FIRST import
by starting the stream before bulk-publishing, or ingest the backlog
with the batch reader first.

Python-stream-API facts this encodes (r9, instrumented probe):
option keys arrive LOWERCASED (CaseInsensitiveMap); latestOffset()
fires before initialOffset() on a fresh query and the engine may
build reader instances it never drives; there is no admission-control
hook, so rate limiting keys off the highest offset THIS reader
already answered.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from dataclasses import dataclass

import pyarrow as pa
from pyspark.sql.datasource import DataSourceStreamReader, InputPartition


@dataclass
class _ShardPartition(InputPartition):
    path: str


class AppendedShardStreamReader(DataSourceStreamReader):
    """Subclass contract: set `format_name` (error messages) and
    `shard_glob` (e.g. "*.tar"), parse format-specific options in
    __init__ AFTER super().__init__, and implement `_read_shard`."""

    format_name = "shard"
    shard_glob = "*"

    def __init__(self, options):
        self._path = options.get("path")
        if not self._path:
            raise ValueError(
                f"{self.format_name} stream needs a path: "
                f"spark.readStream.format('{self.format_name}')"
                ".load(<dir>)")
        raw = options.get("maxshardspertrigger")
        self._max_shards = int(raw) if raw else None
        if self._max_shards is not None and self._max_shards < 1:
            raise ValueError("maxShardsPerTrigger must be >= 1, got "
                             f"{raw!r}")
        # Backpressure floor = the end of the last batch this RUN has
        # PLANNED (partitions()) or committed — NOT the last
        # latestOffset answer: if the engine polls latestOffset more
        # than once before planning a batch, an answer-advanced floor
        # would widen that batch by another cap-width per poll
        # (over-delivery). Repeated polls between plans are idempotent
        # instead. The first poll of a run still answers unbounded
        # (module docstring).
        self._floor: str | None = None

    def _names(self) -> list[str]:
        import glob

        return sorted(os.path.basename(p) for p in
                      glob.glob(os.path.join(self._path,
                                             self.shard_glob)))

    def initialOffset(self) -> dict:
        return {"last": ""}

    def latestOffset(self) -> dict:
        names = self._names()
        if not names:
            # latestOffset never establishes the floor (only planned
            # batches do) — in particular an empty-directory poll on a
            # restart whose committed start this reader cannot see
            # must answer unbounded, never below that start
            # (property-tested watermark-regression hazard)
            return {"last": ""}
        # maxShardsPerTrigger: bound each batch to the first N names
        # above the floor (unbounded until this run plans a batch).
        end = names[-1]
        if self._max_shards is not None and self._floor is not None:
            pending = [n for n in names if n > self._floor]
            if pending:
                end = pending[min(self._max_shards, len(pending)) - 1]
        if self._floor is not None and end < self._floor:
            # never answer below an already-planned end (a late file
            # sorting under the watermark must not regress the offset)
            end = self._floor
        return {"last": end}

    def _advance_floor(self, hi: str) -> None:
        if hi and (self._floor is None or hi > self._floor):
            self._floor = hi

    def partitions(self, start: dict, end: dict):
        lo, hi = start.get("last", ""), end.get("last", "")
        # The floor tracks PLANNED ends — this is where a batch becomes
        # real, so this (not latestOffset) is where the cap's window
        # advances.
        self._advance_floor(hi)
        new = [n for n in self._names() if lo < n <= hi]
        # An empty batch still needs one no-op partition: the API
        # requires a non-empty sequence.
        if not new:
            return [_ShardPartition("")]
        return [_ShardPartition(os.path.join(self._path, n))
                for n in new]

    def read(self, partition: _ShardPartition
             ) -> Iterator[pa.RecordBatch]:
        if not partition.path:
            return
        yield from self._read_shard(partition)

    def _read_shard(self, partition: _ShardPartition
                    ) -> Iterator[pa.RecordBatch]:
        raise NotImplementedError   # subclass responsibility

    def commit(self, end: dict) -> None:
        # Defensive twin of partitions(): a committed end is by
        # definition a planned one.
        self._advance_floor(end.get("last", ""))
