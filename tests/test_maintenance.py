"""Small-files compaction: footer-planned target, atomic swap, no-op
guard, row/value preservation, optional stats-restoring sort."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from kafka_elasticsearch_injector_spark.io import table
from kafka_elasticsearch_injector_spark.operators import maintenance as M


def _parquet_files(path: str) -> list[str]:
    return [f for f in glob.glob(os.path.join(path, "**", "*.parquet"),
                                 recursive=True)]


def test_compact_merges_small_files_and_preserves_rows(
        spark, sf_dir, tmp_path):
    src = table(spark, sf_dir, "events")
    frag = str(tmp_path / "frag")
    # Fragment: one file per of 64 partitions — the micro-batch litter.
    src.repartition(64).write.parquet(frag)
    assert len(_parquet_files(frag)) >= 64
    before = src.count()

    report = M.compact(spark, frag, target_file_bytes=64 * 2**20)
    assert report["skipped"] is False
    assert report["files_after"] < report["files_before"]
    assert len(_parquet_files(frag)) == report["files_after"]

    got = spark.read.parquet(frag)
    assert got.count() == before
    # value-level check on an aggregate
    a = src.agg(F.sum("event_id").alias("s")).collect()[0].s
    b = got.agg(F.sum("event_id").alias("s")).collect()[0].s
    assert a == b


def test_compact_noop_when_already_healthy(spark, sf_dir, tmp_path):
    path = str(tmp_path / "healthy")
    table(spark, sf_dir, "nation").coalesce(1).write.parquet(path)
    n = len(_parquet_files(path))
    report = M.compact(spark, path)
    assert report["skipped"] is True
    assert len(_parquet_files(path)) == n  # untouched


def test_compact_sort_restores_pruning_stats(spark, sf_dir, tmp_path):
    import pyarrow.parquet as pq

    path = str(tmp_path / "sorted")
    table(spark, sf_dir, "events").repartition(16).write.parquet(path)
    M.compact(spark, path, target_file_bytes=2**40, sort_cols=["event_id"])
    files = _parquet_files(path)
    assert len(files) == 1
    md = pq.ParquetFile(files[0]).metadata
    col_idx = next(i for i in range(md.num_columns)
                   if md.row_group(0).column(i).path_in_schema == "event_id")
    # row-group min/max on the sort column must be monotone non-overlapping
    ranges = [(md.row_group(g).column(col_idx).statistics.min,
               md.row_group(g).column(col_idx).statistics.max)
              for g in range(md.num_row_groups)]
    for (lo, hi), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi <= lo2, ranges


def test_compact_splits_oversized_file(spark, sf_dir, tmp_path):
    # The guard is two-directional: a single file far above the target
    # size is rewritten into ~total/target files (the split direction),
    # not skipped because n_files <= target.
    path = str(tmp_path / "oversized")
    table(spark, sf_dir, "events").coalesce(1).write.parquet(path)
    total, n_files, biggest = M.dataset_bytes(path)
    assert n_files == 1
    target_bytes = max(1, biggest // 8)  # force ~8-way split
    report = M.compact(spark, path, target_file_bytes=target_bytes)
    assert report["skipped"] is False
    assert report["files_after"] > 1
    _, after_n, after_max = M.dataset_bytes(path)
    assert after_n == report["files_after"]
    assert spark.read.parquet(path).count() == \
        table(spark, sf_dir, "events").count()
