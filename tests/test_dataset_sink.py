"""Training-shard export: layout, determinism, manifest totals, and
partition pruning on read-back."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from kafka_elasticsearch_injector_spark.io import table
from kafka_elasticsearch_injector_spark.sinks import dataset as DS

SF_DIR = "/root/testdata/sf0.001"


def test_export_layout_and_roundtrip(spark, tmp_path):
    docs = table(spark, SF_DIR, "documents")
    out = str(tmp_path / "ds")
    DS.write_training_shards(docs, out, n_shards=4)

    shard_dirs = sorted(os.path.basename(p)
                        for p in glob.glob(os.path.join(out, "shard=*")))
    assert shard_dirs == ["shard=0", "shard=1", "shard=2", "shard=3"]

    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    # Every row landed in its deterministic shard.
    assert back.filter(back.shard != back.doc_id % 4).count() == 0


def test_export_is_deterministic(spark, tmp_path):
    docs = table(spark, SF_DIR, "documents")
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    DS.write_training_shards(docs, a, n_shards=4)
    DS.write_training_shards(docs, b, n_shards=4)

    def shard_bytes(root):
        # Part-file NAMES embed a random task UUID; the determinism
        # contract is about contents — per shard, the multiset of file
        # bytes must be identical run to run.
        out = {}
        for d in glob.glob(os.path.join(root, "shard=*")):
            out[os.path.basename(d)] = sorted(
                open(p, "rb").read()
                for p in glob.glob(os.path.join(d, "*.parquet")))
        return out

    assert shard_bytes(a) == shard_bytes(b)


def test_manifest_totals_match_input(spark, tmp_path):
    docs = table(spark, SF_DIR, "documents")
    out = str(tmp_path / "ds")
    DS.write_training_shards(docs, out, n_shards=4)
    man = DS.shard_manifest(spark, out).collect()

    assert [r.shard for r in man] == [0, 1, 2, 3]
    assert sum(r.n_rows for r in man) == docs.count()
    want_tokens = docs.select(
        F.sum(F.size(F.split("text", " ", -1)))).first()[0]
    assert sum(r.n_tokens for r in man) == want_tokens
    want_chars = docs.select(F.sum(F.length("text"))).first()[0]
    assert sum(r.n_chars for r in man) == want_chars
    for r in man:
        assert r.id_lo % 4 == r.shard and r.id_hi % 4 == r.shard


def test_shard_filter_is_partition_pruned(spark, tmp_path):
    docs = table(spark, SF_DIR, "documents")
    out = str(tmp_path / "ds")
    DS.write_training_shards(docs, out, n_shards=4)
    df = spark.read.parquet(out).filter(F.col("shard") == 2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # The shard predicate must prune directories, not filter rows.
    assert "PartitionFilters: [isnotnull(shard" in plan \
        or "PartitionFilters: [(shard" in plan, plan
    assert df.count() == docs.filter(F.col("doc_id") % 4 == 2).count()


def test_skewed_shard_splits_files(spark, tmp_path):
    # One shard, tiny per-file cap: the writer must emit multiple
    # bounded files rather than one oversized one.
    docs = table(spark, SF_DIR, "documents")
    out = str(tmp_path / "ds")
    DS.write_training_shards(docs, out, n_shards=1,
                             max_records_per_file=20)
    files = glob.glob(os.path.join(out, "shard=0", "*.parquet"))
    assert len(files) >= 2
