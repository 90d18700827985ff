"""The registered `format("webdataset")` Python data source (Spark 4
DataSource API): planning one partition per shard, Arrow-batch reads,
and row-for-row agreement with the binaryFile-based helper reader."""

from __future__ import annotations

import json

import pytest


@pytest.fixture()
def tar_export(spark, tmp_path):
    from kafka_elasticsearch_injector_spark.sinks.webdataset import (
        write_webdataset,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i}", f"lang{i % 3}") for i in range(30)],
        "doc_id long, text string, lang string")
    out = str(tmp_path / "wds")
    write_webdataset(docs, out, 4,
                     members={"txt": "text", "lang": "lang"}).collect()
    return out


def _register(spark):
    from kafka_elasticsearch_injector_spark.sources.webdataset_source import (
        register_webdataset_source,
    )

    register_webdataset_source(spark)


def test_source_matches_helper_reader(spark, tar_export):
    from kafka_elasticsearch_injector_spark.sinks.webdataset import (
        read_webdataset,
    )

    _register(spark)
    members = {"txt": "text", "lang": "lang"}
    via_source = (spark.read.format("webdataset")
                  .option("members", json.dumps(members))
                  .load(tar_export))
    via_helper = read_webdataset(spark, tar_export, members=members)
    assert via_source.schema == via_helper.schema
    a = sorted(map(tuple, via_source.collect()))
    b = sorted(map(tuple, via_helper.collect()))
    assert a == b and len(a) == 30


def test_source_plans_one_partition_per_shard(spark, tar_export):
    _register(spark)
    df = spark.read.format("webdataset").load(tar_export)
    # 4 shards were written; planning must yield exactly 4 partitions.
    assert df.rdd.getNumPartitions() == 4
    # default members = {"txt": "text"}
    assert df.columns == ["shard", "key", "text"]
    assert df.count() == 30


def test_source_option_validation(spark, tar_export):
    _register(spark)
    with pytest.raises(Exception, match="members"):
        (spark.read.format("webdataset")
         .option("members", '"not-an-object"').load(tar_export).collect())
    with pytest.raises(Exception, match="no \\*\\.tar shards"):
        (spark.read.format("webdataset")
         .load(tar_export + "/empty-subdir").collect())


def test_source_column_pruning_still_returns_requested(spark, tar_export):
    """select() over the source (projection happens above the Python
    reader) — values must survive the Arrow handoff byte-exactly."""
    _register(spark)
    df = (spark.read.format("webdataset")
          .option("members", json.dumps({"txt": "text"}))
          .load(tar_export))
    got = {r.key: bytes(r.text) for r in df.select("key", "text").collect()}
    assert got[f"{7:012d}"] == b"text 7"
    assert len(got) == 30
