"""Training-dataset export: deterministic sharded parquet + manifest.

The last stage of a curation pipeline (dedup → mix → pack → EXPORT)
hands the corpus to a trainer, whose dataloader wants (a) a stable
shard layout it can seek and resume into, (b) a manifest of per-shard
row/token/byte counts for planning epochs and packing, (c) bit-stable
output so a re-run of the same input produces the same bytes.

The reference's terminal stage is the ES bulk sink
(src/elasticsearch/elasticsearch.go:60-124) — an at-least-once,
order-free store. A training export is the opposite contract:
deterministic placement and order. Spark-first shape:

- shard assignment is a PURE FUNCTION of the id (id % n_shards), never
  round-robin / rand / monotonically_increasing_id, all of which
  depend on task scheduling;
- one hash repartition on the shard column, rows sorted within each
  shard, written `partitionBy("shard")` so shard directories are
  self-describing and partition-pruned on read;
- `maxRecordsPerFile` bounds any one file (a skewed shard splits into
  numbered files instead of one huge one);
- zstd parquet — the trainer reads each shard many times, so spending
  write-side CPU on the better codec amortizes immediately.

At 100 TB: n_shards scales with the corpus (aim ~1 GB/shard), the
single shuffle is the only wide op, and the manifest aggregation is a
map-side partial count over the same partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def with_shard(df: DataFrame, n_shards: int,
               id_col: str = "doc_id") -> DataFrame:
    """Deterministic shard assignment: shard = id % n_shards."""
    return df.withColumn("shard", (F.col(id_col) % n_shards).cast("int"))


def write_training_shards(df: DataFrame, path: str, n_shards: int,
                          id_col: str = "doc_id",
                          text_col: str | None = "text",
                          max_records_per_file: int = 1_000_000) -> None:
    """Write `df` as shard-partitioned parquet at `path`.

    Layout: path/shard=K/part-*.parquet, rows of shard K only, sorted
    by `id_col` within each file. Reading `path` back with a
    `shard = K` filter is partition-pruned to one directory.
    """
    sharded = with_shard(df, n_shards, id_col)
    (
        sharded.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", id_col)
        .write.mode("overwrite")
        .option("compression", "zstd")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("shard")
        .parquet(path)
    )


def shard_manifest(spark: SparkSession, path: str,
                   id_col: str = "doc_id",
                   text_col: str | None = "text") -> DataFrame:
    """Per-shard manifest over an exported dataset: (shard, n_rows,
    id_lo, id_hi[, n_tokens, n_chars]) — what a dataloader needs to
    plan epochs/resume points without opening data files.

    Computed from the dataset itself (not tracked at write time) so it
    is also the export's verification: manifest totals must equal the
    input's. The aggregation partially combines per file-split; only
    one tiny row per shard shuffles.
    """
    ds = spark.read.parquet(path)
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.min(id_col).alias("id_lo"),
        F.max(id_col).alias("id_hi"),
    ]
    if text_col is not None and text_col in ds.columns:
        aggs += [
            F.sum(F.size(F.split(F.col(text_col), " ", -1)))
            .alias("n_tokens"),
            F.sum(F.length(text_col)).alias("n_chars"),
        ]
    return ds.groupBy("shard").agg(*aggs).orderBy("shard")
