"""SparkSession builder.

Scale notes (100 TB / 1000-executor design):
- AQE on: runtime shuffle-partition coalescing + skew-join splitting means
  we do not hand-tune shuffle partition counts per query; at sf0.1 local
  we seed `spark.sql.shuffle.partitions` ≈ cores so small-scale runs don't
  pay 200-partition scheduling overhead, while at cluster scale AQE
  re-plans from the same logical plans.
- Arrow enabled for the Pandas-UDF paths (vector ops fall back to
  higher-order functions first; Arrow is the slow-path transport).
- Broadcast threshold left at default 10 MB: dimension tables (region,
  nation, supplier, part, customer) stay broadcast-able far beyond sf0.1;
  at 100 TB the fact tables (lineitem/orders/events) are the shuffled side.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "kafka-elasticsearch-injector-spark",
              master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Testdata parquet stores TIMESTAMP(NANOS); Spark has no nanos type,
        # so read as long and convert to micros in io.table() (same
        # truncation DuckDB applies reading ns into its micros timestamps).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    return builder.getOrCreate()
