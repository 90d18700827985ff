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
- GC is gated on the session's workload `mode`:
  - mode="batch" (default): throughput GC (-XX:+UseParallelGC) on driver
    and executors — batch engines want allocation throughput, not G1's
    pause-time goals. Under the default G1 (the JVM default since
    Java 9) the full declared-query bench runs ~18% slower end-to-end
    on this repo and individual HOF-heavy queries intermittently spike
    2-4x from mixed collections; ParallelGC removes both effects
    (measured at sf0.1, Java 17).
  - mode="streaming": NO GC override — ParallelGC's stop-the-world full
    collections can add multi-second micro-batch latency spikes on 8g+
    heaps, exactly the tail a latency-bound injector cares about; the
    JVM-default G1's pause-time goal is the right trade there.
  Cluster caveat: extraJavaOptions is a single string the deployment
  may ALSO populate (admin-set GC/heap flags via spark-defaults.conf or
  --conf). Spark does not merge the two — this builder's value wins at
  submit unless the deployment overrides it, so a real cluster rollout
  should fold site flags into one line (or pass mode="streaming" and
  own GC entirely in site config).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def gc_java_options(mode: str) -> str:
    """JVM GC flags for a workload mode (see module docstring): batch
    pins throughput GC; streaming keeps the JVM default (G1) because
    ParallelGC's full-collection pauses land in micro-batch latency."""
    if mode not in ("batch", "streaming"):
        raise ValueError(f"mode must be 'batch' or 'streaming', got {mode!r}")
    return "-XX:+UseParallelGC" if mode == "batch" else ""


def get_spark(app_name: str = "kafka-elasticsearch-injector-spark",
              master: str | None = None,
              shuffle_partitions: int | None = None,
              mode: str = "batch") -> SparkSession:
    gc_opts = gc_java_options(mode)
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
    if gc_opts:
        # Workload-gated GC (see module docstring). Only effective when
        # this builder launches the JVM (local mode: driver ==
        # executors); on a cluster the executor option applies to every
        # executor JVM at launch.
        builder = (builder
                   .config("spark.driver.extraJavaOptions", gc_opts)
                   .config("spark.executor.extraJavaOptions", gc_opts))
    return builder.getOrCreate()
