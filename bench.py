#!/usr/bin/env python
"""Benchmark the declared query inventory.

Runs every query from kafka_elasticsearch_injector_spark.plans at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], executing each plan to completion through the
`noop` sink (full engine execution, no driver collect overhead), and
prints ONE JSON line: {"metric", "value", "unit", "queries", "sf"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    # The driver parses stdout as JSON; guarantee the result line is the ONLY
    # stdout line by pointing fd 1 at stderr for the whole run (the JVM child
    # inherits the redirected fd, so py4j/log4j/progress chatter can't land on
    # stdout) and writing the JSON to the saved real stdout at the end.
    real_stdout = os.fdopen(os.dup(1), "w")
    os.dup2(2, 1)
    sys.stdout = os.fdopen(os.dup(2), "w", buffering=1)

    from kafka_elasticsearch_injector_spark.plans import queries
    from kafka_elasticsearch_injector_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    inventory = queries()

    # Warm the JVM, parquet footers, and the Python/Arrow worker pool once
    # so per-query times measure the engine, not first-touch JIT/IO/fork.
    inventory["q_agg_hash"](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    from kafka_elasticsearch_injector_spark.io import table
    for t in ("documents", "embeddings", "events", "orders", "customer"):
        table(spark, SF_DIR, t).write.format("noop").mode("overwrite").save()
    def _warm_kernel(it):
        import numpy as np  # noqa: F811 — fault in numpy+BLAS per worker
        (np.ones((8, 8), np.float32) @ np.ones((8, 8), np.float32))
        yield from it

    spark.range(64).repartition(64).mapInPandas(
        _warm_kernel, "id long").write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name, fn in sorted(inventory.items()):
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    sf = os.path.basename(SF_DIR.rstrip("/")).removeprefix("sf")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    real_stdout.write(json.dumps({
        "metric": "declared_inventory_wall_clock",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }) + "\n")
    real_stdout.flush()


if __name__ == "__main__":
    main()
