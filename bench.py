#!/usr/bin/env python
"""Benchmark the declared query inventory.

Runs every query from kafka_elasticsearch_injector_spark.plans at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], executing each plan to completion through the
`noop` sink (full engine execution, no driver collect overhead).

Each query is executed once UNMEASURED (Janino compiles each distinct
plan's generated code on its first execution — ~0.7-0.9 s on heavy
expression trees, plan-specific so no generic warmup can absorb it),
then timed TWICE with the min reported: a steady-state number, and a
run-to-run spread that flags real machine anomalies (the round-2
phantom 10× GC stall) instead of routine first-compile.

Output contract: the final stdout line is ONE COMPACT JSON summary —
{"metric", "value", "unit", "sf", "n_queries", "queries"} where
"queries" holds only the headline subset — guaranteed < 1 KB so a
tail-truncating capture still parses it (the full 118-entry dict blew
past the driver's tail buffer two rounds running). The complete
per-query timing map goes to BENCH_DETAIL.json next to this script
(non-default scale factors write BENCH_DETAIL_sf{sf}.json instead so
fast checks never clobber the committed sf0.1 record), and to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline queries echoed in the compact stdout summary (one per major
# operator family); everything else goes to BENCH_DETAIL.json/stderr.
HEADLINE = [
    "q_agg_hash", "q_tpch_q1", "q_join_multi", "q_dedup_minhash",
    "q_ann_ivf", "q_curation_pipeline",
]

# Hard ceiling on the stdout summary line: the capture that records it
# keeps only a ~2 KB tail, truncating from the FRONT — a line that
# grows past this silently becomes unparseable downstream.
MAX_SUMMARY_BYTES = 1024


def spread_flags(runs: dict[str, list[float]],
                 ratio: float = 3.0, slack: float = 0.5) -> list[str]:
    """Queries whose slowest run exceeds ratio×fastest + slack seconds —
    the one-off Janino-codegen / GC-stall signature that inflated
    q_scalar_math 10× in round 2. min-of-runs already keeps the stall
    out of the headline number; this records WHERE stalls happened so a
    rerun investigates the machine, not the operator."""
    return sorted(
        name for name, ts in runs.items()
        if len(ts) > 1 and max(ts) > ratio * min(ts) + slack)


def build_summary(timings: dict[str, float], sf_val: float | str,
                  detail_name: str = "BENCH_DETAIL.json") -> str:
    """The single stdout line: compact JSON, total + headline timings
    only, guaranteed under MAX_SUMMARY_BYTES."""
    summary = {
        "metric": "declared_inventory_wall_clock",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "sf": sf_val,
        "n_queries": len(timings),
        "queries": {q: timings[q] for q in HEADLINE if q in timings},
        "detail": detail_name,
    }
    line = json.dumps(summary)
    if len(line.encode()) > MAX_SUMMARY_BYTES:  # pragma: no cover
        summary.pop("queries")
        line = json.dumps(summary)
    return line


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

    # Warm the window-exec codegen path too: round 4's only
    # spread-flagged query (q_dedup_normalized, runs [1.13 s, 0.14 s])
    # was the first window plan to execute — an 8x first-touch
    # codegen/JIT stall that min-of-2 absorbed but shouldn't recur.
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    _w = Window.partitionBy(F.col("id") % 8).orderBy("id")
    (spark.range(1024)
     .select("id", F.row_number().over(_w).alias("rn"),
             F.count(F.lit(1)).over(Window.partitionBy(F.col("id") % 8))
             .alias("cnt"))
     .write.format("noop").mode("overwrite").save())

    # Build each plan ONCE, execute once unmeasured (per-plan codegen
    # compile — the 64-lane decimal centroid aggregate pays ~5 s of
    # whole-stage codegen on first execution, then runs in under a
    # second), then time two steady-state runs and report the min.
    # Driver-side plan construction (py4j expression building +
    # Catalyst analysis) is a per-query constant amortized to nothing
    # at scale.
    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    for name, fn in sorted(inventory.items()):
        df = fn(spark, SF_DIR)
        # Unmeasured first execution: pays the per-plan Janino compile
        # so both timed runs are steady-state (see module docstring).
        df.write.format("noop").mode("overwrite").save()
        ts: list[float] = []
        for _ in range(2):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 4))
        runs[name] = ts
        timings[name] = min(ts)

    sf = os.path.basename(SF_DIR.rstrip("/")).removeprefix("sf")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    detail = {
        "metric": "declared_inventory_wall_clock",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "runs": runs,
        "spread_flagged": spread_flags(runs),
        "sf": sf_val,
    }
    # The committed BENCH_DETAIL.json is the sf0.1 record the rounds
    # compare against; a fast-check run at any other SF writes a
    # suffixed file instead of clobbering it (this trap got an sf0.01
    # detail committed in rounds 6 AND 7 before being fixed here).
    detail_name = ("BENCH_DETAIL.json" if sf_val == 0.1
                   else f"BENCH_DETAIL_sf{sf}.json")
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), detail_name)
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    print(json.dumps(detail), file=sys.stderr, flush=True)

    real_stdout.write(build_summary(timings, sf_val, detail_name) + "\n")
    real_stdout.flush()


if __name__ == "__main__":
    main()
