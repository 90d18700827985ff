"""Observability: the reference's Prometheus lag/throughput metrics
(src/metrics/metrics.go:36-65, ticker consumer.go:86-97) map onto
Structured Streaming's progress events — no polling goroutine needed,
the engine emits progress after every micro-batch.
"""

from __future__ import annotations

import json

from pyspark.sql.streaming import StreamingQueryListener


class InjectorMetricsListener(StreamingQueryListener):
    """Collects per-batch throughput and source lag.

    numInputRows ≙ recordsConsumed counter; sources[].metrics
    (maxOffsetsBehindLatest for Kafka) ≙ the per-partition delay gauge the
    reference computes from HighWaterMarks() - consumed offset.
    """

    def __init__(self):
        self.progress: list[dict] = []

    def onQueryStarted(self, event) -> None:
        pass

    def onQueryProgress(self, event) -> None:
        p = json.loads(event.progress.json)
        self.progress.append({
            "batchId": p.get("batchId"),
            "numInputRows": p.get("numInputRows"),
            "durationMs": p.get("durationMs"),
            "sources": [
                {"description": s.get("description"),
                 "metrics": s.get("metrics", {})}
                for s in p.get("sources", [])
            ],
        })

    def onQueryTerminated(self, event) -> None:
        pass

    def onQueryIdle(self, event) -> None:
        pass

    @property
    def total_rows(self) -> int:
        return sum(p["numInputRows"] or 0 for p in self.progress)
