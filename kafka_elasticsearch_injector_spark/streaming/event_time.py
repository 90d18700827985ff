"""Event-time streaming operators: watermarked tumbling/session windows
and keyed stateful dedup.

The reference has NO event-time logic — batching is count-based
(reference src/kafka/consumer.go:137-145) and time only routes index
names (SURVEY.md §2.2) — so these are engine capabilities the reference
user gains, not parity items. They're exercised by integration tests
(tests/test_event_time.py), not the DuckDB oracle: watermark/late-data
semantics are trigger-dependent and deliberately excluded from t2
(SURVEY.md §2.3).

Scale notes:
- watermark state is per-window-per-key; with 1h tumbling windows and a
  30m watermark the state store holds ≤ 2 open windows per key — bounded
  regardless of throughput.
- session windows merge on overlap; skewed keys (one chatty user) grow a
  single session, not state cardinality.
- stateful dedup state is one empty row per seen key — at 100 TB scale
  bound it with a TTL (processing-time timeout) matching the dedup
  horizon; create-only ES writes (es_sink.py) already make re-emission
  after expiry harmless (409 → AlreadyExists).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def tumbling_counts(events: DataFrame, ts_col: str = "ts",
                    key_col: str = "event_type",
                    window: str = "1 hour",
                    watermark: str = "30 minutes") -> DataFrame:
    """Watermarked tumbling-window counts per key (append-mode safe:
    a window emits once its end passes the watermark; later rows are
    late data and are dropped)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("win_start"),
                F.col("win.end").alias("win_end"), key_col, "n")
    )


def sliding_counts(events: DataFrame, ts_col: str = "ts",
                   key_col: str = "event_type",
                   window: str = "1 hour", slide: str = "30 minutes",
                   watermark: str = "30 minutes") -> DataFrame:
    """Watermarked sliding-window counts per key: each event lands in
    window/slide overlapping windows (the Expand happens map-side and
    partial aggregation collapses it before the shuffle — see the batch
    twin q_window_slide). A window emits once its END passes the
    watermark, so each logical window appears exactly once in append
    mode; state holds window/slide open windows per key."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window, slide).alias("win"),
                 F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("win_start"),
                F.col("win.end").alias("win_end"), key_col, "n")
    )


def session_counts(events: DataFrame, ts_col: str = "ts",
                   key_col: str = "user_id",
                   gap: str = "30 minutes",
                   watermark: str = "30 minutes") -> DataFrame:
    """Session windows: events within `gap` of each other merge into one
    session per key; a session closes when the watermark passes its end."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sess"),
                 F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("sess.start").alias("sess_start"),
                F.col("sess.end").alias("sess_end"), key_col, "n")
    )


def join_streams(left: DataFrame, right: DataFrame, key: str,
                 left_ts: str = "ts", right_ts: str = "ts",
                 watermark: str = "30 minutes",
                 bound: str = "15 minutes",
                 how: str = "inner") -> DataFrame:
    """Watermarked stream-stream interval join: pair each left event
    with right events for the same key whose timestamp falls in
    [left_ts, left_ts + bound] — the click↔impression correlation shape.

    Semantics (Structured Streaming's spec, restated):
    - Both sides are watermarked; buffered state on each side is evicted
      once the watermark passes `bound` + watermark delay, so state is
      bounded by (throughput × horizon), independent of stream age.
    - `how="inner"` emits as matches arrive. `how="left"` additionally
      emits unmatched left rows with null right columns — but only once
      the watermark proves no match can still arrive, so outer results
      trail by the watermark delay (that lag is inherent, not a bug).
    - The time-bound condition is REQUIRED — an unconstrained
      stream-stream join would buffer both streams forever; this
      function makes the unsafe shape unrepresentable.

    Output columns: left's as-is, right's prefixed `r_` (the key and
    timestamp columns collide by construction).

    Scale: the join shuffles both sides on the key; state-store entries
    live in executor memory/RocksDB. Skewed keys concentrate buffered
    rows — at 100 TB route chatty keys through a salted pre-aggregation
    or shorten `bound` for them.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    lw = left.withWatermark(left_ts, watermark).alias("l")
    rw = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (F.col(f"r.{right_ts}")
           <= F.col(f"l.{left_ts}") + F.expr(f"interval {bound}"))
    )
    joined = lw.join(rw, cond, "inner" if how == "inner" else "leftOuter")
    left_cols = [F.col(f"l.{c}").alias(c) for c in left.columns]
    right_cols = [F.col(f"r.{c}").alias(f"r_{c}") for c in right.columns]
    return joined.select(*left_cols, *right_cols)


def tumbling_ohlc(events: DataFrame, ts_col: str = "ts",
                  key_col: str = "user_id", value_col: str = "value",
                  id_col: str = "event_id",
                  window: str = "1 day",
                  watermark: str = "30 minutes") -> DataFrame:
    """Watermarked tumbling-window OHLC candles per key — the streaming
    twin of the declared batch query q_resample_ohlc (plans/part_d3.py).

    open/close are the first/last value by event time within the
    window, picked by min_by/max_by over the same sortable
    (zero-padded micros ‖ id) string key as the batch twin, so a
    replayed window produces byte-identical candles. All five
    aggregates are partial-aggregable, which is what makes them legal
    (and efficient) under a streaming aggregation: per-micro-batch
    partials merge into window state, one candle per (key, window) in
    the store.
    """
    ord_key = F.concat(
        F.date_format(ts_col, "yyyy-MM-dd HH:mm:ss.SSSSSS"),
        F.lpad(F.col(id_col).cast("string"), 12, "0"))
    return (
        events.withColumn("_k", ord_key)
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"),
                 F.col(key_col))
        .agg(
            F.round(F.min_by(value_col, "_k"), 6).alias("open"),
            F.round(F.max(value_col), 6).alias("high"),
            F.round(F.min(value_col), 6).alias("low"),
            F.round(F.max_by(value_col, "_k"), 6).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(F.col("win.start").alias("win_start"),
                F.col("win.end").alias("win_end"), key_col,
                "open", "high", "low", "close", "n_events")
    )


def streaming_dedup(events: DataFrame, key_col: str,
                    payload_cols: list[str],
                    ttl_minutes: int | None = None) -> DataFrame:
    """First-occurrence-wins dedup across micro-batches via
    applyInPandasWithState: one empty state row per seen key; later
    arrivals of the same key emit nothing.

    This is the streaming-native twin of the sink-side create-only
    idempotence (op 20, reference src/elasticsearch/elasticsearch.go:
    95-104,120-124): dedup BEFORE the sink saves the wasted bulk traffic
    the reference spends on 409 round-trips. `ttl_minutes` bounds state
    (processing-time timeout); expired keys may re-emit, which the
    create-only sink still absorbs.
    """
    out_fields = [T.StructField(key_col, T.LongType())] + [
        T.StructField(c, T.StringType()) for c in payload_cols]
    out_schema = T.StructType(out_fields)
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])
    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if ttl_minutes else GroupStateTimeout.NoTimeout)

    def dedup_fn(key: Any, pdfs: Iterator[pd.DataFrame],
                 state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            for _ in pdfs:  # drain; all rows are duplicates
                pass
            return
        first = None
        for pdf in pdfs:
            if len(pdf) and first is None:
                first = pdf.iloc[:1][[key_col, *payload_cols]]
        state.update((True,))
        if ttl_minutes:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)
        if first is not None:
            yield first

    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            dedup_fn, out_schema, state_schema, "append", timeout)
    )
