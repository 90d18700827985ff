"""Event-time streaming semantics: watermark + tumbling windows with
late-data drop, session windows, and stateful cross-batch dedup.

These behaviors are trigger-dependent and have no DuckDB oracle
(SURVEY.md §2.3 exclusion); expectations are hand-computed, mirroring
the reference's integration-test tier (consumer_test.go) in spirit.
Micro-batch boundaries are forced by running one availableNow pass per
added file against a shared checkpoint (see _run_batches).
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from kafka_elasticsearch_injector_spark.streaming.event_time import (
    session_counts,
    sliding_counts,
    streaming_dedup,
    tumbling_counts,
)
from kafka_elasticsearch_injector_spark.streaming.pipeline import (
    enrich_static,
)

BASE = dt.datetime(2024, 1, 1, 10, 0, 0)


def _m(minutes: float) -> dt.datetime:
    return BASE + dt.timedelta(minutes=minutes)


class _few_state_partitions:
    """Stateful streaming stages spawn one state-store task per
    spark.sql.shuffle.partitions PER MICRO-BATCH; at the session
    default (32) each toy availableNow pass pays ~30 no-op state tasks,
    which dominated this module's wall-clock. The partition count is
    baked into the checkpoint at first start, so 4 here only affects
    these tests' own checkpoints — production keeps the session
    default + AQE."""

    N = 4

    def __init__(self, spark):
        self.spark = spark

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", str(self.N))

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.prev)


def _run_batches(spark, root, schema, transform, batches):
    """Deterministic micro-batch boundaries: add one file, run an
    availableNow pass to completion, repeat. Watermark/state live in the
    shared checkpoint, so each pass IS one (or more) micro-batch over
    exactly the new file — no reliance on file-source admission control.
    Returns the accumulated append-mode output."""
    src_dir = os.path.join(root, "src")
    out_dir = os.path.join(root, "out")
    ckpt = os.path.join(root, "ckpt")
    os.makedirs(src_dir, exist_ok=True)
    with _few_state_partitions(spark):
        for i, rows in enumerate(batches):
            spark.createDataFrame(rows, schema).repartition(1).write.parquet(
                os.path.join(src_dir, f"batch_{i}.parquet"))
            src = spark.readStream.schema(schema).parquet(
                os.path.join(src_dir, "*.parquet"))
            q = (
                transform(src).writeStream.format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True).start()
            )
            assert q.awaitTermination(120), "stream pass timed out"
    return spark.read.parquet(out_dir)


def test_tumbling_window_drops_late_data(spark, tmp_path):
    schema = "ts TIMESTAMP, event_type STRING"
    batches = [
        # batch 0: window 10:00-11:00 gets 2 rows; 12:00 advances the
        # max event time, so the watermark after this batch is 11:30.
        [(_m(5), "a"), (_m(20), "a"), (_m(120), "a")],
        # batch 1: 10:15 is LATE (watermark 11:30 > window end 11:00) →
        # dropped; 12:40 advances the watermark to 12:10, finalizing the
        # 12:00-13:00 window only later.
        [(_m(15), "a"), (_m(160), "a")],
        # batch 2: push the watermark past 13:00 so window 12:00-13:00
        # (and 12:40's) finalize and emit.
        [(_m(240), "a")],
    ]
    out = _run_batches(
        spark, str(tmp_path), schema,
        lambda df: tumbling_counts(df, "ts", "event_type",
                                   "1 hour", "30 minutes"),
        batches)
    got = {(r.win_start, r.n) for r in out.collect()}
    # the 10:00 window emitted with count 2 — the late 10:15 row did NOT
    # re-open or bump it.
    assert (BASE, 2) in got
    assert (BASE.replace(hour=12), 2) in got  # 12:00 + 12:40


def test_session_window_merges_within_gap(spark, tmp_path):
    schema = "ts TIMESTAMP, user_id LONG"
    batches = [
        # user 1: events at 0,20,35m chain into one session (gap 30m);
        # the 200m event closes it (and advances the watermark).
        [(_m(0), 1), (_m(20), 1), (_m(35), 1), (_m(200), 1)],
        [(_m(500), 1)],  # push watermark to finalize everything earlier
    ]
    out = _run_batches(
        spark, str(tmp_path), schema,
        lambda df: session_counts(df, "ts", "user_id", "30 minutes",
                                  "30 minutes"),
        batches)
    rows = {(r.sess_start, r.sess_end, r.n) for r in out.collect()}
    assert (_m(0), _m(65), 3) in rows          # merged session + 30m gap tail
    assert any(s == _m(200) and n == 1 for s, _e, n in rows)


def test_sliding_window_double_counts_overlap(spark, tmp_path):
    schema = "ts TIMESTAMP, event_type STRING"
    batches = [
        # 10:05 and 10:20 each belong to windows [9:30,10:30) and
        # [10:00,11:00); 13:00 advances the watermark to 12:30 so both
        # windows finalize and emit.
        [(_m(5), "a"), (_m(20), "a"), (_m(180), "a")],
    ]
    out = _run_batches(
        spark, str(tmp_path), schema,
        lambda df: sliding_counts(df, "ts", "event_type",
                                  "1 hour", "30 minutes", "30 minutes"),
        batches)
    got = {(r.win_start, r.n) for r in out.collect()}
    assert (_m(-30), 2) in got   # 09:30-10:30
    assert (_m(0), 2) in got     # 10:00-11:00


def test_stream_static_enrich_broadcast_left_join(spark, tmp_path):
    schema = "ts TIMESTAMP, event_type STRING"
    dim = spark.createDataFrame(
        [("a", "alpha"), ("b", "beta")], "event_type STRING, label STRING")
    batches = [
        [(_m(0), "a"), (_m(1), "zzz")],   # zzz has no dimension row
        [(_m(2), "b")],
    ]
    out = _run_batches(
        spark, str(tmp_path), schema,
        lambda df: enrich_static(df, dim, "event_type"),
        batches)
    got = {(r.event_type, r.label) for r in out.collect()}
    assert got == {("a", "alpha"), ("zzz", None), ("b", "beta")}


def test_streaming_dedup_across_batches(spark, tmp_path):
    schema = "event_id LONG, props STRING, ts TIMESTAMP"
    batches = [
        [(1, "first-1", _m(0)), (1, "dup-in-batch", _m(1)), (2, "first-2", _m(2))],
        [(2, "dup-across-batch", _m(3)), (3, "first-3", _m(4))],
    ]
    out = _run_batches(
        spark, str(tmp_path), schema,
        lambda df: streaming_dedup(df, "event_id", ["props"]),
        batches)
    got = {(r.event_id, r.props) for r in out.collect()}
    assert got == {(1, "first-1"), (2, "first-2"), (3, "first-3")}


def _run_two_stream_batches(spark, root, lschema, rschema, transform,
                            batches):
    """Two-source twin of _run_batches: each step adds one file per
    side, then one availableNow pass over the shared checkpoint."""
    ldir, rdir = os.path.join(root, "lsrc"), os.path.join(root, "rsrc")
    out_dir, ckpt = os.path.join(root, "out"), os.path.join(root, "ckpt")
    os.makedirs(ldir, exist_ok=True)
    os.makedirs(rdir, exist_ok=True)
    with _few_state_partitions(spark):
        for i, (lrows, rrows) in enumerate(batches):
            spark.createDataFrame(lrows, lschema).repartition(1).write.parquet(
                os.path.join(ldir, f"batch_{i}.parquet"))
            spark.createDataFrame(rrows, rschema).repartition(1).write.parquet(
                os.path.join(rdir, f"batch_{i}.parquet"))
            left = spark.readStream.schema(lschema).parquet(
                os.path.join(ldir, "*.parquet"))
            right = spark.readStream.schema(rschema).parquet(
                os.path.join(rdir, "*.parquet"))
            q = (
                transform(left, right).writeStream.format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True).start()
            )
            assert q.awaitTermination(120), "stream pass timed out"
    return spark.read.parquet(out_dir)


def test_stream_stream_interval_join_inner(spark, tmp_path):
    from kafka_elasticsearch_injector_spark.streaming.event_time import (
        join_streams,
    )
    lschema = "user_id LONG, ts TIMESTAMP, imp STRING"     # impressions
    rschema = "user_id LONG, ts TIMESTAMP, page STRING"    # clicks
    batches = [
        # u1's click at +2 is within [imp_ts, imp_ts+15m] of its +0
        # impression → match. u2's click at +30 is outside the bound.
        ([(1, _m(0), "imp-1"), (2, _m(0), "imp-2")],
         [(1, _m(2), "home")]),
        ([], [(2, _m(30), "late-click")]),
        # u3: click arrives a batch AFTER the impression — the buffered
        # left state must still produce the match.
        ([(3, _m(40), "imp-3")], []),
        ([], [(3, _m(45), "detail")]),
    ]
    out = _run_two_stream_batches(
        spark, str(tmp_path), lschema, rschema,
        lambda l, r: join_streams(l, r, "user_id", bound="15 minutes"),
        batches)
    got = {(r.user_id, r.imp, r.r_page) for r in out.collect()}
    assert got == {(1, "imp-1", "home"), (3, "imp-3", "detail")}


def test_stream_stream_interval_join_left_outer(spark, tmp_path):
    from kafka_elasticsearch_injector_spark.streaming.event_time import (
        join_streams,
    )
    lschema = "user_id LONG, ts TIMESTAMP, imp STRING"
    rschema = "user_id LONG, ts TIMESTAMP, page STRING"
    batches = [
        ([(1, _m(0), "imp-1"), (2, _m(0), "imp-2")],
         [(1, _m(2), "home")]),
        # Advance BOTH watermarks far past imp-2's horizon (+15m bound +
        # 30m delay) so the unmatched left row is provably final and the
        # null-extended row emits.
        ([(9, _m(600), "imp-9")], [(9, _m(600), "p9")]),
        ([(8, _m(1200), "imp-8")], [(8, _m(1200), "p8")]),
    ]
    out = _run_two_stream_batches(
        spark, str(tmp_path), lschema, rschema,
        lambda l, r: join_streams(l, r, "user_id", bound="15 minutes",
                                  how="left"),
        batches)
    rows = {(r.user_id, r.imp, r.r_page) for r in out.collect()}
    assert (2, "imp-2", None) in rows          # unmatched → null-extended
    assert (1, "imp-1", "home") in rows        # matched row intact


def test_join_streams_rejects_unknown_how(spark):
    from kafka_elasticsearch_injector_spark.streaming.event_time import (
        join_streams,
    )
    df = spark.range(1).select(
        F.current_timestamp().alias("ts"), F.col("id").alias("user_id"))
    import pytest as _pytest
    with _pytest.raises(ValueError, match="inner|left"):
        join_streams(df, df, "user_id", how="full")


def test_tumbling_ohlc_matches_batch_candles(spark, tmp_path):
    from kafka_elasticsearch_injector_spark.streaming.event_time import (
        tumbling_ohlc,
    )

    schema = "ts TIMESTAMP, user_id LONG, value DOUBLE, event_id LONG"
    # Two users across two hourly windows, with a value tie inside
    # user 1's first window (ids 2 vs 3) so the unique ordering key is
    # what decides open/close.
    batches = [
        [(_m(1), 1, 10.0, 1), (_m(2), 1, 5.0, 2), (_m(2), 1, 7.0, 3),
         (_m(50), 1, 20.0, 4), (_m(10), 2, 3.0, 5)],
        # advance the watermark far enough to close both 10:00 windows
        [(_m(200), 1, 1.0, 6)],
        [(_m(400), 1, 2.0, 7)],
    ]
    out = _run_batches(
        spark, str(tmp_path), schema,
        lambda df: tumbling_ohlc(df, "ts", "user_id", "value", "event_id",
                                 "1 hour", "30 minutes"),
        batches)
    rows = {(r.user_id, r.win_start): (r.open, r.high, r.low, r.close,
                                       r.n_events)
            for r in out.collect()}
    assert rows[(1, _m(0))] == (10.0, 20.0, 5.0, 20.0, 4)
    assert rows[(2, _m(0))] == (3.0, 3.0, 3.0, 3.0, 1)
    # streaming candles == batch candles over the same rows (twin check)
    import itertools
    all_rows = list(itertools.chain.from_iterable(batches))
    batch_df = tumbling_ohlc(
        spark.createDataFrame(all_rows, schema),
        "ts", "user_id", "value", "event_id", "1 hour", "30 minutes")
    batch = {(r.user_id, r.win_start): (r.open, r.high, r.low, r.close,
                                        r.n_events)
             for r in batch_df.collect()}
    for k, v in rows.items():
        assert batch[k] == v, k
