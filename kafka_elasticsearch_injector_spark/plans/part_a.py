"""Part A — reference-semantics queries (SURVEY.md §2.3) on `events`.

The `events` table stands in for the Kafka stream (FIXTURES.md B1):
`event_id`/`user_id` play offset/partition, `ts` the message timestamp,
`props` the raw JSON payload, `event_type` the routing column. Each query
exercises one §2.1 operator through the composable transforms in
operators/injector.py, so the oracle checks the operator layer itself.

All per-row (map/filter/project) — at 100 TB these are embarrassingly
parallel scan-side ops with zero shuffle; the only shuffles in this file
are the two aggregating queries (dedup, offset-lag).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..operators import injector as ops
from ..operators.scale import fill_cluster, no_pushdown
from .registry import register


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "events")


@register(
    "q_scan_events",
    "SELECT event_id, ts, user_id, event_type, value, props FROM events",
    doc="Full source scan (op 1 batch analog).",
)
def q_scan_events(spark, sf_dir):
    return _events(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value", "props")


@register(
    "q_null_filter",
    "SELECT event_id, props FROM events WHERE props IS NOT NULL",
    doc="Nil-payload drop (op 7, ErrNilMessage).",
)
def q_null_filter(spark, sf_dir):
    return ops.filter_null_payload(_events(spark, sf_dir), "props").select(
        "event_id", "props")


@register(
    "q_json_decode",
    """
    SELECT event_id,
           json_extract_string(props, '$.k') AS k,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int
    FROM events
    """,
    doc="JSON payload decode (op 6).",
)
def q_json_decode(spark, sf_dir):
    df = ops.decode_json(_events(spark, sf_dir), "k INT", payload_col="props")
    return df.select(
        "event_id",
        F.col("decoded.k").cast("string").alias("k"),
        F.col("decoded.k").alias("k_int"),
    )


@register(
    "q_corrupt_drop",
    """
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
    FROM events
    WHERE props IS NOT NULL AND try_cast(props AS JSON) IS NOT NULL
    """,
    doc="Malformed-record side-drop (op 8): PERMISSIVE decode + corrupt "
        "column filter; batch continues.",
)
def q_corrupt_drop(spark, sf_dir):
    # from_json runs TWICE per row (corrupt filter + projection — the
    # pinned double-parse, see the r15 q_corrupt_drop note) over a
    # single-row-group scan, i.e. serially at bench scale. Rebalance
    # the two needed columns first (no-op at real scale — fill_cluster
    # guard), AND pin the corrupt filter above the exchange: split and
    # pushed, its from_json copy re-serializes onto the one-task scan
    # (r16 review finding — the same Filter-under-Exchange shape as
    # q_bm25's any_tf pin). The filter spells ops.drop_corrupt's
    # condition through no_pushdown; semantics identical (rows
    # verified equal by full collect). Measured 0.54 → 0.40 (rebalance
    # alone) → 0.21-0.31 s (plus the pin) at sf0.1.
    events = fill_cluster(_events(spark, sf_dir).select("event_id", "props"))
    df = ops.filter_null_payload(events, "props")
    df = ops.decode_json(df, "k INT", payload_col="props")
    df = df.filter(no_pushdown(
        F.col("decoded._corrupt_record").isNull().cast("int")) == 1)
    return df.select("event_id", F.col("decoded.k").alias("k"))


@register(
    "q_timestamp_millis",
    "SELECT event_id, epoch_ms(ts) AS ts_ms FROM events",
    doc="`@timestamp` = epoch millis injection (op 9).",
)
def q_timestamp_millis(spark, sf_dir):
    df = ops.inject_timestamp(_events(spark, sf_dir), ts_col="ts", out_col="ts_ms")
    return df.select("event_id", "ts_ms")


@register(
    "q_key_embed",
    """
    SELECT event_id, CAST(user_id AS VARCHAR) AS key,
           json_extract_string(props, '$.k') AS k
    FROM events
    """,
    doc="Key embedding into payload (op 10, include-key on).",
)
def q_key_embed(spark, sf_dir):
    df = ops.embed_key(_events(spark, sf_dir), key_col="user_id", out_col="key")
    return df.select(
        "event_id", "key", F.get_json_object("props", "$.k").alias("k"))


@register(
    "q_blacklist_project",
    "SELECT event_id, ts, user_id, event_type, value FROM events",
    doc="Column blacklist / anti-projection (op 11): drop `props`.",
)
def q_blacklist_project(spark, sf_dir):
    return ops.blacklist(_events(spark, sf_dir), ["props", "not_a_column"])


@register(
    "q_field_cast",
    "SELECT event_id, CAST(user_id AS VARCHAR) AS user_id_str FROM events",
    doc="Field extraction + string cast (op 12), widened past string/int32.",
)
def q_field_cast(spark, sf_dir):
    df = _events(spark, sf_dir)
    return df.select("event_id", ops.field_as_string(df, "user_id", "user_id_str"))


@register(
    "q_doc_id",
    "SELECT event_id, CONCAT(user_id, ':', event_id) AS doc_id FROM events",
    doc="Default doc id `{partition}:{offset}` (op 13) — the idempotence key.",
)
def q_doc_id(spark, sf_dir):
    return _events(spark, sf_dir).select(
        "event_id",
        ops.doc_id_default("user_id", "event_id").alias("doc_id"),
    )


@register(
    "q_doc_id_column",
    "SELECT event_id, CAST(event_id AS VARCHAR) AS doc_id FROM events",
    doc="Doc id from payload column (op 14).",
)
def q_doc_id_column(spark, sf_dir):
    df = _events(spark, sf_dir)
    return df.select("event_id", ops.doc_id_from_column(df, "event_id"))


@register(
    "q_index_day",
    """
    SELECT event_id,
           'pfx-' || 'events' || '-' || strftime(ts, '%Y-%m-%d') AS index_name,
           '_doc' AS doc_type
    FROM events
    """,
    doc="Day-bucketed index routing (ops 15+17).",
)
def q_index_day(spark, sf_dir):
    return _events(spark, sf_dir).select(
        "event_id",
        ops.index_time_bucketed(F.lit("events"), "ts", prefix="pfx-")
        .alias("index_name"),
        F.lit(ops.DOC_TYPE).alias("doc_type"),
    )


@register(
    "q_index_hour",
    """
    SELECT event_id,
           'pfx-' || 'events' || '-' || strftime(ts, '%Y-%m-%d-%H') AS index_name
    FROM events
    """,
    doc="Hour-bucketed index routing (op 15, ES_TIME_SUFFIX=hour).",
)
def q_index_hour(spark, sf_dir):
    return _events(spark, sf_dir).select(
        "event_id",
        ops.index_time_bucketed(F.lit("events"), "ts", prefix="pfx-", hourly=True)
        .alias("index_name"),
    )


@register(
    "q_index_column",
    "SELECT event_id, 'pfx-' || event_type AS index_name FROM events",
    doc="Column-value index routing (op 16, ES_INDEX_COLUMN).",
)
def q_index_column(spark, sf_dir):
    df = _events(spark, sf_dir)
    return df.select(
        "event_id", ops.index_from_column(df, "event_type", "pfx-").alias("index_name"))


@register(
    "q_dedup_docid",
    """
    SELECT user_id, event_id, event_type FROM (
      SELECT user_id, event_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
      FROM events) t
    WHERE rn = 1
    """,
    doc="Create-only conflict dedup (op 20): first writer per doc id wins.",
)
def q_dedup_docid(spark, sf_dir):
    return ops.dedup_by_doc_id(
        _events(spark, sf_dir).select("user_id", "event_id", "event_type"),
        id_cols=["user_id"], order_col="event_id",
    )


@register(
    "q_offset_lag",
    """
    SELECT event_type, MAX(event_id) AS max_offset, COUNT(*) AS n_events
    FROM events GROUP BY event_type
    """,
    doc="Consumer-lag aggregation analog (op 24): max offset per partition.",
)
def q_offset_lag(spark, sf_dir):
    return (
        _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.max("event_id").alias("max_offset"),
             F.count(F.lit(1)).alias("n_events"))
    )
