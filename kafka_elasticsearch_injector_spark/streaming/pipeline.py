"""The injector pipeline: Kafka source → decode/enrich/route → ES sink.

This is the Spark-first re-expression of the reference's whole hot path
(SURVEY.md §3.2): what the reference does with goroutines + channels
(consumer.go:100-178) is here ONE declarative plan — the source's
partition-parallelism replaces the worker pool, micro-batch triggers
replace count-based batching, and checkpointing replaces manual offset
marking (consumer.go:163-173 ⇒ at-least-once; the sink's create-only
writes make it effectively-once end to end).

100 TB/day design: a Kafka topic with P partitions yields P parallel
source tasks (minPartitions can oversplit hot partitions); the op chain
is narrow (zero shuffle), so throughput scales linearly with executors
until the ES cluster saturates — exactly the reference's model, minus
its single-pod ceiling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import InjectorConfig
from ..operators import injector as ops


def read_kafka_stream(spark: SparkSession, cfg: InjectorConfig) -> DataFrame:
    """Kafka source (reference consumer.go:73-135). Emits the standard
    (key, value, topic, partition, offset, timestamp) columns.

    Rate control: maxOffsetsPerTrigger caps a micro-batch the way the
    bounded exchange buffer caps in-flight records (consumer.go:68,
    100-113); backpressure is built in. KAFKA_CONSUMER_BUFFER_SIZE maps
    directly when set; the default scales the reference's
    batch×concurrency formula (injector.go:31-34) by 100 because a
    Spark micro-batch amortizes scheduling over far more rows than a
    goroutine flush.
    """
    buffer = (cfg.buffer_size if cfg.buffer_size
              else cfg.batch_size * max(cfg.concurrency, 1) * 100)
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", cfg.kafka_address)
        .option("subscribe", ",".join(cfg.topics))
        .option("kafka.group.id", cfg.consumer_group)
        # Fresh-checkpoint start position (config.starting_offsets);
        # an existing checkpoint owns the offsets and ignores this.
        .option("startingOffsets", cfg.starting_offsets)
        .option("maxOffsetsPerTrigger", buffer)
        .option("minPartitions", max(cfg.concurrency, 1))
        .load()
    )


#: Columns preserved for quarantined records (the raw Kafka envelope).
SOURCE_COLS = ("key", "value", "topic", "partition", "offset", "timestamp")


def _required(col: Column, what: str) -> Column:
    """A NULL routing value fails the batch explicitly — the reference's
    GetValueForField errors on missing/unparseable values
    (record.go:30-42) and the codec propagates it (codec.go:62-68,
    82-88); silently shipping ``"_index": null`` or a "None" doc id is
    worse than failing loudly."""
    return F.coalesce(col, F.raise_error(F.lit(
        f"missing or null {what} routing value (reference "
        "record.go:30-42 fails the record)")))


def _routing(cfg: InjectorConfig, field_str) -> tuple[Column, Column]:
    """Index-name + doc-id expressions (ops 12-17), shared by the typed
    and schemaless paths; ``field_str(name)`` resolves a payload field
    as a string column (struct access typed, variant lookup
    schemaless)."""
    index_base = F.coalesce(
        F.lit(cfg.es_index) if cfg.es_index else F.lit(None).cast("string"),
        F.col("topic"))
    if cfg.es_index_column:
        suffix = _required(field_str(cfg.es_index_column),
                           f"es_index_column={cfg.es_index_column}")
    else:
        fmt = "yyyy-MM-dd-HH" if cfg.es_time_suffix == "hour" else "yyyy-MM-dd"
        suffix = F.date_format(F.col("timestamp"), fmt)
    index_name = F.concat(F.lit(cfg.es_index_prefix), index_base,
                          F.lit("-"), suffix)
    if cfg.es_doc_id_column:
        doc_id = _required(field_str(cfg.es_doc_id_column),
                           f"es_doc_id_column={cfg.es_doc_id_column}")
    else:
        doc_id = ops.doc_id_default("partition", "offset")
    return index_name, doc_id


def _parse_json_key(df: DataFrame, reason: Column
                    ) -> tuple[DataFrame, Column]:
    """Shared json-key validation: parse ONCE into ``_key_var``
    (variant) — both the validity check and the payload embed read it.
    A non-null key must be a JSON OBJECT (Go unmarshals it into a map,
    encode_decode.go:98-104); anything else drops the record as
    bad_key."""
    df = df.withColumn(
        "_key_var", F.try_parse_json(F.col("key").cast("string")))
    key_str = F.col("key").cast("string")
    bad_key = key_str.isNotNull() & (
        F.col("_key_var").isNull()
        | ~F.ltrim(key_str).startswith("{"))
    return df, reason.when(bad_key, F.lit("bad_key"))


def _contains_time(dtype: T.DataType) -> bool:
    if isinstance(dtype, T.TimeType):
        return True
    if isinstance(dtype, T.StructType):
        return any(_contains_time(f.dataType) for f in dtype.fields)
    if isinstance(dtype, T.ArrayType):
        return _contains_time(dtype.elementType)
    if isinstance(dtype, T.MapType):
        return (_contains_time(dtype.keyType)
                or _contains_time(dtype.valueType))
    return False


def _json_safe(col: Column, dtype: T.DataType) -> Column:
    """Make a payload column `to_json`-serializable: Spark 4.1's
    JacksonGenerator has no TIME writer, so a TimeType field (the Avro
    ``time-millis``/``time-micros`` surface, sources/avro_codec.py)
    would crash the whole batch at serialize time. Cast TIME — at any
    nesting depth — to its ISO HH:MM:SS[.ffffff] string; ES has no
    time-of-day type either, so the string IS the faithful JSON form.
    Payloads without TIME fields return the column untouched (identical
    plan to before this guard existed)."""
    if isinstance(dtype, T.TimeType):
        return col.cast("string")
    if not _contains_time(dtype):
        return col
    if isinstance(dtype, T.StructType):
        rebuilt = F.struct(*[
            _json_safe(col[f.name], f.dataType).alias(f.name)
            for f in dtype.fields])
        return F.when(col.isNotNull(), rebuilt)  # keep null structs null
    if isinstance(dtype, T.ArrayType):
        return F.transform(
            col, lambda x: _json_safe(x, dtype.elementType))
    if isinstance(dtype, T.MapType):
        out = col
        if _contains_time(dtype.keyType):
            # a TIME map key would serialize as raw internal nanos;
            # JSON object keys are strings anyway, so ISO-cast it
            out = F.transform_keys(
                out, lambda k, v: _json_safe(k, dtype.keyType))
        if _contains_time(dtype.valueType):
            out = F.transform_values(
                out, lambda k, v: _json_safe(v, dtype.valueType))
        return out
    return col


def _assemble(df: DataFrame, reason: Column, index_name: Column,
              doc_id: Column, payload_json: Column,
              return_drops: bool) -> DataFrame:
    """Shared output contract: (index_name, doc_id, doc_type, payload)
    — routing/payload expressions when()-guarded so raise_error never
    fires on dropped rows; return_drops adds _drop_reason + the raw
    envelope."""
    clean = reason.isNull()
    out_cols = [
        F.when(clean, index_name).alias("index_name"),
        F.when(clean, doc_id).alias("doc_id"),
        F.lit(ops.DOC_TYPE).alias("doc_type"),
        F.when(clean, payload_json).alias("payload"),
    ]
    if return_drops:
        return df.select(
            *out_cols, reason.alias("_drop_reason"),
            *[F.col(c) for c in SOURCE_COLS])
    return df.filter(clean).select(*out_cols)


def build_elastic_records(df: DataFrame, cfg: InjectorConfig,
                          payload_schema: T.StructType | str | None = None,
                          registry=None, reader_schema_id: int | None = None,
                          key_reader_schema_id: int | None = None,
                          return_drops: bool = False,
                          ) -> DataFrame:
    """Compile the config into the decode→enrich→filter→route projection.

    Input: Kafka-shaped DataFrame (key/value binary, topic, partition,
    offset, timestamp). Output: (index_name, doc_id, doc_type, payload) —
    the models.ElasticRecord analog (reference
    src/models/elastic_record.go:3-8) with payload as a JSON string ready
    for the bulk body.

    With `return_drops=True` the undeliverable rows are NOT filtered:
    the output additionally carries `_drop_reason` (null for clean rows)
    plus the raw source columns, so a sink can quarantine drops to a
    dead-letter store in the same pass (the reference only logs-and-
    skips, consumer.go:154-159 — at pipeline scale the drops must be
    auditable). Routing/payload expressions are when()-guarded so they
    never evaluate (and raise_error never fires) on dropped rows.

    Entirely Column expressions — the whole per-record path is one
    whole-stage-codegen stage, the Catalyst analog of the reference's
    per-batch encode loop (codec.go:26-48).
    """
    if isinstance(payload_schema, str):
        payload_schema = T.StructType.fromDDL(payload_schema)

    # Schemaless mode: json records with NO declared payload schema —
    # the reference's default deployment (JsonMessageToRecord decodes
    # into map[string]interface{}, encode_decode.go:87-113, no schema
    # anywhere in its config surface). Decoded as map<string,variant>;
    # the enrich/blacklist/route stages below run on map ops instead of
    # struct fields, with identical semantics.
    if cfg.record_type == "json" and payload_schema is None:
        return _build_elastic_records_schemaless(df, cfg, return_drops)

    # Decode (ops 5-8): nil payload, PERMISSIVE decode, corrupt marking.
    # Instead of filtering stage by stage, each stage contributes to one
    # _drop_reason when-chain; clean rows have reason NULL.
    if cfg.record_type == "json":
        df = ops.decode_json(df, payload_schema, payload_col="value")
        reason = (
            F.when(F.col("value").isNull(), F.lit("null_payload"))
            .when(F.col("decoded._corrupt_record").isNotNull(),
                  F.lit("corrupt_payload"))
        )
    else:
        # Confluent wire-format Avro: registry-resolved reader schema,
        # per-id codec dispatch, malformed side-drop (sources/confluent.py).
        if registry is None or reader_schema_id is None:
            raise ValueError(
                "avro record_type needs registry + reader_schema_id")
        from ..sources import avro_to_spark_type, decode_confluent

        df = decode_confluent(df, registry, reader_schema_id)
        reason = (
            F.when(F.col("value").isNull(), F.lit("null_payload"))
            .when(F.col("_decode_error").isNotNull(),
                  F.concat(F.lit("decode_error: "), F.col("_decode_error")))
        )
        payload_schema = avro_to_spark_type(
            registry.get_schema(reader_schema_id))

    payload_fields = [f.name for f in payload_schema.fields]

    # Enrich + blacklist (ops 9-11): payload = decoded fields minus
    # blacklist, plus @timestamp (epoch millis) and optionally the key.
    # "@timestamp" is excluded from the passthrough unconditionally, and
    # "key" whenever include_key claims the name: the reference's map
    # ASSIGNMENT overwrites those fields (encode_decode.go:96-104) —
    # keeping them in the struct would emit duplicate JSON keys, which
    # ES rejects with 400.
    dropped = set(cfg.blacklisted_columns) | {"@timestamp"}
    if cfg.include_key:
        dropped.add("key")
    kept = [f for f in payload_fields if f not in dropped]
    field_types = {f.name: f.dataType for f in payload_schema.fields}
    payload_cols: list[Column] = [
        _json_safe(F.col(f"decoded.{f}"), field_types[f]).alias(f)
        for f in kept]
    payload_cols.append(F.unix_millis(F.col("timestamp")).alias("@timestamp"))
    if cfg.include_key:
        # The reference DECODES the key before embedding it, it never
        # ships raw bytes: Avro keys via nativeFromBinary
        # (encode_decode.go:66-72), JSON keys via json.Unmarshal into a
        # map (encode_decode.go:98-104); an undecodable non-null key
        # fails the record. A nil key is fine — the field is omitted.
        if cfg.record_type == "json":
            df, reason = _parse_json_key(df, reason)
            key_field = F.col("_key_var")
            if "key" in payload_fields:
                # Go assigns Json["key"] only for a NON-NIL Kafka key:
                # nil-key records keep the payload's own "key" field.
                # Both sides ride the VARIANT lane so the struct field
                # has one type regardless of the declared payload type.
                key_field = (
                    F.when(F.col("key").isNotNull(), key_field)
                    .otherwise(F.col("decoded.key").cast("variant")))
            payload_cols.append(key_field.alias("key"))
        else:
            if key_reader_schema_id is None:
                raise ValueError(
                    "avro record_type with include_key needs "
                    "key_reader_schema_id (the reference resolves key "
                    "codecs from the registry, encode_decode.go:66-72)")
            from ..sources import decode_confluent as _dc

            df = _dc(df, registry, key_reader_schema_id,
                     payload_col="key", decoded_col="decoded_key",
                     error_col="_key_decode_error")
            reason = reason.when(
                F.col("key").isNotNull()
                & F.col("_key_decode_error").isNotNull(),
                F.concat(F.lit("bad_key: "), F.col("_key_decode_error")))
            # Avro + a payload field literally named "key": the embedded
            # key OWNS the name (to_json omits it on nil-key records).
            # Documented divergence: the reference would keep the
            # payload's field for nil-key records, but mixing the two
            # requires one struct type and the payload field's type is
            # arbitrary — a duplicate JSON key would be strictly worse.
            # The key struct needs the same TIME→string JSON guard as
            # the payload fields (a time-millis field in the KEY schema
            # would otherwise crash to_json for the whole batch).
            key_type = avro_to_spark_type(
                registry.get_schema(key_reader_schema_id))
            payload_cols.append(
                _json_safe(F.col("decoded_key"), key_type).alias("key"))

    # Routing (ops 12-17). Missing routing columns fail HERE, at plan
    # time (the reference failed per-batch at runtime, record.go:30-42).
    for routing_col in (cfg.es_index_column, cfg.es_doc_id_column):
        if routing_col and routing_col not in payload_fields:
            raise ValueError(
                f"routing column {routing_col!r} not in payload schema "
                f"{payload_fields}")

    index_name, doc_id = _routing(
        cfg, lambda name: F.col(f"decoded.{name}").cast("string"))
    return _assemble(df, reason, index_name, doc_id,
                     F.to_json(F.struct(*payload_cols)), return_drops)


def _build_elastic_records_schemaless(df: DataFrame, cfg: InjectorConfig,
                                      return_drops: bool = False) -> DataFrame:
    """Schemaless json variant of build_elastic_records (same output
    contract): decode to map<string,variant>, inject @timestamp/key,
    drop blacklisted fields, route, serialize.

    Reference parity (encode_decode.go:87-113 + codec.go):

    - any top-level JSON OBJECT is accepted; arrays/scalars/garbage are
      corrupt (Go unmarshal-into-map fails on them);
    - ``@timestamp`` is an unconditional map ASSIGNMENT (overwrites a
      payload field of that name) — here: filter-then-concat, because
      Spark's map_concat rejects duplicate keys under the default
      EXCEPTION dedup policy;
    - with include_key, ``key`` is assigned ONLY when the Kafka key is
      non-nil (encode_decode.go:98-104) — a payload field named "key"
      survives a nil-key record, so its removal is per-row conditional;
    - routing columns are looked up AT RUNTIME (no schema to check at
      plan time); a missing-or-null routing value fails the batch, the
      analog of record.go:30-42 erroring per record. try_element_at
      (not element_at) because ANSI mode raises on absent map keys and
      we want the curated raise_error message, not MAP_KEY_DOES_NOT_EXIST.

    All map/variant expressions are JVM-side Catalyst ops — the
    schemaless path costs one from_json per record, same as the typed
    path, and stays in whole-stage codegen.
    """
    df = ops.decode_json_schemaless(df, payload_col="value",
                                    decoded_col="_decoded_map")
    reason = (
        F.when(F.col("value").isNull(), F.lit("null_payload"))
        .when(F.col("_decoded_map").isNull(), F.lit("corrupt_payload"))
    )

    # Blacklist + reserved-field removal. "@timestamp" is always
    # re-injected; "key" is removed only when our key will overwrite it
    # (include_key and a non-nil Kafka key) — hence the row-dependent
    # lambda condition.
    drop_keys = [*cfg.blacklisted_columns, "@timestamp"]
    if cfg.include_key:
        def _keep(k, v):
            return ~k.isin(*drop_keys) & ~(
                (k == "key") & F.col("key").isNotNull())
    else:
        def _keep(k, v):
            return ~k.isin(*drop_keys)
    payload_map = F.map_concat(
        F.map_filter(F.col("_decoded_map"), _keep),
        F.create_map(
            F.lit("@timestamp"),
            F.parse_json(F.unix_millis(F.col("timestamp")).cast("string"))),
    )
    if cfg.include_key:
        df, reason = _parse_json_key(df, reason)
        payload_map = F.map_concat(
            payload_map,
            F.when(F.col("key").isNotNull(),
                   F.create_map(F.lit("key"), F.col("_key_var")))
            .otherwise(F.create_map().cast("map<string,variant>")))

    def _field_str(name: str) -> Column:
        # Runtime field lookup, string-cast like record.go:30-42's
        # GetValueForField (absent key and JSON null both → NULL).
        return F.try_variant_get(
            F.try_element_at(F.col("_decoded_map"), F.lit(name)),
            "$", "string")

    index_name, doc_id = _routing(cfg, _field_str)
    return _assemble(df, reason, index_name, doc_id,
                     F.to_json(payload_map), return_drops)


def replay_dead_letters(spark: SparkSession, cfg: InjectorConfig,
                        dead_letter_dir: str, transport_factory,
                        payload_schema: T.StructType | str | None = None,
                        registry=None, reader_schema_id: int | None = None,
                        key_reader_schema_id: int | None = None,
                        still_bad_dir: str | None = None) -> dict:
    """Re-ingest quarantined records through the (presumably fixed)
    decode→route pipeline — the REPLAY half of the dead-letter story
    (the quarantine keeps the raw Kafka envelope exactly so this is
    possible; the reference can only log-and-skip, consumer.go:154-159).

    Typical flow: records drop because the declared PAYLOAD_SCHEMA_DDL
    was wrong / a topic changed shape → fix the schema (or switch to
    schemaless with ``payload_schema=None``) → replay. Create-only
    writes make replay IDEMPOTENT: anything that already landed
    triages as 409/already_exists, never a duplicate document.

    Rows that STILL fail decode stay quarantined: written (envelope +
    fresh reason) to `still_bad_dir` when given. Returns a summary
    dict: rows, clean, still_dropped, plus the sink triage counters.
    Batch job (no checkpoint involved) — executor-side bulk writes
    through the same Arrow sink as the live pipeline.
    """
    from .es_sink import STATS_SCHEMA, write_arrow_factory

    src = spark.read.parquet(dead_letter_dir).select(*SOURCE_COLS)
    records = build_elastic_records(
        src, cfg, payload_schema,
        registry=registry, reader_schema_id=reader_schema_id,
        key_reader_schema_id=key_reader_schema_id,
        return_drops=True).persist()
    try:
        still_bad = records.filter(F.col("_drop_reason").isNotNull())
        n_bad = still_bad.count()
        if still_bad_dir is not None and n_bad:
            (still_bad.select(*SOURCE_COLS, "_drop_reason")
             .write.mode("append").parquet(still_bad_dir))
        writer = write_arrow_factory(cfg, transport_factory)
        stats_rows = (records.filter(F.col("_drop_reason").isNull())
                      .select("index_name", "doc_id", "payload")
                      .mapInArrow(writer, STATS_SCHEMA).collect())
        totals = {k: sum(getattr(r, k) for r in stats_rows)
                  for k in ("created", "already_exists",
                            "bad_request", "retried")}
        clean = sum(r.created + r.already_exists + r.bad_request
                    for r in stats_rows)
        return {"rows": n_bad + clean, "clean": clean,
                "still_dropped": n_bad, **totals}
    finally:
        records.unpersist()


def enrich_static(stream: DataFrame, dim: DataFrame, on: str | list,
                  how: str = "left") -> DataFrame:
    """Stream-static dimension enrichment: broadcast-join each
    micro-batch against a static table.

    The injector-pipeline analog of a lookup enrich stage the reference
    lacks entirely (its only enrichment is the injected @timestamp/key
    fields, SURVEY.md §2.1 ops 9-10). Stateless — no watermark, no
    state store: every micro-batch joins against the dimension as
    re-resolved for that batch, and the broadcast hint keeps it
    map-side (no shuffle of the stream). Default LEFT join so an
    unmatched stream row passes through with nulls instead of being
    dropped by an enrichment gap. At scale: cache() the dimension if
    it's expensive to produce; stream-static joins never trigger AQE,
    so the broadcast hint (not the threshold) is what guarantees the
    plan."""
    return stream.join(F.broadcast(dim), on, how)


def start_pipeline(spark: SparkSession, cfg: InjectorConfig,
                   payload_schema: T.StructType | str | None,
                   transport_factory, checkpoint_dir: str,
                   source_df: DataFrame | None = None,
                   trigger_seconds: float = 1.0,
                   available_now: bool = False,
                   registry=None, reader_schema_id: int | None = None,
                   key_reader_schema_id: int | None = None,
                   metrics=None, dead_letter_dir: str | None = None):
    """Wire source → transform → foreachBatch ES sink and start.

    `transport_factory` is a picklable zero-arg callable building the
    bulk transport on each EXECUTOR (HttpTransport for real ES,
    FileTransport in tests). `source_df` overrides the Kafka source for
    offline runs (memory/rate/file sources in tests).

    Checkpointing commits offsets only after the batch's sink call
    returns — the reference's mark-after-write loop (consumer.go:163-173)
    for free.
    """
    from .es_sink import STATS_SCHEMA, write_arrow_factory

    src = source_df if source_df is not None else read_kafka_stream(spark, cfg)
    records = build_elastic_records(
        src, cfg, payload_schema,
        registry=registry, reader_schema_id=reader_schema_id,
        key_reader_schema_id=key_reader_schema_id,
        return_drops=dead_letter_dir is not None)
    sink_acc = None
    if metrics is not None:
        # metrics is an InjectorMetrics: sink triage counts flow back via
        # accumulators; the progress listener feeds rows/lag/latency.
        sink_acc = metrics.sink
        if not getattr(metrics, "_listener_registered", False):
            spark.streams.addListener(metrics.listener)
            metrics._listener_registered = True
    writer = write_arrow_factory(cfg, transport_factory)

    def run_sink(df: DataFrame) -> None:
        # Executor-side bulk writes over Arrow batches (no per-row
        # pickle, no Row objects); the driver action collects ONE
        # counters row per task — never record data. Metrics fold in
        # HERE, from the collected rows: collect() deduplicates task
        # retries, where an executor-side accumulator update inside a
        # transformation would double-count (exactly-once accumulators
        # are an action-only guarantee).
        rows = (df.select("index_name", "doc_id", "payload")
                .mapInArrow(writer, STATS_SCHEMA).collect())
        if sink_acc is not None:
            from .es_sink import BulkStats

            for r in rows:
                sink_acc.add_stats(BulkStats(
                    created=r.created, already_exists=r.already_exists,
                    bad_request=r.bad_request, retried=r.retried))

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if dead_letter_dir is None:
            run_sink(batch_df)
            return
        # Dead-letter mode: one shared batch feeds both outputs. The
        # quarantine keeps the raw Kafka envelope + reason as parquet
        # (auditable, replayable); clean rows go to the bulk writer.
        batch_df.persist()
        try:
            (batch_df.filter(F.col("_drop_reason").isNotNull())
             .select(*SOURCE_COLS, "_drop_reason")
             .write.mode("append").parquet(dead_letter_dir))
            run_sink(batch_df.filter(F.col("_drop_reason").isNull()))
        finally:
            batch_df.unpersist()

    stream = (
        records.writeStream
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        # Drain-everything-then-stop: bounded runs (backfills, benchmarks)
        # still go through real micro-batch execution + checkpointing.
        stream = stream.trigger(availableNow=True)
    else:
        stream = stream.trigger(processingTime=f"{trigger_seconds} seconds")
    return stream.start()
