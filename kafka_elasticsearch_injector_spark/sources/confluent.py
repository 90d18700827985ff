"""Confluent wire-format Avro decode as a Spark operator.

Wire format (public Confluent convention; reference
src/kafka/encode_decode.go:115-147): byte 0 = magic (written as 0 by
producers, reference src/kafka/fixtures/producer.go:96-118, and NOT
validated on read — parity preserved), bytes 1-4 = big-endian int32
schema id, bytes 5.. = Avro binary body.

Decode strategy (SURVEY.md §4.2 custom work #1):
- the READER schema is resolved at plan time (one registry fetch → a
  constant of the query, the Catalyst analog of the reference's
  sync.Map schema cache) and compiled to the output StructType;
- the hot path is Arrow-batched `mapInPandas`: per executor, a codec
  cache keyed by writer schema id (exactly encode_decode.go:123-134)
  decodes each record and conforms it to the reader struct by field
  name — so multi-schema-id topics work without replanning;
- decode failures do NOT fail the batch: the record's `decoded` is
  null and the error lands in `_decode_error` (malformed side-drop,
  consumer.go:154-159 — filter on `_decode_error IS NULL`).

When the spark-avro artifact IS loaded, prefer the JVM path in
operators/injector.py (substring + from_avro) for single-schema topics;
this module is the dependency-free path and the only one that does
per-record schema-id dispatch.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .avro_codec import AvroError, Codec, logical_type, parse_schema
from .schema_registry import SchemaRegistryClient

WIRE_HEADER_LEN = 5
MAGIC_BYTE = 0


def wire_encode(schema_id: int, body: bytes) -> bytes:
    """Frame an Avro body: magic 0 + big-endian schema id (parity with
    the reference's test producer, fixtures/producer.go:96-118)."""
    return bytes([MAGIC_BYTE]) + struct.pack(">i", schema_id) + body


def wire_decode(message: bytes) -> tuple[int, bytes]:
    """Split a framed message into (schema_id, body). The magic byte is
    deliberately not validated (encode_decode.go:144-147 reads only
    bytes 1-4)."""
    if len(message) < WIRE_HEADER_LEN:
        raise AvroError(f"message shorter than wire header: {len(message)}B")
    return struct.unpack(">i", message[1:5])[0], message[5:]


def avro_to_spark_type(schema) -> T.DataType:
    """Map an Avro schema to the Spark type the decode emits.

    Unions are supported in the reference's shape only: [null, X] (or
    [X, null]) → nullable X; other unions are rejected at plan time —
    the same narrowing goavro's map coercion imposes
    (encode_decode.go:52-62)."""
    schema = parse_schema(schema)
    if isinstance(schema, list):
        branches = [b for b in schema if parse_schema(b) != "null"]
        if len(branches) != 1:
            raise AvroError(f"only [null, X] unions supported, got {schema}")
        return avro_to_spark_type(branches[0])
    if isinstance(schema, str):
        return {
            "null": T.NullType(), "boolean": T.BooleanType(),
            "int": T.IntegerType(), "long": T.LongType(),
            "float": T.FloatType(), "double": T.DoubleType(),
            "bytes": T.BinaryType(), "string": T.StringType(),
        }[schema]
    # Logical types (Avro 1.11 spec): the codec surfaces logical Python
    # values (avro_codec._logical_reader), so the Spark type must be the
    # logical one — a decimal field silently arriving as BinaryType was
    # exactly the goavro-parity gap this closes (encode_decode.go:52-62).
    logical = logical_type(schema)
    if logical is not None:
        name, attrs = logical
        if name == "decimal":
            if attrs["precision"] > 38:
                raise AvroError(
                    f"decimal precision {attrs['precision']} exceeds "
                    "Spark's DecimalType max of 38")
            return T.DecimalType(attrs["precision"], attrs["scale"])
        return {
            "date": T.DateType(), "uuid": T.StringType(),
            "time-millis": T.TimeType(),
            "time-micros": T.TimeType(),
            "timestamp-millis": T.TimestampType(),
            "timestamp-micros": T.TimestampType(),
            "local-timestamp-millis": T.TimestampNTZType(),
            "local-timestamp-micros": T.TimestampNTZType(),
        }[name]
    t = schema["type"]
    if t == "record":
        return T.StructType([
            T.StructField(f["name"], avro_to_spark_type(f["type"]), True)
            for f in schema["fields"]])
    if t == "enum":
        return T.StringType()
    if t == "fixed":
        return T.BinaryType()
    if t == "array":
        return T.ArrayType(avro_to_spark_type(schema["items"]), True)
    if t == "map":
        return T.MapType(T.StringType(), avro_to_spark_type(schema["values"]), True)
    if t in ("int", "long", "float", "double", "boolean",
             "null", "bytes", "string"):
        return avro_to_spark_type(t)
    raise AvroError(f"unsupported Avro type {t!r}")


def _conform(value: Any, dtype: T.DataType) -> Any:
    """Project a decoded value onto the reader type by field name —
    missing fields → null, extra fields dropped (name-based resolution;
    full Avro aliases/defaults are out of scope and documented so).

    Atomic values are TYPE-CHECKED against the reader column: decode
    surfaces values per the WRITER schema (incl. its logical types), so
    a writer/reader logical-type divergence (say the producer adds
    ``timestamp-millis`` to a long the pinned reader still declares
    plain) would otherwise sail through here and crash the pandas→Arrow
    conversion OUTSIDE decode_one's try/except — failing the whole
    micro-batch instead of side-dropping the record
    (consumer.go:154-159 parity). The AvroError raised here is caught
    per record."""
    import datetime as dt
    from decimal import Decimal

    if value is None:
        return None
    if isinstance(dtype, T.StructType):
        if not isinstance(value, dict):
            return None
        return {f.name: _conform(value.get(f.name), f.dataType)
                for f in dtype.fields}
    if isinstance(dtype, T.ArrayType):
        return [_conform(v, dtype.elementType) for v in value]
    if isinstance(dtype, T.MapType):
        return {k: _conform(v, dtype.valueType) for k, v in value.items()}
    ok = True
    if isinstance(dtype, (T.LongType, T.IntegerType, T.ShortType,
                          T.ByteType)):
        ok = isinstance(value, int) and not isinstance(value, bool)
    elif isinstance(dtype, (T.DoubleType, T.FloatType)):
        ok = isinstance(value, (int, float)) and not isinstance(value, bool)
    elif isinstance(dtype, T.BooleanType):
        ok = isinstance(value, bool)
    elif isinstance(dtype, T.StringType):
        ok = isinstance(value, str)
    elif isinstance(dtype, T.BinaryType):
        ok = isinstance(value, (bytes, bytearray))
    elif isinstance(dtype, T.DecimalType):
        ok = isinstance(value, Decimal)
        if ok:
            # Type alone is not enough: a writer/reader scale or
            # precision divergence (producer bumps decimal(10,2) to
            # decimal(10,4)) passes an isinstance gate and then crashes
            # the pandas→Arrow conversion with a rescaling error —
            # failing the whole micro-batch instead of side-dropping
            # the one record. Quantize to the reader's scale with
            # Inexact trapped: a LOSSLESS rescale (writer scale
            # differs but the extra digits are zeros) passes — Arrow
            # accepts that too — while lossy rescale or precision
            # overflow (InvalidOperation under prec=reader precision)
            # raises and side-drops the record.
            import decimal as _dec

            ctx = _dec.Context(
                prec=dtype.precision,
                traps=[_dec.Inexact, _dec.InvalidOperation])
            if not value.is_finite():  # quiet NaN quantizes to NaN
                ok = False
            else:
                try:
                    return ctx.quantize(
                        value, Decimal(1).scaleb(-dtype.scale))
                except _dec.DecimalException:
                    ok = False
    elif isinstance(dtype, T.DateType):
        ok = isinstance(value, dt.date) and not isinstance(value, dt.datetime)
    elif isinstance(dtype, T.TimeType):
        ok = isinstance(value, dt.time) and not isinstance(value, dt.datetime)
    elif isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        ok = isinstance(value, dt.datetime)
    if not ok:
        raise AvroError(
            f"writer value of type {type(value).__name__} does not fit "
            f"reader column type {dtype.simpleString()} (logical-type "
            "divergence between writer and reader schemas?)")
    return value


def decode_confluent(
    df: DataFrame,
    registry: SchemaRegistryClient,
    reader_schema_id: int,
    payload_col: str = "value",
    decoded_col: str = "decoded",
    error_col: str = "_decode_error",
) -> DataFrame:
    """Decode a Confluent-framed Avro binary column into a typed struct.

    Output = input columns + `decoded` struct (reader schema shape) +
    `_decode_error` string (null on success). Works on batch and
    streaming DataFrames alike — mapInPandas is a narrow, shuffle-free
    map, so source parallelism is preserved end to end.
    """
    reader_json = registry.get_schema(reader_schema_id)
    reader_type = avro_to_spark_type(reader_json)
    if not isinstance(reader_type, T.StructType):
        # Non-record top level is an error in the reference too
        # (encode_decode.go:52-62).
        raise AvroError("reader schema must be a record")

    out_schema = T.StructType(
        [f for f in df.schema.fields] + [
            T.StructField(decoded_col, reader_type, True),
            T.StructField(error_col, T.StringType(), True),
        ])
    in_cols = [f.name for f in df.schema.fields]

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        codecs: dict[int, Codec] = {}  # per-worker, keyed by writer id

        def decode_one(raw) -> tuple[Any, str | None]:
            if raw is None:
                return None, "nil message"  # ErrNilMessage path
            try:
                schema_id, body = wire_decode(bytes(raw))
                codec = codecs.get(schema_id)
                if codec is None:
                    codec = Codec(registry.get_schema(schema_id))
                    codecs[schema_id] = codec
                value = codec.decode(body)
                if not isinstance(value, dict):
                    return None, "non-record payload"
                return _conform(value, reader_type), None
            except Exception as ex:  # noqa: BLE001 — side-drop, not fail
                return None, f"{type(ex).__name__}: {ex}"

        for pdf in batches:
            # zip(*[]) unpacks to 0 values, not 2 — guard zero-row
            # Arrow batches so they pass through instead of failing the
            # task.
            results = [decode_one(r) for r in pdf[payload_col]]
            decoded = [d for d, _ in results]
            errors = [e for _, e in results]
            out = pdf[in_cols].copy()
            out[decoded_col] = decoded
            out[error_col] = errors
            yield out

    return df.mapInPandas(decode_batches, out_schema)


def drop_decode_errors(df: DataFrame,
                       error_col: str = "_decode_error") -> DataFrame:
    """Malformed-record side-drop (consumer.go:154-159): keep only rows
    that decoded cleanly."""
    from pyspark.sql import functions as F

    return df.filter(F.col(error_col).isNull()).drop(error_col)


def encode_confluent(
    df: DataFrame,
    registry: SchemaRegistryClient,
    schema_id: int,
    struct_col: str,
    out_col: str = "value",
) -> DataFrame:
    """Encode a struct column into Confluent-framed Avro binary — the
    producer side (reference op 26: fixtures/producer.go:75-146,
    util/producer/producer.go:15-53, which frame goavro-encoded bodies
    with the same magic+id header).

    The schema is resolved and the header PRECOMPUTED at plan time (the
    producer caches its header bytes per schema, producer.go:97-117);
    executors encode batch-at-a-time in mapInPandas. Round-trips through
    decode_confluent by construction. Use with `write.format("kafka")`
    (key/value binary columns) to produce back to a topic.
    """
    schema_json = registry.get_schema(schema_id)
    writer_type = avro_to_spark_type(schema_json)
    if not isinstance(writer_type, T.StructType):
        raise AvroError("writer schema must be a record")
    header = bytes([MAGIC_BYTE]) + struct.pack(">i", schema_id)
    field_names = [f.name for f in writer_type.fields]

    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != struct_col]
        + [T.StructField(out_col, T.BinaryType(), True)])
    keep = [f.name for f in df.schema.fields if f.name != struct_col]

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        codec = Codec(schema_json)  # compiled once per worker

        def encode_one(row) -> bytes | None:
            if row is None:
                return None
            value = {k: row.get(k) for k in field_names} \
                if isinstance(row, dict) else dict(zip(field_names, row))
            return header + codec.encode(value)

        for pdf in batches:
            out = pdf[keep].copy()
            out[out_col] = [encode_one(r) for r in pdf[struct_col]]
            yield out

    return df.mapInPandas(encode_batches, out_schema)
