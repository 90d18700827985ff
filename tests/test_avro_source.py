"""Avro source layer: pure-Python codec, Confluent wire format, schema
registry cache, and the Spark decode operator.

Mirrors the reference's test pyramid for this surface:
- encode_decode_test.go:31-127 — decode round-trips, malformed payload
  side-drop, nil-value handling;
- schema_registry.go:16-27 — fetch-once caching;
- fixtures/producer.go:96-118 — wire-format framing (magic byte 0,
  big-endian schema id);
- consumer_test.go:106-147 — end-to-end: framed Avro in → typed rows out
  (here through the full streaming pipeline into the ES-fake sink).
"""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest

from kafka_elasticsearch_injector_spark.sources import (
    AvroError,
    Codec,
    avro_to_spark_type,
    decode_confluent,
    dict_registry,
    drop_decode_errors,
    wire_decode,
    wire_encode,
)

# The reference's Avro fixture schema (src/kafka/fixtures/fixtures.go:15-24).
FIXTURE_SCHEMA = json.dumps({
    "type": "record", "name": "fixture_record",
    "fields": [{"name": "id", "type": "int"}],
})

NESTED_SCHEMA = json.dumps({
    "type": "record", "name": "evt",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "flags", "type": {"type": "array", "items": "boolean"}},
        {"name": "attrs", "type": {"type": "map", "values": "string"}},
        {"name": "kind", "type": {"type": "enum", "name": "k",
                                  "symbols": ["A", "B"]}},
        {"name": "raw", "type": "bytes"},
    ],
})


def test_varint_zigzag_known_vectors():
    codec = Codec('"long"')
    # Public Avro spec examples: zigzag(0)=0, (-1)=1, (1)=2, (-2)=3 ...
    assert codec.encode(0) == b"\x00"
    assert codec.encode(-1) == b"\x01"
    assert codec.encode(1) == b"\x02"
    assert codec.encode(-64) == b"\x7f"
    assert codec.encode(64) == b"\x80\x01"
    for n in (0, 1, -1, 63, -64, 64, 2**40, -(2**40), 2**62):
        assert codec.decode(codec.encode(n)) == n


def test_record_roundtrip_nested():
    codec = Codec(NESTED_SCHEMA)
    value = {
        "id": 42, "name": "abc", "score": 2.5,
        "flags": [True, False], "attrs": {"x": "1", "y": "2"},
        "kind": "B", "raw": b"\x00\xff",
    }
    assert codec.decode(codec.encode(value)) == value
    null_name = dict(value, name=None)
    assert codec.decode(codec.encode(null_name)) == null_name


def test_decode_errors():
    codec = Codec(FIXTURE_SCHEMA)
    with pytest.raises(AvroError):
        codec.decode(b"")            # truncated varint
    with pytest.raises(AvroError):
        codec.decode(b"\x02\x02")    # trailing bytes


def test_wire_format_framing():
    framed = wire_encode(7, b"\x54")
    assert framed == b"\x00\x00\x00\x00\x07\x54"     # magic 0 + BE id
    schema_id, body = wire_decode(framed)
    assert (schema_id, body) == (7, b"\x54")
    # magic byte is NOT validated on read (encode_decode.go:144-147)
    assert wire_decode(b"\xff\x00\x00\x00\x07\x54") == (7, b"\x54")
    with pytest.raises(AvroError):
        wire_decode(b"\x00\x00")     # shorter than header


def test_registry_caches_fetches():
    calls = []

    def fetch(schema_id):
        calls.append(schema_id)
        return FIXTURE_SCHEMA

    from kafka_elasticsearch_injector_spark.sources import SchemaRegistryClient
    client = SchemaRegistryClient(fetcher=fetch)
    assert client.get_schema(1) == FIXTURE_SCHEMA
    assert client.get_schema(1) == FIXTURE_SCHEMA
    assert calls == [1]              # fetched once, cached forever


def test_avro_to_spark_type_mapping():
    t = avro_to_spark_type(NESTED_SCHEMA)
    assert t.simpleString() == (
        "struct<id:bigint,name:string,score:double,flags:array<boolean>,"
        "attrs:map<string,string>,kind:string,raw:binary>")
    with pytest.raises(AvroError):
        avro_to_spark_type('["int", "string"]')      # non-nullable union


def test_decode_confluent_spark(spark):
    registry = dict_registry({1: FIXTURE_SCHEMA, 2: NESTED_SCHEMA})
    codec1, codec2 = Codec(FIXTURE_SCHEMA), Codec(NESTED_SCHEMA)
    rows = [
        (wire_encode(1, codec1.encode({"id": 10})),),
        # different writer id on the same topic → name-based projection
        (wire_encode(2, codec2.encode({
            "id": 99, "name": "x", "score": 0.5, "flags": [],
            "attrs": {}, "kind": "A", "raw": b""})),),
        (b"\x00\x00\x00\x00\x01\xff\xff\xff",),      # malformed body
        (None,),                                     # nil message
    ]
    df = spark.createDataFrame(rows, "value binary")
    decoded = decode_confluent(df, registry, reader_schema_id=1)
    out = {tuple(r) for r in
           decoded.selectExpr("decoded.id", "_decode_error is null").collect()}
    assert (10, True) in out
    assert (None, True) not in out                   # id=99 projected by name
    assert (99, True) in out
    kept = drop_decode_errors(decoded)
    assert kept.count() == 2


def test_avro_streaming_end_to_end(spark, tmp_path):
    """Framed Avro through the full pipeline into the ES-fake sink —
    the consumer_test.go:106-147 shape with an Avro payload."""
    from kafka_elasticsearch_injector_spark.config import InjectorConfig
    from kafka_elasticsearch_injector_spark.streaming.es_sink import FileTransport
    from kafka_elasticsearch_injector_spark.streaming.pipeline import start_pipeline

    ts = dt.datetime(2018, 3, 10, 14, 30, 0)
    codec = Codec(FIXTURE_SCHEMA)
    rows = [
        (b"k1", wire_encode(1, codec.encode({"id": 1})), "t", 0, 7, ts),
        (b"k2", b"\x00\x00\x00\x00\x01\xff", "t", 0, 8, ts),  # malformed
    ]
    src_dir, es_root, ckpt = (str(tmp_path / d) for d in ("src", "es", "ckpt"))
    os.makedirs(es_root)
    spark.createDataFrame(
        rows, "key BINARY, value BINARY, topic STRING, partition INT, "
              "offset LONG, timestamp TIMESTAMP"
    ).write.mode("overwrite").parquet(src_dir)

    cfg = InjectorConfig(record_type="avro", topics=("t",),
                         schema_registry_url="mem://fixture")
    source = (
        spark.readStream.schema(
            "key BINARY, value BINARY, topic STRING, partition INT, "
            "offset LONG, timestamp TIMESTAMP")
        .parquet(src_dir)
    )
    q = start_pipeline(
        spark, cfg, None,
        transport_factory=lambda root=es_root: FileTransport(root),
        checkpoint_dir=ckpt, source_df=source,
        registry=dict_registry({1: FIXTURE_SCHEMA}), reader_schema_id=1)
    try:
        import time
        deadline = time.time() + 60
        while time.time() < deadline:
            if os.path.isdir(os.path.join(es_root, "t-2018-03-10")):
                if os.listdir(os.path.join(es_root, "t-2018-03-10")):
                    break
            time.sleep(0.5)
    finally:
        q.stop()

    with open(os.path.join(es_root, "t-2018-03-10", "0:7.json")) as f:
        doc = json.load(f)
    assert doc["id"] == 1
    assert doc["@timestamp"] == int(ts.timestamp() * 1000)
    # the malformed record was side-dropped, not fatal
    assert os.listdir(os.path.join(es_root, "t-2018-03-10")) == ["0:7.json"]


def test_encode_confluent_roundtrip(spark):
    """Producer-side framing (reference op 26): struct → framed Avro →
    decode_confluent recovers the struct, id and header byte-exact."""
    from kafka_elasticsearch_injector_spark.sources import encode_confluent

    registry = dict_registry({1: FIXTURE_SCHEMA})
    df = spark.createDataFrame(
        [(7, (10,)), (8, (20,)), (9, None)],
        "k long, payload struct<id:int>")
    framed = encode_confluent(df, registry, schema_id=1, struct_col="payload")
    raw = {r.k: r.value and bytes(r.value) for r in framed.collect()}
    assert raw[7][:5] == b"\x00\x00\x00\x00\x01"       # magic + BE id
    assert raw[7][5:] == Codec(FIXTURE_SCHEMA).encode({"id": 10})
    assert raw[9] is None                               # null passthrough
    decoded = decode_confluent(
        framed.filter("value is not null"), registry, reader_schema_id=1)
    assert {(r.k, r.decoded.id) for r in decoded.collect()} == {(7, 10), (8, 20)}


# ---------------------------------------------------- property-based


from hypothesis import given, settings
from hypothesis import strategies as st

_PROP_SCHEMA = json.dumps({
    "type": "record", "name": "PropRec", "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "flag", "type": "boolean"},
        {"name": "score", "type": "double"},
        {"name": "blob", "type": "bytes"},
        {"name": "opt", "type": ["null", "long"]},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "attrs", "type": {"type": "map", "values": "long"}},
        {"name": "color", "type": {"type": "enum", "name": "Color",
                                   "symbols": ["RED", "GREEN", "BLUE"]}},
        {"name": "child", "type": {"type": "record", "name": "Child",
                                   "fields": [{"name": "x", "type": "int"}]}},
    ],
})

_values = st.fixed_dictionaries({
    "id": st.integers(-2**63, 2**63 - 1),
    "name": st.text(max_size=40),
    "flag": st.booleans(),
    "score": st.floats(allow_nan=False),  # NaN != NaN breaks equality
    "blob": st.binary(max_size=40),
    "opt": st.one_of(st.none(), st.integers(-2**63, 2**63 - 1)),
    "tags": st.lists(st.text(max_size=10), max_size=5),
    "attrs": st.dictionaries(st.text(max_size=8),
                             st.integers(-2**31, 2**31), max_size=5),
    "color": st.sampled_from(["RED", "GREEN", "BLUE"]),
    "child": st.fixed_dictionaries({"x": st.integers(-2**31, 2**31 - 1)}),
})


@settings(max_examples=200, deadline=None)
@given(_values)
def test_codec_roundtrip_property(value):
    """decode(encode(v)) == v for arbitrary schema-conforming values —
    the reference trusts goavro for this (encode_decode.go:52-62); our
    pure-Python codec earns the same trust by property."""
    codec = Codec(_PROP_SCHEMA)
    assert codec.decode(codec.encode(value)) == value
