"""TFRecord sink + readers: framing/Example codec spec conformance,
byte-deterministic export, writer<->reader round-trip, registered
format("tfrecord") source parity, and the onCorrupt audit contract."""

from __future__ import annotations

import json
import os

import pytest

from kafka_elasticsearch_injector_spark.sinks.tfrecord import (
    crc32c,
    decode_example,
    encode_example,
    frame_record,
    iter_tfrecords,
    read_tfrecord,
    write_tfrecord,
)


# ------------------------------------------------------ pure codec


def test_crc32c_public_vector():
    # the canonical CRC-32C (Castagnoli) check value
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0


def test_framing_round_trip_and_corruption_detection():
    recs = [b"hello", b"", b"x" * 4096]
    blob = b"".join(frame_record(r) for r in recs)
    assert list(iter_tfrecords(blob)) == recs
    # flip one payload byte: the data-CRC must catch it
    bad = bytearray(blob)
    bad[20] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch"):
        list(iter_tfrecords(bytes(bad)))
    # truncation (mid-header and mid-payload) must raise, not hang
    with pytest.raises(ValueError, match="truncated"):
        list(iter_tfrecords(blob[:5]))
    with pytest.raises(ValueError, match="truncated"):
        list(iter_tfrecords(blob[:14]))
    # verify_crc=False skips the checksum but still frames correctly
    assert list(iter_tfrecords(blob, verify_crc=False)) == recs


def test_example_wire_bytes_match_hand_derivation():
    """Spec conformance pinned against hand-derived protobuf bytes
    (tensorflow/core/example/{example,feature}.proto): Example{1:
    Features}, Features{1: map entry{1: key, 2: Feature}}, Feature
    {3: Int64List}, Int64List{1: packed varints}."""
    got = encode_example({"a": ("int64", [5])})
    int64_list = b"\x0a\x01\x05"                       # packed [5]
    feature = b"\x1a" + bytes([len(int64_list)]) + int64_list
    entry = b"\x0a\x01a" + b"\x12" + bytes([len(feature)]) + feature
    features = b"\x0a" + bytes([len(entry)]) + entry
    want = b"\x0a" + bytes([len(features)]) + features
    assert got == want


def test_example_codec_round_trip_all_kinds():
    feats = {
        "doc_id": ("int64", [-7]),
        "text": ("bytes", ["hi \N{EARTH GLOBE EUROPE-AFRICA}"]),
        "score": ("float", [1.5]),
        "tags": ("bytes_list", [b"a", b"bb", b""]),
        "ids": ("int64_list", [0, -1, 2**62, -(2**62), 2**63 - 1]),
        "emb": ("float_list", [0.25, -0.5, 3.0]),
    }
    out = decode_example(encode_example(feats))
    assert out["doc_id"] == ("int64_list", [-7])
    assert out["text"] == ("bytes_list",
                           ["hi \N{EARTH GLOBE EUROPE-AFRICA}"
                            .encode("utf-8")])
    assert out["score"] == ("float_list", [1.5])
    assert out["tags"] == ("bytes_list", [b"a", b"bb", b""])
    assert out["ids"] == ("int64_list",
                          [0, -1, 2**62, -(2**62), 2**63 - 1])
    assert out["emb"] == ("float_list", [0.25, -0.5, 3.0])


def test_example_decoder_accepts_unpacked_lists():
    """TF always writes packed (feature.proto declares packed=true),
    but proto3 parsers MUST accept the unpacked encoding too."""
    # Int64List{value: 3, value: 5} unpacked: two wire-type-0 field 1s
    int64_list = b"\x08\x03\x08\x05"
    feature = b"\x1a" + bytes([len(int64_list)]) + int64_list
    entry = b"\x0a\x01k" + b"\x12" + bytes([len(feature)]) + feature
    features = b"\x0a" + bytes([len(entry)]) + entry
    payload = b"\x0a" + bytes([len(features)]) + features
    assert decode_example(payload) == {"k": ("int64_list", [3, 5])}


def test_encode_example_is_order_insensitive():
    feats = {"b": ("int64", [1]), "a": ("bytes", [b"x"]),
             "c": ("float_list", [1.0, 2.0])}
    rev = dict(reversed(list(feats.items())))
    assert encode_example(feats) == encode_example(rev)


@pytest.mark.parametrize("bad", ["int32", "double", "str", ""])
def test_unknown_kind_rejected(bad):
    with pytest.raises(ValueError, match="unknown feature kind"):
        encode_example({"x": (bad, [1])})


# --------------------------------------------------- writer + reader


FEATURES = {"doc_id": "int64", "text": "bytes", "score": "float",
            "emb": "float_list"}


def _corpus(spark):
    rows = [(i, f"doc {i}", float(i) / 4.0,
             [float(i), float(i) + 0.5]) for i in range(24)]
    rows.append((98, None, None, None))            # NULLs -> absent
    rows.append((99, "tail", 9.75, []))            # empty list
    return spark.createDataFrame(
        rows, "doc_id long, text string, score float, emb array<float>")


def test_tfrecord_export_round_trip_and_determinism(spark, tmp_path):
    df = _corpus(spark)
    out = str(tmp_path / "tfr")
    m1 = {r.file: r.sha256
          for r in write_tfrecord(df, out, 3, features=FEATURES).collect()}
    assert len(m1) == 3
    assert sorted(os.listdir(out))[0].endswith((".json", ".tfrecord"))

    back = read_tfrecord(spark, out, features=FEATURES)
    got = {r.doc_id: r for r in back.collect()}
    assert len(got) == 26 and back.columns == [
        "shard", "doc_id", "emb", "score", "text"]
    assert bytes(got[7].text) == b"doc 7"
    assert got[7].score == pytest.approx(7 / 4.0)
    assert list(got[7].emb) == [7.0, 7.5]
    assert got[98].text is None and got[98].score is None
    assert got[98].emb is None                     # absent feature
    assert list(got[99].emb) == []                 # present, empty
    # raw mode: one undecoded Example payload per record
    raw = read_tfrecord(spark, out)
    assert raw.columns == ["shard", "record"]
    payloads = [bytes(r.record) for r in raw.collect()]
    assert len(payloads) == 26
    assert decode_example(payloads[0])              # parses

    # byte determinism: a re-export reproduces identical sha256s
    m2 = {r.file: r.sha256
          for r in write_tfrecord(df, out, 3, features=FEATURES).collect()}
    assert m1 == m2


def test_tfrecord_source_matches_helper_reader(spark, tmp_path):
    from kafka_elasticsearch_injector_spark.sources.tfrecord_source import (
        register_tfrecord_source,
    )

    df = _corpus(spark)
    out = str(tmp_path / "tfr")
    write_tfrecord(df, out, 4, features=FEATURES).collect()
    register_tfrecord_source(spark)
    via_source = (spark.read.format("tfrecord")
                  .option("features", json.dumps(FEATURES)).load(out))
    via_helper = read_tfrecord(spark, out, features=FEATURES)
    assert via_source.schema == via_helper.schema
    key = lambda r: (r[0], r[1])                   # (shard, doc_id)
    a = sorted(map(tuple, via_source.collect()), key=key)
    b = sorted(map(tuple, via_helper.collect()), key=key)
    assert a == b and len(a) == 26
    # one planned partition per shard file
    assert via_source.rdd.getNumPartitions() == 4


def test_tfrecord_on_corrupt_contract(spark, tmp_path):
    """fail loudly by default; skip drops the WHOLE corrupt shard and
    leaves the durable audit marker — byte-for-byte the webdataset
    readers' contract, same shared _record_skip."""
    from kafka_elasticsearch_injector_spark.sources.tfrecord_source import (
        register_tfrecord_source,
    )

    df = _corpus(spark)
    out = str(tmp_path / "tfr")
    write_tfrecord(df, out, 3, features=FEATURES).collect()
    with open(os.path.join(out, "shard-00001.5.tfrecord"), "wb") as f:
        f.write(b"this is not a tfrecord stream")

    register_tfrecord_source(spark)
    with pytest.raises(Exception, match="corrupt TFRecord shard"):
        spark.read.format("tfrecord").load(out).count()
    with pytest.raises(Exception, match="corrupt TFRecord shard"):
        read_tfrecord(spark, out, features=FEATURES).count()

    skiplog = str(tmp_path / "skiplog")
    ok = (spark.read.format("tfrecord")
          .option("onCorrupt", "skip")
          .option("onCorruptLogDir", skiplog).load(out))
    assert ok.count() == 26
    marks = sorted(os.listdir(skiplog))
    assert len(marks) == 1
    assert marks[0].startswith("shard-00001.5.tfrecord.")
    assert marks[0].endswith(".skipped")

    helperlog = str(tmp_path / "helperlog")
    assert read_tfrecord(spark, out, features=FEATURES,
                         on_corrupt="skip",
                         on_corrupt_log_dir=helperlog).count() == 26
    assert len(os.listdir(helperlog)) == 1
    with pytest.raises(ValueError, match="'fail' or 'skip'"):
        read_tfrecord(spark, out, on_corrupt="maybe")


def test_tfrecord_option_validation(spark, tmp_path):
    from kafka_elasticsearch_injector_spark.sources.tfrecord_source import (
        register_tfrecord_source,
    )

    df = _corpus(spark)
    out = str(tmp_path / "tfr")
    write_tfrecord(df, out, 2, features=FEATURES).collect()
    register_tfrecord_source(spark)
    with pytest.raises(Exception, match="features"):
        (spark.read.format("tfrecord")
         .option("features", '{"x": "int32"}').load(out).collect())
    with pytest.raises(Exception, match="no \\*\\.tfrecord shards"):
        (spark.read.format("tfrecord")
         .load(out + "/empty-subdir").collect())
    with pytest.raises(ValueError, match="unknown feature kind"):
        write_tfrecord(df, out, 2, features={"text": "utf8"})
    with pytest.raises(ValueError, match="reserved"):
        write_tfrecord(df.withColumnRenamed("text", "shard"), out, 2,
                       features={"shard": "bytes"})


def test_tfrecord_manifest_integrity_and_staged_publish(spark, tmp_path):
    """The export rides the shared staged-publication + manifest
    machinery: sha256s in the manifest match the written bytes, and a
    verify pass over the directory agrees."""
    import hashlib

    df = _corpus(spark)
    out = str(tmp_path / "tfr")
    manifest = write_tfrecord(df, out, 3, features=FEATURES).collect()
    for r in manifest:
        data = open(os.path.join(out, r.file), "rb").read()
        assert hashlib.sha256(data).hexdigest() == r.sha256
        assert len(data) == r.n_bytes
    assert sum(r.n_records for r in manifest) == 26


def _publish_tfrecord_shard(stream_dir, name, doc_id, text):
    """Append-only atomic publish of a one-record TFRecord shard."""
    from kafka_elasticsearch_injector_spark.sinks.tfrecord import (
        encode_example,
        frame_record,
    )

    payload = encode_example({"doc_id": ("int64", [doc_id]),
                              "text": ("bytes", [text])})
    tmp = os.path.join(stream_dir, f".{name}.tmp")
    with open(tmp, "wb") as f:
        f.write(frame_record(payload))
    os.replace(tmp, os.path.join(stream_dir, name))


def test_tfrecord_stream_picks_up_new_shards(spark, tmp_path):
    """readStream over the shard directory (the shared appended-shards
    watermark, here under format('tfrecord')): the initial shards
    drain, later atomic-rename publishes arrive exactly once, typed."""
    from kafka_elasticsearch_injector_spark.sources.tfrecord_source import (
        register_tfrecord_source,
    )

    register_tfrecord_source(spark)
    stream_dir = str(tmp_path / "stream")
    os.makedirs(stream_dir)
    for i in range(3):
        _publish_tfrecord_shard(stream_dir, f"shard-0000{i}.tfrecord",
                                i, f"initial {i}".encode())

    got: list = []
    q = (spark.readStream.format("tfrecord")
         .option("features",
                 json.dumps({"doc_id": "int64", "text": "bytes"}))
         .load(stream_dir)
         .writeStream.foreachBatch(lambda df, _: got.extend(df.collect()))
         .option("checkpointLocation", str(tmp_path / "ckpt")).start())
    try:
        q.processAllAvailable()
        assert len(got) == 3
        for i in range(3, 6):                    # publish while running
            _publish_tfrecord_shard(stream_dir,
                                    f"shard-0000{i}.tfrecord",
                                    i, f"late {i}".encode())
        q.processAllAvailable()
    finally:
        q.stop()
    q.awaitTermination(30)
    assert sorted(r.doc_id for r in got) == list(range(6))  # exactly once
    by_id = {r.doc_id: r for r in got}
    assert bytes(by_id[4].text) == b"late 4"
    assert by_id[5].shard == "shard-00005.tfrecord"


def test_example_codec_hypothesis_round_trip():
    """Generative net over the Example codec: arbitrary feature dicts
    (all six kinds, full int64 range, arbitrary bytes incl. empty,
    float32-representable floats) encode deterministically and decode
    back exactly. Floats are drawn pre-rounded through struct so the
    comparison is exact (float32 is the FORMAT's width)."""
    import struct as _struct

    from hypothesis import given, settings
    from hypothesis import strategies as st

    f32 = st.floats(allow_nan=False, width=32).map(
        lambda v: _struct.unpack("<f", _struct.pack("<f", v))[0])
    i64 = st.integers(-(2**63), 2**63 - 1)
    raw = st.binary(max_size=64)
    kinds = {
        "bytes": raw.map(lambda v: [v]),
        "int64": i64.map(lambda v: [v]),
        "float": f32.map(lambda v: [v]),
        "bytes_list": st.lists(raw, max_size=5),
        "int64_list": st.lists(i64, max_size=5),
        "float_list": st.lists(f32, max_size=5),
    }
    feature = st.sampled_from(sorted(kinds)).flatmap(
        lambda k: kinds[k].map(lambda vals: (k, vals)))
    names = st.text(
        st.characters(codec="utf-8",
                      blacklist_categories=("Cs",)),
        min_size=1, max_size=12)
    examples = st.dictionaries(names, feature, max_size=6)

    @settings(max_examples=200, deadline=None)
    @given(examples)
    def check(feats):
        blob = encode_example(feats)
        assert encode_example(feats) == blob           # deterministic
        out = decode_example(blob)
        assert set(out) == set(feats)
        for name, (kind, vals) in feats.items():
            dk, dv = out[name]
            assert dk == kind.replace("_list", "") + "_list"
            want = [v.encode() if isinstance(v, str) else v
                    for v in vals]
            assert dv == want, (name, kind)

    check()


def test_gzip_compressed_shards_read_transparently(spark, tmp_path):
    """tf.data writes GZIP-compressed TFRecord streams under the same
    extension (compression_type='GZIP'); both readers must detect the
    magic and decompress — including through the registered source."""
    import gzip

    from kafka_elasticsearch_injector_spark.sources.tfrecord_source import (
        register_tfrecord_source,
    )

    out = str(tmp_path / "tfr")
    os.makedirs(out)
    recs = b"".join(
        frame_record(encode_example({"doc_id": ("int64", [i]),
                                     "text": ("bytes", [b"z%d" % i])}))
        for i in range(5))
    with open(os.path.join(out, "shard-00000.tfrecord"), "wb") as f:
        f.write(gzip.compress(recs))

    feats = {"doc_id": "int64", "text": "bytes"}
    got = {r.doc_id: bytes(r.text)
           for r in read_tfrecord(spark, out, features=feats).collect()}
    assert got == {i: b"z%d" % i for i in range(5)}
    register_tfrecord_source(spark)
    via_source = (spark.read.format("tfrecord")
                  .option("features", json.dumps(feats)).load(out))
    assert via_source.count() == 5


def test_kind_mismatch_and_malformed_payload_speak_valueerror(spark,
                                                              tmp_path):
    """(a) requesting a feature under the wrong kind fails with a
    NAMED error (not an opaque Arrow type error later), and it routes
    through the onCorrupt contract like any corrupt shard; (b) a
    malformed packed section inside a CRC-valid record raises
    ValueError, not struct.error, so onCorrupt=skip still governs it."""
    from kafka_elasticsearch_injector_spark.sinks.tfrecord import (
        rows_from_file,
    )

    out = str(tmp_path / "tfr")
    os.makedirs(out)
    good = frame_record(encode_example({"doc_id": ("int64", [1]),
                                        "text": ("bytes", [b"x"])}))
    with open(os.path.join(out, "shard-00000.tfrecord"), "wb") as f:
        f.write(good)

    with pytest.raises(Exception, match="requested as bytes"):
        read_tfrecord(spark, out,
                      features={"doc_id": "bytes"}).collect()
    # empty/absent features fit ANY requested kind (a foreign writer's
    # kind-less empty Feature must not trip the check)
    got = read_tfrecord(spark, out, features={"missing": "int64"}).collect()
    assert got[0].missing is None
    # skip path: the mismatched shard drops whole, auditable
    skiplog = str(tmp_path / "skiplog")
    assert read_tfrecord(spark, out, features={"doc_id": "bytes"},
                         on_corrupt="skip",
                         on_corrupt_log_dir=skiplog).count() == 0
    assert len(os.listdir(skiplog)) == 1

    # (b) CRC-valid record whose Int64List body truncates a FloatList-
    # style packed read: craft Feature{2: FloatList{1: 3 bytes}} — the
    # packed <f unpack must surface as ValueError
    float_list = b"\x0a\x03\x00\x00\x80"          # len 3: not 4-aligned
    feature = b"\x12" + bytes([len(float_list)]) + float_list
    entry = b"\x0a\x01k" + b"\x12" + bytes([len(feature)]) + feature
    features_body = b"\x0a" + bytes([len(entry)]) + entry
    payload = b"\x0a" + bytes([len(features_body)]) + features_body
    with pytest.raises(ValueError,
                       match="misaligned FloatList|malformed Example"):
        list(rows_from_file(frame_record(payload), {"k": "float_list"}))
    # a BytesList element whose declared length overruns the buffer
    # must raise, never silently truncate
    bytes_list = b"\x0a\x7fshort"                 # claims 127, has 5
    feature = b"\x0a" + bytes([len(bytes_list)]) + bytes_list
    entry = b"\x0a\x01k" + b"\x12" + bytes([len(feature)]) + feature
    features_body = b"\x0a" + bytes([len(entry)]) + entry
    payload = b"\x0a" + bytes([len(features_body)]) + features_body
    with pytest.raises(ValueError, match="truncated"):
        list(rows_from_file(frame_record(payload), {"k": "bytes_list"}))


def test_writer_kind_column_type_gates(spark, tmp_path):
    """Kind/column mismatches fail NAMED at write time: bytes(int)
    would silently write N NUL bytes, int(float) would silently
    truncate — both are schema mistakes, not coercion requests."""
    df = _corpus(spark)
    out = str(tmp_path / "tfr")
    with pytest.raises(Exception, match="bytes feature got a int"):
        write_tfrecord(df, out, 2,
                       features={"doc_id": "bytes"}).collect()
    with pytest.raises(Exception, match="int64 feature got a float"):
        write_tfrecord(df, out, 2,
                       features={"score": "int64"}).collect()


def test_writer_infers_id_kind_from_schema(spark, tmp_path):
    """A STRING id rides along as bytes (not forced int64: int('d-1')
    would crash deep in the shard task); an unsupported id type asks
    for an explicit features entry."""
    df = spark.createDataFrame([("d-1", "x"), ("d-2", "y")],
                               "doc_id string, text string")
    out = str(tmp_path / "tfr")
    write_tfrecord(df, out, 1, features={"text": "bytes"}).collect()
    got = {bytes(r.doc_id): bytes(r.text) for r in read_tfrecord(
        spark, out, features={"doc_id": "bytes",
                              "text": "bytes"}).collect()}
    assert got == {b"d-1": b"x", b"d-2": b"y"}

    fdf = spark.createDataFrame([(1.5, "x")], "doc_id double, text string")
    with pytest.raises(ValueError, match="cannot infer"):
        write_tfrecord(fdf, str(tmp_path / "t2"), 1,
                       features={"text": "bytes"})


def test_reader_reserves_shard_and_handles_exotic_names(spark, tmp_path):
    """A feature literally named 'shard' would shadow the readers'
    shard-filename column — reserved, like the writer's check; names
    with spaces survive both readers (column order comes from the
    features dict, never re-parsed out of the DDL string)."""
    from kafka_elasticsearch_injector_spark.sources.tfrecord_source import (
        register_tfrecord_source,
    )

    with pytest.raises(ValueError, match="reserved"):
        read_tfrecord(spark, str(tmp_path), features={"shard": "bytes"})

    out = str(tmp_path / "tfr")
    os.makedirs(out)
    rec = frame_record(encode_example({"my col": ("int64", [7]),
                                       "doc id": ("bytes", [b"seven"])}))
    with open(os.path.join(out, "shard-00000.tfrecord"), "wb") as f:
        f.write(rec)
    feats = {"my col": "int64", "doc id": "bytes"}
    r = read_tfrecord(spark, out, features=feats).collect()[0]
    assert r["my col"] == 7 and bytes(r["doc id"]) == b"seven"
    register_tfrecord_source(spark)
    s = (spark.read.format("tfrecord")
         .option("features", json.dumps(feats)).load(out).collect()[0])
    assert s["my col"] == 7 and bytes(s["doc id"]) == b"seven"


def test_corrupt_gzip_shard_honors_on_corrupt(spark, tmp_path):
    """A truncated GZIP shard must speak the corrupt-shard language
    (ValueError -> onCorrupt), not leak gzip's own EOFError through
    the skip contract; and a valid uncompressed shard that happens to
    start with the gzip magic parses fine (decompress-then-fallback)."""
    import gzip

    out = str(tmp_path / "tfr")
    os.makedirs(out)
    good = frame_record(encode_example({"doc_id": ("int64", [1])}))
    with open(os.path.join(out, "shard-00000.tfrecord"), "wb") as f:
        f.write(good)
    blob = gzip.compress(good * 3)
    with open(os.path.join(out, "shard-00001.tfrecord"), "wb") as f:
        f.write(blob[:len(blob) // 2])             # truncated gzip

    feats = {"doc_id": "int64"}
    with pytest.raises(Exception, match="corrupt TFRecord shard"):
        read_tfrecord(spark, out, features=feats).count()
    skiplog = str(tmp_path / "skiplog")
    assert read_tfrecord(spark, out, features=feats, on_corrupt="skip",
                         on_corrupt_log_dir=skiplog).count() == 1
    assert len(os.listdir(skiplog)) == 1

    # magic-collision: an uncompressed record whose framed length low
    # bytes are 1f 8b — i.e. payload length 0x8b1f = 35615 bytes;
    # measure the Example overhead once, then pad to hit it exactly
    def _payload(pad: int) -> bytes:
        return encode_example({"doc_id": ("int64", [2]),
                               "pad": ("bytes", [b"p" * pad])})

    pad = 0x8B1F - (len(_payload(1000)) - 1000)
    for _ in range(6):          # nested varint length prefixes grow
        diff = len(_payload(pad)) - 0x8B1F   # with size — fixed-point
        if not diff:
            break
        pad -= diff
    collide = frame_record(_payload(pad))
    assert collide[:2] == b"\x1f\x8b"
    d2 = str(tmp_path / "tfr2")
    os.makedirs(d2)
    with open(os.path.join(d2, "shard-00000.tfrecord"), "wb") as f:
        f.write(collide)
    got = read_tfrecord(spark, d2, features=feats).collect()
    assert [r.doc_id for r in got] == [2]


def test_tfrecord_stream_crash_recovery_no_reread(spark, tmp_path):
    """Restart-from-checkpoint over format('tfrecord'): stop after the
    offsets commit, publish during the outage (incl. one name BELOW
    the watermark, which must stay invisible), restart from the SAME
    checkpoint - exactly the shards published during the outage
    arrive, nothing re-read (the webdataset twin of this e2e proves
    the shared base; this one proves the tfrecord subclass wiring)."""
    from kafka_elasticsearch_injector_spark.sources.tfrecord_source import (
        register_tfrecord_source,
    )

    register_tfrecord_source(spark)
    d = str(tmp_path / "stream")
    os.makedirs(d)
    for i in range(3):
        _publish_tfrecord_shard(d, f"shard-1000{i}.tfrecord", i,
                                b"initial")
    ckpt = str(tmp_path / "ckpt")
    feats = json.dumps({"doc_id": "int64", "text": "bytes"})

    run1: list = []
    q1 = (spark.readStream.format("tfrecord")
          .option("features", feats).load(d)
          .writeStream.foreachBatch(lambda df, _: run1.extend(df.collect()))
          .option("checkpointLocation", ckpt).start())
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()
    q1.awaitTermination(30)
    assert sorted(r.doc_id for r in run1) == [0, 1, 2]

    # published while DOWN: two above the watermark, one below it
    _publish_tfrecord_shard(d, "shard-90000.tfrecord", 90, b"outage")
    _publish_tfrecord_shard(d, "shard-90001.tfrecord", 91, b"outage")
    _publish_tfrecord_shard(d, "shard-00000.tfrecord", 99, b"late-below")

    run2: list = []
    q2 = (spark.readStream.format("tfrecord")
          .option("features", feats).load(d)
          .writeStream.foreachBatch(lambda df, _: run2.extend(df.collect()))
          .option("checkpointLocation", ckpt).start())
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    q2.awaitTermination(30)
    assert sorted(r.doc_id for r in run2) == [90, 91]   # exactly once


def test_scalar_kind_rejects_multivalue_feature():
    """An externally-produced file whose Int64List holds >1 values,
    read with a scalar kind, must raise toward the *_list kind —
    surfacing element 0 silently would be interop data loss (TF's
    FixedLenFeature([]) raises in this case too). r10 ADVICE item."""
    from kafka_elasticsearch_injector_spark.sinks.tfrecord import (
        rows_from_file,
    )

    payload = encode_example({"k": ("int64_list", [1, 2, 3])})
    with pytest.raises(ValueError, match="int64_list"):
        list(rows_from_file(frame_record(payload), {"k": "int64"}))
    # a single-value list under a scalar kind remains fine
    payload1 = encode_example({"k": ("int64_list", [7])})
    assert list(rows_from_file(frame_record(payload1),
                               {"k": "int64"})) == [{"k": 7}]


def test_float_kind_type_gate_names_remedy():
    """A non-numeric value under a float kind raises the same curated
    ValueError shape as the bytes/int64 gates instead of an opaque
    struct.error deep in the shard task. r10 ADVICE item."""
    with pytest.raises(ValueError, match="float feature got a str"):
        encode_example({"k": ("float", ["oops"])})
    with pytest.raises(ValueError, match="float feature got a bool"):
        encode_example({"k": ("float_list", [True])})
    # ints are fine under float kinds (widening, not a schema lie);
    # the wire has only FloatList, so decode reports the _list kind
    assert decode_example(
        encode_example({"k": ("float", [2])}))["k"] == ("float_list", [2.0])
