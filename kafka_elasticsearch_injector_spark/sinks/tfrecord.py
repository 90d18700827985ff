"""TFRecord shard export + distributed reader.

The third training-export convention, next to the parquet shards
(sinks/dataset.py) and WebDataset tars (sinks/webdataset.py): a
directory of `shard-00000.tfrecord` files, each a sequence of
CRC-framed `tf.train.Example` records — the interchange format of the
TensorFlow / tf.data loader ecosystem. Both layers are implemented
here from their PUBLIC specifications, with no TensorFlow dependency:

- TFRecord framing (tensorflow/core/lib/io/record_writer docs):
  `uint64 length (LE) | uint32 masked_crc32c(length) | payload |
  uint32 masked_crc32c(payload)`, where the CRC is Castagnoli
  (CRC-32C) and masked as `((crc >> 15) | (crc << 17)) + 0xa282ead8`.
- `tf.train.Example` protobuf wire format (tensorflow/core/example/
  example.proto, feature.proto): Example{1: Features}, Features
  {1: map<string, Feature>}, Feature{1: BytesList | 2: FloatList |
  3: Int64List}, each list a repeated field 1 (floats/int64s packed).

The reference has no file interchange at all (its terminal store is
ES bulk, src/elasticsearch/elasticsearch.go:60-124); this is engine
surface: a training-data engine must emit and ingest the formats
dataloaders actually consume.

Spark-first shape — identical discipline to the WebDataset writer:
- shard assignment = pure function of the id (xxhash64 mod n);
- ONE shuffle (groupBy shard), one task writes one shard via
  applyInArrow (lossless: exact int64 next to nulls);
- byte determinism: rows sorted by id, protobuf map keys sorted,
  packed canonical encodings ⇒ reproducible per-shard sha256 in the
  returned manifest; atomic staged publication (sinks/_staging.py);
- the reader plans one task per shard file (binaryFile here; the
  registered `format("tfrecord")` source in
  sources/tfrecord_source.py plans the same partitioning without the
  JVM byte round-trip).

At 100 TB: size n_shards for ~1 GB files (one shard = one task = one
in-memory Arrow group); CRC verification on read is on by default
(the integrity posture of this repo's sinks) and can be disabled for
trusted re-reads where the Python CRC table would bound throughput.

Feature kinds (the `features` mapping, column -> kind):
  "bytes"      one bytes element   <-> Spark BINARY (str cols utf-8)
  "int64"      one int64 element   <-> Spark BIGINT
  "float"      one float32 element <-> Spark FLOAT (float32 rounding
                                        is the FORMAT's, not ours)
  "bytes_list" | "int64_list" | "float_list"  <-> Spark ARRAY<...>
A NULL value writes NO feature for that record (absence, the proto3
convention), and reads back as NULL (scalars) / NULL (lists).
"""

from __future__ import annotations

import hashlib
import io
import os
import struct
from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._staging import staged_publish, write_shard_file

# ------------------------------------------------------------------
# CRC-32C (Castagnoli), table-driven, from the public polynomial.
# ------------------------------------------------------------------

_CRC32C_POLY = 0x82F63B78  # reversed Castagnoli polynomial


def _make_crc_table() -> list[int]:
    table = []
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ _CRC32C_POLY if c & 1 else c >> 1
        table.append(c)
    return table


_CRC_TABLE = _make_crc_table()


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ------------------------------------------------------------------
# TFRecord framing
# ------------------------------------------------------------------


def frame_record(payload: bytes) -> bytes:
    """One framed TFRecord: length, masked length-CRC, payload,
    masked payload-CRC (all little-endian)."""
    header = struct.pack("<Q", len(payload))
    return (header + struct.pack("<I", _masked_crc(header))
            + payload + struct.pack("<I", _masked_crc(payload)))


def iter_tfrecords(data: bytes, verify_crc: bool = True
                   ) -> Iterator[bytes]:
    """Yield record payloads from TFRecord file bytes; raises
    ValueError on truncation or (when verify_crc) CRC mismatch —
    the corrupt-shard signal the readers' onCorrupt contract keys on."""
    pos, n = 0, len(data)
    while pos < n:
        if n - pos < 12:
            raise ValueError(
                f"truncated TFRecord header at byte {pos}")
        header = data[pos:pos + 8]
        (length,) = struct.unpack("<Q", header)
        (hcrc,) = struct.unpack("<I", data[pos + 8:pos + 12])
        if verify_crc and _masked_crc(header) != hcrc:
            raise ValueError(f"TFRecord length-CRC mismatch at {pos}")
        start = pos + 12
        if n - start < length + 4:
            raise ValueError(
                f"truncated TFRecord payload at byte {start}")
        payload = data[start:start + length]
        (pcrc,) = struct.unpack("<I", data[start + length:
                                           start + length + 4])
        if verify_crc and _masked_crc(payload) != pcrc:
            raise ValueError(f"TFRecord data-CRC mismatch at {start}")
        yield payload
        pos = start + length + 4


# ------------------------------------------------------------------
# tf.train.Example wire codec (minimal protobuf, no dependency)
# ------------------------------------------------------------------

KINDS = ("bytes", "int64", "float", "bytes_list", "int64_list",
         "float_list")


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    shift = v = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated varint")
        b = data[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def _ld(field_no: int, payload: bytes) -> bytes:
    """One length-delimited (wire type 2) field."""
    return _varint(field_no << 3 | 2) + _varint(len(payload)) + payload


def _encode_feature(kind: str, values: list) -> bytes:
    if kind.startswith("bytes"):
        for v in values:
            # an explicit type gate: bytes(int_value) would silently
            # write that many NUL bytes — corruption, not coercion
            if not isinstance(v, (bytes, bytearray, memoryview, str)):
                raise ValueError(
                    f"bytes feature got a {type(v).__name__} value — "
                    "declare the column's real kind (int64/float) or "
                    "cast it to string/binary before exporting")
        body = b"".join(
            _ld(1, v.encode("utf-8") if isinstance(v, str) else bytes(v))
            for v in values)
        return _ld(1, body)                         # BytesList
    if kind.startswith("float"):
        for v in values:
            # same explicit gate as bytes/int64: struct.pack on a
            # non-numeric value raises an opaque struct.error deep in
            # the shard task — name the remedy instead
            if isinstance(v, bool) or not isinstance(v, (int, float)):
                raise ValueError(
                    f"float feature got a {type(v).__name__} value — "
                    "declare the column's real kind (bytes/int64) or "
                    "cast it to float before exporting")
        packed = struct.pack(f"<{len(values)}f", *values)
        return _ld(2, _ld(1, packed))               # FloatList packed
    # int64: negative values are 64-bit two's-complement varints
    for v in values:
        # int(1.7) would silently truncate — a DOUBLE column declared
        # int64 is a schema mistake, not a rounding request
        if not isinstance(v, int):
            raise ValueError(
                f"int64 feature got a {type(v).__name__} value — "
                "declare the column's real kind or cast it first")
    packed = b"".join(_varint(v & 0xFFFFFFFFFFFFFFFF)
                      for v in values)
    return _ld(3, _ld(1, packed))                   # Int64List packed


def encode_example(features: dict[str, tuple[str, list]]) -> bytes:
    """Serialize {name: (kind, values)} into tf.train.Example bytes.
    DETERMINISTIC: map entries are emitted in sorted-name order (the
    protobuf map order is unspecified, so canonicalizing here is what
    makes the shard sha256 reproducible)."""
    entries = bytearray()
    for name, (kind, values) in sorted(features.items()):
        if kind not in KINDS:
            raise ValueError(f"unknown feature kind {kind!r} "
                             f"(expected one of {KINDS})")
        feature = _encode_feature(kind, values)
        entry = _ld(1, name.encode("utf-8")) + _ld(2, feature)
        entries += _ld(1, entry)                    # Features map entry
    return _ld(1, bytes(entries))                   # Example.features


def _decode_list(kind_no: int, payload: bytes) -> tuple[str, list]:
    """BytesList / FloatList / Int64List body -> (kind, values);
    accepts both packed and unpacked repeated encodings."""
    values: list = []
    pos = 0
    while pos < len(payload):
        tag, pos = _read_varint(payload, pos)
        field, wire = tag >> 3, tag & 7
        if field != 1:
            raise ValueError(f"unexpected list field {field}")
        if kind_no == 1:                            # BytesList
            if wire != 2:
                raise ValueError("BytesList value must be bytes")
            ln, pos = _read_varint(payload, pos)
            if pos + ln > len(payload):
                # a silent short slice would yield truncated data
                # instead of honoring the corrupt-shard contract
                raise ValueError("truncated BytesList element")
            values.append(payload[pos:pos + ln])
            pos += ln
        elif kind_no == 2:                          # FloatList
            if wire == 5:                           # unpacked fixed32
                values.append(struct.unpack("<f",
                                            payload[pos:pos + 4])[0])
                pos += 4
            elif wire == 2:                         # packed
                ln, pos = _read_varint(payload, pos)
                if pos + ln > len(payload) or ln % 4:
                    # short slice or trailing bytes would silently
                    # drop float elements
                    raise ValueError("truncated/misaligned FloatList")
                values.extend(struct.unpack(
                    f"<{ln // 4}f", payload[pos:pos + ln]))
                pos += ln
            else:
                raise ValueError("bad FloatList wire type")
        else:                                       # Int64List
            def _signed(u: int) -> int:
                return u - (1 << 64) if u >= 1 << 63 else u
            if wire == 0:                           # unpacked varint
                u, pos = _read_varint(payload, pos)
                values.append(_signed(u))
            elif wire == 2:                         # packed
                ln, pos = _read_varint(payload, pos)
                end = pos + ln
                while pos < end:
                    u, pos = _read_varint(payload, pos)
                    values.append(_signed(u))
            else:
                raise ValueError("bad Int64List wire type")
    kind = {1: "bytes_list", 2: "float_list", 3: "int64_list"}[kind_no]
    return kind, values


def _skip_field(data: bytes, pos: int, wire: int) -> int:
    if wire == 0:
        _, pos = _read_varint(data, pos)
    elif wire == 1:
        pos += 8
    elif wire == 2:
        ln, pos = _read_varint(data, pos)
        pos += ln
    elif wire == 5:
        pos += 4
    else:
        raise ValueError(f"unsupported wire type {wire}")
    return pos


def _fields(data: bytes) -> Iterator[tuple[int, int, bytes]]:
    """Yield (field_no, wire_type, payload-or-scalar-bytes)."""
    pos = 0
    while pos < len(data):
        tag, pos = _read_varint(data, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 2:
            ln, pos = _read_varint(data, pos)
            if pos + ln > len(data):
                raise ValueError(
                    "truncated length-delimited protobuf field")
            yield field, wire, data[pos:pos + ln]
            pos += ln
        else:
            start = pos
            pos = _skip_field(data, pos, wire)
            yield field, wire, data[start:pos]


def decode_example(payload: bytes) -> dict[str, tuple[str, list]]:
    """tf.train.Example bytes -> {name: (kind, values)}."""
    out: dict[str, tuple[str, list]] = {}
    for field, wire, features_body in _fields(payload):
        if field != 1 or wire != 2:
            continue                                # ignore unknowns
        for efield, ewire, entry in _fields(features_body):
            if efield != 1 or ewire != 2:
                continue
            name, feature = None, None
            for kfield, kwire, val in _fields(entry):
                if kfield == 1 and kwire == 2:
                    name = val.decode("utf-8")
                elif kfield == 2 and kwire == 2:
                    feature = val
            if name is None:
                raise ValueError("Features map entry without a key")
            if not feature:                         # empty Feature
                out[name] = ("bytes_list", [])
                continue
            for ffield, fwire, body in _fields(feature):
                if fwire != 2 or ffield not in (1, 2, 3):
                    raise ValueError(
                        f"unsupported Feature field {ffield}")
                out[name] = _decode_list(ffield, body)
    return out


# ------------------------------------------------------------------
# Writer
# ------------------------------------------------------------------

MANIFEST_SCHEMA = ("shard int, file string, n_records long, "
                   "n_bytes long, sha256 string")

_MANIFEST_ARROW = pa.schema([
    ("shard", pa.int32()), ("file", pa.string()),
    ("n_records", pa.int64()), ("n_bytes", pa.int64()),
    ("sha256", pa.string()),
])


def _shard_bytes(table: pa.Table, id_col: str,
                 features: dict[str, str]) -> tuple[bytes, int]:
    """One shard's rows (already id-sorted) -> TFRecord file bytes.
    Arrow to_pylist is the lossless handoff (exact int64 next to
    nulls; see sinks/webdataset._tar_bytes for the full rationale)."""
    cols = {name: table.column(name).to_pylist() for name in features}
    ids = table.column(id_col).to_pylist()
    buf = io.BytesIO()
    n = 0
    for i in range(len(ids)):
        feats: dict[str, tuple[str, list]] = {}
        for name, kind in features.items():
            v = cols[name][i]
            if v is None:
                continue                # NULL -> feature absent
            feats[name] = (kind, list(v) if kind.endswith("_list")
                           else [v])
        buf.write(frame_record(encode_example(feats)))
        n += 1
    return buf.getvalue(), n


def write_tfrecord(df: DataFrame, path: str, n_shards: int,
                   id_col: str = "doc_id",
                   features: dict[str, str] | None = None,
                   allow_empty: bool = False) -> DataFrame:
    """Export `df` as TFRecord shards at `path`; returns the per-shard
    manifest DataFrame (MANIFEST_SCHEMA). `features` maps COLUMN ->
    kind (module docstring); default {"text": "bytes"}. The id always
    rides along (kind inferred from its Spark type — int64 for
    integrals, bytes for string/binary — unless declared explicitly)
    so the export round-trips identity. Deterministic bytes: xxhash64 shard
    assignment, id-sorted rows, sorted feature names, packed canonical
    protobuf — re-runs reproduce identical sha256 per shard. PRECONDITION
    for the byte-reproducibility claim: ids are unique. Rows sharing an
    id still all land (correctness holds, and they hash to the same
    shard), but their relative order after the id sort follows upstream
    arrival — Arrow's sort stability across versions is not a documented
    contract — so duplicate-id exports may produce run-to-run differing
    shard bytes. Atomic staged publication, same as every sink in this
    package."""
    from pyspark.sql import types as T

    from .webdataset import with_hash_shard

    features = dict(features) if features else {"text": "bytes"}
    if id_col not in features:
        # infer the ride-along id's kind from the ACTUAL column type —
        # a forced int64 would int('doc-17') a string id deep inside
        # the shard task, or silently truncate a float one
        id_type = df.schema[id_col].dataType
        if isinstance(id_type, (T.ByteType, T.ShortType, T.IntegerType,
                                T.LongType)):
            features[id_col] = "int64"
        elif isinstance(id_type, (T.StringType, T.BinaryType)):
            features[id_col] = "bytes"
        else:
            raise ValueError(
                f"cannot infer a TFRecord kind for id column "
                f"{id_col!r} of type {id_type.simpleString()}: pass "
                f"it in `features` explicitly (float ids would "
                f"round-trip through float32)")
    for kind in features.values():
        if kind not in KINDS:
            raise ValueError(f"unknown feature kind {kind!r} "
                             f"(expected one of {KINDS})")
    cols = list(dict.fromkeys([id_col, *features]))
    if "shard" in cols:
        raise ValueError(
            "column name 'shard' is reserved by the writer's shard "
            "assignment (rename the column before exporting)")

    def run(staging: str) -> list:
        def write_shard(table: pa.Table) -> pa.Table:
            shard = table.column("shard")[0].as_py()
            fname = f"shard-{shard:05d}.tfrecord"
            ordered = table.sort_by([(id_col, "ascending")])
            data, n = _shard_bytes(ordered, id_col, features)
            write_shard_file(staging, fname, data)
            return pa.table({
                "shard": [shard], "file": [fname], "n_records": [n],
                "n_bytes": [len(data)],
                "sha256": [hashlib.sha256(data).hexdigest()],
            }, schema=_MANIFEST_ARROW)

        sharded = with_hash_shard(df.select(*cols), n_shards, id_col)
        return (sharded.groupBy("shard")
                .applyInArrow(write_shard, MANIFEST_SCHEMA)
                .collect())

    rows = staged_publish(path, ".tfrecord", run,
                          allow_empty=allow_empty, manifest=True)
    return df.sparkSession.createDataFrame(rows, MANIFEST_SCHEMA)


# ------------------------------------------------------------------
# Distributed helper reader (binaryFile path; the registered
# format("tfrecord") source is sources/tfrecord_source.py)
# ------------------------------------------------------------------

_SPARK_TYPES = {"bytes": "binary", "int64": "bigint", "float": "float",
                "bytes_list": "array<binary>",
                "int64_list": "array<bigint>",
                "float_list": "array<float>"}

ARROW_TYPES = {"bytes": pa.binary(), "int64": pa.int64(),
               "float": pa.float32(),
               "bytes_list": pa.list_(pa.binary()),
               "int64_list": pa.list_(pa.int64()),
               "float_list": pa.list_(pa.float32())}


def _check_features(features: dict[str, str]) -> None:
    for name, kind in features.items():
        if kind not in KINDS:
            raise ValueError(f"unknown feature kind {kind!r} "
                             f"(expected one of {KINDS})")
        if name == "shard":
            # same reservation as the writer: the readers prepend the
            # shard filename column, and a feature by that name would
            # silently shadow it / duplicate the schema
            raise ValueError(
                "feature name 'shard' is reserved by the readers' "
                "shard-filename column (request it under another name)")


def columns_for(features: dict[str, str] | None) -> list[str]:
    """Reader column order, derived from the features DICT (never
    re-parsed out of a DDL string — names may contain spaces, commas,
    backticks, any UTF-8). Shared by both readers."""
    if not features:
        return ["shard", "record"]
    return ["shard", *sorted(features)]


def schema_for(features: dict[str, str] | None) -> str:
    """(shard string, <col> typed ...) — shared with the registered
    source so the two readers cannot drift. features=None = raw mode:
    one BINARY `record` column of undecoded Example payloads."""
    if not features:
        return "shard string, record binary"
    _check_features(features)
    return "shard string, " + ", ".join(
        # Spark DDL backtick-escaping: double any backtick in the name
        f"`{name.replace('`', '``')}` {_SPARK_TYPES[kind]}"
        for name, kind in sorted(features.items()))


def rows_from_file(data: bytes, features: dict[str, str] | None,
                   verify_crc: bool = True) -> Iterator[dict]:
    """Decode one TFRecord file's bytes into reader rows (no `shard`
    column — the caller knows the file). Shared by both readers.
    Scalar kinds surface the single element (None when the feature is
    absent or empty; MORE than one value raises, directing the caller
    to the *_list kind — TF's FixedLenFeature([]) raises there too,
    and silently surfacing element 0 would be interop data loss);
    list kinds surface the whole list. GZIP-compressed
    shards (tf.data compression_type="GZIP" keeps the extension) are
    detected by magic and decompressed transparently."""
    if data[:2] == b"\x1f\x8b":
        import gzip
        import zlib

        try:
            data = gzip.decompress(data)
        except (OSError, EOFError, zlib.error):
            # two distinct cases, one safe answer: (a) a VALID
            # uncompressed shard can start 1f 8b (a first-record
            # length ≡ 35615 mod 2^64's low bytes) — parsing it as-is
            # succeeds below; (b) genuinely corrupt gzip — the raw
            # bytes then fail the CRC framing as ValueError, which IS
            # the readers' onCorrupt language (gzip's own errors are
            # OSError/EOFError/zlib.error and would bypass it)
            pass
    for payload in iter_tfrecords(data, verify_crc=verify_crc):
        if not features:
            yield {"record": payload}
            continue
        try:
            decoded = decode_example(payload)
        except struct.error as e:
            # a malformed packed section inside a CRC-valid record is
            # a writer bug, but it must still speak the readers'
            # corrupt-shard language (they catch ValueError — the
            # onCorrupt=fail|skip contract)
            raise ValueError(f"malformed Example payload: {e}") from e
        row: dict = {}
        for name, kind in features.items():
            got = decoded.get(name)
            values = got[1] if got else None
            if values:                  # empty/absent: any kind fits
                want = kind.replace("_list", "") + "_list"
                if got[0] != want:
                    # fail HERE with names, not later with an opaque
                    # Arrow type error inside the batch builder
                    raise ValueError(
                        f"feature {name!r} is {got[0].replace('_list', '')}"
                        f" in the file but was requested as {kind}")
            if kind.endswith("_list"):
                row[name] = None if values is None else values
            else:
                if values and len(values) > 1:
                    # TF's FixedLenFeature([]) raises here too —
                    # silently surfacing element 0 of an externally-
                    # produced multi-value feature would be data loss
                    raise ValueError(
                        f"feature {name!r} holds {len(values)} values "
                        f"but was requested as scalar kind {kind!r} — "
                        f"request '{kind}_list' instead")
                row[name] = values[0] if values else None
        yield row


def read_tfrecord(spark, path: str,
                  features: dict[str, str] | None = None,
                  on_corrupt: str = "fail",
                  on_corrupt_log_dir: str | None = None,
                  verify_crc: bool = True) -> DataFrame:
    """Distributed TFRecord reader — the inverse of write_tfrecord and
    the interop path for externally-produced TFRecord corpora. One
    task parses one shard file (binaryFile row). `on_corrupt` /
    `on_corrupt_log_dir` carry the exact webdataset contract: fail
    loudly by default, or drop the whole corrupt shard with a durable
    `.skipped` audit marker (sources/webdataset_source._record_skip)."""
    import pandas as pd

    if on_corrupt not in ("fail", "skip"):
        raise ValueError(
            f"on_corrupt must be 'fail' or 'skip', got {on_corrupt!r}")
    schema = schema_for(features)
    out_cols = columns_for(features)

    def parse(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                try:
                    rows = [
                        {"shard": os.path.basename(row["path"]), **r}
                        for r in rows_from_file(
                            bytes(row["content"]), features,
                            verify_crc=verify_crc)
                    ]
                except ValueError as e:
                    if on_corrupt == "skip":
                        from ..sources.webdataset_source import \
                            _record_skip

                        _record_skip(row["path"], e, on_corrupt_log_dir)
                        continue
                    raise ValueError(
                        f"corrupt TFRecord shard {row['path']}: {e} "
                        "(pass on_corrupt='skip' to drop corrupt "
                        "shards)") from e
                if rows:
                    yield pd.DataFrame(rows, columns=out_cols)

    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tfrecord").load(path)
        .select("path", "content")
        .mapInPandas(parse, schema)
    )
