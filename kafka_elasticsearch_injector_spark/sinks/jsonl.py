"""Deterministic JSONL.gz shard export.

The third training-corpus interchange convention (besides the parquet
shards in sinks/dataset.py and the WebDataset tars in webdataset.py):
`shard-NNNNN.jsonl.gz` files of one JSON object per line — the format
public corpora (C4/Dolma-style releases, HF dataset dumps) ship in.
Nothing in the reference corresponds (its terminal store is an
order-free ES bulk sink, src/elasticsearch/elasticsearch.go:60-124);
this exists for corpus interchange.

Spark-first shape, mirroring the tar writer:
- shard = pmod(xxhash64(id), n): a pure function of the id, never
  round-robin/rand — re-runs and retries cannot move a row;
- ONE shuffle (groupBy shard); each shard's file is written by exactly
  one task via applyInPandas;
- byte determinism: rows sorted by id, JSON keys sorted, compact
  separators, gzip mtime pinned to 0 (gzip embeds a timestamp —
  unpinned it breaks reproducibility even for identical payloads);
- atomic staged publication + sha256 manifest via sinks/_staging.py.

Read-back needs NO custom code: `spark.read.schema(ddl).json(path)`
decompresses and parses natively with full schema projection — which
is also why this format beats tars for anything analytic, while tars
beat it for binary members.

At 100 TB: size n_shards so one shard's rows fit one task's memory
(same bound as the tar writer); parallelism = shard count.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import json

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

from ._staging import staged_publish, write_shard_file
# Scalar null test safe on containers; shared with the tar writer
# (None / pd.NaT / float NaN — see _staging.is_null_scalar).
from ._staging import is_null_scalar as _is_null
from .webdataset import with_hash_shard

MANIFEST_SCHEMA = ("shard int, file string, n_rows long, n_bytes long, "
                   "sha256 string")

# Companion null-mask columns (see _mask_expr) ride next to the data
# columns through the shard shuffle under this reserved prefix.
_MASK_PREFIX = "__jsonlmask__"

_FLOAT_TYPES = (T.FloatType, T.DoubleType)


def _null_test_for(dtype):
    """Null test for a value INSIDE a container, driven by the value's
    DECLARED type. For float/double values a NaN is a genuine VALUE —
    the writer must emit the faithful NaN token — so only None/NaT
    mean null there (inside maps and structs, Arrow→pandas preserves
    scalar-float None as None, so this is lossless; float ARRAY
    elements are the lossy lane and are restored via the null masks —
    see _mask_expr). For every other type a float NaN can only be
    Arrow→pandas's encoding of a null hole (e.g. an `array<int>` with
    null elements arrives as a float64 ndarray with NaN), so the full
    `_is_null` fold applies. Top-level scalar float/double columns are
    the one lane where the distinction stays unrecoverable (a nullable
    float64 Series encodes null AS NaN, and a scalar column has no
    mask), hence `_jsonl_gz_bytes` keeps the NaN→null fold there —
    see the _converter docstring."""
    if isinstance(dtype, _FLOAT_TYPES):
        return lambda v: v is None or v is pd.NaT
    return _is_null


def _needs_mask(dtype) -> bool:
    """Does this type contain a float/double ARRAY lane anywhere?
    Those are the lossy Arrow→pandas lanes: a `list<double>` arrives
    as a float64 ndarray where a null element and a genuine NaN are
    the same bits. Scalar floats inside maps/structs arrive as real
    None and need no mask (verified on Spark 4.1.2 / pyarrow)."""
    if isinstance(dtype, T.ArrayType):
        return (isinstance(dtype.elementType, _FLOAT_TYPES)
                or _needs_mask(dtype.elementType))
    if isinstance(dtype, T.MapType):
        return _needs_mask(dtype.valueType)
    if isinstance(dtype, T.StructType):
        return any(_needs_mask(f.dataType) for f in dtype.fields)
    return False


def _mask_expr(dtype, col: Column) -> Column:
    """JVM-side companion expression mirroring `col`'s shape with
    every float-array element replaced by its null-ness boolean:
    array<double> → array<boolean>, struct fields only where needed,
    map lanes as an entry list array<struct<k,m>> (NOT a rebuilt map —
    map_from_arrays throws on duplicate keys, which foreign parquet /
    from_json data can legally carry; an entry list tolerates them and
    last-wins in the writer exactly like the value dict does). The
    writer walks value and mask in parallel (_masked_converter) to
    restore exactly which NaNs were nulls — pure column transforms,
    no UDFs, negligible next to the gzip work."""
    if isinstance(dtype, T.ArrayType):
        if isinstance(dtype.elementType, _FLOAT_TYPES):
            return F.transform(col, lambda x: x.isNull())
        return F.transform(
            col, lambda x: _mask_expr(dtype.elementType, x))
    if isinstance(dtype, T.MapType):
        return F.transform(
            F.map_entries(col),
            lambda e: F.struct(
                e.getField("key").alias("k"),
                _mask_expr(dtype.valueType,
                           e.getField("value")).alias("m")))
    if isinstance(dtype, T.StructType):
        return F.struct(*[
            _mask_expr(f.dataType, col.getField(f.name)).alias(f.name)
            for f in dtype.fields if _needs_mask(f.dataType)])
    raise AssertionError(f"no mask lane in {dtype.simpleString()}")


def _converter(dtype):
    """Spark DataType → (value → JSON-representable) converter.

    Driven by the DECLARED schema, not the observed pandas dtype:
    Arrow→pandas floats any nullable integer lane (top-level column OR
    array element), hands timestamps over as pd.Timestamp, and maps
    map/struct values to dicts — none of which json.dumps can be
    trusted with unaided. Exact round-trip contract per type:
    integral → JSON int; float/double → JSON number. Non-finite
    floats: INSIDE arrays/maps/structs, NaN and Infinity are values
    and emit the faithful NaN/Infinity tokens, which `spark.read.json`
    (allowNonNumericNumbers=true, verified on Spark 4.1.2) parses back
    to NaN/Infinity at every nesting level — strict-JSON consumers
    should null non-finite upstream. Null ELEMENTS of float/double
    arrays still serialize as null, not NaN: Arrow→pandas folds them
    into NaN indistinguishably, so the writer ships a JVM-computed
    null-mask companion per float-array lane (_mask_expr) and restores
    them (_masked_converter). The ONE lossy lane left is a TOP-LEVEL
    scalar float/double column: Infinity emits its token, but NaN
    serializes as JSON null — a scalar column has no mask and its
    float64 Series encodes null AS NaN, so the writer folds to null
    rather than invent NaNs for genuinely missing values.
    boolean → true/false; string → string;
    timestamp/timestamp_ntz → naive ISO-8601 in the session timezone
    (micros preserved; Spark's JSON reader parses it back bit-exactly);
    date → ISO date; array/map/struct → recursively converted JSON
    array/object (map keys must be strings — JSON objects have no
    other key type). Binary and decimal are rejected at plan time:
    binary belongs in the WebDataset export, and JSON has no exact
    decimal representation."""
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType,
                          T.LongType)):
        return lambda v: int(v)
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        return lambda v: float(v)
    if isinstance(dtype, T.BooleanType):
        return lambda v: bool(v)
    if isinstance(dtype, T.StringType):
        return lambda v: str(v)
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return lambda v: pd.Timestamp(v).isoformat()
    if isinstance(dtype, T.DateType):
        return lambda v: (v.date() if isinstance(v, pd.Timestamp)
                          else v).isoformat()
    if isinstance(dtype, T.ArrayType):
        elem = _converter(dtype.elementType)
        isnull = _null_test_for(dtype.elementType)

        def conv_array(v):
            return [None if isnull(x) else elem(x) for x in _tolist(v)]
        return conv_array
    if isinstance(dtype, T.MapType) and isinstance(dtype.keyType,
                                                   T.StringType):
        val = _converter(dtype.valueType)
        isnull = _null_test_for(dtype.valueType)

        def conv_map(v):
            items = v.items() if isinstance(v, dict) else v
            return {str(k): (None if isnull(x) else val(x))
                    for k, x in items}
        return conv_map
    if isinstance(dtype, T.StructType):
        fields = [(f.name, _converter(f.dataType),
                   _null_test_for(f.dataType)) for f in dtype.fields]

        def conv_struct(v):
            d = v if isinstance(v, dict) else v.asDict()
            return {n: (None if isnull(d.get(n)) else c(d.get(n)))
                    for n, c, isnull in fields}
        return conv_struct
    raise TypeError(
        f"JSONL export cannot represent {dtype.simpleString()} exactly "
        "(binary belongs in the WebDataset export; decimal has no "
        "exact JSON form; map keys must be strings)")


def _tolist(v):
    return v.tolist() if isinstance(v, np.ndarray) else v


def _masked_converter(dtype):
    """Like _converter but (value, mask) → JSON-representable, where
    `mask` is the parallel null-mask from _mask_expr. Only built for
    types where _needs_mask is True; sub-lanes without a float array
    fall back to the plain converter (their nulls are already
    faithful)."""
    if isinstance(dtype, T.ArrayType):
        if isinstance(dtype.elementType, _FLOAT_TYPES):
            def conv_farray(v, m):
                return [None if (mi or x is None) else float(x)
                        for x, mi in zip(_tolist(v), _tolist(m))]
            return conv_farray
        elem = _masked_converter(dtype.elementType)

        def conv_array(v, m):
            # non-float elements that are null arrive as real None
            return [None if x is None else elem(x, mi)
                    for x, mi in zip(_tolist(v), _tolist(m))]
        return conv_array
    if isinstance(dtype, T.MapType):
        val = _masked_converter(dtype.valueType)
        # Duplicate map keys collapse last-wins in the pandas value
        # dict; building the mask lookup from the entry list with the
        # same last-wins rule keeps the two aligned. The unmasked
        # fallback can only fire if a mask entry is missing entirely
        # (it preserves NaN-as-value, the pre-mask contract) — better
        # than an executor-side TypeError.
        plain = _converter(dtype.valueType)

        def conv_map(v, m):
            md = {}
            for e in _tolist(m):
                d = e if isinstance(e, dict) else e.asDict()
                md[d["k"]] = d["m"]
            items = v.items() if isinstance(v, dict) else v
            return {str(k): (None if x is None
                             else val(x, md[k]) if md.get(k) is not None
                             else plain(x))
                    for k, x in items}
        return conv_map
    if isinstance(dtype, T.StructType):
        fields = []
        for f in dtype.fields:
            if _needs_mask(f.dataType):
                fields.append((f.name, _masked_converter(f.dataType),
                               None, True))
            else:
                fields.append((f.name, _converter(f.dataType),
                               _null_test_for(f.dataType), False))

        def conv_struct(v, m):
            d = v if isinstance(v, dict) else v.asDict()
            md = m if isinstance(m, dict) else m.asDict()
            out = {}
            for n, c, isnull, masked in fields:
                x = d.get(n)
                if masked:
                    out[n] = None if x is None else c(x, md.get(n))
                else:
                    out[n] = None if isnull(x) else c(x)
            return out
        return conv_struct
    raise AssertionError(f"no mask lane in {dtype.simpleString()}")


def _jsonl_gz_bytes(rows: pd.DataFrame, columns: list[str],
                    converters: dict, masked: dict | None = None) -> bytes:
    buf = io.BytesIO()
    # mtime=0: gzip's header timestamp is the one nondeterminism source
    # for identical payloads.
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        # Per-column access: iterrows() materializes each row as a
        # Series coerced to ONE common dtype, so an all-numeric frame
        # with any float column turns integer ids into np.float64 and
        # serializes doc_id=5 as 5.0 — silent corruption for a typed
        # read-back. Series.tolist() keeps every value its own
        # column's native Python type; the schema-driven converters
        # then restore what Arrow→pandas mangled (see _converter).
        masked = masked or {}
        col_values = [rows[c].tolist() for c in columns]
        mask_values = [rows[_MASK_PREFIX + c].tolist()
                       if c in masked else None for c in columns]
        convs = [(masked.get(c) or converters[c], c in masked)
                 for c in columns]
        for i in range(len(rows)):
            obj = {}
            for c, (conv, is_masked), vals, ms in zip(
                    columns, convs, col_values, mask_values):
                v = vals[i]
                if _is_null(v):
                    obj[c] = None
                elif is_masked:
                    obj[c] = conv(v, ms[i])
                else:
                    obj[c] = conv(v)
            gz.write(json.dumps(obj, sort_keys=True, ensure_ascii=False,
                                separators=(",", ":"))
                     .encode("utf-8"))
            gz.write(b"\n")
    return buf.getvalue()


def write_jsonl_shards(df: DataFrame, path: str, n_shards: int,
                       id_col: str = "doc_id",
                       columns: list[str] | None = None,
                       allow_empty: bool = False) -> DataFrame:
    """Export `df` as gzip JSONL shards at `path`; returns the
    per-shard manifest DataFrame (MANIFEST_SCHEMA).

    `columns` selects and orders the exported fields (default: every
    column of `df`); `id_col` must be included or includable — it
    drives both shard assignment and the in-file row order. Exportable
    types: integral, float/double, boolean, string, timestamp[_ntz],
    date, and arrays/string-keyed maps/structs thereof — conversion is
    driven by the declared Spark schema (see _converter) so nullable
    integers, embeddings (`array<double>`), token lists, and event
    timestamps all round-trip exactly through
    `spark.read.schema(ddl).json(path)`. Binary and decimal columns
    are rejected at plan time; binary belongs in the WebDataset
    export.

    The export executes INSIDE this call with atomic staged
    publication — a crash leaves the previous export intact. Requires
    a driver/executor-shared filesystem (see sinks/_staging.py).
    """
    columns = list(columns or df.columns)
    cols = list(dict.fromkeys([id_col, *columns]))
    if any(c.startswith(_MASK_PREFIX) for c in cols):
        raise ValueError(f"column names may not start with {_MASK_PREFIX}"
                         " (reserved for the writer's null masks)")
    # Build converters at PLAN time: an unrepresentable column type
    # fails here with a clear TypeError, not per-task on the executors.
    converters = {f.name: _converter(f.dataType)
                  for f in df.schema.fields if f.name in columns}
    # Null-mask companions for every float-array lane (see _mask_expr):
    # Arrow→pandas folds a null list<float/double> element into NaN, so
    # without these the writer could not tell an exported embedding's
    # genuine NaN from a missing value.
    masked = {f.name: _masked_converter(f.dataType)
              for f in df.schema.fields
              if f.name in columns and _needs_mask(f.dataType)}
    mask_exprs = [_mask_expr(df.schema[c].dataType, F.col(c))
                  .alias(_MASK_PREFIX + c) for c in masked]

    def run(staging: str) -> list:
        def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
            shard = int(pdf["shard"].iloc[0])
            fname = f"shard-{shard:05d}.jsonl.gz"
            ordered = pdf.sort_values(id_col, kind="mergesort")
            data = _jsonl_gz_bytes(ordered, columns, converters, masked)
            write_shard_file(staging, fname, data)
            return pd.DataFrame([{
                "shard": shard, "file": fname, "n_rows": len(ordered),
                "n_bytes": len(data),
                "sha256": hashlib.sha256(data).hexdigest(),
            }])

        sharded = with_hash_shard(df.select(*cols, *mask_exprs),
                                  n_shards, id_col)
        return (sharded.groupBy("shard")
                .applyInPandas(write_shard, MANIFEST_SCHEMA)
                .collect())                     # executes the export

    # manifest=True: the integrity record (atomic, deterministic,
    # invisible to Spark readers — see sinks/integrity.py) is renamed
    # into place as the swap's final step.
    rows = staged_publish(path, ".jsonl.gz", run, allow_empty=allow_empty,
                          manifest=True)
    return df.sparkSession.createDataFrame(rows, MANIFEST_SCHEMA)
