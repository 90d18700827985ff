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
  one task via applyInArrow;
- byte determinism: rows sorted by id, JSON keys sorted, compact
  separators, gzip mtime pinned to 0 (gzip embeds a timestamp —
  unpinned it breaks reproducibility even for identical payloads);
- atomic staged publication + sha256 manifest via sinks/_staging.py.

The writer kernel is applyInARROW, not applyInPandas, and that is a
correctness decision, not a style one: Arrow arrays carry validity
bitmaps separate from the values, so `to_pylist()` hands every lane
over losslessly — int64 stays exact past 2⁵³ next to null siblings,
and a float NaN is distinguishable from a null hole at EVERY nesting
level. The pandas path floats any nullable integer lane (silently
rounding >2⁵³ values — a data-corruption bug shipped in round 7) and
folds null float-array elements into NaN, which forced a JVM-side
null-mask companion mechanism this writer no longer needs.

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

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ._staging import staged_publish, write_shard_file
from .webdataset import with_hash_shard

MANIFEST_SCHEMA = ("shard int, file string, n_rows long, n_bytes long, "
                   "sha256 string")

_MANIFEST_ARROW = pa.schema([
    ("shard", pa.int32()), ("file", pa.string()), ("n_rows", pa.int64()),
    ("n_bytes", pa.int64()), ("sha256", pa.string()),
])


def _converter(dtype):
    """Spark DataType → (non-null pyarrow `to_pylist` value → JSON-
    representable) converter, driven by the DECLARED schema.

    Arrow's to_pylist is already faithful — Python int for integral
    (exact at any magnitude), float for float/double (NaN is a VALUE,
    null is None), datetime for timestamps, list-of-(key, value)
    tuples for maps (duplicate keys survive; the dict build below is
    last-wins), dict for structs — so conversion is mostly ISO
    formatting plus recursion. Exact round-trip contract per type:
    integral → JSON int; float/double → JSON number, with non-finite
    values emitting the faithful NaN/Infinity/-Infinity tokens at
    every level INCLUDING top-level scalars (spark.read.json parses
    them back bit-exactly at every nesting level,
    allowNonNumericNumbers=true, verified on Spark 4.1.2 — strict-JSON
    consumers should null non-finite upstream);
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
        # Arrow hands session-tz-aware datetimes for TIMESTAMP and
        # naive ones for TIMESTAMP_NTZ; both serialize as naive
        # session-local ISO — the form the JSON reader round-trips.
        return lambda v: v.replace(tzinfo=None).isoformat()
    if isinstance(dtype, T.DateType):
        return lambda v: v.isoformat()
    if isinstance(dtype, T.ArrayType):
        elem = _converter(dtype.elementType)

        def conv_array(v):
            return [None if x is None else elem(x) for x in v]
        return conv_array
    if isinstance(dtype, T.MapType) and isinstance(dtype.keyType,
                                                   T.StringType):
        val = _converter(dtype.valueType)

        def conv_map(v):
            items = v.items() if isinstance(v, dict) else v
            return {str(k): (None if x is None else val(x))
                    for k, x in items}
        return conv_map
    if isinstance(dtype, T.StructType):
        fields = [(f.name, _converter(f.dataType)) for f in dtype.fields]

        def conv_struct(v):
            return {n: (None if v.get(n) is None else c(v.get(n)))
                    for n, c in fields}
        return conv_struct
    raise TypeError(
        f"JSONL export cannot represent {dtype.simpleString()} exactly "
        "(binary belongs in the WebDataset export; decimal has no "
        "exact JSON form; map keys must be strings)")


def _jsonl_gz_bytes(table: pa.Table, columns: list[str],
                    converters: dict) -> bytes:
    buf = io.BytesIO()
    # mtime=0: gzip's header timestamp is the one nondeterminism source
    # for identical payloads.
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        col_values = [table.column(c).to_pylist() for c in columns]
        convs = [converters[c] for c in columns]
        for i in range(table.num_rows):
            obj = {c: (None if vals[i] is None else conv(vals[i]))
                   for c, conv, vals in zip(columns, convs, col_values)}
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
    if "shard" in cols:
        raise ValueError(
            "column name 'shard' is reserved: the writer's hash-shard "
            "assignment would silently overwrite it (rename the column "
            "before exporting)")
    # Build converters at PLAN time: an unrepresentable column type
    # fails here with a clear TypeError, not per-task on the executors.
    converters = {f.name: _converter(f.dataType)
                  for f in df.schema.fields if f.name in columns}

    def run(staging: str) -> list:
        def write_shard(table: pa.Table) -> pa.Table:
            shard = table.column("shard")[0].as_py()
            fname = f"shard-{shard:05d}.jsonl.gz"
            # Arrow's sort_indices is a stable sort — duplicate ids
            # keep their incoming order, same as the old mergesort.
            ordered = table.sort_by([(id_col, "ascending")])
            data = _jsonl_gz_bytes(ordered, columns, converters)
            write_shard_file(staging, fname, data)
            return pa.table({
                "shard": [shard], "file": [fname],
                "n_rows": [table.num_rows], "n_bytes": [len(data)],
                "sha256": [hashlib.sha256(data).hexdigest()],
            }, schema=_MANIFEST_ARROW)

        sharded = with_hash_shard(df.select(*cols), n_shards, id_col)
        return (sharded.groupBy("shard")
                .applyInArrow(write_shard, MANIFEST_SCHEMA)
                .collect())                     # executes the export

    # manifest=True: the integrity record (atomic, deterministic,
    # invisible to Spark readers — see sinks/integrity.py) is renamed
    # into place as the swap's final step.
    rows = staged_publish(path, ".jsonl.gz", run, allow_empty=allow_empty,
                          manifest=True)
    return df.sparkSession.createDataFrame(rows, MANIFEST_SCHEMA)
