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

import pandas as pd
from pyspark.sql import DataFrame

from ._staging import staged_publish, write_shard_file
from .webdataset import with_hash_shard

MANIFEST_SCHEMA = "shard int, n_rows long, n_bytes long, sha256 string"


def _json_default(v):
    """numpy scalars → native JSON types (pandas hands us np.int64 &c)."""
    import numpy as np

    if isinstance(v, np.bool_):
        return bool(v)
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, np.floating):
        return float(v)
    raise TypeError(f"not JSON-serializable: {type(v).__name__}")


def _jsonl_gz_bytes(rows: pd.DataFrame, columns: list[str],
                    int_cols: frozenset[str] = frozenset()) -> bytes:
    buf = io.BytesIO()
    # mtime=0: gzip's header timestamp is the one nondeterminism source
    # for identical payloads.
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        # Per-column access: iterrows() materializes each row as a
        # Series coerced to ONE common dtype, so an all-numeric frame
        # with any float column turns integer ids into np.float64 and
        # serializes doc_id=5 as 5.0 — silent corruption for a typed
        # read-back. Series.tolist() keeps every value its own
        # column's native Python type — EXCEPT that Arrow→pandas turns
        # a NULLABLE integer column into NaN-backed float64 before we
        # ever see it, so Spark-schema-declared integer columns
        # (int_cols) are re-coerced with int() per value.
        col_values = [rows[c].tolist() for c in columns]
        for vals in zip(*col_values):
            obj = {c: (None if pd.isna(v)
                       else int(v) if c in int_cols else v)
                   for c, v in zip(columns, vals)}
            gz.write(json.dumps(obj, sort_keys=True, ensure_ascii=False,
                                separators=(",", ":"),
                                default=_json_default).encode("utf-8"))
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
    drives both shard assignment and the in-file row order. Values
    must be JSON-representable (strings, numbers, booleans, nulls);
    binary columns belong in the WebDataset export instead.

    The export executes INSIDE this call with atomic staged
    publication — a crash leaves the previous export intact. Requires
    a driver/executor-shared filesystem (see sinks/_staging.py).
    """
    columns = list(columns or df.columns)
    cols = list(dict.fromkeys([id_col, *columns]))
    int_cols = frozenset(
        f.name for f in df.schema.fields
        if f.dataType.simpleString() in
        ("tinyint", "smallint", "int", "bigint"))

    def run(staging: str) -> list:
        def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
            shard = int(pdf["shard"].iloc[0])
            ordered = pdf.sort_values(id_col, kind="mergesort")
            data = _jsonl_gz_bytes(ordered, columns, int_cols)
            write_shard_file(staging, f"shard-{shard:05d}.jsonl.gz", data)
            return pd.DataFrame([{
                "shard": shard, "n_rows": len(ordered),
                "n_bytes": len(data),
                "sha256": hashlib.sha256(data).hexdigest(),
            }])

        sharded = with_hash_shard(df.select(*cols), n_shards, id_col)
        return (sharded.groupBy("shard")
                .applyInPandas(write_shard, MANIFEST_SCHEMA)
                .collect())                     # executes the export

    rows = staged_publish(path, ".jsonl.gz", run, allow_empty=allow_empty)
    return df.sparkSession.createDataFrame(rows, MANIFEST_SCHEMA)
