"""Local replica of the driver's t2 oracle check: run each declared query
in Spark AND its oracle SQL in DuckDB on the same parquet tables, then
compare row count, column names, and an order-insensitive value multiset.

Floats compare at FULL precision (`repr` of the exact double, no
rounding) since the round-6 audit: unrounded-emission queries
(ROUNDING.md) claim bit-identical IEEE values across engines, and a
tolerance here would hide exactly the ulp divergences that claim
forbids; rounded-emission queries are unaffected (two rounds that agree
decimally produce the identical nearest double). This is at least as
strict as any driver hash behavior — full-precision green implies green
under both a full-value hash and a rounded hash.
"""

from __future__ import annotations

import datetime as _dt
import math
from collections import Counter

import duckdb

from kafka_elasticsearch_injector_spark.io import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Full-precision repr: distinguishes IEEE -0.0 from +0.0 (the
        # driver's typed hash does too — round-3 q_stats_agg escape)
        # AND any last-ulp divergence an unrounded emission would leak
        # (round-6 audit: bit-identity is the claim, so the replica
        # must be able to falsify it).
        return repr(v)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, _dt.timedelta):
        return v.total_seconds()
    return v


def _multiset(rows, col_order):
    return Counter(tuple(_norm(row[i]) for i in col_order) for row in rows)


def compare(spark_df, con, sql: str, name: str = "?") -> list[str]:
    """Return a list of mismatch descriptions; empty list = match."""
    problems: list[str] = []
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_res = con.execute(sql)
    d_cols = [c[0] for c in d_res.description]
    d_rows = d_res.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"{name}: columns differ spark={s_cols} duck={d_cols}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"{name}: rowcount spark={len(s_rows)} duck={len(d_rows)}")

    s_order = [s_cols.index(c) for c in sorted(s_cols)]
    d_order = [d_cols.index(c) for c in sorted(d_cols)]
    sm, dm = _multiset(s_rows, s_order), _multiset(d_rows, d_order)
    if sm != dm:
        only_s = list((sm - dm).items())[:3]
        only_d = list((dm - sm).items())[:3]
        problems.append(
            f"{name}: value multiset differs; spark-only={only_s} duck-only={only_d}")
    return problems
