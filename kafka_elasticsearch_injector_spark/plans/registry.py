"""Declared query inventory: the t2 contract.

Every operator claimed in SURVEY.md §2 is declared here as a `QueryDef`:
a PySpark plan builder plus (when SQL-expressible) the equivalent DuckDB
oracle SQL. The driver runs both sides at sf0.01 and hash-compares.

Determinism discipline (BASELINE.md):
- float outputs rounded to 6 decimals on BOTH sides;
- money sums routed through DECIMAL(18,2) so the aggregate is exact and
  the final double cast is bit-identical across engines;
- every sort/top-k carries a unique tie-break key;
- column names alias-matched between Spark and oracle.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    """One declared query: Spark plan + DuckDB oracle (None → rows-only check)."""

    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


QUERIES: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: add a (spark_fn, oracle_sql) pair to the inventory."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = QueryDef(spark=fn, oracle=oracle, doc=doc)
        return fn

    return wrap


def _load_all() -> None:
    # Import for side effects: each module registers its queries.
    from . import part_a, part_b, part_b_ext, part_b_ext2, part_c  # noqa: F401


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: qd.spark for name, qd in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: qd.oracle for name, qd in QUERIES.items() if qd.oracle is not None}
