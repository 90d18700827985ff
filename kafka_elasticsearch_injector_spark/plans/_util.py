"""Shared determinism helpers for the declared query inventory.

Cross-engine float discipline (SURVEY.md §7 risks): double-typed money
columns are cast to DECIMAL before aggregation so sums are exact and
order-independent; the final cast back to DOUBLE is then bit-identical in
Spark and DuckDB. Raw double passthrough (no arithmetic) is also safe.
Avoid: summing raw doubles (accumulation order differs), libm functions
whose last-ulp differs across runtimes (ln/exp) — sqrt is IEEE-exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: str | Column, precision: int = 18, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def as_double6(c: Column) -> Column:
    """Exact decimal → double, rounded to 6 for hash stability."""
    return F.round(c.cast("double"), 6)
