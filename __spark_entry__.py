"""Driver contract for the spark-graft builder (PySpark target).

entry(spark) runs the flagship query (TPC-H-Q1-shaped q_agg_hash) on
sf0.001; queries()/oracle_sql() expose the full declared inventory from
kafka_elasticsearch_injector_spark.plans (SURVEY.md §2.3).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kafka_elasticsearch_injector_spark import plans

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return plans.queries()["q_agg_hash"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return plans.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query. Every declared query has one:
    the driver has no rows-only mode — an omitted key is a permanent
    `err:no_oracle` red row (observed rounds 1-3), so sketch/kernel
    queries are made oracle-checkable instead (exact value + Spark-side
    within-bounds flags; integer-exact kernel projections)."""
    return plans.oracle_sql()
