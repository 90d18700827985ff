"""Sketch aggregates have no cross-engine oracle; bound them against the
exact answer instead (q_approx_distinct's rsd=0.01 → assert ≤5%)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_elasticsearch_injector_spark import plans
from kafka_elasticsearch_injector_spark.io import table


def test_approx_distinct_within_rsd(spark, sf_dir):
    approx = {
        r.o_orderpriority: r.approx_uniq_cust
        for r in plans.queries()["q_approx_distinct"](spark, sf_dir).collect()
    }
    exact = {
        r.o_orderpriority: r.uniq
        for r in table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("uniq")).collect()
    }
    assert set(approx) == set(exact)
    for k, ex in exact.items():
        assert abs(approx[k] - ex) / ex <= 0.05, (k, approx[k], ex)
