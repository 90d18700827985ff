"""Sketch aggregates have no cross-engine oracle; bound them against the
exact answer instead (q_approx_distinct's rsd=0.02 → assert ≤5%)."""

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


def test_approx_percentile_rank_error(spark, sf_dir):
    approx = {
        r.l_returnflag: r.price_q
        for r in plans.queries()["q_approx_percentile"](spark, sf_dir).collect()
    }
    li = table(spark, sf_dir, "lineitem")
    exact = {
        r.l_returnflag: r.qs
        for r in li.groupBy("l_returnflag")
        .agg(F.expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))")
             .alias("qs")).collect()
    }
    assert set(approx) == set(exact)
    # rank error ≤ 1e-4 → value error bounded by the local quantile
    # density; 2% relative is a generous envelope at these accuracies.
    for k in exact:
        for a, e in zip(approx[k], exact[k]):
            assert abs(a - e) / e <= 0.02, (k, a, e)
