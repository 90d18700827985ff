"""Sketch aggregates: the declared queries now certify their own error
bounds (exact value + Spark-computed within-bounds flag, oracle-checked
— see q_approx_distinct / q_approx_percentile), and these tests verify
both the certification flags and the underlying raw sketches against
independently computed exact answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_elasticsearch_injector_spark import plans
from kafka_elasticsearch_injector_spark.io import table


def test_approx_distinct_certified_and_within_rsd(spark, sf_dir):
    rows = plans.queries()["q_approx_distinct"](spark, sf_dir).collect()
    assert rows and all(r.within_bounds for r in rows)
    # the certified exact counts agree with an independent computation
    exact = {
        r.o_orderpriority: r.uniq
        for r in table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("uniq")).collect()
    }
    assert {r.o_orderpriority: r.exact_uniq_cust for r in rows} == exact
    # raw sketch independently bounded (rsd=0.02 → ≤5% at these counts)
    approx = {
        r.o_orderpriority: r.a
        for r in table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.approx_count_distinct("o_custkey", rsd=0.02).alias("a"))
        .collect()
    }
    for k, ex in exact.items():
        assert abs(approx[k] - ex) / ex <= 0.05, (k, approx[k], ex)


def test_approx_percentile_certified_and_rank_error(spark, sf_dir):
    rows = plans.queries()["q_approx_percentile"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.p50_within and r.p90_within and r.p99_within, r
    # raw sketch independently bounded: rank error ≤ 1e-4 → value error
    # bounded by the local quantile density; 2% relative is a generous
    # envelope at these accuracies.
    li = table(spark, sf_dir, "lineitem")
    approx = {
        r.l_returnflag: r.a
        for r in li.groupBy("l_returnflag")
        .agg(F.percentile_approx(
            "l_extendedprice", F.lit([0.5, 0.9, 0.99]), 10000).alias("a"))
        .collect()
    }
    exact = {
        r.l_returnflag: r.qs
        for r in li.groupBy("l_returnflag")
        .agg(F.expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))")
             .alias("qs")).collect()
    }
    assert set(approx) == set(exact)
    for k in exact:
        for a, e in zip(approx[k], exact[k]):
            assert abs(a - e) / e <= 0.02, (k, a, e)
