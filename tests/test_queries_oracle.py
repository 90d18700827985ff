"""t2 rehearsal: every declared query with an oracle must hash-match DuckDB
on the local test scale factor. This is the same gate the driver runs at
sf0.01 (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

from kafka_elasticsearch_injector_spark.plans import QUERIES, queries

from .oracle import compare, duck_connection

ALL = list(queries().keys())


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(name, spark, sf_dir, duck):
    qd = QUERIES[name]
    df = qd.spark(spark, sf_dir)
    if qd.oracle is None:
        assert df.count() >= 0  # rows-only check, mirroring the driver
        return
    problems = compare(df, duck, qd.oracle, name)
    assert not problems, "\n".join(problems)


def test_ts_similarity_absent_probe_user_yields_no_rows(spark, sf_dir, tmp_path):
    # Oracle parity at the edge: when user_id 0 has no events, the
    # oracle's probe CTE is empty and it returns ZERO rows — the Spark
    # plan must not synthesize a 30-day zero-vector probe instead.
    import duckdb

    from kafka_elasticsearch_injector_spark.io import table

    no_u0 = str(tmp_path)
    (table(spark, sf_dir, "events").filter("user_id <> 0")
     .coalesce(1).write.parquet(str(tmp_path / "events.parquet")))

    assert QUERIES["q_ts_similarity"].spark(spark, no_u0).count() == 0

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{no_u0}/events.parquet/*.parquet')")
    assert len(con.execute(QUERIES["q_ts_similarity"].oracle).fetchall()) == 0
    con.close()


def test_ts_similarity_out_of_window_probe_user_matches_oracle(
        spark, sf_dir, tmp_path):
    # Oracle parity at the other edge: user 0 EXISTS but every one of
    # its events falls outside days 0..29 (shifted +60 days). The
    # oracle's users CTE has no day-range filter, so it still builds a
    # 30-row zero-filled probe and returns the top-5; an existence
    # guard that only sees in-window user-0 days would wrongly return
    # zero rows here.
    import duckdb

    from kafka_elasticsearch_injector_spark.io import table
    from pyspark.sql import functions as F

    ev = table(spark, sf_dir, "events")
    shifted = ev.withColumn(
        "ts", F.when(F.col("user_id") == 0,
                     F.col("ts") + F.expr("INTERVAL 60 DAYS"))
        .otherwise(F.col("ts")))
    root = str(tmp_path)
    shifted.coalesce(1).write.parquet(str(tmp_path / "events.parquet"))

    sdf = QUERIES["q_ts_similarity"].spark(spark, root)
    s_rows = sorted(tuple(r) for r in sdf.collect())

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{root}/events.parquet/*.parquet')")
    d_rows = sorted(tuple(r) for r in
                    con.execute(QUERIES["q_ts_similarity"].oracle).fetchall())
    con.close()
    assert len(s_rows) == 5
    assert s_rows == d_rows


@pytest.mark.parametrize("name", ["q_tpch_q2", "q_tpch_q21"])
def test_limited_topk_is_partition_invariant(name, spark, sf_dir):
    # The two new LIMIT-carrying TPC-H completions claim total-order
    # tie-break chains; prove the limited SET does not depend on the
    # physical partitioning (a dropped tie-break key would pass the
    # oracle compare by luck on one layout and fail on another).
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        a = sorted(tuple(r) for r in
                   QUERIES[name].spark(spark, sf_dir).collect())
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        b = sorted(tuple(r) for r in
                   QUERIES[name].spark(spark, sf_dir).collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b


def test_compare_detects_each_mismatch_class(spark, duck):
    """Meta-test of the replica itself: compare() must FLAG each
    mismatch class it exists to catch — a silently-lenient comparator
    would green-light the whole inventory. Classes mirror the driver's
    recorded escapes: value, row-count, column-name, and IEEE signed
    zero (the round-3 q_stats_agg escape)."""
    df = spark.createDataFrame([(1, "a")], "id LONG, s STRING")
    assert compare(df, duck, "SELECT CAST(1 AS BIGINT) AS id, 'a' AS s") == []
    assert compare(df, duck, "SELECT CAST(2 AS BIGINT) AS id, 'a' AS s")
    assert compare(df, duck,
                   "SELECT CAST(1 AS BIGINT) AS id, 'a' AS s UNION ALL "
                   "SELECT CAST(1 AS BIGINT), 'b'")
    assert compare(df, duck, "SELECT CAST(1 AS BIGINT) AS id, 'a' AS other")
    zdf = spark.createDataFrame([(0.0,)], "x DOUBLE")
    assert compare(zdf, duck, "SELECT 0.0::DOUBLE AS x") == []
    assert compare(zdf, duck, "SELECT -0.0::DOUBLE AS x"), \
        "signed zero must mismatch (+0.0 vs -0.0)"
