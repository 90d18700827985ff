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
