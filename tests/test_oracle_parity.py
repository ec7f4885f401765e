"""Runs every registered query with a DuckDB oracle through the local
replica of the driver's t2 compare at sf0.01."""

import pytest

from tests.oracle_harness import compare


def _pairs():
    from collective_als_spark.registry import oracle_queries, spark_queries

    q = spark_queries()
    o = oracle_queries()
    return [(name, q[name], sql) for name, sql in o.items()]


@pytest.mark.parametrize("name,fn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_oracle_parity(spark, sf_med, name, fn, sql):
    r = compare(spark, sf_med, name, fn, sql)
    assert r["rows_spark"] == r["rows_duck"], r
    assert r["cols_match"], r
    assert r["hash_match"], r
