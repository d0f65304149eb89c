"""Differential testing vs the DuckDB oracle for every declared query
(SURVEY §5.2) — the local mirror of the driver's t2 gate."""

import pytest

from etl_zero_spark.plans.all_queries import QUERIES
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare, duckdb_connection


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF_ORACLE)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, con, name):
    spec = QUERIES[name]
    df = spec.fn(spark, SF_ORACLE)
    if spec.sql is None:
        assert df.count() >= 0  # rows-only check; semantics tested elsewhere
        return
    problems = compare(df, con, spec.sql)
    assert not problems, f"{name}: {problems}"
