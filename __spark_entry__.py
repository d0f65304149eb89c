"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

The real registry lives in ``etl_zero_spark/plans/registry.py`` (and
the north-star modules registered there); this file stays a thin
adapter so bench.py and tests share the same query set.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _registry():
    # Import side effect: decorators populate QUERIES.
    from etl_zero_spark.plans.all_queries import QUERIES

    return QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from etl_zero_spark.session import apply_runtime_confs

    apply_runtime_confs(spark)
    q = _registry()["q1_pricing_summary"]
    return q.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in _registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; omitted for non-SQL-expressible
    ops (driver records a weaker rows-only check for those)."""
    return {
        name: spec.sql.strip()
        for name, spec in _registry().items()
        if spec.sql is not None
    }
