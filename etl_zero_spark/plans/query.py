"""Free-SQL query surface + save-as-golden (operators Q1, Q3, O1).

The reference ships user SQL strings to MySQL
(ETL_Pipeline_Entire/front_end.py:215-225) and saves results to
``golden_db`` (front_end.py:668-697, auto-named
``golden_{yyyymmdd_hhmm}``). Here the same surface is ``spark.sql``
over registered views — Catalyst parses/optimizes/executes, and the
save is a distributed parquet write into the golden zone.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession

from etl_zero_spark.catalog import Zone, register_views


def execute_query(spark: SparkSession, sql: str) -> DataFrame:
    """Q1: arbitrary SELECT over the registered zone views
    (front_end.py:215-225). The entire MySQL SELECT surface the
    reference delegates arrives here via Spark SQL."""
    return spark.sql(sql)


def save_as_golden(
    df: DataFrame, golden: Zone, name: str | None = None, now: datetime | None = None
) -> str:
    """Q3: persist a query result into the golden zone
    (front_end.py:668-697). Auto-name matches the reference's
    ``golden_{yyyymmdd_hhmm}`` pattern."""
    if name is None:
        stamp = (now or datetime.now()).strftime("%Y%m%d_%H%M")
        name = f"golden_{stamp}"
    golden.write(df, name, mode="overwrite")
    return name


def open_query_surface(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> dict[str, DataFrame]:
    """Register every zone table as a view so ``spark.sql`` sees the
    same namespace the reference exposes to its query page."""
    return register_views(spark, sf_dir, tables)
