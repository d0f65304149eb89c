"""Checks for the non-oracle analytics paths + catalog/query surface."""

from pyspark.sql import functions as F

from etl_zero_spark.catalog import load_table, register_views
from etl_zero_spark.plans.query import execute_query, save_as_golden
from etl_zero_spark.catalog import Warehouse
from tests.conftest import SF_SMOKE


def test_approx_count_distinct_rsd(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    exact = li.select(F.countDistinct("l_partkey").alias("n")).first().n
    approx = li.select(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("n")
    ).first().n
    assert abs(approx - exact) / exact < 0.1


def test_free_sql_surface(spark):
    register_views(spark, SF_SMOKE)
    out = execute_query(
        spark,
        "SELECT c_mktsegment, count(*) AS n FROM customer GROUP BY c_mktsegment",
    )
    assert out.count() == 5


def test_save_as_golden(spark, tmp_path):
    wh = Warehouse(str(tmp_path))
    df = spark.createDataFrame([(1, "a")], ["k", "v"])
    name = save_as_golden(df, wh.golden, name="golden_test")
    assert name == "golden_test"
    back = wh.golden.read(spark, "golden_test")
    assert back.count() == 1
    assert "golden_test" in wh.golden.list_tables()
