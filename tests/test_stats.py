"""ANALYZE-style column statistics (operators/stats.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_zero_spark.catalog import load_table
from etl_zero_spark.operators.stats import analyze


def test_report_values_vs_direct(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    rep = {r.column: r for r in analyze(cust).collect()}
    n = cust.count()
    assert set(rep) == set(cust.columns)
    r = rep["c_acctbal"]
    assert r.n_rows == n and r.n_nulls == 0 and r.null_fraction == 0.0
    lo, hi = cust.agg(F.min("c_acctbal"), F.max("c_acctbal")).collect()[0]
    assert float(r.min_value) == lo and float(r.max_value) == hi
    assert r.avg_length is None  # numeric column: no string length
    exact = cust.select("c_acctbal").distinct().count()
    assert abs(r.approx_ndv - exact) / exact < 0.05
    s = rep["c_mktsegment"]
    assert s.approx_ndv == 5  # 5 TPC-H segments (HLL exact at tiny ndv)
    want_len = cust.agg(F.avg(F.length("c_mktsegment"))).collect()[0][0]
    assert abs(s.avg_length - want_len) < 1e-9


def test_null_accounting(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (3, None), (4, "y")], "id long, s string"
    )
    rep = {r.column: r for r in analyze(df).collect()}
    assert rep["s"].n_nulls == 2 and rep["s"].null_fraction == 0.5
    assert rep["s"].approx_ndv == 2  # nulls excluded from ndv
    assert rep["id"].null_fraction == 0.0


def test_single_scan_single_aggregate(spark, sf_dir):
    """The whole battery is ONE physical aggregate over ONE scan."""
    import re

    li = load_table(spark, sf_dir, "lineitem")
    plan = analyze(li)._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Relation \[", plan)) <= 1
    assert len(re.findall(r"FileScan|Scan parquet", plan)) <= 1


def test_empty_table_and_unknown_column(spark):
    df = spark.createDataFrame([], "id long, s string")
    rep = {r.column: r for r in analyze(df).collect()}
    assert rep["id"].n_rows == 0 and rep["id"].null_fraction is None
    with pytest.raises(ValueError, match="no column"):
        analyze(df, ["nope"])


def test_timestamp_minmax(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    rep = {r.column: r for r in analyze(ev, ["ts"]).collect()}
    lo = ev.agg(F.min("ts")).collect()[0][0]
    assert rep["ts"].min_value.startswith(str(lo.year))
