"""Pivot / unpivot (operators/reshape.py) vs DuckDB PIVOT/UNPIVOT."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_zero_spark.catalog import load_table
from etl_zero_spark.operators.reshape import (
    MAX_PIVOT_VALUES,
    pivot_table,
    pivot_values,
    unpivot,
)
from tests.oracle_harness import compare, duckdb_connection


def test_pivot_vs_duckdb(spark, sf_dir):
    """Revenue by (returnflag x linestatus) pivoted wide, replayed by
    DuckDB's native PIVOT."""
    li = load_table(spark, sf_dir, "lineitem")
    out = pivot_table(
        li,
        keys="l_returnflag",
        pivot_col="l_linestatus",
        values=["F", "O"],
        agg={"l_quantity": "sum"},
    ).select(
        "l_returnflag",
        F.round("f_l_quantity_sum", 2).alias("f_qty"),
        F.round("o_l_quantity_sum", 2).alias("o_qty"),
    )
    con = duckdb_connection(sf_dir)
    sql = """
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus='F' THEN l_quantity END), 2) AS f_qty,
           round(sum(CASE WHEN l_linestatus='O' THEN l_quantity END), 2) AS o_qty
    FROM lineitem GROUP BY l_returnflag
    """
    assert compare(out, con, sql) == []


def test_pivot_other_fold(spark, sf_dir):
    """Values outside the explicit list land in (other), never dropped:
    total mass is conserved."""
    cust = load_table(spark, sf_dir, "customer")
    out = pivot_table(
        cust,
        keys="c_nationkey",
        pivot_col="c_mktsegment",
        values=["BUILDING", "MACHINERY"],
        agg={"c_acctbal": "count"},
        other=True,
    )
    total = (
        out.select(
            (
                F.coalesce("building_c_acctbal_count", F.lit(0))
                + F.coalesce("machinery_c_acctbal_count", F.lit(0))
                + F.coalesce("other_c_acctbal_count", F.lit(0))
            ).alias("n")
        )
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert total == cust.count()


def test_pivot_requires_values():
    with pytest.raises(ValueError, match="explicit values"):
        pivot_table(None, "k", "p", [], {"v": "sum"})
    with pytest.raises(ValueError, match="MAX_PIVOT_VALUES"):
        pivot_table(None, "k", "p", list(range(MAX_PIVOT_VALUES + 1)), {"v": "sum"})


def test_pivot_values_bounded_topn(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    vals = pivot_values(cust, "c_mktsegment", max_values=3)
    assert len(vals) == 3
    # deterministic: re-run identical
    assert vals == pivot_values(cust, "c_mktsegment", max_values=3)
    # they are the 3 most frequent segments
    freq = {
        r[0]: r[1]
        for r in cust.groupBy("c_mktsegment").count().collect()
    }
    assert min(freq[v] for v in vals) >= max(
        n for s, n in freq.items() if s not in vals
    )


def test_unpivot_vs_duckdb(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax"
    )
    out = unpivot(
        li,
        keys=["l_orderkey", "l_linenumber"],
        value_cols=["l_quantity", "l_discount", "l_tax"],
        var_name="measure",
        value_name="val",
    )
    con = duckdb_connection(sf_dir)
    sql = """
    SELECT l_orderkey, l_linenumber, measure, val FROM (
      SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
      FROM lineitem
    ) UNPIVOT (val FOR measure IN (l_quantity, l_discount, l_tax))
    """
    assert compare(out, con, sql) == []


def test_unpivot_roundtrips_pivot(spark, sf_dir):
    """pivot then unpivot recovers the long aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    long_direct = (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("qty"))
        .where(F.col("l_linestatus").isin("F", "O"))
    )
    wide = pivot_table(
        li, "l_returnflag", "l_linestatus", ["F", "O"], {"l_quantity": "sum"}
    )
    back = (
        unpivot(
            wide,
            "l_returnflag",
            ["f_l_quantity_sum", "o_l_quantity_sum"],
            var_name="l_linestatus",
            value_name="qty",
        )
        .where(F.col("qty").isNotNull())
        .select(
            "l_returnflag",
            F.upper(F.substring("l_linestatus", 1, 1)).alias("l_linestatus"),
            F.round("qty", 2).alias("qty"),
        )
    )
    got = {tuple(r) for r in back.collect()}
    want = {tuple(r) for r in long_direct.collect()}
    assert got == want


def test_unpivot_no_shuffle_plan(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plan = (
        unpivot(li, "l_orderkey", ["l_quantity", "l_discount"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
