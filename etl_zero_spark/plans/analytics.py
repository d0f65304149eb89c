"""Window functions, set operations, grouping sets, distinct aggregates
(SURVEY §2.6, §2.4-extended).

The reference implements none of these natively but its free-SQL
surface (Q1, front_end.py:215-225) reaches all of them through MySQL;
they are therefore part of the capability set and each gets a declared,
oracle-checked query. All are Spark built-ins — the engine adds no
custom code, only the declared surface.

Determinism notes: every window ORDER BY carries a unique tiebreaker
column so ROW_NUMBER/LAG agree across engines; running sums are rounded
after the window (both engines accumulate in the same defined order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_zero_spark.catalog import load_table, register_views
from etl_zero_spark.plans.registry import query


@query(
    "w1_row_number_topn",
    "window: row_number top-N per group",
    """
    SELECT c_mktsegment, o_orderkey, o_totalprice, rn FROM (
      SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
             row_number() OVER (PARTITION BY c.c_mktsegment
                                ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ) WHERE rn <= 3
    """,
    "Top-3 orders per market segment via ranked window.",
)
def w1_row_number_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
    )


@query(
    "w2_running_sum",
    "window: cumulative frame",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM orders
    """,
    "Per-customer running order total (unbounded-preceding frame).",
)
def w2_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@query(
    "w3_lag_lead",
    "window: lag/lead",
    """
    SELECT user_id, event_id, value,
           lag(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value
    FROM events
    """,
    "Per-user previous/next event value in event-time order.",
)
def w3_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    )


@query(
    "w4_rank_dense_rank",
    "window: rank/dense_rank",
    """
    SELECT p_brand, p_partkey, p_retailprice,
           rank()       OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS price_rank,
           dense_rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS price_dense_rank
    FROM part
    """,
    "Rank + dense_rank of parts by price within brand (ties share rank).",
)
def w4_rank_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"))
    return p.select(
        "p_brand",
        "p_partkey",
        "p_retailprice",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
    )


@query(
    "set1_union_all",
    "set op: UNION ALL",
    """
    SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
    """,
    "Bag union of customer and supplier nation keys.",
)
def set1_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side")
    )
    return c.unionByName(s)


@query(
    "set2_intersect",
    "set op: INTERSECT",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    "Nations having both customers and suppliers (set semantics).",
)
def set2_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "set3_except",
    "set op: EXCEPT",
    """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    "Nations with customers but no suppliers (set semantics — "
    "df.subtract ≡ EXCEPT DISTINCT; exceptAll would be bag semantics).",
)
def set3_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


@query(
    "g1_rollup",
    "grouping: ROLLUP",
    """
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders, round(sum(o_totalprice), 2) AS o_totalprice_sum
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    "Hierarchical subtotals (status, status+priority, grand total).",
)
def g1_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("o_totalprice_sum"),
    )


@query(
    "g2_cube",
    "grouping: CUBE",
    """
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_rows, round(sum(l_quantity), 2) AS l_quantity_sum
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "All grouping combinations of returnflag x linestatus.",
)
def g2_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("l_quantity_sum"),
    )


@query(
    "g3_grouping_sets",
    "grouping: GROUPING SETS via free SQL (Q1)",
    """
    SELECT c_mktsegment, c_nationkey, count(*) AS n_customers
    FROM customer
    GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
    """,
    "Explicit grouping sets, executed through the spark.sql free-SQL "
    "surface over registered views — the Q1 entry point itself.",
)
def g3_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ["customer"])
    return spark.sql(
        """
        SELECT c_mktsegment, c_nationkey, count(*) AS n_customers
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
        """
    )


@query(
    "cd_count_distinct",
    "aggregate: exact COUNT(DISTINCT)",
    """
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_suppliers
    FROM lineitem GROUP BY l_returnflag
    """,
    "Multi distinct-aggregate (Spark plans expand + two-phase agg).",
)
def cd_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
    )


@query(
    "acd_approx_count_distinct",
    "aggregate: approx_count_distinct (HLL)",
    None,  # HLL sketches differ across engines — rows-only; exactness
    # is bounded by test_analytics.py::test_approx_count_distinct_rsd
    "Approximate distinct counts — the 100 TB path where exact "
    "count-distinct's shuffle is unaffordable.",
)
def acd_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("n_parts_approx")
    )
