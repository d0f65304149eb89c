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
    "w1_w4_window_family",
    "window: row_number top-N per group + cumulative frame + lag/lead "
    "+ rank/dense_rank (W1+W2+W3+W4 — the R11 fold of w2_running_sum "
    "into the R5 window-family slot, freeing the slot that declares "
    "ct1_decontamination)",
    """
    SELECT 'topn' AS op, c_mktsegment AS grp, o_orderkey AS id,
           o_totalprice AS val, rn,
           CAST(NULL AS DOUBLE) AS prev_val, CAST(NULL AS DOUBLE) AS next_val,
           CAST(NULL AS BIGINT) AS val_rank, CAST(NULL AS BIGINT) AS val_dense_rank,
           CAST(NULL AS DOUBLE) AS running_total
    FROM (
      SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
             row_number() OVER (PARTITION BY c.c_mktsegment
                                ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ) WHERE rn <= 3
    UNION ALL
    SELECT 'running', CAST(o_custkey AS VARCHAR), o_orderkey, o_totalprice,
           CAST(NULL AS BIGINT),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
    FROM orders
    UNION ALL
    SELECT 'lag_rank', p_brand, p_partkey, p_retailprice,
           CAST(NULL AS BIGINT),
           lag(p_retailprice)  OVER (PARTITION BY p_brand
                 ORDER BY p_retailprice DESC, p_partkey),
           lead(p_retailprice) OVER (PARTITION BY p_brand
                 ORDER BY p_retailprice DESC, p_partkey),
           rank()       OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC),
           dense_rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC),
           CAST(NULL AS DOUBLE)
    FROM part
    """,
    "The window-function family in one tagged union (the R5 fold that "
    "freed a declared slot for snap1; R11 folds W2 in too — operator "
    "ids W1+W2+W3+W4 all preserved): 'topn' = top-3 orders per market "
    "segment via ranked row_number; 'running' = per-customer "
    "cumulative order total over the unbounded-preceding frame "
    "(unique o_orderkey tiebreaker so both engines accumulate in one "
    "defined order); 'lag_rank' = lag/lead over a totally-ordered "
    "window (unique p_partkey tiebreaker) plus rank/dense_rank over "
    "the tie-bearing price order (ties share rank).",
)
def w1_w4_window_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    topn = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            F.lit("topn").alias("op"),
            F.col("c_mktsegment").alias("grp"),
            F.col("o_orderkey").alias("id"),
            F.col("o_totalprice").alias("val"),
            F.col("rn").cast("long").alias("rn"),
            F.lit(None).cast("double").alias("prev_val"),
            F.lit(None).cast("double").alias("next_val"),
            F.lit(None).cast("long").alias("val_rank"),
            F.lit(None).cast("long").alias("val_dense_rank"),
            F.lit(None).cast("double").alias("running_total"),
        )
    )
    w_run = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = o.select(
        F.lit("running").alias("op"),
        F.col("o_custkey").cast("string").alias("grp"),
        F.col("o_orderkey").alias("id"),
        F.col("o_totalprice").alias("val"),
        F.lit(None).cast("long").alias("rn"),
        F.lit(None).cast("double").alias("prev_val"),
        F.lit(None).cast("double").alias("next_val"),
        F.lit(None).cast("long").alias("val_rank"),
        F.lit(None).cast("long").alias("val_dense_rank"),
        F.round(F.sum("o_totalprice").over(w_run), 2).alias("running_total"),
    )
    p = load_table(spark, sf_dir, "part")
    w_uniq = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), "p_partkey")
    w_tie = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"))
    lag_rank = p.select(
        F.lit("lag_rank").alias("op"),
        F.col("p_brand").alias("grp"),
        F.col("p_partkey").alias("id"),
        F.col("p_retailprice").alias("val"),
        F.lit(None).cast("long").alias("rn"),
        F.lag("p_retailprice").over(w_uniq).alias("prev_val"),
        F.lead("p_retailprice").over(w_uniq).alias("next_val"),
        F.rank().over(w_tie).cast("long").alias("val_rank"),
        F.dense_rank().over(w_tie).cast("long").alias("val_dense_rank"),
        F.lit(None).cast("double").alias("running_total"),
    )
    return topn.unionByName(running).unionByName(lag_rank)


@query(
    "set1_set2_set3_ops",
    "set ops: UNION ALL + INTERSECT + EXCEPT",
    """
    SELECT 'union_all' AS op, c_nationkey AS nationkey FROM customer
    UNION ALL
    SELECT 'union_all' AS op, s_nationkey AS nationkey FROM supplier
    UNION ALL
    SELECT 'intersect' AS op, nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT
      SELECT s_nationkey AS nationkey FROM supplier)
    UNION ALL
    SELECT 'except' AS op, nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      EXCEPT
      SELECT s_nationkey AS nationkey FROM supplier)
    """,
    "All three set operations over customer/supplier nation keys in one "
    "tagged result: bag union, set intersect, and set difference "
    "(df.subtract ≡ EXCEPT DISTINCT; exceptAll would be bag semantics).",
)
def set1_set2_set3_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    tag = lambda df, t: df.select(F.lit(t).alias("op"), "nationkey")
    return (
        tag(c, "union_all")
        .unionByName(tag(s, "union_all"))
        .unionByName(tag(c.intersect(s), "intersect"))
        .unionByName(tag(c.subtract(s), "except"))
    )


@query(
    "g1_g3_grouping_family",
    "grouping: ROLLUP + CUBE + GROUPING SETS via free SQL (g1+g2+g3 — "
    "the R7 fold that freed a declared slot for sdd1_semantic_dedup; "
    "all three operator ids preserved)",
    """
    SELECT 'rollup' AS op, o_orderstatus AS g1, o_orderpriority AS g2,
           count(*) AS n, round(sum(o_totalprice), 2) AS sum_val
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    UNION ALL
    SELECT 'cube' AS op, o_orderstatus AS g1, o_orderpriority AS g2,
           count(*) AS n, round(sum(o_totalprice), 2) AS sum_val
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    UNION ALL
    SELECT 'gsets' AS op, c_mktsegment AS g1,
           CAST(c_nationkey AS VARCHAR) AS g2,
           count(*) AS n, CAST(NULL AS DOUBLE) AS sum_val
    FROM customer
    GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
    """,
    "The grouping-analysis family in one tagged union. ROLLUP and CUBE "
    "share ONE cube pass over orders (one scan + one Expand + one "
    "shuffle): rollup's grouping sets are a subset of cube's, so each "
    "aggregate row explodes into its tag list (rollup sets get both "
    "tags, the priority-only set — grouping_id 2 — only 'cube'); a "
    "post-aggregate gid FILTER would push into the Expand and split "
    "the cube back into two scans. The 'gsets' branch runs explicit "
    "GROUPING SETS through the spark.sql free-SQL surface over "
    "registered views — the Q1 entry point itself — with the group "
    "columns harmonized to (g1, g2 as string).",
)
def g1_g3_grouping_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cube_res = o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_val"),
        F.grouping_id().alias("gid"),
    )
    tags = F.when(
        F.col("gid") != 2, F.array(F.lit("rollup"), F.lit("cube"))
    ).otherwise(F.array(F.lit("cube")))
    cube_part = cube_res.select(
        F.explode(tags).alias("op"),
        F.col("o_orderstatus").alias("g1"),
        F.col("o_orderpriority").alias("g2"),
        "n",
        "sum_val",
    )
    register_views(spark, sf_dir, ["customer"])
    gsets_part = spark.sql(
        """
        SELECT 'gsets' AS op, c_mktsegment AS g1,
               CAST(c_nationkey AS STRING) AS g2,
               count(*) AS n, CAST(NULL AS DOUBLE) AS sum_val
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
        """
    )
    return cube_part.unionByName(gsets_part)


@query(
    "cd_acd_count_distinct",
    "aggregate: exact COUNT(DISTINCT) + approx_count_distinct (HLL)",
    """
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_suppliers,
           TRUE AS acd_within_tol
    FROM lineitem GROUP BY l_returnflag
    """,
    "Exact multi distinct-aggregate (Spark plans expand + two-phase "
    "agg) riding with the HLL approximate path — the 100 TB variant "
    "where exact count-distinct's shuffle is unaffordable. HLL sketch "
    "values differ across engines, so the approximate count is checked "
    "as a deterministic tolerance BOOLEAN (|approx - exact| <= 10% at "
    "rsd=0.02, ~5 sigma): the oracle pins it TRUE, and a drifting "
    "sketch flips the hash. Tight rsd bounds live in "
    "test_analytics.py::test_approx_count_distinct_rsd.",
)
def cd_acd_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("n_parts_approx"),
    )
    tol = F.abs(F.col("n_parts_approx") - F.col("n_parts")) <= 0.1 * F.col("n_parts")
    return agg.select(
        "l_returnflag", "n_parts", "n_suppliers", tol.alias("acd_within_tol")
    )


@query(
    "pv1_pivot_unpivot",
    "§2.13-L9: pivot (long->wide) + unpivot (wide->long) — declared "
    "in R12 via the e1+e3 fold's freed slot (VERDICT r11 #5; the "
    "DuckDB PIVOT oracle graduated from tests/test_reshape.py)",
    """
    WITH wide AS (
      SELECT l_returnflag,
        round(sum(CASE WHEN l_linestatus='F' THEN l_quantity END), 2)
          AS f_l_quantity_sum,
        round(avg(CASE WHEN l_linestatus='F' THEN l_extendedprice END), 2)
          AS f_l_extendedprice_avg,
        round(sum(CASE WHEN l_linestatus='O' THEN l_quantity END), 2)
          AS o_l_quantity_sum,
        round(avg(CASE WHEN l_linestatus='O' THEN l_extendedprice END), 2)
          AS o_l_extendedprice_avg
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, measure, value
    FROM wide UNPIVOT INCLUDE NULLS (
      value FOR measure IN (f_l_quantity_sum, f_l_extendedprice_avg,
                            o_l_quantity_sum, o_l_extendedprice_avg)
    )
    """,
    "Round-trip through both reshapes: lineitem pivoted wide on "
    "l_linestatus with an explicit values list (operators/reshape."
    "pivot_table — one shuffle, never the hidden distinct-collect of "
    "pivot-without-values) and two aggregates per value, then melted "
    "back long with the native unpivot (a generated projection, zero "
    "shuffle). Every wide cell rides the long output, so the hash "
    "checks pivot's cell values, its {value}_{col}_{fn} naming, AND "
    "unpivot's null-keeping semantics (the (A,O)/(R,O) cells are "
    "genuinely NULL in TPC-H and must survive as rows — DuckDB's "
    "UNPIVOT needs INCLUDE NULLS to agree).",
)
def pv1_pivot_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_zero_spark.operators.reshape import pivot_table, unpivot

    li = load_table(spark, sf_dir, "lineitem")
    wide = pivot_table(
        li,
        keys="l_returnflag",
        pivot_col="l_linestatus",
        values=["F", "O"],
        agg={"l_quantity": "sum", "l_extendedprice": "avg"},
    )
    measures = [
        "f_l_quantity_sum",
        "f_l_extendedprice_avg",
        "o_l_quantity_sum",
        "o_l_extendedprice_avg",
    ]
    wide = wide.select(
        "l_returnflag", *[F.round(m, 2).alias(m) for m in measures]
    )
    return unpivot(
        wide, keys="l_returnflag", value_cols=measures,
        var_name="measure", value_name="value",
    )
