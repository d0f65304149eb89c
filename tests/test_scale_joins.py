"""Scale-path join machinery: bucketed co-located joins (no shuffle in
the plan) and salted joins for extreme key skew (same results as the
plain join)."""

import pytest
from pyspark.sql import functions as F

from etl_zero_spark.catalog import Zone
from etl_zero_spark.operators.joins import salted_join


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Two tables bucketed on the same key with the same bucket count
    must sort-merge-join with ZERO exchanges — the write-time shuffle
    replaces every join-time shuffle."""
    zone = Zone(str(tmp_path), "silver")
    facts = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    dims = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("w")
    )
    t1 = zone.write_bucketed(facts, "facts", "k", n_buckets=8)
    t2 = zone.write_bucketed(dims, "dims", "k", n_buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = zone.read_bucketed(spark, "facts").join(
            zone.read_bucketed(spark, "dims"), "k"
        )
        assert joined.count() == 10_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {t1}")
        spark.sql(f"DROP TABLE IF EXISTS {t2}")


def test_bucketed_groupby_has_no_shuffle(spark, tmp_path):
    zone = Zone(str(tmp_path), "silver")
    facts = spark.range(5_000).select(
        (F.col("id") % 50).alias("k"), F.col("id").alias("v")
    )
    t1 = zone.write_bucketed(facts, "gfacts", "k", n_buckets=8)
    try:
        agg = zone.read_bucketed(spark, "gfacts").groupBy("k").agg(F.sum("v"))
        assert agg.count() == 50
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t1}")


@pytest.mark.parametrize("how", ["inner", "left", "left_semi", "left_anti"])
def test_salted_join_matches_plain_join(spark, how):
    """Salting must not change results: a 90%-hot-key big side joined to
    a small dim gives identical rows to the unsalted join."""
    big = spark.createDataFrame(
        [(7 if i % 10 else i, i) for i in range(2_000)], "k long, payload long"
    )
    small = spark.createDataFrame(
        [(k, f"dim_{k}") for k in range(0, 2_000, 100)] + [(7, "dim_7")],
        "k long, label string",
    )
    want = sorted(tuple(r) for r in big.join(small, "k", how).collect())
    got = sorted(tuple(r) for r in salted_join(big, small, "k", n_salts=8, how=how).collect())
    assert got == want
    assert len(got) > 0


def test_salted_join_rejects_right_joins(spark):
    df = spark.range(5).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="big-side-preserving"):
        salted_join(df, df, "k", how="right")
