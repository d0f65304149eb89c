"""Join-strategy advisor (plans/advisor.py): each rule fires on the
shape built to trigger it, with its evidence attached."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_zero_spark.catalog import load_table
from etl_zero_spark.plans.advisor import advise_join, estimate_bytes


def test_small_dim_broadcasts(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    a = advise_join(li, nation, "l_orderkey")
    assert a.strategy == "broadcast" and a.build_side == "right"
    assert a.evidence["right"]["est_total_bytes"] < a.evidence["left"]["est_total_bytes"]


def test_skewed_key_salts(spark):
    # one monster key owning ~90% of rows, forced past the broadcast
    # budget by a tiny threshold
    big = spark.range(0, 200_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(0)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    other = spark.range(0, 100_000).select(F.col("id").alias("k"))
    a = advise_join(big, other, "k", broadcast_bytes=1)
    assert a.strategy == "salted"
    assert a.salt and a.salt >= 2
    assert a.evidence["skew"]["skew_ratio"] > 8


def test_recurring_large_buckets(spark):
    l = spark.range(0, 300_000).select(F.col("id").alias("k"))
    r = spark.range(0, 300_000).select(F.col("id").alias("k"))
    a = advise_join(l, r, "k", recurring=True, broadcast_bytes=1)
    assert a.strategy == "bucketed"


def test_default_shuffle(spark):
    l = spark.range(0, 300_000).select(F.col("id").alias("k"))
    r = spark.range(0, 300_000).select(F.col("id").alias("k"))
    a = advise_join(l, r, "k", broadcast_bytes=1)
    assert a.strategy == "shuffle"


def test_estimate_accounts_for_strings(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    est = estimate_bytes(cust)
    assert est["n_rows"] == cust.count()
    # string-heavy table: width well above the numeric floor
    assert est["est_row_bytes"] > 50
