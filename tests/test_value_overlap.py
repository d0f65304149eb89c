"""Join-key inference by value overlap (KMV sketches)."""

import pytest
from pyspark.sql import functions as F

from etl_zero_spark.catalog import load_table
from etl_zero_spark.operators.mapper import (
    KmvSketch,
    column_value_sketches,
    infer_key_by_value_overlap,
    kmv_overlap,
)

SF = "/root/testdata/sf0.001"


def test_sketches_bounded_and_null_safe(spark):
    df = spark.createDataFrame(
        [(i, None if i % 3 == 0 else f"v{i}") for i in range(5000)],
        "id long, s string",
    )
    sk = column_value_sketches(df, k=64)
    assert set(sk) == {"id", "s"}
    assert 0 < len(sk["id"].values) <= 64
    assert all(v < sk["id"].theta for v in sk["id"].values)
    empty = column_value_sketches(df.where("id < 0"))
    assert empty["id"].values == frozenset()


def test_fk_pair_wins_on_fixture(spark):
    nation = load_table(spark, SF, "nation")
    customer = load_table(spark, SF, "customer")
    got = infer_key_by_value_overlap(customer, nation, threshold=0.5)
    assert got is not None
    c1, c2, ov = got
    assert (c1, c2) == ("c_nationkey", "n_nationkey")
    assert ov >= 0.99


def test_renamed_fk_found_by_values_not_names(spark):
    # the case name similarity cannot solve: FK column renamed to
    # something with zero lexical signal
    customer = load_table(spark, SF, "customer")
    orders = load_table(spark, SF, "orders").select(
        F.col("o_custkey").alias("buyer_ref"), "o_totalprice", "o_orderstatus"
    )
    got = infer_key_by_value_overlap(
        orders, customer, threshold=0.3, cols2=["c_custkey", "c_name", "c_acctbal"]
    )
    assert got is not None
    c1, c2, ov = got
    assert (c1, c2) == ("buyer_ref", "c_custkey")
    assert ov >= 0.3  # |distinct o_custkey| / |custkeys| at this sf


def _sketch(values, k):
    vals = sorted(values)
    if len(vals) > k:
        return KmvSketch(frozenset(vals[:k]), vals[k])
    return KmvSketch(frozenset(vals), 2**63 - 1)


def test_kmv_overlap_estimator():
    import random

    rng = random.Random(7)
    shared = {rng.getrandbits(62) for _ in range(500)}
    a = shared | {rng.getrandbits(62) for _ in range(500)}
    b = shared | {rng.getrandbits(62) for _ in range(500)}
    # exact when k >= |union| (true Jaccard 500/1500)
    exact = kmv_overlap(_sketch(a, 4096), _sketch(b, 4096))
    assert exact == pytest.approx(len(a & b) / len(a | b))
    # truncated sketches: theta-windowed estimate within ~3 sigma
    est = kmv_overlap(_sketch(a, 256), _sketch(b, 256))
    assert abs(est - 1 / 3) < 3 * ((1 / 3) * (2 / 3) / 256) ** 0.5
    assert kmv_overlap(_sketch(a, 64), _sketch(set(), 64)) == 0.0
    assert kmv_overlap(_sketch(a, 1024), _sketch(a, 1024)) == 1.0


def test_filter_truncated_sketches_compare_correctly(spark):
    # the bug the sf0.01 drive caught: one side's sketch truncated by
    # the pre-filter (n >> 8k), the other complete — theta alignment
    # must keep the estimate near the true Jaccard, not scale it down
    big = spark.createDataFrame([(i % 2000,) for i in range(50_000)], "key long")
    small = spark.createDataFrame([(i,) for i in range(2000)], "key long")
    sb = column_value_sketches(big, k=64)["key"]
    ss = column_value_sketches(small, k=64)["key"]
    est = kmv_overlap(sb, ss)  # true Jaccard = 1.0 (identical value sets)
    assert est >= 0.8


def test_mapper_value_overlap_fallback(spark):
    from etl_zero_spark.operators.mapper import DatasetMapper

    customer = load_table(spark, SF, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    orders = load_table(spark, SF, "orders").select(
        F.col("o_custkey").alias("buyer_ref"), "o_totalprice"
    )
    # no FK metadata, no lexical signal: without the fallback the pair
    # passes through unmerged...
    plain = DatasetMapper({"orders": orders, "customer": customer}).merge_tables()
    assert set(plain) == {"orders", "customer"}
    # ...with it, the value evidence merges them on the renamed FK
    mapped = DatasetMapper(
        {"orders": orders, "customer": customer}, value_overlap=True
    ).merge_tables()
    assert set(mapped) == {"orders_customer_merged"}
    merged = mapped["orders_customer_merged"]
    assert merged.count() == orders.count()
