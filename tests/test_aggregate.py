"""A1-A3 unit tests: {col}_{fn} naming, null-key pandas parity flag,
histogram binning."""

from etl_zero_spark.operators import aggregate


def test_a1_naming_and_functions(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 5.0)], ["g", "v"]
    )
    out = aggregate.aggregate_table(df, ["g"], {"v": ["sum", "mean", "count"]})
    assert set(out.columns) == {"g", "v_sum", "v_mean", "v_count"}
    row = {r.g: r for r in out.collect()}
    assert row["a"].v_sum == 4.0 and row["a"].v_mean == 2.0 and row["a"].v_count == 2


def test_a1_null_key_parity(spark):
    df = spark.createDataFrame(
        [("a", 1.0), (None, 2.0)], "g string, v double"
    )
    parity = aggregate.aggregate_table(df, ["g"], {"v": ["sum"]})
    assert parity.count() == 1  # pandas drops null keys
    spark_native = aggregate.aggregate_table(
        df, ["g"], {"v": ["sum"]}, pandas_parity=False
    )
    assert spark_native.count() == 2  # Spark keeps the null group


def test_aggregate_all_tables_spec_shape(spark):
    tables = {"t": spark.createDataFrame([("a", 1.0)], ["g", "v"])}
    out = aggregate.aggregate_all_tables(
        tables, {"t": {"group_by": ["g"], "aggregations": {"v": ["max"]}}}
    )
    assert out["t"].columns == ["g", "v_max"]


def test_histogram_bins(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], ["x"])
    out = aggregate.histogram(df, "x", bins=10).collect()
    assert len(out) == 10
    assert all(r["count"] == 10 for r in out)
    assert [r.bucket for r in out] == list(range(10))


def test_pie_aggregate(spark):
    df = spark.createDataFrame([("a", 1.0), ("a", 2.0), ("b", 3.0)], ["c", "v"])
    out = {r.c: r.v_sum for r in aggregate.pie_aggregate(df, "c", "v").collect()}
    assert out == {"a": 3.0, "b": 3.0}
