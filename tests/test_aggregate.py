"""A1-A3 unit tests: {col}_{fn} naming, null-key pandas parity flag,
histogram binning."""

from etl_zero_spark.catalog import load_table
from etl_zero_spark.operators import aggregate
from tests.conftest import SF_SMOKE


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


def test_quantiles_exact_matches_duckdb(spark):
    """Exact percentile (linear interpolation) vs DuckDB quantile_cont."""
    import duckdb

    from etl_zero_spark.operators.aggregate import quantiles

    li = load_table(spark, SF_SMOKE, "lineitem")
    got = quantiles(
        li, "l_extendedprice", [0.25, 0.5, 0.75, 0.95], exact=True
    ).first()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{SF_SMOKE}/lineitem.parquet')"
    )
    want = con.execute(
        "SELECT quantile_cont(l_extendedprice, [0.25, 0.5, 0.75, 0.95]) "
        "FROM lineitem"
    ).fetchone()[0]
    cols = [
        "l_extendedprice_p25",
        "l_extendedprice_p50",
        "l_extendedprice_p75",
        "l_extendedprice_p95",
    ]
    for c, w in zip(cols, want):
        assert abs(got[c] - w) < 1e-6, (c, got[c], w)


def test_quantiles_approx_within_rank_error(spark):
    """percentile_approx's contract is RANK error <= 1/accuracy: the
    returned value's true rank must be within n/accuracy of the target
    rank (value distance is meaningless for skewed columns)."""
    from etl_zero_spark.operators.aggregate import quantiles

    li = load_table(spark, SF_SMOKE, "lineitem")
    vals = sorted(r.l_extendedprice for r in li.select("l_extendedprice").collect())
    n, acc = len(vals), 1000
    got = quantiles(li, "l_extendedprice", [0.5], accuracy=acc).first()
    import bisect

    rank = bisect.bisect_left(vals, got["l_extendedprice_p50"])
    assert abs(rank - 0.5 * n) <= n / acc + 1

    grouped = quantiles(
        li, "l_extendedprice", [0.5], by=["l_returnflag"], accuracy=acc
    )
    assert grouped.count() == 3  # A/N/R groups

    import pytest as _pytest

    with _pytest.raises(ValueError, match="probs"):
        quantiles(li, "l_extendedprice", [1.5])


def test_key_skew_report(spark):
    from etl_zero_spark.operators.aggregate import key_skew_report

    df = spark.createDataFrame(
        [("hot", i) for i in range(900)] + [(f"k{i}", i) for i in range(100)],
        "k string, v long",
    )
    rep = key_skew_report(df, "k", top_n=3).first()
    assert rep.n_keys == 101 and rep.n_rows == 1000
    assert rep.max_count == 900
    assert rep.p50_count == 1.0
    # mean = 1000/101 ≈ 9.9 -> ratio ≈ 90.9
    assert abs(rep.skew_ratio - 900 / (1000 / 101)) < 1e-6
    assert len(rep.top_keys) == 3
    assert rep.top_keys[0].k == "hot" and rep.top_keys[0]["count"] == 900
    plan_df = key_skew_report(df, "k", top_n=3)
    plan = plan_df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrdered" in plan  # top-N never collect_lists the key set
