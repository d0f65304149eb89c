"""Unit tests for the cleaning transforms (P2-P10) on edge-case literal
DataFrames — the pandas parity traps from SURVEY §7 / FIXTURES.md."""

import pytest
from pyspark.sql import Row

from etl_zero_spark.operators import cleaning


def test_remove_duplicates(spark):
    df = spark.createDataFrame([(1, "a"), (1, "a"), (2, "b")], ["id", "v"])
    assert cleaning.remove_duplicates(df).count() == 2


def test_remove_null_rows(spark):
    df = spark.createDataFrame([(1, "a"), (None, "b"), (2, None)], "id int, v string")
    out = cleaning.remove_null_rows(df).collect()
    assert [(r.id, r.v) for r in out] == [(1, "a")]


def test_impute_nulls_numeric_mean_and_string_na(spark):
    df = spark.createDataFrame(
        [(1.0, "x"), (3.0, None), (None, "y")], "n double, s string"
    )
    out = {(r.n, r.s) for r in cleaning.impute_nulls(df).collect()}
    assert (2.0, "y") in out  # mean(1,3)=2
    assert (3.0, "N/A") in out


def test_impute_nulls_all_null_column_stays_null(spark):
    df = spark.createDataFrame(
        [(None, "a"), (None, "b")], "n double, s string"
    )
    out = cleaning.impute_nulls(df).collect()
    assert all(r.n is None for r in out)  # pandas fillna(NaN) is a no-op


def test_impute_nulls_integer_promotes_like_pandas(spark):
    """Integer column with nulls: pandas holds it as float64 and fills
    the exact mean — a naive Spark na.fill would truncate 2.5 to 2."""
    df = spark.createDataFrame(
        [(1, 7), (4, 8), (None, 9)], "n int, untouched int"
    )
    out = cleaning.impute_nulls(df)
    assert dict(out.dtypes)["n"] == "double"
    assert dict(out.dtypes)["untouched"] == "int"  # no nulls -> dtype kept
    assert sorted(r.n for r in out.collect()) == [1.0, 2.5, 4.0]


def test_trim_whitespace(spark):
    df = spark.createDataFrame([("  a  ", 1)], ["s", "i"])
    assert cleaning.trim_whitespace(df).first().s == "a"


def test_standardize_dates_formats_and_garbage(spark):
    df = spark.createDataFrame(
        [
            ("2021-03-04",),
            ("04/03/2021",),  # dayfirst -> March 4th
            ("4 Mar 2021",),
            ("garbage",),
            (None,),
        ],
        ["birth_date"],
    )
    vals = [r.birth_date for r in cleaning.standardize_dates(df).collect()]
    assert vals[:3] == ["2021-03-04", "2021-03-04", "2021-03-04"]
    assert vals[3] is None and vals[4] is None


def test_standardize_dates_name_detection_only(spark):
    # 'created' is not date-like by name -> untouched even if parseable
    df = spark.createDataFrame([("2021-01-02", "2021-01-02")], ["created", "dob"])
    row = cleaning.standardize_dates(df).first()
    assert row.created == "2021-01-02" and row.dob == "2021-01-02"


def test_concat_names_pandas_exact(spark):
    df = spark.createDataFrame(
        [("Ann", "Lee"), ("Bo", None), (None, None), (" Cy ", " Dee ")],
        ["first_name", "last_name"],
    )
    vals = [r.full_name for r in cleaning.concat_names(df).collect()]
    # pandas: strip(first) + " " + strip(last); null -> "" but space stays
    assert vals == ["Ann Lee", "Bo ", " ", "Cy Dee"]


def test_split_name_single_token_null_second(spark):
    df = spark.createDataFrame(
        [("Ann Lee",), ("Solo",), ("A B C",)], ["full_name"]
    )
    rows = cleaning.split_name(df).collect()
    assert (rows[0].first_name_split, rows[0].last_name_split) == ("Ann", "Lee")
    assert (rows[1].first_name_split, rows[1].last_name_split) == ("Solo", None)
    assert (rows[2].first_name_split, rows[2].last_name_split) == ("A", "B C")


def test_pipeline_fold_order(spark):
    df = spark.createDataFrame(
        [(" a ", " a "), (None, "b")], ["x", "y"]
    )
    out = cleaning.transform_data(df, ["trim_whitespace", "remove_null_rows", "remove_duplicates"])
    rows = out.collect()
    assert [(r.x, r.y) for r in rows] == [("a", "a")]


def test_registry_covers_reference_transforms():
    # the 7 reference transforms (transformations_code.py:130-138), plus
    # the engine's single-plan imputation variant
    assert set(cleaning.TRANSFORMATIONS) == {
        "remove_duplicates",
        "remove_null_rows",
        "impute_nulls",
        "impute_nulls_lazy",
        "trim_whitespace",
        "standardize_dates",
        "concat_names",
        "split_name",
    }


def test_impute_nulls_lazy_matches_eager_values(spark):
    """lazy=True must fill the same VALUES as the eager parity mode;
    the documented difference is uniform int->double promotion."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, 10, 1.5, None, "a"),
            (2, None, None, None, None),
            (3, 20, 4.5, None, "c"),
        ],
        "id int, i_nulls int, d_nulls double, all_null int, s string",
    )
    eager = cleaning.impute_nulls(df)
    lazy = cleaning.impute_nulls(df, lazy=True)
    # eager: i_nulls promotes (has nulls), id stays int (no nulls)
    assert dict(eager.dtypes)["i_nulls"] == "double"
    assert dict(eager.dtypes)["id"] == "int"
    # lazy: every int promotes — documented plan-time decision
    assert dict(lazy.dtypes)["id"] == "double"
    e = {r["id"]: r for r in eager.collect()}
    l = {int(r["id"]): r for r in lazy.collect()}
    for k in e:
        assert float(e[k]["i_nulls"]) == float(l[k]["i_nulls"])
        assert float(e[k]["d_nulls"]) == float(l[k]["d_nulls"])
        assert e[k]["all_null"] is None and l[k]["all_null"] is None
        assert e[k]["s"] == l[k]["s"]
    assert l[2]["i_nulls"] == 15.0 and l[2]["d_nulls"] == 3.0
    assert l[2]["s"] == "N/A"
    # composed pipeline stays one plan: no InMemory/collected boundary
    assert "avg" in lazy._jdf.queryExecution().optimizedPlan().toString().lower()


def test_impute_nulls_lazy_launches_no_job(spark):
    """Composition must not execute anything: build the transform over a
    plan that EXPLODES when evaluated — only the action may raise."""
    import pytest
    from pyspark.sql import functions as F

    bomb = spark.range(3).select(
        F.col("id").cast("int").alias("id"),
        F.assert_true(F.col("id") < 0).cast("int").alias("boom"),
    )
    out = cleaning.impute_nulls(bomb, lazy=True)  # must NOT raise
    with pytest.raises(Exception):
        out.collect()
    with pytest.raises(Exception):
        cleaning.impute_nulls(bomb)  # eager mode probes at composition
