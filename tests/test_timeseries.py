"""Time-series regularization (operators/timeseries.py) vs a DuckDB
generate_series + IGNORE NULLS window oracle on the events fixture."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_zero_spark.catalog import load_table
from etl_zero_spark.operators.timeseries import (
    bucket_expr,
    complete_grid,
    fill_gaps,
    resample,
)
from tests.oracle_harness import compare, duckdb_connection

T0 = dt.datetime(2021, 1, 1)


def _t(minutes: int) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


def _ts(spark, rows):
    return spark.createDataFrame(rows, "k string, ts timestamp, v double")


def test_interval_parse_rejects_calendar():
    with pytest.raises(ValueError):
        bucket_expr("ts", "1 month")
    with pytest.raises(ValueError):
        bucket_expr("ts", "monthly")


def test_resample_buckets(spark):
    df = _ts(spark, [("a", _t(0), 1.0), ("a", _t(7), 2.0), ("a", _t(16), 4.0)])
    out = resample(df, "ts", "k", "15 minutes", {"v": "sum"}).collect()
    got = {(r.bucket, r.v_sum) for r in out}
    assert got == {(_t(0), 3.0), (_t(15), 4.0)}


def test_complete_grid_spans_per_key(spark):
    df = _ts(spark, [("a", _t(0), 1.0), ("a", _t(45), 1.0), ("b", _t(30), 1.0)])
    res = resample(df, "ts", "k", "15 minutes", {"v": "sum"})
    grid = complete_grid(res, "k", "15 minutes").collect()
    a = sorted(r.bucket for r in grid if r.k == "a")
    b = sorted(r.bucket for r in grid if r.k == "b")
    assert a == [_t(0), _t(15), _t(30), _t(45)]  # holes materialized
    assert b == [_t(30)]  # each key spans only its own range


def test_fill_gaps_ffill_and_flag(spark):
    df = _ts(spark, [("a", _t(0), 5.0), ("a", _t(46), 7.0)])
    out = sorted(
        fill_gaps(df, "ts", "k", "15 minutes", {"v": "sum"}, fill="ffill").collect(),
        key=lambda r: r.bucket,
    )
    assert [(r.bucket, r.v_sum, r["__filled"]) for r in out] == [
        (_t(0), 5.0, False),
        (_t(15), 5.0, True),   # carried forward
        (_t(30), 5.0, True),
        (_t(45), 7.0, False),
    ]


def test_fill_gaps_zero_and_null(spark):
    df = _ts(spark, [("a", _t(0), 5.0), ("a", _t(31), 7.0)])
    z = sorted(
        fill_gaps(df, "ts", "k", "15 minutes", {"v": "sum"}, fill="zero").collect(),
        key=lambda r: r.bucket,
    )
    assert [r.v_sum for r in z] == [5.0, 0.0, 7.0]
    n = sorted(
        fill_gaps(df, "ts", "k", "15 minutes", {"v": "sum"}, fill="null").collect(),
        key=lambda r: r.bucket,
    )
    assert [r.v_sum for r in n] == [5.0, None, 7.0]
    with pytest.raises(ValueError):
        fill_gaps(df, "ts", "k", "15 minutes", {"v": "sum"}, fill="bogus")


def test_leading_holes_stay_null_under_ffill(spark):
    """ffill has nothing to carry before the first observation of a
    NULL-valued slot; also: a slot with an observed NULL value is NOT
    flagged filled."""
    df = spark.createDataFrame(
        [("a", _t(0), None), ("a", _t(31), 3.0)], "k string, ts timestamp, v double"
    )
    out = sorted(
        fill_gaps(df, "ts", "k", "15 minutes", {"v": "max"}, fill="ffill").collect(),
        key=lambda r: r.bucket,
    )
    assert [(r.v_max, r["__filled"]) for r in out] == [
        (None, False),  # observed slot, genuinely null value
        (None, True),   # hole; nothing to carry yet
        (3.0, False),
    ]


def test_events_fixture_vs_duckdb(spark, sf_dir):
    """Full pipeline on real events: 6-hour resample + grid + ffill per
    event_type, replayed by DuckDB generate_series + last_value IGNORE
    NULLS."""
    ev = load_table(spark, sf_dir, "events")
    out = fill_gaps(
        ev, "ts", "event_type", "6 hours", {"value": "sum"}, fill="ffill"
    ).select(
        "event_type",
        "bucket",
        F.round("value_sum", 2).alias("value_sum"),
        F.col("__filled").alias("filled"),
    )
    con = duckdb_connection(sf_dir)
    sql = """
    WITH res AS (
      SELECT event_type,
             CAST(to_timestamp((epoch(CAST(ts AS TIMESTAMP))::BIGINT // 21600) * 21600) AS TIMESTAMP) AS bucket,
             sum(value) AS value_sum
      FROM events GROUP BY 1, 2
    ), spans AS (
      SELECT event_type, min(bucket) lo, max(bucket) hi FROM res GROUP BY 1
    ), grid AS (
      SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 6 HOUR)) AS bucket
      FROM spans
    ), joined AS (
      SELECT g.event_type, g.bucket, r.value_sum,
             r.event_type IS NULL AS filled
      FROM grid g LEFT JOIN res r
        ON g.event_type = r.event_type AND g.bucket = r.bucket
    )
    SELECT event_type, bucket,
           round(last_value(value_sum IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS value_sum,
           filled
    FROM joined
    """
    assert compare(out, con, sql) == []


def test_single_exchange_for_resample(spark, sf_dir):
    """resample = one hash aggregate; no joins, no extra shuffles."""
    import re

    ev = load_table(spark, sf_dir, "events")
    plan = (
        resample(ev, "ts", "event_type", "1 hour", {"value": "sum"})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_moving_agg_vs_duckdb(spark, sf_dir):
    """Trailing 4-bucket moving average over the resampled events
    series, replayed by a DuckDB ROWS BETWEEN window."""
    from etl_zero_spark.operators.timeseries import moving_agg

    ev = load_table(spark, sf_dir, "events")
    res = resample(ev, "ts", "event_type", "6 hours", {"value": "sum"})
    out = moving_agg(res, "event_type", "bucket", {"value_sum": "avg"}, preceding=3).select(
        "event_type",
        "bucket",
        F.round("value_sum", 2).alias("value_sum"),
        F.col("value_sum_avg_moving").alias("mov_avg"),
    )
    con = duckdb_connection(sf_dir)
    sql = """
    WITH res AS (
      SELECT event_type,
             CAST(to_timestamp((epoch(CAST(ts AS TIMESTAMP))::BIGINT // 21600) * 21600) AS TIMESTAMP) AS bucket,
             sum(value) AS value_sum
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, bucket, round(value_sum, 2) AS value_sum,
           avg(value_sum) OVER (PARTITION BY event_type ORDER BY bucket
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS mov_avg
    FROM res
    """
    assert compare(out, con, sql) == []
