"""Cohort retention (operators/cohorts.py): planted cohorts + DuckDB
oracle on the events fixture."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_zero_spark.catalog import load_table
from etl_zero_spark.operators.cohorts import cohort_retention
from tests.oracle_harness import compare, duckdb_connection

T0 = dt.datetime(2022, 1, 6)  # a Thursday == unix-epoch week boundary


def _d(days: int) -> dt.datetime:
    return T0 + dt.timedelta(days=days)


def _ev(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp")


def test_planted_triangle(spark):
    ev = _ev(
        spark,
        [
            # cohort week 0: users 1,2 — user 1 returns weeks 1 and 2,
            # user 2 only week 1
            (1, _d(0)), (1, _d(7)), (1, _d(14)),
            (2, _d(1)), (2, _d(8)),
            # cohort week 2: user 3, never returns
            (3, _d(14)),
        ],
    )
    rows = {
        (r.cohort, r.period_offset): (r.n_active, r.cohort_size, r.retention)
        for r in cohort_retention(ev, "1 week").collect()
    }
    c0 = min(c for c, _ in rows)
    c2 = max(c for c, _ in rows)
    assert rows[(c0, 0)] == (2, 2, 1.0)
    assert rows[(c0, 1)] == (2, 2, 1.0)
    assert rows[(c0, 2)] == (1, 2, 0.5)
    assert rows[(c2, 0)] == (1, 1, 1.0)
    assert (c2, 1) not in rows  # absent offsets are absent, not zero


def test_multiple_hits_one_period_count_once(spark):
    ev = _ev(spark, [(1, _d(0)), (1, _d(1)), (1, _d(2))])
    rows = cohort_retention(ev, "1 week").collect()
    assert len(rows) == 1 and rows[0].n_active == 1


def test_events_fixture_vs_duckdb(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = cohort_retention(ev, "1 day").select(
        "cohort",
        "period_offset",
        "n_active",
        "cohort_size",
        F.round("retention", 6).alias("retention"),
    )
    con = duckdb_connection(sf_dir)
    sql = """
    WITH act AS (
      SELECT DISTINCT user_id,
             CAST(to_timestamp((epoch(CAST(ts AS TIMESTAMP))::BIGINT // 86400) * 86400)
                  AS TIMESTAMP) AS bucket
      FROM events
    ), first AS (
      SELECT user_id, min(bucket) AS cohort FROM act GROUP BY user_id
    ), tri AS (
      SELECT f.cohort,
             (epoch(a.bucket)::BIGINT - epoch(f.cohort)::BIGINT) // 86400 AS period_offset,
             count(DISTINCT a.user_id) AS n_active
      FROM act a JOIN first f ON a.user_id = f.user_id
      GROUP BY 1, 2
    )
    SELECT cohort, period_offset, n_active,
           max(CASE WHEN period_offset = 0 THEN n_active END)
             OVER (PARTITION BY cohort) AS cohort_size,
           round(n_active::DOUBLE / max(CASE WHEN period_offset = 0 THEN n_active END)
             OVER (PARTITION BY cohort), 6) AS retention
    FROM tri
    """
    assert compare(out, con, sql) == []
