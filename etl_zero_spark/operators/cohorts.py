"""Cohort retention analysis.

The other half of the product-analytics pair (with operators/funnel):
group users into cohorts by when they FIRST appeared, then measure
what fraction of each cohort is still active 1, 2, ... periods later —
the retention triangle every growth dashboard draws, and at training-
data scale the same shape answers "how much of last month's crawl
still produces documents this month".

Shape: bucket timestamps to the cohort interval
(operators/timeseries.bucket_expr — fixed-length intervals, integer
epoch arithmetic, no UDFs), find each user's first bucket (one
groupBy user), join activity back on user (co-partitioned with the
groupBy — no extra exchange for the probe side), then aggregate
(cohort, period offset) with distinct users. Two hash shuffles total
(user, then cohort x offset); the retention fraction divides by the
offset-0 cohort size via a window over the small aggregate, not a
second pass over events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .timeseries import _parse_interval_seconds, bucket_expr


def cohort_retention(
    events: DataFrame,
    interval: str = "1 week",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """The retention triangle: one row per (cohort, period_offset) with
    ``n_active``, ``cohort_size`` and ``retention`` (n_active /
    cohort_size; offset 0 is 1.0 by construction). ``cohort`` is the
    bucket (interval start) of each user's first activity;
    ``period_offset`` counts intervals since it."""
    step = _parse_interval_seconds(interval)
    act = events.select(
        F.col(user_col).alias("user"), bucket_expr(ts_col, interval)
    ).dropDuplicates(["user", "bucket"])
    first = act.groupBy("user").agg(F.min("bucket").alias("cohort"))
    joined = act.join(first, "user")
    tri = (
        joined.groupBy(
            "cohort",
            (
                (F.unix_timestamp("bucket") - F.unix_timestamp("cohort"))
                / F.lit(step)
            )
            .cast("long")
            .alias("period_offset"),
        )
        .agg(F.count_distinct("user").alias("n_active"))
    )
    w = Window.partitionBy("cohort")
    size = F.max(
        F.when(F.col("period_offset") == 0, F.col("n_active"))
    ).over(w)
    return tri.select(
        "cohort",
        "period_offset",
        "n_active",
        size.alias("cohort_size"),
        (F.col("n_active") / size).alias("retention"),
    )
