"""Time-series regularization: resample, gap filling, forward fill.

The reference's event handling aggregates whatever timestamps exist
(front_end.py chart pages group by raw dates); real telemetry has
HOLES — a sensor that sent nothing between 02:00 and 05:00 simply has
no rows there, and every downstream consumer that assumes a dense
grid (charting, window features for training, rate-of-change
calculations) silently misreads the gap as "nothing happened" or
worse, joins misaligned grids. Regularization makes the grid explicit:

* ``resample`` — bucket rows to a fixed interval per key and
  aggregate: one ``date_trunc``-style projection + one groupBy (the
  generalization of e1's tumbling window to any interval).
* ``complete_grid`` — materialize every (key, bucket) slot between
  each key's first and last observation: per key, ONE row carrying
  (min, max) explodes into its bucket sequence — O(output) rows, no
  cross join, no driver-side calendar.
* ``fill_gaps`` — left-join the grid to the resampled data and fill
  the holes: ``zero``/constant, ``ffill`` (last observation carried
  forward — one ordered window with ``last(ignorenulls)``), or leave
  ``null``. A ``__filled`` flag keeps imputed slots distinguishable.

Scale shape: everything shuffles on the key exactly once (resample's
groupBy keys are (key, bucket) — map-side combine applies; the grid
explode is a per-key projection; the ffill window reuses the key
partitioning). Interval arithmetic is integer division on epoch
seconds — no Python, no UDFs; buckets are proper timestamps out.

Oracle: DuckDB ``generate_series`` + ``last_value IGNORE NULLS``
replays the whole pipeline in tests/test_timeseries.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _parse_interval_seconds(interval: str) -> int:
    """'15 minutes' / '1 hour' / '30 seconds' / '2 days' -> seconds.
    Restricted to fixed-length units on purpose: calendar units
    (month, year) have variable length and belong to date_trunc
    semantics, not fixed-grid resampling."""
    units = {
        "second": 1,
        "seconds": 1,
        "minute": 60,
        "minutes": 60,
        "hour": 3600,
        "hours": 3600,
        "day": 86400,
        "days": 86400,
        "week": 604800,
        "weeks": 604800,
    }
    parts = interval.strip().split()
    if len(parts) != 2 or not parts[0].isdigit() or parts[1] not in units:
        raise ValueError(
            f"interval {interval!r}: use '<n> <unit>' with unit in "
            f"{sorted(set(units))} (fixed-length units only)"
        )
    n = int(parts[0]) * units[parts[1]]
    if n <= 0:
        raise ValueError(f"interval {interval!r} must be positive")
    return n


def bucket_expr(ts_col: str, interval: str) -> Column:
    """Floor a timestamp column to its interval bucket (bucket start,
    TimestampType). Integer epoch arithmetic — codegen'd, no UDF."""
    step = _parse_interval_seconds(interval)
    epoch = F.unix_timestamp(F.col(ts_col).cast("timestamp"))
    return F.timestamp_seconds((epoch - (epoch % step))).alias("bucket")


def resample(
    df: DataFrame,
    ts_col: str,
    keys: list[str] | str,
    interval: str,
    aggs: dict[str, str],
) -> DataFrame:
    """Bucket to ``interval`` per key and aggregate: output one row per
    observed (key..., bucket) with ``{col}_{fn}`` columns."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    exprs = [
        getattr(F, fn)(col).alias(f"{col}_{fn}") for col, fn in aggs.items()
    ]
    return (
        df.withColumn("bucket", bucket_expr(ts_col, interval))
        .groupBy(*keys, "bucket")
        .agg(*exprs)
    )


def complete_grid(
    resampled: DataFrame, keys: list[str] | str, interval: str
) -> DataFrame:
    """Every (key, bucket) slot from each key's first to last observed
    bucket: per key one (min,max) row, exploded through ``sequence`` —
    output-linear, no cross join. Returns (keys..., bucket)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    step = _parse_interval_seconds(interval)
    spans = resampled.groupBy(*keys).agg(
        F.min("bucket").alias("__lo"), F.max("bucket").alias("__hi")
    )
    return spans.select(
        *keys,
        F.explode(
            F.sequence(
                F.unix_timestamp("__lo"),
                F.unix_timestamp("__hi"),
                F.lit(step),
            )
        ).alias("__e"),
    ).select(*keys, F.timestamp_seconds(F.col("__e")).alias("bucket"))


def fill_gaps(
    df: DataFrame,
    ts_col: str,
    keys: list[str] | str,
    interval: str,
    aggs: dict[str, str],
    fill: str | float = "null",
) -> DataFrame:
    """``resample`` + densify to the complete per-key grid + fill.

    ``fill``: ``'null'`` (holes stay NULL), ``'ffill'`` (last
    observation carried forward; leading holes stay NULL), ``'zero'``
    or any numeric constant. Adds ``__filled`` (boolean) marking
    imputed slots — training pipelines need to know which points are
    measurements and which are imputation.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    res = resample(df, ts_col, keys, interval, aggs)
    grid = complete_grid(res, keys, interval)
    vcols = [f"{col}_{fn}" for col, fn in aggs.items()]
    # presence flag, not value-nullness: min/sum of an all-null column
    # is NULL on a genuinely observed slot too
    res_p = res.withColumn("__present", F.lit(True))
    out = (
        grid.join(res_p, [*keys, "bucket"], "left")
        .withColumn("__filled", ~F.coalesce(F.col("__present"), F.lit(False)))
        .drop("__present")
    )
    if fill == "ffill":
        from pyspark.sql import Window

        w = (
            Window.partitionBy(*keys)
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        for c in vcols:
            out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    elif fill == "zero" or isinstance(fill, (int, float)) and not isinstance(fill, bool):
        const = 0 if fill == "zero" else fill
        for c in vcols:
            out = out.withColumn(c, F.coalesce(F.col(c), F.lit(const)))
    elif fill != "null":
        raise ValueError(f"fill {fill!r}: use 'null', 'ffill', 'zero', or a number")
    return out


def moving_agg(
    df: DataFrame,
    keys: list[str] | str,
    order_col: str,
    aggs: dict[str, str],
    preceding: int = 3,
) -> DataFrame:
    """Trailing moving aggregates per key: for each row, ``{col}_{fn}_
    moving`` over the current + ``preceding`` prior rows in
    ``order_col`` order — the rolling-average / rolling-max smoothing
    pass that usually follows ``fill_gaps`` (run it AFTER densifying:
    on a gappy series "3 preceding rows" silently spans the holes).
    One window, one shuffle; reuses the by-key partitioning of every
    other per-key operator here."""
    from pyspark.sql import Window

    keys = [keys] if isinstance(keys, str) else list(keys)
    w = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(-preceding, Window.currentRow)
    )
    out = df
    for col, fn in aggs.items():
        out = out.withColumn(
            f"{col}_{fn}_moving", getattr(F, fn)(col).over(w)
        )
    return out
