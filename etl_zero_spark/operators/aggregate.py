"""Aggregation operators (A1-A5).

A1 is the reference's multi-key multi-column multi-function group-by
(ETL_Pipeline_Entire/transformations_code.py:168-184, duplicated at
scheduler.py:156-166 and front_end.py:483-497): pandas
``df.groupby(keys).agg({col: [fns]})`` with output columns flattened to
``{col}_{fn}``. Re-expressed as a single ``groupBy().agg()`` so Spark
plans a partial (map-side) + final aggregate — the shape that scales to
100 TB because the shuffle carries only partial states, not rows.

Pandas parity (SURVEY §4.3.4): pandas drops null group keys; Spark
keeps them as a null group. ``pandas_parity=True`` filters null keys
first (documented flag, on by default to match the reference).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: UI-exposed aggregation functions (front_end.py:471-473); 'mean' is
#: pandas naming for Spark's avg.
AGG_FUNCTIONS = {
    "sum": F.sum,
    "mean": F.avg,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
    "count": F.count,
}


def aggregate_table(
    df: DataFrame,
    group_cols: list[str],
    agg_spec: dict[str, list[str]],
    pandas_parity: bool = True,
) -> DataFrame:
    """A1. ``agg_spec`` maps column -> list of function names; output
    columns are ``{col}_{fn}`` (the pandas multi-index flatten,
    transformations_code.py:177-180)."""
    exprs: list[Column] = []
    for col, fns in agg_spec.items():
        for fn in fns:
            exprs.append(AGG_FUNCTIONS[fn](F.col(col)).alias(f"{col}_{fn}"))
    if not exprs:
        raise ValueError("empty aggregation spec")
    if pandas_parity and group_cols:
        df = df.na.drop(subset=group_cols)
    return df.groupBy(*[F.col(c) for c in group_cols]).agg(*exprs)


def aggregate_all_tables(
    tables: dict[str, DataFrame],
    params: dict[str, dict],
) -> dict[str, DataFrame]:
    """Per-table A1 sweep (transformations_code.py:168-184). ``params``
    maps table -> {"group_by": [...], "aggregations": {col: [fns]}} —
    the JSON shape the reference persists
    (front_end.py:498-506 / selected_aggregation_parameters.json)."""
    out: dict[str, DataFrame] = {}
    for name, p in params.items():
        if name not in tables:
            continue
        out[name] = aggregate_table(
            tables[name], p.get("group_by", []), p.get("aggregations", {})
        )
    return out


def pie_aggregate(df: DataFrame, category: str, value: str) -> DataFrame:
    """A2: chart-prep single-function group-by (front_end.py:818)."""
    return df.groupBy(category).agg(F.sum(F.col(value)).alias(f"{value}_sum"))


def histogram(df: DataFrame, col: str, bins: int = 10) -> DataFrame:
    """A3: equal-width histogram (front_end.py:798-806's
    ``value_counts(bins=N).sort_index()``).

    Two-pass plan: one tiny agg for (min, max), broadcast to compute the
    bucket expression, then groupBy(bucket).count(). Both passes are
    full scans of ONE column (column-pruned parquet read) — no
    driver-side materialization, unlike the pandas original.
    """
    stats = df.agg(
        F.min(F.col(col)).alias("mn"), F.max(F.col(col)).alias("mx")
    )
    joined = df.select(col).crossJoin(F.broadcast(stats))
    width = (F.col("mx") - F.col("mn")) / F.lit(bins)
    bucket = F.least(
        F.floor((F.col(col) - F.col("mn")) / width).cast("int"), F.lit(bins - 1)
    )
    return (
        joined.where(F.col(col).isNotNull())
        .withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy("bucket")
    )
