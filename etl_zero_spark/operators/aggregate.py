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


def quantiles(
    df: DataFrame,
    col: str,
    probs: list[float] | None = None,
    by: list[str] | None = None,
    exact: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """Quantile aggregation (R4; the free-SQL surface's
    percentile_cont reach, plus the approximate tier 100 TB needs).

    Default is ``percentile_approx`` — a mergeable KLL-style sketch:
    partial aggregation map-side, fixed-size state on the shuffle, the
    only affordable shape at scale (error <= 1/accuracy of rank).
    ``exact=True`` switches to ``percentile`` (exact linear
    interpolation — matches DuckDB's quantile_cont, the pytest
    oracle), which Spark computes by buffering each group's values:
    correct at any size but memory-bound per group — the verify tier,
    like sim2 vs sim3.

    Output: ``by`` columns + one ``{col}_p{percent}`` double per prob.
    """
    probs = probs if probs is not None else [0.25, 0.5, 0.75]
    if not probs or not all(0.0 <= p <= 1.0 for p in probs):
        raise ValueError(f"quantiles: probs must be in [0,1], got {probs}")

    def name(p: float) -> str:
        pct = f"{p * 100:g}".replace(".", "_")
        return f"{col}_p{pct}"

    if exact:
        aggs = [
            F.percentile(F.col(col), F.lit(p)).alias(name(p)) for p in probs
        ]
    else:
        aggs = [
            F.percentile_approx(F.col(col), F.lit(p), F.lit(accuracy)).cast(
                "double"
            ).alias(name(p))
            for p in probs
        ]
    g = df.groupBy(*by) if by else df.groupBy()
    return g.agg(*aggs)


def key_skew_report(
    df: DataFrame, key_cols: list[str] | str, top_n: int = 10
) -> DataFrame:
    """Shuffle-skew profiler: per-key row counts summarized into the
    numbers that decide a join strategy — before burning a cluster-day
    discovering the skew the hard way.

    Output (single row): n_keys, n_rows, max_count, p50/p99 of per-key
    counts, skew_ratio (= max/mean — >> shuffle-partition count means
    one task owns the hot key), plus ``top_keys`` (array of the top_n
    (key, count) structs by count — the salting candidates for
    joins.salted_join).

    Cost: one groupBy over the keys (the same shuffle the join itself
    would pay) + a tiny summary agg; the per-key count table never
    leaves the executors except as the top-N structs.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
    key_struct = F.struct(
        F.col("__n").alias("count"),
        *[F.col(k).cast("string").alias(k) for k in keys],
    )
    summary = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("__n").alias("n_rows"),
        F.max("__n").alias("max_count"),
        F.expr("percentile(__n, 0.5)").alias("p50_count"),
        F.expr("percentile(__n, 0.99)").alias("p99_count"),
        (F.max("__n") / F.avg("__n")).alias("skew_ratio"),
    )
    # Top-N via TakeOrderedAndProject, NOT collect_list over every key
    # (which would materialize the whole key set in one task); the
    # collected list is top_n rows by construction.
    top = (
        counts.orderBy(F.desc("__n"), *keys)
        .limit(top_n)
        .agg(F.collect_list(key_struct).alias("top_keys"))
    )
    return summary.crossJoin(F.broadcast(top))
