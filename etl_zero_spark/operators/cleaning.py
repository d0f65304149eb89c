"""Cleaning-transform library (operators P2-P10).

Spark-first re-expression of the reference's seven cleaning transforms
and their registry/pipeline composition
(ETL_Pipeline_Entire/transformations_code.py:76-162). Every transform
is a pure ``DataFrame -> DataFrame`` built from native Column
expressions — no collect, no Python row loops — so a pipeline of them
is one Catalyst plan and usually one whole-stage-codegen span.

Pandas parity traps handled explicitly (SURVEY §7):
* P7 concat: pandas ``strip(a) + " " + strip(b)`` always inserts the
  space (empty string stays, null propagates then is filled with "");
  ``concat_ws`` would skip nulls, so we use coalesce+concat.
* P8 split: ``split(" ", n=1)`` yields null second part for
  single-token names; ``F.split(..., limit=2)`` + getItem matches.
* P4 imputation: column mean for numerics (one agg pass for ALL
  columns, not one job per column), "N/A" for strings; all-null numeric
  columns stay null (pandas fillna(NaN) is a no-op).
"""

from __future__ import annotations

from functools import reduce
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegralType, NumericType, StringType

from etl_zero_spark.functions.dates import standardize_date_expr
from etl_zero_spark.functions.fuzzy import find_best_column, is_date_column


def _numeric_cols(df: DataFrame) -> list[str]:
    return [f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)]


def _string_cols(df: DataFrame) -> list[str]:
    return [f.name for f in df.schema.fields if isinstance(f.dataType, StringType)]


def remove_duplicates(df: DataFrame) -> DataFrame:
    """P2: exact full-row dedup (transformations_code.py:78-79).

    Scale note: this is a shuffle on all columns; at 100 TB prefer the
    keyed dedup in operators/dedup.py (hash-groupBy on a key subset) or
    dropDuplicatesWithinWatermark on streams.
    """
    return df.dropDuplicates()


def remove_null_rows(df: DataFrame) -> DataFrame:
    """P3: drop rows with any null (transformations_code.py:81-82)."""
    return df.na.drop("any")


def impute_nulls(df: DataFrame, lazy: bool = False) -> DataFrame:
    """P4: numeric -> column mean, string -> "N/A"
    (transformations_code.py:84-90). Means and null counts come from a
    single agg over all numeric columns (one pass, map-side partial
    aggregation).

    Pandas type parity (default, eager): in pandas any column holding
    nulls is already float64, so mean-imputation keeps the exact
    fractional mean and the column stays float; columns without nulls
    keep their dtype. We reproduce both: integer columns that actually
    contain nulls promote to double before filling (a naive ``na.fill``
    would silently truncate mean 2.5 to 2), untouched columns keep
    their type. That schema decision is data-dependent — Spark schemas
    are static, so exact dtype parity REQUIRES the one eager scalar agg
    (it reads one row; the only eager step in the transform library).

    ``lazy=True`` trades that dtype nuance for a single Catalyst plan:
    the stats ride a 1-row broadcast crossJoin (the ``histogram``
    shape, aggregate.py) and each numeric column fills via
    ``coalesce(col, avg)`` — values identical to the eager mode
    (all-null columns stay null since their avg is null), but EVERY
    integer column promotes to double, nulls present or not, because
    the coalesce's least-common type is decided at plan time. Use it
    inside P10 pipelines that must stay one plan end-to-end.
    """
    nums = _numeric_cols(df)
    if lazy:
        if nums:
            stats = df.agg(*[F.avg(F.col(c)).alias(f"__avg__{c}") for c in nums])
            df = (
                df.crossJoin(F.broadcast(stats))
                .withColumns(
                    {c: F.coalesce(F.col(c), F.col(f"__avg__{c}")) for c in nums}
                )
                .drop(*[f"__avg__{c}" for c in nums])
            )
        strs = _string_cols(df)
        if strs:
            df = df.na.fill("N/A", subset=strs)
        return df
    if nums:
        aggs = [F.avg(F.col(c)).alias(f"avg::{c}") for c in nums] + [
            F.sum(F.col(c).isNull().cast("long")).alias(f"nulls::{c}") for c in nums
        ]
        row = df.agg(*aggs).first()
        int_types = {
            f.name for f in df.schema.fields if isinstance(f.dataType, IntegralType)
        }
        fills = {
            c: row[f"avg::{c}"]
            for c in nums
            if row[f"nulls::{c}"] and row[f"avg::{c}"] is not None
        }
        promote = [c for c in fills if c in int_types]
        if promote:
            df = df.withColumns({c: F.col(c).cast("double") for c in promote})
        if fills:
            df = df.na.fill(fills)
    strs = _string_cols(df)
    if strs:
        df = df.na.fill("N/A", subset=strs)
    return df


def trim_whitespace(df: DataFrame) -> DataFrame:
    """P5: strip every string column (transformations_code.py:92-95).
    One withColumns call -> single projection node."""
    strs = _string_cols(df)
    if not strs:
        return df
    return df.withColumns({c: F.trim(F.col(c)) for c in strs})


def standardize_dates(df: DataFrame) -> DataFrame:
    """P6: for each *name-detected* date column, permissive parse ->
    'yyyy-MM-dd' string, unparseable -> null
    (transformations_code.py:97-110). Detection is metadata-level
    (column names); parsing is a codegen'd coalesce of try_to_timestamp
    tiers (functions/dates.py)."""
    targets = [c for c in df.columns if is_date_column(c)]
    if not targets:
        return df
    return df.withColumns({c: standardize_date_expr(c) for c in targets})


def concat_names(df: DataFrame) -> DataFrame:
    """P7: full_name = strip(first) + " " + strip(last), nulls -> ""
    (transformations_code.py:112-121). Columns are fuzzy-located (P9).
    Uses concat of coalesced parts, NOT concat_ws, to reproduce the
    pandas artifact of a trailing/leading space when one side is empty.
    """
    first = find_best_column("first_name", df.columns)
    last = find_best_column("last_name", df.columns)
    if first is None or last is None:
        return df
    part = lambda c: F.trim(F.coalesce(F.col(c).cast("string"), F.lit("")))
    return df.withColumn("full_name", F.concat(part(first), F.lit(" "), part(last)))


def split_name(df: DataFrame) -> DataFrame:
    """P8: full_name.split(" ", 1) -> first/last_name_split; missing
    second part -> null (transformations_code.py:123-127)."""
    col = find_best_column("full_name", df.columns)
    if col is None:
        return df
    s = F.split(F.col(col), " ", 2)
    return df.withColumn("first_name_split", s.getItem(0)).withColumn(
        "last_name_split", s.getItem(1)
    )


#: P10: ordered registry, name -> transform (transformations_code.py:130-138).
TRANSFORMATIONS: dict[str, Callable[[DataFrame], DataFrame]] = {
    "remove_duplicates": remove_duplicates,
    "remove_null_rows": remove_null_rows,
    "impute_nulls": impute_nulls,
    # single-plan variant for pipelines that must stay lazy end-to-end
    # (uniform int->double promotion; see impute_nulls docstring)
    "impute_nulls_lazy": lambda df: impute_nulls(df, lazy=True),
    "trim_whitespace": trim_whitespace,
    "standardize_dates": standardize_dates,
    "concat_names": concat_names,
    "split_name": split_name,
}


def transform_data(df: DataFrame, selected: list[str]) -> DataFrame:
    """P10: sequential fold of selected transforms
    (transformations_code.py:140-148). Lazy — the composed result is one
    logical plan; Catalyst collapses adjacent projections."""
    fns = [TRANSFORMATIONS[name] for name in selected]
    return reduce(lambda acc, fn: fn(acc), fns, df)


def transform_all_tables(
    tables: dict[str, DataFrame], selected: list[str]
) -> dict[str, DataFrame]:
    """Apply the same pipeline to every table
    (transformations_code.py:150-162)."""
    return {name: transform_data(df, selected) for name, df in tables.items()}
