"""Row/column reshaping: pivot (long -> wide) and unpivot (wide -> long).

The reference reshapes long aggregates into chart-ready wide frames in
pandas on the driver (front_end.py:726-824 feeds Streamlit charts from
``DataFrame.pivot``-style frames). Engine-side the same reshape must
stay distributed: pivot is a groupBy with one output column per pivot
value (executor-side, one shuffle), unpivot is Spark's native
``unpivot`` (the SQL ``stack`` — a row-expanding projection, no
shuffle at all).

Scale contract for pivot: the pivot VALUES must be an explicit list.
Spark's ``pivot(col)`` without values runs a hidden driver-side
``distinct().collect()`` over the pivot column first — fine on a demo
table, a silent full extra job plus an unbounded driver list at
100 TB, and an unbounded-width schema either way (schemas are plan
metadata held on the driver and every executor). ``pivot_values``
computes the list properly when the caller genuinely doesn't know it:
bounded top-N by frequency, one aggregation, with the long tail
foldable into ``(other)`` exactly like charts.pie_data does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Hard cap on pivot width: beyond this, a wide schema stops being a
#: usable table and starts being a memory problem in plan metadata.
MAX_PIVOT_VALUES = 10_000


def pivot_values(
    df: DataFrame, pivot_col: str, max_values: int = 100
) -> list:
    """The bounded way to discover pivot values: top-``max_values`` by
    frequency (one aggregation, TakeOrderedAndProject — never an
    unbounded distinct-collect). Deterministic: count desc, value asc
    tie-break."""
    rows = (
        df.groupBy(pivot_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col(pivot_col).isNotNull())
        .orderBy(F.col("__n").desc(), F.col(pivot_col).asc())
        .limit(max_values)
        .collect()
    )
    return [r[0] for r in rows]


def pivot_table(
    df: DataFrame,
    keys: list[str] | str,
    pivot_col: str,
    values: list,
    agg: dict[str, str],
    other: bool = False,
) -> DataFrame:
    """Long -> wide: one row per ``keys``, one ``{value}_{col}_{fn}``
    column per (pivot value x aggregate).

    ``values`` is required (see module docstring); get it from
    ``pivot_values`` when unknown. ``other=True`` folds rows whose
    pivot value is outside ``values`` into an ``(other)`` column group
    instead of silently dropping them — the same no-silent-truncation
    rule as charts.pie_data.

    ``agg``: {column: fn} with fn in sum/count/min/max/avg. Output
    column names are normalized to ``{pivotvalue}_{col}_{fn}``
    (lowercased, non-alphanumerics -> '_') so downstream SQL never
    needs backtick-quoting.
    """
    import re

    keys = [keys] if isinstance(keys, str) else list(keys)
    if not values:
        raise ValueError("pivot requires a non-empty explicit values list")
    if len(values) > MAX_PIVOT_VALUES:
        raise ValueError(
            f"{len(values)} pivot values exceeds MAX_PIVOT_VALUES="
            f"{MAX_PIVOT_VALUES}: a schema this wide belongs long, not wide"
        )
    pc = F.col(pivot_col)
    if other:
        df = df.withColumn(
            pivot_col,
            F.when(pc.isin(list(values)), pc).otherwise(F.lit("(other)")),
        )
        values = list(values) + ["(other)"]
    exprs = [getattr(F, fn)(col).alias(f"{col}_{fn}") for col, fn in agg.items()]
    wide = df.groupBy(*keys).pivot(pivot_col, values).agg(*exprs)

    def _norm(name: str) -> str:
        return re.sub(r"[^a-z0-9]+", "_", name.lower()).strip("_")

    # Spark's pivot names columns `{value}` for a single aggregate and
    # `{value}_{aggalias}` for several; normalize BOTH to the stable
    # `{value}_{col}_{fn}` so callers never depend on agg arity.
    renames = [F.col(k) for k in keys]
    single = len(exprs) == 1
    for v in values:
        for col, fn in agg.items():
            src = str(v) if single else f"{v}_{col}_{fn}"
            renames.append(F.col(f"`{src}`").alias(_norm(f"{v}_{col}_{fn}")))
    return wide.select(*renames)


def unpivot(
    df: DataFrame,
    keys: list[str] | str,
    value_cols: list[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Wide -> long (melt): one output row per (input row x value
    column). Spark-native ``unpivot`` — a generated projection, no
    shuffle, no Python; value columns must share a least common type
    (Spark casts numerics up; mixing string and numeric raises, which
    beats silently stringifying measurements)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    return df.unpivot(keys, value_cols, var_name, value_name)
