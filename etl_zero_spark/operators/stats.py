"""Table statistics: ANALYZE-style column profiling in one pass.

The reference introspects schema and constraints from MySQL
(mapping.py:39-65) but never looks at the DATA — its join-key
inference and null-imputation choices run blind. Engines keep column
statistics (ndv, null fraction, min/max, avg width) precisely because
every planning decision improves with them: broadcast-vs-shuffle
thresholds, salting decisions (pair with aggregate.key_skew_report),
dictionary-encoding choices, and DatasetMapper's key-overlap priors.

``analyze`` computes the full battery for every requested column in
ONE aggregation over ONE scan — the per-column expressions all fold
into a single physical Aggregate (no per-column jobs, no second
scan), which is the only acceptable cost model at 100 TB. Distinct
counts are HLL sketches (``approx_count_distinct``, mergeable,
bounded state) — exact ndv is a shuffle per column and is exactly
what this report exists to avoid.

Output is LONG (one row per column, fixed schema) rather than wide,
so 10 or 10,000 columns produce the same schema and the report can be
stored/joined/diffed like any table. Numeric-only measures are NULL
for non-numeric columns, not zero — absence is not a value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, StringType

#: Report schema, in emit order.
REPORT_COLS = [
    "column",
    "dtype",
    "n_rows",
    "n_nulls",
    "null_fraction",
    "approx_ndv",
    "min_value",
    "max_value",
    "avg_length",
]


def analyze(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Column-statistics report for ``columns`` (default: all atomic
    columns). One aggregation, one scan; returns one LONG row per
    column: (column, dtype, n_rows, n_nulls, null_fraction,
    approx_ndv, min_value, max_value, avg_length).

    min/max are rendered to string so every column fits one report
    schema; avg_length is the mean string length for string columns
    and NULL otherwise; approx_ndv is HLL (~2% rsd) and EXCLUDES
    nulls (matching COUNT(DISTINCT) semantics).
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = list(fields) if columns is None else list(columns)
    for c in cols:
        if c not in fields:
            raise ValueError(f"analyze: no column {c!r} in {sorted(fields)}")

    exprs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        col = F.col(c)
        exprs.append(F.count(F.when(col.isNull(), 1)).alias(f"__nn_{i}"))
        exprs.append(F.approx_count_distinct(c).alias(f"__ndv_{i}"))
        orderable = isinstance(fields[c], (NumericType, StringType)) or str(
            fields[c].typeName()
        ) in ("date", "timestamp", "timestamp_ntz", "boolean")
        if orderable:
            exprs.append(F.min(col).cast("string").alias(f"__min_{i}"))
            exprs.append(F.max(col).cast("string").alias(f"__max_{i}"))
        else:
            exprs.append(F.lit(None).cast("string").alias(f"__min_{i}"))
            exprs.append(F.lit(None).cast("string").alias(f"__max_{i}"))
        if isinstance(fields[c], StringType):
            exprs.append(F.avg(F.length(col)).alias(f"__len_{i}"))
        else:
            exprs.append(F.lit(None).cast("double").alias(f"__len_{i}"))

    agg = df.agg(*exprs)
    # Pivot the single wide row to the long report with one stack()
    # projection — still zero extra scans (the agg output is 1 row).
    stack_args = []
    for i, c in enumerate(cols):
        stack_args.append(
            f"'{c}', '{fields[c].simpleString()}', __nn_{i}, __ndv_{i}, "
            f"__min_{i}, __max_{i}, __len_{i}"
        )
    stacked = agg.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {', '.join(stack_args)}) AS "
            "(column, dtype, n_nulls, approx_ndv, min_value, max_value, avg_length)"
        ),
    ).select(
        "column",
        "dtype",
        "n_rows",
        "n_nulls",
        F.when(F.col("n_rows") > 0, F.col("n_nulls") / F.col("n_rows"))
        .otherwise(F.lit(None))
        .alias("null_fraction"),
        "approx_ndv",
        "min_value",
        "max_value",
        "avg_length",
    )
    return stacked
