"""Local mimic of the driver's DuckDB-oracle differential check.

Runs each declared query on Spark and its oracle SQL on DuckDB over the
same parquet, then compares row count, column names, and values
(order-insensitive; floats to tolerance). Used by test_oracle.py so
regressions surface before the driver's per-round verify does.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from etl_zero_spark.catalog import FIXTURE_TABLES

FLOAT_ATOL = 1e-6
FLOAT_RTOL = 1e-9


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def norm_cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        if isinstance(v, float):
            return round(v, 6)
        if hasattr(v, "isoformat"):
            return v.isoformat()
        if isinstance(v, (list, tuple)):
            return tuple(norm_cell(x) for x in v)
        return v

    out = df.map(norm_cell)
    return out.sort_values(by=list(out.columns), key=lambda s: s.map(str)).reset_index(
        drop=True
    )


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Returns a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    sp = spark_df.toPandas()
    du = con.execute(sql).df()
    if len(sp) != len(du):
        problems.append(f"row count: spark={len(sp)} duckdb={len(du)}")
    if sorted(sp.columns) != sorted(du.columns):
        problems.append(f"columns: spark={sorted(sp.columns)} duckdb={sorted(du.columns)}")
        return problems
    a, b = _normalize(sp), _normalize(du)
    if len(a) != len(b):
        return problems
    for col in a.columns:
        av, bv = a[col], b[col]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            af = pd.to_numeric(av, errors="coerce")
            bf = pd.to_numeric(bv, errors="coerce")
            bad = ~(
                (af.isna() & bf.isna())
                | ((af - bf).abs() <= FLOAT_ATOL + FLOAT_RTOL * bf.abs())
            )
            if bad.any():
                i = bad.idxmax()
                problems.append(f"values[{col}] row{i}: spark={av[i]!r} duckdb={bv[i]!r}")
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
            if not eq.all():
                i = (~eq).idxmax()
                problems.append(f"values[{col}] row{i}: spark={av[i]!r} duckdb={bv[i]!r}")
    return problems
