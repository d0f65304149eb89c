"""Declarative data-quality validation (engine extension; the
reference's 'zero engineering' pipeline validates nothing — rows that
violate implicit assumptions flow silently into silver_db. At 100 TB a
pipeline needs machine-checkable expectations BETWEEN zones).

Design: one expectation list per table compiles into a SINGLE
aggregation pass — every row-level expectation becomes a conditional
count inside one ``agg`` (one scan, one 1-row result, any number of
checks), never one job per check. Table-level expectations
(uniqueness, referential integrity) each need their own shuffle by
nature (distinct / anti-join) and run as separate bounded jobs.

    report = validate(df, [
        not_null("o_orderkey"),
        unique("o_orderkey"),
        in_range("o_totalprice", lo=0),
        in_set("o_orderstatus", ["O", "F", "P"]),
        matches("o_clerk", r"Clerk#\\d+"),
        foreign_key("o_custkey", customers, "c_custkey"),
    ])
    report.passed      # bool
    report.violations  # {expectation_name: n_violating_rows}

Null semantics: ``not_null`` counts nulls; every OTHER row-level check
skips nulls (a null price is a nullability problem, not a range
problem) — compose with ``not_null`` to forbid both.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: A row-level expectation: name + a Column predicate that is TRUE for
#: VIOLATING rows (nulls excluded upstream).
@dataclass(frozen=True)
class RowExpectation:
    name: str
    col: str
    violation: Column


#: A table-level expectation: name + a callable producing the
#: violation COUNT as a 1-row DataFrame job.
@dataclass(frozen=True)
class TableExpectation:
    name: str
    count_violations: Callable[[DataFrame], int]


def not_null(col: str) -> RowExpectation:
    return RowExpectation(f"not_null({col})", col, F.col(col).isNull())


def in_range(
    col: str, lo: float | None = None, hi: float | None = None
) -> RowExpectation:
    if lo is None and hi is None:
        raise ValueError("in_range: need lo and/or hi")
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(col) < lo)
    if hi is not None:
        cond = cond | (F.col(col) > hi)
    return RowExpectation(f"in_range({col},{lo},{hi})", col, cond)


def in_set(col: str, allowed: list) -> RowExpectation:
    if not allowed:
        raise ValueError("in_set: empty allowed set")
    return RowExpectation(
        f"in_set({col})", col, ~F.col(col).isin(list(allowed))
    )


def matches(col: str, pattern: str) -> RowExpectation:
    """Full-match regex expectation (Java regex, anchored)."""
    return RowExpectation(
        f"matches({col})", col, ~F.col(col).rlike(f"^(?:{pattern})$")
    )


def unique(*cols: str) -> TableExpectation:
    """No duplicate (cols) tuples among fully-non-null tuples: one
    groupBy counting groups with >1 row — a single hash shuffle."""
    if not cols:
        raise ValueError("unique: need at least one column")

    def count(df: DataFrame) -> int:
        d = df.select(*cols).dropna(how="any")
        dup = (
            d.groupBy(*cols)
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") > 1)
            .agg(F.coalesce(F.sum("__n"), F.lit(0)).alias("v"))
        )
        return int(dup.first().v)

    return TableExpectation(f"unique({','.join(cols)})", count)


def foreign_key(
    col: str, parent: DataFrame, parent_col: str
) -> TableExpectation:
    """Every non-null child value exists in the parent key column: one
    left-anti join (broadcast when the parent is dim-sized, AQE's
    call), counting orphan rows."""

    def count(df: DataFrame) -> int:
        orphans = (
            df.select(F.col(col).alias("__k"))
            .where(F.col("__k").isNotNull())
            .join(
                parent.select(F.col(parent_col).alias("__k")).distinct(),
                "__k",
                "left_anti",
            )
        )
        return orphans.count()

    return TableExpectation(f"foreign_key({col})", count)


@dataclass
class ValidationReport:
    n_rows: int
    violations: dict[str, int] = field(default_factory=dict)

    @property
    def passed(self) -> bool:
        return all(v == 0 for v in self.violations.values())

    def failing(self) -> dict[str, int]:
        return {k: v for k, v in self.violations.items() if v > 0}


def validate(
    df: DataFrame, expectations: list[RowExpectation | TableExpectation]
) -> ValidationReport:
    """Evaluate every expectation; all row-level checks share ONE
    aggregation job (single scan regardless of check count)."""
    row_exps = [e for e in expectations if isinstance(e, RowExpectation)]
    tbl_exps = [e for e in expectations if isinstance(e, TableExpectation)]
    if len({e.name for e in expectations}) != len(expectations):
        raise ValueError("validate: duplicate expectation names")

    aggs = [F.count(F.lit(1)).alias("__total")]
    for e in row_exps:
        pred = e.violation
        if not e.name.startswith("not_null("):
            pred = F.col(e.col).isNotNull() & pred  # nulls -> not_null's job
        aggs.append(F.sum(pred.cast("long")).alias(e.name))
    row = df.agg(*aggs).first()

    report = ValidationReport(n_rows=int(row["__total"]))
    for e in row_exps:
        report.violations[e.name] = int(row[e.name] or 0)
    for e in tbl_exps:
        report.violations[e.name] = int(e.count_violations(df))
    return report


def quarantine(
    df: DataFrame, expectations: list[RowExpectation]
) -> tuple[DataFrame, DataFrame]:
    """Split rows into (clean, quarantined) on the ROW-LEVEL
    expectations — the write-path variant: clean rows continue to the
    next zone, violating rows land in a quarantine table for triage
    (at scale you never re-scan to find the bad rows twice). One
    predicate, two filters off the same plan; Spark scans twice unless
    the input is cached — callers on a hot path persist first."""
    bad = F.lit(False)
    for e in expectations:
        pred = e.violation
        if not e.name.startswith("not_null("):
            pred = F.col(e.col).isNotNull() & pred
        bad = bad | pred
    return df.where(~bad), df.where(bad)
