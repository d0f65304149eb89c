"""Distribution-drift detection between two table states.

The reference reloads silver tables forever with no notion of "this
week's data looks different" — at 100 TB, silent upstream drift
(a price field changing units, a crawler losing a locale, nulls
creeping up) is found by the TRAINING RUN unless the pipeline measures
it first. The standard monitoring statistic is PSI (population
stability index) over binned distributions:

    PSI = sum_b (p_b - q_b) * ln(p_b / q_b)

with the conventional industry reading: < 0.1 stable, 0.1-0.25
moderate, > 0.25 drifted.

Binning is anchored on the BASELINE side: numeric columns bin by the
baseline's decile edges (one mergeable ``percentile_approx`` pass —
the same sketch tier as operators/aggregate.quantiles), categorical
columns by the baseline's top-N values + ``(other)`` (bounded, like
charts.pie_data). Both sides then reduce to per-bin fractions in one
aggregation each; the PSI arithmetic runs on those tiny per-column
histograms. Nulls are their own bin — a null-rate shift is drift.

``snapshot_drift`` runs the report between two VERSIONS of a
snapshot table (sources/snapshots.py) — "did yesterday's load shift
the distribution" is one call against the manifests.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, StringType

#: Laplace-style smoothing: empty bins get this fraction so the log is
#: finite; drift in/out of an empty bin still dominates the sum.
_EPS = 1e-6

#: Conventional PSI reading.
PSI_MODERATE = 0.10
PSI_DRIFTED = 0.25


def _numeric_bins(df: DataFrame, col: str, n_bins: int) -> list[float]:
    qs = [i / n_bins for i in range(1, n_bins)]
    edges = df.agg(
        F.percentile_approx(col, qs, 10_000).alias("e")
    ).first()["e"]
    if edges is None:
        return []
    # dedupe (constant columns collapse edges)
    out: list[float] = []
    for e in edges:
        if e is not None and (not out or e > out[-1]):
            out.append(float(e))
    return out


def _fractions_numeric(df: DataFrame, col: str, edges: list[float]) -> list[float]:
    """Per-bin fractions: (len(edges)+1) value bins + 1 null bin."""
    c = F.col(col)
    bucket = F.when(c.isNull(), F.lit(len(edges) + 1))
    for i, e in enumerate(edges):
        bucket = bucket.when(c <= F.lit(e), F.lit(i))  # first match wins
    bucket = bucket.otherwise(F.lit(len(edges)))
    counts = {
        r["b"]: r["n"]
        for r in df.groupBy(bucket.alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    total = sum(counts.values()) or 1
    return [counts.get(i, 0) / total for i in range(len(edges) + 2)]


def _fractions_categorical(
    df: DataFrame, col: str, cats: list[str]
) -> list[float]:
    c = F.col(col)
    bucket = F.when(c.isNull(), F.lit(len(cats) + 1))
    for i, v in enumerate(cats):
        bucket = bucket.when(c == F.lit(v), F.lit(i))
    bucket = bucket.otherwise(F.lit(len(cats)))  # (other)
    counts = {
        r["b"]: r["n"]
        for r in df.groupBy(bucket.alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    total = sum(counts.values()) or 1
    return [counts.get(i, 0) / total for i in range(len(cats) + 2)]


def psi(p: list[float], q: list[float]) -> float:
    out = 0.0
    for a, b in zip(p, q):
        a, b = max(a, _EPS), max(b, _EPS)
        out += (a - b) * math.log(a / b)
    return out


def drift_report(
    baseline: DataFrame,
    current: DataFrame,
    columns: list[str] | None = None,
    n_bins: int = 10,
    top_categories: int = 20,
) -> list[dict]:
    """PSI per column between two frames, baseline-anchored bins.
    Returns one dict per column: {column, kind, psi, verdict,
    null_fraction_baseline, null_fraction_current}."""
    fields = {f.name: f.dataType for f in baseline.schema.fields}
    cols = columns or [
        n
        for n, t in fields.items()
        if isinstance(t, (NumericType, StringType))
    ]
    out = []
    for c in cols:
        if isinstance(fields[c], NumericType):
            edges = _numeric_bins(baseline, c, n_bins)
            p = _fractions_numeric(baseline, c, edges)
            q = _fractions_numeric(current, c, edges)
            kind = "numeric"
        else:
            cats = [
                r[0]
                for r in baseline.groupBy(c)
                .count()
                .where(F.col(c).isNotNull())
                .orderBy(F.col("count").desc(), F.col(c).asc())
                .limit(top_categories)
                .collect()
            ]
            p = _fractions_categorical(baseline, c, cats)
            q = _fractions_categorical(current, c, cats)
            kind = "categorical"
        v = psi(p, q)
        verdict = (
            "drifted" if v > PSI_DRIFTED
            else "moderate" if v > PSI_MODERATE
            else "stable"
        )
        out.append(
            {
                "column": c,
                "kind": kind,
                "psi": round(v, 6),
                "verdict": verdict,
                "null_fraction_baseline": round(p[-1], 6),
                "null_fraction_current": round(q[-1], 6),
            }
        )
    return out


def snapshot_drift(
    spark,
    table,
    from_version: int,
    to_version: int | None = None,
    **kwargs,
) -> list[dict]:
    """Drift between two versions of a snapshot table."""
    base = table.read(spark, version=from_version)
    cur = table.read(spark, version=to_version)
    return drift_report(base, cur, **kwargs)
