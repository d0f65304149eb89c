"""Drift detection (operators/drift.py): numpy PSI oracle + planted
shifts + snapshot-version integration."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_zero_spark.catalog import load_table
from etl_zero_spark.operators.drift import (
    drift_report,
    psi,
    snapshot_drift,
)


def test_identical_is_stable(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    rep = {r["column"]: r for r in drift_report(li, li)}
    for r in rep.values():
        assert r["verdict"] == "stable" and r["psi"] < 1e-9


def test_planted_numeric_shift_detected(spark):
    a = spark.range(0, 20_000).select((F.col("id") % 100).cast("double").alias("v"))
    b = spark.range(0, 20_000).select(
        ((F.col("id") % 100) + 60).cast("double").alias("v")  # big location shift
    )
    r = drift_report(a, b)[0]
    assert r["verdict"] == "drifted" and r["psi"] > 0.25


def test_small_shift_moderate_or_stable(spark):
    a = spark.range(0, 20_000).select((F.col("id") % 100).cast("double").alias("v"))
    b = spark.range(0, 20_000).select(
        ((F.col("id") % 100) + 2).cast("double").alias("v")
    )
    r = drift_report(a, b)[0]
    assert r["psi"] < 0.25


def test_categorical_and_null_drift(spark):
    a = spark.createDataFrame([("x",)] * 80 + [("y",)] * 20, "c string")
    b = spark.createDataFrame([("x",)] * 20 + [("y",)] * 30 + [(None,)] * 50, "c string")
    r = drift_report(a, b)[0]
    assert r["kind"] == "categorical" and r["verdict"] == "drifted"
    assert r["null_fraction_baseline"] == 0.0
    assert r["null_fraction_current"] == 0.5


def test_psi_matches_numpy_formula(spark):
    a = spark.range(0, 10_000).select((F.col("id") % 7).cast("double").alias("v"))
    b = spark.range(0, 10_000).select(((F.col("id") * 3) % 7).cast("double").alias("v"))
    got = drift_report(a, b, n_bins=5)[0]["psi"]
    # independent recompute from collected data using the same
    # baseline-decile binning convention
    import numpy as np

    av = np.array([r.v for r in a.collect()])
    bv = np.array([r.v for r in b.collect()])
    edges = [float(np.percentile(av, q, method="lower")) for q in (20, 40, 60, 80)]
    edges = sorted(set(edges))

    def frac(x):
        bins = []
        rest = np.ones(len(x), dtype=bool)
        for e in edges:
            sel = rest & (x <= e)
            bins.append(sel.sum() / len(x))
            rest &= ~sel
        bins.append(rest.sum() / len(x))
        bins.append(0.0)  # null bin
        return bins

    want = psi(frac(av), frac(bv))
    # percentile_approx vs numpy percentile can pick adjacent edge
    # values; PSI must agree to within the bin-edge wobble
    assert abs(got - want) < 0.05


def test_snapshot_version_drift(spark, tmp_path, sf_dir):
    from etl_zero_spark.sources.snapshots import SnapshotTable

    li = load_table(spark, sf_dir, "lineitem").select("l_quantity", "l_returnflag")
    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.commit(li)
    tbl.commit(li.withColumn("l_quantity", F.col("l_quantity") * 10), mode="overwrite")
    rep = {r["column"]: r for r in snapshot_drift(spark, tbl, 0, 1)}
    assert rep["l_quantity"]["verdict"] == "drifted"
    assert rep["l_returnflag"]["verdict"] == "stable"


def test_high_cardinality_categorical_bounded(spark):
    """r4 verdict #9: a pathological categorical column (hundreds of
    thousands of distinct values) must stay bounded — baseline
    anchoring keeps only top_categories values (TakeOrderedAndProject,
    never a collected key set), everything else folds to (other), and
    the report completes with a sane verdict on a same-shaped current
    side."""
    from pyspark.sql import functions as F

    n = 300_000
    base = spark.range(n).select(
        F.concat(F.lit("cat_"), (F.col("id") % 200_000).cast("string")).alias("c")
    )
    cur = spark.range(n).select(
        F.concat(F.lit("cat_"), ((F.col("id") + 7) % 200_000).cast("string")).alias("c")
    )
    rep = drift_report(base, cur, columns=["c"], top_categories=20)
    assert rep[0]["kind"] == "categorical"
    # nearly all mass folds to (other) on both sides -> no false drift
    assert rep[0]["verdict"] in ("stable", "moderate")
