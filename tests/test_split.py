"""Leakage-safe corpus splitting (operators/corpus.py R9):
deterministic hash-interval train/val/test assignment and the
near-dup leakage guard between splits."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_zero_spark.operators import corpus


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc body word"), F.col("id").cast("string"),
                 F.lit(" tail "), (F.col("id") % 7).cast("string")
                 ).alias("text"),
        F.concat(F.lit("src"), (F.col("id") % 3).cast("string")
                 ).alias("source"),
    )


FRACS = {"train": 0.9, "val": 0.06, "test": 0.04}


def test_split_is_partition_with_binomial_proportions(spark):
    out = corpus.split_corpus(_docs(spark), FRACS)
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000  # a partition: every row lands
    for name, frac in FRACS.items():
        mean, sd = 2000 * frac, (2000 * frac * (1 - frac)) ** 0.5
        assert abs(counts.get(name, 0) - mean) < 5 * sd, (name, counts)


def test_split_deterministic_and_stable_under_growth(spark):
    d = _docs(spark)
    a = {r.doc_id: r.split for r in corpus.split_corpus(d, FRACS).collect()}
    b = {r.doc_id: r.split
         for r in corpus.split_corpus(d.repartition(13), FRACS).collect()}
    assert a == b  # partitioning-independent
    # growth stability: the first 500 docs keep their split when 1500
    # more arrive (resumable-ingest property randomSplit lacks)
    small = corpus.split_corpus(d.where("doc_id < 500"), FRACS)
    for r in small.collect():
        assert a[r.doc_id] == r.split
    # a different seed is a different carve
    c = {r.doc_id: r.split
         for r in corpus.split_corpus(d, FRACS, seed=7).collect()}
    assert c != a


def test_split_validation(spark):
    d = _docs(spark, 10)
    with pytest.raises(ValueError, match="sum"):
        corpus.split_corpus(d, {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError, match="not in"):
        corpus.split_corpus(d, {"a": 0.0, "b": 1.0})
    with pytest.raises(ValueError, match="non-empty"):
        corpus.split_corpus(d, {})


def test_leakage_pairs_cross_boundary_only(spark):
    # train doc 100 is a verbatim copy of heldout doc 9001; train docs
    # 101/102 are copies of each other (dedup's business, NOT leakage)
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(100, base), (101, "aa bb cc dd ee ff gg hh ii jj"),
            (102, "aa bb cc dd ee ff gg hh ii jj"),
            (103, "totally unrelated text about spark plans and joins")]
    train = spark.createDataFrame(rows, "doc_id long, text string")
    held = spark.createDataFrame(
        [(9001, base), (9002, "another unrelated heldout document body")],
        "doc_id long, text string",
    )
    pairs = corpus.leakage_pairs(train, held, threshold=0.8).collect()
    ids = {frozenset((r.a_id, r.b_id)) for r in pairs}
    assert frozenset((100, 9001)) in ids
    assert frozenset((101, 102)) not in ids  # train-vs-train excluded


def test_harden_split_drops_train_twins_keeps_heldout(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base, "train"),            # leaked twin -> dropped
        (2, "clean training document about window aggregation", "train"),
        (3, base, "val"),              # heldout NEVER touched
        (4, "clean heldout document about shuffle partitions", "test"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, split string"
    )
    out, ledger = corpus.harden_split(df, threshold=0.8)
    got = {(r.doc_id, r.split) for r in out.collect()}
    assert (1, "train") not in got
    assert {(2, "train"), (3, "val"), (4, "test")} <= got
    assert ledger == {
        "train_before": 2, "leaked_dropped": 1, "train_after": 1,
    }


def test_harden_split_composes_with_split_corpus(spark):
    # plant a near-twin across the carve: whatever splits docs 42/43
    # land in, force 43 into val and 42 into train, then harden
    d = _docs(spark, 200)
    twin = d.where("doc_id in (42, 43)").count()
    assert twin == 2
    df = corpus.split_corpus(d, FRACS).withColumn(
        "split",
        F.when(F.col("doc_id") == 42, F.lit("train"))
        .when(F.col("doc_id") == 43, F.lit("val"))
        .otherwise(F.col("split")),
    )
    # make 42 a verbatim copy of 43's text
    t43 = df.where("doc_id = 43").select("text").first().text
    df = df.withColumn(
        "text", F.when(F.col("doc_id") == 42, F.lit(t43)).otherwise(F.col("text"))
    )
    out, ledger = corpus.harden_split(df, threshold=0.9)
    assert out.where("doc_id = 42").count() == 0
    assert out.where("doc_id = 43").count() == 1
    assert ledger["leaked_dropped"] >= 1


def test_split_hash_domain_separated_from_sampling(spark):
    """R9 review: stratified_sample keeps exactly the LOW hash
    interval; if split_corpus reused the same hash point, a <=98%
    sample would land entirely in the first split and the holdouts
    would be silently EMPTY. Composition must yield every split."""
    d = _docs(spark, 4000)
    sample = corpus.stratified_sample(d, "source", 0.5, "doc_id")
    out = corpus.split_corpus(sample, FRACS)
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert counts.get("val", 0) > 0 and counts.get("test", 0) > 0, counts
    n = sum(counts.values())
    for name, frac in FRACS.items():
        mean, sd = n * frac, (n * frac * (1 - frac)) ** 0.5
        assert abs(counts.get(name, 0) - mean) < 5 * sd, (name, counts)
