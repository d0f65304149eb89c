"""Mutation tests for the oracle-pinned audit booleans (VERDICT r5 #4).

The R5 conversion made every approximate tier's CORRECTNESS row
hash-checked by returning an exact-by-construction result that CARRIES
booleans computed from the live approximate pipeline (lsh_precision_ok
/ lsh_recall_ok / tiers_match / found_at_hamming0), which the DuckDB
oracle pins TRUE. That bar only means something if the booleans are
FALSIFIABLE: a broken pipeline must flip them FALSE (and so flip the
driver's value-hash red). These tests inject the breaks — dead
banding/bucketing (the pipeline finds nothing), phantom pairs (the
pipeline invents matches), a verify step that mis-measures, divergent
tiers — by monkeypatching the operator the declared query calls, then
run the REAL declared query and assert the advertised boolean went
FALSE while unrelated booleans stayed TRUE.

Runs at sf0.01 (SF_ORACLE) — the same fixture scale the driver's
correctness gate replays, so a passing flip here is exactly the red
hash the gate would record.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_zero_spark.plans import northstar
from etl_zero_spark.plans.all_queries import QUERIES
from tests.conftest import SF_ORACLE


def _run(spark, name):
    df = QUERIES[name].fn(spark, SF_ORACLE)
    rows = df.collect()
    assert rows, f"{name} returned no rows — mutation test needs a non-empty result"
    return rows


def _phantom(spark, score_col):
    return spark.createDataFrame(
        [(-2, -1, 1.0)], f"a_id long, b_id long, {score_col} double"
    )


# --- dd3: MinHash + LSH ------------------------------------------------------


def test_dd3_recall_flips_on_dead_banding(spark, monkeypatch):
    """Banding that never yields a candidate (e.g. a band hash seeded
    differently between build and probe) → the LSH pair set is empty →
    lsh_recall_ok must read FALSE on every declared row; precision
    (vacuously no phantom pairs) stays TRUE."""
    real = northstar.dedup.minhash_lsh_pairs
    monkeypatch.setattr(
        northstar.dedup,
        "minhash_lsh_pairs",
        lambda *a, **kw: real(*a, **kw).limit(0),
    )
    rows = _run(spark, "dd3_minhash_lsh_pairs")
    assert all(not r.lsh_recall_ok for r in rows)
    assert all(r.lsh_precision_ok for r in rows)


def test_dd3_precision_flips_on_phantom_pair(spark, monkeypatch):
    """A banding/rescore break that INVENTS a pair absent from the
    exact set → lsh_precision_ok must read FALSE; recall (the real
    pairs are all still found) stays TRUE."""
    real = northstar.dedup.minhash_lsh_pairs
    monkeypatch.setattr(
        northstar.dedup,
        "minhash_lsh_pairs",
        lambda df, *a, **kw: real(df, *a, **kw).unionByName(
            _phantom(df.sparkSession, "jaccard")
        ),
    )
    rows = _run(spark, "dd3_minhash_lsh_pairs")
    assert all(not r.lsh_precision_ok for r in rows)
    assert all(r.lsh_recall_ok for r in rows)


# --- dd4: SimHash ------------------------------------------------------------


def test_dd4_found_flips_when_hamming_verify_breaks(spark, monkeypatch):
    """A broken Hamming verify (every distance off by one — e.g. a
    sign-bit slip in the fingerprint) → no planted clone pair is found
    at Hamming 0 → found_at_hamming0 FALSE on every planted row."""
    real = northstar.dedup.simhash_pairs
    monkeypatch.setattr(
        northstar.dedup,
        "simhash_pairs",
        lambda *a, **kw: real(*a, **kw).withColumn(
            "hamming", F.col("hamming") + F.lit(1)
        ),
    )
    rows = _run(spark, "dd4_simhash_pairs")
    assert all(not r.found_at_hamming0 for r in rows)


# --- dd8: embedding near-dup via LSH buckets ---------------------------------


def test_dd8_recall_flips_on_dead_buckets(spark, monkeypatch):
    real = northstar.similarity.lsh_neardup_pairs
    monkeypatch.setattr(
        northstar.similarity,
        "lsh_neardup_pairs",
        lambda *a, **kw: real(*a, **kw).limit(0),
    )
    rows = _run(spark, "dd8_neardup_lsh")
    assert all(not r.lsh_recall_ok for r in rows)
    assert all(r.lsh_precision_ok for r in rows)


def test_dd8_precision_flips_on_phantom_pair(spark, monkeypatch):
    real = northstar.similarity.lsh_neardup_pairs
    monkeypatch.setattr(
        northstar.similarity,
        "lsh_neardup_pairs",
        lambda emb, *a, **kw: real(emb, *a, **kw).unionByName(
            _phantom(emb.sparkSession, "cosine")
        ),
    )
    rows = _run(spark, "dd8_neardup_lsh")
    assert all(not r.lsh_precision_ok for r in rows)
    assert all(r.lsh_recall_ok for r in rows)


# --- sim2/sim3: sign-LSH ANN tiers -------------------------------------------


def test_sim23_tiers_match_flips_on_divergent_tier(spark, monkeypatch):
    """The distributed tier dropping its rank-1 rows at the REAL
    geometry (the exact n_planes=0 calls are untouched, so the
    declared rows themselves are intact) → tiers_match FALSE."""
    real = northstar.similarity.lsh_partitioned_topk
    def mutated(q, c, *a, **kw):
        out = real(q, c, *a, **kw)
        if kw.get("n_planes") == 6:
            out = out.where(F.col("rank") != 1)
        return out
    monkeypatch.setattr(northstar.similarity, "lsh_partitioned_topk", mutated)
    rows = _run(spark, "sim2_sim3_lsh_topk")
    assert all(not r.tiers_match for r in rows)
    assert all(r.lsh_recall_ok for r in rows)


def test_sim23_recall_flips_on_empty_real_geometry(spark, monkeypatch):
    """The broadcast tier finding nothing at the real geometry (the
    exact n_planes=0 call is untouched) → real-geometry recall 0 →
    lsh_recall_ok FALSE."""
    real = northstar.similarity.lsh_bucketed_topk
    def mutated(q, c, *a, **kw):
        out = real(q, c, *a, **kw)
        if kw.get("n_planes") != 0:
            out = out.limit(0)
        return out
    monkeypatch.setattr(northstar.similarity, "lsh_bucketed_topk", mutated)
    rows = _run(spark, "sim2_sim3_lsh_topk")
    assert all(not r.lsh_recall_ok for r in rows)


# --- dd9: incremental near-dedup ---------------------------------------------


def test_dd9_recall_flips_on_dead_probe(spark, monkeypatch):
    """An index probe that never matches (e.g. band hashes computed
    with a different seed than the index build) → zero incremental
    pairs → lsh_recall_ok FALSE, precision vacuously TRUE."""
    real = northstar.dedup.incremental_minhash_pairs
    monkeypatch.setattr(
        northstar.dedup,
        "incremental_minhash_pairs",
        lambda *a, **kw: real(*a, **kw).limit(0),
    )
    rows = _run(spark, "dd9_incremental_neardup")
    assert all(not r.lsh_recall_ok for r in rows)
    assert all(r.lsh_precision_ok for r in rows)


# --- sdd1: SemDeDup cluster-local semantic dedup -----------------------------


def test_sdd1_recall_flips_on_dead_clustering(spark, monkeypatch):
    """A production multi-cluster pass that finds nothing (e.g. the
    assignment UDF scoring against the wrong centroid matrix so no two
    near-dups share a cluster) → cluster_recall_ok FALSE on every
    declared row; the single-cluster exact twin (centroids with one
    row) is untouched and precision stays vacuously TRUE."""
    real = northstar.similarity.semantic_dedup_pairs

    def mutated(emb, centroids, *a, **kw):
        out = real(emb, centroids, *a, **kw)
        return out.limit(0) if len(centroids) > 1 else out

    monkeypatch.setattr(northstar.similarity, "semantic_dedup_pairs", mutated)
    rows = _run(spark, "sdd1_semantic_dedup")
    assert all(not r.cluster_recall_ok for r in rows)
    assert all(r.semdedup_precision_ok for r in rows)


def test_sdd1_precision_flips_on_phantom_pair(spark, monkeypatch):
    """A production pass inventing a pair no exact GEMM would emit
    (broken assignment putting far-apart vectors in one cluster plus a
    broken rescore) → semdedup_precision_ok FALSE; recall is computed
    from the surviving REAL pairs and stays TRUE."""
    real = northstar.similarity.semantic_dedup_pairs

    def mutated(emb, centroids, *a, **kw):
        out = real(emb, centroids, *a, **kw)
        if len(centroids) > 1:
            out = out.unionByName(_phantom(emb.sparkSession, "cosine"))
        return out

    monkeypatch.setattr(northstar.similarity, "semantic_dedup_pairs", mutated)
    rows = _run(spark, "sdd1_semantic_dedup")
    assert all(not r.semdedup_precision_ok for r in rows)
    assert all(r.cluster_recall_ok for r in rows)


# --- mix1: exact-quota corpus mixing (R8) -----------------------------------


def test_mix1_realized_flips_on_sabotaged_quota(spark, monkeypatch):
    """A selection that under-fills every quota by one row (e.g. an
    off-by-one in the take window) → realized != allocated → the
    realized_matches boolean must read FALSE on every source row,
    flipping the driver's value hash; the arithmetic ledger columns
    (available/allocated) stay what the oracle recomputes."""
    from etl_zero_spark.operators import corpus as corp

    real = corp.stratified_take

    def short(df, source_col, quotas, id_col, seed):
        return real(
            df, source_col, {s: max(q - 1, 0) for s, q in quotas.items()},
            id_col, seed,
        )

    monkeypatch.setattr(corp, "stratified_take", short)
    rows = _run(spark, "mix1_corpus_mix")
    assert all(not r.realized_matches for r in rows)
    assert all(r.realized == r.allocated - 1 for r in rows)
    assert {r.source: r.allocated for r in rows} == {
        "src0": 25, "src1": 19, "src2": 6,
    }


def test_mix1_nested_flips_on_unstable_selection(spark, monkeypatch):
    """A selection whose hash order drifts between budgets (e.g. a
    seed that leaks run state) breaks the nesting guarantee — the
    24-doc sample is no longer a subset of the 50-doc one → nested_ok
    must read FALSE while the per-source counts still match their
    quotas (realized_matches stays TRUE)."""
    from etl_zero_spark.operators import corpus as corp

    real = corp.stratified_take
    calls = []

    def drifting(df, source_col, quotas, id_col, seed):
        calls.append(1)
        return real(df, source_col, quotas, id_col, seed + len(calls))

    monkeypatch.setattr(corp, "stratified_take", drifting)
    rows = _run(spark, "mix1_corpus_mix")
    assert all(not r.nested_ok for r in rows)
    assert all(r.realized_matches for r in rows)
