"""ANN self-consistency: LSH recall vs the exact brute-force baseline
(SURVEY §5.2), determinism of the seeded hyperplanes."""

import pytest
from pyspark.sql import functions as F

from etl_zero_spark.catalog import load_table
from etl_zero_spark.operators import similarity
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_SMOKE, "embeddings")


def test_brute_force_topk_shape(spark, emb):
    q = emb.where(F.col("vec_id") < 5)
    out = similarity.brute_force_topk(q, emb, k=3).collect()
    assert len(out) == 15  # 5 queries x 3
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for rows in by_q.values():
        ranks = [r.rank for r in sorted(rows, key=lambda r: r.rank)]
        assert ranks == [1, 2, 3]
        cosines = [r.cosine for r in sorted(rows, key=lambda r: r.rank)]
        assert cosines == sorted(cosines, reverse=True)
        assert all(r.query_id != r.neighbor_id for r in rows)


def test_lsh_recall_at_1(spark, emb):
    """Multi-probe sign-LSH must recover most rank-1 exact neighbors."""
    q = emb.where(F.col("vec_id") < 30)
    exact1 = {
        r.query_id: r.neighbor_id
        for r in similarity.brute_force_topk(q, emb, k=1).collect()
    }
    approx = similarity.lsh_bucketed_topk(q, emb, k=5).collect()
    approx_by_q = {}
    for r in approx:
        approx_by_q.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(
        1 for qid, nid in exact1.items() if nid in approx_by_q.get(qid, set())
    )
    assert hits / len(exact1) >= 0.5  # recall@1 within the probed buckets


def test_lsh_deterministic(spark, emb):
    q = emb.where(F.col("vec_id") < 5)
    a = {tuple(r) for r in similarity.lsh_bucketed_topk(q, emb, k=3).collect()}
    b = {tuple(r) for r in similarity.lsh_bucketed_topk(q, emb, k=3).collect()}
    assert a == b


def test_distributed_brute_force_matches_broadcast(spark, emb):
    """The block-GEMM exact path must be bit-identical to the broadcast
    kernel, including when the corpus spans multiple blocks."""
    q = emb.where(F.col("vec_id") < 10)
    ref = {tuple(r) for r in similarity.brute_force_topk(q, emb, k=5).collect()}
    one_block = {
        tuple(r)
        for r in similarity.brute_force_topk_distributed(q, emb, k=5).collect()
    }
    multi_block = {
        tuple(r)
        for r in similarity.brute_force_topk_distributed(
            q, emb, k=5, rows_per_block=64
        ).collect()
    }
    assert ref == one_block == multi_block


def test_lsh_partitioned_recall_at_1(spark, emb):
    """The distributed (cogrouped bucket GEMM) ANN path must recover most
    rank-1 exact neighbors — same bound as the broadcast variant."""
    q = emb.where(F.col("vec_id") < 30)
    exact1 = {
        r.query_id: r.neighbor_id
        for r in similarity.brute_force_topk(q, emb, k=1).collect()
    }
    approx = similarity.lsh_partitioned_topk(q, emb, k=5).collect()
    approx_by_q = {}
    for r in approx:
        approx_by_q.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(
        1 for qid, nid in exact1.items() if nid in approx_by_q.get(qid, set())
    )
    assert hits / len(exact1) >= 0.5


def test_lsh_neardup_precision_and_recall(spark, emb):
    """dd8 scale path: every returned pair must appear in the exact
    result with the identical cosine (precision 1.0 by construction);
    the fixture-tuned geometry must hold >= 0.8 recall at 0.4."""
    from etl_zero_spark.operators import dedup

    exact = {
        (r.a_id, r.b_id): r.cosine
        for r in dedup.embedding_neardup_pairs(emb, threshold=0.4).collect()
    }
    approx = {
        (r.a_id, r.b_id): r.cosine
        for r in similarity.lsh_neardup_pairs(
            emb, threshold=0.4, n_planes=3, n_tables=12
        ).collect()
    }
    assert set(approx) <= set(exact)
    for pair, cos in approx.items():
        assert cos == pytest.approx(exact[pair], abs=1e-6)
    if exact:
        assert len(approx) / len(exact) >= 0.8


def test_blocked_neardup_matches_broadcast(spark, emb):
    from etl_zero_spark.operators import dedup

    ref = {
        tuple(r) for r in dedup.embedding_neardup_pairs(emb, threshold=0.4).collect()
    }
    multi_block = {
        tuple(r)
        for r in dedup.embedding_neardup_pairs_blocked(
            emb, threshold=0.4, rows_per_block=64
        ).collect()
    }
    assert ref == multi_block


def test_lsh_neardup_finds_planted_duplicates(spark):
    """High-threshold regime (the real near-dup use case): planted
    near-identical vectors must be found with the pruning defaults."""
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.randn(40, 16)
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
    # plant 5 near-duplicates of vectors 0..4 (tiny perturbation)
    for i in range(5):
        rows.append((100 + i, [float(x) for x in base[i] + 0.001 * rng.randn(16)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    found = {
        (r.a_id, r.b_id)
        for r in similarity.lsh_neardup_pairs(df, threshold=0.99).collect()
    }
    assert {(i, 100 + i) for i in range(5)} <= found


def test_lsh_cosines_are_exact_for_returned_pairs(spark, emb):
    """The approximate path may miss neighbors but must never mis-score
    the ones it returns (exact rescore)."""
    q = emb.where(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in similarity.brute_force_topk(q, emb, k=50).collect()
    }
    for r in similarity.lsh_bucketed_topk(q, emb, k=5).collect():
        key = (r.query_id, r.neighbor_id)
        if key in exact:
            assert r.cosine == pytest.approx(exact[key], abs=1e-6)
