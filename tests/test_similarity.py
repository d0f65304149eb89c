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
