"""IVF (k-means coarse quantizer) ANN self-consistency: graceful
degradation to the exact result at full probe width, recall vs the
brute-force baseline (SURVEY §5.2), determinism of the seeded
quantizer, and the worst-case cell cap."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_zero_spark.catalog import load_table
from etl_zero_spark.operators import ivf, similarity
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_SMOKE, "embeddings")


def test_ivf_full_probe_matches_exact(spark, emb):
    """nprobe >= nlist probes every cell, so the result must be
    bit-identical to the broadcast exact kernel — same float64 GEMM,
    same (cosine desc, neighbor_id) tie order."""
    q = emb.where(F.col("vec_id") < 10)
    ref = {tuple(r) for r in similarity.brute_force_topk(q, emb, k=5).collect()}
    out = {tuple(r) for r in ivf.ivf_topk(q, emb, k=5, nlist=8, nprobe=8).collect()}
    assert out == ref


def test_ivf_recall_at_1(spark, emb):
    """Random Gaussian vectors are IVF's WORST case (no cluster
    structure to learn) — even there, probing half the cells must
    recover most rank-1 exact neighbors."""
    q = emb.where(F.col("vec_id") < 30)
    exact1 = {
        r.query_id: r.neighbor_id
        for r in similarity.brute_force_topk(q, emb, k=1).collect()
    }
    rows = ivf.ivf_topk(q, emb, k=5, nlist=16, nprobe=8).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(1 for qid, nid in exact1.items() if nid in by_q.get(qid, set()))
    assert hits / len(exact1) >= 0.5


def test_ivf_clustered_corpus_high_recall(spark):
    """The case IVF exists for: a corpus with real cluster structure.
    The learned cells align with the clusters, so a SMALL probe
    fraction (2 of 16 cells) still finds nearly every true neighbor —
    the regime where data-independent LSH needs many more probes."""
    rng = np.random.RandomState(7)
    centers = rng.randn(10, 16) * 8.0
    rows = []
    for i in range(400):
        c = i % 10
        rows.append((i, [float(x) for x in centers[c] + rng.randn(16) * 0.3]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.where(F.col("vec_id") < 20)
    exact1 = {
        r.query_id: r.neighbor_id
        for r in similarity.brute_force_topk(q, df, k=1).collect()
    }
    rows_out = ivf.ivf_topk(q, df, k=5, nlist=16, nprobe=2).collect()
    by_q = {}
    for r in rows_out:
        by_q.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(1 for qid, nid in exact1.items() if nid in by_q.get(qid, set()))
    assert hits / len(exact1) >= 0.9


def test_ivf_deterministic(spark, emb):
    """Seeded k-means|| + seeded sampling: two full runs (training
    included) must return identical results."""
    q = emb.where(F.col("vec_id") < 5)
    a = {tuple(r) for r in ivf.ivf_topk(q, emb, k=3, nlist=8, nprobe=3).collect()}
    b = {tuple(r) for r in ivf.ivf_topk(q, emb, k=3, nlist=8, nprobe=3).collect()}
    assert a == b


def test_ivf_cell_cap_matches_unsplit(spark):
    """A duplicate-heavy corpus collapses most rows into one learned
    cell; a tiny worst-case cap must split that cell's GEMM into
    sub-blocks WITHOUT changing the result."""
    rng = np.random.RandomState(3)
    hub = rng.randn(8)
    rows = [(i, [float(x) for x in hub + rng.randn(8) * 0.01]) for i in range(90)]
    rows += [(100 + i, [float(x) for x in rng.randn(8)]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.where(F.col("vec_id") < 5)
    cents = ivf.train_ivf_centroids(df, 4)
    unsplit = {
        tuple(r)
        for r in ivf.ivf_topk(
            q, df, k=5, centroids=cents, nprobe=2, max_cell_rows=None
        ).collect()
    }
    split = {
        tuple(r)
        for r in ivf.ivf_topk(
            q, df, k=5, centroids=cents, nprobe=2, max_cell_rows=8
        ).collect()
    }
    assert unsplit == split
    assert len(split) > 0


def test_train_clamps_nlist(spark):
    """nlist can never exceed the corpus size (k-means requires
    k <= n); a 5-row corpus trains at most 5 centroids."""
    rows = [(i, [float(i), 1.0]) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = ivf.train_ivf_centroids(df, 50)
    assert cents.shape[0] <= 5
    # centroids are unit-normalized (spherical convention)
    assert np.allclose(np.linalg.norm(cents, axis=1), 1.0)


def test_auto_nlist():
    assert ivf.auto_nlist(1) == 1
    assert ivf.auto_nlist(100) == 10
    assert ivf.auto_nlist(10**6) == 1000
    # clamped to n for tiny corpora
    assert ivf.auto_nlist(3) == 2
