"""Product quantization (operators/pq.py): codebook contracts,
compression, ADC recall vs the exact tier, exactness at full probe +
full refine."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_zero_spark.catalog import load_table
from etl_zero_spark.operators.pq import (
    ivf_pq_topk,
    pq_encode,
    train_pq,
)
from etl_zero_spark.operators.similarity import brute_force_topk_distributed


def test_codebook_shape_and_determinism(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    b1 = train_pq(emb, m=8, nbits=4)
    b2 = train_pq(emb.repartition(13), m=8, nbits=4)
    assert b1.shape == (8, 16, 8)  # dim 64 / m 8
    assert np.allclose(b1, b2)  # partitioning-independent


def test_encode_compression_and_reconstruction(spark, sf_dir):
    """Codes are m small ints (the 32x memory claim), and decoding a
    vector's codes approximates the vector (quantization error well
    under the unit norm)."""
    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    books = train_pq(emb, m=8)
    enc = pq_encode(emb, books).select("vec_id", "embedding", "pq_code")
    rows = enc.collect()
    m, ksub, dsub = books.shape
    for r in rows[:20]:
        assert len(r.pq_code) == m and all(0 <= c < ksub for c in r.pq_code)
        v = np.asarray(r.embedding, dtype=np.float64)
        v = v / (np.linalg.norm(v) or 1.0)
        rec = np.concatenate([books[j][r.pq_code[j]] for j in range(m)])
        assert np.linalg.norm(v - rec) < 0.7  # quantized, but near


def test_exact_at_full_probe_and_refine(spark, sf_dir):
    """nprobe=nlist + refine covering the corpus => identical to the
    exact distributed top-k (candidate generation can no longer lose
    anyone; reported cosines are exact by construction)."""
    emb = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 300)
    qs = emb.where(F.col("vec_id") < 12)
    exact = brute_force_topk_distributed(qs, emb, k=5)
    got = ivf_pq_topk(
        qs, emb, k=5, nlist=8, nprobe=8, refine_factor=300
    )
    g = {(r.query_id, r.rank): r.neighbor_id for r in got.collect()}
    e = {(r.query_id, r.rank): r.neighbor_id for r in exact.collect()}
    assert g == e


def test_pq_adds_little_loss_over_ivf_flat(spark, sf_dir):
    """At IDENTICAL coarse-probe settings, IVF-PQ+refine recalls
    nearly what IVF-Flat does — the compression's own loss is the few
    candidates ADC misranks out of the refine set, not the shared
    cell-probe loss."""
    from etl_zero_spark.operators.ivf import ivf_topk, train_ivf_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") < 50)
    exact = brute_force_topk_distributed(qs, emb, k=10)
    cents = train_ivf_centroids(emb, 32)

    def recall(df):
        e, g = {}, {}
        for r in exact.collect():
            e.setdefault(r.query_id, set()).add(r.neighbor_id)
        for r in df.collect():
            g.setdefault(r.query_id, set()).add(r.neighbor_id)
        return sum(len(e[q] & g.get(q, set())) for q in e) / sum(
            len(v) for v in e.values()
        )

    flat = recall(ivf_topk(qs, emb, k=10, centroids=cents, nprobe=6))
    pq = recall(
        ivf_pq_topk(qs, emb, k=10, centroids=cents, nprobe=6, refine_factor=8)
    )
    assert pq >= flat - 0.08, f"IVF-Flat {flat:.2f} vs IVF-PQ {pq:.2f}"
    assert pq >= 0.5


def test_rejects_bad_subspaces(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    with pytest.raises(ValueError, match="divisible"):
        train_pq(emb, m=7)
