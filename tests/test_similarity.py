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


def test_auto_geometry_scales_with_corpus():
    """Planes must grow with the corpus so expected bucket rows stay
    under the cap; tables must grow to hold the recall s-curve."""
    h0, l0 = similarity.auto_geometry(1_000)
    assert (h0, l0) == (similarity.LSH_PLANES, similarity.LSH_TABLES)
    # 4096 * 2^12 vectors -> h = 12 keeps n / 2^h = TARGET rows exactly
    h12, l12 = similarity.auto_geometry(similarity.TARGET_BUCKET_ROWS * 2**12)
    assert h12 == 12
    assert l12 > similarity.LSH_TABLES  # recall compensation
    assert l12 <= 64
    # near-dup regime (0.9+): p is high, tables scale far more slowly
    _, l_neardup = similarity.auto_geometry(
        similarity.TARGET_BUCKET_ROWS * 2**12, threshold=0.95
    )
    assert l_neardup < l12
    # monotone in n
    prev_h = 0
    for n in [10**3, 10**5, 10**7, 10**9]:
        h, _ = similarity.auto_geometry(n)
        assert h >= prev_h
        prev_h = h
    # expected bucket population bounded at every probed n
    for n in [10**5, 10**7, 10**9]:
        h, _ = similarity.auto_geometry(n)
        assert n / 2**h <= similarity.TARGET_BUCKET_ROWS


def test_subblock_caps_group_rows_and_preserves_pairs(spark):
    """Plant a corpus that forces one bucket far over the row cap
    (1 plane -> 2 buckets for 120 vectors, cap 16): the sub-block path
    must (a) actually split (nb > 1), (b) bound every cogroup input,
    and (c) return exactly the pairs the unsplit kernel returns."""
    import numpy as np
    from pyspark.sql import functions as F

    rng = np.random.RandomState(11)
    rows = [(i, [float(x) for x in rng.randn(8)]) for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cap = 16

    b = similarity._bucketed(
        df, "id", "v", similarity.lsh_bucket_udf(1, 1), "vec_id", "embedding"
    )
    counts = similarity._bucket_block_counts(b, cap)
    nbs = {r.nb for r in counts.collect()}
    assert max(nbs) > 1  # the overflow actually triggers splitting
    per_sub = (
        b.join(counts, ["table", "bucket"])
        .withColumn("sub", F.pmod(F.xxhash64(F.col("id")), F.col("nb")).cast("int"))
        .groupBy("table", "bucket", "sub")
        .count()
        .collect()
    )
    # xxhash64 spread: no sub-block should exceed ~3x the cap
    assert max(r["count"] for r in per_sub) <= 3 * cap

    unsplit = {
        tuple(r)
        for r in similarity.lsh_neardup_pairs(
            df, threshold=0.3, n_planes=1, n_tables=1, max_bucket_rows=None
        ).collect()
    }
    split = {
        tuple(r)
        for r in similarity.lsh_neardup_pairs(
            df, threshold=0.3, n_planes=1, n_tables=1, max_bucket_rows=cap
        ).collect()
    }
    assert unsplit == split
    assert len(split) > 0


def test_partitioned_topk_subblock_matches_unsplit(spark, emb):
    """sim3 with a tiny worst-case cap must return the same top-k as the
    unsplit bucket cogroup — sub-blocking only re-tiles the GEMM."""
    q = emb.where(F.col("vec_id") < 10)
    unsplit = {
        tuple(r)
        for r in similarity.lsh_partitioned_topk(
            q, emb, k=5, n_planes=6, n_tables=6, max_bucket_rows=None
        ).collect()
    }
    split = {
        tuple(r)
        for r in similarity.lsh_partitioned_topk(
            q, emb, k=5, n_planes=6, n_tables=6, max_bucket_rows=8
        ).collect()
    }
    assert unsplit == split


def test_brute_force_distributed_fanout_guard(spark, emb):
    """Corpus-sized query sets must be refused by the exact path (the
    |Q| x n_blocks replication is quadratic) and routed to LSH."""
    with pytest.raises(ValueError, match="lsh_partitioned_topk"):
        similarity.brute_force_topk_distributed(
            emb, emb, k=5, rows_per_block=8, max_replicated_rows=1000
        )


def test_distributed_topk_tie_break_matches_broadcast(spark):
    """Duplicate vectors (exact cosine ties) straddling block boundaries:
    per-block top-k must break ties by neighbor_id like the global
    window does, or a lower-id tied candidate is dropped in-block."""
    import numpy as np

    base = np.arange(1.0, 9.0)
    rows = [(i, [float(x) for x in base]) for i in range(30)]  # 30 identical
    rows += [(100, [float(x) for x in base + 5.0])]  # one distinct query anchor
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.where(F.col("vec_id").isin(0, 100))
    ref = {tuple(r) for r in similarity.brute_force_topk(q, df, k=5).collect()}
    dist = {
        tuple(r)
        for r in similarity.brute_force_topk_distributed(
            q, df, k=5, rows_per_block=4
        ).collect()
    }
    assert ref == dist


# --- SemDeDup (semantic dedup) -----------------------------------------------


def _clustered_vectors():
    """3 well-separated cluster cores in 8-dim + members with small
    noise; planted near-dup pairs INSIDE clusters and one near-dup
    pair STRADDLING two clusters (the documented miss)."""
    import numpy as np

    rng = np.random.RandomState(7)
    cores = np.eye(8)[:3]  # orthogonal cluster directions
    rows = []
    vid = 0
    for c in range(3):
        for _ in range(6):
            v = cores[c] + rng.normal(0, 0.05, 8)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    # planted exact dup inside cluster 0: clone of vec 0
    rows.append((100, list(rows[0][1])))
    # straddler pair: two vectors at the midpoint of cores 1 and 2,
    # nearly identical to each other but assigned to different
    # clusters by the tiny asymmetric nudge
    mid = (cores[1] + cores[2]) / np.linalg.norm(cores[1] + cores[2])
    rows.append((200, [float(x) for x in mid + 1e-3 * cores[1]]))
    rows.append((201, [float(x) for x in mid + 1e-3 * cores[2]]))
    return rows, cores


def test_semantic_dedup_pairs_within_clusters(spark):
    import numpy as np

    rows, cores = _clustered_vectors()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = similarity.semantic_dedup_pairs(df, cores, threshold=0.95).collect()
    got = {(r.a_id, r.b_id) for r in pairs}
    # the planted clone is found with its exact cosine
    assert (0, 100) in got
    clone = [r for r in pairs if (r.a_id, r.b_id) == (0, 100)][0]
    assert clone.cosine == pytest.approx(1.0, abs=1e-6)
    # precision: every returned pair truly >= threshold (numpy oracle)
    vecs = {i: np.asarray(v) for i, v in rows}
    for r in pairs:
        a, b = vecs[r.a_id], vecs[r.b_id]
        true = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert true >= 0.95 - 1e-9
        assert r.cosine == pytest.approx(true, abs=1e-6)
    # the straddler pair is nearly identical (cosine ~1) but lands in
    # different clusters -> missed, the documented SemDeDup trade
    assert (200, 201) not in got


def test_semantic_dedup_subblock_matches_unsplit(spark):
    rows, cores = _clustered_vectors()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    full = {
        (r.a_id, r.b_id, r.cosine)
        for r in similarity.semantic_dedup_pairs(
            df, cores, threshold=0.9, max_cluster_rows=None
        ).collect()
    }
    split = {
        (r.a_id, r.b_id, r.cosine)
        for r in similarity.semantic_dedup_pairs(
            df, cores, threshold=0.9, max_cluster_rows=2
        ).collect()
    }
    assert split == full and full


def test_semantic_dedup_keepset_resolution(spark):
    rows, cores = _clustered_vectors()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kept = {r.vec_id for r in similarity.semantic_dedup(df, cores, 0.95).collect()}
    pairs = similarity.semantic_dedup_pairs(df, cores, 0.95).collect()
    dropped = {r.b_id for r in pairs}
    assert kept == {i for i, _ in rows} - dropped
    assert 100 not in kept and 0 in kept  # keep-min-id


def test_semantic_dedup_with_ivf_centroids_is_subset_of_exact(spark, emb):
    """Reusing sim4's trained IVF centroids as the SemDeDup clustering:
    every cluster-local pair must be an EXACT near-dup pair (precision
    1.0 vs dd5's blocked exact pairs at the same threshold)."""
    from etl_zero_spark.operators import dedup, ivf

    cents = ivf.train_ivf_centroids(emb, nlist=8, max_iter=4)
    sem = {
        (r.a_id, r.b_id)
        for r in similarity.semantic_dedup_pairs(emb, cents, threshold=0.4).collect()
    }
    exact = {
        (r.a_id, r.b_id)
        for r in dedup.embedding_neardup_pairs_blocked(emb, threshold=0.4).collect()
    }
    assert sem <= exact
    assert sem  # the fixture has same-cluster near-dups at 0.4
