"""IVF (inverted-file) approximate-nearest-neighbor search: a LEARNED
coarse quantizer — k-means centroids — partitions the corpus into
``nlist`` cells; each query exactly rescores only the members of its
``nprobe`` nearest cells (float64 GEMM), and a window merges the
global top-k. The FAISS-style IVF-Flat trade re-expressed as a Spark
dataflow.

This is the second ANN tier next to sign-LSH (similarity.py), and the
two are complementary:

* LSH cells are data-INDEPENDENT (seeded random hyperplanes): zero
  training cost, analytically-known recall s-curve, but blind to the
  corpus's shape — a natural cluster can straddle a hyperplane.
* IVF cells FOLLOW the corpus's own cluster structure, so clustered
  embedding spaces (the common case for text/image encoder output)
  reach the same recall while probing a smaller candidate fraction —
  at the price of a training pass and a learned, corpus-dependent
  partition.

Spark shape (the 100 TB lens):

* **Training** runs on pyspark.ml KMeans (JVM-side, distributed,
  seeded k-means||) over a bounded SAMPLE of unit-normalized vectors
  (``sample_per_centroid`` x nlist rows) — training cost is independent
  of corpus size, standard IVF practice.
* **The centroid matrix is the only driver/broadcast artifact**:
  nlist x dim ~ sqrt(n) x dim float64 (a 1e9-vector 64-d corpus needs
  ~16 MiB) — corpus vectors never leave the executors.
* **Assignment / probing** are one vectorized pandas UDF each (an
  Arrow-batched GEMM against the broadcast centroids); the candidate
  rescore reuses the SAME cogrouped per-cell GEMM + worst-case
  sub-blocking machinery as the LSH tier
  (similarity._cogrouped_rescore), so no task ever materializes an
  unbounded cell — even when the corpus is one giant cluster and the
  quantizer collapses.
* Spherical variant throughout: vectors AND centroids are
  unit-normalized, so nearest-centroid-by-dot-product is exactly
  nearest-by-cosine and Euclidean k-means on the unit sphere is the
  right objective for a cosine metric.

Graceful-degradation contract: ``nprobe >= nlist`` probes every cell,
so every corpus vector is scored for every query through the same
float64 GEMM as the exact path — the output is bit-identical to
``brute_force_topk_distributed`` (asserted in tests/test_ivf.py).

Reference gesture: the all-pairs Word2Vec cosine scan
(mapping.py:97-103) is the exact O(n^2) shape whose candidate set IVF
prunes at scale.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_zero_spark.operators.similarity import (
    TARGET_BUCKET_ROWS,
    _cogrouped_rescore,
    _stack_normalized,
)

IVF_SEED = 42


def auto_nlist(n: int) -> int:
    """sqrt-rule cell count, clamped to [1, n].

    ceil(sqrt(n)) balances the two per-query costs — scanning nlist
    centroids vs rescoring nprobe cells of ~n/nlist rows — and keeps
    the centroid broadcast at sqrt(n) x dim (metadata-sized at any
    corpus scale). Expected cell population is sqrt(n), which outgrows
    a task at very large n; the worst-case sub-blocking in
    ``_cogrouped_rescore`` (cap = TARGET_BUCKET_ROWS) bounds the
    actual task frames regardless, so nlist never needs to chase the
    corpus size.
    """
    return max(1, min(n, math.ceil(math.sqrt(n))))


def _unit(vec_col):
    """Column expression: float array -> unit-normalized double array
    (zero vectors pass through unscaled). JVM-side, codegen-friendly —
    the training path never crosses into Python."""
    sq = F.aggregate(
        vec_col,
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    nrm = F.sqrt(sq)
    safe = F.when(nrm == F.lit(0.0), F.lit(1.0)).otherwise(nrm)
    return F.transform(vec_col, lambda x: x.cast("double") / safe)


def train_ivf_centroids(
    corpus: DataFrame,
    nlist: int,
    seed: int = IVF_SEED,
    vec_col: str = "embedding",
    sample_per_centroid: int = 256,
    max_iter: int = 20,
    corpus_count: int | None = None,
) -> np.ndarray:
    """Fit the coarse quantizer: seeded distributed k-means|| over a
    bounded sample of unit-normalized vectors.

    Returns the (nlist, dim) centroid matrix, re-normalized to unit
    length so downstream assignment by max dot product is
    assignment by max cosine (spherical k-means convention). The
    sample cap (``sample_per_centroid`` x nlist rows) makes training
    cost independent of corpus size; the sampled fraction carries a 5%
    cushion so the expected sample comfortably exceeds k.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    corpus = corpus.where(F.col(vec_col).isNotNull())
    n = corpus_count if corpus_count is not None else corpus.count()
    if n == 0:
        raise ValueError(
            "train_ivf_centroids: empty corpus — an ANN index over zero "
            "vectors has no centroids (KMeans would fail with an opaque "
            "k=1 error)"
        )
    nlist = max(1, min(nlist, n))
    feats = corpus.select(array_to_vector(_unit(F.col(vec_col))).alias("features"))
    target = nlist * sample_per_centroid
    if n > target:
        feats = feats.sample(fraction=min(1.0, 1.05 * target / n), seed=seed)
    model = KMeans(k=nlist, seed=seed, maxIter=max_iter, featuresCol="features").fit(
        feats
    )
    cents = np.vstack([np.asarray(c, dtype=np.float64) for c in model.clusterCenters()])
    norms = np.linalg.norm(cents, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return cents / norms


def _probe_udf(spark, centroids: np.ndarray, nprobe: int):
    """Vectorized pandas UDF: embedding -> int array of the ``nprobe``
    nearest cell ids by cosine against the broadcast unit centroids.
    ``nprobe=1`` is corpus assignment; larger values are query probes.
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    bc = spark.sparkContext.broadcast(centroids)
    p = min(nprobe, centroids.shape[0])

    @pandas_udf(ArrayType(IntegerType()))
    def probes(emb: pd.Series) -> pd.Series:
        cents = bc.value
        if not len(emb):
            return pd.Series([], dtype=object)
        sims = _stack_normalized(emb) @ cents.T  # (rows, nlist)
        if p >= cents.shape[0]:
            idx = np.tile(
                np.arange(cents.shape[0], dtype=np.int32), (sims.shape[0], 1)
            )
        else:
            idx = np.argpartition(-sims, p - 1, axis=1)[:, :p].astype(np.int32)
        return pd.Series(list(idx))

    return probes


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    nlist: int | None = None,
    nprobe: int | None = None,
    centroids: np.ndarray | None = None,
    seed: int = IVF_SEED,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell_rows: int | None = TARGET_BUCKET_ROWS,
    sample_per_centroid: int = 256,
    max_iter: int = 20,
) -> DataFrame:
    """IVF-Flat cosine top-k: train (or accept) centroids, assign each
    corpus vector to its nearest cell, fan each query out to its
    ``nprobe`` nearest cells, exact-rescore inside cells, merge.

    Output: (query_id, neighbor_id, cosine, rank) — the schema and
    tie-order (cosine desc, neighbor_id asc) of every top-k operator in
    this engine. Self-matches excluded. Pass ``centroids`` (from
    ``train_ivf_centroids``) to amortize training across calls — the
    index "build" is that one matrix plus the corpus assignment, which
    a caller can persist as a plain column.

    Defaults: nlist = ceil(sqrt(n)), nprobe = ceil(nlist / 8) — the
    usual starting point; raise nprobe toward nlist to trade latency
    for recall, reaching bit-exactness at nprobe >= nlist.
    """
    queries = queries.where(F.col(vec_col).isNotNull())
    corpus = corpus.where(F.col(vec_col).isNotNull())
    spark = corpus.sparkSession
    if centroids is None:
        n = corpus.count()
        if nlist is None:
            nlist = auto_nlist(n)
        centroids = train_ivf_centroids(
            corpus,
            nlist,
            seed=seed,
            vec_col=vec_col,
            sample_per_centroid=sample_per_centroid,
            max_iter=max_iter,
            corpus_count=n,
        )
    nlist = centroids.shape[0]
    if nprobe is None:
        nprobe = max(1, math.ceil(nlist / 8))

    assign = _probe_udf(spark, centroids, 1)
    probe = _probe_udf(spark, centroids, nprobe)
    c = corpus.select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).alias("cv"),
        F.explode(assign(F.col(vec_col))).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(probe(F.col(vec_col))).alias("cell"),
    )
    return _cogrouped_rescore(q, c, ["cell"], k, max_cell_rows)
