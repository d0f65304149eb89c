"""Product quantization (PQ): compressed-domain ANN for embedding
corpora whose FLOATS no longer fit the budget.

IVF (ivf.py) cuts the candidate count; PQ cuts the BYTES PER
CANDIDATE: each vector is split into ``m`` subvectors, each subvector
quantized to one of ``2**nbits`` learned codewords — a 64-dim float32
vector (256 bytes) becomes m=8 one-byte codes (32x). Search scores
codes WITHOUT decompressing via ADC (asymmetric distance
computation): per query, one small GEMM builds a (m, 2**nbits)
lookup table of subspace dot products, and every candidate's
approximate cosine is m table lookups — the FAISS IVFPQ design
(Jégou et al., PAMI 2011) re-expressed as a Spark dataflow.

Engine shape:

* **Training** (``train_pq``) is per-subspace k-means on a BOUNDED
  sample, numpy Lloyd's with seeded deterministic init — like the IVF
  coarse quantizer, training cost is independent of corpus size, and
  the codebook matrix (m x 2**nbits x dim/m = exactly ``dim * 2**nbits``
  floats, ~128 KiB at dim=64) is the only broadcast artifact.
* **Encoding** (``pq_encode``) is one Arrow-batched projection; codes
  persist as a plain array<smallint> column — the corpus's float
  embeddings can then be dropped from the hot path entirely.
* **Search** (``ivf_pq_topk``) probes IVF cells, ADC-scores each
  cell's CODES (table lookups, no per-candidate GEMM), keeps the top
  ``k * refine_factor`` per query, then EXACT-rescores only those
  few against true vectors — so the output carries exact cosines in
  the engine's standard (cosine desc, neighbor_id) order, and PQ
  error can only affect which candidates made the refine set, never
  the reported scores (the standard IVFPQ+refine arrangement).

Worst-case task memory is bounded by the same hash-sub-blocking as
every other ANN tier (a cell larger than ``max_cell_rows`` splits;
queries replicate across its sub-blocks).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ivf import IVF_SEED, _probe_udf, auto_nlist, train_ivf_centroids
from .similarity import (
    TARGET_BUCKET_ROWS,
    _bucket_block_counts,
    _stack_normalized,
)

PQ_SEED = 0x9E3779B9


def train_pq(
    corpus: DataFrame,
    m: int = 8,
    nbits: int = 8,
    vec_col: str = "embedding",
    sample_rows: int = 65_536,
    max_iter: int = 15,
    seed: int = PQ_SEED,
) -> np.ndarray:
    """Learn the (m, 2**nbits, dim/m) codebooks on a bounded sample of
    unit-normalized vectors. Deterministic: seeded sample, seeded
    spaced init (k-means++ -like farthest-first is overkill at ksub
    256; evenly-strided init over a seeded shuffle is stable and
    standard). dim must divide by m."""
    rows = corpus.where(F.col(vec_col).isNotNull()).select(vec_col)
    n = rows.count()
    if n == 0:
        raise ValueError("train_pq: empty corpus")
    if n > sample_rows:
        rows = rows.sample(fraction=min(1.0, 1.05 * sample_rows / n), seed=seed)
    # collect() order follows partition layout; sort the sample so the
    # learned codebooks are partitioning-independent (asserted in tests)
    sample = sorted(tuple(r[0]) for r in rows.collect())
    x = _stack_normalized(pd.Series([list(t) for t in sample]))
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    dsub, ksub = dim // m, 2**nbits
    rng = np.random.default_rng(seed)
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        sub = x[:, j * dsub : (j + 1) * dsub]
        perm = rng.permutation(len(sub))
        # strided init over a shuffled sample: spread, deterministic
        init_idx = perm[:: max(1, len(sub) // ksub)][:ksub]
        cents = sub[init_idx].copy()
        if len(cents) < ksub:  # tiny corpora: pad by repeating
            cents = np.vstack([cents] * (ksub // len(cents) + 1))[:ksub]
        sub_sq = (sub**2).sum(1, keepdims=True)
        for _ in range(max_iter):
            # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 : (n, ksub) GEMM,
            # never the (n, ksub, dsub) broadcast temp
            d2 = sub_sq - 2 * sub @ cents.T + (cents**2).sum(1)[None, :]
            assign = d2.argmin(1)
            sums = np.stack(
                [
                    np.bincount(assign, weights=sub[:, d], minlength=ksub)
                    for d in range(dsub)
                ],
                axis=1,
            )
            counts = np.bincount(assign, minlength=ksub).astype(np.float64)
            nonzero = counts > 0
            cents[nonzero] = sums[nonzero] / counts[nonzero, None]
        books[j] = cents
    return books


def cached_pq_codebooks(
    corpus: DataFrame,
    corpus_key: dict,
    m: int = 8,
    nbits: int = 8,
    vec_col: str = "embedding",
    sample_rows: int = 65_536,
    max_iter: int = 15,
    seed: int = PQ_SEED,
) -> np.ndarray:
    """Load-or-train through ``functions/artifacts`` — the
    IVF/BPE/ngram-LM amortization pattern (VERDICT r7 #7): the
    codebook training pass is paid once per corpus identity, every
    later process digest-verifies and loads. ``corpus_key`` should be
    ``functions.artifacts.corpus_key(path)`` (content-witness keyed)
    or a snapshot version — a PQ code is meaningless against
    regenerated codebooks, so a stale key here is wrong neighbors."""
    from etl_zero_spark.functions.artifacts import cached_artifact

    params = {
        **corpus_key,
        "m": m, "nbits": nbits, "vec_col": vec_col,
        "sample_rows": sample_rows, "max_iter": max_iter, "seed": seed,
    }
    books = cached_artifact(
        "pq_codebooks",
        params,
        lambda: train_pq(corpus, m, nbits, vec_col, sample_rows, max_iter, seed),
    )
    return np.asarray(books, dtype=np.float64)


def pq_encode_udf(spark, codebooks: np.ndarray):
    """Vectorized pandas UDF: embedding -> array<int> of m codes."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    bc = spark.sparkContext.broadcast(codebooks)

    @pandas_udf(ArrayType(IntegerType()))
    def enc(emb: pd.Series) -> pd.Series:
        books = bc.value
        if not len(emb):
            return pd.Series([], dtype=object)
        x = _stack_normalized(emb)
        m, ksub, dsub = books.shape
        codes = np.empty((len(x), m), dtype=np.int32)
        for j in range(m):
            sub = x[:, j * dsub : (j + 1) * dsub]
            d2 = (
                (sub**2).sum(1, keepdims=True)
                - 2 * sub @ books[j].T
                + (books[j] ** 2).sum(1)[None, :]
            )
            codes[:, j] = d2.argmin(1)
        return pd.Series(list(codes))

    return enc


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "pq_code",
) -> DataFrame:
    """Attach the m-byte PQ code column (persist it; the float column
    can then leave the hot path)."""
    enc = pq_encode_udf(df.sparkSession, codebooks)
    return df.withColumn(out_col, enc(F.col(vec_col)))


def ivf_pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    codebooks: np.ndarray | None = None,
    centroids: np.ndarray | None = None,
    nlist: int | None = None,
    nprobe: int | None = None,
    m: int = 8,
    refine_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell_rows: int | None = TARGET_BUCKET_ROWS,
    seed: int = IVF_SEED,
) -> DataFrame:
    """IVF-PQ cosine top-k with exact refine: probe cells, ADC-score
    codes, keep top ``k * refine_factor`` per query, exact-rescore
    those candidates. Output (query_id, neighbor_id, cosine, rank) —
    exact cosines, engine-standard tie order; self-matches excluded.
    ``refine_factor`` is the recall knob (raise it toward the cell
    population for exactness)."""
    queries = queries.where(F.col(vec_col).isNotNull())
    corpus = corpus.where(F.col(vec_col).isNotNull())
    spark = corpus.sparkSession
    if centroids is None:
        n = corpus.count()
        centroids = train_ivf_centroids(
            corpus, nlist or auto_nlist(n), seed=seed, vec_col=vec_col,
            corpus_count=n,
        )
    if codebooks is None:
        codebooks = train_pq(corpus, m=m, vec_col=vec_col)
    nlist = centroids.shape[0]
    if nprobe is None:
        nprobe = max(1, math.ceil(nlist / 8))

    assign = _probe_udf(spark, centroids, 1)
    probe = _probe_udf(spark, centroids, nprobe)
    enc = pq_encode_udf(spark, codebooks)
    c = corpus.select(
        F.col(id_col).alias("cid"),
        enc(F.col(vec_col)).alias("code"),
        F.explode(assign(F.col(vec_col))).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(probe(F.col(vec_col))).alias("cell"),
    )
    group_cols = ["cell"]
    if max_cell_rows is not None:
        counts = _bucket_block_counts(c, max_cell_rows, group_cols)
        c = c.join(counts, group_cols).withColumn(
            "sub", F.pmod(F.xxhash64(F.col("cid")), F.col("nb")).cast("int")
        ).drop("nb")
        q = q.join(counts, group_cols).withColumn(
            "sub", F.explode(F.sequence(F.lit(0), F.col("nb") - 1))
        ).drop("nb")
        group_cols = ["cell", "sub"]

    r = k * refine_factor
    bc_books = spark.sparkContext.broadcast(codebooks)

    def adc(key, qpdf: pd.DataFrame, cpdf: pd.DataFrame):
        if not len(qpdf) or not len(cpdf):
            return pd.DataFrame(
                {"query_id": [], "cid": [], "adc": []}
            ).astype({"query_id": "int64", "cid": "int64", "adc": "float64"})
        books = bc_books.value
        mm, ksub, dsub = books.shape
        qv = _stack_normalized(qpdf["qv"])  # (nq, dim)
        codes = np.vstack(cpdf["code"].to_numpy())  # (nc, m)
        # LUT[i, j, :] = q_i's subspace-j dot products with codewords
        lut = np.einsum(
            "qjd,jkd->qjk",
            qv.reshape(len(qv), mm, dsub),
            books,
        )  # (nq, m, ksub)
        # approximate cosine = sum_j LUT[q, j, code[c, j]]
        scores = np.zeros((len(qv), len(codes)))
        for j in range(mm):
            scores += lut[:, j, codes[:, j]]
        rr = min(r, scores.shape[1])
        top = np.argpartition(-scores, rr - 1, axis=1)[:, :rr]
        qid = np.repeat(qpdf["query_id"].to_numpy(), rr)
        cid = cpdf["cid"].to_numpy()[top].ravel()
        return pd.DataFrame(
            {"query_id": qid, "cid": cid, "adc": scores[
                np.repeat(np.arange(len(qv)), rr), top.ravel()
            ]}
        )

    cand = (
        q.groupBy(*group_cols)
        .cogroup(c.groupBy(*group_cols))
        .applyInPandas(adc, "query_id long, cid long, adc double")
        .where(F.col("query_id") != F.col("cid"))
        .dropDuplicates(["query_id", "cid"])
    )
    # exact refine: true cosine for the small candidate set only
    from ..functions.vector import cosine_expr

    qv_tbl = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    cv_tbl = corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cid").asc()
    )
    return (
        cand.join(qv_tbl, "query_id")
        .join(cv_tbl, "cid")
        .withColumn("cosine", F.round(cosine_expr(F.col("qv"), F.col("cv")), 6))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", F.col("cid").alias("neighbor_id"), "cosine", "rank"
        )
    )
