"""Approximate-nearest-neighbor similarity search over embedding
columns (north-star extension, SURVEY §2.11).

Two tiers, per the brief:

* ``brute_force_topk`` — exact cosine top-k, GEMM-shaped: the corpus
  ships ONCE as a broadcast (ids, normalized float64 matrix) pair;
  query rows stream through ``mapInPandas`` and each Arrow batch scores
  with one (batch x dim) @ (dim x corpus) BLAS matmul. Correct at any
  query count; the baseline and rescorer for the approximate path.
* ``lsh_bucketed_topk`` — multi-table random-hyperplane (sign) LSH:
  L independent tables of h seeded hyperplanes each -> L h-bit bucket
  ids per vector, corpus buckets precomputed once on the broadcast
  matrix; each query probes, per table, its own bucket plus the h
  single-bit-flip buckets (multi-probe) and rescores ONLY the union of
  candidates — compute drops from |corpus| to |candidates| per query.
  Recall for a neighbor at angle θ (p = 1-θ/π per plane) is
  1-(1-p_probe^h)^L; the defaults (h=6, L=6, probes on) hold ~0.8
  recall even at θ≈70° (weakly similar vectors); raise h for corpora
  with true near-duplicate structure to prune harder.

Why not a DataFrame pair-join: moving two dim-length vectors per
candidate pair through Arrow/shuffle is dim x more bytes than the
inputs contain; and evaluating pandas UDFs beneath a BroadcastExchange
build thread intermittently stalls against the python worker pool
(observed 300s hangs ≈ spark.sql.broadcastTimeout). The broadcast-
matrix + mapInPandas shape moves each vector once and keeps every UDF
in a plain stage.

Scale bounds, stated: the corpus broadcast is ~dim x 8 bytes per vector
(64-dim -> ~0.5 GiB at 1M vectors) — beyond that, shard the corpus by
bucket (repartition on the bucket id) and run this same kernel
per-shard with a shuffle instead of a broadcast; the kernel is
unchanged. Hyperplanes derive from a fixed numpy seed — deterministic
across runs and executors (SURVEY §7 hard-part 2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LSH_SEED = 42
LSH_PLANES = 6  # h: planes (bits) per table
LSH_TABLES = 6  # L: independent tables


def collect_normalized_matrix(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
):
    """Collect a vector table to the driver as (ids, row-normalized
    float64 matrix) for broadcasting, ids sorted ascending so ties in
    cosine break deterministically by neighbor_id.

    This is the ONE deliberate driver materialization in the engine: a
    GEMM shard must be dense in memory somewhere, and it is
    broadcast-sized by contract (see module docstring for the sharded
    alternative beyond ~1M vectors).
    """
    pdf = df.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy()
    mat = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
    order = np.argsort(ids, kind="stable")
    ids, mat = ids[order], mat[order]
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return ids, mat / norms


def _stack_normalized(series: pd.Series) -> np.ndarray:
    mat = np.vstack([np.asarray(v, dtype=np.float64) for v in series])
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _topk_rows(qid, sims_row: np.ndarray, cand_ids: np.ndarray, k: int, rows: dict):
    """Append top-k (rank asc, cosine desc, neighbor_id tiebreak) to rows."""
    top = np.argsort(-sims_row, kind="stable")[:k]
    for rank, j in enumerate(top, start=1):
        if sims_row[j] == -np.inf:
            continue
        rows["query_id"].append(qid)
        rows["neighbor_id"].append(cand_ids[j])
        rows["cosine"].append(round(float(sims_row[j]), 6))
        rows["rank"].append(rank)


TOPK_SCHEMA = "query_id long, neighbor_id long, cosine double, rank int"


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Output: (query_id, neighbor_id, cosine, rank); self-matches
    excluded; ties broken by neighbor_id (total order).
    """
    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast(collect_normalized_matrix(corpus, id_col, vec_col))
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    def gen(batches):
        c_ids, c_mat = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            q_ids = pdf["query_id"].to_numpy()
            sims = _stack_normalized(pdf["qv"]) @ c_mat.T  # (nq, nc)
            rows = {"query_id": [], "neighbor_id": [], "cosine": [], "rank": []}
            for i, qid in enumerate(q_ids):
                s = sims[i]
                s[c_ids == qid] = -np.inf  # exclude self
                _topk_rows(qid, s, c_ids, k, rows)
            yield pd.DataFrame(rows)

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).repartition(n_parts)
    return q.mapInPandas(gen, TOPK_SCHEMA)


def _hyperplanes(
    dim: int, n_planes: int = LSH_PLANES, n_tables: int = LSH_TABLES, seed: int = LSH_SEED
) -> np.ndarray:
    """(L, h, dim) stack of seeded hyperplanes, one table per leading axis."""
    return np.stack(
        [np.random.RandomState(seed + t).randn(n_planes, dim) for t in range(n_tables)]
    )


def bucket_ids(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Sign-LSH buckets. ``planes`` is (h, dim) -> (n,) ids, or
    (L, h, dim) -> (L, n) ids (one row of ids per table)."""
    if planes.ndim == 2:
        weights = (1 << np.arange(planes.shape[0])).astype(np.int64)
        return ((mat @ planes.T) >= 0) @ weights
    return np.stack([bucket_ids(mat, p) for p in planes])


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_planes: int = LSH_PLANES,
    n_tables: int = LSH_TABLES,
    probes: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k via multi-table sign-LSH + exact rescore
    of the candidate union. With ``probes``, each table also searches
    its ``n_planes`` Hamming-1 buckets (single-bit flips)."""
    spark = corpus.sparkSession
    c_ids, c_mat = collect_normalized_matrix(corpus, id_col, vec_col)
    planes = _hyperplanes(dim, n_planes, n_tables)
    c_buckets = bucket_ids(c_mat, planes)  # (L, n)
    bc = spark.sparkContext.broadcast((c_ids, c_mat, c_buckets, planes))
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    flip_masks = np.int64(1) << np.arange(n_planes, dtype=np.int64)

    def gen(batches):
        ids_c, mat_c, buckets_c, planes_w = bc.value
        n_tab = buckets_c.shape[0]
        for pdf in batches:
            if not len(pdf):
                continue
            q_ids = pdf["query_id"].to_numpy()
            q_mat = _stack_normalized(pdf["qv"])
            q_buckets = bucket_ids(q_mat, planes_w)  # (L, nq)
            rows = {"query_id": [], "neighbor_id": [], "cosine": [], "rank": []}
            for i, qid in enumerate(q_ids):
                cand = np.zeros(len(ids_c), dtype=bool)
                for t in range(n_tab):
                    qb = q_buckets[t, i]
                    probe = (
                        np.concatenate(([qb], qb ^ flip_masks))
                        if probes
                        else np.array([qb])
                    )
                    cand |= np.isin(buckets_c[t], probe)
                cand &= ids_c != qid
                if not cand.any():
                    continue
                cand_idx = np.nonzero(cand)[0]
                sims = mat_c[cand_idx] @ q_mat[i]  # rescore candidates only
                _topk_rows(qid, sims, ids_c[cand_idx], k, rows)
            yield pd.DataFrame(rows)

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).repartition(n_parts)
    return q.mapInPandas(gen, TOPK_SCHEMA)
