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

The broadcast kernels cap out where the corpus stops fitting on one
node (~dim x 8 bytes per vector: 64-dim -> ~0.5 GiB at 1M vectors).
Past that, the DISTRIBUTED tier below keeps the same GEMM kernel but
shards it with shuffles instead of a broadcast — no driver
materialization anywhere in its plan:

* ``brute_force_topk_distributed`` — exact: corpus hashed into blocks
  sized to fit one task; queries replicate once per block (cogroup on
  block id); per-block GEMM emits a local top-k per query; a global
  window top-k merges. The corpus moves ONCE; only queries fan out.
* ``lsh_partitioned_topk`` — ANN: per-table sign-LSH bucket ids are
  computed as DataFrame columns (a vectorized pandas UDF regenerates
  the seeded hyperplanes from the observed dim — nothing is broadcast),
  multi-probe buckets derive by Column-level bit flips, and a cogroup
  on (table, bucket) runs the GEMM rescore inside each bucket.
* ``lsh_neardup_pairs`` (dedup scale path) — self-grouped per-bucket
  all-pairs GEMM; precision 1.0 by construction (exact rescore), recall
  governed by the (planes, tables) s-curve.

Hyperplanes derive from a fixed numpy seed and the observed vector
dimension — deterministic across runs and executors (SURVEY §7
hard-part 2).
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


# ---------------------------------------------------------------------------
# distributed tier — no driver materialization anywhere in these plans
# ---------------------------------------------------------------------------

#: Rows per corpus block for the exact distributed paths. Sized so one
#: block's float64 matrix (~rows x dim x 8B: 4096 x 64 -> 2 MiB) plus the
#: GEMM output stays far under a task's memory at any dim that fits a row.
BLOCK_ROWS = 4096


def _n_blocks(corpus: DataFrame, rows_per_block: int) -> int:
    """ceil(|corpus| / rows_per_block); the count is the one scalar the
    driver learns — O(1) driver memory regardless of corpus size."""
    n = corpus.count()
    return max(1, -(-n // rows_per_block))


def _local_topk(
    q_ids: np.ndarray, sims: np.ndarray, c_ids: np.ndarray, k: int
) -> pd.DataFrame:
    """Per-query top-k of a (nq, nc) score matrix -> candidate rows
    (query_id, neighbor_id, cosine). Self-pairs must be pre-masked."""
    out_q, out_n, out_c = [], [], []
    kk = min(k, sims.shape[1])
    for i in range(sims.shape[0]):
        s = sims[i]
        top = np.argsort(-s, kind="stable")[:kk]
        top = top[s[top] > -np.inf]
        out_q.extend([q_ids[i]] * len(top))
        out_n.extend(c_ids[top])
        out_c.extend(s[top])
    return pd.DataFrame({"query_id": out_q, "neighbor_id": out_n, "cosine": out_c})


def _global_topk(cand: DataFrame, k: int) -> DataFrame:
    """Merge per-bucket/per-block candidates into the global top-k: dedup
    (a pair rediscovered in another bucket carries a bitwise-identical
    cosine), window-rank, round for output."""
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        cand.dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.lit(k))
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def brute_force_topk_distributed(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    rows_per_block: int = BLOCK_ROWS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k with the corpus sharded into hash blocks
    instead of broadcast — the 100 TB-safe exact path.

    Shape: corpus rows shuffle ONCE on block id; query rows replicate
    once per block (queries are the small side by assumption — the
    reference gesture is a handful of probe vectors, mapping.py:97-103).
    Each (block) cogroup GEMMs queries x block and emits a per-block
    top-k per query; the global top-k is their merge, valid because the
    global i-th best neighbor is within the top-k of whichever block
    holds it. Output matches brute_force_topk bit-for-bit.
    """
    nb = _n_blocks(corpus, rows_per_block)
    c = corpus.select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cv")
    ).withColumn("b", F.pmod(F.xxhash64(F.col("cid")), F.lit(nb)))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("b", F.explode(F.sequence(F.lit(0), F.lit(nb - 1))))

    def kernel(key, qpdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        if not len(qpdf) or not len(cpdf):
            return pd.DataFrame({"query_id": [], "neighbor_id": [], "cosine": []})
        q_ids = qpdf["query_id"].to_numpy()
        c_ids = cpdf["cid"].to_numpy()
        sims = _stack_normalized(qpdf["qv"]) @ _stack_normalized(cpdf["cv"]).T
        sims[q_ids[:, None] == c_ids[None, :]] = -np.inf  # exclude self
        return _local_topk(q_ids, sims, c_ids, k)

    cand = (
        q.groupby("b")
        .cogroup(c.groupby("b"))
        .applyInPandas(kernel, "query_id long, neighbor_id long, cosine double")
    )
    return _global_topk(cand, k)


def lsh_bucket_udf(
    n_planes: int = LSH_PLANES, n_tables: int = LSH_TABLES, seed: int = LSH_SEED
):
    """Vectorized pandas UDF: embedding -> array of n_tables sign-LSH
    bucket ids. The hyperplanes regenerate deterministically inside each
    executor from (seed, observed dim) — KB-sized, nothing broadcast,
    works for any embedding dimension."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    @pandas_udf(ArrayType(LongType()))
    def buckets(emb: pd.Series) -> pd.Series:
        mat = np.vstack([np.asarray(v, dtype=np.float64) for v in emb])
        planes = _hyperplanes(mat.shape[1], n_planes, n_tables, seed)
        ids = bucket_ids(mat, planes)  # (L, n)
        return pd.Series(list(ids.T))

    return buckets


def _bucketed(
    df: DataFrame, id_alias: str, vec_alias: str, buckets_udf,
    id_col: str, vec_col: str,
) -> DataFrame:
    """(id, vec, table, bucket) rows — one per (vector, LSH table)."""
    return df.select(
        F.col(id_col).alias(id_alias),
        F.col(vec_col).alias(vec_alias),
        F.posexplode(buckets_udf(F.col(vec_col))).alias("table", "bucket"),
    )


def lsh_partitioned_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = LSH_PLANES,
    n_tables: int = LSH_TABLES,
    probes: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed ANN top-k: the scale path the broadcast
    ``lsh_bucketed_topk`` approximates on one node.

    Plan: corpus and queries each gain (table, bucket) columns from the
    seeded-hyperplane UDF; query probes additionally fan out to the
    n_planes Hamming-1 buckets via Column-level bit flips (multi-probe);
    a cogroup on (table, bucket) runs the exact GEMM rescore inside each
    bucket and emits a local top-k; a window merges globally. Shuffle
    keys are uniform by construction (sign bits of random projections).
    Recall follows the same s-curve as the broadcast variant.
    """
    buckets_udf = lsh_bucket_udf(n_planes, n_tables)
    c = _bucketed(corpus, "cid", "cv", buckets_udf, id_col, vec_col)
    q = _bucketed(queries, "query_id", "qv", buckets_udf, id_col, vec_col)
    if probes:
        probe_arr = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << j)) for j in range(n_planes)],
        )
        q = q.select(
            "query_id", "qv", "table", F.explode(probe_arr).alias("bucket")
        )

    def kernel(key, qpdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        if not len(qpdf) or not len(cpdf):
            return pd.DataFrame({"query_id": [], "neighbor_id": [], "cosine": []})
        q_ids = qpdf["query_id"].to_numpy()
        c_ids = cpdf["cid"].to_numpy()
        sims = _stack_normalized(qpdf["qv"]) @ _stack_normalized(cpdf["cv"]).T
        sims[q_ids[:, None] == c_ids[None, :]] = -np.inf
        return _local_topk(q_ids, sims, c_ids, k)

    cand = (
        q.groupby("table", "bucket")
        .cogroup(c.groupby("table", "bucket"))
        .applyInPandas(kernel, "query_id long, neighbor_id long, cosine double")
    )
    return _global_topk(cand, k)


def lsh_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    n_planes: int = LSH_PLANES,
    n_tables: int = LSH_TABLES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed LSH-bucketed near-duplicate pairs: group vectors by
    (table, bucket), all-pairs GEMM only WITHIN buckets, dedup across
    tables. Precision 1.0 (exact rescore); recall = 1-(1-p^h)^L with
    p = 1 - theta/pi, so size (n_planes, n_tables) to the threshold:
    the 0.9+ true-near-dup regime prunes hard at the defaults, while
    low thresholds need fewer planes / more tables (see the test suite's
    geometry for the fixture's 0.4)."""
    buckets_udf = lsh_bucket_udf(n_planes, n_tables)
    b = _bucketed(emb, "id", "v", buckets_udf, id_col, vec_col)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"a_id": [], "b_id": [], "cosine": []})
        ids = pdf["id"].to_numpy()
        mat = _stack_normalized(pdf["v"])
        sims = mat @ mat.T
        ii, jj = np.nonzero((sims >= threshold) & (ids[:, None] < ids[None, :]))
        return pd.DataFrame(
            {"a_id": ids[ii], "b_id": ids[jj], "cosine": sims[ii, jj]}
        )

    pairs = b.groupby("table", "bucket").applyInPandas(
        kernel, "a_id long, b_id long, cosine double"
    )
    return pairs.dropDuplicates(["a_id", "b_id"]).select(
        "a_id", "b_id", F.round("cosine", 6).alias("cosine")
    )


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
    n_planes: int = LSH_PLANES,
    n_tables: int = LSH_TABLES,
    probes: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k via multi-table sign-LSH + exact rescore
    of the candidate union. With ``probes``, each table also searches
    its ``n_planes`` Hamming-1 buckets (single-bit flips). Hyperplane
    dimension is inferred from the corpus."""
    spark = corpus.sparkSession
    c_ids, c_mat = collect_normalized_matrix(corpus, id_col, vec_col)
    planes = _hyperplanes(c_mat.shape[1], n_planes, n_tables)
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
