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
LSH_PLANES = 6  # h: planes (bits) per table (floor — see auto_geometry)
LSH_TABLES = 6  # L: independent tables (floor — see auto_geometry)

#: Cap on the rows a single (table, bucket[, sub]) group may feed one
#: applyInPandas task. 4096 rows x 64 dim x 8 B ≈ 2 MiB of matrix and a
#: ≤ 4096² GEMM (~128 MiB float64 scores) — far under task memory at
#: any realistic dim. Matches dedup.BLOCK_ROWS so both exact and LSH
#: tiers share one task-size contract.
TARGET_BUCKET_ROWS = 4096


def auto_geometry(
    n: int,
    threshold: float | None = None,
    h_min: int = LSH_PLANES,
    l_base: int = LSH_TABLES,
    target_rows: int = TARGET_BUCKET_ROWS,
    max_tables: int = 64,
) -> tuple[int, int]:
    """Corpus-aware LSH geometry: (n_planes, n_tables) for ``n`` vectors.

    A fixed h gives 2^h buckets per table, so the expected bucket
    population is Θ(n / 2^h) — it grows linearly with the corpus and a
    100x scale-up turns one bucket group into a multi-GiB pandas frame
    (the R2 scale-killer). Here h grows with the corpus so the expected
    bucket holds ≤ ``target_rows`` rows::

        h = max(h_min, ceil(log2(n / target_rows)))

    Raising h shrinks per-bucket collision probability p^h (p is the
    per-plane agreement probability 1 - θ/π at the design angle), so L
    scales up to hold the recall s-curve 1-(1-p^h)^L at its h_min
    value: L = l_base / p^(h - h_min), capped at ``max_tables``.
    ``threshold`` sets the design angle (cosine); None uses cosine 0.5
    (θ=60°, p=2/3) — the conservative ANN regime. True near-dup
    thresholds (0.9+) have p≈0.86+ and scale L far more slowly.
    """
    import math

    h = max(h_min, math.ceil(math.log2(max(1.0, n / target_rows))))
    if threshold is None:
        p = 2.0 / 3.0
    else:
        p = 1.0 - math.acos(min(1.0, max(-1.0, threshold))) / math.pi
    if h <= h_min or p >= 1.0:
        tables = l_base
    else:
        tables = min(max_tables, math.ceil(l_base / (p ** (h - h_min))))
    return h, tables


def _bucket_block_counts(
    b: DataFrame, max_rows: int, cols: list[str] = ("table", "bucket")
) -> DataFrame:
    """Per-group sub-block count nb = ceil(rows / max_rows).

    The aggregation shuffles on the same group key the downstream
    cogroup uses, so AQE plans the join co-partitioned; the driver
    never sees the counts.
    """
    return b.groupBy(*cols).agg(
        F.ceil(F.count(F.lit(1)) / F.lit(float(max_rows))).cast("int").alias("nb")
    )



def _drop_null_vectors(df: DataFrame, vec_col: str) -> DataFrame:
    """Null vectors have no direction — every entry point drops them
    before the numpy kernels (np.vstack on None crashes mid-stage)."""
    return df.where(F.col(vec_col).isNotNull())

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
    pdf = _drop_null_vectors(df, vec_col).select(id_col, vec_col).toPandas()
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
    """Append top-k (rank asc, cosine desc, neighbor_id tiebreak) to rows.

    Compares on round(cosine, 6) — the OUTPUT precision — not raw BLAS
    floats: bitwise-identical candidate vectors can differ in the last
    ulp of a GEMM row depending on blocking, so a full-precision sort
    orders "ties" arbitrarily and the broadcast/distributed tiers
    disagree. Rounding before the lexsort makes the order (rounded
    cosine desc, neighbor_id asc) — the same total order _local_topk
    and _global_topk use — so every tier is bit-identical."""
    top = np.lexsort((cand_ids, -np.round(sims_row, 6)))[:k]
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
    queries = _drop_null_vectors(queries, vec_col)
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
    (query_id, neighbor_id, cosine). Self-pairs must be pre-masked.

    Ties sort by (ROUNDED cosine desc, neighbor_id asc) — NOT
    block-local row order and NOT raw BLAS floats (which differ in the
    last ulp across blockings) — so a per-block top-k boundary cuts
    tied candidates exactly where the global window (_global_topk)
    would, keeping the distributed kernels bit-identical to the
    broadcast ones even when duplicate vectors straddle a block edge."""
    out_q, out_n, out_c = [], [], []
    kk = min(k, sims.shape[1])
    for i in range(sims.shape[0]):
        s = sims[i]
        # primary: rounded cosine desc (output precision); tie: id asc
        top = np.lexsort((c_ids, -np.round(s, 6)))[:kk]
        top = top[s[top] > -np.inf]
        out_q.extend([q_ids[i]] * len(top))
        out_n.extend(c_ids[top])
        out_c.extend(s[top])
    return pd.DataFrame({"query_id": out_q, "neighbor_id": out_n, "cosine": out_c})


def _global_topk(cand: DataFrame, k: int) -> DataFrame:
    """Merge per-bucket/per-block candidates into the global top-k: dedup
    (a pair rediscovered in another bucket carries a bitwise-identical
    cosine), window-rank, round for output.

    The window orders on round(cosine, 6) — the output precision and
    the same comparator _local_topk/_topk_rows use — so the global
    rank order is identical across the broadcast and distributed tiers
    even when per-tier GEMM blockings differ in the last ulp."""
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("cosine", 6)), "neighbor_id"
    )
    return (
        cand.dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.lit(k))
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def _cogrouped_rescore(
    q: DataFrame, c: DataFrame, group_cols: list[str], k: int,
    max_group_rows: int | None,
) -> DataFrame:
    """Shared candidate-rescore tail of every partitioned ANN plan (the
    LSH tier here and the IVF tier in ivf.py): cogroup queries x corpus
    on ``group_cols``, exact float64 GEMM + per-group top-k inside each
    group, global window merge.

    ``max_group_rows`` bounds the WORST-CASE group independently of how
    the partitioner was sized: each group whose corpus population
    exceeds the cap is hash-split into nb = ceil(rows/cap) sub-blocks —
    corpus rows land in one sub-block, query rows replicate across the
    group's sub-blocks, and the cogroup key gains the sub id — so no
    task ever materializes an unbounded pandas frame. Per-pair cosines
    are bitwise-equal across sub-blocks, so the merge is unchanged.

    ``q``: (query_id, qv, *group_cols); ``c``: (cid, cv, *group_cols).
    Query rows whose group holds no corpus rows drop at the inner count
    join — they had no candidates to score anyway.
    """
    if max_group_rows is not None:
        counts = _bucket_block_counts(c, max_group_rows, group_cols)
        c = c.join(counts, group_cols).withColumn(
            "sub", F.pmod(F.xxhash64(F.col("cid")), F.col("nb")).cast("int")
        ).drop("nb")
        q = q.join(counts, group_cols).withColumn(
            "sub", F.explode(F.sequence(F.lit(0), F.col("nb") - 1))
        ).drop("nb")
        group_cols = [*group_cols, "sub"]

    def kernel(key, qpdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        if not len(qpdf) or not len(cpdf):
            return pd.DataFrame({"query_id": [], "neighbor_id": [], "cosine": []})
        q_ids = qpdf["query_id"].to_numpy()
        c_ids = cpdf["cid"].to_numpy()
        sims = _stack_normalized(qpdf["qv"]) @ _stack_normalized(cpdf["cv"]).T
        sims[q_ids[:, None] == c_ids[None, :]] = -np.inf  # exclude self
        return _local_topk(q_ids, sims, c_ids, k)

    cand = (
        q.groupby(*group_cols)
        .cogroup(c.groupby(*group_cols))
        .applyInPandas(kernel, "query_id long, neighbor_id long, cosine double")
    )
    return _global_topk(cand, k)


def brute_force_topk_distributed(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    rows_per_block: int = BLOCK_ROWS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_replicated_rows: int = 50_000_000,
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

    The |queries| x n_blocks fan-out is quadratic when the query set is
    corpus-sized, so it is guarded: past ``max_replicated_rows``
    replicated query rows the call refuses and points at
    ``lsh_partitioned_topk``, whose bucket join scales in n, not n².
    """
    queries = _drop_null_vectors(queries, vec_col)
    corpus = _drop_null_vectors(corpus, vec_col)
    nb = _n_blocks(corpus, rows_per_block)
    nq = queries.count()
    if nq * nb > max_replicated_rows:
        raise ValueError(
            f"brute_force_topk_distributed would replicate {nq} query rows "
            f"across {nb} corpus blocks ({nq * nb:,} rows > "
            f"{max_replicated_rows:,}); this exact path is for probe-sized "
            "query sets — use lsh_partitioned_topk for corpus-scale ANN."
        )
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
    n_planes: int | None = None,
    n_tables: int | None = None,
    probes: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_rows: int | None = TARGET_BUCKET_ROWS,
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

    Scale safety is two-layered. With ``n_planes=None`` the geometry is
    corpus-aware (``auto_geometry``: planes grow with |corpus| so the
    EXPECTED bucket stays under ``TARGET_BUCKET_ROWS``, tables grow to
    hold recall). Independently, ``max_bucket_rows`` bounds the WORST
    CASE: each (table, bucket) whose population exceeds the cap is
    hash-split into nb = ceil(rows/cap) sub-blocks; corpus rows land in
    one sub-block, query probes replicate across the bucket's
    sub-blocks, and the cogroup key gains the sub id — so no task ever
    materializes an unbounded pandas frame, even under geometry
    mis-sizing or duplicate-heavy corpora. Per-pair cosines are
    bitwise-equal across sub-blocks, so the global merge is unchanged.
    """
    queries = _drop_null_vectors(queries, vec_col)
    corpus = _drop_null_vectors(corpus, vec_col)
    if n_planes is None or n_tables is None:
        auto_h, auto_l = auto_geometry(corpus.count())
        n_planes = n_planes if n_planes is not None else auto_h
        n_tables = n_tables if n_tables is not None else auto_l
    if n_planes == 0:
        # Degenerate geometry (R15): with zero hyperplanes every vector's
        # bucket id is 0 in every table by construction (bucket_ids with
        # an empty weight vector is identically zero), so the pandas UDF
        # would launch two Arrow stages just to emit constants — and the
        # Hamming-1 probe set is empty. Emit the constant (table, bucket)
        # columns as codegen'd literals instead; the cogroup/rescore tail
        # below is unchanged, so output is bit-identical. This is the
        # exact-by-construction tier sim2_sim3 declares.
        zeros = F.array(*[F.lit(0).cast("long") for _ in range(n_tables)])
        c = corpus.select(
            F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"),
            F.posexplode(zeros).alias("table", "bucket"),
        )
        q = queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
            F.posexplode(zeros).alias("table", "bucket"),
        )
        return _cogrouped_rescore(q, c, ["table", "bucket"], k, max_bucket_rows)
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

    return _cogrouped_rescore(q, c, ["table", "bucket"], k, max_bucket_rows)


def lsh_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    n_planes: int | None = None,
    n_tables: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_rows: int | None = TARGET_BUCKET_ROWS,
) -> DataFrame:
    """Distributed LSH-bucketed near-duplicate pairs: group vectors by
    (table, bucket), all-pairs GEMM only WITHIN buckets, dedup across
    tables. Precision 1.0 (exact rescore); recall = 1-(1-p^h)^L with
    p = 1 - theta/pi. With ``n_planes=None`` the geometry is sized by
    ``auto_geometry`` (planes from |corpus| and the EXPECTED bucket
    cap, tables from the threshold's design angle); explicit values
    override (the 0.9+ true-near-dup regime prunes hard at the
    defaults, while low thresholds need fewer planes / more tables —
    see the test suite's geometry for the fixture's 0.4).

    ``max_bucket_rows`` bounds the WORST-CASE group independently of
    geometry: an oversized (table, bucket) is hash-split into
    nb = ceil(rows/cap) sub-blocks and its all-pairs GEMM decomposes
    into the nb·(nb+1)/2 sub-block PAIRS (the dd5 block-pair shape,
    dedup.embedding_neardup_pairs_blocked) — each row replicates nb
    times, every unordered row pair lands in exactly one (p1, p2)
    group, and no task frame exceeds ~2x the cap even when the corpus
    is one giant duplicate cluster."""
    emb = _drop_null_vectors(emb, vec_col)
    if n_planes is None or n_tables is None:
        auto_h, auto_l = auto_geometry(emb.count(), threshold=threshold)
        n_planes = n_planes if n_planes is not None else auto_h
        n_tables = n_tables if n_tables is not None else auto_l
    buckets_udf = lsh_bucket_udf(n_planes, n_tables)
    b = _bucketed(emb, "id", "v", buckets_udf, id_col, vec_col)
    pairs = _within_group_pairs(b, ["table", "bucket"], threshold, max_bucket_rows)
    return pairs.dropDuplicates(["a_id", "b_id"]).select(
        "a_id", "b_id", F.round("cosine", 6).alias("cosine")
    )


def _within_group_pairs(
    b: DataFrame,
    group_cols: list[str],
    threshold: float,
    max_bucket_rows: int | None,
) -> DataFrame:
    """All pairs at cosine >= threshold WITHIN each group of ``b``
    (columns: id, v, *group_cols) via per-group GEMM — the shared
    kernel behind LSH-bucket near-dup (groups = (table, bucket)) and
    semantic dedup (groups = cluster). ``max_bucket_rows`` bounds the
    worst-case task frame by hash-splitting oversized groups into
    sub-blocks and decomposing the all-pairs GEMM into sub-block pairs
    (each unordered row pair lands in exactly one (p1, p2) group)."""
    group_cols = list(group_cols)
    if max_bucket_rows is None:

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

        return b.groupby(*group_cols).applyInPandas(
            kernel, "a_id long, b_id long, cosine double"
        )

    counts = _bucket_block_counts(b, max_bucket_rows, group_cols)
    # Row with sub-block s meets sub-block t in group (min(s,t),
    # max(s,t)): exploding t over 0..nb-1 lands each row in its nb
    # pair-groups and each unordered row pair in exactly one group.
    bs = (
        b.join(counts, group_cols)
        .withColumn("sub", F.pmod(F.xxhash64(F.col("id")), F.col("nb")).cast("int"))
        .withColumn("t", F.explode(F.sequence(F.lit(0), F.col("nb") - 1)))
        .select(
            "id", "v", *group_cols, "sub",
            F.least("sub", "t").alias("p1"),
            F.greatest("sub", "t").alias("p2"),
        )
    )

    def pair_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a_id": [], "b_id": [], "cosine": []})
        if len(pdf) < 2:
            return empty
        p1, p2 = pdf["p1"].iat[0], pdf["p2"].iat[0]
        if p1 == p2:
            ids = pdf["id"].to_numpy()
            mat = _stack_normalized(pdf["v"])
            sims = mat @ mat.T
            ii, jj = np.nonzero(
                (sims >= threshold) & (ids[:, None] < ids[None, :])
            )
            return pd.DataFrame(
                {"a_id": ids[ii], "b_id": ids[jj], "cosine": sims[ii, jj]}
            )
        left = pdf[pdf["sub"] == p1]
        right = pdf[pdf["sub"] == p2]
        if not len(left) or not len(right):
            return empty
        l_ids = left["id"].to_numpy()
        r_ids = right["id"].to_numpy()
        sims = _stack_normalized(left["v"]) @ _stack_normalized(right["v"]).T
        ii, jj = np.nonzero(sims >= threshold)
        la, rb = l_ids[ii], r_ids[jj]
        return pd.DataFrame(
            {
                "a_id": np.minimum(la, rb),
                "b_id": np.maximum(la, rb),
                "cosine": sims[ii, jj],
            }
        )

    return bs.groupby(*group_cols, "p1", "p2").applyInPandas(
        pair_kernel, "a_id long, b_id long, cosine double"
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
    collected: tuple | None = None,
    query_partitions: int | None = None,
) -> DataFrame:
    """Approximate cosine top-k via multi-table sign-LSH + exact rescore
    of the candidate union. With ``probes``, each table also searches
    its ``n_planes`` Hamming-1 buckets (single-bit flips). Hyperplane
    dimension is inferred from the corpus.

    ``collected`` (R15): a precollected ``collect_normalized_matrix``
    result for ``corpus`` — callers running several broadcast-tier
    searches over the SAME corpus in one composition (sim2_sim3 runs
    two) pass it so the corpus is collected to the driver once, not
    once per call. Must be the matrix of exactly this ``corpus``.

    ``query_partitions`` (R15, VERDICT r14 #5): upper-bounds the query
    repartition when the caller KNOWS the query frame is tiny — the
    default spreads queries over spark.sql.shuffle.partitions python
    tasks, which for a probe-sized query set (sim2_sim3's 20 rows)
    launches ~32 mostly-empty Arrow workers that each deserialize the
    corpus broadcast. Output is identical for any value (the kernel is
    per-row)."""
    queries = _drop_null_vectors(queries, vec_col)
    spark = corpus.sparkSession
    c_ids, c_mat = (
        collected
        if collected is not None
        else collect_normalized_matrix(corpus, id_col, vec_col)
    )
    planes = _hyperplanes(c_mat.shape[1], n_planes, n_tables)
    c_buckets = bucket_ids(c_mat, planes)  # (L, n)
    bc = spark.sparkContext.broadcast((c_ids, c_mat, c_buckets, planes))
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    if query_partitions is not None:
        n_parts = max(1, min(n_parts, query_partitions))
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


# ---------------------------------------------------------------------------
# semantic dedup (SemDeDup)
# ---------------------------------------------------------------------------


def cluster_assign_udf(centroids: np.ndarray):
    """Vectorized nearest-centroid assignment by cosine (k-means on
    unit vectors): each Arrow batch scores with one (batch x dim) @
    (dim x k) matmul against the broadcast-by-closure centroid matrix.
    The same assignment rule as IVF's coarse quantizer at nprobe=1."""
    from pyspark.sql.functions import pandas_udf

    cn = np.asarray(centroids, dtype=np.float64)
    cn = cn / np.maximum(np.linalg.norm(cn, axis=1, keepdims=True), 1e-12)

    @pandas_udf("int")
    def assign(v: pd.Series) -> pd.Series:
        mat = _stack_normalized(v)
        return pd.Series(np.argmax(mat @ cn.T, axis=1).astype(np.int32))

    return assign


def semantic_dedup_pairs(
    emb: DataFrame,
    centroids: np.ndarray,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_rows: int | None = TARGET_BUCKET_ROWS,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): cluster embeddings
    with k-means, then find near-duplicate pairs ONLY within each
    cluster — the web-scale semantic-dedup recipe (used on LAION to
    drop ~50% of data with no quality loss). Cluster-local search is
    the entire point: candidate work drops from n²/2 to
    sum_c |c|²/2, and each cluster's GEMM is an independent task.

    Spark shape: one vectorized assignment pass (``cluster_assign_udf``
    — the IVF coarse quantizer at nprobe=1, so IVF centroids trained
    for sim4 / loaded from the artifact cache are reusable here), then
    the SAME per-group GEMM kernel as ``lsh_neardup_pairs``
    (``_within_group_pairs``), with oversized clusters hash-split into
    bounded sub-blocks — a giant cluster cannot OOM a task.

    The documented recall trade vs exact dd5: a pair whose members
    land in DIFFERENT clusters is missed (boundary-straddlers). More
    clusters = faster and more misses; SemDeDup's published operating
    point accepts this because true semantic duplicates sit far inside
    cluster cores. For exact pairs use dd5
    (``dedup.embedding_neardup_pairs_blocked``); for hash-geometry
    recall control use ``lsh_neardup_pairs``.

    Columns: a_id, b_id (a_id < b_id), cosine.
    """
    emb = _drop_null_vectors(emb, vec_col)
    assign = cluster_assign_udf(centroids)
    b = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        assign(F.col(vec_col)).alias("cluster"),
    )
    pairs = _within_group_pairs(b, ["cluster"], threshold, max_cluster_rows)
    return pairs.select("a_id", "b_id", F.round("cosine", 6).alias("cosine"))


def semantic_dedup(
    emb: DataFrame,
    centroids: np.ndarray,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_rows: int | None = TARGET_BUCKET_ROWS,
) -> DataFrame:
    """The resolved SemDeDup keep-set: drop every vector that pairs (at
    cosine >= threshold, within its cluster) with a lower-id vector —
    keep-min-id, one anti-join, same resolution rule as dd6."""
    pairs = semantic_dedup_pairs(
        emb, centroids, threshold, id_col, vec_col, max_cluster_rows
    )
    drop = pairs.select(F.col("b_id").alias(id_col)).dropDuplicates()
    return emb.join(drop, id_col, "left_anti")
