"""Declared queries for the north-star operators (SURVEY §2.11):
dedup family, similarity search, text analysis, multimodal columns.

Oracle notes: the DuckDB formulations mirror the Spark expressions
exactly — same tokenization (split on \\s+ of lowered text, empties
dropped), same shingling (distinct word 3-grams, whole-text fallback
under 3 tokens), same rounding. Learned/hashed operators (MinHash,
SimHash, sign-LSH) are not SQL-expressible — they carry rows-only
checks here and recall/precision assertions in tests/test_dedup.py and
tests/test_similarity.py against the exact operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_zero_spark.catalog import load_table
from etl_zero_spark.operators import dedup, ivf, multimodal, similarity, text
from etl_zero_spark.plans.registry import query

# DuckDB CTE fragments shared by several oracles.
_DUCK_TOKENS = r"""
words AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS w
  FROM documents
)"""

_DUCK_SHINGLES = (
    _DUCK_TOKENS
    + r""",
sh AS (
  SELECT doc_id,
         CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
              ELSE list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                  for i in range(1, len(w) - 1)])
         END AS shingles
  FROM words
)"""
)

_DUCK_FLAT_EMB = r"""
flat AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS idx,
         CAST(unnest(embedding) AS DOUBLE) AS val
  FROM embeddings
),
norms AS (SELECT vec_id, sqrt(sum(val * val)) AS nrm FROM flat GROUP BY 1)"""


def _fanin(df: DataFrame, reliable: bool | None = None) -> DataFrame:
    """Materialize a small fan-in frame once per invocation (eager
    checkpoint) — R14 optimization round.

    Every audit composition references its expensive intermediates
    (pair sets, top-k lists) two to four times: the declared rows plus
    the precision/recall boolean subqueries. Spark re-executes the
    whole subtree per reference — AQE's exchange reuse does not bridge
    the differing parents — so dd3-style queries were paying the LSH +
    exact pipelines 2-4x per run. These frames are candidate-bounded
    (pairs / top-k), orders of magnitude smaller than the corpus that
    produced them, so one checkpoint computes the subtree once and
    every consumer reads the materialized blocks; truncating the
    lineage also keeps the final union's plan (and its planning time)
    small. Fresh per call: nothing is persisted across bench reps or
    driver runs — the checkpoint blocks are freed when the JVM
    garbage-collects the checkpointed RDD (ContextCleaner), so within
    one long session they linger only until the next GC.

    ``reliable`` mirrors connected_components' use_reliable_checkpoint
    (VERDICT r14 #8): a localCheckpoint is executor-local, so on a real
    cluster losing an executor mid-query kills the job unrecoverably —
    production audit runs should route through the reliable checkpoint
    store (``spark.sparkContext.setCheckpointDir`` must be set). The
    default (None) reads SPARK_GRAFT_RELIABLE_FANIN (off unless '1') so
    a cluster deployment can flip every audit composition at once
    without touching call sites; the bench contract default stays
    localCheckpoint."""
    if reliable is None:
        import os

        reliable = os.environ.get("SPARK_GRAFT_RELIABLE_FANIN") == "1"
    if reliable:
        return df.checkpoint(eager=True)
    return df.localCheckpoint()


def _fanin_parallel(*dfs: DataFrame, reliable: bool | None = None) -> list[DataFrame]:
    """_fanin for several INDEPENDENT frames at once, overlapped from a
    small driver thread pool (guide §2.6: actions are only sequential
    because the driver calls them sequentially). A single _fanin per
    frame serializes pipelines that share no lineage — dd3's LSH pair
    set and its exact twin, dd9's incremental probe and its all-pairs
    oracle — so the audit rows were paying sum-of-pipelines wall time
    where max-of-pipelines is available on an idle-core host. Each
    checkpoint is still per-invocation and self-contained."""
    from concurrent.futures import ThreadPoolExecutor

    if len(dfs) == 1:
        return [_fanin(dfs[0], reliable=reliable)]
    with ThreadPoolExecutor(max_workers=len(dfs)) as pool:
        return list(pool.map(lambda d: _fanin(d, reliable=reliable), dfs))


# ---------------------------------------------------------------------------
# dedup family
# ---------------------------------------------------------------------------

#: dd2's stop-shingle set, resolved ONCE per corpus and reused by
#: every ngram-Jaccard consumer (dd2/dd6/dd7): the cap stays active —
#: the set is what the cap's probe would discover — but a recurring
#: pipeline no longer re-pays corpus-wide discovery per invocation
#: (the r4 warm-bench regression). R6 (VERDICT r5 #3): the set now
#: PERSISTS via functions/artifacts keyed on corpus file identity
#: (path + size + mtime + shingle geometry), like IVF centroids / PQ
#: codebooks / BPE merges — a fresh process loads instead of re-paying
#: the corpus-wide probe aggregation. The module dict stays as an L1
#: over the on-disk artifact (skips even the manifest read per call).
_STOP_SHINGLES: dict[str, list[str] | None] = {}

_STOP_DF_CAP = 10_000


def _stop_shingles_cached(spark: SparkSession, sf_dir: str) -> list[str] | None:
    if sf_dir not in _STOP_SHINGLES:
        import os

        from etl_zero_spark.functions.artifacts import (
            cached_artifact,
            corpus_key,
        )

        # Content identity via the SHARED corpus_key helper (part-file
        # listing + edge-sample hash, R8 — ADVICE r6 #1 / VERDICT r7
        # #7): a corpus regenerated in place must retrain, and a stale
        # stop set would also silently disable ngram_jaccard_pairs'
        # max_exact_docs guard (an explicit stop set skips the probe).
        params = corpus_key(
            os.path.join(sf_dir, "documents.parquet"),
            k=3,
            df_cap=_STOP_DF_CAP,
        )
        # an overflowed probe (None = stop set too big to broadcast) is
        # persisted as {"overflow": true} — valid to cache: it is a
        # property of the same corpus identity the key pins.
        payload = cached_artifact(
            "stop_shingles",
            params,
            lambda: (
                lambda s: {"overflow": True} if s is None else {"stop": s}
            )(
                dedup.compute_stop_shingles(
                    load_table(spark, sf_dir, "documents"), df_cap=_STOP_DF_CAP
                )
            ),
        )
        _STOP_SHINGLES[sf_dir] = (
            None if payload.get("overflow") else list(payload["stop"])
        )
    return _STOP_SHINGLES[sf_dir]


def _jaccard_pairs_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(
        docs, threshold=0.3, stop_shingles=_stop_shingles_cached(spark, sf_dir)
    )


@query(
    "dd1_exact_dedup",
    "dedup: exact (hash-groupBy keep-min-id)",
    "SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text",
    "Exact text dedup keeping the smallest doc_id per group.",
)
def dd1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # exact_dedup keeps the full smallest-id row (R7); the declared
    # oracle pins the (doc_id, text) projection
    return dedup.exact_dedup(docs).select("doc_id", "text")


@query(
    "dd2_ngram_jaccard_pairs",
    "dedup: exact n-gram Jaccard pairs",
    f"""
    WITH {_DUCK_SHINGLES},
    pairs AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             len(list_intersect(a.shingles, b.shingles))::DOUBLE
               / (len(a.shingles) + len(b.shingles)
                  - len(list_intersect(a.shingles, b.shingles))) AS jac
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    )
    SELECT a_id, b_id, round(jac, 6) AS jaccard FROM pairs WHERE jac >= 0.3
    """,
    "All near-duplicate pairs at word-3-shingle Jaccard >= 0.3, via an "
    "inverted shingle index (explode+join) — never a cross join.",
)
def dd2_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _jaccard_pairs_cached(spark, sf_dir)


@query(
    "dd3_minhash_lsh_pairs",
    "dedup: MinHash+LSH with exact rescore",
    f"""
    WITH {_DUCK_SHINGLES},
    pairs AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             len(list_intersect(a.shingles, b.shingles))::DOUBLE
               / (len(a.shingles) + len(b.shingles)
                  - len(list_intersect(a.shingles, b.shingles))) AS jac
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    )
    SELECT a_id, b_id, round(jac, 6) AS jaccard,
           TRUE AS lsh_precision_ok, TRUE AS lsh_recall_ok
    FROM pairs WHERE jac >= 0.3
    """,
    "MinHash (64 seeded hashes, 32x2 bands) banded candidate join + "
    "exact-Jaccard rescore at 0.3, declared CHECKED (r4 verdict #1, "
    "the cd_acd pattern): the returned rows are the EXACT pair set "
    "(hash-checked by the DuckDB all-pairs oracle) carrying two "
    "booleans the oracle pins TRUE — lsh_precision_ok (every "
    "LSH-discovered pair is an exact pair: the rescore step makes "
    "precision 1.0 by construction, and a broken banding/signature "
    "would surface phantom pairs) and lsh_recall_ok (the banded "
    "s-curve finds >= 85% of true pairs at t=0.3; observed 24/25 at "
    "sf0.01). Tighter per-geometry recall contracts live in "
    "tests/test_dedup.py.",
)
def dd3_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # R15 (VERDICT r14 #6, same seam as dd9): the banded tier and the
    # exact twin both tokenize+shingle the same corpus — materialize
    # the (id, shingles) frame once per invocation and feed it to both.
    sh_docs = _fanin(
        docs.select(
            F.col("doc_id").alias("id"),
            dedup.shingles_expr(F.col("text"), 3).alias("shingles"),
        )
    )
    lsh, exact = _fanin_parallel(
        dedup.minhash_lsh_pairs(docs, threshold=0.3, shingles_df=sh_docs),
        dedup.ngram_jaccard_pairs(
            docs,
            threshold=0.3,
            stop_shingles=_stop_shingles_cached(spark, sf_dir),
            shingles_df=sh_docs,
        ),
    )
    extra = lsh.select("a_id", "b_id").join(
        exact.select("a_id", "b_id"), ["a_id", "b_id"], "left_anti"
    )
    prec = extra.agg((F.count(F.lit(1)) == 0).alias("lsh_precision_ok"))
    hits = exact.join(
        lsh.select("a_id", "b_id"), ["a_id", "b_id"], "left_semi"
    ).agg(F.count(F.lit(1)).alias("hits"))
    tot = exact.agg(F.count(F.lit(1)).alias("tot"))
    rec = hits.crossJoin(tot).select(
        (F.col("hits") >= 0.85 * F.col("tot")).alias("lsh_recall_ok")
    )
    return exact.crossJoin(F.broadcast(prec.crossJoin(rec)))


@query(
    "dd4_simhash_pairs",
    "dedup: SimHash banded candidates",
    """
    SELECT doc_id AS a_id, doc_id + 100000 AS b_id,
           TRUE AS found_at_hamming0
    FROM documents
    """,
    "64-bit SimHash fingerprints, 4x16-bit bands (guaranteed recall at "
    "Hamming<=3), bit_count(xor) verify — declared CHECKED via planted "
    "exact duplicates (the fingerprints themselves hinge on Spark's "
    "xxhash64 and cannot replay in SQL): every document is cloned at "
    "doc_id+100000, the FULL simhash pipeline (tokenize -> weighted "
    "bit vote -> 4-band join -> Hamming verify) runs over the doubled "
    "corpus, and the query returns one row per planted pair with the "
    "oracle-pinned boolean that the pipeline found it at Hamming 0 — "
    "identical text must produce identical fingerprints sharing every "
    "band, so ANY break in hashing, banding, or the verify flips rows "
    "FALSE and the hash goes red. Near-dup Hamming properties stay in "
    "tests/test_dedup.py.",
)
def dd4_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    offset = 100_000
    aug = docs.select("doc_id", "text").unionByName(
        docs.select((F.col("doc_id") + offset).alias("doc_id"), "text")
    )
    pairs = dedup.simhash_pairs(aug, max_hamming=3)
    planted = docs.select(
        F.col("doc_id").alias("a_id"),
        (F.col("doc_id") + offset).alias("b_id"),
    )
    found0 = pairs.where(F.col("hamming") == 0).select(
        "a_id", "b_id", F.lit(True).alias("found_at_hamming0")
    )
    return planted.join(found0, ["a_id", "b_id"], "left").select(
        "a_id",
        "b_id",
        F.coalesce("found_at_hamming0", F.lit(False)).alias("found_at_hamming0"),
    )


@query(
    "dd5_embedding_neardup",
    "dedup: embedding-cosine near-dup pairs",
    f"""
    WITH {_DUCK_FLAT_EMB},
    dots AS (
      SELECT a.vec_id AS a_id, b.vec_id AS b_id, sum(a.val * b.val) AS dot
      FROM flat a JOIN flat b ON a.idx = b.idx AND a.vec_id < b.vec_id
      GROUP BY 1, 2
    )
    SELECT a_id, b_id, round(dot / (na.nrm * nb.nrm), 6) AS cosine
    FROM dots JOIN norms na ON a_id = na.vec_id JOIN norms nb ON b_id = nb.vec_id
    WHERE dot / (na.nrm * nb.nrm) >= 0.4
    """,
    "Vector near-duplicate pairs at cosine >= 0.4 (exact, distributed "
    "block-pair GEMM — no driver materialization; the fixture's "
    "synthetic embeddings top out near 0.55 pairwise).",
)
def dd5_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return dedup.embedding_neardup_pairs_blocked(emb, threshold=0.4)


@query(
    "dd6_dd7_dedup_family",
    "dd6 (keep-min resolution) + dd7 (transitive/connected-components "
    "resolution) — the R14 tagged-union fold (VERDICT r13 #2, the "
    "j1_j8 shape) freeing the declared slot for stats1_analyze; both "
    "operator ids preserved",
    f"""
    WITH RECURSIVE {_DUCK_SHINGLES},
    pairs AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             len(list_intersect(a.shingles, b.shingles))::DOUBLE
               / (len(a.shingles) + len(b.shingles)
                  - len(list_intersect(a.shingles, b.shingles))) AS jac
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    ),
    edges AS (
      SELECT a_id AS u, b_id AS v FROM pairs WHERE jac >= 0.3
      UNION SELECT b_id, a_id FROM pairs WHERE jac >= 0.3
    ),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    label AS (SELECT u AS id, min(v) AS mn FROM reach GROUP BY u)
    SELECT 'keep_min' AS op, d.doc_id, d.lang, d.source FROM documents d
    WHERE d.doc_id NOT IN
      (SELECT DISTINCT b_id FROM pairs WHERE jac >= 0.3)
    UNION ALL
    SELECT 'transitive', d.doc_id, d.lang, d.source FROM documents d
    LEFT JOIN label l ON d.doc_id = l.id
    WHERE l.id IS NULL OR least(l.mn, d.doc_id) = d.doc_id
    """,
    "Both near-dup RESOLUTION policies over one shared pair set, as a "
    "tagged union: 'keep_min' = documents surviving single-pass "
    "keep-min-id removal (anti-join); 'transitive' = one survivor "
    "(min doc_id) per connected component — min-label propagation to "
    "a fixpoint, collapsing chains A~B~C that single-pass keep-min "
    "leaves partially duplicated. The Jaccard pair set is computed "
    "once and cached across the family (the production shape: pairs "
    "are the expensive side, resolution is cheap).",
)
def dd6_dd7_dedup_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source"
    )
    pairs = _fanin(_jaccard_pairs_cached(spark, sf_dir))
    km = dedup.dedup_keep_min(docs, pairs).select(
        F.lit("keep_min").alias("op"), "doc_id", "lang", "source"
    )
    tr = dedup.dedup_transitive(docs, pairs).select(
        F.lit("transitive").alias("op"), "doc_id", "lang", "source"
    )
    return km.unionByName(tr)


@query(
    "dd8_neardup_lsh",
    "dedup: distributed LSH-bucketed embedding near-dup",
    f"""
    WITH {_DUCK_FLAT_EMB},
    dots AS (
      SELECT a.vec_id AS a_id, b.vec_id AS b_id, sum(a.val * b.val) AS dot
      FROM flat a JOIN flat b ON a.idx = b.idx AND a.vec_id < b.vec_id
      GROUP BY 1, 2
    )
    SELECT a_id, b_id, round(dot / (na.nrm * nb.nrm), 6) AS cosine,
           TRUE AS lsh_precision_ok, TRUE AS lsh_recall_ok
    FROM dots JOIN norms na ON a_id = na.vec_id JOIN norms nb ON b_id = nb.vec_id
    WHERE dot / (na.nrm * nb.nrm) >= 0.4
    """,
    "Embedding near-dup pairs via per-bucket GEMM (groupBy (table, "
    "bucket) + applyInPandas), declared CHECKED (r4 verdict #1): the "
    "returned rows are the EXACT pair set at cosine >= 0.4 "
    "(hash-checked by dd5's DuckDB oracle) carrying two booleans the "
    "oracle pins TRUE — lsh_precision_ok (every LSH-bucketed pair is "
    "an exact pair: per-bucket rescore is exact GEMM, so a phantom "
    "pair means broken bucketing) and lsh_recall_ok (the 3-planes x "
    "12-tables s-curve finds >= 85% of true pairs at the fixture's "
    "low 0.4 threshold; observed 58/59 at sf0.01). Tighter geometry "
    "contracts in tests/test_similarity.py; real near-dup regimes "
    "(0.9+) use the pruning defaults.",
)
def dd8_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    lsh, exact = _fanin_parallel(
        similarity.lsh_neardup_pairs(emb, threshold=0.4, n_planes=3, n_tables=12),
        dedup.embedding_neardup_pairs_blocked(emb, threshold=0.4),
    )
    extra = lsh.select("a_id", "b_id").join(
        exact.select("a_id", "b_id"), ["a_id", "b_id"], "left_anti"
    )
    prec = extra.agg((F.count(F.lit(1)) == 0).alias("lsh_precision_ok"))
    hits = exact.join(
        lsh.select("a_id", "b_id"), ["a_id", "b_id"], "left_semi"
    ).agg(F.count(F.lit(1)).alias("hits"))
    tot = exact.agg(F.count(F.lit(1)).alias("tot"))
    rec = hits.crossJoin(tot).select(
        (F.col("hits") >= 0.85 * F.col("tot")).alias("lsh_recall_ok")
    )
    return exact.crossJoin(F.broadcast(prec.crossJoin(rec)))


@query(
    "dd9_incremental_neardup",
    "dedup: incremental near-dedup index (build corpus index, probe a delta)",
    r"""
    WITH all_docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 100
    ),
    words AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS w
      FROM all_docs
    ),
    sh AS (
      SELECT doc_id,
             CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                  ELSE list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                      for i in range(1, len(w) - 1)])
             END AS shingles
      FROM words
    ),
    pairs AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             len(list_intersect(a.shingles, b.shingles))::DOUBLE
               / (len(a.shingles) + len(b.shingles)
                  - len(list_intersect(a.shingles, b.shingles))) AS jac
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    )
    SELECT a_id, b_id, round(jac, 6) AS jaccard,
           TRUE AS lsh_precision_ok, TRUE AS lsh_recall_ok
    FROM pairs
    WHERE jac >= 0.3 AND (a_id >= 100000 OR b_id >= 100000)
    """,
    "The daily-ingest dedup regime, declared CHECKED (new slot in R5 — "
    "the largest previously pytest-only north-star operator): the "
    "corpus is indexed once (build_minhash_index: banded buckets + "
    "shingle sets, persistable), a 100-document delta (clones of the "
    "first 100 docs at doc_id+100000) probes the index "
    "(incremental_minhash_pairs: delta-vs-corpus + delta-vs-delta, "
    "NEVER corpus-vs-corpus), and the declared rows are the EXACT "
    "delta-involving pair set (DuckDB all-pairs oracle over the union "
    "corpus) carrying the dd3-pattern booleans the oracle pins TRUE: "
    "lsh_precision_ok (every incremental pair is an exact pair) and "
    "lsh_recall_ok (>= 0.85 of true delta-involving pairs found — the "
    "100 identical clones are found with probability 1, near-dup cross "
    "pairs follow the banded s-curve). Full-rerun set-equivalence "
    "stays pinned in tests/test_dedup.py.",
)
def dd9_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    offset = 100_000
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    delta = docs.where(F.col("doc_id") < 100).select(
        (F.col("doc_id") + offset).alias("doc_id"), "text"
    )
    # R15 (VERDICT r14 #6): the index build and the exact twin both
    # shingle the same corpus — materialize the (id, shingles) frame
    # ONCE per invocation and feed it to both pipelines (and derive the
    # delta's shingles from it: the delta is the first 100 docs re-keyed
    # at +offset with IDENTICAL text, so its shingles are the same
    # arrays re-keyed). The tokenize+shingle scan now runs once instead
    # of twice (index + exact a-side); all downstream math is unchanged.
    sh_docs = _fanin(
        docs.select(
            F.col("doc_id").alias("id"),
            dedup.shingles_expr(F.col("text"), 3).alias("shingles"),
        )
    )
    sh_delta = sh_docs.where(F.col("id") < 100).select(
        (F.col("id") + offset).alias("id"), "shingles"
    )
    idx = dedup.build_minhash_index(docs, shingles_df=sh_docs)
    d_idx = dedup.build_minhash_index(delta, shingles_df=sh_delta)
    inc = dedup.incremental_minhash_pairs(
        delta, idx, threshold=0.3, delta_index=d_idx
    )
    union = docs.unionByName(delta)
    # R14 optimization: ngram_jaccard_pairs guarantees a_id < b_id and
    # every delta id (>= offset) exceeds every corpus id, so
    # "(a_id >= offset) OR (b_id >= offset)" is exactly "b_id >= offset"
    # — which b_id_filter applies BEFORE the candidate join: the delta
    # index (100 docs) is broadcast and the union's corpus-sized
    # shingle index is never shuffled (the OR form referenced both
    # sides and the exact twin was paying a full corpus-vs-corpus
    # candidate join just to discard the corpus-corpus pairs;
    # pair-set equality verified at sf0.1 and against the oracle).
    # Broadcast-size precondition (ADVICE r14): the filtered b-side is
    # delta-sized only because every fixture corpus id is < offset —
    # the offset is pinned by this query's declared oracle SQL
    # (doc_id + 100000), and a corpus whose ids crossed it would alias
    # delta ids and break the oracle itself before it grew the
    # broadcast. Production callers sizing their own delta regime must
    # derive the offset from max(doc_id)+1 and keep the filtered side
    # broadcast-sized (see ngram_jaccard_pairs' b_id_filter docstring).
    inc, exact = _fanin_parallel(
        inc,
        dedup.ngram_jaccard_pairs(
            union,
            threshold=0.3,
            stop_shingles=[],
            prefix_filter=False,
            b_id_filter=lambda c: c >= offset,
            shingles_df=sh_docs.unionByName(sh_delta),
        ),
    )
    extra = inc.select("a_id", "b_id").join(
        exact.select("a_id", "b_id"), ["a_id", "b_id"], "left_anti"
    )
    prec = extra.agg((F.count(F.lit(1)) == 0).alias("lsh_precision_ok"))
    hits = exact.join(
        inc.select("a_id", "b_id"), ["a_id", "b_id"], "left_semi"
    ).agg(F.count(F.lit(1)).alias("hits"))
    tot = exact.agg(F.count(F.lit(1)).alias("tot"))
    rec = hits.crossJoin(tot).select(
        (F.col("hits") >= 0.85 * F.col("tot")).alias("lsh_recall_ok")
    )
    return exact.crossJoin(F.broadcast(prec.crossJoin(rec)))


#: dd13's planted boilerplate line, appended to every 7th document
#: identically on both sides (on top of the fixture's natural
#: exact-dup documents, whose every line is cross-doc duplicated by
#: construction). Normalized form == itself: lowercase, single spaces,
#: >= 5 chars, so it is always dup-eligible.
_LINE_BOILER = "zz subscribe to the zz newsletter"


@query(
    "dd13_line_dedup",
    "dedup: line-level boilerplate removal (the C4 rule)",
    f"""
    WITH lined AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0
                  THEN regexp_replace(text, '((?:\\w+ ){{4}}\\w+) ',
                                      '\\1' || chr(10), 'g')
                       || chr(10) || '{_LINE_BOILER}'
                  ELSE regexp_replace(text, '((?:\\w+ ){{4}}\\w+) ',
                                      '\\1' || chr(10), 'g')
             END AS text
      FROM documents
    ),
    l AS (
      SELECT doc_id,
             generate_subscripts(string_split(text, chr(10)), 1) AS pos,
             unnest(string_split(text, chr(10))) AS line
      FROM lined
    ),
    k AS (
      SELECT doc_id, pos, line,
             regexp_replace(trim(lower(line)), '\\s+', ' ', 'g') AS key
      FROM l
    ),
    dup AS (
      SELECT key FROM k WHERE length(key) >= 5
      GROUP BY key HAVING count(DISTINCT doc_id) >= 2
    ),
    kept AS (
      SELECT doc_id, pos, line FROM k
      WHERE key NOT IN (SELECT key FROM dup)
    ),
    rebuilt AS (
      SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
      FROM kept GROUP BY doc_id
    )
    SELECT d.doc_id,
           CASE WHEN d.text IS NULL THEN NULL
                ELSE coalesce(r.text, '') END AS text
    FROM lined d LEFT JOIN rebuilt r ON d.doc_id = r.doc_id
    """,
    "Line-level boilerplate dedup, declared CHECKED: the single-line "
    "fixture texts restructure into 5-word lines (identically on both "
    "sides), a boilerplate line is planted onto every 7th document, "
    "and ``remove_duplicate_lines`` runs the FULL production pipeline "
    "(posexplode -> normalized line key -> distinct-doc count -> "
    "equi-join back -> ordered reassembly). The oracle replays the "
    "rule over line STRINGS in DuckDB. Every rewritten byte is "
    "hash-checked: the planted line vanishes from every host (the C4 "
    "all-occurrences rule, first doc included), the natural exact-dup "
    "documents collapse to empty strings (each of their lines appears "
    "in >= 2 docs), and untouched documents pass through verbatim.",
)
def dd13_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    restructured = F.regexp_replace(
        F.col("text"), r"((?:\w+ ){4}\w+) ", "$1\n"
    )
    lined = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(restructured, F.lit("\n" + _LINE_BOILER)),
        )
        .otherwise(restructured)
        .alias("text"),
    )
    return dedup.remove_duplicate_lines(lined, min_docs=2).select(
        "doc_id", "text"
    )


#: dd12's planted passage: 10 tokens none of which appear in the
#: fixture vocabulary, appended to every 10th document identically on
#: both sides so cross-document duplicated spans exist by construction
#: (the fixture's word-salad text also contains natural exact-dup docs
#: — the oracle replays those too).
_SPAN_BOILER = (
    "qq0 qq1 qq2 qq3 qq4 qq5 qq6 qq7 qq8 qq9"
)
_SPAN_K = 8


@query(
    "dd12_span_dedup",
    "dedup: span-level exact substring removal (Lee et al. 2021)",
    f"""
    WITH corpus AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 0 THEN text || ' {_SPAN_BOILER}'
                  ELSE text END AS text
      FROM documents
    ),
    wl AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '') AS w
      FROM corpus
    ),
    gl AS (
      SELECT doc_id,
             [array_to_string(w[i:i+{_SPAN_K - 1}], ' ')
              for i in range(1, len(w) - {_SPAN_K - 2})] AS gs
      FROM wl
    ),
    gr AS (
      SELECT doc_id, generate_subscripts(gs, 1) - 1 AS pos, unnest(gs) AS g
      FROM gl
    ),
    dup AS (
      SELECT doc_id, pos FROM (
        SELECT doc_id, pos,
               row_number() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rk
        FROM gr
      ) WHERE rk >= 2
    ),
    isl AS (
      SELECT doc_id, pos,
             CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                    OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                       > {_SPAN_K}
                  THEN 1 ELSE 0 END AS nw
      FROM dup
    ),
    isl2 AS (
      SELECT doc_id, pos,
             sum(nw) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      FROM isl
    ),
    spans AS (
      SELECT doc_id, min(pos) AS s, max(pos) + {_SPAN_K} AS e
      FROM isl2 GROUP BY doc_id, grp
    ),
    cov AS (SELECT doc_id, unnest(range(s, e)) AS pos FROM spans),
    wo AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'), x -> x != '') AS w
      FROM corpus
    ),
    tok AS (
      SELECT doc_id, generate_subscripts(w, 1) - 1 AS idx, unnest(w) AS t
      FROM wo
    ),
    kept AS (
      SELECT tok.doc_id, tok.idx, tok.t FROM tok
      LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.idx = cov.pos
      WHERE cov.pos IS NULL
    ),
    rebuilt AS (
      SELECT doc_id, coalesce(string_agg(t, ' ' ORDER BY idx), '') AS text
      FROM kept GROUP BY doc_id
    )
    SELECT c.doc_id,
           CASE WHEN c.doc_id IN (SELECT doc_id FROM spans)
                THEN coalesce(r.text, '')
                ELSE c.text END AS text
    FROM corpus c LEFT JOIN rebuilt r ON c.doc_id = r.doc_id
    """,
    "Span-level exact substring dedup, declared CHECKED (VERDICT r6 "
    "#1 — the highest-blast-radius R6 operator, it REWRITES document "
    "text): a 10-token passage is planted onto every 10th document "
    "(identically in the oracle), ``remove_duplicate_spans`` runs the "
    "FULL production pipeline at k=8 (positional k-gram inverted "
    "index -> global (doc, pos) first-occurrence ranking -> "
    "gap-and-islands span merge -> codegen token filter), and the "
    "oracle REPLAYS the entire algorithm in DuckDB SQL over gram "
    "STRINGS (the Spark side hashes grams with xxhash64; at 500 docs "
    "/ ~25k gram positions the collision probability is ~1e-12, see "
    "the collision contract at operators/dedup.py). Every rewritten "
    "byte is hash-checked: the planted passage survives only on its "
    "globally-first document, every later copy is cut, natural "
    "exact-duplicate fixture docs collapse to empty strings, and "
    "untouched docs pass through verbatim with original whitespace.",
)
def dd12_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(F.col("text"), F.lit(" " + _SPAN_BOILER)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return dedup.remove_duplicate_spans(corpus, k=_SPAN_K).select(
        "doc_id", "text"
    )


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------


@query(
    "sim1_cosine_topk",
    "similarity: exact cosine top-k",
    f"""
    WITH {_DUCK_FLAT_EMB},
    dots AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, sum(q.val * c.val) AS dot
      FROM flat q JOIN flat c ON q.idx = c.idx
      WHERE q.vec_id < 20 AND q.vec_id != c.vec_id
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT query_id, neighbor_id,
             round(dot / (nq.nrm * nc.nrm), 6) AS cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY dot / (nq.nrm * nc.nrm) DESC, neighbor_id) AS rk
      FROM dots JOIN norms nq ON query_id = nq.vec_id
                JOIN norms nc ON neighbor_id = nc.vec_id
    )
    SELECT query_id, neighbor_id, cosine, CAST(rk AS INT) AS rank
    FROM ranked WHERE rk <= 5
    """,
    "Exact cosine top-5 for the first 20 query vectors — distributed "
    "block GEMM (corpus shuffles once into hash blocks, queries fan "
    "out, window merge); no driver materialization.",
)
def sim1_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < 20)
    return similarity.brute_force_topk_distributed(queries_df, emb, k=5)


@query(
    "sim2_sim3_lsh_topk",
    "similarity: sign-LSH ANN, broadcast + distributed tiers",
    f"""
    WITH {_DUCK_FLAT_EMB},
    dots AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, sum(q.val * c.val) AS dot
      FROM flat q JOIN flat c ON q.idx = c.idx
      WHERE q.vec_id < 20 AND q.vec_id != c.vec_id
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT query_id, neighbor_id,
             round(dot / (nq.nrm * nc.nrm), 6) AS cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY dot / (nq.nrm * nc.nrm) DESC, neighbor_id) AS rk
      FROM dots JOIN norms nq ON query_id = nq.vec_id
                JOIN norms nc ON neighbor_id = nc.vec_id
    )
    SELECT t.tier, query_id, neighbor_id, cosine, CAST(rk AS INT) AS rank,
           TRUE AS tiers_match, TRUE AS lsh_recall_ok
    FROM ranked
    CROSS JOIN (SELECT 'broadcast' AS tier UNION ALL SELECT 'distributed') t
    WHERE rk <= 5
    """,
    "Both sign-LSH ANN tiers, declared CHECKED (r4 verdict #1) via the "
    "degenerate-geometry identity: at n_planes=0 every vector lands in "
    "ONE bucket, so the SAME bucketing/cogroup/GEMM-rescore/window "
    "machinery provably produces the exact top-k — the returned rows "
    "are that exact result per tier ('broadcast' = single-node kernel, "
    "'distributed' = the 100 TB path with sub-blocked buckets), "
    "hash-checked against the DuckDB brute-force oracle. The REAL "
    "6-planes x 6-tables geometry runs alongside on both tiers and is "
    "pinned by two oracle-asserted booleans: tiers_match (broadcast "
    "and distributed bit-identical at the real geometry) and "
    "lsh_recall_ok (real-geometry recall vs exact >= 0.6 — the "
    "conservative floor of the multi-probe s-curve at the fixture's "
    "weakly-similar angles; tighter assertions in "
    "tests/test_similarity.py).",
)
def sim2_sim3_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < 20)
    # R15: the two broadcast-tier calls share ONE driver collect of the
    # corpus matrix (collected=), and the probe-sized query frame (20
    # rows by the vec_id < 20 bound) repartitions to 4 python tasks
    # instead of 32 mostly-empty ones that each deserialize the corpus
    # broadcast (VERDICT r14 #5). Output identical by construction.
    mat = similarity.collect_normalized_matrix(emb)
    # exact-by-construction through the LSH machinery: 0 planes = 1 bucket
    bexact, b, d = _fanin_parallel(
        similarity.lsh_bucketed_topk(
            queries_df, emb, k=5, n_planes=0, n_tables=1,
            collected=mat, query_partitions=4,
        ),
        # real geometry, both tiers (the plans a production call runs)
        similarity.lsh_bucketed_topk(
            queries_df, emb, k=5, collected=mat, query_partitions=4,
        ),
        similarity.lsh_partitioned_topk(queries_df, emb, k=5, n_planes=6, n_tables=6),
    )
    dexact = similarity.lsh_partitioned_topk(
        queries_df, emb, k=5, n_planes=0, n_tables=1
    )
    mism = b.exceptAll(d).unionByName(d.exceptAll(b))
    tiers_ok = mism.agg((F.count(F.lit(1)) == 0).alias("tiers_match"))
    hits = b.join(
        bexact.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"],
        "left_semi",
    ).agg(F.count(F.lit(1)).alias("hits"))
    tot = bexact.agg(F.count(F.lit(1)).alias("tot"))
    recall_ok = hits.crossJoin(tot).select(
        (F.col("hits") >= 0.6 * F.col("tot")).alias("lsh_recall_ok")
    )
    audit = tiers_ok.crossJoin(recall_ok)
    tag = lambda df, t: df.select(F.lit(t).alias("tier"), "*")
    return (
        tag(bexact, "broadcast")
        .unionByName(tag(dexact, "distributed"))
        .crossJoin(F.broadcast(audit))
    )


#: IVF index build is amortized across calls, like any ANN index: the
#: centroid matrix (the entire "index" beyond a plain cell column) is
#: PERSISTED via functions/artifacts keyed on (corpus dir, geometry,
#: seed) — train once, digest-verified load every call after, across
#: processes (the r4 verdict's "What's wrong #2": a declared query must
#: not re-pay a corpus training pass per invocation). Training is
#: capped at 8 Lloyd iterations: bucket-assignment quality converges in
#: a handful of passes and each distributed pass is a fixed-cost job.
def _ivf_centroids_cached(emb: DataFrame, sf_dir: str, nlist: int = 16):
    import os

    from etl_zero_spark.functions.artifacts import cached_artifact, corpus_key

    # Corpus identity via the SHARED corpus_key helper (part-file
    # content listing + edge-sample hash — R8, VERDICT r7 #7), not
    # os.stat of the parquet directory: a regenerated fixture — even a
    # byte-identical one — retrains rather than risking a stale index.
    # (Exactness is robust either way: at nprobe=nlist every cell is
    # probed for ANY centroids; this guards the nprobe<nlist path.)
    params = corpus_key(
        os.path.join(sf_dir, "embeddings.parquet"),
        nlist=nlist,
        seed=ivf.IVF_SEED,
        max_iter=8,
        vec_col="embedding",
    )
    return cached_artifact(
        "ivf_centroids",
        params,
        lambda: ivf.train_ivf_centroids(emb, nlist, max_iter=8),
    )


@query(
    "sim4_ivf_topk",
    "similarity: IVF (k-means coarse quantizer) ANN",
    f"""
    WITH {_DUCK_FLAT_EMB},
    dots AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, sum(q.val * c.val) AS dot
      FROM flat q JOIN flat c ON q.idx = c.idx
      WHERE q.vec_id < 20 AND q.vec_id != c.vec_id
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT query_id, neighbor_id,
             round(dot / (nq.nrm * nc.nrm), 6) AS cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY dot / (nq.nrm * nc.nrm) DESC, neighbor_id) AS rk
      FROM dots JOIN norms nq ON query_id = nq.vec_id
                JOIN norms nc ON neighbor_id = nc.vec_id
    )
    SELECT query_id, neighbor_id, cosine, CAST(rk AS INT) AS rank,
           TRUE AS ann_recall_ok
    FROM ranked WHERE rk <= 5
    """,
    "The learned-partition ANN tier, declared CHECKED (r4 verdict #1): "
    "the returned rows are IVF at nprobe=nlist — every cell probed, so "
    "the same train/assign/probe/cogrouped-GEMM machinery provably "
    "reproduces the exact top-k (bit-identity to sim1 also pytest-"
    "pinned, tests/test_ivf.py) and the DuckDB oracle hash-checks it. "
    "The production nprobe=8 path runs alongside and its recall vs the "
    "full probe is pinned as the oracle-asserted ann_recall_ok boolean "
    "(the cd_acd HLL-tolerance pattern). Centroids load from a "
    "digest-verified persisted artifact — search-only cost per call.",
)
def sim4_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cents = _ivf_centroids_cached(emb, sf_dir)
    queries_df = emb.where(F.col("vec_id") < 20)
    # no _fanin here (R14 A/B): the IVF subtree is cheap to recompute and
    # its three references run as PARALLEL branches of one DAG — the
    # checkpoint serialized them and measured 1.5x slower
    exact = ivf.ivf_topk(queries_df, emb, k=5, centroids=cents, nprobe=16)
    ann = ivf.ivf_topk(queries_df, emb, k=5, centroids=cents, nprobe=8)
    hits = ann.join(
        exact.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"],
        "left_semi",
    ).agg(F.count(F.lit(1)).alias("hits"))
    tot = exact.agg(F.count(F.lit(1)).alias("tot"))
    audit = hits.crossJoin(tot).select(
        (F.col("hits") >= 0.7 * F.col("tot")).alias("ann_recall_ok")
    )
    return exact.crossJoin(F.broadcast(audit))


@query(
    "sdd1_semantic_dedup",
    "dedup: SemDeDup cluster-local semantic near-dup (Abbas et al. 2023)",
    f"""
    WITH {_DUCK_FLAT_EMB},
    dots AS (
      SELECT a.vec_id AS a_id, b.vec_id AS b_id, sum(a.val * b.val) AS dot
      FROM flat a JOIN flat b ON a.idx = b.idx AND a.vec_id < b.vec_id
      GROUP BY 1, 2
    )
    SELECT a_id, b_id, round(dot / (na.nrm * nb.nrm), 6) AS cosine,
           TRUE AS semdedup_precision_ok, TRUE AS cluster_recall_ok
    FROM dots JOIN norms na ON a_id = na.vec_id JOIN norms nb ON b_id = nb.vec_id
    WHERE dot / (na.nrm * nb.nrm) >= 0.4
    """,
    "SemDeDup declared CHECKED (VERDICT r6 #2 — the dd3/dd8/sim2 "
    "recipe): the returned rows are semantic_dedup_pairs at ONE "
    "cluster (a single all-ones centroid assigns every vector to "
    "cluster 0, sub-block machinery intact), so the SAME assign/"
    "group/GEMM pipeline provably produces the exact cosine>=0.4 pair "
    "set — hash-checked against dd5's DuckDB all-pairs oracle. The "
    "PRODUCTION geometry (the 16-cell IVF centroids persisted for "
    "sim4 — SemDeDup reuses the coarse quantizer, artifact-cached) "
    "runs alongside and is pinned by two oracle-asserted booleans: "
    "semdedup_precision_ok (every cluster-local pair is an exact "
    "pair — within-cluster rescore is exact GEMM, so a phantom pair "
    "means broken assignment) and cluster_recall_ok (>= 0.4 of exact "
    "pairs found at the fixture's sub-threshold 0.4 regime, observed "
    "28/59: pairs at cosine ~0.4 are weakly-similar boundary "
    "straddlers, the documented SemDeDup trade — true semantic "
    "duplicates at the published 0.9+ operating point sit in cluster "
    "cores, and the planted-clone recall-1.0 contract lives in "
    "tests/test_semdedup.py).",
)
def sdd1_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    # dim from the persisted centroid artifact — no driver-side scan
    cents = _ivf_centroids_cached(emb, sf_dir)
    exact, prod = _fanin_parallel(
        similarity.semantic_dedup_pairs(
            emb, np.ones((1, cents.shape[1])), threshold=0.4
        ),
        similarity.semantic_dedup_pairs(emb, cents, threshold=0.4),
    )
    extra = prod.select("a_id", "b_id").join(
        exact.select("a_id", "b_id"), ["a_id", "b_id"], "left_anti"
    )
    prec = extra.agg((F.count(F.lit(1)) == 0).alias("semdedup_precision_ok"))
    hits = exact.join(
        prod.select("a_id", "b_id"), ["a_id", "b_id"], "left_semi"
    ).agg(F.count(F.lit(1)).alias("hits"))
    tot = exact.agg(F.count(F.lit(1)).alias("tot"))
    rec = hits.crossJoin(tot).select(
        (F.col("hits") >= 0.4 * F.col("tot")).alias("cluster_recall_ok")
    )
    return exact.crossJoin(F.broadcast(prec.crossJoin(rec)))


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

_DUCK_TOK_LOCAL = r"list_filter(string_split_regex(lower(text), '\s+'), x -> x != '')"


_TX_STATS_SQL = f"""
    WITH t AS (
      SELECT doc_id, text, {_DUCK_TOK_LOCAL} AS toks,
             text || ' contact: user' || CAST(doc_id AS VARCHAR)
                  || '@example.com see https://ex.io/d/' || CAST(doc_id AS VARCHAR)
                  || ' ip 10.0.0.1 tel 555-867-5309' AS atext
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             length(text) AS n_chars,
             len(toks) AS n_words,
             round(list_sum(list_transform(toks, x -> length(x)))
                   / nullif(CAST(len(toks) AS DOUBLE), 0.0), 6) AS avg_word_len,
             round(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
                   / nullif(CAST(length(text) AS DOUBLE), 0.0), 6) AS punct_ratio,
             round(len(list_filter(toks, x -> list_contains(
                     ['the','a','of','and','to','in','is','that','it','for'], x)))
                   / nullif(CAST(len(toks) AS DOUBLE), 0.0), 6) AS stopword_ratio,
             len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_tokens,
             len(regexp_extract_all(atext, '{text.PII_PATTERNS["url"]}')) AS n_url,
             len(regexp_extract_all(atext, '{text.PII_PATTERNS["email"]}')) AS n_email,
             len(regexp_extract_all(atext, '{text.PII_PATTERNS["ipv4"]}')) AS n_ipv4,
             len(regexp_extract_all(atext, '{text.PII_PATTERNS["phone"]}')) AS n_phone,
             length(regexp_replace(regexp_replace(regexp_replace(regexp_replace(atext,
                 '{text.PII_PATTERNS["url"]}', '<URL>', 'g'),
                 '{text.PII_PATTERNS["email"]}', '<EMAIL>', 'g'),
                 '{text.PII_PATTERNS["ipv4"]}', '<IPV4>', 'g'),
                 '{text.PII_PATTERNS["phone"]}', '<PHONE>', 'g')) AS n_chars_scrubbed
      FROM t
    )
    SELECT doc_id, n_chars, n_words, avg_word_len, punct_ratio, stopword_ratio,
           round((least(CAST(n_words AS DOUBLE) / 50.0, 1.0)
                  + (1.0 - least(punct_ratio * 4.0, 1.0))
                  + least(stopword_ratio * 5.0, 1.0)) / 3.0, 6) AS quality_score,
           n_bpe_tokens, n_url, n_email, n_ipv4, n_phone, n_chars_scrubbed
    FROM m
    """


_DUCK_LANG_SCORE = (
    "len(list_filter(toks, x -> list_contains({words}, x)))"
)
_LANG_LISTS = {
    "en": "['the','a','of','and','to','in','is','that','it','for']",
    "de": "['der','die','das','und','ist','nicht','ein','mit','für','auf']",
    "es": "['el','la','de','que','y','en','un','es','no','por']",
    "fr": "['le','la','de','et','un','est','que','pour','dans','ce']",
}


_TX_LANG_SQL = f"""
    WITH {_DUCK_SHINGLES},
    t AS (SELECT doc_id, {_DUCK_TOK_LOCAL} AS toks FROM documents),
    s AS (
      SELECT doc_id,
             {_DUCK_LANG_SCORE.format(words=_LANG_LISTS["en"])} AS s_en,
             {_DUCK_LANG_SCORE.format(words=_LANG_LISTS["de"])} AS s_de,
             {_DUCK_LANG_SCORE.format(words=_LANG_LISTS["es"])} AS s_es,
             {_DUCK_LANG_SCORE.format(words=_LANG_LISTS["fr"])} AS s_fr
      FROM t
    ), lang AS (
      SELECT doc_id,
             CASE WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'und'
                  WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
                  WHEN s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
                  WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
                  ELSE 'fr' END AS lang_guess
      FROM s
    )
    SELECT d.doc_id, l.lang_guess,
           md5(regexp_replace(trim(lower(d.text)), '\\s+', ' ', 'g')) AS content_md5,
           list_aggregate(list_transform(sh.shingles, s -> md5(s)), 'min') AS min_shingle_md5
    FROM documents d
    JOIN lang l ON d.doc_id = l.doc_id
    JOIN sh ON d.doc_id = sh.doc_id
    """


@query(
    "tx1_tx4_text_profile",
    "text: stats + quality + tokens + PII scrub + language ID + "
    "fingerprints (tx1+tx2+tx3+tx4 — the R7 fold that freed a declared "
    "slot for dd12_span_dedup; all four operator ids preserved)",
    f"""
    SELECT a.doc_id, a.n_chars, a.n_words, a.avg_word_len, a.punct_ratio,
           a.stopword_ratio, a.quality_score, a.n_bpe_tokens,
           a.n_url, a.n_email, a.n_ipv4, a.n_phone, a.n_chars_scrubbed,
           b.lang_guess, b.content_md5, b.min_shingle_md5
    FROM ({_TX_STATS_SQL}) a JOIN ({_TX_LANG_SQL}) b ON a.doc_id = b.doc_id
    """,
    "The full per-document text profile in ONE codegen'd projection "
    "(no join on the Spark side — every column is an expression over "
    "the same row): char/word counts, avg word length, punctuation and "
    "stopword ratios, composite quality heuristic, LLM token-budget "
    "proxy count, the PII scrub pass (url/email/ipv4/phone detect + "
    "mask, exercised on doc_id-derived planted PII so the regexes are "
    "tested on every row), deterministic stopword-count language ID "
    "(precedence en>de>es>fr), content_md5 (normalized exact-dup key) "
    "and min-shingle-md5 (1-hash MinHash pre-cluster key). The oracle "
    "joins the two original CTE chains on doc_id — each keeps its own "
    "WITH scope.",
)
def tx1_tx4_text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread=False (R15, VERDICT r14 #2): this row is ONE codegen'd
    # projection — per-row expression work, but only ~0.5s of it at
    # sf0.1, so the round-robin exchange the spread adds costs more
    # than the parallelism buys (interleaved A/B: 0.49s off vs 0.62s
    # on, matching the r14 regression). The spread pays off on
    # explode-heavy consumers (x_dsir 4.6x), not sub-second scans.
    docs = load_table(spark, sf_dir, "documents", spread=False)
    t = F.col("text")
    # Planted PII derived from doc_id, identically on the oracle side:
    # the fixture text itself is PII-free, so without this the scrub
    # columns would hash-match trivially without testing the regexes.
    aug = F.concat(
        t,
        F.lit(" contact: user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com see https://ex.io/d/"),
        F.col("doc_id").cast("string"),
        F.lit(" ip 10.0.0.1 tel 555-867-5309"),
    )
    pii = text.pii_count_exprs(aug)
    fps = text.fingerprint_exprs(t)
    return docs.select(
        "doc_id",
        text.char_count_expr(t).alias("n_chars"),
        text.word_count_expr(t).alias("n_words"),
        text.avg_word_len_expr(t).alias("avg_word_len"),
        text.punct_ratio_expr(t).alias("punct_ratio"),
        text.stopword_ratio_expr(t).alias("stopword_ratio"),
        text.quality_score_expr(t).alias("quality_score"),
        text.bpe_token_count_expr(t).alias("n_bpe_tokens"),
        pii["n_url"].alias("n_url"),
        pii["n_email"].alias("n_email"),
        pii["n_ipv4"].alias("n_ipv4"),
        pii["n_phone"].alias("n_phone"),
        F.length(text.scrub_pii_expr(aug)).alias("n_chars_scrubbed"),
        text.lang_id_expr(t).alias("lang_guess"),
        fps["content_md5"].alias("content_md5"),
        fps["min_shingle_md5"].alias("min_shingle_md5"),
    )


# ---------------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------------


@query(
    "mm1_mm3_multimodal",
    "multimodal: join + binary decode + frame sampling (tagged union; "
    "R8 fold freeing the slot that declares ret1 — operator ids "
    "MM1+MM2+MM3 all preserved, every row of all three hash-checked)",
    """
    WITH t AS (
      SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS L
      FROM documents
    ),
    f AS (SELECT doc_id, L, greatest(L // 4, 1) AS step FROM t)
    SELECT d.doc_id AS media_id, 'row' AS kind,
           CAST(len(e.embedding) AS INT) AS frame_idx,
           CAST(d.n_chars AS BIGINT) AS n_bytes,
           d.lang || '/' || d.source || '/' || e.label AS tag
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    UNION ALL
    SELECT doc_id, 'image', CAST(NULL AS INT), L, CAST(NULL AS VARCHAR)
    FROM t
    UNION ALL
    SELECT f.doc_id, 'frame', v.i,
           CAST(greatest(least(32, L - i * step), 0) AS BIGINT),
           CAST(NULL AS VARCHAR)
    FROM f, (VALUES (0), (1), (2), (3)) AS v(i)
    """,
    "Multimodal tier in one tagged result (50-row window fold): the "
    "documents ⋈ embeddings co-key join (mm1 — lang/source/cluster "
    "packed into the tag column, embedding_dim riding frame_idx, "
    "n_chars riding n_bytes), the decode pass (payload fabricated "
    "from text — no binary fixture ships — streamed through iterator "
    "mapInPandas, frame_idx null), and 4 evenly spaced frame slices "
    "per media row (row-expanding mapInPandas, explode inside the "
    "Arrow stream). Byte counts replay exactly in SQL (slice "
    "arithmetic over the utf-8 payload length), so the whole fold is "
    "oracle-checked — dimensions from recognizable media are covered "
    "by tests/test_multimodal.py's real PNG/JPEG/GIF fixtures.",
)
def mm1_mm3_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    joined = multimodal.multimodal_rows(docs, emb).select(
        F.col("doc_id").alias("media_id"),
        F.lit("row").alias("kind"),
        F.col("embedding_dim").cast("int").alias("frame_idx"),
        F.col("n_chars").cast("long").alias("n_bytes"),
        F.concat_ws("/", "lang", "source", "cluster_label").alias("tag"),
    )
    media = multimodal.attach_payload_from_text(docs)
    meta = multimodal.decode_metadata(media).select(
        "media_id",
        "kind",
        F.lit(None).cast("int").alias("frame_idx"),
        "n_bytes",
        F.lit(None).cast("string").alias("tag"),
    )
    frames = multimodal.sample_frames(media, n_frames=4).select(
        "media_id",
        F.lit("frame").alias("kind"),
        "frame_idx",
        F.length("frame_payload").cast("long").alias("n_bytes"),
        F.lit(None).cast("string").alias("tag"),
    )
    return joined.unionByName(meta).unionByName(frames)


# ---------------------------------------------------------------------------
# corpus mixing (c9) + lexical retrieval — declared R8
# ---------------------------------------------------------------------------


@query(
    "mix1_corpus_mix",
    "corpus mixing: waterfilled domain weights, exact quotas "
    "(§2.11-c9; declared R8 per VERDICT r7 #1 — slot freed by the "
    "e1+e2 fold)",
    """
    WITH w(source, weight) AS (
      VALUES ('src0', 0.6), ('src1', 0.3), ('src2', 0.1)
    ),
    avail AS (
      SELECT source, CAST(count(*) AS BIGINT) AS available
      FROM documents WHERE source IN ('src0', 'src1', 'src2')
      GROUP BY source
    ),
    j AS (
      SELECT w.source, w.weight, COALESCE(a.available, 0) AS available,
             50.0 * w.weight / (SELECT sum(weight) FROM w) AS share
      FROM w LEFT JOIN avail a USING (source)
    ),
    sat AS (SELECT *, (available <= share + 1e-9) AS is_sat FROM j),
    fill AS (
      SELECT *,
        CASE WHEN is_sat THEN CAST(available AS DOUBLE)
             ELSE (50.0 - (SELECT COALESCE(sum(available), 0)
                           FROM sat WHERE is_sat))
                  * weight
                  / (SELECT sum(weight) FROM sat WHERE NOT is_sat)
        END AS alloc
      FROM sat
    )
    SELECT source, weight, available,
           CAST(round(alloc) AS BIGINT) AS allocated,
           CAST(round(alloc) AS BIGINT) AS realized,
           TRUE AS realized_matches,
           TRUE AS nested_ok
    FROM fill
    """,
    "The Pile/Dolma mixture spec replayed arithmetically: weights "
    "0.6/0.3/0.1 over three sources at a 50-doc budget saturate src0 "
    "(25 available < 30 target) and waterfill the shortfall across "
    "src1/src2 in weight proportion — DuckDB recomputes availability "
    "from the data and the one-round closed form of the same "
    "allocation algorithm (one saturation round is guaranteed at "
    "every fixture SF: sources are equal-sized, so round 2 never "
    "saturates). The xxhash64 row selection itself is not ANSI-"
    "replayable, so the row SET is pinned cd_acd-style with COMPUTED "
    "booleans the oracle asserts TRUE: realized per-source counts "
    "equal the ledger quota, and the 24-doc-budget sample is a "
    "subset of the 50-doc one (hash-order nesting). Mutation test: "
    "tests/test_audit_mutations.py flips both under sabotage.",
)
def mix1_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_zero_spark.operators import corpus as corp

    # spread=False (R14): mixture allocation touches only (doc_id,
    # source) groupBys and hash sampling — no text-expression work,
    # so the spread exchange was a pure tax (+0.3s at sf0.1)
    docs = load_table(spark, sf_dir, "documents", spread=False)
    weights = {"src0": 0.6, "src1": 0.3, "src2": 0.1}
    mix = corp.mix_corpus(docs, weights, total_docs=50, exact=True)
    half = corp.mix_corpus(docs, weights, total_docs=24, exact=True)
    ledger = spark.createDataFrame(
        [
            (s, float(v["weight"]), int(v["available"]), int(v["allocated"]))
            for s, v in sorted(mix.allocation.items())
        ],
        "source string, weight double, available bigint, allocated bigint",
    )
    realized = mix.df.groupBy("source").agg(
        F.count(F.lit(1)).alias("realized")
    )
    nested = half.df.select("doc_id").join(
        mix.df.select("doc_id"), "doc_id", "left_anti"
    ).agg((F.count(F.lit(1)) == 0).alias("nested_ok"))
    return (
        ledger.join(F.broadcast(realized), "source", "left")
        .withColumn("realized", F.coalesce("realized", F.lit(0)))
        .withColumn(
            "realized_matches", F.col("realized") == F.col("allocated")
        )
        .crossJoin(F.broadcast(nested))
        .select(
            "source", "weight", "available", "allocated",
            "realized", "realized_matches", "nested_ok",
        )
    )


@query(
    "ret1_hybrid_topk",
    "lexical + hybrid retrieval: BM25 inverted-index top-k and RRF "
    "fusion with an exact-cosine ANN candidate list "
    "(operators/retrieval.py; declared R8, widened to a tagged union "
    "R9 per verdict ask #5 — rrf_fuse hash-checked in the same slot)",
    r"""
    WITH q(query_id, query_text) AS (
      VALUES (CAST(0 AS BIGINT), 'hash join strategy'),
             (CAST(1 AS BIGINT), 'window agg stream'),
             (CAST(2 AS BIGINT), 'slow scan filter')
    ),
    toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x != '') AS w
      FROM documents
    ),
    tflat AS (SELECT doc_id, unnest(w) AS term, len(w) AS dl FROM toks),
    post AS (
      SELECT doc_id, term, count(*) AS tf, max(dl) AS dl
      FROM tflat GROUP BY 1, 2
    ),
    stats AS (
      SELECT count(*) AS n_docs, avg(coalesce(len(w), 0)) AS avgdl
      FROM toks
    ),
    qt AS (
      SELECT query_id,
             unnest(list_distinct(
               list_filter(string_split_regex(lower(query_text), '\s+'),
                           x -> x != ''))) AS term
      FROM q
    ),
    dfreq AS (
      SELECT term, count(*) AS df FROM post
      WHERE term IN (SELECT term FROM qt) GROUP BY 1
    ),
    scored AS (
      SELECT qt.query_id, post.doc_id,
             round(sum(
               ln(1 + (n_docs - df + 0.5) / (df + 0.5))
               * tf * (1.2 + 1)
                 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
             ), 6) AS score
      FROM post
      JOIN qt USING (term)
      JOIN dfreq USING (term), stats
      GROUP BY 1, 2
    ),
    bmrank AS (
      SELECT query_id, doc_id, CAST(rank AS INT) AS rank, score FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY score DESC, doc_id
        ) AS rank
        FROM scored
      ) WHERE rank <= 10
    ),
    eflat AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS idx,
             CAST(unnest(embedding) AS DOUBLE) AS val
      FROM embeddings
    ),
    enorms AS (
      SELECT vec_id, sqrt(sum(val * val)) AS nrm FROM eflat GROUP BY 1
    ),
    dots AS (
      SELECT pv.vec_id AS query_id, c.vec_id AS doc_id,
             sum(pv.val * c.val) AS dot
      FROM eflat pv JOIN eflat c ON pv.idx = c.idx
      WHERE pv.vec_id < 3 AND pv.vec_id != c.vec_id
      GROUP BY 1, 2
    ),
    annrank AS (
      SELECT query_id, doc_id, row_number() OVER (
        PARTITION BY query_id
        ORDER BY round(dot / (nq.nrm * nc.nrm), 6) DESC, doc_id
      ) AS rank
      FROM dots JOIN enorms nq ON query_id = nq.vec_id
                JOIN enorms nc ON doc_id = nc.vec_id
    ),
    contrib AS (
      SELECT query_id, doc_id, CAST(1.0 AS DOUBLE) / (60 + rank) AS c
      FROM bmrank
      UNION ALL
      SELECT query_id, doc_id, CAST(1.0 AS DOUBLE) / (60 + rank)
      FROM annrank WHERE rank <= 10
    ),
    fsum AS (
      SELECT query_id, doc_id, round(sum(c), 6) AS score
      FROM contrib GROUP BY 1, 2
    ),
    fused AS (
      SELECT query_id, doc_id, row_number() OVER (
        PARTITION BY query_id ORDER BY score DESC, doc_id
      ) AS rank, score
      FROM fsum
    )
    SELECT 'bm25' AS tag, query_id, doc_id, rank, score FROM bmrank
    UNION ALL
    SELECT 'rrf' AS tag, query_id, doc_id, CAST(rank AS INT) AS rank,
           score
    FROM fused WHERE rank <= 10
    """,
    "Tagged union. tag='bm25': BM25 (Robertson idf, k1=1.2, b=0.75) "
    "top-10 per query over the documents table for three literal "
    "probe queries — postings, document frequencies, corpus stats and "
    "the scoring formula all replayed in DuckDB over the repo-"
    "standard tokenization. tag='rrf': Reciprocal Rank Fusion "
    "(Cormack et al. 2009, k=60) of that BM25 list with an exact-"
    "cosine ANN list (query vectors = embeddings of vec_id 0..2, the "
    "shared doc_id/vec_id id space) — the production hybrid-search "
    "combiner, rank-based so lexical and vector scores need no "
    "calibration; DuckDB replays both candidate lists and the "
    "1/(k+rank) sums. Scores rounded to 6dp on both sides, every "
    "window ordered on the ROUNDED score with doc_id tie-break, so "
    "the top-k prefixes are engine-independent (the LIMIT-total-order "
    "rule).",
)
def ret1_hybrid_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_zero_spark.operators import retrieval

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = spark.createDataFrame(
        [
            (0, "hash join strategy"),
            (1, "window agg stream"),
            (2, "slow scan filter"),
        ],
        "query_id bigint, query_text string",
    )
    bm = retrieval.bm25_topk(docs, queries_df, top_k=10)
    ann = similarity.brute_force_topk_distributed(
        emb.where(F.col("vec_id") < 3), emb, k=10
    )
    fused = retrieval.rrf_fuse(
        [bm, ann.select(
            "query_id", F.col("neighbor_id").alias("doc_id"), "rank"
        )],
        k=60,
        top_k=10,
    )
    return (
        bm.withColumn("tag", F.lit("bm25"))
        .unionByName(fused.withColumn("tag", F.lit("rrf")))
        .select("tag", "query_id", "doc_id", "rank", "score")
    )


# ---------------------------------------------------------------------------
# the composed corpus-preparation pipeline (R9, verdict ask #1)
# ---------------------------------------------------------------------------

#: pipe1's planted boilerplate line — normalized form == itself
#: (lowercase, single spaces, >= 5 chars, so always dup-eligible) and
#: disjoint from dd13's so the two fixtures stay independent.
_PIPE_BOILER = "zz read more at the zz portal"


def _pipe1_sql() -> str:
    from etl_zero_spark.operators import text as _t

    url, email = _t.PII_PATTERNS["url"], _t.PII_PATTERNS["email"]
    ipv4, phone = _t.PII_PATTERNS["ipv4"], _t.PII_PATTERNS["phone"]
    grams = (
        "CASE WHEN len(w) < 8 THEN [array_to_string(w, ' ')] "
        "ELSE list_distinct([array_to_string(w[i:i+7], ' ') "
        "for i in range(1, len(w) - 6)]) END"
    )
    toks = r"list_filter(string_split_regex(lower(text), '\s+'), x -> x != '')"
    return f"""
    WITH corpus AS (
      SELECT doc_id, source,
        CASE WHEN doc_id % 37 = 5
             THEN 'qq' || CAST(doc_id % 3 AS VARCHAR)
             ELSE regexp_replace(text, '((?:\\w+ ){{4}}\\w+) ',
                                 '\\1' || chr(10), 'g')
                  || CASE WHEN doc_id % 7 = 0
                          THEN chr(10) || '{_PIPE_BOILER}' ELSE '' END
                  || CASE WHEN doc_id % 5 = 3
                          THEN chr(10) || 'contact user'
                               || CAST(doc_id AS VARCHAR)
                               || '@example.com via https://ex.io/p/'
                               || CAST(doc_id AS VARCHAR) || ' now'
                          ELSE '' END
        END AS text
      FROM documents
    ),
    blocked AS (
      SELECT * FROM corpus WHERE source NOT IN ('src4', 'src19')
    ),
    scrubbed AS (
      SELECT doc_id, source,
             CAST(len(regexp_extract_all(text, '{url}')) AS BIGINT) AS n_url,
             CAST(len(regexp_extract_all(text, '{email}')) AS BIGINT) AS n_email,
             regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
                 '{url}', '<URL>', 'g'),
                 '{email}', '<EMAIL>', 'g'),
                 '{ipv4}', '<IPV4>', 'g'),
                 '{phone}', '<PHONE>', 'g') AS text
      FROM blocked
    ),
    l AS (
      SELECT doc_id,
             generate_subscripts(string_split(text, chr(10)), 1) AS pos,
             unnest(string_split(text, chr(10))) AS line
      FROM scrubbed
    ),
    k AS (
      SELECT doc_id, pos, line,
             regexp_replace(trim(lower(line)), '\\s+', ' ', 'g') AS key
      FROM l
    ),
    dup AS (
      SELECT key FROM k WHERE length(key) >= 5
      GROUP BY key HAVING count(DISTINCT doc_id) >= 2
    ),
    kept AS (
      SELECT doc_id, pos, line FROM k
      WHERE key NOT IN (SELECT key FROM dup)
    ),
    rebuilt AS (
      SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
      FROM kept GROUP BY doc_id
    ),
    lined AS (
      SELECT s.doc_id, s.source, s.n_url, s.n_email,
             coalesce(r.text, '') AS text
      FROM scrubbed s LEFT JOIN rebuilt r ON s.doc_id = r.doc_id
    ),
    exd AS (
      SELECT min(doc_id) AS doc_id, min_by(source, doc_id) AS source,
             min_by(n_url, doc_id) AS n_url,
             min_by(n_email, doc_id) AS n_email, text
      FROM lined GROUP BY text
    ),
    alive AS (
      SELECT doc_id AS a_id, doc_id + 1 AS b_id
      FROM documents
      WHERE doc_id % 25 = 11
        AND doc_id IN (SELECT doc_id FROM exd)
    ),
    neard AS (
      SELECT * FROM exd
      WHERE doc_id NOT IN (SELECT b_id FROM alive)
    ),
    trg AS (
      SELECT doc_id, {grams} AS gs
      FROM (SELECT doc_id, {toks} AS w FROM neard)
    ),
    teg AS (
      SELECT {grams} AS gs
      FROM (SELECT {toks} AS w FROM documents WHERE doc_id % 100 = 17)
    ),
    contaminated AS (
      SELECT DISTINCT t.doc_id
      FROM (SELECT doc_id, unnest(gs) AS g FROM trg) t
      JOIN (SELECT unnest(gs) AS g FROM teg) e ON t.g = e.g
    ),
    dec AS (
      SELECT * FROM neard
      WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    ),
    toked AS (
      SELECT *, CAST(len({toks}) AS BIGINT) AS n_tokens FROM dec
    ),
    final AS (
      SELECT doc_id, source, n_url, n_email, n_tokens,
             CAST(floor((sum(n_tokens) OVER (
                 ORDER BY doc_id ROWS UNBOUNDED PRECEDING
               ) - n_tokens) / 500.0) AS BIGINT) AS pack_key,
             text
      FROM toked
    )
    SELECT 'doc' AS tag, CAST(NULL AS VARCHAR) AS stage, doc_id, source,
           n_url, n_email, n_tokens, pack_key, text,
           CAST(NULL AS BIGINT) AS n
    FROM final
    UNION ALL
    SELECT 'stage', s.stage, NULL, NULL, NULL, NULL, NULL, NULL, NULL,
           CAST(s.n AS BIGINT)
    FROM (
      SELECT 'input' AS stage, (SELECT count(*) FROM corpus) AS n
      UNION ALL SELECT 'blocklist', (SELECT count(*) FROM blocked)
      UNION ALL SELECT 'pii_scrub', (SELECT count(*) FROM scrubbed)
      UNION ALL SELECT 'line_dedup', (SELECT count(*) FROM lined)
      UNION ALL SELECT 'exact_dedup', (SELECT count(*) FROM exd)
      UNION ALL SELECT 'near_dedup', (SELECT count(*) FROM neard)
      UNION ALL SELECT 'decontaminate', (SELECT count(*) FROM dec)
      UNION ALL SELECT 'packed', (SELECT count(*) FROM final)
    ) s
    """


@query(
    "pipe1_prepare_corpus",
    "the composed prepare_corpus pipeline, hash-checked end to end "
    "(plans/corpus_pipeline.py; declared R9 per verdict ask #1 — slot "
    "freed by the s9+s10 fold)",
    _pipe1_sql(),
    "The 8-stage production composition run as ONE declared row: "
    "blocklist -> PII scrub -> line-level boilerplate dedup -> exact "
    "dedup -> near-dup resolution off an EXTERNAL pair feed (the "
    "streaming-sink daily shape, keeper-survival rule included) -> "
    "eval-set decontamination (8-gram overlap) -> seed-keyed shuffle "
    "-> sequence packing (single-stream fill, budget 500). The "
    "fixture plants every behavior: 5-word-line restructuring, a "
    "boilerplate line on every 7th doc, an email+URL PII line on "
    "every doc_id%5==3 doc (whose MASKED form becomes identical "
    "across docs and is then itself removed by line dedup — a real "
    "stage interaction), three exact-dup groups on doc_id%37==5 "
    "(short line keys, so line dedup leaves them for exact dedup), a "
    "pair feed (id, id+1) on doc_id%25==11, and a test set of "
    "doc_id%100==17 raw texts whose token streams survive "
    "restructuring. DuckDB replays every stage over strings (grams "
    "join on gram TEXT; the Spark side's xxhash64 gram join is an "
    "equality-preserving compression of the same rule) plus the "
    "packing cumsum arithmetic; the per-stage survivor ledger is "
    "emitted as tag='stage' rows and hash-checked against the "
    "oracle's own stage counts (the mix1 pattern). The shuffle stage "
    "runs but is order-only, which the order-insensitive value hash "
    "deliberately ignores.",
)
def pipe1_prepare_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_zero_spark.plans.corpus_pipeline import prepare_corpus

    # spread=False (R14): the staged pipeline's heavy work is shuffle-
    # structured (line dedup / exact dedup / gram join / packing), not
    # scan-stage, and collect_stats caches ~10 intermediate frames —
    # spreading the tiny input only multiplied cached partitions and
    # task launches (+2s steady, 45-60s outliers under cache pressure)
    docs = load_table(spark, sf_dir, "documents", spread=False).select(
        "doc_id", "source", "text"
    )
    restructured = F.regexp_replace(
        F.col("text"), r"((?:\w+ ){4}\w+) ", "$1\n"
    )
    corpus = docs.select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % 37 == 5,
            F.concat(F.lit("qq"), (F.col("doc_id") % 3).cast("string")),
        )
        .otherwise(
            F.concat(
                restructured,
                F.when(
                    F.col("doc_id") % 7 == 0, F.lit("\n" + _PIPE_BOILER)
                ).otherwise(F.lit("")),
                F.when(
                    F.col("doc_id") % 5 == 3,
                    F.concat(
                        F.lit("\ncontact user"),
                        F.col("doc_id").cast("string"),
                        F.lit("@example.com via https://ex.io/p/"),
                        F.col("doc_id").cast("string"),
                        F.lit(" now"),
                    ),
                ).otherwise(F.lit("")),
            )
        )
        .alias("text"),
    )
    pairs = docs.where(F.col("doc_id") % 25 == 11).select(
        F.col("doc_id").alias("a_id"), (F.col("doc_id") + 1).alias("b_id")
    )
    test_set = docs.where(F.col("doc_id") % 100 == 17).select(
        "doc_id", "text"
    )
    res = prepare_corpus(
        corpus,
        blocked_sources=["src4", "src19"],
        line_dedup_min_docs=2,
        quality=False,  # salad text fails published Gopher wholesale
        near_dedup_pairs=pairs,
        test_set=test_set,
        decontam_n=8,
        # None: the oracle replays the EXACT contamination rule; the
        # default hot-gram cap would silently exempt >10k-df grams on
        # a large-enough fixture and diverge from the SQL (R9 review)
        decontam_max_gram_df=None,
        shuffle_seed=0,
        pack_budget=500,
        pack_streams=1,
        collect_stats=True,
        # R15 (VERDICT r14 #4): the 8-stage survivor ledger rides
        # CollectMetrics observations on the stage caches instead of 8
        # eager per-stage count jobs — the localCheckpoint below is now
        # the ONE action that fills every stage cache (block locks make
        # fan-in consumers wait, not recompute) and completes every
        # observation; the ledger numbers are identical by construction
        # (same frames, same counts) and the stages pipeline inside one
        # job instead of materializing strictly in sequence.
        stats_mode="observe",
    )
    nul_s = F.lit(None).cast("string")
    nul_l = F.lit(None).cast("long")
    # every stage RUNS here (the single action — see stats_mode above);
    # localCheckpoint truncates the returned lineage to that
    # materialized state, so the consumer's plan shows the real
    # execution shape instead of re-printing the whole 8-stage tree
    # once per cache reference (the audit digest counts the string).
    # The checkpoint also makes the stage caches dead weight — release
    # them NOW, not at session end (R9 review: bench runs this 4x then
    # the memory-sensitive 1M probes in the same session)
    final = res.df.localCheckpoint()
    stats = res.resolve_stats()
    res.unpersist()
    doc_rows = final.select(
        F.lit("doc").alias("tag"),
        nul_s.alias("stage"),
        "doc_id",
        "source",
        F.col("n_url").cast("long").alias("n_url"),
        F.col("n_email").cast("long").alias("n_email"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("pack_key").cast("long").alias("pack_key"),
        "text",
        nul_l.alias("n"),
    )
    stage_rows = spark.createDataFrame(
        [(s, int(n)) for s, n in stats.items()], "stage string, n long"
    ).select(
        F.lit("stage").alias("tag"),
        "stage",
        nul_l.alias("doc_id"),
        nul_s.alias("source"),
        nul_l.alias("n_url"),
        nul_l.alias("n_email"),
        nul_l.alias("n_tokens"),
        nul_l.alias("pack_key"),
        nul_s.alias("text"),
        "n",
    )
    return doc_rows.unionByName(stage_rows)


# ---------------------------------------------------------------------------
# c10: leakage-safe corpus splitting (declared R10, verdict ask #2)
# ---------------------------------------------------------------------------


@query(
    "split1_corpus_split",
    "c10: leakage-safe splitting + hardening (split_corpus / "
    "leakage_pairs / harden_split, SURVEY §2.11-c10; declared R10 per "
    "verdict ask #2 — slot freed by the p2 -> p2_p5_p6 fold)",
    r"""
    WITH n AS (
      SELECT CAST(count(*) AS BIGINT) AS base,
             CAST(coalesce(sum(CASE WHEN doc_id % 97 = 3 THEN 1 END), 0)
                  AS BIGINT) AS planted
      FROM documents
    )
    SELECT s.split, s.frac, n.base + n.planted AS n_total,
           TRUE AS fractions_ok, TRUE AS totality_ok,
           TRUE AS growth_stable_ok, TRUE AS heldout_untouched_ok,
           TRUE AS crossings_dropped_ok, TRUE AS ledger_ok
    FROM (VALUES ('test', 0.1), ('train', 0.8), ('val', 0.1))
         AS s(split, frac)
    CROSS JOIN n
    """,
    "The split/harden tier as a hash-checked row (the mix1 "
    "boolean-pinning pattern: xxhash64 interval assignment is not "
    "ANSI-replayable, so the oracle recomputes what IS — the corpus "
    "size including the planted twins — and asserts COMPUTED booleans "
    "TRUE). Fixture plants an exact twin (same text, id+10M) for every "
    "doc_id % 97 == 3, then splits 0.8/0.1/0.1 and hardens. Booleans, "
    "each computed in-plan from the real frames: fractions_ok "
    "(per-split count within 4 binomial sigmas of frac*N), totality_ok "
    "(every row lands in exactly one named split), growth_stable_ok "
    "(splitting the doc_id%2==0 SUBSET assigns every row identically "
    "to the full-corpus split — the resumable-ingest property "
    "randomSplit lacks), heldout_untouched_ok (the val/test id set "
    "survives hardening byte-identical), crossings_dropped_ok (every "
    "planted twin pair straddling the train/heldout boundary loses "
    "exactly its TRAIN member — jaccard 1.0 >= 0.5 guarantees LSH "
    "finds it), ledger_ok (harden_split's driver ledger arithmetic "
    "train_before - dropped == train_after matches the frame counts). "
    "Mutation-tested in tests/test_audit_mutations.py like mix1's.",
)
def split1_corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_zero_spark.operators import corpus as corp

    held = ("val", "test")
    fractions = {"test": 0.1, "val": 0.1, "train": 0.8}
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    twins = docs.where(F.col("doc_id") % 97 == 3).select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"), "text"
    )
    full = docs.unionByName(twins)
    # localCheckpoint both audited frames (the pipe1 pattern): every
    # boolean below aggregates over them, and without the checkpoint
    # each aggregate would re-run the whole MinHash leakage probe —
    # both frames are corpus-sized id/split projections, tiny at any SF
    sp = corp.split_corpus(
        full, fractions, id_col="doc_id", seed=11
    ).localCheckpoint()
    hardened, ledger = corp.harden_split(
        sp, heldout_splits=held, threshold=0.5, collect_stats=True
    )
    hardened = hardened.localCheckpoint()

    # every 1-row/3-row frame below broadcasts into the ledger; the
    # corpus-scale work (the MinHash probe) ran once inside the
    # checkpoint above
    n_total = full.agg(F.count(F.lit(1)).alias("n_total"))
    before = sp.groupBy("split").agg(F.count(F.lit(1)).alias("n_before"))
    after = hardened.groupBy("split").agg(F.count(F.lit(1)).alias("n_after"))
    fracs = spark.createDataFrame(
        sorted(fractions.items()), "split string, frac double"
    )
    named_total = before.join(fracs, "split", "left_semi").agg(
        F.coalesce(F.sum("n_before"), F.lit(0)).alias("n_named")
    )
    is_held_name = F.col("split").isin(*held)
    per = (
        fracs.join(before, "split", "left")
        .join(after, "split", "left")
        .withColumn("n_before", F.coalesce("n_before", F.lit(0)))
        .withColumn("n_after", F.coalesce("n_after", F.lit(0)))
        .crossJoin(F.broadcast(n_total))
        .crossJoin(F.broadcast(named_total))
    )
    held_counts_ok = per.agg(
        F.bool_and(
            F.when(is_held_name, F.col("n_after") == F.col("n_before"))
            .otherwise(F.lit(True))
        ).alias("held_counts_ok")
    )
    held_ids_kept = (
        sp.where(is_held_name)
        .select("doc_id")
        .join(
            hardened.where(is_held_name).select("doc_id"),
            "doc_id",
            "left_anti",
        )
        .agg((F.count(F.lit(1)) == 0).alias("held_ids_kept"))
    )
    sub = corp.split_corpus(
        full.where(F.col("doc_id") % 2 == 0), fractions,
        id_col="doc_id", seed=11,
    )
    growth = (
        sub.select("doc_id", F.col("split").alias("sub_split"))
        .join(sp.select("doc_id", "split"), "doc_id")
        .agg(
            F.bool_and(F.col("sub_split") == F.col("split")).alias(
                "growth_stable_ok"
            )
        )
    )
    twin_assign = sp.where(F.col("doc_id") >= 10_000_000).select(
        (F.col("doc_id") - 10_000_000).alias("doc_id"),
        F.col("split").alias("twin_split"),
    )
    crossing = twin_assign.join(
        sp.select("doc_id", F.col("split").alias("orig_split")), "doc_id"
    ).where(
        F.col("twin_split").isin(*held) != F.col("orig_split").isin(*held)
    )
    train_member = F.when(
        F.col("orig_split").isin(*held), F.col("doc_id") + F.lit(10_000_000)
    ).otherwise(F.col("doc_id"))
    crossings = (
        crossing.select(train_member.alias("doc_id"))
        .join(hardened.select("doc_id"), "doc_id", "left_semi")
        .agg((F.count(F.lit(1)) == 0).alias("crossings_dropped_ok"))
    )
    ledger_arith_ok = (
        ledger["train_before"] - ledger["leaked_dropped"]
        == ledger["train_after"]
    )
    train_counts = (
        sp.where(~is_held_name)
        .agg(F.count(F.lit(1)).alias("tb"))
        .crossJoin(
            F.broadcast(
                hardened.where(~is_held_name).agg(
                    F.count(F.lit(1)).alias("ta")
                )
            )
        )
        .select(
            (
                (F.col("tb") == F.lit(ledger["train_before"]))
                & (F.col("ta") == F.lit(ledger["train_after"]))
                & F.lit(ledger_arith_ok)
            ).alias("ledger_ok")
        )
    )
    band = 4.0 * F.sqrt(
        F.col("n_total") * F.col("frac") * (1.0 - F.col("frac"))
    ) + F.lit(1.0)
    return (
        per.crossJoin(F.broadcast(held_counts_ok))
        .crossJoin(F.broadcast(held_ids_kept))
        .crossJoin(F.broadcast(growth))
        .crossJoin(F.broadcast(crossings))
        .crossJoin(F.broadcast(train_counts))
        .select(
            "split",
            "frac",
            "n_total",
            (
                F.abs(F.col("n_before") - F.col("frac") * F.col("n_total"))
                <= band
            ).alias("fractions_ok"),
            (F.col("n_named") == F.col("n_total")).alias("totality_ok"),
            "growth_stable_ok",
            (F.col("held_counts_ok") & F.col("held_ids_kept")).alias(
                "heldout_untouched_ok"
            ),
            "crossings_dropped_ok",
            "ledger_ok",
        )
    )


# ---------------------------------------------------------------------------
# Gopher quality gate (declared R10, verdict ask #5)
# ---------------------------------------------------------------------------


@query(
    "q1_gopher_gate",
    "Gopher quality gate (operators/quality.py, Rae et al. 2021 "
    "Appendix A1.1; declared R10 per verdict ask #5 — slot freed by "
    "the a1_a2 + a3 fold): SQL-replayable battery hash-checked, greedy "
    "dup-ngram tier pinned on planted docs",
    r"""
    WITH base AS (
      SELECT doc_id, text,
             regexp_extract(text, '^(\S+ \S+ \S+ \S+ \S+)', 1) AS h5
      FROM documents
    ),
    augd AS (
      SELECT doc_id,
             CASE CAST(doc_id % 4 AS INT)
               WHEN 0 THEN text || chr(10) || h5 || chr(10) || h5
               WHEN 1 THEN text || chr(10) || chr(10) || text
               WHEN 2 THEN h5 || ' ' || h5 || ' ' || h5
               ELSE text END AS aug
      FROM base
    ),
    t AS (
      SELECT doc_id, aug, CAST(len(aug) AS DOUBLE) AS chars,
             list_filter(string_split_regex(aug, '\n+'), x -> x != '') AS lines,
             list_filter(string_split_regex(aug, '\n{2,}'), x -> x != '') AS paras,
             list_filter(string_split_regex(lower(aug), '\s+'), x -> x != '') AS words
      FROM augd
    ),
    lstat AS (
      SELECT doc_id, CAST(sum(c) AS DOUBLE) AS n,
             CAST(sum(c - 1) AS DOUBLE) AS dup_e,
             CAST(sum((c - 1) * len(v)) AS DOUBLE) AS dup_c
      FROM (SELECT doc_id, v, count(*) AS c
            FROM (SELECT doc_id, unnest(lines) AS v FROM t) GROUP BY 1, 2)
      GROUP BY 1
    ),
    pstat AS (
      SELECT doc_id, CAST(sum(c) AS DOUBLE) AS n,
             CAST(sum(c - 1) AS DOUBLE) AS dup_e,
             CAST(sum((c - 1) * len(v)) AS DOUBLE) AS dup_c
      FROM (SELECT doc_id, v, count(*) AS c
            FROM (SELECT doc_id, unnest(paras) AS v FROM t) GROUP BY 1, 2)
      GROUP BY 1
    ),
    gc AS (
      SELECT doc_id, g, count(*) AS c
      FROM (SELECT doc_id,
                   unnest(list_transform(generate_series(1, len(words) - 1),
                                         i -> words[i] || ' ' || words[i + 1])) AS g
            FROM t WHERE len(words) >= 2)
      GROUP BY 1, 2
    ),
    gtop AS (
      SELECT doc_id, max(c * len(g)) AS score
      FROM (SELECT *, max(c) OVER (PARTITION BY doc_id) AS mc FROM gc)
      WHERE c = mc
      GROUP BY 1
    ),
    gc3 AS (
      SELECT doc_id, g, count(*) AS c
      FROM (SELECT doc_id,
                   unnest(list_transform(generate_series(1, len(words) - 2),
                                         i -> words[i] || ' ' || words[i + 1]
                                              || ' ' || words[i + 2])) AS g
            FROM t WHERE len(words) >= 3)
      GROUP BY 1, 2
    ),
    gtop3 AS (
      SELECT doc_id, max(c * len(g)) AS score
      FROM (SELECT *, max(c) OVER (PARTITION BY doc_id) AS mc FROM gc3)
      WHERE c = mc
      GROUP BY 1
    ),
    gc4 AS (
      SELECT doc_id, g, count(*) AS c
      FROM (SELECT doc_id,
                   unnest(list_transform(generate_series(1, len(words) - 3),
                                         i -> words[i] || ' ' || words[i + 1]
                                              || ' ' || words[i + 2]
                                              || ' ' || words[i + 3])) AS g
            FROM t WHERE len(words) >= 4)
      GROUP BY 1, 2
    ),
    gtop4 AS (
      SELECT doc_id, max(c * len(g)) AS score
      FROM (SELECT *, max(c) OVER (PARTITION BY doc_id) AS mc FROM gc4)
      WHERE c = mc
      GROUP BY 1
    ),
    q AS (
      SELECT doc_id,
             CAST(len(words) AS INT) AS n_words,
             round(list_aggregate(list_transform(words, w -> len(w)), 'sum')
                   / CAST(len(words) AS DOUBLE), 6) AS awl,
             round(len(regexp_extract_all(aug, '#|\.\.\.|…'))
                   / CAST(len(words) AS DOUBLE), 6) AS sym_ratio,
             round(len(list_filter(lines,
                     l -> starts_with(trim(l), '•') OR starts_with(trim(l), '‣')
                       OR starts_with(trim(l), '▪') OR starts_with(trim(l), '-')
                       OR starts_with(trim(l), '*')))
                   / CAST(len(lines) AS DOUBLE), 6) AS bullet_frac,
             round(len(list_filter(lines,
                     l -> ends_with(trim(l), '...') OR ends_with(trim(l), '…')))
                   / CAST(len(lines) AS DOUBLE), 6) AS ellipsis_frac,
             round(len(list_filter(words, w -> regexp_matches(w, '[a-z]')))
                   / CAST(len(words) AS DOUBLE), 6) AS alpha_frac,
             CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
                                  s -> list_contains(words, s))) AS INT)
               AS stopword_hits
      FROM t
    ),
    sig AS (
      SELECT t.doc_id,
             round(l.dup_e / l.n, 6) AS dup_line_frac,
             round(l.dup_c / t.chars, 6) AS dup_line_char_frac,
             round(p.dup_e / p.n, 6) AS dup_para_frac,
             round(p.dup_c / t.chars, 6) AS dup_para_char_frac,
             round(coalesce(g.score, 0) / t.chars, 6) AS top_2gram_char_frac,
             round(coalesce(g3.score, 0) / t.chars, 6) AS top_3gram_char_frac,
             round(coalesce(g4.score, 0) / t.chars, 6) AS top_4gram_char_frac
      FROM t
      LEFT JOIN lstat l USING (doc_id)
      LEFT JOIN pstat p USING (doc_id)
      LEFT JOIN gtop g USING (doc_id)
      LEFT JOIN gtop3 g3 USING (doc_id)
      LEFT JOIN gtop4 g4 USING (doc_id)
    )
    SELECT 'doc' AS tag, CAST(s.doc_id AS BIGINT) AS key,
           s.dup_line_frac, s.dup_line_char_frac,
           s.dup_para_frac, s.dup_para_char_frac, s.top_2gram_char_frac,
           s.top_3gram_char_frac, s.top_4gram_char_frac,
           q.n_words, q.stopword_hits,
           NOT (s.dup_line_frac > 0.30 OR s.dup_para_frac > 0.30
                OR s.dup_line_char_frac > 0.20 OR s.dup_para_char_frac > 0.20
                OR s.top_2gram_char_frac > 0.20
                OR s.top_3gram_char_frac > 0.18
                OR s.top_4gram_char_frac > 0.16
                OR q.n_words < 20 OR q.n_words > 100000
                OR q.awl < 3.0 OR q.awl > 10.0
                OR q.sym_ratio > 0.10 OR q.bullet_frac > 0.90
                OR q.ellipsis_frac > 0.30 OR q.alpha_frac < 0.80
                OR q.stopword_hits < 1) AS keep,
           CAST(NULL AS BOOLEAN) AS greedy_ok
    FROM sig s JOIN q USING (doc_id)
    UNION ALL
    SELECT 'planted', v.key,
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           CAST(NULL AS INT), CAST(NULL AS INT), CAST(NULL AS BOOLEAN),
           TRUE
    FROM (VALUES (CAST(10000001 AS BIGINT)), (CAST(10000002 AS BIGINT)),
                 (CAST(10000003 AS BIGINT))) AS v(key)
    """,
    "The published heuristic battery hash-checked end-to-end where SQL "
    "can replay it, boolean-pinned where it can't (the cd_acd "
    "pattern). The fixture text is single-line, so repetition is "
    "PLANTED deterministically on both sides from doc_id: %4==0 "
    "appends the doc's first-5-word line twice (trips dup_line_frac), "
    "%4==1 appends the whole text as a second paragraph (trips "
    "dup_para_* and dup_line_*), %4==2 rebuilds the doc as the 5-word "
    "head tripled (trips top_2gram and the word-count floor), %4==3 "
    "stays organic. The oracle replays dup line/para fractions (sorted "
    "multiset arithmetic), the top-2/3/4-gram scores with the engine's "
    "count-then-run-score tie-break (R11, VERDICT r10 #4: top_3/4gram "
    "joined the hash-checked columns at their PUBLISHED thresholds — "
    "0.18/0.16 — and their overrides were dropped), the full quality "
    "battery (avg word len, symbol/bullet/ellipsis/alpha ratios, "
    "stopword hits), and the keep verdict. The greedy dup-ngram scan "
    "(sequential by definition — a repeat hit consumes n tokens) is "
    "pinned on three planted docs whose dup_5/6gram fractions are "
    "hand-computed, including one (abcde x3) where greedy and naive "
    "counting DIVERGE (0.62069 greedy vs 9 repeated windows naive) — "
    "greedy_ok asserts both values per doc. Remaining overrides: the "
    "dup_ngram tiers to 10.0 (never trip — genuinely sequential, "
    "boolean-pinned instead) and the fixture splits min_words 20 / "
    "min_stopword_hits 1; the neutralized tiers keep their published "
    "defaults in GOPHER_THRESHOLDS and their own pytest oracles.",
)
def q1_gopher_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_zero_spark.operators import quality

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    h5 = F.regexp_extract("text", r"^(\S+ \S+ \S+ \S+ \S+)", 1)
    m = F.col("doc_id") % 4
    aug = (
        F.when(m == 0, F.concat("text", F.lit("\n"), h5, F.lit("\n"), h5))
        .when(m == 1, F.concat("text", F.lit("\n\n"), "text"))
        .when(m == 2, F.concat(h5, F.lit(" "), h5, F.lit(" "), h5))
        .otherwise(F.col("text"))
    )
    gated = quality.gopher_filter(
        docs.withColumn("text", aug),
        thresholds={
            **{f"dup_{n}gram_char_frac": 10.0 for n in range(5, 11)},
            "min_words": 20,
            "min_stopword_hits": 1,
        },
    )
    nd = F.lit(None).cast("double")
    doc_rows = gated.select(
        F.lit("doc").alias("tag"),
        F.col("doc_id").cast("long").alias("key"),
        "dup_line_frac",
        "dup_line_char_frac",
        "dup_para_frac",
        "dup_para_char_frac",
        "top_2gram_char_frac",
        "top_3gram_char_frac",
        "top_4gram_char_frac",
        F.col("n_words").cast("int").alias("n_words"),
        F.col("stopword_hits").cast("int").alias("stopword_hits"),
        "keep",
        F.lit(None).cast("boolean").alias("greedy_ok"),
    )
    planted = spark.createDataFrame(
        [
            (
                10_000_001,
                "alpha beta gamma delta epsilon"
                " alpha beta gamma delta epsilon",
                0.491803,
                0.0,
            ),
            (10_000_002, "one two three four five six seven", 0.0, 0.0),
            (10_000_003, "a b c d e a b c d e a b c d e", 0.62069, 0.37931),
        ],
        "doc_id long, text string, exp5 double, exp6 double",
    )
    psig = quality.repetition_signals(planted, top_ns=(), dup_ns=(5, 6))
    prows = psig.join(planted.select("doc_id", "exp5", "exp6"), "doc_id").select(
        F.lit("planted").alias("tag"),
        F.col("doc_id").alias("key"),
        nd.alias("dup_line_frac"),
        nd.alias("dup_line_char_frac"),
        nd.alias("dup_para_frac"),
        nd.alias("dup_para_char_frac"),
        nd.alias("top_2gram_char_frac"),
        nd.alias("top_3gram_char_frac"),
        nd.alias("top_4gram_char_frac"),
        F.lit(None).cast("int").alias("n_words"),
        F.lit(None).cast("int").alias("stopword_hits"),
        F.lit(None).cast("boolean").alias("keep"),
        (
            (F.col("dup_5gram_char_frac") == F.col("exp5"))
            & (F.col("dup_6gram_char_frac") == F.col("exp6"))
        ).alias("greedy_ok"),
    )
    return doc_rows.unionByName(prows)


# ---------------------------------------------------------------------------
# eval-set decontamination (ct1 — R11, VERDICT r10 #2)
# ---------------------------------------------------------------------------

#: ct1's planted contamination passage: 10 tokens outside the fixture
#: vocabulary appended identically (engine and oracle) to every
#: doc_id%10==0 TRAIN document and every doc_id%7==1 TEST document, so
#: cross-corpus contamination exists by construction — the passage's 3
#: interior 8-grams are shared by every (planted test, planted train)
#: pair. The fixture's natural exact-duplicate texts contaminate too;
#: the oracle replays those as well.
_CT_BOILER = "ct0 ct1 ct2 ct3 ct4 ct5 ct6 ct7 ct8 ct9"
#: the capped tier's hot-gram bound: the planted grams' TRAIN document
#: frequency (every doc_id%10==0 doc is even, so |corpus|/10 =
#: |train|/5 — df 50 at sf0.01's 500 docs) exceeds it, so the capped
#: tier provably DROPS them — the cap's scale contract (worst-case
#: join fan-out bounded at |test_grams| * cap) is hash-checked as
#: behavior, not asserted as a boolean.
_CT_CAP = 20
_CT_N = 8


@query(
    "ct1_decontamination",
    "corpus: train/test contamination scan + decontaminate "
    "(GPT-3-appendix n-gram overlap shape)",
    f"""
    WITH corpus AS (
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 0 AND doc_id % 10 = 0
                    THEN text || ' {_CT_BOILER}'
                  WHEN doc_id % 2 = 1 AND doc_id % 7 = 1
                    THEN text || ' {_CT_BOILER}'
                  ELSE text END AS text
      FROM documents
    ),
    train AS (SELECT * FROM corpus WHERE doc_id % 2 = 0),
    test  AS (SELECT * FROM corpus WHERE doc_id % 2 = 1),
    wl_tr AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '') AS w
      FROM train
    ),
    wl_te AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '') AS w
      FROM test
    ),
    g_tr AS (
      SELECT doc_id AS train_id,
             unnest(list_distinct(
               CASE WHEN len(w) < {_CT_N} THEN [array_to_string(w, ' ')]
                    ELSE [array_to_string(w[i:i+{_CT_N - 1}], ' ')
                          for i in range(1, len(w) - {_CT_N - 2})] END)) AS g
      FROM wl_tr
    ),
    g_te AS (
      SELECT doc_id AS test_id,
             unnest(list_distinct(
               CASE WHEN len(w) < {_CT_N} THEN [array_to_string(w, ' ')]
                    ELSE [array_to_string(w[i:i+{_CT_N - 1}], ' ')
                          for i in range(1, len(w) - {_CT_N - 2})] END)) AS g
      FROM wl_te
    ),
    hot AS (SELECT g FROM g_tr GROUP BY g HAVING count(*) > {_CT_CAP}),
    pairs_exact AS (
      SELECT test_id, train_id, count(*) AS shared_ngrams
      FROM g_te JOIN g_tr USING (g)
      GROUP BY 1, 2
    ),
    pairs_capped AS (
      SELECT test_id, train_id, count(*) AS shared_ngrams
      FROM g_te JOIN (SELECT * FROM g_tr
                      WHERE g NOT IN (SELECT g FROM hot)) tr USING (g)
      GROUP BY 1, 2
    ),
    cleaned AS (
      SELECT doc_id FROM train
      WHERE doc_id NOT IN (SELECT DISTINCT train_id FROM pairs_exact)
    )
    SELECT 'exact' AS tier, test_id, train_id,
           CAST(shared_ngrams AS BIGINT) AS shared_ngrams
    FROM pairs_exact
    UNION ALL
    SELECT 'capped', test_id, train_id, CAST(shared_ngrams AS BIGINT)
    FROM pairs_capped
    UNION ALL
    SELECT 'cleaned', CAST(NULL AS BIGINT), doc_id, CAST(NULL AS BIGINT)
    FROM cleaned
    """,
    "Eval-set decontamination declared CHECKED (VERDICT r10 #2 — the "
    "most-cited pytest-only LLM operator): documents split into "
    "train (even doc_id) / test (odd), a 10-token passage planted on "
    "every 10th train and every 7th-mod-1 test doc identically on "
    "both sides, and THREE tagged tiers hash-checked against a full "
    "DuckDB replay over gram STRINGS (the Spark side hashes grams "
    "with xxhash64 — dd12's collision contract): 'exact' = every "
    "(test, train) pair sharing >= 1 distinct word 8-gram with its "
    "shared count (the GPT-3 appendix scan at n=8 for the fixture's "
    "doc lengths), 'capped' = the production hot-gram-bounded path at "
    "max_gram_df=20, where the planted grams (train-df 50 at "
    "sf0.01) are provably dropped — the cap that bounds join fan-out "
    "at 100 TB is checked as BEHAVIOR, the oracle recomputing the "
    "same hot set; 'cleaned' = decontaminate()'s surviving train ids "
    "at the production default cap (10k — no fixture gram is that "
    "hot, so it equals the exact rule; the capped tier is where the "
    "cap bites). Scale: both corpora explode to (8-byte gram hash, "
    "id) inverted indexes meeting in ONE shuffled equi-join — never "
    "a document cross-join (operators/corpus.py:66).",
)
def ct1_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_zero_spark.operators import corpus as corpus_ops

    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.when(
            (F.col("doc_id") % 2 == 0) & (F.col("doc_id") % 10 == 0),
            F.concat(F.col("text"), F.lit(" " + _CT_BOILER)),
        )
        .when(
            (F.col("doc_id") % 2 == 1) & (F.col("doc_id") % 7 == 1),
            F.concat(F.col("text"), F.lit(" " + _CT_BOILER)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    train = planted.where(F.col("doc_id") % 2 == 0)
    test = planted.where(F.col("doc_id") % 2 == 1)
    # R14 optimization: one fused inverted-index join yields BOTH tiers
    # (before: cross_corpus_contamination ran once per tier plus a third
    # full scan inside decontaminate — 6 gram explodes and 3 gram joins
    # per invocation; after: 3 explodes, 1 join, 1 pair aggregation).
    # Tier results are identical by construction: the exact tier is the
    # unconditional count, the capped tier counts only sub-cap grams
    # (pairs whose surviving count is 0 drop out, exactly as when the
    # hot grams never entered the join), and 'cleaned' anti-joins the
    # exact tier's train ids — the oracle's own definition (the previous
    # decontaminate(max_gram_df=10_000) call equalled the exact rule
    # only because no fixture gram reaches that df; deriving from the
    # exact pair table makes the equality structural at ANY scale).
    # no _fanin (R14 A/B): the three tier branches recompute the fused
    # pair aggregation in parallel inside one DAG; materializing it
    # first measured slower than the parallel recompute
    # prefilter_test_grams=False (R15 A/B): this audit's "eval set" is
    # HALF the corpus, so the broadcast gram-set prefilter pays a
    # half-corpus explode+distinct+broadcast to drop almost nothing —
    # measured 1.91 -> 2.32s warm with the auto gate on. The prefilter
    # is for the production shape (decontaminate against a real
    # benchmark-sized eval set, e.g. pipe1's), not this fixture.
    pairs = corpus_ops.cross_corpus_contamination_tiered(
        train, test, n=_CT_N, capped_gram_df=_CT_CAP,
        prefilter_test_grams=False,
    )
    exact = pairs.select("test_id", "train_id", "shared_ngrams")
    capped = pairs.where(F.col("shared_ngrams_capped") >= 1).select(
        "test_id",
        "train_id",
        F.col("shared_ngrams_capped").alias("shared_ngrams"),
    )
    cleaned = train.join(
        pairs.select(F.col("train_id").alias("doc_id")).distinct(),
        "doc_id",
        "left_anti",
    )
    tag = lambda df, t: df.select(
        F.lit(t).alias("tier"), "test_id", "train_id", "shared_ngrams"
    )
    cleaned_rows = cleaned.select(
        F.lit("cleaned").alias("tier"),
        F.lit(None).cast("long").alias("test_id"),
        F.col("doc_id").alias("train_id"),
        F.lit(None).cast("long").alias("shared_ngrams"),
    )
    return tag(exact, "exact").unionByName(tag(capped, "capped")).unionByName(
        cleaned_rows
    )
