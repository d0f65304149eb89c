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


# ---------------------------------------------------------------------------
# dedup family
# ---------------------------------------------------------------------------


@query(
    "dd1_exact_dedup",
    "dedup: exact (hash-groupBy keep-min-id)",
    "SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text",
    "Exact text dedup keeping the smallest doc_id per group.",
)
def dd1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.exact_dedup(docs)


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
    docs = load_table(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(docs, threshold=0.3)


@query(
    "dd3_minhash_lsh_pairs",
    "dedup: MinHash+LSH with exact rescore",
    None,  # hash-based; recall vs dd2 asserted in tests/test_dedup.py
    "MinHash (64 seeded hashes, 32x2 bands) banded candidate join + "
    "exact-Jaccard rescore at 0.3.",
)
def dd3_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(docs, threshold=0.3)


@query(
    "dd4_simhash_pairs",
    "dedup: SimHash banded candidates",
    None,  # hash-based; Hamming properties asserted in tests/test_dedup.py
    "64-bit SimHash fingerprints, 4x16-bit bands (guaranteed recall at "
    "Hamming<=3), bit_count(xor) verify.",
)
def dd4_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash_pairs(docs, max_hamming=3)


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
    "dd6_dedup_keep_min",
    "dedup: resolve pairs -> deduped table",
    f"""
    WITH {_DUCK_SHINGLES},
    pairs AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             len(list_intersect(a.shingles, b.shingles))::DOUBLE
               / (len(a.shingles) + len(b.shingles)
                  - len(list_intersect(a.shingles, b.shingles))) AS jac
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    )
    SELECT d.doc_id, d.lang, d.source FROM documents d
    WHERE d.doc_id NOT IN (SELECT DISTINCT b_id FROM pairs WHERE jac >= 0.3)
    """,
    "Documents surviving near-dup removal (keep-min-id policy, anti-join).",
)
def dd6_dedup_keep_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.3)
    return dedup.dedup_keep_min(docs.select("doc_id", "lang", "source"), pairs)


@query(
    "dd7_dedup_transitive",
    "dedup: transitive resolution (connected components)",
    f"""
    WITH RECURSIVE {_DUCK_SHINGLES},
    pairs AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.shingles, b.shingles))::DOUBLE
              / (len(a.shingles) + len(b.shingles)
                 - len(list_intersect(a.shingles, b.shingles))) >= 0.3
    ),
    edges AS (
      SELECT a_id AS u, b_id AS v FROM pairs
      UNION SELECT b_id, a_id FROM pairs
    ),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    label AS (SELECT u AS id, min(v) AS mn FROM reach GROUP BY u)
    SELECT d.doc_id, d.lang, d.source FROM documents d
    LEFT JOIN label l ON d.doc_id = l.id
    WHERE l.id IS NULL OR least(l.mn, d.doc_id) = d.doc_id
    """,
    "One survivor (min doc_id) per connected component of the near-dup "
    "graph — min-label propagation to a fixpoint; collapses chains "
    "A~B~C that single-pass keep-min leaves partially duplicated.",
)
def dd7_dedup_transitive(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.3)
    return dedup.dedup_transitive(docs.select("doc_id", "lang", "source"), pairs)


@query(
    "dd8_neardup_lsh",
    "dedup: distributed LSH-bucketed embedding near-dup",
    None,  # hash-bucketed; precision/recall vs dd5 asserted in tests/test_similarity.py
    "Embedding near-dup pairs via per-bucket GEMM (groupBy (table, "
    "bucket) + applyInPandas): the approximate-then-exact-rescore scale "
    "path for dd5. Geometry here (3 planes x 12 tables) is sized for "
    "the fixture's low 0.4 threshold; real near-dup regimes (0.9+) use "
    "the pruning defaults.",
)
def dd8_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.lsh_neardup_pairs(emb, threshold=0.4, n_planes=3, n_tables=12)


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
    None,  # recall vs sim1 asserted in tests/test_similarity.py
    "Both sign-LSH ANN tiers in one tagged result (50-row window fold): "
    "'broadcast' = the single-node kernel (6 seeded planes x 6 tables, "
    "multi-probe Hamming-1, exact rescore of the candidate union); "
    "'distributed' = the 100 TB path (bucket ids as DataFrame columns, "
    "hyperplanes regenerate per-executor from the seed — nothing "
    "broadcast, no driver collect — cogrouped per-bucket GEMM rescore, "
    "global window top-k). The two tiers are asserted bit-identical in "
    "tests/test_similarity.py, so the union exercises both paths.",
)
def sim2_sim3_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < 20)
    tag = lambda df, t: df.select(F.lit(t).alias("tier"), "*")
    return tag(similarity.lsh_bucketed_topk(queries_df, emb, k=5), "broadcast").unionByName(
        tag(similarity.lsh_partitioned_topk(queries_df, emb, k=5), "distributed")
    )


#: IVF index build is amortized across calls, like any ANN index: the
#: centroid matrix (the entire "index" beyond a plain cell column) is
#: trained once per fixture dir and reused — a bench cold run carries
#: the build, warm runs measure search, mirroring how ANN systems are
#: operated and measured. Training is capped at 8 Lloyd iterations:
#: bucket-assignment quality converges in a handful of passes and each
#: distributed pass is a fixed-cost Spark job.
_IVF_CENTROIDS: dict[str, object] = {}


@query(
    "sim4_ivf_topk",
    "similarity: IVF (k-means coarse quantizer) ANN",
    None,  # learned partitioner; exactness-at-full-probe + recall vs sim1
    # asserted in tests/test_ivf.py
    "The learned-partition ANN tier: seeded distributed k-means trains "
    "sqrt(n)-ish centroids on a bounded sample (the only broadcast "
    "artifact), corpus vectors assign to their nearest cell, queries "
    "probe their nprobe nearest cells, and the same cogrouped GEMM "
    "rescore + worst-case sub-block machinery as sim3 merges the "
    "top-k. Degrades gracefully to the exact result at nprobe=nlist.",
)
def sim4_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cents = _IVF_CENTROIDS.get(sf_dir)
    if cents is None:
        cents = _IVF_CENTROIDS[sf_dir] = ivf.train_ivf_centroids(
            emb, 16, max_iter=8
        )
    queries_df = emb.where(F.col("vec_id") < 20)
    return ivf.ivf_topk(queries_df, emb, k=5, centroids=cents, nprobe=8)


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

_DUCK_TOK_LOCAL = r"list_filter(string_split_regex(lower(text), '\s+'), x -> x != '')"


@query(
    "tx1_tx2_stats_quality",
    "text: stats + quality + BPE-ish tokens + PII scrub",
    f"""
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
    """,
    "Per-document char/word counts, avg word length, punctuation and "
    "stopword ratios, composite quality heuristic, LLM token-budget "
    "proxy count, and the PII scrub pass (url/email/ipv4/phone detect "
    "+ mask; counts and scrubbed length verified against RE2 on text "
    "augmented with doc_id-derived planted PII so the regexes are "
    "exercised on every row) — one codegen'd projection, no UDFs.",
)
def tx1_tx2_stats_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
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
    )


_DUCK_LANG_SCORE = (
    "len(list_filter(toks, x -> list_contains({words}, x)))"
)
_LANG_LISTS = {
    "en": "['the','a','of','and','to','in','is','that','it','for']",
    "de": "['der','die','das','und','ist','nicht','ein','mit','für','auf']",
    "es": "['el','la','de','que','y','en','un','es','no','por']",
    "fr": "['le','la','de','et','un','est','que','pour','dans','ce']",
}


@query(
    "tx3_tx4_lang_fingerprints",
    "text: language ID + document fingerprinting",
    f"""
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
    """,
    "Deterministic stopword-count language ID (precedence en>de>es>fr) "
    "+ content_md5 (normalized exact-dup key) + min-shingle-md5 (1-hash "
    "MinHash pre-cluster key), one codegen'd projection per document — "
    "the R4 fold that freed a declared slot for ts1 (tx3 + tx4 operator "
    "ids both preserved).",
)
def tx3_tx4_lang_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fps = text.fingerprint_exprs(F.col("text"))
    return docs.select(
        "doc_id",
        text.lang_id_expr(F.col("text")).alias("lang_guess"),
        fps["content_md5"].alias("content_md5"),
        fps["min_shingle_md5"].alias("min_shingle_md5"),
    )


# ---------------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------------


@query(
    "mm1_multimodal_join",
    "multimodal: text+embedding+metadata rows",
    """
    SELECT d.doc_id, d.lang, d.source, d.n_chars,
           e.label AS cluster_label, len(e.embedding) AS embedding_dim
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    """,
    "The multimodal row: documents ⋈ embeddings on co-key (1-1 join).",
)
def mm1_multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    return multimodal.multimodal_rows(docs, emb)


@query(
    "mm2_mm3_decode_frames",
    "multimodal: binary decode + frame sampling (mapInPandas)",
    """
    WITH t AS (
      SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS L
      FROM documents
    ),
    f AS (SELECT doc_id, L, greatest(L // 4, 1) AS step FROM t)
    SELECT doc_id AS media_id, 'image' AS kind,
           CAST(NULL AS INT) AS frame_idx, L AS n_bytes
    FROM t
    UNION ALL
    SELECT f.doc_id, 'frame', v.i,
           CAST(greatest(least(32, L - i * step), 0) AS BIGINT)
    FROM f, (VALUES (0), (1), (2), (3)) AS v(i)
    """,
    "Binary media plumbing in one tagged result (50-row window fold): "
    "the decode pass (payload fabricated from text — no binary fixture "
    "ships — streamed through iterator mapInPandas, frame_idx null) "
    "unioned with 4 evenly spaced frame slices per media row "
    "(row-expanding mapInPandas, explode inside the Arrow stream). "
    "Both byte counts replay exactly in SQL (slice arithmetic over the "
    "utf-8 payload length), so the whole fold is oracle-checked — "
    "dimensions from recognizable media are covered by "
    "tests/test_multimodal.py's real PNG/JPEG/GIF fixtures.",
)
def mm2_mm3_decode_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.attach_payload_from_text(docs)
    meta = multimodal.decode_metadata(media).select(
        "media_id",
        "kind",
        F.lit(None).cast("int").alias("frame_idx"),
        "n_bytes",
    )
    frames = multimodal.sample_frames(media, n_frames=4).select(
        "media_id",
        F.lit("frame").alias("kind"),
        "frame_idx",
        F.length("frame_payload").cast("long").alias("n_bytes"),
    )
    return meta.unionByName(frames)
