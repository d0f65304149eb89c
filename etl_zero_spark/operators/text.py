"""Text analysis operators (north-star extension, SURVEY §2.11).

The reference's text handling is metadata-level fuzzy matching and an
NL->SQL adapter (transformations_code.py:11-35, text_to_sql.py); a
training-data pipeline needs *data-level* text features. Everything
here is a native Column expression (length/regexp/array higher-order
functions) so a 100 TB documents table is one codegen'd projection —
no UDFs, no explode unless the operator is inherently row-expanding.

Each operator has a DuckDB-expressible formula so the oracle can verify
it exactly (the regex subset used is common to Java regex and RE2).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_zero_spark.operators.dedup import tokens_expr

#: BPE-ish token pattern: letter runs, digit runs, single non-space symbols.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

#: Tiny deterministic stopword lists for the language-ID heuristic.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "no", "por"],
    "fr": ["le", "la", "de", "et", "un", "est", "que", "pour", "dans", "ce"],
}


def word_count_expr(text: Column) -> Column:
    # size(null) is -1 under legacy semantics (ANSI off) — null text
    # must count as null, not -1
    return F.when(text.isNull(), F.lit(None)).otherwise(
        F.size(tokens_expr(text))
    )


def char_count_expr(text: Column) -> Column:
    return F.length(text)


def punct_ratio_expr(text: Column) -> Column:
    """Fraction of characters that are punctuation/symbols."""
    punct = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    return F.round(punct / F.nullif(F.length(text).cast("double"), F.lit(0.0)), 6)


def stopword_ratio_expr(text: Column, lang: str = "en") -> Column:
    stops = F.array(*[F.lit(s) for s in LANG_STOPWORDS[lang]])
    toks = tokens_expr(text)
    hits = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
    return F.round(hits / F.nullif(F.size(toks).cast("double"), F.lit(0.0)), 6)


def avg_word_len_expr(text: Column) -> Column:
    toks = tokens_expr(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.round(total / F.nullif(F.size(toks).cast("double"), F.lit(0.0)), 6)


def quality_score_expr(text: Column) -> Column:
    """Composite [0,1] quality heuristic: rewards mid-length docs with
    low punctuation density and some stopword mass — the standard
    cheap pre-filter before expensive model-based scoring."""
    n_words = word_count_expr(text).cast("double")
    length_score = F.least(n_words / F.lit(50.0), F.lit(1.0))
    punct_penalty = F.lit(1.0) - F.least(
        punct_ratio_expr(text) * F.lit(4.0), F.lit(1.0)
    )
    stop_score = F.least(stopword_ratio_expr(text) * F.lit(5.0), F.lit(1.0))
    return F.round(
        (length_score + punct_penalty + stop_score) / F.lit(3.0), 6
    )


def bpe_token_count_expr(text: Column) -> Column:
    """Token count under the BPE-ish regex (letter runs / digit runs /
    single symbols) — the cheap proxy for LLM token budgeting."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_PATTERN), 0))


def lang_scores(text: Column) -> dict[str, Column]:
    toks = tokens_expr(text)
    out = {}
    for lang, words in LANG_STOPWORDS.items():
        stops = F.array(*[F.lit(s) for s in words])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
    return out


def lang_id_expr(text: Column) -> Column:
    """Deterministic stopword-count language ID: argmax score with fixed
    precedence (en > de > es > fr), 'und' (undetermined) when no
    stopword hits at all."""
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    result = F.lit("und")
    for lang in reversed(["en", "de", "es", "fr"]):  # build so 'en' wins ties
        result = F.when(
            (scores[lang] == best) & (best > 0), F.lit(lang)
        ).otherwise(result)
    return result


def fingerprint_exprs(text: Column, k: int = 3) -> dict[str, Column]:
    """Document fingerprints:
    * ``content_md5`` — md5 of normalized text (lower, collapsed
      whitespace): exact-dup key.
    * ``min_shingle_md5`` — lexicographic min of md5 over word
      k-shingles: a 1-hash MinHash usable as a cheap near-dup
      pre-cluster key (winnowing-lite rolling fingerprint).
    """
    from etl_zero_spark.operators.dedup import shingles_expr

    normalized = F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")
    shingle_hashes = F.transform(shingles_expr(text, k), F.md5)
    return {
        "content_md5": F.md5(normalized),
        "min_shingle_md5": F.array_min(shingle_hashes),
    }


def text_profile(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One-projection profile of a documents table: counts, ratios,
    quality, token budget, language guess, fingerprints."""
    t = F.col(text_col)
    fps = fingerprint_exprs(t)
    return df.select(
        id_col,
        char_count_expr(t).alias("n_chars"),
        word_count_expr(t).alias("n_words"),
        avg_word_len_expr(t).alias("avg_word_len"),
        punct_ratio_expr(t).alias("punct_ratio"),
        stopword_ratio_expr(t).alias("stopword_ratio"),
        quality_score_expr(t).alias("quality_score"),
        bpe_token_count_expr(t).alias("n_bpe_tokens"),
        lang_id_expr(t).alias("lang_guess"),
        fps["content_md5"].alias("content_md5"),
        fps["min_shingle_md5"].alias("min_shingle_md5"),
    )


# ---------------------------------------------------------------------------
# PII scrubbing (training-data hygiene)
# ---------------------------------------------------------------------------

#: Detector patterns for the PII kinds a pre-training corpus masks
#: before anything downstream sees the text. Restricted to the regex
#: subset whose semantics are IDENTICAL in Java regex (Spark executors)
#: and RE2 (the DuckDB oracle): explicit character classes, bounded
#: repetition, alternation and \b — no lookaround, no backreferences,
#: no \w/\S shorthand (their unicode interpretations differ between
#: engines). Order matters and is PII_ORDER: URLs mask first because
#: an email or IPv4 embedded in a URL must not leave a partial URL
#: behind after an inner replacement.
PII_PATTERNS: dict[str, str] = {
    "url": r"https?://[A-Za-z0-9./_%?=&#:~@+-]+",
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "phone": r"\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b",
}
PII_ORDER = ["url", "email", "ipv4", "phone"]


def pii_count_exprs(text: Column) -> dict[str, Column]:
    """Per-kind occurrence counts on the RAW text (each detector runs
    independently pre-mask, so an email inside a URL counts as both —
    symmetric in the oracle, which also counts on raw text)."""
    return {
        f"n_{kind}": F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))
        for kind, pat in PII_PATTERNS.items()
    }


def scrub_pii_expr(text: Column) -> Column:
    """Masked text: every detected span replaced by its kind tag
    (``<URL>``, ``<EMAIL>``, ...), applied in PII_ORDER. A single
    codegen'd chain of regexp_replace — no UDF, no explode."""
    out = text
    for kind in PII_ORDER:
        out = F.regexp_replace(out, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return out


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace ``text_col`` with its scrubbed form and append per-kind
    counts — the corpus-hygiene pass a pipeline runs before dedup /
    tokenization."""
    counts = pii_count_exprs(F.col(text_col))
    out = df
    for name, expr in counts.items():
        out = out.withColumn(name, expr)
    return out.withColumn(text_col, scrub_pii_expr(F.col(text_col)))


def winnow_fingerprints_expr(
    text: Column, k: int = 5, window: int = 4
) -> Column:
    """MOSS-style winnowing fingerprints (Schleimer/Wilkerson/Aiken,
    "Winnowing: Local Algorithms for Document Fingerprinting") — the
    rolling-hash fingerprint set the north-star text tier calls for:

    1. hash every word k-gram (the rolling window over the token
       stream; xxhash64 per window — Spark evaluates the windows via
       one ``transform`` over index ``sequence``, all codegen'd);
    2. slide a ``window``-wide window over the hash sequence and keep
       each window's MINIMUM (rightmost occurrence on ties — taking
       plain min of the window slice reproduces it because equal
       hashes keep one value);
    3. distinct, sorted — the document's fingerprint set.

    Guarantee: any shared substring of at least ``window + k - 1``
    tokens between two documents yields at least one shared
    fingerprint, while storing ~2/(window+1) of all k-gram hashes —
    the bounded-size sketch for plagiarism/near-dup pre-screening.
    Shorter documents fall back to their single whole-text hash.
    Pure Column expression: no UDF, no shuffle."""
    toks = F.filter(F.split(F.lower(text), r"\s+"), lambda x: x != "")
    # null text -> null fingerprints (size(null) = -1 would otherwise
    # route it through the whole-text fallback as a CONSTANT hash,
    # pairing every null doc with every other)
    n_tok = F.size(toks)
    kgram_hashes = F.transform(
        F.sequence(F.lit(0), n_tok - k),
        lambda i: F.xxhash64(F.array_join(F.slice(toks, i + 1, k), " ")),
    )
    n_h = F.size(kgram_hashes)
    mins = F.transform(
        F.sequence(F.lit(0), n_h - window),
        lambda i: F.array_min(F.slice(kgram_hashes, i + 1, window)),
    )
    return (
        F.when(text.isNull(), F.lit(None).cast("array<bigint>"))
        .when(
            n_tok < F.lit(k + window - 1),
            F.array(F.xxhash64(F.array_join(toks, " "))),
        )
        .otherwise(F.array_sort(F.array_distinct(mins)))
    )


def winnow_overlap_pairs(
    df: DataFrame,
    min_shared: int = 2,
    k: int = 5,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_fp_df: int | None = 10_000,
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` winnowing fingerprints
    — the scale consumer of the sketch: explode each document's
    fingerprint set into an inverted index, pairs meet in one
    equi-join on the 8-byte fingerprint (the dd2/contamination shape
    on a ~2/(window+1)-sized input), hot fingerprints dropped past
    ``max_fp_df`` like stop shingles. Output: (a_id, b_id,
    shared_fingerprints)."""
    fps = df.select(
        F.col(id_col).alias("id"),
        F.explode(winnow_fingerprints_expr(F.col(text_col), k, window)).alias("fp"),
    )
    if max_fp_df is not None:
        hot = (
            fps.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("__df"))
            .where(F.col("__df") > max_fp_df)
            .select("fp")
        )
        fps = fps.join(F.broadcast(hot), "fp", "left_anti")
    a, b = fps.alias("a"), fps.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .agg(F.count(F.lit(1)).alias("shared_fingerprints"))
        .where(F.col("shared_fingerprints") >= min_shared)
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 512,
    stride: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-window document chunking (R6) — the step between cleaned
    documents and embedding/training: one output row per window of
    ``chunk_tokens`` whitespace tokens, advancing by ``stride`` tokens
    (default = chunk_tokens, i.e. disjoint windows; stride < chunk
    gives the overlapping-context windows RAG embedders use). Chunk
    text re-joins tokens with single spaces — the token-stream view,
    the standard contract for window chunkers.

    Entirely inside codegen: tokens -> start-offset sequence ->
    posexplode of per-offset slices. No shuffle, no UDF; output size
    is ~n_tokens/stride rows per doc. Documents with no tokens
    (null/empty/whitespace text) produce NO chunks; trailing windows
    shorter than ``chunk_tokens`` are kept (standard tail handling),
    except that a stride<chunk tail already fully covered by the
    previous window is skipped (offsets stop once a window reaches the
    end). With stride > chunk_tokens, windows SAMPLE the document with
    gaps by design, and tail tokens past the last in-document grid
    start are uncovered — no empty chunk row is ever emitted.

    Columns: <id_col>, chunk_id (0-based), chunk_text, n_tokens.
    """
    if chunk_tokens < 1:
        raise ValueError("chunk_tokens must be >= 1")
    stride = chunk_tokens if stride is None else stride
    if stride < 1:
        raise ValueError("stride must be >= 1")
    toks = tokens_expr(F.col(text_col))
    n = F.size(toks)
    # last start offset: the smallest on-grid s with s + chunk - 1 >= n
    # (so the final window reaches the end), CLAMPED to <= n — with
    # stride > chunk_tokens that grid point can land past the document
    # (gapped sampling is inherent to that geometry) and an unclamped
    # start would posexplode an empty junk chunk (chunk_text='',
    # n_tokens=0). Sequence is 1-based for slice.
    last = F.greatest(
        F.lit(1),
        F.least(
            n,
            (
                F.ceil((n - F.lit(chunk_tokens)) / F.lit(stride)).cast("int")
                * F.lit(stride)
                + F.lit(1)
            ),
        ),
    )
    chunks = F.transform(
        F.sequence(F.lit(1), last, F.lit(stride)),
        lambda s: F.slice(toks, s, chunk_tokens),
    )
    out = df.select(
        F.col(id_col),
        F.posexplode(
            F.when(n > 0, chunks).otherwise(F.array().cast("array<array<string>>"))
        ).alias("chunk_id", "__toks"),
    )
    return out.select(
        id_col,
        "chunk_id",
        F.array_join("__toks", " ").alias("chunk_text"),
        F.size("__toks").alias("n_tokens"),
    )


def strip_html_expr(text: Column) -> Column:
    """Plain text from raw HTML — the first step of any web-crawl
    pipeline (CommonCrawl WET-style extraction), as a chain of native
    ``regexp_replace`` stages (codegen, no parser library, no UDF):
    drop <script>/<style>/<!-- --> blocks wholesale (their CONTENT is
    never prose), replace block-level closers with newlines so words
    from adjacent blocks don't fuse, strip the remaining tags, decode
    the common entities, and collapse runs of whitespace. A rendering
    parser extracts better main-content; this is the bulk-throughput
    tier whose failure mode is extra boilerplate TEXT (handled
    downstream by the quality/perplexity gates and span dedup), never
    lost prose."""
    t = F.regexp_replace(text, r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(
        t, r"(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|table|section|article)\b[^>]*>",
        "\n",
    )
    t = F.regexp_replace(t, r"(?s)<[^>]+>", " ")
    # &amp; decodes LAST: decoding it first turns double-encoded
    # entities ('&amp;lt;' — the author explicitly escaped '&lt;')
    # into '&lt;' which the next pass wrongly decodes to '<' (the
    # classic double-decode bug).
    for ent, rep in [
        ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", "\""), ("&#39;", "'"), ("&apos;", "'"), ("&amp;", "&"),
    ]:
        t = F.regexp_replace(t, ent, rep)
    t = F.regexp_replace(t, r"[ \t\x0b\f\r]+", " ")
    t = F.regexp_replace(t, r" ?\n[ \n]*", "\n")
    # Spark's trim() strips SPACES only — newlines at the edges (from
    # boundary tags like <body>/<p>) need the regex form
    return F.regexp_replace(t, r"^[\s]+|[\s]+$", "")


def strip_html(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Column-level ``strip_html_expr`` applied to a corpus; writes
    ``out_col`` (default: in place)."""
    return df.withColumn(out_col or text_col, strip_html_expr(F.col(text_col)))


def normalize_text_expr(text: Column) -> Column:
    """Codegen-only Unicode hygiene pass - the standard cleaning step
    BEFORE any hashing/dedup/fingerprint tier, so that visually-equal
    variants hash equal: zero-width characters (ZWSP/ZWNJ/ZWJ/BOM) and
    soft hyphens dropped, NBSP/narrow-NBSP/ideographic space to plain
    space, curly quotes to ASCII quotes, en/em/horizontal dashes to
    '-', ellipsis to '...', C0/C1 control characters (except tab and
    newline) dropped, and space runs collapsed. Pure regexp_replace/
    translate chain - no UDF. Full NFKC folding (ligatures, width
    variants) needs ``normalize_text(..., nfkc=True)``'s Arrow pass."""
    t = F.regexp_replace(text, "[\u200b\u200c\u200d\ufeff\u00ad]", "")
    t = F.translate(
        t,
        "\u00a0\u202f\u3000\u2018\u2019\u201a\u201c\u201d\u201e"
        "\u2013\u2014\u2015",
        "   '''" + chr(34) * 3 + "---",
    )
    t = F.regexp_replace(t, "\u2026", "...")
    t = F.regexp_replace(t, "[\\x00-\\x08\\x0b-\\x1f\\x7f-\\x9f]", "")
    t = F.regexp_replace(t, "[ \\t]+", " ")
    return F.regexp_replace(t, "^[\\s]+|[\\s]+$", "")

def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    nfkc: bool = False,
) -> DataFrame:
    """Corpus-level text normalization. The default is the codegen
    chain above; ``nfkc=True`` additionally applies full Unicode NFKC
    folding (ligatures 'ﬁ'->'fi', fullwidth 'Ａ'->'A', compatibility
    forms) through one Arrow-vectorized UDF pass — the slow-path knob,
    paid only when the corpus actually mixes scripts/width variants."""
    out_col = out_col or text_col
    col: Column = F.col(text_col)
    if nfkc:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("string")
        def _nfkc(s: pd.Series) -> pd.Series:
            import unicodedata

            return s.map(
                lambda x: unicodedata.normalize("NFKC", x) if x is not None else None
            )

        col = _nfkc(col)
    return df.withColumn(out_col, normalize_text_expr(col))
