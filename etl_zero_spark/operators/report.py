"""Corpus datasheet: the one-pass statistical summary a training-data
release ships with (the "Datasheets for Datasets" habit, Gebru et al.
2018; every serious open corpus — C4, The Pile, Dolma — publishes this
table). The reference repo's analog is its chart-prep summaries over
business tables; this is the corpus-shaped counterpart a 100 TB
pipeline runs after ``prepare_corpus``.

Scale shape: ONE pass over the text computes a slim per-doc frame
(word/char/token counts, quality score, content MD5, dimension keys —
~100 bytes/row, no text), evaluated in a single Project so codegen's
common-subexpression elimination tokenizes each document exactly once.
That slim frame persists MEMORY_AND_DISK (at 10B docs it's ~1 TB —
disk-backed executor storage on a real cluster, nothing driver-side),
and the scalar aggregation (percentile sketch, distinct-content count)
plus one bounded ``groupBy ... LIMIT top_n`` per requested dimension
column (source, language) all read it instead of re-scanning and
re-tokenizing the corpus. No collects beyond the aggregate rows
themselves; nothing driver-side scales with corpus size.
``datasheet_markdown`` renders the dict deterministically for a
release artifact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_zero_spark.operators.text import (
    bpe_token_count_expr,
    char_count_expr,
    fingerprint_exprs,
    quality_score_expr,
    word_count_expr,
)

_PCTS = [0.5, 0.9, 0.99]


def corpus_report(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str | None = None,
    lang_col: str | None = None,
    top_n: int = 20,
) -> dict:
    """Summarize a corpus into a plain dict (JSON-ready). Dimension
    breakdowns run only for the columns the caller names; each is a
    top-``top_n`` by document count with an ``(other)`` rollup row so
    the table is bounded at any cardinality (the drift-report rule)."""
    t = F.col(text_col)
    # One heavy pass: every text-derived value lands in a single
    # Project (codegen CSE tokenizes each doc once), then the slim
    # ~100 B/row result persists so the scalar agg and each dimension
    # groupBy below read it instead of re-scanning the corpus.
    slim_cols = [
        t.isNull().alias("is_null"),
        (F.length(t) == 0).alias("is_empty"),
        char_count_expr(t).alias("chars"),
        word_count_expr(t).alias("words"),
        bpe_token_count_expr(t).alias("bpe_tokens"),
        quality_score_expr(t).alias("quality"),
        fingerprint_exprs(t)["content_md5"].alias("content_key"),
    ]
    for col in (source_col, lang_col):
        if col is not None:
            slim_cols.append(F.col(col))
    slim = docs.select(*slim_cols)
    from pyspark import StorageLevel

    slim = slim.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        return _report_body(slim, source_col, lang_col, top_n)
    finally:
        # always release the persisted slim frame — an AnalysisException
        # or executor failure mid-collect must not pin it (at the
        # docstring's 10B-doc scale it is ~1 TB of executor storage)
        slim.unpersist()


def _report_body(slim, source_col, lang_col, top_n) -> dict:
    agg = slim.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(F.col("is_null"), 1)).alias("n_null_text"),
        F.count(F.when(F.col("is_empty"), 1)).alias("n_empty_text"),
        F.coalesce(F.sum("chars"), F.lit(0)).alias("total_chars"),
        F.coalesce(F.sum("words"), F.lit(0)).alias("total_words"),
        F.coalesce(F.sum("bpe_tokens"), F.lit(0)).alias("total_bpe_tokens"),
        F.percentile_approx("words", _PCTS).alias("word_pcts"),
        F.round(F.avg("quality"), 6).alias("mean_quality"),
    ).collect()[0]
    # The exact distinct-content count runs as its own aggregation:
    # mixing a distinct aggregate with the typed-imperative percentile
    # sketch above forces Catalyst off the hash-aggregate path (an
    # Expand + sort-based plan measured ~10x slower than the two
    # aggregations run separately against the persisted slim frame).
    # R15 (guide §2.6): the distinct count and the per-dimension top-N
    # jobs below are INDEPENDENT reads of the now-filled slim cache —
    # the first agg above materialized it — so they overlap from a
    # small driver thread pool instead of running as three sequential
    # jobs whose tails leave the host idle. Same queries, same rows.
    from concurrent.futures import ThreadPoolExecutor

    def _distinct() -> int:
        return slim.agg(F.countDistinct("content_key").alias("n")).collect()[0].n

    def _top(col: str):
        return (
            slim.groupBy(F.coalesce(F.col(col), F.lit("(null)")).alias("k"))
            .agg(
                F.count(F.lit(1)).alias("docs"),
                F.coalesce(F.sum("words"), F.lit(0)).alias("words"),
            )
            .orderBy(F.col("docs").desc(), F.col("k"))
            .limit(top_n)
            .collect()
        )

    dims = [(d, c) for d, c in
            (("by_source", source_col), ("by_lang", lang_col))
            if c is not None]
    with ThreadPoolExecutor(max_workers=1 + len(dims)) as pool:
        fut_distinct = pool.submit(_distinct)
        fut_dims = {dim: pool.submit(_top, col) for dim, col in dims}
        n_distinct_content = fut_distinct.result()
        dim_rows = {dim: fut.result() for dim, fut in fut_dims.items()}
    n = agg.n_docs
    report: dict = {
        "n_docs": n,
        "n_null_text": agg.n_null_text,
        "n_empty_text": agg.n_empty_text,
        "total_chars": agg.total_chars,
        "total_words": agg.total_words,
        "total_bpe_tokens": agg.total_bpe_tokens,
        "words_per_doc_p50_p90_p99": list(agg.word_pcts or []),
        "n_distinct_content": n_distinct_content,
        # docs whose normalized content duplicates an earlier doc
        # (null-text docs carry no content and are not dups of anything)
        "exact_dup_fraction": (
            round((n - agg.n_null_text - n_distinct_content) / n, 6)
            if n else 0.0
        ),
        "mean_quality": agg.mean_quality,
    }
    for dim, col in dims:
        top = dim_rows[dim]
        shown_docs = sum(r.docs for r in top)
        rows = [
            {"key": r.k, "docs": r.docs, "words": r.words} for r in top
        ]
        if n - shown_docs > 0:
            rows.append(
                {"key": "(other)", "docs": n - shown_docs, "words": None}
            )
        report[dim] = rows
    return report


def datasheet_markdown(report: dict, title: str = "Corpus datasheet") -> str:
    """Deterministic markdown rendering of ``corpus_report`` output —
    the artifact a corpus release checks in next to the data."""
    lines = [f"# {title}", ""]
    lines.append("| metric | value |")
    lines.append("|---|---|")
    for k in (
        "n_docs", "n_null_text", "n_empty_text", "total_chars",
        "total_words", "total_bpe_tokens", "n_distinct_content",
        "exact_dup_fraction", "mean_quality",
    ):
        lines.append(f"| {k} | {report.get(k)} |")
    pcts = report.get("words_per_doc_p50_p90_p99") or []
    if pcts:
        joined = " / ".join(str(int(p)) for p in pcts)
        lines.append(f"| words per doc (p50/p90/p99) | {joined} |")
    for dim, label in (("by_source", "source"), ("by_lang", "language")):
        if dim not in report:
            continue
        lines += ["", f"## Documents by {label}", "",
                  f"| {label} | docs | words |", "|---|---|---|"]
        for row in report[dim]:
            w = row["words"] if row["words"] is not None else ""
            lines.append(f"| {row['key']} | {row['docs']} | {w} |")
    return "\n".join(lines) + "\n"
