"""Corpus datasheet (operators/report.py): scalar stats cross-checked
against DuckDB on the fixture corpus, bounded dimension tables with the
(other) rollup, null/empty handling, and the markdown rendering."""

from __future__ import annotations

import duckdb
import pytest

from etl_zero_spark.catalog import load_table
from etl_zero_spark.operators.report import corpus_report, datasheet_markdown
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def report(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    return corpus_report(docs, source_col="source", lang_col="lang", top_n=3)


def test_scalars_match_duckdb(report):
    want = duckdb.sql(
        f"""
        SELECT count(*) AS n,
               CAST(sum(length(text)) AS BIGINT) AS chars,
               CAST(sum(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                        x -> x != ''))) AS BIGINT) AS words,
               count(DISTINCT md5(regexp_replace(trim(lower(text)),
                                                 '\\s+', ' ', 'g'))) AS dist
        FROM read_parquet('{SF_SMOKE}/documents.parquet')
        """
    ).fetchone()
    assert report["n_docs"] == want[0]
    assert report["total_chars"] == want[1]
    assert report["total_words"] == want[2]
    assert report["n_distinct_content"] == want[3]
    assert report["exact_dup_fraction"] == round((want[0] - want[3]) / want[0], 6)
    assert report["n_null_text"] == 0 and report["n_empty_text"] == 0
    assert 0.0 < report["mean_quality"] <= 1.0
    p50, p90, p99 = report["words_per_doc_p50_p90_p99"]
    assert 0 < p50 <= p90 <= p99


def test_dimension_tables_bounded_with_other_rollup(report):
    by_source = report["by_source"]
    assert len(by_source) <= 4  # top 3 + (other)
    shown = [r for r in by_source if r["key"] != "(other)"]
    docs_counts = [r["docs"] for r in shown]
    assert docs_counts == sorted(docs_counts, reverse=True)
    assert sum(r["docs"] for r in by_source) == report["n_docs"]


def test_null_and_empty_text_counted(spark):
    df = spark.createDataFrame(
        [(1, "three words here"), (2, None), (3, ""), (4, "three words here")],
        "doc_id long, text string",
    )
    rep = corpus_report(df)
    assert rep["n_docs"] == 4
    assert rep["n_null_text"] == 1 and rep["n_empty_text"] == 1
    # null text contributes nothing to the mass columns
    assert rep["total_words"] == 6
    # docs 1 and 4 share content -> one dup among the 3 non-null rows;
    # the null doc is NOT a dup of anything
    assert rep["n_distinct_content"] == 2
    assert rep["exact_dup_fraction"] == round((4 - 1 - 2) / 4, 6)


def test_markdown_rendering_deterministic(report):
    md1 = datasheet_markdown(report)
    md2 = datasheet_markdown(report)
    assert md1 == md2
    assert "| n_docs |" in md1 and "## Documents by source" in md1
    assert md1.count("|---|---|") >= 1
