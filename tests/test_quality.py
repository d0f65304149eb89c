"""Gopher repetition/quality signals vs an exact Python oracle
implementing the published (DataTrove-shape) definitions."""

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from etl_zero_spark.catalog import load_table
from etl_zero_spark.operators.quality import (
    gopher_filter,
    quality_signals,
    repetition_signals,
)

SF = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# Python oracle (the published definitions, verbatim)
# --------------------------------------------------------------------------


def _dup(els):
    seen, de, dc = set(), 0, 0
    for e in els:
        if e in seen:
            de += 1
            dc += len(e)
        else:
            seen.add(e)
    return de, dc


def _grams(words, n):
    return [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]


def oracle_repetition(text):
    lines = [x for x in re.split(r"\n+", text) if x]
    paras = [x for x in re.split(r"\n{2,}", text) if x]
    words = [w for w in text.lower().split() if w]
    chars = len(text)
    out = {}
    dl_e, dl_c = _dup(lines)
    dp_e, dp_c = _dup(paras)
    out["dup_line_frac"] = dl_e / len(lines) if lines else None
    out["dup_line_char_frac"] = dl_c / chars if chars else None
    out["dup_para_frac"] = dp_e / len(paras) if paras else None
    out["dup_para_char_frac"] = dp_c / chars if chars else None
    for n in (2, 3, 4):
        grams = _grams(words, n)
        if not grams or not chars:
            out[f"top_{n}gram_char_frac"] = 0.0 if chars else None
            continue
        counts = Counter(grams)
        max_cnt = max(counts.values())
        score = max(cnt * len(g) for g, cnt in counts.items() if cnt == max_cnt)
        out[f"top_{n}gram_char_frac"] = score / chars
    for n in range(5, 11):
        if not chars or len(words) < n:
            out[f"dup_{n}gram_char_frac"] = 0.0 if chars else None
            continue
        seen, repeated, i = set(), 0, 0
        while i <= len(words) - n:
            g = " ".join(words[i : i + n])
            if g in seen:
                repeated += len(g)
                i += n
            else:
                seen.add(g)
                i += 1
        out[f"dup_{n}gram_char_frac"] = repeated / chars
    return out


DOCS = [
    # repeated lines + a repeated paragraph
    "alpha beta\nalpha beta\ngamma delta\n\npara one here\n\npara one here",
    # heavy 2-gram repetition
    "foo bar " * 40 + "end",
    # a 6-word sentence repeated -> duplicate 5/6-grams
    ("the cat sat on the mat today " * 3) + "and then something else happened here",
    # clean-ish prose
    "The quick brown fox jumps over the lazy dog.\nIt was a sunny day and "
    "everyone of the villagers agreed that it would be fine to walk with them.",
    # single word / tiny docs
    "word",
    "",
]


@pytest.mark.parametrize("idx", range(len(DOCS)))
def test_repetition_matches_oracle(spark, idx):
    text = DOCS[idx]
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = repetition_signals(df).collect()[0].asDict()
    want = oracle_repetition(text)
    for k, v in want.items():
        got = row[k]
        if v is None:
            assert got is None, f"{k}: expected null, got {got}"
        else:
            assert got == pytest.approx(v, abs=1e-5), f"{k}: {got} != {v}"


def test_quality_signals_rules(spark):
    bullets = "\n".join(f"- item {i}" for i in range(10))
    ellipsis = "\n".join(f"line {i} trails off..." for i in range(10))
    numeric = " ".join(str(i) for i in range(60))
    rows = [(1, bullets), (2, ellipsis), (3, numeric), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in quality_signals(df).collect()}
    assert got[1]["bullet_line_frac"] == pytest.approx(1.0)
    assert got[2]["ellipsis_line_frac"] == pytest.approx(1.0)
    assert got[3]["alpha_word_frac"] == pytest.approx(0.0)
    assert got[3]["stopword_hits"] == 0
    assert got[4]["n_words"] == 0 and got[4]["avg_word_len"] is None


def test_gopher_filter_verdicts(spark):
    good_words = (
        "The quick brown fox jumps over that old wooden fence and keeps "
        "running toward the distant river where several children have been "
        "playing since morning. Their parents watched from a small hill "
        "nearby, talking about the harvest and whether the weather would "
        "hold through the coming week. Nobody expected the storm that "
        "arrived later with heavy rain and sudden wind, scattering leaves "
        "across every garden in the village before nightfall."
    )
    spam = "buy now " * 100
    rows = [(1, good_words), (2, spam), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in gopher_filter(df).collect()}
    assert got[1]["keep"] is True, got[1]["violations"]
    assert got[2]["keep"] is False
    assert "top_2gram_char_frac" in got[2]["violations"]
    assert got[3]["keep"] is False
    assert "too_few_words" in got[3]["violations"]


def test_fixture_documents_profile(spark):
    docs = load_table(spark, SF, "documents")
    out = gopher_filter(docs).cache()
    n = out.count()
    assert n == docs.count()
    # fractions live in [0, 1] wherever defined
    bad = out.where(
        (F.col("dup_line_frac") < 0)
        | (F.col("dup_line_frac") > 1)
        | (F.col("top_2gram_char_frac") < 0)
        | (F.col("top_2gram_char_frac") > 1)
        | (F.col("dup_5gram_char_frac") < 0)
        | (F.col("dup_5gram_char_frac") > 1)
    ).count()
    assert bad == 0
    out.unpersist()


def test_gopher_thresholds_fully_overridable(spark):
    """R5: every limit — repetition fractions AND structural bounds —
    calibrates through the thresholds dict (non-web-prose corpora fail
    the published numbers wholesale); unknown keys raise instead of
    silently gating nothing."""
    import pytest

    from etl_zero_spark.operators.quality import gopher_filter

    docs = load_table(spark, SF, "documents")
    strict = gopher_filter(docs).where("keep").count()
    relaxed = gopher_filter(
        docs,
        thresholds={
            "min_words": 1,
            "min_avg_word_len": 0.0,
            "max_avg_word_len": 100.0,
            "min_stopword_hits": 0,
            "min_alpha_word_frac": 0.0,
            "max_symbol_word_ratio": 1.0,
        },
    ).where("keep")
    n_relaxed = relaxed.count()
    assert n_relaxed > strict and n_relaxed > 0
    with pytest.raises(ValueError, match="unknown threshold"):
        gopher_filter(docs, thresholds={"not_a_rule": 1.0})
