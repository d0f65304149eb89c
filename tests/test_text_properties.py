"""Property tests (hypothesis) for the token/shingle expressions that
every text dedup operator builds on — cross-checked against a plain
Python model on generated text, including the whitespace-only / empty /
short-document edges the fixture can't systematically cover.

Alphabet is printable ASCII + whitespace: Java and Python regex/lower
agree there; full-unicode case folding is out of contract (both engines
tokenize identically on what the fixture generator emits).
"""

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_zero_spark.operators import dedup

_WORD = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126), min_size=1, max_size=8
)
_SEP = st.sampled_from([" ", "  ", "\t", "\n", " \t "])
_TEXT = st.lists(_WORD, min_size=0, max_size=12).flatmap(
    lambda ws: _SEP.map(lambda sep: sep.join(ws))
)


def _py_tokens(t: str) -> list[str]:
    return [w for w in re.split(r"\s+", t.lower()) if w]


def _py_shingles(t: str, k: int = 3) -> list[str]:
    toks = _py_tokens(t)
    if len(toks) < k:
        return [" ".join(toks)]
    return list(dict.fromkeys(" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)))


@settings(max_examples=15, deadline=None)
@given(texts=st.lists(_TEXT, min_size=1, max_size=8))
def test_tokens_and_shingles_match_python_model(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    out = df.select(
        "doc_id",
        dedup.tokens_expr(F.col("text")).alias("toks"),
        dedup.shingles_expr(F.col("text")).alias("sh"),
    ).collect()
    for r in out:
        t = texts[r.doc_id]
        assert list(r.toks) == _py_tokens(t), f"tokens({t!r})"
        assert sorted(r.sh) == sorted(_py_shingles(t)), f"shingles({t!r})"


def test_jaccard_expr_bounds(spark):
    """Jaccard of identical shingle sets is 1, of disjoint sets 0, and
    the expression is symmetric."""
    df = spark.createDataFrame(
        [(["a", "b"], ["a", "b"]), (["a"], ["b"]), (["a", "b", "c"], ["b", "c", "d"])],
        "x array<string>, y array<string>",
    )
    rows = df.select(
        dedup.jaccard_expr(F.col("x"), F.col("y")).alias("j1"),
        dedup.jaccard_expr(F.col("y"), F.col("x")).alias("j2"),
    ).collect()
    assert [r.j1 for r in rows] == pytest.approx([1.0, 0.0, 0.5])
    assert all(r.j1 == r.j2 for r in rows)
