"""Span-level exact substring dedup (operators/dedup.py — the Lee et
al. 2021 regime): planted repeated passages across and within
documents, keep-first-occurrence semantics, gap-and-island span
merging, removal leaving the first occurrence intact, and the hot-gram
cap's bounded under-marking."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_zero_spark.operators import dedup


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cross_document_repeat_marks_second_only(spark):
    """A 6-token passage shared by two docs: at k=4, every occurrence
    beyond the global first (doc order) is covered by one merged span;
    the first doc is untouched."""
    passage = "alpha beta gamma delta epsilon zeta"
    rows = [
        (1, f"{_words('a', 5)} {passage} {_words('b', 5)}"),
        (2, f"{_words('c', 3)} {passage} {_words('d', 7)}"),
        (3, _words("e", 12)),
    ]
    spans = dedup.duplicate_spans(_df(spark, rows), k=4).collect()
    assert [(r.doc_id, r.span_start, r.span_end) for r in spans] == [(2, 3, 9)]
    out = {
        r.doc_id: r.text
        for r in dedup.remove_duplicate_spans(_df(spark, rows), k=4).collect()
    }
    assert passage in out[1]  # global first occurrence intact
    assert "gamma" not in out[2]
    assert out[2] == f"{_words('c', 3)} {_words('d', 7)}"
    assert out[3] == _words("e", 12)  # untouched docs pass through


def test_within_document_self_repeat(spark):
    """The same k-gram repeated inside ONE doc: the second occurrence
    is a duplicate of the first (position order breaks the tie)."""
    rep = "one two three four"
    rows = [(1, f"{rep} filler0 filler1 {rep}")]
    spans = dedup.duplicate_spans(_df(spark, rows), k=4).collect()
    assert [(r.span_start, r.span_end) for r in spans] == [(6, 10)]
    out = dedup.remove_duplicate_spans(_df(spark, rows), k=4).collect()[0].text
    assert out == f"{rep} filler0 filler1"


def test_long_repeat_merges_to_one_span(spark):
    """A 10-token repeated passage at k=4 opens 7 overlapping
    duplicated grams — gap-and-islands collapses them into exactly one
    [start, start+10) span, not 7."""
    passage = _words("p", 10)
    rows = [(1, passage + " " + _words("x", 4)),
            (2, _words("y", 6) + " " + passage)]
    spans = dedup.duplicate_spans(_df(spark, rows), k=4).collect()
    assert [(r.doc_id, r.span_start, r.span_end) for r in spans] == [(2, 6, 16)]


def test_short_docs_and_no_repeats(spark):
    rows = [(1, "too short"), (2, _words("u", 20)), (3, None), (4, "")]
    assert dedup.duplicate_spans(_df(spark, rows), k=4).count() == 0
    out = {r.doc_id: r.text
           for r in dedup.remove_duplicate_spans(_df(spark, rows), k=4).collect()}
    assert out == {1: "too short", 2: _words("u", 20), 3: None, 4: ""}


def test_doc_erased_to_empty_string_survives(spark):
    rows = [(1, _words("z", 8)), (2, _words("z", 8))]
    out = {r.doc_id: r.text
           for r in dedup.remove_duplicate_spans(_df(spark, rows), k=4).collect()}
    assert out[1] == _words("z", 8).lower()
    assert out[2] == ""  # row kept; doc-level dedup decides its fate


def test_hot_gram_cap_under_marks(spark):
    """A gram repeated in MORE docs than the cap is dropped from the
    index (bounded window partitions): boilerplate survives — the
    documented under-marking trade — while a sub-cap repeat is still
    caught."""
    boiler = "all rights reserved to us"
    rows = [(i, f"{_words(f'u{i}_', 3)} {boiler}") for i in range(6)]
    rows.append((50, _words("q", 5) + " " + _words("r", 5)))
    rows.append((51, _words("r", 5) + " " + _words("s", 5)))
    capped = dedup.duplicate_spans(_df(spark, rows), k=5, gram_df_cap=3).collect()
    assert [(r.doc_id, r.span_start, r.span_end) for r in capped] == [(51, 0, 5)]
    # uncapped: the boilerplate occurrences 2..6 are marked too
    full = dedup.duplicate_spans(_df(spark, rows), k=5, gram_df_cap=None).collect()
    assert {(r.doc_id, r.span_start, r.span_end) for r in full} == {
        (i, 3, 8) for i in range(1, 6)
    } | {(51, 0, 5)}


def test_python_oracle_random_corpus(spark):
    """Randomized corpus vs a sequential oracle implementing the spec
    directly (all k-gram occurrences ranked by (doc, pos); rank >= 2
    marked; overlapping marks merged per doc)."""
    import random

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(12)]
    rows = [
        (d, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 25))))
        for d in range(12)
    ]
    k = 3

    occ: dict = {}
    for d, text in rows:
        ws = text.split()
        for p in range(len(ws) - k + 1):
            occ.setdefault(" ".join(ws[p:p + k]), []).append((d, p))
    marked: dict = {}
    for g, positions in occ.items():
        for d, p in sorted(positions)[1:]:
            marked.setdefault(d, set()).add(p)
    want = set()
    for d, ps in marked.items():
        run = []
        for p in sorted(ps):
            if run and p - run[-1] <= k:
                run.append(p)
            else:
                if run:
                    want.add((d, run[0], run[-1] + k))
                run = [p]
        if run:
            want.add((d, run[0], run[-1] + k))

    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in dedup.duplicate_spans(
            _df(spark, rows), k=k, gram_df_cap=None
        ).collect()
    }
    assert got == want


def test_rewrite_preserves_original_case(spark):
    """Review r6: rebuilding a span-bearing doc must keep the ORIGINAL
    capitalization — gram hashing lowercases, reconstruction must not."""
    passage = "Alpha Beta Gamma Delta Epsilon Zeta"
    rows = [
        (1, f"Keep My Case {passage} Tail Words"),
        (2, f"Other Intro {passage} More Prose Here"),
    ]
    out = {r.doc_id: r.text
           for r in dedup.remove_duplicate_spans(_df(spark, rows), k=4).collect()}
    assert out[1] == f"Keep My Case {passage} Tail Words"  # untouched
    assert out[2] == "Other Intro More Prose Here"  # case intact, span cut


def test_verify_exact_matches_hash_path(spark):
    """verify_exact=True (ADVICE r6 #2: occurrence window keyed on
    (hash, gram text) so a 64-bit collision cannot mark a false
    duplicate) is a pure safety upgrade: on a collision-free corpus
    the marked positions, merged spans, and rewritten text are
    IDENTICAL to the default hash-only path."""
    passage = "alpha beta gamma delta epsilon zeta"
    rows = [
        (1, f"{_words('a', 5)} {passage} {_words('b', 5)}"),
        (2, f"{_words('c', 3)} {passage} {_words('d', 7)}"),
        (3, f"{passage} {passage}"),
        (4, _words("e", 12)),
    ]
    df = _df(spark, rows)
    for fn in (dedup.duplicate_gram_positions, dedup.duplicate_spans):
        plain = sorted(map(tuple, fn(df, k=4).collect()))
        exact = sorted(map(tuple, fn(df, k=4, verify_exact=True).collect()))
        assert plain == exact and plain  # same marks, and some exist
    out_p = {r.doc_id: r.text
             for r in dedup.remove_duplicate_spans(df, k=4).collect()}
    out_e = {r.doc_id: r.text
             for r in dedup.remove_duplicate_spans(
                 df, k=4, verify_exact=True).collect()}
    assert out_p == out_e
