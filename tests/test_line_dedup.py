"""Line-level boilerplate dedup (operators/dedup.py — the C4/common-
crawl cleaning rule): planted nav-bar/footer lines shared across
documents, normalized matching with original bytes preserved,
distinct-doc (not occurrence) counting, the min_chars guard, the
keep-first archival variant, and a randomized corpus replayed against
a sequential Python oracle."""

from __future__ import annotations

import random
import re

from pyspark.sql import functions as F

from etl_zero_spark.operators import dedup


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BOILER = "Subscribe to our newsletter today"
FOOTER = "copyright acme corp all rights reserved"


def test_cross_doc_boilerplate_removed_everywhere(spark):
    rows = [
        (1, f"unique prose one\n{BOILER}\nmore prose one"),
        (2, f"{BOILER}\nunique prose two"),
        (3, "totally unrelated document"),
    ]
    dups = dedup.duplicate_lines(_df(spark, rows)).collect()
    assert [(r.line_key, r.n_docs) for r in dups] == [(BOILER.lower(), 2)]
    out = {
        r.doc_id: r.text
        for r in dedup.remove_duplicate_lines(_df(spark, rows)).collect()
    }
    # C4 rule: ALL occurrences go, including the first
    assert out[1] == "unique prose one\nmore prose one"
    assert out[2] == "unique prose two"
    assert out[3] == "totally unrelated document"


def test_normalized_match_preserves_original_bytes(spark):
    """Matching is on the trimmed/lowered/space-collapsed form, but
    surviving lines keep their exact original bytes."""
    rows = [
        (1, f"Keep  This   Line\n  {BOILER.upper()}  "),
        (2, f"{BOILER}\nKeep  This   Line"),
    ]
    out = {
        r.doc_id: r.text
        for r in dedup.remove_duplicate_lines(
            _df(spark, rows), min_docs=2
        ).collect()
    }
    # the boilerplate matched across case/whitespace variants and is
    # gone from both; the shared prose line ALSO crosses min_docs=2
    # and is gone; nothing else changes byte-wise
    assert out[1] == ""
    assert out[2] == ""
    rows[0] = (1, f"Keep  This   Line\n  {BOILER.upper()}  ")
    out1 = {
        r.doc_id: r.text
        for r in dedup.remove_duplicate_lines(
            _df(spark, [rows[0], (2, f"{BOILER}\nother prose")]),
            min_docs=2,
        ).collect()
    }
    assert out1[1] == "Keep  This   Line"  # exact original bytes
    assert out1[2] == "other prose"


def test_distinct_doc_counting_not_occurrences(spark):
    """A line repeated 3x INSIDE one doc is within-doc repetition, not
    boilerplate: it never reaches min_docs=2 and survives."""
    chorus = "na na na hey hey goodbye"
    rows = [(1, f"{chorus}\nverse one\n{chorus}\n{chorus}")]
    assert dedup.duplicate_lines(_df(spark, rows)).count() == 0
    out = dedup.remove_duplicate_lines(_df(spark, rows)).collect()[0].text
    assert out == f"{chorus}\nverse one\n{chorus}\n{chorus}"


def test_min_chars_guard_and_blank_lines(spark):
    """Short lines ('1.', '-') and blank lines are never dup-counted —
    document structure survives even when shared across every doc."""
    rows = [
        (1, "1.\n\nalpha prose\n-"),
        (2, "1.\n\nbeta prose\n-"),
    ]
    assert dedup.duplicate_lines(_df(spark, rows)).count() == 0
    out = {
        r.doc_id: r.text
        for r in dedup.remove_duplicate_lines(_df(spark, rows)).collect()
    }
    assert out[1] == "1.\n\nalpha prose\n-"


def test_null_and_fully_boilerplate_docs(spark):
    rows = [
        (1, f"{BOILER}\n{FOOTER}"),
        (2, f"{BOILER}\n{FOOTER}"),
        (3, None),
    ]
    out = {
        r.doc_id: r.text
        for r in dedup.remove_duplicate_lines(_df(spark, rows)).collect()
    }
    assert out[1] == "" and out[2] == ""  # row survives, text empties
    assert out[3] is None  # null text passes through


def test_keep_first_archival_variant(spark):
    """keep_first=True keeps exactly the min-(doc_id, pos) occurrence
    per boilerplate line and drops every other one."""
    rows = [
        (1, f"prose a\n{BOILER}"),
        (2, f"{BOILER}\nprose b\n{BOILER}"),
        (3, f"{BOILER}\nprose c"),
    ]
    out = {
        r.doc_id: r.text
        for r in dedup.remove_duplicate_lines(
            _df(spark, rows), keep_first=True
        ).collect()
    }
    assert out[1] == f"prose a\n{BOILER}"  # doc 1 pos 1 is the global first
    assert out[2] == "prose b"
    assert out[3] == "prose c"


def _oracle(rows, min_docs=2, min_chars=5):
    """Sequential reference: normalize, count distinct docs per line,
    drop all occurrences of lines meeting min_docs."""
    norm = lambda s: re.sub(r"\s+", " ", s.strip().lower())  # noqa: E731
    docs_per_line: dict[str, set] = {}
    for doc_id, text in rows:
        if text is None:
            continue
        for line in text.split("\n"):
            k = norm(line)
            if len(k) >= min_chars:
                docs_per_line.setdefault(k, set()).add(doc_id)
    boiler = {k for k, s in docs_per_line.items() if len(s) >= min_docs}
    out = {}
    for doc_id, text in rows:
        if text is None:
            out[doc_id] = None
            continue
        out[doc_id] = "\n".join(
            ln for ln in text.split("\n") if norm(ln) not in boiler
        )
    return out


def test_randomized_corpus_matches_sequential_oracle(spark):
    rng = random.Random(7)
    pool = [f"shared line number {i} of the pool" for i in range(12)]
    rows = []
    for d in range(60):
        lines = []
        for _ in range(rng.randint(1, 8)):
            if rng.random() < 0.4:
                lines.append(rng.choice(pool))
            else:
                lines.append(
                    f"unique d{d} " + " ".join(
                        str(rng.randint(0, 9)) for _ in range(6)
                    )
                )
        rows.append((d, "\n".join(lines)))
    expected = _oracle(rows)
    got = {
        r.doc_id: r.text
        for r in dedup.remove_duplicate_lines(
            _df(spark, rows).repartition(7)
        ).collect()
    }
    assert got == expected


def test_plan_has_no_python_udf(spark):
    df = dedup.remove_duplicate_lines(
        _df(spark, [(1, "a b c d e f"), (2, "a b c d e f")])
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
