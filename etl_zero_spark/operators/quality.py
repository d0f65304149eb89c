"""Gopher-style repetition & quality filtering for pre-training corpora.

The published heuristic battery from Rae et al. 2021 ("Scaling Language
Models: ... Gopher", Appendix A1.1), as popularized by the open
C4/RedPajama/Dolma/DataTrove pipelines — the standard cheap gate run
over every document BEFORE expensive dedup/model scoring. The reference
has no quality filtering at all (silent garbage flows into silver_db);
a 100 TB corpus cannot afford to tokenize garbage.

Design for scale: every signal except one is a pure Column expression
over per-row arrays — duplicate counting via ``array_sort`` +
adjacent-equality, top-n-gram frequency via a single ``F.aggregate``
run-length fold over the sorted gram array — so the whole battery is
ONE codegen'd projection with ZERO shuffles (per-row work is
O(L log L) in the document's own length; no cross-row state exists in
any of these definitions). The exception is the duplicate-n-gram
character fraction, whose published definition is a sequential greedy
scan (consume n tokens on a repeat hit) — inherently order-dependent,
so it runs as one Arrow-batched pandas UDF computing all six n values
per document in a single pass. That is exactly the "built-ins
genuinely can't express it" boundary.

Definitions mirror DataTrove's GopherRepetitionFilter /
GopherQualityFilter so the thresholds keep their published meaning:

* lines = non-empty splits on ``\\n+``; paragraphs on ``\\n{2,}``.
* dup_*_frac  = (occurrences beyond each element's first) / n_elements.
* dup_*_char_frac = chars in those beyond-first occurrences / n_chars.
* top_{n}gram_char_frac = count(top n-gram) * len(top n-gram) /
  n_chars, top = max count, char-length as deterministic tie-break.
* dup_{n}gram_char_frac = greedy left-to-right scan: a window equal to
  an already-seen n-gram contributes its chars and advances n tokens.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType

#: Gopher's published removal thresholds (Rae et al. Table A1).
GOPHER_THRESHOLDS: dict[str, float] = {
    "dup_line_frac": 0.30,
    "dup_para_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "dup_para_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
    "dup_5gram_char_frac": 0.15,
    "dup_6gram_char_frac": 0.14,
    "dup_7gram_char_frac": 0.13,
    "dup_8gram_char_frac": 0.12,
    "dup_9gram_char_frac": 0.11,
    "dup_10gram_char_frac": 0.10,
}

#: Gopher quality-rule bounds.
MIN_WORDS, MAX_WORDS = 50, 100_000
MIN_AVG_WORD_LEN, MAX_AVG_WORD_LEN = 3.0, 10.0
MAX_SYMBOL_WORD_RATIO = 0.10
MAX_BULLET_LINE_FRAC = 0.90
MAX_ELLIPSIS_LINE_FRAC = 0.30
MIN_ALPHA_WORD_FRAC = 0.80
MIN_STOPWORD_HITS = 2
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
BULLET_PREFIXES = ["•", "‣", "▪", "-", "*"]


def _nonempty_splits(text: Column, pattern: str) -> Column:
    return F.filter(F.split(text, pattern), lambda x: x != "")


def _words(text: Column) -> Column:
    return _nonempty_splits(F.lower(text), r"\s+")


def _dup_stats(arr: Column) -> tuple[Column, Column]:
    """(elements beyond first occurrence, their total chars) — computed
    per row via sort + adjacent equality: a value occurring c times
    contributes exactly c-1 adjacent-equal positions in the sorted
    array, which is the published beyond-first count."""
    s = F.array_sort(arr)
    n = F.size(s)
    # sequence(2, 1) would generate a DESCENDING range — guard short arrays
    idx = F.when(n >= 2, F.sequence(F.lit(2), n)).otherwise(
        F.array().cast("array<int>")
    )
    dups = F.filter(idx, lambda i: F.element_at(s, i) == F.element_at(s, i - 1))
    dup_elements = F.size(dups)
    dup_chars = F.aggregate(
        dups, F.lit(0), lambda acc, i: acc + F.length(F.element_at(s, i))
    )
    return dup_elements, dup_chars


def _grams(words: Column, n: int) -> Column:
    """Word n-grams joined with a single space (char length therefore
    matches the published ``len(" ".join(gram))``)."""
    n_tok = F.size(words)
    return F.when(
        n_tok >= n,
        F.transform(
            F.sequence(F.lit(0), n_tok - n),
            lambda i: F.array_join(F.slice(words, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _top_gram_score(grams: Column) -> Column:
    """max over grams of count * char_length, picking the gram with the
    highest count (char length as the deterministic tie-break) — one
    linear ``F.aggregate`` run-length fold over the sorted gram array.
    Returns 0 when there are no grams."""
    s = F.array_sort(grams)

    def merge(acc, x):
        same = x.eqNullSafe(acc["prev"])
        # close the previous run when the value changes
        run_score = acc["cnt"] * F.length(F.coalesce(acc["prev"], F.lit("")))
        run_wins = (acc["cnt"] > acc["best_cnt"]) | (
            (acc["cnt"] == acc["best_cnt"]) & (run_score > acc["best_score"])
        )
        closed_cnt = F.when(run_wins, acc["cnt"]).otherwise(acc["best_cnt"])
        closed_score = F.when(run_wins, run_score).otherwise(acc["best_score"])
        return F.struct(
            x.alias("prev"),
            F.when(same, acc["cnt"] + 1).otherwise(F.lit(1)).alias("cnt"),
            F.when(same, acc["best_cnt"]).otherwise(closed_cnt).alias("best_cnt"),
            F.when(same, acc["best_score"]).otherwise(closed_score).alias("best_score"),
        )

    def finish(acc):
        run_score = acc["cnt"] * F.length(F.coalesce(acc["prev"], F.lit("")))
        run_wins = (acc["cnt"] > acc["best_cnt"]) | (
            (acc["cnt"] == acc["best_cnt"]) & (run_score > acc["best_score"])
        )
        return F.when(run_wins, run_score).otherwise(acc["best_score"])

    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("cnt"),
        F.lit(0).alias("best_cnt"),
        F.lit(0).alias("best_score"),
    )
    return F.aggregate(s, init, merge, finish)


def _dup_ngram_udf(ns: tuple[int, ...]):
    """Arrow-batched UDF: the published greedy duplicate-n-gram scan
    (sequential by definition — a repeat hit consumes n tokens), all
    requested n values in one pass over each document. Returns char
    fractions aligned with ``ns``."""

    @F.pandas_udf(ArrayType(DoubleType()))
    def scan(texts: pd.Series) -> pd.Series:
        out = []
        for text in texts:
            if text is None:
                out.append(None)
                continue
            words = [w for w in text.lower().split() if w]
            total = len(text)
            fracs = []
            for n in ns:
                if total == 0:
                    fracs.append(None)
                    continue
                if len(words) < n:
                    fracs.append(0.0)
                    continue
                seen: set[str] = set()
                repeated = 0
                i = 0
                while i <= len(words) - n:
                    gram = " ".join(words[i : i + n])
                    if gram in seen:
                        repeated += len(gram)
                        i += n
                    else:
                        seen.add(gram)
                        i += 1
                fracs.append(round(repeated / total, 6))
            out.append(fracs)
        return pd.Series(out)

    return scan


def repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
) -> DataFrame:
    """Per-document repetition signals. One projection; the only
    non-Column stage is the greedy-scan UDF column."""
    t = F.col(text_col)

    def _nn(c: Column) -> Column:
        # null text -> null signal (size(null) is -1 under ANSI-off and
        # would otherwise leak a -0.0)
        return F.when(t.isNull(), F.lit(None).cast("double")).otherwise(c)

    chars = F.nullif(F.length(t).cast("double"), F.lit(0.0))
    lines = _nonempty_splits(t, r"\n+")
    paras = _nonempty_splits(t, r"\n{2,}")
    words = _words(t)

    dl_e, dl_c = _dup_stats(lines)
    dp_e, dp_c = _dup_stats(paras)
    cols = [
        F.col(id_col),
        _nn(
            F.round(dl_e / F.nullif(F.size(lines).cast("double"), F.lit(0.0)), 6)
        ).alias("dup_line_frac"),
        _nn(F.round(dl_c / chars, 6)).alias("dup_line_char_frac"),
        _nn(
            F.round(dp_e / F.nullif(F.size(paras).cast("double"), F.lit(0.0)), 6)
        ).alias("dup_para_frac"),
        _nn(F.round(dp_c / chars, 6)).alias("dup_para_char_frac"),
    ]
    for n in top_ns:
        cols.append(
            _nn(F.round(_top_gram_score(_grams(words, n)) / chars, 6)).alias(
                f"top_{n}gram_char_frac"
            )
        )
    out = df.select(*cols, F.col(text_col))
    dup_arr = _dup_ngram_udf(dup_ns)(F.col(text_col))
    out = out.withColumn("__dup", dup_arr).drop(text_col)
    for i, n in enumerate(dup_ns):
        out = out.withColumn(f"dup_{n}gram_char_frac", F.element_at("__dup", i + 1))
    return out.drop("__dup")


def quality_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher's non-repetition quality rules, pure Column expressions."""
    t = F.col(text_col)
    lines = _nonempty_splits(t, r"\n+")
    words = _words(t)
    # null text -> 0 words (not size(null) = -1), so the word-count
    # bounds flag it instead of arithmetic leaking negatives
    n_words = F.when(t.isNull(), F.lit(0)).otherwise(F.size(words))
    n_words_d = F.nullif(n_words.cast("double"), F.lit(0.0))
    n_lines_d = F.when(t.isNull(), F.lit(None).cast("double")).otherwise(
        F.nullif(F.size(lines).cast("double"), F.lit(0.0))
    )
    total_word_chars = F.aggregate(words, F.lit(0), lambda a, w: a + F.length(w))
    n_symbols = F.size(F.regexp_extract_all(t, F.lit(r"#|\.\.\.|…"), 0))
    bullet_lines = F.size(
        F.filter(
            lines,
            lambda l: F.aggregate(  # noqa: E741
                F.array(*[F.lit(b) for b in BULLET_PREFIXES]),
                F.lit(False),
                lambda acc, b: acc | F.trim(l).startswith(b),
            ),
        )
    )
    ellipsis_lines = F.size(
        F.filter(
            lines,
            lambda l: F.trim(l).endswith("...") | F.trim(l).endswith("…"),  # noqa: E741
        )
    )
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[a-z]")))
    stops = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    stop_hits = F.size(F.filter(stops, lambda s: F.array_contains(words, s)))
    return df.select(
        id_col,
        n_words.alias("n_words"),
        F.round(total_word_chars / n_words_d, 6).alias("avg_word_len"),
        F.round(n_symbols / n_words_d, 6).alias("symbol_word_ratio"),
        F.round(bullet_lines / n_lines_d, 6).alias("bullet_line_frac"),
        F.round(ellipsis_lines / n_lines_d, 6).alias("ellipsis_line_frac"),
        F.round(alpha_words / n_words_d, 6).alias("alpha_word_frac"),
        stop_hits.alias("stopword_hits"),
    )


def gopher_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    thresholds: dict[str, float] | None = None,
) -> DataFrame:
    """The full Gopher gate: repetition + quality signals joined on the
    id (both sides are projections of the same scan — Catalyst reuses
    the exchange), a ``keep`` verdict, and the list of violated rules
    so dropped documents stay auditable (quarantine-style, like
    operators/validate.py)."""
    # Every limit is overridable through ``thresholds`` — the published
    # Gopher numbers target web prose, and corpora far from it (code,
    # logs, synthetic fixtures) need per-corpus calibration: the
    # repetition fractions by their signal name, the structural bounds
    # by the lower-case keys below.
    th = {**GOPHER_THRESHOLDS, **(thresholds or {})}
    bounds = {
        "min_words": MIN_WORDS,
        "max_words": MAX_WORDS,
        "min_avg_word_len": MIN_AVG_WORD_LEN,
        "max_avg_word_len": MAX_AVG_WORD_LEN,
        "max_symbol_word_ratio": MAX_SYMBOL_WORD_RATIO,
        "max_bullet_line_frac": MAX_BULLET_LINE_FRAC,
        "max_ellipsis_line_frac": MAX_ELLIPSIS_LINE_FRAC,
        "min_alpha_word_frac": MIN_ALPHA_WORD_FRAC,
        "min_stopword_hits": MIN_STOPWORD_HITS,
    }
    for k in list(th):
        if k in bounds:
            bounds[k] = th.pop(k)
    unknown = [k for k in th if k not in GOPHER_THRESHOLDS]
    if unknown:
        raise ValueError(
            f"gopher_filter: unknown threshold key(s) {unknown}; valid: "
            f"{sorted(GOPHER_THRESHOLDS)} + {sorted(bounds)}"
        )
    rep = repetition_signals(df, text_col, id_col)
    qual = quality_signals(df, text_col, id_col)
    joined = rep.join(qual, id_col)

    checks: list[tuple[str, Column]] = [
        (name, F.coalesce(F.col(name), F.lit(0.0)) > F.lit(limit))
        for name, limit in th.items()
    ]
    checks += [
        ("too_few_words", F.col("n_words") < bounds["min_words"]),
        ("too_many_words", F.col("n_words") > bounds["max_words"]),
        ("avg_word_len_low", F.coalesce(F.col("avg_word_len"), F.lit(0.0)) < bounds["min_avg_word_len"]),
        ("avg_word_len_high", F.coalesce(F.col("avg_word_len"), F.lit(0.0)) > bounds["max_avg_word_len"]),
        ("symbol_ratio_high", F.coalesce(F.col("symbol_word_ratio"), F.lit(0.0)) > bounds["max_symbol_word_ratio"]),
        ("bullet_lines_high", F.coalesce(F.col("bullet_line_frac"), F.lit(0.0)) > bounds["max_bullet_line_frac"]),
        ("ellipsis_lines_high", F.coalesce(F.col("ellipsis_line_frac"), F.lit(0.0)) > bounds["max_ellipsis_line_frac"]),
        ("alpha_words_low", F.coalesce(F.col("alpha_word_frac"), F.lit(1.0)) < bounds["min_alpha_word_frac"]),
        ("too_few_stopwords", F.col("stopword_hits") < bounds["min_stopword_hits"]),
    ]
    violations = F.filter(
        F.array(
            *[F.when(cond, F.lit(name)).otherwise(F.lit(None)) for name, cond in checks]
        ),
        lambda x: x.isNotNull(),
    )
    return joined.withColumn("violations", violations).withColumn(
        "keep", F.size("violations") == 0
    )
