"""Metadata-level fuzzy matching helpers (operator P9).

These run on *column names* — tens of strings on the driver — so plain
``difflib`` is the right tool, exactly as in the reference
(ETL_Pipeline_Entire/transformations_code.py:11-35). Data-level string
similarity lives in operators/dedup.py as distributed expressions.
"""

from __future__ import annotations

import difflib

#: Name-variants treated as date columns (transformations_code.py:23-28).
DATE_NAME_HINTS = ["dob", "dateofbirth", "birthdate", "date"]


def find_best_column(target: str, columns: list[str], cutoff: float = 0.6) -> str | None:
    """P9: best fuzzy match of ``target`` among ``columns``
    (transformations_code.py:11-21)."""
    matches = difflib.get_close_matches(
        target.lower(), [c.lower() for c in columns], n=1, cutoff=cutoff
    )
    if not matches:
        return None
    lowered = {c.lower(): c for c in columns}
    return lowered[matches[0]]


def is_date_column(name: str, cutoff: float = 0.75) -> bool:
    """Name-based date detection (transformations_code.py:23-35): a column
    is "a date" if its name contains 'date' or fuzzy-matches the DOB
    variants. The reference has no date dtype at all (SURVEY §1.2)."""
    n = name.lower()
    if "date" in n:
        return True
    return any(
        difflib.SequenceMatcher(None, n, hint).ratio() >= cutoff
        for hint in DATE_NAME_HINTS
    )


def word2vec_name_similarity(all_columns: list[str], seed: int = 42):
    """J3 alternative backend: seeded ``pyspark.ml.feature.Word2Vec``
    over the underscore-tokenized column-name corpus, reproducing the
    reference's learned matcher (mapping.py:67-77: Word2Vec(
    vector_size=100, window=5, min_count=1) on tokenized names;
    cosine of averaged token vectors, mapping.py:79-87).

    The corpus is metadata-scale (tens of names), so the model trains in
    one tiny Spark job and the vectors collect to a dict; returns a
    ``(a, b) -> float`` callable to plug into ``infer_join_key``.
    Seeding makes it deterministic (SURVEY §7 hard-part 2) — the
    default ``name_similarity`` stays primary because on a name-sized
    corpus Word2Vec geometry is mostly random init, exactly as in the
    reference.
    """
    import numpy as np
    from pyspark.ml.feature import Word2Vec
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    corpus = spark.createDataFrame(
        [(c.lower().split("_"),) for c in all_columns], ["tokens"]
    )
    model = Word2Vec(
        vectorSize=100,
        windowSize=5,
        minCount=1,
        seed=seed,
        inputCol="tokens",
        outputCol="vec",
    ).fit(corpus)
    vecs = {r["word"]: np.array(r["vector"]) for r in model.getVectors().collect()}

    def col_vec(name: str) -> "np.ndarray | None":
        toks = [vecs[t] for t in name.lower().split("_") if t in vecs]
        if not toks:
            return None
        return np.mean(toks, axis=0)

    def sim(a: str, b: str) -> float:
        va, vb = col_vec(a), col_vec(b)
        if va is None or vb is None:
            return 0.0
        denom = float(np.linalg.norm(va) * np.linalg.norm(vb))
        if denom == 0.0:
            return 0.0
        return float(va @ vb / denom)

    return sim


def _token_sim(a: str, b: str) -> float:
    """Token-level similarity: exact or prefix containment counts as 1.0
    (id ~ identifier, cust ~ customer — the abbreviation pattern column
    names actually exhibit), else character ratio."""
    if a == b or a.startswith(b) or b.startswith(a):
        return 1.0
    return difflib.SequenceMatcher(None, a, b).ratio()


def name_similarity(a: str, b: str) -> float:
    """Similarity of two identifiers, used by the mapper's semantic
    join-key inference (mapping.py:79-103's Word2Vec cosine analog;
    deterministic, no training). Max of: token-overlap Jaccard of
    underscore-split tokens, whole-string character ratio, and the
    symmetric average of greedy best token matches (prefix-aware, so
    customer_id ~ customer_identifier scores 1.0)."""
    ta, tb = a.lower().split("_"), b.lower().split("_")
    sa, sb = set(ta), set(tb)
    jac = len(sa & sb) / len(sa | sb) if (sa | sb) else 0.0
    ratio = difflib.SequenceMatcher(None, a.lower(), b.lower()).ratio()

    def direction(xs: list[str], ys: list[str]) -> float:
        return sum(max(_token_sim(x, y) for y in ys) for x in xs) / len(xs)

    greedy = (direction(ta, tb) + direction(tb, ta)) / 2.0
    return max(jac, ratio, greedy)
