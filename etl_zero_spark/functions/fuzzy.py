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


def name_similarity(a: str, b: str) -> float:
    """Similarity of two identifiers, used by the mapper's semantic
    join-key inference (mapping.py:79-103's Word2Vec cosine analog;
    deterministic, no training): token-overlap Jaccard of
    underscore-split tokens blended with character-level ratio."""
    ta, tb = set(a.lower().split("_")), set(b.lower().split("_"))
    jac = len(ta & tb) / len(ta | tb) if (ta | tb) else 0.0
    ratio = difflib.SequenceMatcher(None, a.lower(), b.lower()).ratio()
    return max(jac, ratio)
