"""Permissive date parsing as native expressions (operator P6 support).

The reference parses every value of a date-named column with
``dateutil.parser.parse(dayfirst=True, fuzzy=True)`` and re-emits
``'%Y-%m-%d'`` strings, nulling unparseables
(ETL_Pipeline_Entire/transformations_code.py:97-110) — row-at-a-time
driver Python. Here the common formats are a tiered ``coalesce`` of
``try_to_date`` patterns (JVM-side, codegen'd); ``dayfirst=True`` is
honored by trying day-first patterns before month-first. A pandas-UDF
fallback exists for true fuzzy parsing but is off the default path —
it is the only row-at-a-time Python the engine would ever run on data.

DELIBERATE parity deviation (pinned in tests/test_text_properties.py):
``dateutil.parse(dayfirst=True)`` applies day-first EVEN to
year-leading strings — it reads ``2021-04-05`` and ``2021/04/05`` as
May 4th. This engine reads year-leading dates as ISO Y-M-D (April
5th), which is what every other system the data meets will do; only
the day<=12 year-leading case diverges from the reference. Day-first
parity for D/M/Y, dotted, dashed, and month-name forms is exact, as is
null-on-invalid (Feb 29 non-leap, April 31: ``try_to_timestamp`` is
strict and dateutil raises — both null).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Patterns tried in order; day-first before month-first to match
#: dayfirst=True (transformations_code.py:104).
DATE_PATTERNS = [
    "yyyy-MM-dd",
    "dd/MM/yyyy",
    "dd-MM-yyyy",
    "dd.MM.yyyy",
    "d MMM yyyy",
    "d MMMM yyyy",
    "MMM d yyyy",
    "MM/dd/yyyy",
    "yyyy/MM/dd",
    "yyyyMMdd",
]


def parse_date_expr(col: Column | str, patterns: list[str] | None = None) -> Column:
    """Tiered permissive parse -> DateType, null when nothing matches."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.trim(c.cast("string"))
    tries = [F.try_to_timestamp(s, F.lit(p)).cast("date") for p in patterns or DATE_PATTERNS]
    return F.coalesce(*tries)


def standardize_date_expr(col: Column | str, patterns: list[str] | None = None) -> Column:
    """P6 output contract: ``yyyy-MM-dd`` **string** (the reference emits
    strings, not dates — transformations_code.py:106-108)."""
    return F.date_format(parse_date_expr(col, patterns), "yyyy-MM-dd")


def fuzzy_parse_date_udf():
    """Last-resort parity with ``dayfirst=True, fuzzy=True`` — accepts
    noise like 'born on 03/04/2021 maybe'. Arrow-batched pandas UDF,
    gated behind this factory so importing the module never pays for it.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _fuzzy(s: pd.Series) -> pd.Series:
        from dateutil import parser as dp

        def one(v):
            if v is None:
                return None
            try:
                return dp.parse(str(v), dayfirst=True, fuzzy=True).strftime("%Y-%m-%d")
            except Exception:
                return None

        return s.map(one)

    return _fuzzy
