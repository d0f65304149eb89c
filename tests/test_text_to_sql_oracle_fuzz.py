"""NL->SQL correctness fuzz with an executable oracle (VERDICT r12 #3).

Both r12 adversarial sweeps caught silent mistranslations the
example-based battery missed (LIKE truncation, dropped second
aggregate, projection gaps). This battery mechanizes that sweep:
(question, intended-SQL) pairs are GENERATED from the template grammar
itself over randomized schemas and randomized small data, then BOTH
sides execute in DuckDB and the result sets must be equal — or the
generator must refuse ('').  There is never a third outcome: an
answered question whose result set differs from the template's
intended semantics, or whose SQL errors, fails the test.

Design notes:
* Deterministic seeded RNG (not hypothesis) — the corpus is the same
  ~230 cases every run, so a regression bisects cleanly and CI never
  shrinks through DuckDB sessions. The hypothesis crash-fuzz in
  test_text_to_sql.py stays alongside (it checks no-crash on garbage;
  this checks CORRECTNESS on parseable questions).
* Schemas are built from vocab pools that deliberately avoid the
  generator's synonym keys ('revenue', 'sales', 'cost') — synonym
  resolution has its own pinned battery on the real catalog; here the
  target is the literal-filter / aggregate / ranked / walk templates.
* Ranked/LIMIT templates only compare when the oracle's ordering key
  is STRICTLY distinct at the cut boundary — a tie makes both engines
  free to return different prefixes, which is indeterminate, not
  wrong. Skipped-for-tie cases are counted and bounded.
* Refusal is always acceptable per-case (the documented contract:
  refusing beats guessing), but each family asserts a minimum
  answer rate so the battery cannot silently degrade into 100%
  refusals and still pass.

The first run of this battery (R13) caught a real mistranslation:
'which <local-column> has the highest total <metric>' shipped a row
ranking that dropped both the stated aggregate and the grouping —
fixed in text_to_sql.py and pinned in test_text_to_sql.py.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from etl_zero_spark.plans import text_to_sql as t2s

# ---------------------------------------------------------------------------
# vocab pools (no overlap with t2s._SYNONYMS keys or _AGGS words)
# ---------------------------------------------------------------------------

TABLES = [
    ("products", "p"), ("sellers", "se"), ("shipments", "sh"),
    ("invoices", "iv"), ("tickets", "tk"), ("vehicles", "vh"),
    ("patients", "pt"), ("movies", "mv"), ("stores", "st"),
    ("accounts", "ac"), ("courses", "cr"), ("employees", "em"),
]
MEASURES = [
    "price", "stock", "weight", "score", "budget", "salary",
    "rating", "hours", "balance", "points", "mileage", "quota",
]
DIMS = ["category", "region", "grade", "segment", "channel", "tier",
        "status", "priority"]
DIM_VALUES = {
    "category": ["toys", "games", "tools", "books"],
    "region": ["north", "south", "east", "west"],
    "grade": ["alpha", "beta", "gamma"],
    "segment": ["retail", "wholesale", "online"],
    "channel": ["web", "phone", "branch"],
    "tier": ["gold", "silver", "bronze"],
    "status": ["open", "closed", "pending"],
    "priority": ["urgent", "high", "low"],
}


def _pluralize(w: str) -> str:
    if w.endswith("y"):
        return w[:-1] + "ies"
    if w.endswith(("s", "x", "ch", "sh")):
        return w + "es"
    return w + "s"
NAMES = [
    "widget", "gadget", "sprocket", "gizmo", "doohickey", "flange",
    "bracket", "spindle", "grommet", "ferrule", "toggle", "swivel",
]

CMP_WORDS = {
    "greater than": ">", "less than": "<", "at least": ">=",
    "at most": "<=", "over": ">", "under": "<", "above": ">",
    "below": "<", "exceeds": ">",
}


class Case:
    __slots__ = ("family", "question", "intended", "schema", "tables",
                 "tie_check")

    def __init__(self, family, question, intended, schema, tables,
                 tie_check=None):
        self.family = family
        self.question = question
        self.intended = intended
        self.schema = schema          # rendered CREATE TABLE ... lines
        self.tables = tables          # {name: (cols_sql, rows)}
        # tie_check: SQL returning the full ordered ranking values; the
        # case only compares when row[n-1] != row[n] (strict boundary)
        self.tie_check = tie_check


def _mk_single_table(rng: random.Random):
    """One fact table + one unrelated distractor table."""
    (tname, pfx), (dname, dpfx) = rng.sample(TABLES, 2)
    m1, m2 = rng.sample(MEASURES, 2)
    dim = rng.choice(DIMS)
    sing = tname[:-1]
    cols = [
        (f"{pfx}_{sing}key", "number"),
        (f"{pfx}_name", "text"),
        (f"{pfx}_{m1}", "number"),
        (f"{pfx}_{m2}", "number"),
        (f"{pfx}_{dim}", "text"),
    ]
    dcols = [
        (f"{dpfx}_{dname[:-1]}key", "number"),
        (f"{dpfx}_label", "text"),
    ]
    n = rng.randint(30, 80)
    # distinct measure ints so rankings rarely tie; dims from pools
    v1 = rng.sample(range(0, 5000), n)
    v2 = rng.sample(range(0, 5000), n)
    rows = [
        (
            i,
            rng.choice(NAMES) + str(rng.randint(0, 99)),
            v1[i],
            v2[i],
            rng.choice(DIM_VALUES[dim]),
        )
        for i in range(n)
    ]
    drows = [(i, rng.choice(NAMES)) for i in range(10)]
    schema = "\n".join(
        f"CREATE TABLE {t} ({', '.join(f'{c} {ty}' for c, ty in cs)})"
        for t, cs in ((tname, cols), (dname, dcols))
    )
    tables = {tname: (cols, rows), dname: (dcols, drows)}
    return tname, pfx, m1, m2, dim, schema, tables


def _mk_dated_table(rng: random.Random):
    """One fact table carrying a date-NAMED timestamp column (the
    temporal grammar's binding rule) for the year/month families."""
    import datetime as dt

    tname, pfx = rng.choice(TABLES)
    m1 = rng.choice(MEASURES)
    dim = rng.choice(DIMS)
    dcol = f"{pfx}_shipdate"
    cols = [
        (f"{pfx}_{tname[:-1]}key", "number"),
        (f"{pfx}_{m1}", "number"),
        (f"{pfx}_{dim}", "text"),
        (dcol, "timestamp"),
    ]
    n = rng.randint(40, 90)
    vals = rng.sample(range(0, 5000), n)
    rows = [
        (
            i,
            vals[i],
            rng.choice(DIM_VALUES[dim]),
            dt.datetime(
                rng.randint(1993, 1997), rng.randint(1, 12),
                rng.randint(1, 28),
            ),
        )
        for i in range(n)
    ]
    # rendered schema collapses timestamp to 'text' exactly like the
    # catalog rendering does
    schema = (
        f"CREATE TABLE {tname} ("
        + ", ".join(
            f"{c} {'number' if ty == 'number' else 'text'}"
            for c, ty in cols
        )
        + ")"
    )
    return tname, pfx, m1, dim, dcol, schema, {tname: (cols, rows)}


def _mk_parent_child(rng: random.Random):
    """Parent + child linked by a name-inferable FK, plus a distractor
    metric only the child owns (the walk families' precondition)."""
    (pname, ppfx), (cname, cpfx) = rng.sample(TABLES, 2)
    psing, csing = pname[:-1], cname[:-1]
    cm = rng.choice([m for m in MEASURES])
    dim = rng.choice(DIMS)
    pcols = [
        (f"{ppfx}_{psing}key", "number"),
        (f"{ppfx}_name", "text"),
        (f"{ppfx}_{dim}", "text"),
    ]
    ccols = [
        (f"{cpfx}_{csing}key", "number"),
        (f"{cpfx}_{psing}key", "number"),   # FK by name
        (f"{cpfx}_{cm}", "number"),
    ]
    np_, nc = rng.randint(8, 15), rng.randint(40, 90)
    vals = rng.sample(range(0, 5000), nc)
    prows = [
        (i, rng.choice(NAMES) + str(i), rng.choice(DIM_VALUES[dim]))
        for i in range(np_)
    ]
    # ~20% of parents childless (exercises the COALESCE 0 floor)
    childed = [i for i in range(np_) if rng.random() > 0.2] or [0]
    crows = [(j, rng.choice(childed), vals[j]) for j in range(nc)]
    schema = "\n".join(
        f"CREATE TABLE {t} ({', '.join(f'{c} {ty}' for c, ty in cs)})"
        for t, cs in ((pname, pcols), (cname, ccols))
    )
    tables = {pname: (pcols, prows), cname: (ccols, crows)}
    return (pname, ppfx, psing, cname, cpfx, cm,
            [c for c, _ in pcols], schema, tables)


# ---------------------------------------------------------------------------
# case builders, one per high-risk family
# ---------------------------------------------------------------------------

def gen_cases() -> list[Case]:
    rng = random.Random(0xE72)
    cases: list[Case] = []

    for i in range(18):  # literal comparison filters
        t, p, m1, _, _, schema, tabs = _mk_single_table(rng)
        word, op = sorted(CMP_WORDS.items())[i % len(CMP_WORDS)]
        n = rng.randint(100, 4000)
        cases.append(Case(
            "cmp_filter",
            f"show all {t} where {m1} {word} {n}",
            f"SELECT * FROM {t} WHERE {p}_{m1} {op} {n}",
            schema, tabs,
        ))

    for _ in range(14):  # BETWEEN
        t, p, m1, _, _, schema, tabs = _mk_single_table(rng)
        a = rng.randint(0, 2000)
        b = a + rng.randint(100, 2500)
        cases.append(Case(
            "between_filter",
            f"{t} where {m1} between {a} and {b}",
            f"SELECT * FROM {t} WHERE {p}_{m1} BETWEEN {a} AND {b}",
            schema, tabs,
        ))

    for i in range(14):  # equality / negation on a dim
        t, p, _, _, dim, schema, tabs = _mk_single_table(rng)
        v = rng.choice(DIM_VALUES[dim])
        if i % 2:
            q = f"{t} where {dim} is not {v}"
            sql = f"SELECT * FROM {t} WHERE {p}_{dim} <> '{v}'"
        else:
            q = f"{t} where {dim} is {v}"
            sql = f"SELECT * FROM {t} WHERE {p}_{dim} = '{v}'"
        cases.append(Case("eq_filter", q, sql, schema, tabs))

    for i in range(14):  # LIKE: contains / starts with / ends with
        t, p, _, _, _, schema, tabs = _mk_single_table(rng)
        frag = rng.choice(NAMES)[1:4] if i % 3 == 0 else rng.choice(NAMES)[:3]
        kind = ("contains", "starts with", "ends with")[i % 3]
        pat = {"contains": f"%{frag}%", "starts with": f"{frag}%",
               "ends with": f"%{frag}"}[kind]
        cases.append(Case(
            "like_filter",
            f"{t} where name {kind} {frag}",
            f"SELECT * FROM {t} WHERE {p}_name LIKE '{pat}'",
            schema, tabs,
        ))

    for i in range(14):  # two-condition AND / OR
        t, p, m1, m2, _, schema, tabs = _mk_single_table(rng)
        a, b = rng.randint(500, 4000), rng.randint(500, 4000)
        conj = "and" if i % 2 else "or"
        cases.append(Case(
            "multi_cond",
            f"{t} where {m1} over {a} {conj} {m2} under {b}",
            f"SELECT * FROM {t} WHERE {p}_{m1} > {a} "
            f"{conj.upper()} {p}_{m2} < {b}",
            schema, tabs,
        ))

    for i in range(14):  # scalar aggregate
        t, p, m1, _, _, schema, tabs = _mk_single_table(rng)
        agg, fn = [("average", "AVG"), ("total", "SUM"), ("max", "MAX"),
                   ("minimum", "MIN")][i % 4]
        cases.append(Case(
            "agg_scalar",
            f"what is the {agg} {m1} in {t}",
            f"SELECT {fn}({p}_{m1}) AS {p}_{m1}_{fn.lower()} FROM {t}",
            schema, tabs,
        ))

    for i in range(14):  # grouped aggregate
        t, p, m1, _, dim, schema, tabs = _mk_single_table(rng)
        agg, fn = [("average", "AVG"), ("sum", "SUM"),
                   ("max", "MAX")][i % 3]
        cases.append(Case(
            "agg_grouped",
            f"{agg} {m1} of {t} per {dim}",
            f"SELECT {p}_{dim}, {fn}({p}_{m1}) AS {p}_{m1}_{fn.lower()} "
            f"FROM {t} GROUP BY {p}_{dim}",
            schema, tabs,
        ))

    for i in range(14):  # the r12 dropped-second-aggregate family
        t, p, m1, _, dim, schema, tabs = _mk_single_table(rng)
        grouped = i % 2
        tail = f" per {dim}" if grouped else ""
        lead = f"{p}_{dim}, " if grouped else ""
        grp = f" GROUP BY {p}_{dim}" if grouped else ""
        cases.append(Case(
            "double_agg",
            f"total and average {m1} of {t}{tail}",
            f"SELECT {lead}SUM({p}_{m1}) AS {p}_{m1}_sum, "
            f"AVG({p}_{m1}) AS {p}_{m1}_avg FROM {t}{grp}",
            schema, tabs,
        ))

    for i in range(14):  # counts: grouped and filtered
        t, p, _, _, dim, schema, tabs = _mk_single_table(rng)
        if i % 2:
            v = rng.choice(DIM_VALUES[dim])
            q = f"count {t} where {dim} is {v}"
            sql = f"SELECT COUNT(*) AS n FROM {t} WHERE {p}_{dim} = '{v}'"
        else:
            q = f"how many {t} per {dim}"
            sql = (f"SELECT {p}_{dim}, COUNT(*) AS n FROM {t} "
                   f"GROUP BY {p}_{dim}")
        cases.append(Case("count", q, sql, schema, tabs))

    for _ in range(10):  # DISTINCT
        t, p, _, _, dim, schema, tabs = _mk_single_table(rng)
        cases.append(Case(
            "distinct",
            f"distinct {dim} from {t}",
            f"SELECT DISTINCT {p}_{dim} FROM {t}",
            schema, tabs,
        ))

    for _ in range(14):  # top-N raw rows (tie-checked)
        t, p, m1, _, _, schema, tabs = _mk_single_table(rng)
        n = rng.randint(2, 7)
        cases.append(Case(
            "topn_rows",
            f"top {n} {t} by {m1}",
            f"SELECT * FROM {t} ORDER BY {p}_{m1} DESC LIMIT {n}",
            schema, tabs,
            tie_check=(f"SELECT {p}_{m1} FROM {t} "
                       f"ORDER BY {p}_{m1} DESC", n),
        ))

    for i in range(14):  # ranked groups (tie-checked)
        t, p, m1, _, dim, schema, tabs = _mk_single_table(rng)
        n = rng.randint(2, 3)
        agg, fn = [("total", "SUM"), ("average", "AVG")][i % 2]
        plural = _pluralize(dim)
        cases.append(Case(
            "ranked_group",
            f"top {n} {plural} by {agg} {m1}",
            f"SELECT {p}_{dim}, {fn}({p}_{m1}) AS {p}_{m1}_{fn.lower()} "
            f"FROM {t} GROUP BY {p}_{dim} "
            f"ORDER BY {p}_{m1}_{fn.lower()} DESC LIMIT {n}",
            schema, tabs,
            tie_check=(f"SELECT {fn}({p}_{m1}) FROM {t} "
                       f"GROUP BY {p}_{dim} ORDER BY 1 DESC", n),
        ))

    for i in range(18):  # <column>-subject superlative (the R13 fix),
        # across the which/what/with framings the outer regex accepts
        t, p, m1, _, dim, schema, tabs = _mk_single_table(rng)
        agg, fn = [("total", "SUM"), ("average", "AVG")][i % 2]
        framing = [
            f"which {dim} has the highest {agg} {m1}",
            f"what {dim} has the highest {agg} {m1}",
            f"the {dim} with the highest {agg} {m1}",
        ][i % 3]
        cases.append(Case(
            "col_superlative",
            framing,
            f"SELECT {p}_{dim}, {fn}({p}_{m1}) AS {p}_{m1}_{fn.lower()} "
            f"FROM {t} GROUP BY {p}_{dim} "
            f"ORDER BY {p}_{m1}_{fn.lower()} DESC LIMIT 1",
            schema, tabs,
            tie_check=(f"SELECT {fn}({p}_{m1}) FROM {t} "
                       f"GROUP BY {p}_{dim} ORDER BY 1 DESC", 1),
        ))

    for _ in range(14):  # row superlative (table subject)
        t, p, m1, _, _, schema, tabs = _mk_single_table(rng)
        sing = t[:-1]
        cases.append(Case(
            "row_superlative",
            f"which {sing} has the highest {m1}",
            f"SELECT * FROM {t} ORDER BY {p}_{m1} DESC LIMIT 1",
            schema, tabs,
            tie_check=(f"SELECT {p}_{m1} FROM {t} "
                       f"ORDER BY {p}_{m1} DESC", 1),
        ))

    for i in range(14):  # stated projections (an r12 sweep catch)
        t, p, m1, m2, dim, schema, tabs = _mk_single_table(rng)
        if i % 2:
            q = f"show the name, {m1} and {dim} of {t}"
            sql = f"SELECT {p}_name, {p}_{m1}, {p}_{dim} FROM {t}"
        else:
            q = f"show the name and {m2} of {t}"
            sql = f"SELECT {p}_name, {p}_{m2} FROM {t}"
        cases.append(Case("projection", q, sql, schema, tabs))

    for i in range(14):  # HAVING on grouped aggregates
        t, p, m1, _, dim, schema, tabs = _mk_single_table(rng)
        hn = rng.randint(1000, 100000)
        if i % 3 == 0:
            q = (f"total {m1} of {t} per {dim} having count over "
                 f"{hn % 20}")
            sql = (f"SELECT {p}_{dim}, SUM({p}_{m1}) AS {p}_{m1}_sum "
                   f"FROM {t} GROUP BY {p}_{dim} "
                   f"HAVING COUNT(*) > {hn % 20}")
        elif i % 3 == 1:
            q = (f"total {m1} of {t} per {dim} having sum over {hn}")
            sql = (f"SELECT {p}_{dim}, SUM({p}_{m1}) AS {p}_{m1}_sum "
                   f"FROM {t} GROUP BY {p}_{dim} "
                   f"HAVING SUM({p}_{m1}) > {hn}")
        else:
            q = (f"average {m1} per {dim} having average {m1} "
                 f"under {hn}")
            sql = (f"SELECT {p}_{dim}, AVG({p}_{m1}) AS {p}_{m1}_avg "
                   f"FROM {t} GROUP BY {p}_{dim} "
                   f"HAVING AVG({p}_{m1}) < {hn}")
        cases.append(Case("having", q, sql, schema, tabs))

    for _ in range(14):  # count-ranked local groups (R13 gap-close)
        t, p, _, _, dim, schema, tabs = _mk_single_table(rng)
        n = rng.randint(2, 3)
        kind = rng.choice(["number", "count"])
        cases.append(Case(
            "count_ranked",
            f"top {n} {_pluralize(dim)} by {kind} of {t}",
            f"SELECT {p}_{dim}, COUNT(*) AS n FROM {t} "
            f"GROUP BY {p}_{dim} ORDER BY n DESC LIMIT {n}",
            schema, tabs,
            tie_check=(f"SELECT COUNT(*) FROM {t} GROUP BY {p}_{dim} "
                       f"ORDER BY 1 DESC", n),
        ))

    MONTHS = ["january", "february", "march", "april", "may", "june",
              "july", "august", "september", "october", "november",
              "december"]

    for i in range(14):  # year filters (the r12 bug-rich area)
        t, p, m1, _, dc, schema, tabs = _mk_dated_table(rng)
        y, y2 = rng.randint(1993, 1997), rng.randint(1993, 1997)
        if i % 3 == 0:
            q = f"{t} in {y}"
            sql = f"SELECT * FROM {t} WHERE YEAR({dc}) = {y}"
        elif i % 3 == 1:
            q = f"count of {t} in {y}"
            sql = f"SELECT COUNT(*) AS n FROM {t} WHERE YEAR({dc}) = {y}"
        else:
            q = f"count of {t} in {y} or {y2}"
            sql = (f"SELECT COUNT(*) AS n FROM {t} WHERE "
                   f"(YEAR({dc}) = {y} OR YEAR({dc}) = {y2})")
        cases.append(Case("t_year_filter", q, sql, schema, tabs))

    for i in range(12):  # month filters (the r12 silent-drop shape)
        t, p, m1, _, dc, schema, tabs = _mk_dated_table(rng)
        mi = rng.randint(1, 12)
        if i % 2:
            m2i = rng.randint(mi, 12)
            q = f"{t} between {MONTHS[mi - 1]} and {MONTHS[m2i - 1]}"
            sql = (f"SELECT * FROM {t} WHERE MONTH({dc}) "
                   f"BETWEEN {mi} AND {m2i}")
        else:
            q = f"{t} in {MONTHS[mi - 1]}"
            sql = f"SELECT * FROM {t} WHERE MONTH({dc}) = {mi}"
        cases.append(Case("t_month_filter", q, sql, schema, tabs))

    for i in range(12):  # temporal groupings
        t, p, m1, _, dc, schema, tabs = _mk_dated_table(rng)
        if i % 2:
            q = f"total {m1} of {t} per year"
            sql = (f"SELECT year({dc}) AS year, SUM({p}_{m1}) AS "
                   f"{p}_{m1}_sum FROM {t} GROUP BY year({dc})")
        else:
            q = f"average {m1} of {t} per month"
            sql = (f"SELECT month({dc}) AS month, AVG({p}_{m1}) AS "
                   f"{p}_{m1}_avg FROM {t} GROUP BY month({dc})")
        cases.append(Case("t_group", q, sql, schema, tabs))

    for _ in range(12):  # year filter + dim grouping composed
        t, p, m1, dim, dc, schema, tabs = _mk_dated_table(rng)
        y = rng.randint(1993, 1997)
        cases.append(Case(
            "t_year_grouped",
            f"average {m1} of {t} in {y} per {dim}",
            f"SELECT {p}_{dim}, AVG({p}_{m1}) AS {p}_{m1}_avg FROM {t} "
            f"WHERE YEAR({dc}) = {y} GROUP BY {p}_{dim}",
            schema, tabs,
        ))

    for _ in range(10):  # explicit DATE BETWEEN on a named column
        t, p, m1, _, dc, schema, tabs = _mk_dated_table(rng)
        y = rng.randint(1993, 1996)
        q = (f"{t} where shipdate between {y}-03-01 and {y}-09-30")
        sql = (f"SELECT * FROM {t} WHERE {dc} BETWEEN "
               f"DATE '{y}-03-01' AND DATE '{y}-09-30'")
        cases.append(Case("t_date_between", q, sql, schema, tabs))

    for _ in range(14):  # ranked child walk (foreign metric)
        (pn, pp, psing, cn, cp, cm, pcols, schema, tabs) = \
            _mk_parent_child(rng)
        n = rng.randint(2, 4)
        collist = ", ".join(f"t1.{c}" for c in pcols)
        grplist = ", ".join(f"t1.{c}" for c in pcols)
        cases.append(Case(
            "walk_ranked",
            f"top {n} {pn} by total {cm}",
            f"SELECT {collist}, COALESCE(SUM(t2.{cp}_{cm}), 0) "
            f"AS {cp}_{cm}_sum FROM {pn} t1 LEFT JOIN {cn} t2 "
            f"ON t1.{pp}_{psing}key = t2.{cp}_{psing}key "
            f"GROUP BY {grplist} ORDER BY {cp}_{cm}_sum DESC LIMIT {n}",
            schema, tabs,
            tie_check=(f"SELECT COALESCE(SUM(t2.{cp}_{cm}), 0) "
                       f"FROM {pn} t1 LEFT JOIN {cn} t2 "
                       f"ON t1.{pp}_{psing}key = t2.{cp}_{psing}key "
                       f"GROUP BY t1.{pp}_{psing}key "
                       f"ORDER BY 1 DESC", n),
        ))

    for _ in range(12):  # grouped-superlative walk twin
        (pn, pp, psing, cn, cp, cm, pcols, schema, tabs) = \
            _mk_parent_child(rng)
        collist = ", ".join(f"t1.{c}" for c in pcols)
        cases.append(Case(
            "walk_superlative",
            f"which {psing} has the highest total {cm}",
            f"SELECT {collist}, COALESCE(SUM(t2.{cp}_{cm}), 0) "
            f"AS {cp}_{cm}_sum FROM {pn} t1 LEFT JOIN {cn} t2 "
            f"ON t1.{pp}_{psing}key = t2.{cp}_{psing}key "
            f"GROUP BY {collist} ORDER BY {cp}_{cm}_sum DESC LIMIT 1",
            schema, tabs,
            tie_check=(f"SELECT COALESCE(SUM(t2.{cp}_{cm}), 0) "
                       f"FROM {pn} t1 LEFT JOIN {cn} t2 "
                       f"ON t1.{pp}_{psing}key = t2.{cp}_{psing}key "
                       f"GROUP BY t1.{pp}_{psing}key "
                       f"ORDER BY 1 DESC", 1),
        ))

    return cases


# minimum per-family answer rates: the battery must not rot into
# all-refusals and still pass. Walk families run lower (FK inference
# is deliberately conservative); everything else answers near-always.
MIN_ANSWER_RATE = {
    "cmp_filter": 0.9, "between_filter": 0.9, "eq_filter": 0.9,
    "like_filter": 0.9, "multi_cond": 0.9, "agg_scalar": 0.9,
    "agg_grouped": 0.9, "double_agg": 0.9, "count": 0.9,
    "distinct": 0.9, "topn_rows": 0.9, "ranked_group": 0.7,
    "count_ranked": 0.7, "projection": 0.9, "having": 0.7,
    "t_year_filter": 0.9, "t_month_filter": 0.9, "t_group": 0.9,
    "t_year_grouped": 0.7, "t_date_between": 0.9,
    "col_superlative": 0.9, "row_superlative": 0.9,
    "walk_ranked": 0.5, "walk_superlative": 0.5,
}


def _load(con, tables):
    for t, (cols, rows) in tables.items():
        con.execute(f"DROP TABLE IF EXISTS {t}")
        duck = {"number": "BIGINT", "timestamp": "TIMESTAMP"}
        ddl = ", ".join(
            f"{c} {duck.get(ty, 'VARCHAR')}" for c, ty in cols
        )
        con.execute(f"CREATE TABLE {t} ({ddl})")
        if rows:
            ph = ", ".join("?" for _ in cols)
            con.executemany(f"INSERT INTO {t} VALUES ({ph})", rows)


def _canon(con, sql):
    cur = con.execute(sql)
    names = [d[0].lower() for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(names)), key=lambda i: names[i])

    def cell(v):
        if isinstance(v, float):
            return round(v, 6)
        return v

    return (
        tuple(names[i] for i in order),
        sorted(tuple(cell(r[i]) for i in order) for r in rows),
    )


def test_oracle_fuzz_corpus():
    cases = gen_cases()
    assert len(cases) >= 200, len(cases)
    gen = t2s.RuleBasedGenerator()
    con = duckdb.connect()
    stats: dict[str, dict[str, int]] = {}
    failures: list[str] = []
    for c in cases:
        st = stats.setdefault(
            c.family, {"answered": 0, "refused": 0, "tie_skip": 0}
        )
        _load(con, c.tables)
        sql = gen(t2s.build_prompt(c.schema, c.question))
        if not sql:
            st["refused"] += 1
            continue
        # LIMIT boundary must be strict or the comparison is undefined
        if c.tie_check is not None:
            probe, n = c.tie_check
            vals = [r[0] for r in con.execute(probe).fetchall()]
            if len(vals) > n and vals[n - 1] == vals[n]:
                st["tie_skip"] += 1
                continue
        try:
            got = _canon(con, sql)
        except Exception as e:  # noqa: BLE001 — emitted SQL must RUN
            failures.append(
                f"[{c.family}] {c.question!r}\n  emitted SQL errored: "
                f"{e}\n  sql: {sql}"
            )
            continue
        want = _canon(con, c.intended)
        if got != want:
            failures.append(
                f"[{c.family}] {c.question!r}\n  intended: {c.intended}"
                f"\n  emitted:  {sql}\n  want cols {want[0]} "
                f"({len(want[1])} rows) != got cols {got[0]} "
                f"({len(got[1])} rows)"
            )
            continue
        st["answered"] += 1

    msg = "\n".join(failures[:10])
    assert not failures, f"{len(failures)} fuzz mismatches:\n{msg}"

    for fam, st in stats.items():
        total = st["answered"] + st["refused"]  # ties excluded
        if total == 0:
            pytest.fail(f"family {fam}: every case tie-skipped")
        rate = st["answered"] / total
        assert rate >= MIN_ANSWER_RATE[fam], (
            f"family {fam} answer rate {rate:.2f} below "
            f"{MIN_ANSWER_RATE[fam]} ({st})"
        )
