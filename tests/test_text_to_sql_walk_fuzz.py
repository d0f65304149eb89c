"""NL->SQL FK-walk fuzz with an executable oracle (VERDICT r13 #1).

The r13 battery (test_text_to_sql_oracle_fuzz.py) covers single-table
templates and ONE parent->child hop; the two/three-hop FK walks, the
fan-out de-duplicated aggregates (COUNT(DISTINCT pk), the DISTINCT
pre-aggregate SUM/AVG), and the ambiguous-path refusals were only
pinned by example tests on the fixed TPC-H catalog. This battery
generates randomized 3-4-table FK graphs — chains, a fanning bridge,
a same-parent key pun, and a two-path diamond — emits walked questions
with INDEPENDENTLY written intended SQL, DuckDB-executes both sides,
and asserts equal-or-refuse.

Same design rules as the r13 battery:
* deterministic seeded RNG, ~130 fixed cases, bisectable;
* vocab pools avoid the generator's synonym keys — the walk templates
  are the target, not synonym resolution;
* ranked/LIMIT families compare only when the oracle's ordering key is
  strictly distinct at the cut (tie-skips counted and bounded) — the
  partitioned-ranking family is the exception: both sides tie-break
  on the group columns, so it compares unconditionally;
* refusal is acceptable per answerable case (minimum answer rates stop
  silent rot); the pun and diamond families INVERT the contract — any
  answer is a failure, because no unambiguous walk exists.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from etl_zero_spark.plans import text_to_sql as t2s
from tests.test_text_to_sql_oracle_fuzz import (
    DIMS, DIM_VALUES, MEASURES, NAMES, TABLES, Case, _canon, _load,
)


# ---------------------------------------------------------------------------
# FK-graph builders
# ---------------------------------------------------------------------------

def _chain(rng: random.Random, hops: int):
    """A child-direction FK chain of ``hops`` edges: top <- mid[s] <-
    leaf. The metric lives ONLY on the leaf; the top carries a name
    and a dim. Returns (names, prefixes, metric, schema, tables) with
    names[0] the top and names[-1] the leaf. ~20% of each parent
    level is childless so the COALESCE-0 floor is exercised."""
    picked = rng.sample(TABLES, hops + 1)
    names = [t for t, _ in picked]
    pfx = [p for _, p in picked]
    metric = rng.choice(MEASURES)
    dim = rng.choice(DIMS)
    sings = [n[:-1] for n in names]
    cols: list[list[tuple[str, str]]] = []
    cols.append([
        (f"{pfx[0]}_{sings[0]}key", "number"),
        (f"{pfx[0]}_name", "text"),
        (f"{pfx[0]}_{dim}", "text"),
    ])
    for i in range(1, hops + 1):
        c = [
            (f"{pfx[i]}_{sings[i]}key", "number"),
            (f"{pfx[i]}_{sings[i - 1]}key", "number"),  # FK by name
        ]
        if i == hops:
            c.append((f"{pfx[i]}_{metric}", "number"))
        else:
            c.append((f"{pfx[i]}_label", "text"))
        cols.append(c)
    sizes = [rng.randint(5, 9)]
    for i in range(1, hops + 1):
        sizes.append(sizes[-1] * rng.randint(2, 4) + rng.randint(0, 3))
    tables = {}
    rows0 = [
        (i, rng.choice(NAMES) + str(i), rng.choice(DIM_VALUES[dim]))
        for i in range(sizes[0])
    ]
    tables[names[0]] = (cols[0], rows0)
    for i in range(1, hops + 1):
        parent_ids = list(range(sizes[i - 1]))
        childed = [j for j in parent_ids if rng.random() > 0.2] or [0]
        if i == hops:
            vals = rng.sample(range(0, 50000), sizes[i])
            rows = [
                (j, rng.choice(childed), vals[j])
                for j in range(sizes[i])
            ]
        else:
            rows = [
                (j, rng.choice(childed), rng.choice(NAMES))
                for j in range(sizes[i])
            ]
        tables[names[i]] = (cols[i], rows)
    schema = "\n".join(
        f"CREATE TABLE {t} ({', '.join(f'{c} {ty}' for c, ty in cs)})"
        for t, cs in zip(names, cols)
    )
    return names, pfx, sings, metric, schema, tables


def _chain_joins(names, pfx, sings, left: bool) -> str:
    """The t1..tN join chain the intended SQL uses (independent of the
    generator's renderer — built from the FK graph directly)."""
    kind = "LEFT JOIN" if left else "JOIN"
    sql = ""
    for i in range(1, len(names)):
        sql += (
            f" {kind} {names[i]} t{i + 1} ON "
            f"t{i}.{pfx[i - 1]}_{sings[i - 1]}key = "
            f"t{i + 1}.{pfx[i]}_{sings[i - 1]}key"
        )
    return sql


def _fanout(rng: random.Random):
    """base <- bridge -> target: base rows fan out across bridge rows
    (each base appears on 1-4 bridge rows, sometimes twice for the
    SAME target — the duplication the DISTINCT pre-aggregate must
    collapse). Returns (base, bpfx, bridge, brpfx, target, tpfx,
    metric, schema, tables)."""
    (bn, bp), (brn, brp), (tn, tp) = rng.sample(TABLES, 3)
    bsing, brsing, tsing = bn[:-1], brn[:-1], tn[:-1]
    metric = rng.choice(MEASURES)
    dim = rng.choice(DIMS)
    bcols = [
        (f"{bp}_{bsing}key", "number"),
        (f"{bp}_{metric}", "number"),
        (f"{bp}_{dim}", "text"),
    ]
    brcols = [
        (f"{brp}_{brsing}key", "number"),
        (f"{brp}_{bsing}key", "number"),   # FK -> base
        (f"{brp}_{tsing}key", "number"),   # FK -> target
    ]
    tcols = [
        (f"{tp}_{tsing}key", "number"),
        (f"{tp}_name", "text"),
    ]
    nb, nt = rng.randint(25, 45), rng.randint(5, 9)
    vals = rng.sample(range(0, 50000), nb)
    brows = [
        (i, vals[i], rng.choice(DIM_VALUES[dim])) for i in range(nb)
    ]
    # unique target names — a name collision would merge two targets'
    # groups on BOTH sides identically, but unique keeps cases crisp
    trows = [(i, NAMES[i % len(NAMES)] + str(i)) for i in range(nt)]
    brrows = []
    k = 0
    for i in range(nb):
        for _ in range(rng.randint(1, 4)):
            brrows.append((k, i, rng.randrange(nt)))
            k += 1
    schema = "\n".join(
        f"CREATE TABLE {t} ({', '.join(f'{c} {ty}' for c, ty in cs)})"
        for t, cs in ((bn, bcols), (brn, brcols), (tn, tcols))
    )
    tables = {
        bn: (bcols, brows), brn: (brcols, brrows), tn: (tcols, trows),
    }
    return bn, bp, bsing, brn, brp, tn, tp, tsing, metric, schema, tables


def _pun(rng: random.Random):
    """Parent + two sibling children sharing the parent's key stem —
    the 'suppliers per customer name' trap: the only name-similar key
    pair between the siblings is the shared PARENT key, and joining
    on it answers a question the FK graph cannot ask. Must refuse."""
    (pn, pp), (c1n, c1p), (c2n, c2p) = rng.sample(TABLES, 3)
    psing = pn[:-1]
    m = rng.choice(MEASURES)
    pcols = [(f"{pp}_{psing}key", "number"), (f"{pp}_name", "text")]
    c1cols = [
        (f"{c1p}_{c1n[:-1]}key", "number"),
        (f"{c1p}_{psing}key", "number"),
        (f"{c1p}_name", "text"),
    ]
    c2cols = [
        (f"{c2p}_{c2n[:-1]}key", "number"),
        (f"{c2p}_{psing}key", "number"),
        (f"{c2p}_{m}", "number"),
    ]
    np_ = rng.randint(4, 8)
    prows = [(i, NAMES[i % len(NAMES)] + str(i)) for i in range(np_)]
    c1rows = [
        (i, rng.randrange(np_), rng.choice(NAMES)) for i in range(15)
    ]
    c2rows = [
        (i, rng.randrange(np_), rng.randint(0, 5000)) for i in range(15)
    ]
    schema = "\n".join(
        f"CREATE TABLE {t} ({', '.join(f'{c} {ty}' for c, ty in cs)})"
        for t, cs in ((pn, pcols), (c1n, c1cols), (c2n, c2cols))
    )
    tables = {
        pn: (pcols, prows), c1n: (c1cols, c1rows), c2n: (c2cols, c2rows),
    }
    return pn, c1n, c2n, c2n[:-1], m, schema, tables


def _diamond(rng: random.Random):
    """TWO distinct FK paths from top to leaf (top <- mid1 <- leaf,
    top <- mid2 <- leaf): the walk is ambiguous and every aggregate
    over it must refuse — either path alone silently picks one
    reading."""
    (tn, tp), (m1n, m1p), (m2n, m2p), (ln, lp) = rng.sample(TABLES, 4)
    tsing, m1sing, m2sing = tn[:-1], m1n[:-1], m2n[:-1]
    m = rng.choice(MEASURES)
    tcols = [(f"{tp}_{tsing}key", "number"), (f"{tp}_name", "text")]
    m1cols = [
        (f"{m1p}_{m1sing}key", "number"),
        (f"{m1p}_{tsing}key", "number"),
    ]
    m2cols = [
        (f"{m2p}_{m2sing}key", "number"),
        (f"{m2p}_{tsing}key", "number"),
    ]
    lcols = [
        (f"{lp}_{ln[:-1]}key", "number"),
        (f"{lp}_{m1sing}key", "number"),
        (f"{lp}_{m2sing}key", "number"),
        (f"{lp}_{m}", "number"),
    ]
    trows = [(i, NAMES[i % len(NAMES)] + str(i)) for i in range(5)]
    m1rows = [(i, rng.randrange(5)) for i in range(10)]
    m2rows = [(i, rng.randrange(5)) for i in range(10)]
    lrows = [
        (i, rng.randrange(10), rng.randrange(10), rng.randint(0, 5000))
        for i in range(30)
    ]
    schema = "\n".join(
        f"CREATE TABLE {t} ({', '.join(f'{c} {ty}' for c, ty in cs)})"
        for t, cs in (
            (tn, tcols), (m1n, m1cols), (m2n, m2cols), (ln, lcols),
        )
    )
    tables = {
        tn: (tcols, trows), m1n: (m1cols, m1rows),
        m2n: (m2cols, m2rows), ln: (lcols, lrows),
    }
    return tn, tsing, ln, m, schema, tables


# ---------------------------------------------------------------------------
# case builders
# ---------------------------------------------------------------------------

def gen_walk_cases() -> list[Case]:
    rng = random.Random(0xF14)
    cases: list[Case] = []

    # --- 2-hop ranked SUM walk -------------------------------------------
    for _ in range(12):
        n = rng.randint(2, 4)
        names, pfx, sings, metric, schema, tabs = _chain(rng, 2)
        last = len(names)
        gsel = ", ".join(f"t1.{c}" for c, _ in tabs[names[0]][0])
        alias = f"{pfx[-1]}_{metric}_sum"
        cases.append(Case(
            "walk2_ranked",
            f"top {n} {names[0]} by total {metric}",
            f"SELECT {gsel}, COALESCE(SUM(t{last}.{pfx[-1]}_{metric}), 0)"
            f" AS {alias} FROM {names[0]} t1"
            f"{_chain_joins(names, pfx, sings, left=True)} "
            f"GROUP BY {gsel} ORDER BY {alias} DESC LIMIT {n}",
            schema, tabs,
            tie_check=(
                f"SELECT COALESCE(SUM(t{last}.{pfx[-1]}_{metric}), 0) "
                f"FROM {names[0]} t1"
                f"{_chain_joins(names, pfx, sings, left=True)} "
                f"GROUP BY t1.{pfx[0]}_{sings[0]}key ORDER BY 1 DESC",
                n,
            ),
        ))

    # --- 2-hop grouped superlative (highest/lowest total) ----------------
    for i in range(10):
        names, pfx, sings, metric, schema, tabs = _chain(rng, 2)
        last = len(names)
        hi = i % 2 == 0
        d = "DESC" if hi else "ASC"
        word = "highest" if hi else "lowest"
        gsel = ", ".join(f"t1.{c}" for c, _ in tabs[names[0]][0])
        alias = f"{pfx[-1]}_{metric}_sum"
        cases.append(Case(
            "walk2_superlative",
            f"which {sings[0]} has the {word} total {metric}",
            f"SELECT {gsel}, COALESCE(SUM(t{last}.{pfx[-1]}_{metric}), 0)"
            f" AS {alias} FROM {names[0]} t1"
            f"{_chain_joins(names, pfx, sings, left=True)} "
            f"GROUP BY {gsel} ORDER BY {alias} {d} LIMIT 1",
            schema, tabs,
            tie_check=(
                f"SELECT COALESCE(SUM(t{last}.{pfx[-1]}_{metric}), 0) "
                f"FROM {names[0]} t1"
                f"{_chain_joins(names, pfx, sings, left=True)} "
                f"GROUP BY t1.{pfx[0]}_{sings[0]}key ORDER BY 1 {d}",
                1,
            ),
        ))

    # --- 2-hop AVG superlative (HAVING COUNT > 0 drops empty groups) -----
    for _ in range(8):
        names, pfx, sings, metric, schema, tabs = _chain(rng, 2)
        last = len(names)
        gsel = ", ".join(f"t1.{c}" for c, _ in tabs[names[0]][0])
        alias = f"{pfx[-1]}_{metric}_avg"
        mcol = f"t{last}.{pfx[-1]}_{metric}"
        cases.append(Case(
            "walk2_avg_superlative",
            f"which {sings[0]} has the highest average {metric}",
            f"SELECT {gsel}, AVG({mcol}) AS {alias} FROM {names[0]} t1"
            f"{_chain_joins(names, pfx, sings, left=True)} "
            f"GROUP BY {gsel} HAVING COUNT({mcol}) > 0 "
            f"ORDER BY {alias} DESC LIMIT 1",
            schema, tabs,
            tie_check=(
                f"SELECT AVG({mcol}) FROM {names[0]} t1"
                f"{_chain_joins(names, pfx, sings, left=True)} "
                f"GROUP BY t1.{pfx[0]}_{sings[0]}key "
                f"HAVING COUNT({mcol}) > 0 ORDER BY 1 DESC",
                1,
            ),
        ))

    # --- 2-hop count per group-table row (how many X in each Y) ----------
    for _ in range(10):
        names, pfx, sings, metric, schema, tabs = _chain(rng, 2)
        last = len(names)
        gsel = ", ".join(f"t1.{c}" for c, _ in tabs[names[0]][0])
        landing = f"t{last}.{pfx[-1]}_{sings[-2]}key"
        cases.append(Case(
            "walk2_count_each",
            f"how many {names[-1]} are in each {sings[0]}",
            f"SELECT {gsel}, COUNT({landing}) AS n FROM {names[0]} t1"
            f"{_chain_joins(names, pfx, sings, left=True)} "
            f"GROUP BY {gsel}",
            schema, tabs,
        ))

    # --- 2-hop count superlative ------------------------------------------
    for _ in range(10):
        names, pfx, sings, metric, schema, tabs = _chain(rng, 2)
        last = len(names)
        gsel = ", ".join(f"t1.{c}" for c, _ in tabs[names[0]][0])
        landing = f"t{last}.{pfx[-1]}_{sings[-2]}key"
        cases.append(Case(
            "walk2_count_superlative",
            f"which {sings[0]} has the most {names[-1]}",
            f"SELECT {gsel}, COUNT({landing}) AS n FROM {names[0]} t1"
            f"{_chain_joins(names, pfx, sings, left=True)} "
            f"GROUP BY {gsel} ORDER BY n DESC LIMIT 1",
            schema, tabs,
            tie_check=(
                f"SELECT COUNT({landing}) FROM {names[0]} t1"
                f"{_chain_joins(names, pfx, sings, left=True)} "
                f"GROUP BY t1.{pfx[0]}_{sings[0]}key ORDER BY 1 DESC",
                1,
            ),
        ))

    # --- 3-hop ranked SUM walk --------------------------------------------
    for _ in range(10):
        n = rng.randint(2, 3)
        names, pfx, sings, metric, schema, tabs = _chain(rng, 3)
        last = len(names)
        gsel = ", ".join(f"t1.{c}" for c, _ in tabs[names[0]][0])
        alias = f"{pfx[-1]}_{metric}_sum"
        cases.append(Case(
            "walk3_ranked",
            f"top {n} {names[0]} by total {metric}",
            f"SELECT {gsel}, COALESCE(SUM(t{last}.{pfx[-1]}_{metric}), 0)"
            f" AS {alias} FROM {names[0]} t1"
            f"{_chain_joins(names, pfx, sings, left=True)} "
            f"GROUP BY {gsel} ORDER BY {alias} DESC LIMIT {n}",
            schema, tabs,
            tie_check=(
                f"SELECT COALESCE(SUM(t{last}.{pfx[-1]}_{metric}), 0) "
                f"FROM {names[0]} t1"
                f"{_chain_joins(names, pfx, sings, left=True)} "
                f"GROUP BY t1.{pfx[0]}_{sings[0]}key ORDER BY 1 DESC",
                n,
            ),
        ))

    # --- 3-hop count superlative ------------------------------------------
    for _ in range(8):
        names, pfx, sings, metric, schema, tabs = _chain(rng, 3)
        last = len(names)
        gsel = ", ".join(f"t1.{c}" for c, _ in tabs[names[0]][0])
        landing = f"t{last}.{pfx[-1]}_{sings[-2]}key"
        cases.append(Case(
            "walk3_count_superlative",
            f"which {sings[0]} has the most {names[-1]}",
            f"SELECT {gsel}, COUNT({landing}) AS n FROM {names[0]} t1"
            f"{_chain_joins(names, pfx, sings, left=True)} "
            f"GROUP BY {gsel} ORDER BY n DESC LIMIT 1",
            schema, tabs,
            tie_check=(
                f"SELECT COUNT({landing}) FROM {names[0]} t1"
                f"{_chain_joins(names, pfx, sings, left=True)} "
                f"GROUP BY t1.{pfx[0]}_{sings[0]}key ORDER BY 1 DESC",
                1,
            ),
        ))

    # --- fan-out: ranked COUNT(DISTINCT) ----------------------------------
    for _ in range(10):
        n = rng.randint(2, 4)
        bn, bp, bsing, brn, brp, tn, tp, tsing, m, schema, tabs = \
            _fanout(rng)
        gsel = ", ".join(f"t1.{c}" for c, _ in tabs[tn][0])
        joins = (
            f" LEFT JOIN {brn} t2 ON t1.{tp}_{tsing}key = "
            f"t2.{brp}_{tsing}key"
            f" LEFT JOIN {bn} t3 ON t2.{brp}_{bsing}key = "
            f"t3.{bp}_{bsing}key"
        )
        cases.append(Case(
            "fan_count_ranked",
            f"top {n} {tn} by number of {bn}",
            f"SELECT {gsel}, COUNT(DISTINCT t3.{bp}_{bsing}key) AS n "
            f"FROM {tn} t1{joins} GROUP BY {gsel} "
            f"ORDER BY n DESC LIMIT {n}",
            schema, tabs,
            tie_check=(
                f"SELECT COUNT(DISTINCT t3.{bp}_{bsing}key) "
                f"FROM {tn} t1{joins} GROUP BY t1.{tp}_{tsing}key "
                f"ORDER BY 1 DESC",
                n,
            ),
        ))

    # --- fan-out: DISTINCT pre-aggregate SUM / AVG per target name -------
    for i in range(16):
        bn, bp, bsing, brn, brp, tn, tp, tsing, m, schema, tabs = \
            _fanout(rng)
        agg, fn = (("total", "SUM") if i % 2 == 0 else ("average", "AVG"))
        alias = f"{bp}_{m}_{fn.lower()}"
        inner = (
            f"SELECT DISTINCT t1.{bp}_{bsing}key AS bk, "
            f"t3.{tp}_name AS {tp}_name, t1.{bp}_{m} AS mv "
            f"FROM {bn} t1 "
            f"JOIN {brn} t2 ON t1.{bp}_{bsing}key = t2.{brp}_{bsing}key "
            f"JOIN {tn} t3 ON t2.{brp}_{tsing}key = t3.{tp}_{tsing}key"
        )
        cases.append(Case(
            "fan_sum_group" if fn == "SUM" else "fan_avg_group",
            f"{agg} {m} per {tsing} name",
            f"SELECT v.{tp}_name, {fn}(v.mv) AS {alias} "
            f"FROM ({inner}) v GROUP BY v.{tp}_name",
            schema, tabs,
        ))

    # --- fan-out: COUNT(DISTINCT base) per target name --------------------
    for _ in range(8):
        bn, bp, bsing, brn, brp, tn, tp, tsing, m, schema, tabs = \
            _fanout(rng)
        cases.append(Case(
            "fan_count_group",
            f"number of {bn} per {tsing} name",
            f"SELECT t3.{tp}_name, COUNT(DISTINCT t1.{bp}_{bsing}key) "
            f"AS n FROM {bn} t1 "
            f"JOIN {brn} t2 ON t1.{bp}_{bsing}key = t2.{brp}_{bsing}key "
            f"JOIN {tn} t3 ON t2.{brp}_{tsing}key = t3.{tp}_{tsing}key "
            f"GROUP BY t3.{tp}_name",
            schema, tabs,
        ))

    # --- R14 partitioned ranking (both sides tie-broken -> always
    # comparable, no tie-skip needed) --------------------------------------
    for _ in range(10):
        n = rng.randint(2, 3)
        names, pfx, sings, metric, schema, tabs = _chain(rng, 2)
        top, mid, leaf = names
        tp_, mp, lp = pfx
        tsing, msing = sings[0], sings[1]
        midcols = [c for c, _ in tabs[mid][0]]
        gsel = ", ".join(f"m.{c}" for c in midcols)
        bare = ", ".join(midcols)
        alias = f"{lp}_{metric}_sum"
        expr = f"COALESCE(SUM(l.{lp}_{metric}), 0)"
        cases.append(Case(
            "walk_partitioned",
            f"top {n} {mid} by total {metric} per {tsing} name",
            f"SELECT {tp_}_name, {bare}, {alias} FROM ("
            f"SELECT p.{tp_}_name, {gsel}, {expr} AS {alias}, "
            f"ROW_NUMBER() OVER (PARTITION BY p.{tp_}_name "
            f"ORDER BY {expr} DESC, {gsel}) AS rk "
            f"FROM {mid} m "
            f"JOIN {top} p ON m.{mp}_{tsing}key = p.{tp_}_{tsing}key "
            f"LEFT JOIN {leaf} l ON m.{mp}_{msing}key = "
            f"l.{lp}_{msing}key "
            f"GROUP BY p.{tp_}_name, {gsel}) x WHERE rk <= {n}",
            schema, tabs,
        ))

    # --- R14 second pass: which-table-subject superlative with a per
    # grouping rewrites into the partitioned LIMIT-1 ranking ---------------
    for i in range(8):
        names, pfx, sings, metric, schema, tabs = _chain(rng, 2)
        top, mid, leaf = names
        tp_, mp, lp = pfx
        tsing, msing = sings[0], sings[1]
        midcols = [c for c, _ in tabs[mid][0]]
        gsel = ", ".join(f"m.{c}" for c in midcols)
        bare = ", ".join(midcols)
        hi = i % 2 == 0
        d = "DESC" if hi else "ASC"
        word = "highest" if hi else "lowest"
        alias = f"{lp}_{metric}_sum"
        expr = f"COALESCE(SUM(l.{lp}_{metric}), 0)"
        cases.append(Case(
            "walk_part_superlative",
            f"which {msing} has the {word} total {metric} "
            f"per {tsing} name",
            f"SELECT {tp_}_name, {bare}, {alias} FROM ("
            f"SELECT p.{tp_}_name, {gsel}, {expr} AS {alias}, "
            f"ROW_NUMBER() OVER (PARTITION BY p.{tp_}_name "
            f"ORDER BY {expr} {d}, {gsel}) AS rk "
            f"FROM {mid} m "
            f"JOIN {top} p ON m.{mp}_{tsing}key = p.{tp_}_{tsing}key "
            f"LEFT JOIN {leaf} l ON m.{mp}_{msing}key = "
            f"l.{lp}_{msing}key "
            f"GROUP BY p.{tp_}_name, {gsel}) x WHERE rk <= 1",
            schema, tabs,
        ))

    # --- R14 second pass: LOCAL partitioned raw-row ranking ---------------
    from tests.test_text_to_sql_oracle_fuzz import _mk_single_table

    for _ in range(8):
        n = rng.randint(2, 4)
        t, p, m1, _, dim, schema, tabs = _mk_single_table(rng)
        colnames = [c for c, _ in tabs[t][0]]
        inner = ", ".join(f"t1.{c}" for c in colnames)
        cases.append(Case(
            "row_rank_part_local",
            f"top {n} {t} by {m1} per {dim}",
            f"SELECT {', '.join(colnames)} FROM (SELECT {inner}, "
            f"ROW_NUMBER() OVER (PARTITION BY t1.{p}_{dim} "
            f"ORDER BY t1.{p}_{m1} DESC, {inner}) AS rk "
            f"FROM {t} t1) x WHERE rk <= {n}",
            schema, tabs,
        ))

    # --- must-refuse: same-parent key pun ----------------------------------
    for i in range(8):
        pn, c1n, c2n, c2sing, m, schema, tabs = _pun(rng)
        q = (
            f"number of {c1n} per {c2sing} name"
            if i % 2 == 0
            else f"total {m} per {c1n[:-1]} name"
        )
        cases.append(Case("pun_refuse", q, None, schema, tabs))

    # --- must-refuse: two-path diamond -------------------------------------
    for i in range(8):
        tn, tsing, ln, m, schema, tabs = _diamond(rng)
        q = (
            f"which {tsing} has the most {ln}"
            if i % 2 == 0
            else f"top 2 {tn} by total {m}"
        )
        cases.append(Case("diamond_refuse", q, None, schema, tabs))

    return cases


MIN_ANSWER_RATE = {
    "walk2_ranked": 0.7, "walk2_superlative": 0.7,
    "walk2_avg_superlative": 0.7, "walk2_count_each": 0.7,
    "walk2_count_superlative": 0.7, "walk3_ranked": 0.6,
    "walk3_count_superlative": 0.6, "fan_count_ranked": 0.6,
    "fan_sum_group": 0.6, "fan_avg_group": 0.6, "fan_count_group": 0.6,
    "walk_partitioned": 0.6, "walk_part_superlative": 0.6,
    "row_rank_part_local": 0.6,
}
MUST_REFUSE = {"pun_refuse", "diamond_refuse"}


def test_walk_fuzz_corpus():
    cases = gen_walk_cases()
    assert len(cases) >= 100, len(cases)
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
        if c.family in MUST_REFUSE:
            if sql:
                failures.append(
                    f"[{c.family}] {c.question!r}\n  ANSWERED an "
                    f"ambiguous walk (any SQL is a guess): {sql}"
                )
            else:
                st["refused"] += 1
            continue
        if not sql:
            st["refused"] += 1
            continue
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
    assert not failures, f"{len(failures)} walk-fuzz mismatches:\n{msg}"

    for fam, st in stats.items():
        if fam in MUST_REFUSE:
            continue
        total = st["answered"] + st["refused"]
        if total == 0:
            pytest.fail(f"family {fam}: every case tie-skipped")
        rate = st["answered"] / total
        assert rate >= MIN_ANSWER_RATE[fam], (
            f"family {fam} answer rate {rate:.2f} below "
            f"{MIN_ANSWER_RATE[fam]} ({st})"
        )
