"""Full-schema NL->SQL probe: renders the REAL catalog schema (all 10
fixture tables, the exact `render_schema` output the Q2 path feeds the
generator), runs a question battery through `RuleBasedGenerator`, and
executes every emitted SQL in DuckDB over the same sf0.01 parquet — so
the committed transcript can never again claim answers the real schema
refuses (VERDICT r11 #1b: the r11 transcript was generated from a
TPC-H-only prompt).

Usage:  python tools/nl_probe.py [sf_dir]   (default /root/testdata/sf0.01)

The rendered schema is built from parquet footers (pyarrow) with the
same number/text collapse as `render_schema`; a pytest fixture
(tests/test_text_to_sql.py::test_catalog_schema_fixture_matches_render)
pins that the two renderings agree, so this probe needs no JVM.
"""
from __future__ import annotations

import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_zero_spark.plans.text_to_sql import RuleBasedGenerator, build_prompt

FIXTURE_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

QUESTIONS = [
    # the four r11 judge-probe refusals (grouped superlatives)
    "which nation has the highest total revenue",
    "which nation has the lowest total revenue",
    "which nation has the highest average revenue",
    "which nation has the highest total revenue in 1995",
    # the three r10 families the judge verified in r11
    "top 3 nations by revenue",
    "top 5 nation names by total revenue",
    "how many customers are in each region",
    # the three r11 over-refusals closed this round
    "show me the 2 cheapest parts",
    "what is the total revenue per year",
    "revenue by nation in 1995 or 1996",
    # non-TPC-H tables as TARGETS (R12 — the full-schema battery must
    # also ask about events/documents, not just dodge their names)
    "top 3 event types by total value",
    "how many documents per lang",
    "which source has the most documents",
    "average value per event type",
    "what nation earned the most revenue",
    "which 5 customers spent the most",
    "count of events in 2024",
    "events in january",
    "total value per month in events",
    # battery carried over from the r11 transcript
    "top 5 nation names by average revenue",
    "bottom 2 nations by revenue",
    "top 5 customers by revenue",
    "which nation has the highest total quantity",
    "how many orders does each customer have",
    "top 3 nations by number of orders",
    "top 3 parts by number of orders",
    "count of orders per orderstatus in 1995 or 1996",
    "orders where orderstatus is F or P",
    "top 3 nations by revenue where mktsegment is BUILDING",
    "average totalprice per orderstatus where orderpriority is 1-URGENT or 2-HIGH",
    "largest order by totalprice in 1995",
    # R13: grouped superlative over a COLUMN subject (fuzz-found
    # mistranslation — previously shipped a row ranking that dropped
    # the stated aggregate and the grouping)
    "which mktsegment has the highest total acctbal",
    "which orderstatus has the highest average totalprice",
    "which returnflag has the highest total quantity",
    "which lang has the most documents",
    # R13: count-ranked local groups + -es/-ies naive plurals
    "top 3 mktsegments by number of customers",
    "top 2 orderstatuses by number of orders",
    "top 3 langs by number of documents",
    "top 2 orderpriorities by average totalprice",
    # R13: bare cost adjective without a stated N (r12 refusal backlog)
    "the cheapest part",
    "the most expensive parts",
    # R14 (VERDICT r13 #3): walked superlative WITH a second stated
    # grouping — per-partition ranking through the parent walk
    "top 3 nations by revenue per region name",
    "top 2 nations by number of customers per region name",
    "bottom 2 nations by revenue per region",
    # R14 second pass: the which-subject and raw-row partitioned twins
    # (both previously shipped SQL that silently dropped a stated part)
    "which nation has the highest total revenue per region name",
    "top 5 orders by totalprice per orderstatus",
    # refusal contract (stated constraints that cannot render);
    # every refusal carries a reason since R14 (VERDICT r13 #6)
    "which nation has the highest quantity",
    "top 3 nations by revenue per widget",
    "the cheapest parts with brand B1",
    "how many orders does each customer or supplier have",
    "orders where clerk is Clerk#000000951",
    "orders where totalprice in 1995",
    "the cheapest parts per brand",
    "customers in march",
    "which analyst spent the most",
]


def _simple_type(t: pa.DataType) -> str:
    numeric = (
        pa.types.is_integer(t) or pa.types.is_floating(t)
        or pa.types.is_decimal(t)
    )
    return "number" if numeric else "text"


def render_from_parquet(sf_dir: str) -> str:
    lines = []
    for name in FIXTURE_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        sch = pq.read_schema(path)
        cols = ", ".join(f"{f.name} {_simple_type(f.type)}" for f in sch)
        lines.append(f"CREATE TABLE {name} ({cols})")
    return "\n".join(lines)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    schema = render_from_parquet(sf_dir)
    con = duckdb.connect()
    for name in FIXTURE_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    gen = RuleBasedGenerator()
    errors = 0
    for q in QUESTIONS:
        sql = gen(build_prompt(schema, q))
        if not sql:
            why = gen.last_refusal_reason
            print(f"REFUSE {q}" + (f"  [{why}]" if why else ""))
            continue
        try:
            rows = con.execute(sql).fetchall()
            print(f"OK     {q}  [{len(rows)} rows]")
        except Exception as e:  # a SQL error is a transcript failure
            errors += 1
            print(f"ERROR  {q}  -> {sql}\n       {e}")
    print(f"\n{len(QUESTIONS)} questions, {errors} SQL errors")
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
