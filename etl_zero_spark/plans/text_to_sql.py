"""NL -> SQL adapter (operator Q2) — model-optional, orthogonal to the
engine (SURVEY §2.8).

Reproduces the reference's contract (ETL_Pipeline_Entire/text_to_sql.py)
against Spark instead of MySQL:

* schema rendering: every table as ``CREATE TABLE t (col type)`` with
  the type system collapsed to ``number``/``text``
  (text_to_sql.py:57-89, :75-79) — here rendered from ``df.schema``;
* prompt assembly: ``Tables:\\n{schema}\\n\\nQuestion:\\n{q}\\n\\nAnswer:\\n``
  (text_to_sql.py:110-115);
* generation: pluggable callable (the reference lazy-loads a local T5,
  text_to_sql.py:150-166; any ``prompt -> text`` callable slots in —
  no model ships with this engine);
* extraction: keep output iff it starts with SELECT, else regex-extract
  ``(SELECT.*?)(;|end)`` (text_to_sql.py:137-144);
* execution: ``spark.sql`` over the registered views (the reference
  ships the string to MySQL, front_end.py:215-225).
"""

from __future__ import annotations

import re
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import NumericType

from etl_zero_spark.catalog import register_views

#: number/text collapse (text_to_sql.py:75-79).
def _simple_type(dt) -> str:
    return "number" if isinstance(dt, NumericType) else "text"


def render_schema(spark: SparkSession, tables: dict[str, DataFrame]) -> str:
    """Simplified-DDL schema string (text_to_sql.py:57-89)."""
    lines = []
    for name, df in tables.items():
        cols = ", ".join(f"{f.name} {_simple_type(f.dataType)}" for f in df.schema.fields)
        lines.append(f"CREATE TABLE {name} ({cols})")
    return "\n".join(lines)


def build_prompt(schema: str, question: str) -> str:
    """Prompt template (text_to_sql.py:110-115)."""
    return f"Tables:\n{schema}\n\nQuestion:\n{question}\n\nAnswer:\n"


def extract_select(generated: str) -> str | None:
    """SELECT extraction (text_to_sql.py:137-144)."""
    text = generated.strip()
    if text.upper().startswith("SELECT"):
        return text.rstrip(";")
    m = re.search(r"(SELECT.*?)(;|\Z)", text, re.IGNORECASE | re.DOTALL)
    return m.group(1).strip() if m else None


def process_query(
    spark: SparkSession,
    sf_dir: str,
    question: str,
    generator: Callable[[str], str],
    tables: list[str] | None = None,
) -> DataFrame | None:
    """End-to-end Q2 path: render schema -> prompt -> generate ->
    extract SELECT -> spark.sql. Returns None when no SELECT could be
    extracted (the reference surfaces the same failure to the UI)."""
    views = register_views(spark, sf_dir, tables)
    prompt = build_prompt(render_schema(spark, views), question)
    sql = extract_select(generator(prompt))
    if sql is None:
        return None
    return spark.sql(sql)
