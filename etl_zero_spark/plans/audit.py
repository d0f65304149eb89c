"""Physical-plan digest for ANY DataFrame — plan hygiene as a
user-facing feature, not just a CI artifact.

tools/plan_audit.py has always recorded these metrics for the declared
query set (-> PLANS.md); this module makes the same extraction
importable so a pipeline author can gate THEIR OWN plans the way the
engine gates its: assert no cartesians, count exchanges, check the
scan actually received its pushed filters — before a 100 TB run finds
out the hard way. The digest reads the EXECUTED plan string (AQE's
final plan), so what you assert is what would run.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_digest(df: DataFrame) -> dict:
    """Metrics of ``df``'s physical plan: exchange/broadcast/join
    kinds, whole-stage-codegen spans (lower bound — AQE's final-plan
    string omits markers for post-shuffle stages), Arrow-Python
    stages, pushed-filter presence, and the two scale-killer flags
    (cartesian product, row-at-a-time Python)."""
    return digest_plan_string(df._jdf.queryExecution().executedPlan().toString())


def digest_plan_string(plan: str) -> dict:
    """The extraction itself, over a pre-rendered plan string (what
    tools/plan_audit.py feeds)."""
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "broadcasts": len(re.findall(r"BroadcastExchange", plan)),
        "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
        "smj": len(re.findall(r"SortMergeJoin", plan)),
        "shj": len(re.findall(r"ShuffledHashJoin", plan)),
        "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "arrow_python": len(
            re.findall(
                r"(ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas"
                r"|FlatMapCoGroupsInPandas)",
                plan,
            )
        ),
        "pushed_filters": "PushedFilters: [" in plan
        and re.search(r"PushedFilters: \[\]", plan) is None,
        "cartesian": "CartesianProduct" in plan,
        "batch_python": "BatchEvalPython" in plan,
    }


def assert_scale_clean(df: DataFrame, max_exchanges: int | None = None) -> dict:
    """Raise if the plan carries a scale-killer (cartesian product or
    row-at-a-time Python), optionally capping exchanges — the
    one-liner gate for user pipelines. Returns the digest on success
    so callers can log it."""
    d = plan_digest(df)
    problems = []
    if d["cartesian"]:
        problems.append("CartesianProduct")
    if d["batch_python"]:
        problems.append("BatchEvalPython (row-at-a-time Python UDF)")
    if max_exchanges is not None and d["exchanges"] > max_exchanges:
        problems.append(f"{d['exchanges']} exchanges > cap {max_exchanges}")
    if problems:
        raise AssertionError(f"plan not scale-clean: {', '.join(problems)}; {d}")
    return d
