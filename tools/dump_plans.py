#!/usr/bin/env python
"""Dump `.explain("formatted")` output per declared query into
plans/<tag>/<query>_<suffix>.txt — the optimization round's before/after
plan evidence (the judge checks plan-diff claims against these files).

Each query runs once (count()) so the file also carries the EXECUTED
AQE plan (final join strategies, coalesced exchanges) below the
formatted pre-execution plan.

Usage: python tools/dump_plans.py <tag> <suffix> [sf_dir] [query ...]
  e.g. python tools/dump_plans.py r14 before /root/testdata/sf0.01
       python tools/dump_plans.py r14 after /root/testdata/sf0.01 ct1_decontamination
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r14"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    sf = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    only = set(sys.argv[4:])

    from etl_zero_spark.plans.all_queries import QUERIES
    from etl_zero_spark.session import get_spark

    spark = get_spark(app_name=f"dump-plans-{tag}", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(outdir, exist_ok=True)
    skip = {
        # streaming queries run inside run_available_now; the returned
        # memory-sink table has no batch plan (their batch twins are
        # dumped under their own names)
        "st1_stream_tumbling",
        "st2_stream_session_windows",
        "st3_stream_dedup",
        "st4_stream_sliding",
    }
    for name, spec in QUERIES.items():
        if name in skip or (only and name not in only):
            continue
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        try:
            t0 = time.perf_counter()
            df = spec.fn(spark, sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            formatted = buf.getvalue()
            # collect() executes THIS DataFrame's own QueryExecution, so
            # the executedPlan below is the final AQE plan (reused query
            # stages visible); count() would plan a different query and
            # leave this one isFinalPlan=false.
            df.collect()
            executed = df._jdf.queryExecution().executedPlan().toString()
            dt = time.perf_counter() - t0
            with open(path, "w") as fh:
                fh.write(
                    f"== {name} @ {sf} ({suffix}) — "
                    f"explain('formatted') then executed AQE plan ==\n\n"
                )
                fh.write(formatted)
                fh.write("\n== executed plan (AQE final) ==\n\n")
                fh.write(executed)
            print(f"{name}: wrote {path} [{dt:.1f}s]", flush=True)
        except Exception as exc:  # noqa: BLE001 — dump the rest
            with open(path, "w") as fh:
                fh.write(f"ERROR: {exc}\n")
            print(f"{name}: ERROR {str(exc)[:120]}", flush=True)


if __name__ == "__main__":
    main()
