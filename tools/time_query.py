#!/usr/bin/env python
"""Isolated per-query timing for the optimization loop (guide §1).

Times one or more declared queries (or bench extras) at a given SF dir
in a fresh session: cold run + N warm reps, with BOTH timed actions —
``count()`` (the bench's historical action, kept for round-over-round
comparability) and the noop sink (guide §1.4: computes every column of
every row, so nothing is pruned). Prints one line per (query, action).

Usage: python tools/time_query.py [--sf DIR] [--reps N] [--cpus N] query...
       query 'all' times every declared query.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--noop", action="store_true",
                    help="also time the noop-sink action")
    args = ap.parse_args()

    from etl_zero_spark.plans.all_queries import QUERIES
    from etl_zero_spark.session import get_spark

    spark = get_spark(app_name="time-query", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    # same warm-up as bench.py: python worker pool + a parquet read
    from etl_zero_spark.catalog import load_table

    load_table(spark, args.sf, "lineitem").limit(10).count()

    def _noop_warm(it):
        yield from it

    spark.range(int(args.cpus) * 4).repartition(int(args.cpus)).mapInPandas(
        _noop_warm, "id long"
    ).count()

    import bench as benchmod

    extras = benchmod._extras(spark, args.sf)
    names = (
        list(QUERIES) if args.queries == ["all"] else args.queries
    )
    for name in names:
        if name in extras:
            # bench extras are callables that run their own action —
            # time them as-is (count-only)
            fn = extras[name]
            actions = [("extra", lambda df: None)]
        else:
            spec = QUERIES[name]
            fn = None
            actions = [("count", lambda df: df.count())]
            if args.noop:
                actions.append((
                    "noop",
                    lambda df: df.write.format("noop").mode("overwrite").save(),
                ))
        for aname, act in actions:
            spark.sparkContext.setJobDescription(f"{name}:{aname}")
            run = (
                fn if fn is not None
                else (lambda act=act: act(QUERIES[name].fn(spark, args.sf)))
            )
            try:
                t0 = time.perf_counter()
                run()
                cold = time.perf_counter() - t0
                reps = []
                for _ in range(args.reps):
                    t1 = time.perf_counter()
                    run()
                    reps.append(time.perf_counter() - t1)
                print(
                    f"{name:32s} {aname:5s} cold {cold:6.2f}s  "
                    f"warm {min(reps):6.2f}s  reps "
                    + " ".join(f"{r:.2f}" for r in reps),
                    flush=True,
                )
            except Exception as exc:  # noqa: BLE001 — keep timing the rest
                print(f"{name:32s} {aname:5s} ERROR {str(exc)[:160]}",
                      flush=True)
            finally:
                spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
