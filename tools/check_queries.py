#!/usr/bin/env python
"""Oracle-check a subset of declared queries (the optimization loop's
fast verify: driver_sim semantics, named queries only).

Usage: python tools/check_queries.py [--sf DIR] query [query ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from etl_zero_spark.plans.all_queries import QUERIES
    from tests.oracle_harness import compare, duckdb_connection

    # vanilla session like driver_sim (the driver owns the session)
    spark = (
        SparkSession.builder.master("local[16]")
        .appName("check-queries")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from etl_zero_spark.session import apply_runtime_confs

    apply_runtime_confs(spark)
    con = duckdb_connection(args.sf)
    rc = 0
    for name in args.queries:
        spec = QUERIES[name]
        t0 = time.perf_counter()
        out = spec.fn(spark, args.sf)
        if spec.sql is None:
            n = out.count()
            print(f"{name}: rows-only ({n} rows) [{time.perf_counter()-t0:.1f}s]")
            continue
        problems = compare(out, con, spec.sql.strip())
        dt = time.perf_counter() - t0
        if problems:
            rc = 1
            print(f"{name}: MISMATCH {problems} [{dt:.1f}s]")
        else:
            print(f"{name}: MATCH [{dt:.1f}s]")
    return rc


if __name__ == "__main__":
    sys.exit(main())
