#!/usr/bin/env python
"""Driver simulation — drives the driver contract exactly as the
per-round verify does: vanilla SparkSession (default confs, ANSI on),
import __spark_entry__, smoke entry(), then run every queries() entry
at sf0.01 against its oracle_sql() through DuckDB.

Usage: python tools/driver_sim.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from tests.oracle_harness import compare, duckdb_connection  # noqa: E402


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = SparkSession.builder.master("local[16]").appName("driver-sim").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    df = entrymod.entry(spark)
    rows = df.collect()
    print(f"entry(): {len(rows)} rows, schema {[f.name for f in df.schema.fields]}")
    assert len(rows) > 0

    con = duckdb_connection(sf)
    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    print(f"{len(queries)} queries, {len(oracles)} with oracle")
    failures = []
    for name, fn in queries.items():
        t0 = time.perf_counter()
        try:
            out = fn(spark, sf)
            if name in oracles:
                problems = compare(out, con, oracles[name])
                status = "MATCH" if not problems else f"MISMATCH {problems}"
                if problems:
                    failures.append(name)
            else:
                n = out.count()
                status = f"rows-only ({n} rows)"
                if n < 0:
                    failures.append(name)
        except Exception as ex:  # noqa: BLE001
            status = f"ERROR {str(ex)[:200]}"
            failures.append(name)
        print(f"  {name}: {status} [{time.perf_counter()-t0:.1f}s]", flush=True)
    print(f"FAILURES: {failures if failures else 'none'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
