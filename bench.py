#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion with .count() (full pipeline, no
driver-side result serialization). One small warm-up query runs first
so JVM/codegen warm-up isn't attributed to the first headline query.
"""

from __future__ import annotations

import json
import os
import sys
import time

HEADLINE = [
    # reference-parity core
    "q1_pricing_summary",
    "j5_revenue_by_nation",
    "a1_multi_func_groupby",
    "a3_histogram",
    "o3_top_k",
    "cd_count_distinct",
    "w2_running_sum",
    "e1_tumbling_window",
    "e3_sessionize_batch",
    # north-star: dedup / similarity / text
    "dd2_ngram_jaccard_pairs",
    "dd3_minhash_lsh_pairs",
    "dd4_simhash_pairs",
    "dd5_embedding_neardup",
    "sim1_cosine_topk",
    "sim2_lsh_topk",
    "tx1_text_stats",
    "tx4_fingerprints",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else None

    from etl_zero_spark.plans.all_queries import QUERIES
    from etl_zero_spark.session import get_spark

    spark = get_spark(app_name="etl-zero-spark-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up (not timed): fact-table scan + the Python worker pool —
    # local[N] lazily forks N pyspark workers on the first Arrow stage,
    # which is environment startup cost, not operator cost.
    from etl_zero_spark.catalog import load_table

    load_table(spark, sf_dir, "lineitem").limit(10).count()

    def _noop(it):
        yield from it

    spark.range(int(cpus) * 4).repartition(int(cpus)).mapInPandas(
        _noop, "id long"
    ).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = QUERIES[name]
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline-query wall time (17 queries: parity core + dedup/similarity/text)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
