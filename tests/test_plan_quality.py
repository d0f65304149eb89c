"""Physical-plan quality gates over EVERY declared query (the 100 TB
lens, automated): no cartesian products, no row-at-a-time Python UDFs.

These are the two silent scale-killers a refactor can reintroduce
without failing any correctness test: a CartesianProduct appears when a
join loses its equi-condition (or a cross join loses its broadcast
hint), and BatchEvalPython appears when an expression falls off the
Arrow-vectorized path onto per-row Python. Both grow superlinearly with
data size while staying invisible at fixture scale.

The 1-row broadcast stat joins (histogram, s2_s3 watermark) plan as
BroadcastNestedLoopJoin — constant-size build side, allowed by design.
"""

import pytest
from pyspark.sql import functions as F

from etl_zero_spark.plans.all_queries import QUERIES
from tests.conftest import SF_SMOKE

#: Streaming queries execute their plan inside run_available_now and
#: return a memory-sink table whose "plan" is just the sink scan —
#: nothing to audit there (their batch twins e1/e2/e3 are audited).
_SKIP = {
    "st1_stream_tumbling",
    "st2_stream_session_windows",
    "st3_stream_dedup",
    "st4_stream_sliding",
}


@pytest.mark.parametrize("name", sorted(n for n in QUERIES if n not in _SKIP))
def test_no_scale_killers_in_plan(spark, name):
    df = QUERIES[name].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product\n{plan}"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF\n{plan}"


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """A filter on the partition column must prune at planning time:
    the scan's PartitionFilters carry the predicate, the pushed-filter
    list stays free of it (it never reaches row groups), and only the
    matching partition's files are read."""
    from etl_zero_spark.catalog import Zone, load_table
    from tests.conftest import SF_SMOKE

    zone = Zone(str(tmp_path), "silver")
    ev = load_table(spark, SF_SMOKE, "events")
    zone.write_partitioned(ev, "events_by_type", "event_type")

    q = zone.read(spark, "events_by_type").where(F.col("event_type") == "click")
    plan = q._jdf.queryExecution().executedPlan().toString()
    # the predicate must live in PartitionFilters (directory pruning at
    # planning time), NOT in DataFilters (row-level evaluation)
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "event_type" in pf and "= click" in pf, plan
    assert "DataFilters: []" in plan, plan
    n_click = ev.where(F.col("event_type") == "click").count()
    assert q.count() == n_click


def test_r6_operators_plan_shape(spark, sf_dir):
    """R6 ops honor the plan contracts their docstrings claim:
    chunk_documents is pure codegen (zero exchanges, zero Python
    stages); LM scoring is one Arrow stage with no shuffle on the doc
    path; DSIR scoring and semantic dedup carry no cartesian product
    and no row-at-a-time Python anywhere."""
    import numpy as np

    from etl_zero_spark.catalog import load_table
    from etl_zero_spark.operators import corpus as corp
    from etl_zero_spark.operators import lm, similarity
    from etl_zero_spark.operators.text import chunk_documents
    from etl_zero_spark.plans.audit import plan_digest

    docs = load_table(spark, sf_dir, "documents")
    d = plan_digest(chunk_documents(docs, 64, 32))
    assert d["exchanges"] == 0 and d["arrow_python"] == 0

    model = lm.NGramLM({"the": 5, lm.UNK: 1, lm.BOS: 2}, {(lm.BOS, "the"): 2}, 6)
    d = plan_digest(lm.score_perplexity(docs, model))
    assert d["exchanges"] == 0 and d["arrow_python"] == 1

    target = docs.where("doc_id < 50")
    lr = corp.dsir_bucket_logratio(docs, target, n_buckets=64)
    scored = corp.dsir_scores(docs, lr, n_buckets=64)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan

    emb = load_table(spark, sf_dir, "embeddings")
    cents = np.random.RandomState(0).randn(4, len(emb.first().embedding))
    plan = (
        similarity.semantic_dedup_pairs(emb, cents, threshold=0.9)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan
