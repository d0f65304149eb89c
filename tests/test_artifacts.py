"""Artifact persistence (functions/artifacts.py) + plan digest
(plans/audit.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_zero_spark.catalog import load_table
from etl_zero_spark.functions.artifacts import (
    cached_artifact,
    load_artifact,
    save_artifact,
)
from etl_zero_spark.plans.audit import assert_scale_clean, plan_digest


def test_numpy_roundtrip_with_digest(tmp_path):
    cents = np.arange(24, dtype=np.float64).reshape(4, 6)
    root = str(tmp_path / "ivf")
    save_artifact(root, cents, "ivf_centroids", {"nlist": 4})
    got, m = load_artifact(root, expect_kind="ivf_centroids")
    assert np.array_equal(got, cents)
    assert m["shape"] == [4, 6] and m["params"]["nlist"] == 4


def test_json_roundtrip_and_kind_guard(tmp_path):
    merges = [["a", "b"], ["ab", "c"]]
    root = str(tmp_path / "bpe")
    save_artifact(root, merges, "bpe_merges")
    got, _ = load_artifact(root)
    assert got == merges
    with pytest.raises(ValueError, match="kind"):
        load_artifact(root, expect_kind="pq_codebooks")


def test_corruption_detected(tmp_path):
    root = str(tmp_path / "a")
    save_artifact(root, np.ones(3), "x")
    with open(f"{root}/payload.npy", "ab") as fh:
        fh.write(b"junk")
    with pytest.raises(ValueError, match="digest mismatch"):
        load_artifact(root)


def test_overwrite_replaces(tmp_path):
    root = str(tmp_path / "a")
    save_artifact(root, np.ones(3), "x")
    save_artifact(root, np.zeros(5), "x")
    got, m = load_artifact(root)
    assert got.shape == (5,) and not got.any()


def test_end_to_end_pq_reuse(spark, sf_dir, tmp_path):
    """Codebooks trained once, persisted, reloaded in a 'second job':
    identical codes — the shared-index contract."""
    from etl_zero_spark.operators.pq import pq_encode, train_pq

    emb = load_table(spark, sf_dir, "embeddings").limit(100)
    books = train_pq(emb, m=8, nbits=4)
    root = str(tmp_path / "pq")
    save_artifact(root, books, "pq_codebooks", {"m": 8, "nbits": 4})
    books2, _ = load_artifact(root, expect_kind="pq_codebooks")
    a = pq_encode(emb, books).select("vec_id", "pq_code").collect()
    b = pq_encode(emb, books2).select("vec_id", "pq_code").collect()
    assert {(r.vec_id, tuple(r.pq_code)) for r in a} == {
        (r.vec_id, tuple(r.pq_code)) for r in b
    }


# --- plan digest -------------------------------------------------------------


def test_plan_digest_counts(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    d = plan_digest(li.join(F.broadcast(nation), li.l_suppkey == nation.n_nationkey))
    assert d["bhj"] == 1 and d["broadcasts"] == 1
    assert not d["cartesian"] and not d["batch_python"]


def test_assert_scale_clean_passes_and_fails(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    d = assert_scale_clean(li.groupBy("l_returnflag").count(), max_exchanges=1)
    assert d["exchanges"] <= 1
    # force the physical CartesianProduct (tiny cross joins otherwise
    # plan as a broadcast nested loop): the pattern the gate catches
    bad = (
        li.limit(5)
        .hint("shuffle_replicate_nl")
        .crossJoin(load_table(spark, sf_dir, "nation").limit(5))
    )
    with pytest.raises(AssertionError, match="scale-clean"):
        assert_scale_clean(bad)


def test_pushed_filter_detection(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    d = plan_digest(li.where(F.col("l_orderkey") == 42))
    assert d["pushed_filters"]


def test_cached_artifact_builds_once_then_loads(tmp_path):
    """cached_artifact is the train-once path the declared ANN queries
    use (r4 verdict #3): first call builds and persists, later calls
    with identical params load without invoking the builder; changed
    params (geometry/corpus) rebuild; a corrupted payload rebuilds
    rather than serving wrong data."""
    calls = []

    def build():
        calls.append(1)
        return np.arange(6, dtype=np.float64).reshape(2, 3)

    params = {"corpus": "probe", "nlist": 4, "seed": 42}
    a = cached_artifact("ivf_centroids", params, build, root=str(tmp_path))
    b = cached_artifact("ivf_centroids", params, build, root=str(tmp_path))
    assert len(calls) == 1 and np.array_equal(a, b)
    cached_artifact(
        "ivf_centroids", {**params, "nlist": 8}, build, root=str(tmp_path)
    )
    assert len(calls) == 2
    # corrupt every persisted payload -> digest check fails -> rebuild
    import pathlib

    for npy in pathlib.Path(tmp_path).rglob("payload.npy"):
        data = npy.read_bytes()
        npy.write_bytes(data[:-1] + bytes([data[-1] ^ 0xFF]))
    c = cached_artifact("ivf_centroids", params, build, root=str(tmp_path))
    assert len(calls) == 3 and np.array_equal(c, a)


def test_stop_shingles_persist_across_processes(spark, sf_dir, tmp_path, monkeypatch):
    """VERDICT r5 #3: dd2's stop-shingle set must persist via
    functions/artifacts — a FRESH process (simulated by clearing the
    in-process L1 dict) loads the persisted set instead of re-paying
    the corpus-wide discovery aggregation. Builder-call counter: one
    probe total across two 'processes'."""
    from etl_zero_spark.operators import dedup
    from etl_zero_spark.plans import northstar

    monkeypatch.setenv("ETL_ZERO_ARTIFACTS", str(tmp_path))
    monkeypatch.setattr(northstar, "_STOP_SHINGLES", {})
    calls = []
    real = dedup.compute_stop_shingles

    def counting(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(dedup, "compute_stop_shingles", counting)
    first = northstar._stop_shingles_cached(spark, sf_dir)
    assert calls == [1]
    # same process: L1 dict, no probe, no artifact read
    assert northstar._stop_shingles_cached(spark, sf_dir) == first
    assert calls == [1]
    # "new process": L1 cleared -> artifact load, probe NOT re-run
    monkeypatch.setattr(northstar, "_STOP_SHINGLES", {})
    assert northstar._stop_shingles_cached(spark, sf_dir) == first
    assert calls == [1]
