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


def test_source_identity_content_witness(tmp_path):
    """ADVICE r7 #4: an in-place regeneration that preserves file
    names, sizes, AND mtime (coarse-granularity filesystems) must
    still change the source identity — the edge-sample hash is the
    content witness. Covered for a plain file, a small part file
    (< 64 KiB), and a large one where only the tail block differs."""
    import os

    from etl_zero_spark.functions.artifacts import source_identity

    # plain file
    f = tmp_path / "model.json"
    f.write_bytes(b"a" * 100)
    st = os.stat(f)
    id1 = source_identity(str(f))
    f.write_bytes(b"b" * 100)  # same size
    os.utime(f, ns=(st.st_atime_ns, st.st_mtime_ns))  # same mtime_ns
    assert source_identity(str(f)) != id1

    # directory of part files: small part rewritten in place
    d = tmp_path / "table.parquet"
    d.mkdir()
    part = d / "part-00000.parquet"
    part.write_bytes(b"x" * 1000)
    (d / "_SUCCESS").write_bytes(b"")  # sidecar: ignored
    st = os.stat(part)
    id1 = source_identity(str(d))
    part.write_bytes(b"y" * 1000)
    os.utime(part, ns=(st.st_atime_ns, st.st_mtime_ns))
    id2 = source_identity(str(d))
    assert id2 != id1

    # large part file (> 2*64KiB): change only the FOOTER region —
    # parquet's schema/stats live there, so the tail sample sees any
    # real rewrite
    big = b"z" * (200 * 1024)
    part.write_bytes(big)
    st = os.stat(part)
    id3 = source_identity(str(d))
    part.write_bytes(big[:-1] + b"w")
    os.utime(part, ns=(st.st_atime_ns, st.st_mtime_ns))
    assert source_identity(str(d)) != id3


def test_regenerated_corpus_invalidates_cache(spark, tmp_path, monkeypatch):
    """VERDICT r7 #7 done-criterion: a corpus regenerated IN PLACE
    (same file names/sizes/mtimes, different bytes) invalidates every
    source_identity-keyed learned-artifact cache — exercised through
    the real stop-shingles path, the same keying the IVF-centroid
    cache uses."""
    import os

    from etl_zero_spark.plans import northstar

    monkeypatch.setenv("ETL_ZERO_ARTIFACTS", str(tmp_path / "arts"))
    corpus = tmp_path / "corpus"
    corpus.mkdir()

    def write_docs(texts):
        import pandas as pd

        spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": range(len(texts)),
                    "text": texts,
                    "lang": ["en"] * len(texts),
                    "source": ["t"] * len(texts),
                }
            )
        ).coalesce(1).write.mode("overwrite").parquet(
            str(corpus / "documents.parquet")
        )

    calls = []
    from etl_zero_spark.operators import dedup

    real = dedup.compute_stop_shingles

    def counting(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(dedup, "compute_stop_shingles", counting)
    monkeypatch.setattr(northstar, "_STOP_SHINGLES", {})
    write_docs(["alpha beta gamma delta"] * 4)
    northstar._stop_shingles_cached(spark, str(corpus))
    assert calls == [1]
    # regenerate in place with DIFFERENT same-length content and
    # clamp every part file back to its prior mtime_ns
    before = {
        p: os.stat(os.path.join(str(corpus / "documents.parquet"), p))
        for p in os.listdir(corpus / "documents.parquet")
    }
    write_docs(["omega psi chi phiii"] * 4)
    for p, st in before.items():
        full = os.path.join(str(corpus / "documents.parquet"), p)
        if os.path.exists(full):
            os.utime(full, ns=(st.st_atime_ns, st.st_mtime_ns))
    monkeypatch.setattr(northstar, "_STOP_SHINGLES", {})
    northstar._stop_shingles_cached(spark, str(corpus))
    assert calls == [1, 1], "regenerated corpus must retrain, not serve stale"


def test_regenerated_corpus_invalidates_all_learned_caches(
    spark, tmp_path, monkeypatch
):
    """VERDICT r7 #7 done-criterion, the full sweep: every learned-
    artifact cache — PQ codebooks, BPE merges, n-gram LM, DSIR
    logratio, quality classifier — keyed through the ONE shared
    ``corpus_key`` helper rebuilds when the corpus is regenerated in
    place (same file names, clamped mtimes), and none rebuilds on a
    plain re-call."""
    import os

    import numpy as np
    import pandas as pd

    from etl_zero_spark.functions.artifacts import corpus_key
    from etl_zero_spark.operators import bpe, classifier, lm, pq
    from etl_zero_spark.operators import corpus as corp

    monkeypatch.setenv("ETL_ZERO_ARTIFACTS", str(tmp_path / "arts"))
    droot = tmp_path / "corpus"
    droot.mkdir()
    dpath = str(droot / "documents.parquet")
    epath = str(droot / "embeddings.parquet")

    def write(version):
        spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": range(8),
                    "text": [
                        f"alpha beta gamma v{version} doc{i} delta epsilon"
                        for i in range(8)
                    ],
                }
            )
        ).coalesce(1).write.mode("overwrite").parquet(dpath)
        rng = np.random.default_rng(version)
        spark.createDataFrame(
            pd.DataFrame(
                {
                    "vec_id": list(range(8)),
                    "embedding": [
                        [float(v) for v in rng.normal(size=8)] for _ in range(8)
                    ],
                }
            )
        ).coalesce(1).write.mode("overwrite").parquet(epath)

    calls = {}

    def count(mod, name):
        real = getattr(mod, name)

        def wrapper(*a, **kw):
            calls[name] = calls.get(name, 0) + 1
            return real(*a, **kw)

        monkeypatch.setattr(mod, name, wrapper)

    count(pq, "train_pq")
    count(bpe, "train_bpe")
    count(lm, "train_ngram_lm")
    count(corp, "dsir_bucket_logratio")
    count(classifier, "train_quality_classifier")

    def run_all():
        docs = spark.read.parquet(dpath)
        emb = spark.read.parquet(epath)
        pq.cached_pq_codebooks(
            emb, corpus_key(epath), m=2, nbits=2, sample_rows=8, max_iter=2
        )
        bpe.cached_bpe_merges(docs, corpus_key(dpath), n_merges=5)
        lm.cached_ngram_lm(
            docs, corpus_key(dpath), max_vocab=64, max_bigrams=64
        )
        corp.cached_dsir_logratio(
            docs,
            docs.where("doc_id < 4"),
            corpus_key(dpath, target="doc_id<4"),
            n_buckets=32,
        )
        classifier.cached_quality_classifier(
            docs.where("doc_id % 2 = 0"),
            docs.where("doc_id % 2 = 1"),
            corpus_key(dpath, pos="mod2=0", neg="mod2=1"),
            n_features=256,
            max_iter=2,
        )

    write(1)
    run_all()
    assert all(n == 1 for n in calls.values()), calls
    run_all()  # warm: every cache hits, nothing retrains
    assert all(n == 1 for n in calls.values()), calls

    # regenerate IN PLACE and clamp every surviving part file back to
    # its prior mtime_ns — the content witness must still invalidate
    before = {}
    for d in (dpath, epath):
        for p in os.listdir(d):
            before[os.path.join(d, p)] = os.stat(os.path.join(d, p))
    write(2)
    for full, st in before.items():
        if os.path.exists(full):
            os.utime(full, ns=(st.st_atime_ns, st.st_mtime_ns))
    run_all()
    assert all(n == 2 for n in calls.values()), calls
