"""Automatic schema mapper (operators J1-J5 + P1).

Port of the reference's DatasetMapper (ETL_Pipeline_Entire/mapping.py):
pairwise sweep over all tables, join-key inference with FK priority
(mapping.py:140-149) then semantic column-name similarity
(mapping.py:89-103, Word2Vec cosine >= 0.8), disambiguating projection
aliases (mapping.py:105-127), merged pairs written once per pair,
unmatched tables passed through (mapping.py:173-181).

Spark-first decisions:
* The *inference* is metadata logic over column names — it stays on the
  driver (tens of strings), exactly like the reference. But instead of
  a trained Word2Vec (non-deterministic, heavyweight for a name corpus)
  we use a deterministic token/char similarity
  (functions/fuzzy.name_similarity) with the same 0.8 acceptance
  threshold; SURVEY §4.3.2 calls determinism > fidelity here.
* The *joins* are plain ``df.join`` — Catalyst/AQE picks broadcast-hash
  for dim tables and sort-merge for fact-fact, handles skew. The
  reference ships SQL strings to MySQL (mapping.py:162-165).
* P1 aliasing: every non-key column is suffixed ``_{table}``; the join
  key appears once, unsuffixed — byte-for-byte the reference's naming
  (mapping.py:117-123).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_zero_spark.functions.fuzzy import name_similarity

#: Acceptance threshold for semantic column matches (mapping.py:22).
SIMILARITY_THRESHOLD = 0.8


def infer_join_key(
    t1: str,
    cols1: list[str],
    t2: str,
    cols2: list[str],
    fks: dict[str, dict[str, tuple[str, str]]] | None = None,
    sim_fn=None,
) -> tuple[str, str] | None:
    """J2 then J3: returns (col_in_t1, col_in_t2) or None.

    FK priority (mapping.py:140-149): if t1 declares an FK into t2 (or
    vice versa), use that pair. Else semantic similarity over all column
    pairs, best pair >= SIMILARITY_THRESHOLD (mapping.py:89-103).
    ``sim_fn`` overrides the name-similarity backend (default: the
    deterministic difflib-based ``name_similarity``; see
    ``fuzzy.word2vec_name_similarity`` for the learned parity backend).
    """
    fks = fks or {}
    sim_fn = sim_fn or name_similarity
    for c, (parent, pcol) in fks.get(t1, {}).items():
        if parent == t2 and c in cols1 and pcol in cols2:
            return (c, pcol)
    for c, (parent, pcol) in fks.get(t2, {}).items():
        if parent == t1 and pcol in cols1 and c in cols2:
            return (pcol, c)
    # exact shared name wins immediately (the degenerate similarity=1 case)
    shared = [c for c in cols1 if c in cols2]
    if shared:
        return (shared[0], shared[0])
    best: tuple[float, str, str] | None = None
    for c1 in cols1:
        for c2 in cols2:
            sim = sim_fn(c1, c2)
            if best is None or sim > best[0]:
                best = (sim, c1, c2)
    if best is not None and best[0] >= SIMILARITY_THRESHOLD:
        return (best[1], best[2])
    return None


def merge_pair(
    df1: DataFrame, t1: str, df2: DataFrame, t2: str, key1: str, key2: str
) -> DataFrame:
    """J1 + P1: inner equi-join with the reference's aliasing scheme
    (mapping.py:105-127): key kept once unsuffixed; every other column
    suffixed with its source table. Dim-sized sides broadcast
    automatically under AQE; no hint needed."""
    left = df1.select(
        F.col(key1).alias("__join_key__"),
        *[F.col(c).alias(f"{c}_{t1}") for c in df1.columns if c != key1],
    )
    right = df2.select(
        F.col(key2).alias("__join_key__"),
        *[F.col(c).alias(f"{c}_{t2}") for c in df2.columns if c != key2],
    )
    return left.join(right, on="__join_key__", how="inner").withColumnRenamed(
        "__join_key__", key1
    )


@dataclass
class DatasetMapper:
    """J4/J5: the pairwise merge sweep (mapping.py:129-181).

    ``tables``: name -> DataFrame; ``fks``: side metadata (Spark's
    catalog has no FK objects — SURVEY §1.1). ``backend`` selects the
    J3 name-similarity: "difflib" (default, deterministic) or
    "word2vec" (reference parity — trains a seeded Spark ML Word2Vec on
    the column-name corpus at sweep time, mirroring the reference
    training in its constructor, mapping.py:34-37,67-77).
    """

    tables: dict[str, DataFrame]
    fks: dict[str, dict[str, tuple[str, str]]] = field(default_factory=dict)
    backend: str = "difflib"
    #: R4 fallback tier: when FK metadata and name similarity both fail,
    #: compare column VALUE sets (KMV sketches, one bounded aggregation
    #: pass per table for the whole sweep) and accept the best pair at
    #: ``value_overlap_threshold`` estimated Jaccard.
    value_overlap: bool = False
    value_overlap_threshold: float = 0.5

    def _sim_fn(self):
        if self.backend == "word2vec":
            from etl_zero_spark.functions.fuzzy import word2vec_name_similarity

            all_cols = [c for df in self.tables.values() for c in df.columns]
            return word2vec_name_similarity(all_cols)
        return name_similarity

    def merge_tables(self) -> dict[str, DataFrame]:
        """Double loop over pairs; each table participates in at most one
        merge (both orders marked done, mapping.py:168-169); unmatched
        tables pass through as-is (J5, mapping.py:173-181). Returns
        {output_name: DataFrame} with merged pairs named
        ``{t1}_{t2}_merged``."""
        names = list(self.tables)
        done: set[str] = set()
        out: dict[str, DataFrame] = {}
        sim_fn = self._sim_fn()
        sketches: dict[str, dict[str, KmvSketch]] = {}

        def sketch(t: str) -> dict[str, KmvSketch]:
            # one aggregation pass per TABLE for the whole sweep
            if t not in sketches:
                sketches[t] = column_value_sketches(self.tables[t])
            return sketches[t]

        def value_key(t1: str, t2: str) -> tuple[str, str] | None:
            best: tuple[float, str, str] | None = None
            for c1, a in sketch(t1).items():
                for c2, b in sketch(t2).items():
                    ov = kmv_overlap(a, b)
                    if best is None or ov > best[0]:
                        best = (ov, c1, c2)
            if best is not None and best[0] >= self.value_overlap_threshold:
                return (best[1], best[2])
            return None

        for i, t1 in enumerate(names):
            if t1 in done:
                continue
            for t2 in names[i + 1 :]:
                if t2 in done:
                    continue
                key = infer_join_key(
                    t1,
                    self.tables[t1].columns,
                    t2,
                    self.tables[t2].columns,
                    self.fks,
                    sim_fn=sim_fn,
                )
                if key is None and self.value_overlap:
                    key = value_key(t1, t2)
                if key is None:
                    continue
                out[f"{t1}_{t2}_merged"] = merge_pair(
                    self.tables[t1], t1, self.tables[t2], t2, key[0], key[1]
                )
                done.update((t1, t2))
                break
        for t in names:
            if t not in done:
                out[t] = self.tables[t]  # J5 passthrough
        return out


# ---------------------------------------------------------------------------
# J3+ (R4): join-key inference by VALUE overlap — data evidence, not names
# ---------------------------------------------------------------------------

#: Sketch size: estimator error ~ 1/sqrt(k); 1024 gives ~3% — plenty to
#: rank candidate key pairs.
KMV_K = 1024


@dataclass(frozen=True)
class KmvSketch:
    """KMV sketch of one column's distinct value set: every retained
    (abs) hash is < ``theta``, and below theta the sketch is COMPLETE —
    the invariant the overlap estimator needs."""

    values: frozenset[int]
    theta: int


def column_value_sketches(
    df: DataFrame, cols: list[str] | None = None, k: int = KMV_K
) -> dict[str, KmvSketch]:
    """Bounded KMV (k-minimum-values) sketch of each column's DISTINCT
    value set: the k smallest xxhash64 values per column, plus the
    exclusive hash cutoff ``theta`` below which the sketch is complete.

    Scale shape: ONE aggregation pass for all columns. Each column's
    hashes are pre-filtered to ``hash < p * 2^63`` with p sized from
    the row count so ~8k survivors are expected (the theta-sketch
    trick: the filter bounds ``collect_set``'s state BEFORE
    aggregation — a plain collect-the-column would be unbounded), then
    sorted and cut to k on the driver. ``theta`` is the pre-filter
    bound, lowered to the (k+1)-th smallest hash when the driver-side
    cut truncated further — either way, everything below theta was
    kept, which is what makes two sketches comparable. Result is
    metadata-sized: <= k longs per column.
    """
    cols = cols or df.columns
    n = df.count()
    if n == 0:
        return {c: KmvSketch(frozenset(), 2**63 - 1) for c in cols}
    # expected survivors per column ~ 8k (oversampling covers duplicate-
    # heavy columns whose distinct count is far below n)
    p = min(1.0, (8.0 * k) / n)
    bound = min(int(p * float(2**63)), 2**63 - 1)  # keep the literal a long
    aggs = []
    for c in cols:
        h = F.xxhash64(F.col(c).cast("string"))
        kept = F.when(F.col(c).isNotNull() & (F.abs(h) < bound), F.abs(h))
        aggs.append(F.collect_set(kept).alias(c))
    row = df.select(*aggs).first()
    out: dict[str, KmvSketch] = {}
    for c in cols:
        vals = sorted(row[c] or [])
        if len(vals) > k:
            out[c] = KmvSketch(frozenset(vals[:k]), vals[k])
        else:
            out[c] = KmvSketch(frozenset(vals), bound)
    return out


def kmv_overlap(a: KmvSketch, b: KmvSketch) -> float:
    """Jaccard estimate |A ∩ B| / |A ∪ B| from two KMV hash sketches.

    Both sketches restrict to the SHARED theta = min(theta_a, theta_b);
    below it each is a complete (and, hashes being uniform, unbiased)
    sample of its column's distinct set, so the windowed Jaccard
    estimates the true one. Exact when neither sketch was truncated.

    Jaccard, not containment, ranks candidate key pairs: dense integer
    surrogate-id spaces (custkey 1..N, orderkey 1..10N) CONTAIN each
    other almost entirely, so containment cannot separate the true FK
    pair from an id-range coincidence — Jaccard penalizes the
    unmatched mass and does."""
    theta = min(a.theta, b.theta)
    aw = {x for x in a.values if x < theta}
    bw = {x for x in b.values if x < theta}
    union = aw | bw
    if not union:
        return 0.0
    return len(aw & bw) / len(union)


def infer_key_by_value_overlap(
    df1: DataFrame,
    df2: DataFrame,
    threshold: float = 0.3,
    k: int = KMV_K,
    cols1: list[str] | None = None,
    cols2: list[str] | None = None,
) -> tuple[str, str, float] | None:
    """The evidence tier name similarity cannot provide: pick the
    column pair whose VALUE sets have the highest estimated Jaccard,
    e.g. ``customer_ref`` vs ``c_custkey`` — no name signal, perfect
    value signal. Returns (col1, col2, jaccard) or None below
    ``threshold``.

    Two bounded aggregation passes (one per table) + a driver-side
    k-long set comparison per column pair — data-scale evidence at
    metadata-scale cost, usable as ``DatasetMapper``'s tie-breaker or
    fallback when FK metadata and name similarity both come up empty.
    """
    s1 = column_value_sketches(df1, cols1, k)
    s2 = column_value_sketches(df2, cols2, k)
    best: tuple[float, str, str] | None = None
    for c1, a in s1.items():
        for c2, b in s2.items():
            ov = kmv_overlap(a, b)
            if best is None or ov > best[0]:
                best = (ov, c1, c2)
    if best is not None and best[0] >= threshold:
        return (best[1], best[2], round(best[0], 4))
    return None
