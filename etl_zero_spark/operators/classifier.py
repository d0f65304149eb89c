"""Learned document-quality classifier — the GPT-3 CommonCrawl filter
(Brown et al. 2020, "Language Models are Few-Shot Learners", appendix
A): train a logistic-regression classifier over hashed token features
to separate a trusted "positive" corpus (WebText-like) from raw crawl
"negative" documents, score every raw document, then keep documents
stochastically by the published Pareto rule
``score > 1 - pareto_draw(alpha=9)`` — low-scoring docs still leak
through occasionally, which keeps the kept corpus's diversity instead
of hard-thresholding to the classifier's idea of quality.

This complements the repo's other quality signals: Gopher rules
(operators/quality.py) are hand-written heuristics, the n-gram LM
(operators/lm.py) ranks by fluency under a reference model; the
classifier here LEARNS the boundary from two corpora the user already
has. The reference repo has no quality machinery at all
(ETL_Pipeline_Entire has no corpus tier); this is standard 100 TB
pipeline equipment.

Scale shape — deliberately the stock Spark ML pipeline, because the
original was literally built on Spark ("trained ... using Spark's
standard tokenizer and HashingTF"):

* features: whitespace tokens + token 2-grams -> ``HashingTF`` (the
  hashing trick again — feature space bounded at ``n_features``
  regardless of vocabulary, same argument as DSIR's buckets);
* training: ``pyspark.ml.classification.LogisticRegression`` — L-BFGS
  over ``treeAggregate`` gradient passes, JVM-side, linear in corpus
  size, model size = n_features doubles (2 MB at the default 2^18);
* scoring: one ``PipelineModel.transform`` pass (JVM codegen end to
  end, no Python in the loop);
* the keep rule: pure Column expressions with the xxhash64-derived
  uniform the repo uses everywhere randomness must be deterministic
  across runs/partitionings/retries (dsir_resample, shuffle_corpus).

Model persistence: ``PipelineModel.save``/``load`` to a directory —
``cached_quality_classifier`` wraps that in the same load-or-train
keying discipline as functions/artifacts (params-keyed path; Spark ML
writes its own metadata, so the artifact manifest layer is the
directory name, not a digest file).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_zero_spark.operators.dedup import tokens_expr

DEFAULT_N_FEATURES = 1 << 18


def _token_features(text: Column) -> Column:
    """Unigrams + token 2-grams as one array<string> — built with the
    repo's native token expression (NOT ml.feature.Tokenizer, whose
    lowercase+split differs from ``tokens_expr``; every text operator
    in this engine tokenizes identically so learned artifacts agree
    on what a token is)."""
    toks = tokens_expr(text)
    bigrams = F.when(
        F.size(toks) < 2, F.array().cast("array<string>")
    ).otherwise(
        F.zip_with(
            F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    )
    # NULL text -> empty feature array, not NULL: HashingTF throws on a
    # null terms column (review r7), and every adjacent corpus stage
    # (LM gate, DSIR, chunking) tolerates null text — so must this.
    return F.coalesce(
        F.concat(toks, bigrams), F.array().cast("array<string>")
    )


def train_quality_classifier(
    positive: DataFrame,
    negative: DataFrame,
    text_col: str = "text",
    n_features: int = DEFAULT_N_FEATURES,
    reg_param: float = 1e-4,
    max_iter: int = 30,
):
    """Fit the quality LR on positive (trusted) vs negative (raw)
    documents; returns the fitted ``PipelineModel`` (HashingTF + LR).
    Both inputs only need ``text_col``. Deterministic: HashingTF is a
    fixed hash and L-BFGS on a convex objective converges to the same
    optimum regardless of partitioning."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF

    train = (
        positive.select(F.lit(1.0).alias("label"),
                        _token_features(F.col(text_col)).alias("grams"))
        .unionByName(
            negative.select(F.lit(0.0).alias("label"),
                            _token_features(F.col(text_col)).alias("grams"))
        )
    )
    tf = HashingTF(inputCol="grams", outputCol="features",
                   numFeatures=n_features)
    lr = LogisticRegression(maxIter=max_iter, regParam=reg_param,
                            standardization=False)
    return Pipeline(stages=[tf, lr]).fit(train)


def score_quality(
    df: DataFrame,
    model,
    text_col: str = "text",
    out_col: str = "quality_prob",
) -> DataFrame:
    """P(quality) per document in one JVM-side transform pass; all
    original columns ride along, ML intermediates are dropped. NULL
    text scores on zero features (the intercept's probability)."""
    from pyspark.ml.functions import vector_to_array

    feat = df.withColumn("grams", _token_features(F.col(text_col)))
    scored = model.transform(feat)
    return scored.withColumn(
        out_col, vector_to_array(F.col("probability")).getItem(1)
    ).drop("grams", "features", "rawPrediction", "probability", "prediction")


def pareto_keep_expr(
    score: Column,
    id_col: Column,
    alpha: float = 9.0,
    seed: int = 0,
) -> Column:
    """GPT-3's published keep rule: ``score > 1 - pareto_draw(alpha)``
    (their np.random.pareto(9) — appendix A). The draw derives from
    xxhash64(id, seed) so the decision is DETERMINISTIC per document
    across runs, partitionings and retries (rand() would re-roll on
    task retry and break exactly-once sinks downstream). Inverse-CDF:
    a Lomax/Pareto-II draw is u^(-1/alpha) - 1 for uniform u.
    Documents with score >= 1 always keep; low scores keep with
    probability P(draw > 1 - score) — the long tail that preserves
    corpus diversity."""
    u = (
        (F.pmod(F.xxhash64(id_col, F.lit(seed)), F.lit(1 << 53)) + 0.5)
        / F.lit(float(1 << 53))
    )
    draw = F.pow(u, F.lit(-1.0 / alpha)) - F.lit(1.0)
    return score > (F.lit(1.0) - draw)


def classifier_filter(
    df: DataFrame,
    model,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 9.0,
    seed: int = 0,
    keep_col: str | None = None,
) -> DataFrame:
    """Score + Pareto keep in one pass. With ``keep_col`` set the
    decision is appended (audit mode — count both sides before
    committing to a filter); otherwise dropped rows are gone and the
    score column rides along for downstream stratification."""
    scored = score_quality(df, model, text_col=text_col)
    keep = pareto_keep_expr(
        F.col("quality_prob"), F.col(id_col), alpha=alpha, seed=seed
    )
    if keep_col is not None:
        return scored.withColumn(keep_col, keep)
    return scored.where(keep)


def cached_quality_classifier(
    positive: DataFrame,
    negative: DataFrame,
    corpus_key: dict,
    text_col: str = "text",
    n_features: int = DEFAULT_N_FEATURES,
    reg_param: float = 1e-4,
    max_iter: int = 30,
    root: str | None = None,
):
    """Load-or-train with the functions/artifacts keying discipline
    (shared ``artifact_path`` rule): the params dict (caller's corpus
    identity + every geometry knob) hashes to the model directory; a
    loadable model there whose stored params echo matches is reused,
    anything else — absent, corrupt, params drift on a key collision
    — retrains and overwrites. Spark ML owns the model's on-disk
    format (its own metadata + parquet coefficients); the params echo
    is a sidecar JSON, replacing the digest check cached_artifact
    does for payloads it owns."""
    import json
    import os

    from pyspark.ml import PipelineModel

    from etl_zero_spark.functions.artifacts import artifact_path

    params = {
        **corpus_key,
        "n_features": n_features,
        "reg_param": reg_param,
        "max_iter": max_iter,
        "text_col": text_col,
    }
    path = artifact_path("quality_classifier", params, root)
    echo = path + ".params.json"
    try:
        with open(echo) as fh:
            stored = json.load(fh)
        if stored == json.loads(json.dumps(params)):
            return PipelineModel.load(path)
    except Exception:  # noqa: BLE001 — absent/corrupt/mismatch -> retrain
        pass
    model = train_quality_classifier(
        positive, negative, text_col, n_features, reg_param, max_iter
    )
    model.write().overwrite().save(path)
    tmp = echo + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(params, fh)
    os.replace(tmp, echo)
    return model
