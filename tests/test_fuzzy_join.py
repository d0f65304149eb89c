"""Data-level fuzzy string join vs a brute-force all-pairs oracle."""

from pyspark.sql import functions as F

from etl_zero_spark.operators.joins import fuzzy_string_join

LEFT = [
    "Johnathan Smith",
    "Marie Curie",
    "Nikola Tesla",
    "Grace Hopper",
    "Alan Turing",
    "Ada Lovelace",
]
RIGHT = [
    "Jonathan Smith",   # 1 edit from Johnathan Smith
    "Marie  Curie",     # double space (normalization keeps it 1 edit)
    "Nicola Tesla",     # 1 edit
    "Grace Hoper",      # 1 edit
    "Richard Feynman",  # no match
    "Ada Lovelace",     # exact
]


def _lev(a, b):
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[n]


def _oracle_pairs(threshold):
    out = set()
    for a in LEFT:
        for b in RIGHT:
            na, nb = a.lower().strip(), b.lower().strip()
            denom = max(len(na), len(nb))
            sim = 1.0 if denom == 0 else 1.0 - _lev(na, nb) / denom
            if sim >= threshold:
                out.add((a, b, round(sim, 6)))
    return out


def test_fuzzy_join_matches_bruteforce(spark):
    L = spark.createDataFrame([(n,) for n in LEFT], "name string")
    R = spark.createDataFrame([(n,) for n in RIGHT], "cand string")
    got = {
        (r["name"], r["cand"], r["similarity"])
        for r in fuzzy_string_join(L, R, "name", "cand", threshold=0.8).collect()
    }
    assert got == _oracle_pairs(0.8)
    assert any(a == "Johnathan Smith" and b == "Jonathan Smith" for a, b, _ in got)


def test_fuzzy_join_plan_has_no_cartesian_or_python(spark):
    L = spark.createDataFrame([(n,) for n in LEFT], "name string")
    R = spark.createDataFrame([(n,) for n in RIGHT], "cand string")
    out = fuzzy_string_join(L, R, "name", "cand", threshold=0.8)
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_fuzzy_join_nulls_and_collisions(spark):
    L = spark.createDataFrame([(1, "Alpha Beta"), (2, None)], "id long, name string")
    R = spark.createDataFrame([(9, "Alpha Beta"), (8, None)], "id long, name string")
    out = fuzzy_string_join(L, R, "name", "name", threshold=0.9)
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0].asDict()
    assert r["id"] == 1 and r["id_r"] == 9 and r["name_r"] == "Alpha Beta"
    assert r["similarity"] == 1.0


def test_fuzzy_join_hot_gram_cap_bounds_discovery(spark):
    # every row shares the gram-rich prefix; cap kills those grams but
    # the distinctive suffix still pairs the true match
    L = spark.createDataFrame(
        [(f"common prefix text {s}",) for s in ["alphaone", "betatwo", "gammathree"]],
        "name string",
    )
    R = spark.createDataFrame([("common prefix text alphaonX",)], "cand string")
    out = fuzzy_string_join(L, R, "name", "cand", threshold=0.85, df_cap=2)
    got = [r["name"] for r in out.collect()]
    assert got == ["common prefix text alphaone"]
