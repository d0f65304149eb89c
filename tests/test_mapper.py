"""Unit tests for the schema mapper (J1-J5): FK-priority key inference,
semantic name similarity, pairwise merge sweep, P1 aliasing."""

from etl_zero_spark.catalog import FIXTURE_FKS
from etl_zero_spark.operators import mapper


def test_fk_priority(spark):
    key = mapper.infer_join_key(
        "orders",
        ["o_orderkey", "o_custkey"],
        "customer",
        ["c_custkey", "c_name"],
        FIXTURE_FKS,
    )
    assert key == ("o_custkey", "c_custkey")


def test_shared_name_match():
    key = mapper.infer_join_key("t1", ["id", "a"], "t2", ["id", "b"], {})
    assert key == ("id", "id")


def test_semantic_similarity_match():
    key = mapper.infer_join_key(
        "t1", ["customer_id", "a"], "t2", ["customer_identifier", "b"], {}
    )
    assert key is not None and key[0] == "customer_id"


def test_no_match_below_threshold():
    assert mapper.infer_join_key("t1", ["alpha"], "t2", ["zq"], {}) is None


def test_merge_pair_aliasing(spark):
    df1 = spark.createDataFrame([(1, "x")], ["k", "a"])
    df2 = spark.createDataFrame([(1, "y")], ["k", "b"])
    out = mapper.merge_pair(df1, "t1", df2, "t2", "k", "k")
    assert set(out.columns) == {"k", "a_t1", "b_t2"}
    assert out.count() == 1


def test_word2vec_backend_matches_token_permutations(spark):
    """The learned backend (seeded Spark ML Word2Vec, reference
    mapping.py:67-103 parity): identical token multisets average to the
    same vector (cosine 1.0), so permuted names must match; disjoint
    random-vector names must not reach the 0.8 threshold; the whole
    thing must be deterministic across calls."""
    from etl_zero_spark.functions.fuzzy import word2vec_name_similarity

    cols = ["customer_id", "id_customer", "order_total", "alpha", "zq"]
    sim = word2vec_name_similarity(cols)
    assert sim("customer_id", "id_customer") == 1.0
    key = mapper.infer_join_key(
        "t1", ["customer_id", "a"], "t2", ["id_customer", "b"], {}, sim_fn=sim
    )
    assert key == ("customer_id", "id_customer")
    sim2 = word2vec_name_similarity(cols)
    for a in cols:
        for b in cols:
            assert sim(a, b) == sim2(a, b)  # seeded -> reproducible


def test_merge_tables_word2vec_backend(spark):
    tables = {
        "orders": spark.createDataFrame([(1, 10)], ["o_orderkey", "o_custkey"]),
        "customer": spark.createDataFrame([(10, "A")], ["c_custkey", "c_name"]),
        "lonely": spark.createDataFrame([(99,)], ["z_col"]),
    }
    out = mapper.DatasetMapper(tables, FIXTURE_FKS, backend="word2vec").merge_tables()
    assert "orders_customer_merged" in out  # FK priority unaffected by backend
    assert "lonely" in out


def test_merge_tables_sweep_and_passthrough(spark):
    tables = {
        "orders": spark.createDataFrame([(1, 10)], ["o_orderkey", "o_custkey"]),
        "customer": spark.createDataFrame([(10, "A")], ["c_custkey", "c_name"]),
        "lonely": spark.createDataFrame([(99,)], ["z_col"]),
    }
    out = mapper.DatasetMapper(tables, FIXTURE_FKS).merge_tables()
    assert "orders_customer_merged" in out
    assert "lonely" in out  # J5 passthrough
    merged = out["orders_customer_merged"]
    assert merged.count() == 1 and "o_orderkey_orders" in merged.columns
