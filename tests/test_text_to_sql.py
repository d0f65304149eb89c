"""Q2 adapter: prompt contract, SELECT extraction, end-to-end execution
with a stub generator (no model ships in this environment)."""

from etl_zero_spark.plans import text_to_sql as t2s
from tests.conftest import SF_SMOKE


def test_render_schema_number_text_collapse(spark):
    df = spark.createDataFrame([(1, "a", 2.0)], ["k", "s", "v"])
    schema = t2s.render_schema(spark, {"t": df})
    assert schema == "CREATE TABLE t (k number, s text, v number)"


def test_prompt_format():
    p = t2s.build_prompt("CREATE TABLE t (k number)", "how many rows?")
    assert p == "Tables:\nCREATE TABLE t (k number)\n\nQuestion:\nhow many rows?\n\nAnswer:\n"


def test_extract_select_variants():
    assert t2s.extract_select("SELECT 1") == "SELECT 1"
    assert t2s.extract_select("select * from t;") == "select * from t"
    assert (
        t2s.extract_select("the answer is: SELECT a FROM t; thanks") == "SELECT a FROM t"
    )
    assert t2s.extract_select("no sql here") is None


def test_end_to_end_with_stub_generator(spark):
    def fake_model(prompt: str) -> str:
        assert "CREATE TABLE customer" in prompt
        return "SELECT count(*) AS n FROM customer"

    out = t2s.process_query(spark, SF_SMOKE, "how many customers?", fake_model)
    assert out.first().n == 150


def test_end_to_end_unextractable(spark):
    out = t2s.process_query(spark, SF_SMOKE, "?", lambda p: "I don't know")
    assert out is None
