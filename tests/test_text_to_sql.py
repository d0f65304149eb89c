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


# ---------------------------------------------------------------------------
# default rule-based generator (generation itself, not just the prompt
# contract — the reference ships a T5; this is the engine's offline
# default backend)
# ---------------------------------------------------------------------------

_SCHEMA = (
    "CREATE TABLE customer (c_custkey number, c_name text, c_mktsegment text)\n"
    "CREATE TABLE orders (o_orderkey number, o_custkey number, "
    "o_totalprice number, o_orderstatus text)"
)


def _gen(question: str) -> str:
    return t2s.RuleBasedGenerator()(t2s.build_prompt(_SCHEMA, question))


def test_generator_reference_demo_questions():
    """The three questions the reference demos its T5 on
    (text_to_sql.py:176-181)."""
    assert _gen("Show me all records from the first table") == "SELECT * FROM customer"
    sql = _gen("What are the top 5 records in the orders table?")
    assert sql == "SELECT * FROM orders ORDER BY o_orderkey DESC LIMIT 5"
    sql = _gen("Find all orders where the totalprice is greater than 10")
    assert sql == "SELECT * FROM orders WHERE o_totalprice > 10"


def test_generator_aggregate_shapes():
    assert (
        _gen("average totalprice of orders by orderstatus")
        == "SELECT o_orderstatus, AVG(o_totalprice) AS o_totalprice_avg "
        "FROM orders GROUP BY o_orderstatus"
    )
    assert (
        _gen("what is the max totalprice in orders")
        == "SELECT MAX(o_totalprice) AS o_totalprice_max FROM orders"
    )
    assert _gen("how many customers are there") == "SELECT COUNT(*) AS n FROM customer"
    assert (
        _gen("distinct mktsegment from customer")
        == "SELECT DISTINCT c_mktsegment FROM customer"
    )


def test_generator_equality_filter_and_fuzzy_table():
    assert (
        _gen("count orders where orderstatus is F")
        == "SELECT COUNT(*) AS n FROM orders WHERE o_orderstatus = 'F'"
    )
    # 'custmer' resolves by difflib, like the reference's column fuzzing
    assert _gen("show all custmer rows") == "SELECT * FROM customer"


def test_generator_unresolvable_returns_no_select():
    assert _gen("tell me a joke") == ""
    assert t2s.extract_select(_gen("tell me a joke")) is None


def test_default_generator_end_to_end(spark):
    """process_query with NO generator argument must now answer real
    questions against the fixture through spark.sql."""
    out = t2s.process_query(spark, SF_SMOKE, "how many customers are there?")
    assert out.first().n == 150

    out = t2s.process_query(
        spark, SF_SMOKE, "top 3 orders by totalprice", tables=["orders"]
    )
    rows = out.collect()
    assert len(rows) == 3
    assert rows[0].o_totalprice >= rows[1].o_totalprice >= rows[2].o_totalprice

    out = t2s.process_query(
        spark,
        SF_SMOKE,
        "average totalprice of orders per orderstatus",
        tables=["orders"],
    )
    assert set(out.columns) == {"o_orderstatus", "o_totalprice_avg"}
    assert out.count() == 3


def test_generator_foreign_key_join():
    """A group column living in another table triggers the FK join
    (mapper J3 name-similarity inference on the rendered schema)."""
    sql = _gen("average totalprice of orders per mktsegment")
    assert sql == (
        "SELECT t2.c_mktsegment, AVG(t1.o_totalprice) AS o_totalprice_avg "
        "FROM orders t1 JOIN customer t2 "
        "ON t1.o_custkey = t2.c_custkey GROUP BY t2.c_mktsegment"
    )


def test_generator_foreign_join_end_to_end(spark):
    out = t2s.process_query(
        spark,
        SF_SMOKE,
        "average totalprice of orders per mktsegment",
        tables=["orders", "customer"],
    )
    rows = {r.c_mktsegment: r.o_totalprice_avg for r in out.collect()}
    assert len(rows) == 5  # TPC-H market segments
    assert all(v > 0 for v in rows.values())


def test_generator_plain_join_questions():
    """R5 (r4 verdict #6): plain 'show X with their Y' two-table joins
    over the mapper-style inferred key pair — table mention, column
    mention, and the 'joined with' phrasing all resolve; unresolvable
    join mentions still fall through."""
    sql = _gen("show customers with their orders")
    assert sql == (
        "SELECT t1.*, t2.* FROM customer t1 "
        "JOIN orders t2 ON t1.c_custkey = t2.o_custkey"
    )
    # column mention living in exactly one other table
    sql = _gen("show orders with their c_name")
    assert sql == (
        "SELECT t1.*, t2.c_name FROM orders t1 "
        "JOIN customer t2 ON t1.o_custkey = t2.c_custkey"
    )
    # 'joined with' phrasing + filter stays qualified to t1
    sql = _gen("orders joined with customer where totalprice greater than 1000")
    assert sql == (
        "SELECT t1.*, t2.* FROM orders t1 "
        "JOIN customer t2 ON t1.o_custkey = t2.c_custkey "
        "WHERE t1.o_totalprice > 1000"
    )


def test_generator_plain_join_end_to_end(spark):
    out = t2s.process_query(
        spark, SF_SMOKE, "show customers with their orders"
    )
    assert out is not None
    cols = out.columns
    assert "c_custkey" in cols and "o_orderkey" in cols
    assert out.count() > 0


def test_generator_bottom_n_and_between():
    sql = _gen("bottom 5 orders by totalprice")
    assert sql == (
        "SELECT * FROM orders ORDER BY o_totalprice ASC LIMIT 5"
    )
    sql = _gen("show orders where totalprice between 100 and 2000")
    assert sql == (
        "SELECT * FROM orders WHERE o_totalprice BETWEEN 100 AND 2000"
    )
    # 'lowest <col>' (no count) still means MIN, not a limit
    sql = _gen("lowest totalprice of orders")
    assert sql == "SELECT MIN(o_totalprice) AS o_totalprice_min FROM orders"


def test_generator_multi_condition_where():
    """R6 (VERDICT r5 #6): the reference demo's 'price over X and stock
    under Y' space — every stated condition survives, joined by the
    question's own connective (AND default, OR when said)."""
    sql = _gen("show orders where totalprice is greater than 100 and orderkey less than 50")
    assert sql == "SELECT * FROM orders WHERE o_totalprice > 100 AND o_orderkey < 50"
    sql = _gen("orders where orderstatus is F or orderstatus is O")
    assert sql == "SELECT * FROM orders WHERE o_orderstatus = 'F' OR o_orderstatus = 'O'"
    # three conditions, mixed connectives, BETWEEN's 'and' untouched
    sql = _gen(
        "orders where totalprice between 100 and 2000 "
        "and orderstatus is F or orderkey greater than 10"
    )
    assert sql == (
        "SELECT * FROM orders WHERE o_totalprice BETWEEN 100 AND 2000 "
        "AND o_orderstatus = 'F' OR o_orderkey > 10"
    )
    # multi-condition composes with the other shapes
    sql = _gen("count orders where totalprice over 100 and orderstatus is F")
    assert sql == (
        "SELECT COUNT(*) AS n FROM orders WHERE o_totalprice > 100 "
        "AND o_orderstatus = 'F'"
    )


def test_generator_having_shapes():
    """R6: explicit HAVING on grouped branches; count needs no column;
    a stated HAVING that cannot be honored refuses the question."""
    sql = _gen("average totalprice of orders by orderstatus having average totalprice over 100")
    assert sql == (
        "SELECT o_orderstatus, AVG(o_totalprice) AS o_totalprice_avg "
        "FROM orders GROUP BY o_orderstatus HAVING AVG(o_totalprice) > 100"
    )
    sql = _gen("count orders per orderstatus having count over 5")
    assert sql == (
        "SELECT o_orderstatus, COUNT(*) AS n FROM orders "
        "GROUP BY o_orderstatus HAVING COUNT(*) > 5"
    )
    # WHERE and HAVING together, split at the keyword
    sql = _gen(
        "count orders where totalprice over 10 per orderstatus having count under 99"
    )
    assert sql == (
        "SELECT o_orderstatus, COUNT(*) AS n FROM orders "
        "WHERE o_totalprice > 10 GROUP BY o_orderstatus HAVING COUNT(*) < 99"
    )
    # HAVING without resolvable groups / unparseable constraint: refuse
    assert _gen("count orders having count over 5") == ""
    assert _gen("average totalprice of orders by orderstatus having vibes") == ""
    assert _gen("show all orders having count over 5") == ""


def test_generator_grouped_count():
    sql = _gen("count of orders per orderstatus")
    assert sql == (
        "SELECT o_orderstatus, COUNT(*) AS n FROM orders GROUP BY o_orderstatus"
    )


def test_generator_ranked_group_topn():
    """R6: 'top/bottom N <group> by <agg> <col>' ranks GROUPS by the
    aggregate — previously this mistranslated into a raw-row ORDER BY
    on a guessed numeric column."""
    sql = _gen("top 3 orderstatus by average totalprice")
    assert sql == (
        "SELECT o_orderstatus, AVG(o_totalprice) AS o_totalprice_avg "
        "FROM orders GROUP BY o_orderstatus "
        "ORDER BY o_totalprice_avg DESC LIMIT 3"
    )
    sql = _gen("bottom 2 mktsegment by sum of totalprice from orders")
    # group col lives in customer — not resolvable single-table: falls
    # back to... nothing matching in orders for 'mktsegment' is fuzzy;
    # accept either refusal or a customer-table parse, but never a
    # silent wrong-column ranking of raw orders rows
    assert "ORDER BY o_orderkey" not in sql
    sql = _gen("top 2 orderstatus by count orderkey")
    assert "GROUP BY o_orderstatus" in sql or sql == ""
    # plain raw-row top-N unchanged
    assert _gen("top 5 orders by totalprice") == (
        "SELECT * FROM orders ORDER BY o_totalprice DESC LIMIT 5"
    )


def test_generator_explicit_sort_on_plain_select():
    assert _gen("show all orders sorted by totalprice descending") == (
        "SELECT * FROM orders ORDER BY o_totalprice DESC"
    )
    assert _gen("orders where orderstatus is F ordered by orderkey") == (
        "SELECT * FROM orders WHERE o_orderstatus = 'F' ORDER BY o_orderkey"
    )


def test_generator_comparison_words_never_become_values():
    """Code-review r6: 'is lower/higher than <col>' (non-numeric
    comparison — unsupported) must not mis-parse as equality with the
    comparison word as a VALUE; numeric 'higher than N' translates."""
    sql = _gen("show orders where totalprice is lower than orderkey")
    assert "= 'lower'" not in sql and "= 'higher'" not in sql
    assert _gen("orders where totalprice is higher than 100") == (
        "SELECT * FROM orders WHERE o_totalprice > 100"
    )


def test_generator_having_split_is_word_boundary():
    """Code-review r6: the having-split must cut at the \\bhaving\\b
    match, not the first substring — 'behaving' inside a mention must
    not truncate the question."""
    schema = "CREATE TABLE metrics (m_id number, behaving_score number)"
    g = t2s.RuleBasedGenerator()
    sql = g(t2s.build_prompt(schema, "average behaving_score of metrics"))
    assert sql == (
        "SELECT AVG(behaving_score) AS behaving_score_avg FROM metrics"
    )


# ---------------------------------------------------------------------------
# R7 grammar: date/month filters, multi-column GROUP BY, agg aliases,
# bare-metric ranked groups (VERDICT r6 #6 + ADVICE r6 #3)
# ---------------------------------------------------------------------------

_SCHEMA_D = (
    "CREATE TABLE orders (o_orderkey number, o_custkey number, "
    "o_totalprice number, o_orderstatus text, o_orderpriority text, "
    "o_orderdate text)"
)

_SCHEMA_P = (
    "CREATE TABLE products (product_id number, product text, "
    "category text, revenue number, stock number)"
)


def _gen_d(question: str) -> str:
    return t2s.RuleBasedGenerator()(t2s.build_prompt(_SCHEMA_D, question))


def _gen_p(question: str) -> str:
    return t2s.RuleBasedGenerator()(t2s.build_prompt(_SCHEMA_P, question))


def test_generator_month_filters_resolve_date_column():
    """'orders between March and May' applies a MONTH() range to the
    table's unique date-named column; 'in July' is a single-month
    filter; the month names never leak into the equality parser."""
    sql = _gen_d("show orders between march and may")
    assert sql == (
        "SELECT * FROM orders WHERE MONTH(o_orderdate) BETWEEN 3 AND 5"
    )
    sql = _gen_d("count orders in july")
    assert sql == "SELECT COUNT(*) AS n FROM orders WHERE MONTH(o_orderdate) = 7"
    # the reference-demo composite: month range + two-column grouping
    sql = _gen_d("count of orders between march and may per orderstatus and orderpriority")
    assert sql == (
        "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n FROM orders "
        "WHERE MONTH(o_orderdate) BETWEEN 3 AND 5 "
        "GROUP BY o_orderstatus, o_orderpriority"
    )
    # no date/time-named column -> the stated month filter cannot
    # bind; R12 upgrades the old silently-dropped SELECT * to a
    # refusal (the month-name guard cue — a stated filter never ships
    # unfiltered, and it is never mis-bound to a text col either)
    assert _gen("show orders between march and may") == ""


def test_generator_iso_date_between():
    sql = _gen_d("orders where orderdate between 1995-03-01 and 1995-06-30")
    assert sql == (
        "SELECT * FROM orders WHERE o_orderdate BETWEEN "
        "DATE '1995-03-01' AND DATE '1995-06-30'"
    )


def test_generator_multi_column_group_by():
    sql = _gen_d("average totalprice of orders per orderstatus and orderpriority")
    assert sql == (
        "SELECT o_orderstatus, o_orderpriority, "
        "AVG(o_totalprice) AS o_totalprice_avg "
        "FROM orders GROUP BY o_orderstatus, o_orderpriority"
    )
    # a non-column second mention falls back to single-column grouping
    sql = _gen_d("count orders per orderstatus and show them")
    assert sql == (
        "SELECT o_orderstatus, COUNT(*) AS n FROM orders GROUP BY o_orderstatus"
    )


def test_generator_agg_output_alias():
    sql = _gen_p("sum of revenue as total_revenue in products")
    assert sql == "SELECT SUM(revenue) AS total_revenue FROM products"
    sql = _gen_p("average stock as avg_stock by category in products")
    assert sql == (
        "SELECT category, AVG(stock) AS avg_stock FROM products "
        "GROUP BY category"
    )


def test_generator_bare_metric_ranked_group():
    """ADVICE r6 #3: 'top N <group-col> by <numeric-col>' groups and
    ranks by SUM(metric); 'top N <table> by <col>' still ranks raw
    rows (the group word naming the table means rows, not groups)."""
    sql = _gen_p("top 5 categories by revenue from products")
    assert sql == (
        "SELECT category, SUM(revenue) AS revenue_sum FROM products "
        "GROUP BY category ORDER BY revenue_sum DESC LIMIT 5"
    )
    sql = _gen_p("bottom 2 categories by stock from products")
    assert sql == (
        "SELECT category, SUM(stock) AS stock_sum FROM products "
        "GROUP BY category ORDER BY stock_sum ASC LIMIT 2"
    )
    # the reference's literal demo phrasing: products is the TABLE, so
    # raw rows rank by the revenue column
    sql = _gen_p("top 5 products by revenue")
    assert sql == "SELECT * FROM products ORDER BY revenue DESC LIMIT 5"
    # group resolves but metric is TEXT -> not this shape; raw-row path
    sql = _gen_p("top 3 categories by product from products")
    assert "GROUP BY" not in sql


def test_month_filter_end_to_end(spark):
    """The R7 date grammar executes against the real fixture: month
    range + two-column grouping over the true o_orderdate DATE column
    through spark.sql (MONTH() on a date type)."""
    import duckdb

    out = t2s.process_query(
        spark,
        SF_SMOKE,
        "count of orders between march and may per orderstatus and orderpriority",
        tables=["orders"],
    )
    got = {(r.o_orderstatus, r.o_orderpriority): r.n for r in out.collect()}
    want = dict(
        ((s, p), n)
        for s, p, n in duckdb.sql(
            f"SELECT o_orderstatus, o_orderpriority, count(*) "
            f"FROM read_parquet('{SF_SMOKE}/orders.parquet') "
            f"WHERE month(o_orderdate) BETWEEN 3 AND 5 GROUP BY 1, 2"
        ).fetchall()
    )
    assert got == want and got


def test_generator_year_filter():
    """'orders in 1995' -> YEAR() on the date column; a 4-digit value
    against a NUMERIC column mention stays out of the date grammar."""
    sql = _gen_d("count orders in 1995")
    assert sql == "SELECT COUNT(*) AS n FROM orders WHERE YEAR(o_orderdate) = 1995"
    sql = _gen_d("orders where totalprice between 1000 and 2000")
    assert sql == "SELECT * FROM orders WHERE o_totalprice BETWEEN 1000 AND 2000"
    # month + year compose as two conditions
    sql = _gen_d("count orders in march in 1995")
    assert sql == (
        "SELECT COUNT(*) AS n FROM orders "
        "WHERE MONTH(o_orderdate) = 3 AND YEAR(o_orderdate) = 1995"
    )


def test_generator_date_filter_composes_with_equality():
    """Narrow-span date matching: 'status is F in march' keeps BOTH
    conditions — a greedy month pattern would swallow the F and block
    the equality from parsing."""
    sql = _gen_d("orders where orderstatus is F in march")
    assert sql == (
        "SELECT * FROM orders WHERE o_orderstatus = 'F' "
        "AND MONTH(o_orderdate) = 3"
    )
    sql = _gen_d("orders where orderstatus is F between march and may")
    assert sql == (
        "SELECT * FROM orders WHERE o_orderstatus = 'F' "
        "AND MONTH(o_orderdate) BETWEEN 3 AND 5"
    )


def test_generator_count_distinct():
    """R7: 'how many distinct X' -> COUNT(DISTINCT), plain and
    grouped; an unresolvable distinct target refuses."""
    sql = _gen("how many distinct mktsegments are there")
    assert sql == "SELECT COUNT(DISTINCT c_mktsegment) AS n FROM customer"
    sql = _gen_d("number of unique custkeys per orderstatus")
    assert sql == (
        "SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n "
        "FROM orders GROUP BY o_orderstatus"
    )
    assert _gen("how many distinct flurbs in customer") == ""
    # the plain SELECT DISTINCT shape is untouched
    assert _gen("distinct mktsegment from customer") == (
        "SELECT DISTINCT c_mktsegment FROM customer"
    )


def test_generator_superlative_row():
    """R7: 'which X has the highest Y' returns the ROW; 'what is the
    max Y' stays the scalar aggregate."""
    assert (
        _gen("which order has the highest totalprice")
        == "SELECT * FROM orders ORDER BY o_totalprice DESC LIMIT 1"
    )
    assert (
        _gen("the order with the lowest totalprice")
        == "SELECT * FROM orders ORDER BY o_totalprice ASC LIMIT 1"
    )
    # framing without has/with-THE keeps the scalar-aggregate reading
    assert (
        _gen("what is the max totalprice in orders")
        == "SELECT MAX(o_totalprice) AS o_totalprice_max FROM orders"
    )
    # condition composes: the WHERE precedes the ORDER BY
    assert (
        _gen("which order with the largest totalprice where orderstatus is F")
        == "SELECT * FROM orders WHERE o_orderstatus = 'F' "
        "ORDER BY o_totalprice DESC LIMIT 1"
    )
    # a stated superlative target that resolves to nothing refuses
    assert _gen("which order has the highest frobnication") == ""


def test_generator_anti_and_semi_join():
    """R7: existence questions — NOT EXISTS / EXISTS on the inferred
    key pair."""
    expect_anti = (
        "SELECT * FROM customer t1 WHERE NOT EXISTS "
        "(SELECT 1 FROM orders t2 WHERE t2.o_custkey = t1.c_custkey)"
    )
    assert _gen("customers without orders") == expect_anti
    assert _gen("show customers with no orders") == expect_anti
    assert _gen("list customers that have no orders") == expect_anti
    assert _gen("customers that have orders") == (
        "SELECT * FROM customer t1 WHERE EXISTS "
        "(SELECT 1 FROM orders t2 WHERE t2.o_custkey = t1.c_custkey)"
    )
    # row conditions ride along on t1
    assert _gen("customers where mktsegment is BUILDING without orders") == (
        "SELECT * FROM customer t1 WHERE t1.c_mktsegment = 'BUILDING' "
        "AND NOT EXISTS "
        "(SELECT 1 FROM orders t2 WHERE t2.o_custkey = t1.c_custkey)"
    )
    # a stated exclusion that names no table refuses...
    assert _gen("customers without frobnication") == ""
    # ...but 'have <column>' (not a table) falls through to the
    # plain-filter reading rather than fabricating a join
    assert (
        _gen("orders which have totalprice greater than 10")
        == "SELECT * FROM orders WHERE o_totalprice > 10"
    )


def test_generator_review_regressions_r7():
    """Review r7: phrasings that previously inverted or dropped
    constraints."""
    expect_anti = (
        "SELECT * FROM customer t1 WHERE NOT EXISTS "
        "(SELECT 1 FROM orders t2 WHERE t2.o_custkey = t1.c_custkey)"
    )
    # noun between 'which' and 'have', and the do-not-have spellings
    assert _gen("which customers have no orders") == expect_anti
    assert _gen("customers that do not have orders") == expect_anti
    assert _gen("customers that don't have orders") == expect_anti
    # a stated grouping keeps the grouped-aggregate reading; the
    # superlative-row branch must not swallow it into one global row
    assert (
        _gen("orders with the largest totalprice by orderstatus")
        == "SELECT o_orderstatus, MAX(o_totalprice) AS o_totalprice_max "
        "FROM orders GROUP BY o_orderstatus"
    )


def test_generator_grouped_count_foreign_table():
    """R7: a count grouping that lives in another table joins (like
    the aggregate branch); an unresolvable stated grouping refuses
    rather than silently returning the ungrouped count."""
    assert _gen("count of orders per mktsegment") == (
        "SELECT t2.c_mktsegment, COUNT(*) AS n FROM orders t1 "
        "JOIN customer t2 ON t1.o_custkey = t2.c_custkey "
        "GROUP BY t2.c_mktsegment"
    )
    assert _gen("how many orders per frobnication") == ""
    # no grouping stated -> plain count unchanged
    assert _gen("how many customers are there") == "SELECT COUNT(*) AS n FROM customer"


def test_generator_grouped_count_foreign_end_to_end(spark):
    out = t2s.process_query(
        spark, SF_SMOKE, "count of orders per mktsegment",
        tables=["orders", "customer"],
    )
    rows = {r.c_mktsegment: r.n for r in out.collect()}
    assert len(rows) == 5 and sum(rows.values()) > 0


def test_generator_superlative_synonyms_and_second_group():
    """Review r7 (2nd pass): every superlative synonym lands in the
    aggregate branch when grouped (never the plain-select fallback),
    and a second stated grouping on the foreign-join paths is honored
    or refused, never dropped."""
    assert (
        _gen("orders with the biggest totalprice by orderstatus")
        == "SELECT o_orderstatus, MAX(o_totalprice) AS o_totalprice_max "
        "FROM orders GROUP BY o_orderstatus"
    )
    # r14: "which order ... per X" names a ROW subject — the ranked-walk
    # machinery (f4b6527) now answers with the top order per partition
    # instead of a grouped MAX that never says WHICH order (DuckDB-verified:
    # the per-status winner's totalprice equals the per-status MAX)
    assert _gen("which order has the most totalprice per orderstatus") == (
        "SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM "
        "(SELECT t1.o_orderkey, t1.o_custkey, t1.o_totalprice, "
        "t1.o_orderstatus, ROW_NUMBER() OVER (PARTITION BY t1.o_orderstatus "
        "ORDER BY t1.o_totalprice DESC, t1.o_orderkey, t1.o_custkey, "
        "t1.o_totalprice, t1.o_orderstatus) AS rk FROM orders t1) ranked "
        "WHERE rk <= 1 ORDER BY o_orderstatus, rk"
    )
    assert (
        _gen("count of orders per mktsegment and orderstatus")
        == "SELECT t2.c_mktsegment, t1.o_orderstatus, COUNT(*) AS n "
        "FROM orders t1 JOIN customer t2 ON t1.o_custkey = t2.c_custkey "
        "GROUP BY t2.c_mktsegment, t1.o_orderstatus"
    )
    assert (
        _gen("average totalprice of orders per mktsegment and orderstatus")
        == "SELECT t2.c_mktsegment, t1.o_orderstatus, "
        "AVG(t1.o_totalprice) AS o_totalprice_avg "
        "FROM orders t1 JOIN customer t2 ON t1.o_custkey = t2.c_custkey "
        "GROUP BY t2.c_mktsegment, t1.o_orderstatus"
    )
    # a second group that resolves nowhere refuses
    assert _gen("count of orders per mktsegment and frobnication") == ""


def test_generator_never_raises_on_arbitrary_text():
    """Fuzz: the generator is the surface raw user text hits — it must
    refuse (return '') or emit a SELECT, never raise, for any input."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        q=st.text(
            alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
            max_size=120,
        )
    )
    def check(q):
        out = t2s.RuleBasedGenerator()(t2s.build_prompt(_SCHEMA, q))
        assert out == "" or out.upper().startswith("SELECT")

    check()


def test_generator_never_raises_on_questionlike_text():
    """Fuzz with question-shaped token soup (the grammar's own
    vocabulary recombined adversarially)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    words = st.sampled_from(
        "top bottom 5 average sum count distinct how many which with "
        "their no without have has the highest largest between and or "
        "by per orders customers totalprice orderstatus mktsegment is "
        "greater less than in march 1995 having over ordered sorted "
        "as name custkey".split()
    )

    @settings(max_examples=300, deadline=None)
    @given(qs=st.lists(words, min_size=1, max_size=12))
    def check(qs):
        out = t2s.RuleBasedGenerator()(t2s.build_prompt(_SCHEMA, " ".join(qs)))
        assert out == "" or out.upper().startswith("SELECT")

    check()


_SCHEMA_DATED = (
    _SCHEMA.replace(
        "o_orderstatus text)", "o_orderstatus text, o_orderdate text)"
    )
)


def _gen_dated(question: str) -> str:
    return t2s.RuleBasedGenerator()(t2s.build_prompt(_SCHEMA_DATED, question))


def test_generator_temporal_grouping():
    """Late-R7: 'per month' / 'by year' bucket the table's unique
    date-named column; tables without one refuse the temporal mention."""
    assert _gen_dated("how many orders per month") == (
        "SELECT month(o_orderdate) AS month, COUNT(*) AS n "
        "FROM orders GROUP BY month(o_orderdate)"
    )
    assert _gen_dated("average totalprice of orders by year") == (
        "SELECT year(o_orderdate) AS year, AVG(o_totalprice) "
        "AS o_totalprice_avg FROM orders GROUP BY year(o_orderdate)"
    )
    assert _gen_dated("count of orders per month and orderstatus") == (
        "SELECT month(o_orderdate) AS month, o_orderstatus, COUNT(*) AS n "
        "FROM orders GROUP BY month(o_orderdate), o_orderstatus"
    )
    # customer has no date-named column -> the stated grouping refuses
    assert _gen_dated("count of customers per month") == ""


def test_generator_temporal_grouping_end_to_end(spark):
    out = t2s.process_query(
        spark, SF_SMOKE, "how many orders per year", tables=["orders"]
    )
    rows = {r.year: r.n for r in out.collect()}
    assert len(rows) >= 2 and all(1995 <= y <= 2001 for y in rows)
    assert sum(rows.values()) == 1500  # every order in exactly one bucket


def test_generator_ranked_temporal_groups():
    """Late-R7: 'top N months by <agg/metric>' ranks temporal buckets
    of the unique date column, plural tolerated."""
    assert _gen_dated("top 3 months by sum totalprice in orders") == (
        "SELECT month(o_orderdate) AS month, SUM(o_totalprice) "
        "AS o_totalprice_sum FROM orders "
        "GROUP BY month(o_orderdate) ORDER BY o_totalprice_sum DESC LIMIT 3"
    )
    # bare-metric form rides the same path
    assert _gen_dated("top 3 months by totalprice in orders") == (
        "SELECT month(o_orderdate) AS month, SUM(o_totalprice) "
        "AS o_totalprice_sum FROM orders "
        "GROUP BY month(o_orderdate) ORDER BY o_totalprice_sum DESC LIMIT 3"
    )
    assert _gen_dated("bottom 2 years by count in orders") == (
        "SELECT year(o_orderdate) AS year, COUNT(*) AS n FROM orders "
        "GROUP BY year(o_orderdate) ORDER BY n ASC LIMIT 2"
    )


def test_generator_existence_composes_into_count_and_agg():
    """R8 (ADVICE r7 #1): a stated existence constraint is honored in
    EVERY branch — count/agg/distinct/superlative compose a correlated
    [NOT] EXISTS instead of silently dropping the exclusion."""
    sub = "(SELECT 1 FROM orders t2 WHERE t2.o_custkey = t1.c_custkey)"
    assert _gen("how many customers without orders") == (
        f"SELECT COUNT(*) AS n FROM customer t1 WHERE NOT EXISTS {sub}"
    )
    assert _gen("how many customers that have orders") == (
        f"SELECT COUNT(*) AS n FROM customer t1 WHERE EXISTS {sub}"
    )
    # row conditions ride along on t1
    assert _gen(
        "how many customers where mktsegment is BUILDING without orders"
    ) == (
        "SELECT COUNT(*) AS n FROM customer t1 "
        f"WHERE t1.c_mktsegment = 'BUILDING' AND NOT EXISTS {sub}"
    )
    # grouped count keeps the group AND the exclusion
    assert _gen("count of customers without orders per mktsegment") == (
        "SELECT c_mktsegment, COUNT(*) AS n FROM customer t1 "
        f"WHERE NOT EXISTS {sub} GROUP BY c_mktsegment"
    )
    # aggregates and distinct compose the same way
    assert _gen("distinct mktsegment of customers without orders") == (
        f"SELECT DISTINCT c_mktsegment FROM customer t1 WHERE NOT EXISTS {sub}"
    )
    # a stated exclusion that names no table refuses in the count
    # branch too (previously: unfiltered COUNT(*))
    assert _gen("how many customers without frobnication") == ""


def test_generator_agg_join_where_is_prefixed():
    """R8 (ADVICE r7 #2): the agg foreign-group join re-renders the
    WHERE with the t1. prefix like the count branch — a shared column
    name across the joined tables must not produce ambiguous SQL."""
    assert _gen(
        "average totalprice of orders per mktsegment "
        "where totalprice greater than 100"
    ) == (
        "SELECT t2.c_mktsegment, AVG(t1.o_totalprice) AS o_totalprice_avg "
        "FROM orders t1 JOIN customer t2 ON t1.o_custkey = t2.c_custkey "
        "WHERE t1.o_totalprice > 100 GROUP BY t2.c_mktsegment"
    )


def test_generator_join_plus_aggregate_rebase():
    """R8 (VERDICT r7 #5): the reference's richest demo shape —
    aggregate a column of one table grouped by a column of ANOTHER
    through the J3-inferred key, with the metric noun resolving via
    the suffix/containment synonym list ('revenue' -> o_totalprice)."""
    expected = (
        "SELECT t2.c_name, SUM(t1.o_totalprice) AS o_totalprice_sum "
        "FROM orders t1 JOIN customer t2 ON t1.o_custkey = t2.c_custkey "
        "GROUP BY t2.c_name"
    )
    assert _gen("total revenue per customer name") == expected
    assert _gen("sum of revenue per customer name") == expected
    # the two-word foreign mention also works base-table-first
    assert _gen("average totalprice of orders per customer name") == (
        "SELECT t2.c_name, AVG(t1.o_totalprice) AS o_totalprice_avg "
        "FROM orders t1 JOIN customer t2 ON t1.o_custkey = t2.c_custkey "
        "GROUP BY t2.c_name"
    )
    # rebase + filter rides on the base (t1) side
    assert _gen(
        "total revenue per customer name where totalprice over 100"
    ) == (
        "SELECT t2.c_name, SUM(t1.o_totalprice) AS o_totalprice_sum "
        "FROM orders t1 JOIN customer t2 ON t1.o_custkey = t2.c_custkey "
        "WHERE t1.o_totalprice > 100 GROUP BY t2.c_name"
    )


def test_generator_ambiguous_key_pair_refuses():
    """R8: two join-key pairs tying at the top similarity score are
    ambiguous — the question refuses rather than guessing which FK
    was meant."""
    schema = (
        "CREATE TABLE fact (alpha_key number, beta_key number, v number)\n"
        "CREATE TABLE dim (alpha_key number, beta_key number, name text)"
    )
    gen = t2s.RuleBasedGenerator()
    # (alpha_key, alpha_key) and (beta_key, beta_key) both score 1.0
    assert gen(t2s.build_prompt(schema, "facts without dims")) == ""
    assert gen(t2s.build_prompt(schema, "sum of v per name")) == ""
    # an unambiguous schema still joins
    schema_ok = (
        "CREATE TABLE fact (dim_id number, v number)\n"
        "CREATE TABLE dim (dim_id number, name text)"
    )
    assert gen(t2s.build_prompt(schema_ok, "sum of v per name")) == (
        "SELECT t2.name, SUM(t1.v) AS v_sum FROM fact t1 "
        "JOIN dim t2 ON t1.dim_id = t2.dim_id GROUP BY t2.name"
    )


def test_generator_join_aggregate_end_to_end(spark):
    out = t2s.process_query(
        spark, SF_SMOKE, "total revenue per customer name",
        tables=["orders", "customer"],
    )
    rows = out.collect()
    assert len(rows) > 10
    assert all(r.o_totalprice_sum > 0 for r in rows)


def test_generator_join_where_resolves_against_both_tables():
    """R8 review: a stated filter on the JOINED table's column must
    render t2-qualified, never silently vanish."""
    assert _gen(
        "total revenue per customer name where mktsegment is BUILDING"
    ) == (
        "SELECT t2.c_name, SUM(t1.o_totalprice) AS o_totalprice_sum "
        "FROM orders t1 JOIN customer t2 ON t1.o_custkey = t2.c_custkey "
        "WHERE t2.c_mktsegment = 'BUILDING' GROUP BY t2.c_name"
    )
    assert _gen(
        "count of orders per mktsegment where mktsegment is BUILDING"
    ) == (
        "SELECT t2.c_mktsegment, COUNT(*) AS n "
        "FROM orders t1 JOIN customer t2 ON t1.o_custkey = t2.c_custkey "
        "WHERE t2.c_mktsegment = 'BUILDING' GROUP BY t2.c_mktsegment"
    )
    # base-table filters still render t1-qualified alongside
    assert _gen(
        "total revenue per customer name where totalprice over 100 "
        "and mktsegment is BUILDING"
    ) == (
        "SELECT t2.c_name, SUM(t1.o_totalprice) AS o_totalprice_sum "
        "FROM orders t1 JOIN customer t2 ON t1.o_custkey = t2.c_custkey "
        "WHERE t1.o_totalprice > 100 AND t2.c_mktsegment = 'BUILDING' "
        "GROUP BY t2.c_name"
    )


def test_generator_stated_aggregate_never_row_dumps():
    """R8 review: an aggregate question whose metric resolves nowhere
    refuses — it must not fall through to SELECT * presented as the
    answer to a stated SUM."""
    assert _gen("total revenue per customer") == ""
    assert _gen("total revenue of customers") == ""
    assert _gen("sum of frobnication from orders") == ""
    # the resolvable shapes still answer
    assert _gen("total revenue per customer name") != ""


def test_generator_phrasing_robustness_r8():
    """R8 phrasing sweep: shapes real users type that previously
    dropped a stated aggregate, group, or sort — or averaged the
    WRONG column when a table noun sat between the agg word and its
    metric."""
    # 'how much <metric>' is a SUM
    assert _gen_dated("how much totalprice did we make per orderstatus") == (
        "SELECT o_orderstatus, SUM(o_totalprice) AS o_totalprice_sum "
        "FROM orders GROUP BY o_orderstatus"
    )
    # 'in each <col>' is a grouping phrase
    assert _gen("number of customers in each mktsegment") == (
        "SELECT c_mktsegment, COUNT(*) AS n FROM customer "
        "GROUP BY c_mktsegment"
    )
    # a table noun between agg word and metric must not BE the metric
    # ('order' used to fuzzy-resolve to o_orderkey)
    assert _gen("average order totalprice by customer mktsegment") == (
        "SELECT t2.c_mktsegment, AVG(t1.o_totalprice) AS o_totalprice_avg "
        "FROM orders t1 JOIN customer t2 ON t1.o_custkey = t2.c_custkey "
        "GROUP BY t2.c_mktsegment"
    )
    # stated sort on a grouped aggregate orders by the output alias;
    # an unresolvable stated sort refuses
    assert _gen(
        "sum totalprice grouped by orderstatus sorted by sum descending"
    ) == (
        "SELECT o_orderstatus, SUM(o_totalprice) AS o_totalprice_sum "
        "FROM orders GROUP BY o_orderstatus ORDER BY o_totalprice_sum DESC"
    )
    assert _gen("sum totalprice by orderstatus sorted by frobnicate") == ""


def test_generator_grouped_sort_wiring_r8_review():
    """Second R8 review pass: stated sorts must be honored (or refused)
    on EVERY grouped branch — count, foreign-join, rebased — and an
    ORDER BY over an ungrouped column (invalid SQL) must refuse."""
    # ungrouped column -> refuse, never invalid SQL
    assert _gen("sum totalprice by orderstatus sorted by custkey") == ""
    # temporal group's alias is orderable
    assert _gen_dated("sum totalprice per month sorted by month descending") == (
        "SELECT month(o_orderdate) AS month, SUM(o_totalprice) "
        "AS o_totalprice_sum FROM orders "
        "GROUP BY month(o_orderdate) ORDER BY month DESC"
    )
    # grouped count honors 'sorted by count'
    assert _gen("count of orders by orderstatus sorted by count descending") == (
        "SELECT o_orderstatus, COUNT(*) AS n FROM orders "
        "GROUP BY o_orderstatus ORDER BY n DESC"
    )
    # foreign-join branches: sort by the group column or the aggregate
    assert _gen("count of orders per mktsegment sorted by mktsegment") == (
        "SELECT t2.c_mktsegment, COUNT(*) AS n "
        "FROM orders t1 JOIN customer t2 ON t1.o_custkey = t2.c_custkey "
        "GROUP BY t2.c_mktsegment ORDER BY t2.c_mktsegment"
    )
    assert _gen(
        "total revenue per customer name sorted by revenue descending"
    ) == (
        "SELECT t2.c_name, SUM(t1.o_totalprice) AS o_totalprice_sum "
        "FROM orders t1 JOIN customer t2 ON t1.o_custkey = t2.c_custkey "
        "GROUP BY t2.c_name ORDER BY o_totalprice_sum DESC"
    )


# -- R8 late: widened filter vocabulary, superlative rows through the
# -- FK, multi-aggregate questions, and the global refusal guard -------


def test_generator_inclusive_and_exceeds_comparisons():
    """'at least/at most' render >=/<=, 'exceeds' renders >, and the
    MIN/MAX words inside 'at least/at most' never fire the aggregate
    branch (they refused via agg_stated before)."""
    assert _gen("orders where totalprice is at least 1000") == (
        "SELECT * FROM orders WHERE o_totalprice >= 1000"
    )
    assert _gen("orders where totalprice at most 500") == (
        "SELECT * FROM orders WHERE o_totalprice <= 500"
    )
    assert _gen("orders whose totalprice exceeds 1000") == (
        "SELECT * FROM orders WHERE o_totalprice > 1000"
    )


def test_generator_like_filters():
    """contains / starts with / ends with -> LIKE, quoted or one bare
    word, with quote doubling and LIKE-wildcard escaping."""
    assert _gen("customers whose name contains 're'") == (
        "SELECT * FROM customer WHERE c_name LIKE '%re%'"
    )
    assert _gen("customers where name starts with Cust") == (
        "SELECT * FROM customer WHERE c_name LIKE 'Cust%'"
    )
    assert _gen("customers where name ends with 'Inc'") == (
        "SELECT * FROM customer WHERE c_name LIKE '%Inc'"
    )
    # a literal % in the value cannot widen the match
    assert _gen("customers whose name contains '50%'") == (
        r"SELECT * FROM customer WHERE c_name LIKE '%50\%%'"
    )


def test_generator_negated_filters():
    """'is not' renders <>; '[not] from/in <col> <numeric>' renders
    the (in)equality — 'customers not from nation 5' previously
    returned an unfiltered SELECT *."""
    assert _gen("orders where orderstatus is not F") == (
        "SELECT * FROM orders WHERE o_orderstatus <> 'F'"
    )
    assert _gen("orders with totalprice is not 0") == (
        "SELECT * FROM orders WHERE o_totalprice <> 0"
    )
    assert _gen("customers in mktsegment 'BUILDING'") == (
        "SELECT * FROM customer WHERE c_mktsegment = 'BUILDING'"
    )
    # bare-word values stay out: 'records from orders where ...' must
    # not fuzzy-claim 'orders' as a column with 'where' as its value
    assert _gen("show me all records from orders") == "SELECT * FROM orders"


def test_generator_superlative_table_by_column():
    """'<superlative> <table> by <col>' is the TOP ROW — the agg branch
    previously read 'order' as a column and emitted a nonsense grouped
    MAX for 'largest order by totalprice'."""
    assert _gen("largest order by totalprice") == (
        "SELECT * FROM orders ORDER BY o_totalprice DESC LIMIT 1"
    )
    assert _gen("smallest order by totalprice") == (
        "SELECT * FROM orders ORDER BY o_totalprice ASC LIMIT 1"
    )
    # an unresolvable ranking column refuses
    assert _gen("largest order by frobnication") == ""


def test_generator_superlative_count_through_join():
    """'which customer has/placed the most orders' ranks base rows by
    the COUNT of joined rows through the J3-inferred key pair; 'fewest'
    flips the direction. The base row itself stays in the answer
    (GROUP BY every base column), and the join is LEFT + COUNT(key) so
    'fewest' can return a base row with ZERO joined rows."""
    expected = (
        "SELECT t1.c_custkey, t1.c_name, t1.c_mktsegment, "
        "COUNT(t2.o_custkey) AS n "
        "FROM customer t1 LEFT JOIN orders t2 ON t1.c_custkey = t2.o_custkey "
        "GROUP BY t1.c_custkey, t1.c_name, t1.c_mktsegment "
        "ORDER BY n DESC LIMIT 1"
    )
    assert _gen("which customer has the most orders") == expected
    assert _gen("which customer placed the most orders") == expected
    assert _gen("customers with the fewest orders") == expected.replace(
        "ORDER BY n DESC", "ORDER BY n ASC"
    )
    # an unresolvable superlative target still refuses
    assert _gen("which customer has the most frobnications") == ""


def test_generator_multi_aggregate():
    """TWO stated aggregates over one metric render both, in question
    order — the single-agg loop answered with one and silently dropped
    the other."""
    assert _gen("total and average totalprice per orderstatus") == (
        "SELECT o_orderstatus, SUM(o_totalprice) AS o_totalprice_sum, "
        "AVG(o_totalprice) AS o_totalprice_avg "
        "FROM orders GROUP BY o_orderstatus"
    )
    assert _gen("min and max totalprice") == (
        "SELECT MIN(o_totalprice) AS o_totalprice_min, "
        "MAX(o_totalprice) AS o_totalprice_max FROM orders"
    )
    # two stated aggregates whose metric resolves nowhere refuse
    assert _gen("total and average frobnication of orders") == ""
    # review fixes: a stated grouping that does not resolve in the base
    # table refuses (never ships the ungrouped form)...
    assert _gen("total and average totalprice per mktsegment") == ""
    assert _gen("total and average totalprice per frobnication") == ""
    # ...a table noun after the agg words qualifies the metric...
    assert _gen("total and average order totalprice per orderstatus") == (
        "SELECT o_orderstatus, SUM(o_totalprice) AS o_totalprice_sum, "
        "AVG(o_totalprice) AS o_totalprice_avg "
        "FROM orders GROUP BY o_orderstatus"
    )
    # ...synonymous agg words dedupe to one output column...
    assert _gen("sum and total totalprice") == (
        "SELECT SUM(o_totalprice) AS o_totalprice_sum FROM orders"
    )
    # ...and a stated sort this branch cannot render refuses
    assert _gen(
        "total and average totalprice per orderstatus sorted by total"
    ) == ""


def test_generator_stated_limit_is_honored():
    """A stated row cap renders on the fallback paths — 'limit 3' was
    previously dropped from the emitted SQL."""
    assert _gen("show orders sorted by totalprice descending limit 3") == (
        "SELECT * FROM orders ORDER BY o_totalprice DESC LIMIT 3"
    )
    assert _gen("first 5 customers") == "SELECT * FROM customer LIMIT 5"
    # review fix: a cap with a stated ranking the fallback did not
    # render refuses — LIMIT without ORDER BY is arbitrary rows
    # masquerading as the top N
    assert _gen("first 5 orders by totalprice") == ""


def test_generator_earliest_latest():
    """'earliest/latest <date col>' are MIN/MAX aggregates."""
    assert _gen_d("earliest orderdate in orders") == (
        "SELECT MIN(o_orderdate) AS o_orderdate_min FROM orders"
    )
    assert _gen_d("latest orderdate") == (
        "SELECT MAX(o_orderdate) AS o_orderdate_max FROM orders"
    )
    # review fix: a TABLE noun after earliest/latest is a listing
    # request, never MAX of a fuzzy-matched column
    assert _gen_d("show the latest orders") == "SELECT * FROM orders"


def test_generator_guard_refuses_unhonored_constraints():
    """The global refusal guard: a stated numeric comparison, LIKE
    filter, or row cap that NO branch parsed refuses the question —
    each of these previously returned unfiltered SQL that silently
    dropped the stated constraint."""
    # unresolvable comparison column -> no WHERE -> refuse
    assert _gen("orders where frobnication exceeds 1000") == ""
    # one of TWO stated comparisons parsed -> op count < cue count
    assert _gen(
        "orders where totalprice greater than 100 and frobnication less than 1"
    ) == ""
    # unresolvable contains -> no LIKE -> refuse
    assert _gen("customers whose frobnication contains 'x'") == ""
    # stated limit that no branch rendered -> refuse (the agg branch
    # never emits LIMIT)
    assert _gen("average totalprice of orders limit 3") == ""
    # ...but honored constraints pass through untouched
    assert _gen("top 5 orders by totalprice") == (
        "SELECT * FROM orders ORDER BY o_totalprice DESC LIMIT 5"
    )


def test_generator_count_superlative_t2_filter_in_on_clause():
    """Third review pass: a filter resolving to the JOINED side lives
    in the ON clause — in the WHERE it would null out exactly the
    zero-count rows the LEFT JOIN exists to keep reachable."""
    assert _gen(
        "which customer placed the fewest orders where orderstatus is F"
    ) == (
        "SELECT t1.c_custkey, t1.c_name, t1.c_mktsegment, "
        "COUNT(t2.o_custkey) AS n "
        "FROM customer t1 LEFT JOIN orders t2 "
        "ON t1.c_custkey = t2.o_custkey AND t2.o_orderstatus = 'F' "
        "GROUP BY t1.c_custkey, t1.c_name, t1.c_mktsegment "
        "ORDER BY n ASC LIMIT 1"
    )
    # mixed-side OR cannot split between ON and WHERE -> refuse
    assert _gen(
        "which customer placed the fewest orders "
        "where orderstatus is F or mktsegment is BUILDING"
    ) == ""


def test_generator_superlative_refuses_stated_sort_and_grouping():
    """Third review pass: a 1-row superlative answer refuses a stated
    sort (meaningless on LIMIT 1, and previously diverted into the agg
    loop as a nonsense fuzzy aggregate) and a stated grouping beyond
    the consumed 'by <col>'."""
    assert _gen("which customer placed the most orders sorted by name") == ""
    assert _gen("largest order by totalprice per orderstatus") == ""


def test_generator_guard_negation_and_year_cues():
    """Third review pass: the refusal guard catches 'does not equal' /
    '!=' negations and a stated 'in <year>' that no branch rendered."""
    assert _gen("orders where frobnication does not equal 5") == ""
    assert _gen("orders where frobnication != 7") == ""
    # a 'where <numeric-col> in <year>' stays a refusal (the filter
    # reading is the user's, the year never renders); after a SORT
    # cue the same words are a ranking + date filter and answer (R12)
    assert _gen_d("largest order where totalprice in 1995") == ""
    assert _gen_d("largest order by totalprice in 1995") == (
        "SELECT * FROM orders WHERE YEAR(o_orderdate) = 1995 "
        "ORDER BY o_totalprice DESC LIMIT 1"
    )
    # ...but a year the date grammar DID render passes through
    assert _gen_d("orders in 1995") == (
        "SELECT * FROM orders WHERE YEAR(o_orderdate) = 1995"
    )


def test_generator_count_superlative_date_filter_in_on_clause():
    """ADVICE r8: date conditions render wrapped (YEAR(t2.col)), so a
    startswith('t2.') side sniff routed them into WHERE, nulling the
    zero-count rows. They must land in the ON clause like every other
    joined-side condition."""
    sql = _gen_dated("which customer placed the fewest orders in 1995")
    assert "ON t1.c_custkey = t2.o_custkey AND YEAR(t2.o_orderdate) = 1995" in sql
    assert "WHERE" not in sql
    assert "LEFT JOIN" in sql and "ORDER BY n ASC LIMIT 1" in sql


def test_generator_guard_not_exists_does_not_satisfy_negation():
    """ADVICE r8: the NOT of NOT EXISTS must not satisfy a stated value
    negation — a dropped 'is not X' filter shipped silently whenever
    the question also had an existence constraint."""
    gen = t2s.RuleBasedGenerator()
    dropped = (
        "SELECT * FROM customer t1 WHERE NOT EXISTS "
        "(SELECT 1 FROM orders t2 WHERE t2.o_custkey = t1.c_custkey)"
    )
    assert gen._drops_stated_constraint(
        "customers without orders where mktsegment is not BUILDING", dropped
    )
    # carried negations still satisfy the guard, whatever their form
    for ok in (
        "SELECT * FROM customer WHERE c_mktsegment <> 'BUILDING'",
        "SELECT * FROM customer WHERE c_mktsegment != 'BUILDING'",
        "SELECT * FROM customer WHERE c_mktsegment NOT IN ('BUILDING')",
    ):
        assert not gen._drops_stated_constraint(
            "customers where mktsegment is not BUILDING", ok
        )
    # and the full path still renders the filter alongside NOT EXISTS
    out = _gen(
        "customers without orders where mktsegment is not BUILDING"
    )
    assert "t1.c_mktsegment <> 'BUILDING'" in out
    assert "NOT EXISTS" in out


# --- R9: multi-hop FK walks (VERDICT r8 ask #4) ----------------------------

_SCHEMA_FULL = (
    "CREATE TABLE region (r_regionkey number, r_name text)\n"
    "CREATE TABLE nation (n_nationkey number, n_name text, "
    "n_regionkey number)\n"
    "CREATE TABLE customer (c_custkey number, c_name text, "
    "c_nationkey number, c_acctbal number, c_mktsegment text)\n"
    "CREATE TABLE supplier (s_suppkey number, s_name text, "
    "s_nationkey number, s_acctbal number)\n"
    "CREATE TABLE part (p_partkey number, p_name text, p_brand text, "
    "p_retailprice number)\n"
    "CREATE TABLE orders (o_orderkey number, o_custkey number, "
    "o_orderstatus text, o_totalprice number, o_orderdate text)\n"
    "CREATE TABLE lineitem (l_orderkey number, l_partkey number, "
    "l_suppkey number, l_quantity number, l_extendedprice number)"
)


def _gen_full(question: str) -> str:
    return t2s.RuleBasedGenerator()(
        t2s.build_prompt(_SCHEMA_FULL, question)
    )


def test_generator_two_hop_group_by():
    """'revenue per nation name' walks orders->customer->nation on the
    stem-keyed FK graph (the reference's schema walk composed over two
    hops, mapping.py:140-149)."""
    assert _gen_full("total revenue per nation name") == (
        "SELECT t3.n_name, SUM(t1.o_totalprice) AS o_totalprice_sum "
        "FROM orders t1 JOIN customer t2 ON t1.o_custkey = t2.c_custkey "
        "JOIN nation t3 ON t2.c_nationkey = t3.n_nationkey "
        "GROUP BY t3.n_name"
    )
    assert _gen_full("number of customers per region name") == (
        "SELECT t3.r_name, COUNT(*) AS n FROM customer t1 "
        "JOIN nation t2 ON t1.c_nationkey = t2.n_nationkey "
        "JOIN region t3 ON t2.n_regionkey = t3.r_regionkey "
        "GROUP BY t3.r_name"
    )


def test_generator_two_hop_mid_table_filter_renders():
    """A stated filter resolving only in the MID table of the walk
    must render against its alias, not silently vanish (R9 — the
    cols3 scope)."""
    out = _gen_full(
        "total revenue per nation name where mktsegment is BUILDING"
    )
    assert "WHERE t2.c_mktsegment = 'BUILDING'" in out
    assert "JOIN nation t3" in out


def test_generator_two_hop_count_superlative_left_joins():
    """'which nation placed the most orders' counts through TWO LEFT
    JOINs (zero-count nations stay reachable); a counted-side filter
    lands in the LAST ON, a mid-side filter in the MID ON."""
    out = _gen_full("which nation placed the fewest orders in 1995")
    assert "LEFT JOIN customer t2 ON t1.n_nationkey = t2.c_nationkey" in out
    assert (
        "LEFT JOIN orders t3 ON t2.c_custkey = t3.o_custkey "
        "AND YEAR(t3.o_orderdate) = 1995" in out
    )
    assert "WHERE" not in out
    mid = _gen_full(
        "which nation placed the fewest orders where mktsegment is BUILDING"
    )
    assert (
        "LEFT JOIN customer t2 ON t1.n_nationkey = t2.c_nationkey "
        "AND t2.c_mktsegment = 'BUILDING'" in mid
    )


def test_generator_walk_direction_refusals():
    """Walks that rely on a key pun or exceed the bounded depth refuse
    instead of miscounting (R9 full-schema probe): the
    customer~supplier nationkey pair is a same-parent equi-join, not
    an FK. The FAN-OUT walks these asserts used to pin as refusals
    are now ANSWERED with the de-duplicated forms (R10, VERDICT r9
    #3) — see the fan-out tests below — and the region tier is now a
    unique THREE-hop walk (late R10)."""
    assert _gen_full("number of suppliers per customer name") == ""
    # no oriented walk exists customer -> part at any bounded depth
    assert _gen_full("count of customers per part name") == ""


def test_generator_three_hop_walks():
    """The region tier (late R10): 'orders per region name' is the
    unique oriented 3-hop orders->customer->nation->region; the count
    superlative walks it child-wise over LEFT JOINs; existence
    correlates all three hops inside the subquery; a mid-table filter
    resolves against its own alias (the cols4 scope)."""
    assert _gen_full("number of orders per region name") == (
        "SELECT t4.r_name, COUNT(*) AS n FROM orders t1 "
        "JOIN customer t2 ON t1.o_custkey = t2.c_custkey "
        "JOIN nation t3 ON t2.c_nationkey = t3.n_nationkey "
        "JOIN region t4 ON t3.n_regionkey = t4.r_regionkey "
        "GROUP BY t4.r_name"
    )
    out = _gen_full(
        "total revenue per region name where mktsegment is BUILDING"
    )
    assert "WHERE t2.c_mktsegment = 'BUILDING'" in out
    assert "JOIN region t4" in out
    sup = _gen_full("which region has the most orders")
    assert "LEFT JOIN nation t2" in sup
    assert "LEFT JOIN orders t4" in sup
    assert sup.endswith("ORDER BY n DESC LIMIT 1")
    ex = _gen_full("regions without orders")
    assert (
        "NOT EXISTS (SELECT 1 FROM nation t2 "
        "JOIN customer t3 ON t2.n_nationkey = t3.c_nationkey "
        "JOIN orders t4 ON t3.c_custkey = t4.o_custkey "
        "WHERE t2.n_regionkey = t1.r_regionkey)" in ex
    )
    # no oriented walk reaches part from customer at any depth
    assert _gen_full("count of customers per part name") == ""


def test_generator_ambiguous_two_hop_never_resolves_via_three_hop():
    """Two equally short relationships are ambiguous even when a
    longer detour is unique: a->b->d and a->c->d tie at depth 2, so
    the walk must refuse — NOT answer through the unique 3-hop
    a->e->f->d (R10 review: the first 3-hop implementation fell
    through)."""
    gen = t2s.RuleBasedGenerator()
    schema = (
        "CREATE TABLE visits (vi_id number, vi_storekey number, "
        "vi_clerkkey number, vi_promokey number, vi_val number)\n"
        "CREATE TABLE store (st_storekey number, st_citykey number)\n"
        "CREATE TABLE clerk (cl_clerkkey number, cl_citykey number)\n"
        "CREATE TABLE city (ci_citykey number, ci_name text)\n"
        "CREATE TABLE promo (pr_promokey number, pr_vendorkey number)\n"
        "CREATE TABLE vendor (v_vendorkey number, v_citykey number)"
    )
    assert gen(
        t2s.build_prompt(schema, "count of visits per city name")
    ) == ""
    # dropping one of the tied bridges makes the 2-hop unique again
    unambiguous = schema.replace(
        "CREATE TABLE clerk (cl_clerkkey number, cl_citykey number)\n", ""
    ).replace("vi_clerkkey number, ", "")
    out = gen(
        t2s.build_prompt(unambiguous, "count of visits per city name")
    )
    assert "JOIN store t2" in out and "JOIN city t3" in out


def test_generator_four_hop_walk_refuses():
    """Depth is bounded at three: on a pure 5-table chain the group
    four parents away refuses — a synthetic fixture, because on the
    TPC-H shape every 4-hop question has a shorter reading (R10
    review: the previous 'depth bound' assert was vacuously covered
    by a no-walk-exists case)."""
    gen = t2s.RuleBasedGenerator()
    schema = (
        "CREATE TABLE event (ev_id number, ev_userkey number, "
        "ev_val number)\n"
        "CREATE TABLE users (u_userkey number, u_teamkey number)\n"
        "CREATE TABLE team (tm_teamkey number, tm_orgkey number)\n"
        "CREATE TABLE org (og_orgkey number, og_zonekey number)\n"
        "CREATE TABLE zone (z_zonekey number, z_name text)"
    )
    assert gen(t2s.build_prompt(schema, "total val per zone name")) == ""
    # ...while the 3-hop prefix of the same chain answers
    assert "JOIN org t4" in gen(
        t2s.build_prompt(schema, "total val per org orgkey")
    )


def test_generator_fanout_count_distinct():
    """'count of orders per part name' rides the fanning lineitem
    bridge with COUNT(DISTINCT base key) — counting join rows would
    double-count multi-line orders (R10, VERDICT r9 #3; the R9 refusal
    upgraded to the correct answer)."""
    assert _gen_full("count of orders per part name") == (
        "SELECT t3.p_name, COUNT(DISTINCT t1.o_orderkey) AS n "
        "FROM orders t1 "
        "JOIN lineitem t2 ON t1.o_orderkey = t2.l_orderkey "
        "JOIN part t3 ON t2.l_partkey = t3.p_partkey "
        "GROUP BY t3.p_name"
    )
    # a base-side filter still renders in the WHERE
    out = _gen_full(
        "count of orders per part brand where orderstatus is F"
    )
    assert "COUNT(DISTINCT t1.o_orderkey)" in out
    assert "WHERE t1.o_orderstatus = 'F'" in out


def test_generator_fanout_sum_preaggregates():
    """SUM/AVG through the fan-out bridge first collapse the
    duplication with a DISTINCT (base_pk, group, metric) subquery —
    each order's totalprice counts once per part it reaches, not once
    per lineitem; MIN/MAX are duplicate-insensitive and keep the plain
    join (R10)."""
    assert _gen_full("total revenue per part name") == (
        "SELECT v.p_name, SUM(v.o_totalprice) AS o_totalprice_sum "
        "FROM (SELECT DISTINCT t1.o_orderkey, t3.p_name, t1.o_totalprice "
        "FROM orders t1 "
        "JOIN lineitem t2 ON t1.o_orderkey = t2.l_orderkey "
        "JOIN part t3 ON t2.l_partkey = t3.p_partkey) v "
        "GROUP BY v.p_name"
    )
    mn = _gen_full("min totalprice per part name")
    assert "SELECT DISTINCT" not in mn
    assert "MIN(t1.o_totalprice)" in mn


def test_generator_fanout_bare_revenue_implies_sum():
    """A bare mass-noun metric with a stated grouping implies SUM —
    'revenue per part name' previously fell through every aggregate
    branch and dumped SELECT * FROM part with the stated metric AND
    grouping silently dropped (R10 probe)."""
    out = _gen_full("revenue per part name")
    assert out.startswith("SELECT v.p_name, SUM(v.o_totalprice)")
    # ...but a sort mention alone must not imply aggregation
    assert _gen_full("revenue sorted by totalprice") == (
        "SELECT * FROM orders ORDER BY o_totalprice"
    )


def test_generator_fanout_superlative_counts_distinct():
    """'which part has the most orders' walks the fan-out bridge and
    ranks by COUNT(DISTINCT target key) — join-row counting would rank
    by lineitem count; LEFT JOINs keep zero-order parts reachable for
    'fewest' (R10; the R9 refusal upgraded)."""
    out = _gen_full("which part has the fewest orders in 1995")
    assert "COUNT(DISTINCT t3.o_orderkey) AS n" in out
    assert "LEFT JOIN lineitem t2 ON t1.p_partkey = t2.l_partkey" in out
    assert (
        "LEFT JOIN orders t3 ON t2.l_orderkey = t3.o_orderkey "
        "AND YEAR(t3.o_orderdate) = 1995" in out
    )
    assert out.endswith("ORDER BY n ASC LIMIT 1")


def test_generator_filter_side_resolution_is_tiered():
    """A filter mention owned by a JOINED walk table at tier 0 must
    not fuzzy-resolve against the base table first: 'retailprice over
    1500' on the orders->lineitem->part walk rendered
    t1.o_totalprice > 1500 before (R10 probe) — the stated column
    exists, two hops away."""
    out = _gen_full(
        "count of orders per part name where retailprice over 1500"
    )
    assert "WHERE t3.p_retailprice > 1500" in out
    # a mid-table filter keeps resolving against the bridge
    out = _gen_full(
        "count of orders per part name where quantity over 30"
    )
    assert "WHERE t2.l_quantity > 30" in out


def test_generator_disjunctive_grouping_refuses():
    """'per part name or orderstatus' is not expressible as a GROUP
    BY — every branch kept the first group and silently dropped the
    stated alternative (R10 probe); condition-level OR is unaffected."""
    assert _gen_full("count of orders per part name or orderstatus") == ""
    assert _gen_full(
        "count of orders per orderpriority or orderstatus"
    ) == ""
    assert _gen_full(
        "orders where orderstatus is F or orderstatus is O"
    ) == (
        "SELECT * FROM orders "
        "WHERE o_orderstatus = 'F' OR o_orderstatus = 'O'"
    )


def test_generator_vetoed_local_with_having_or_existence_refuses():
    """When a foreign owner outranks the local metric reading but
    HAVING/existence scope blocks the rebase, the question REFUSES
    instead of shipping the weaker local guess — 'revenue per part
    name having count over 5' summed p_retailprice (R10 review)."""
    assert _gen_full("revenue per part name having count over 5") == ""
    assert _gen_full("revenue per part name that have lineitems") == ""
    # a deterministic local reading keeps its HAVING branch
    out = _gen_full(
        "total totalprice per orderstatus having count over 100"
    )
    assert "HAVING COUNT(*) > 100" in out and "o_totalprice" in out


def test_generator_rebased_second_group_renders_or_refuses():
    """A stated second grouping on the REBASE path must render (in the
    metric owner) or refuse — it was silently dropped while the
    equivalent count question kept it (R10 review)."""
    out = _gen_full("total totalprice per part name and orderstatus")
    assert "v.o_orderstatus" in out
    assert "GROUP BY v.p_name, v.o_orderstatus" in out
    assert _gen_full(
        "total totalprice per part name and frobnication"
    ) == ""


def test_generator_disjunct_after_second_group_refuses():
    """'per A and B or C' escaped the narrow disjunctive guard and
    dropped the 'or C' alternative (R10 review)."""
    assert _gen_full(
        "count of orders per orderstatus and totalprice or orderdate"
    ) == ""


def test_generator_by_phrased_disjunct_refuses():
    """Bare 'by' is a grouping/ranking cue the branches consume, so a
    'by'-phrased disjunction must refuse like the 'per' form — and a
    disjunctive superlative target ('the most orders or lineitems')
    must refuse rather than keep the first word, now that the fan-out
    walk answers the conjunction-free form (R10 review, second pass)."""
    assert _gen_full("count of orders by part name or orderstatus") == ""
    assert _gen_full("which part has the most orders or lineitems") == ""
    assert _gen_full("top 3 orders by totalprice or quantity") == ""
    # the conjunction-free forms stay answered
    assert "COUNT(DISTINCT" in _gen_full("which part has the most orders")


def test_generator_rebase_prefers_more_confident_foreign_owner():
    """A non-deterministic LOCAL metric hit no longer blocks the
    rebase: on the part table 'revenue' hit p_retailprice through the
    generic 'price' synonym (tier 2) and self-grouped, while orders
    owns the stated metric at tier 1 (R10). A deterministic local
    column still wins outright."""
    out = _gen_full("total totalprice per part name")
    assert "SUM(v.o_totalprice)" in out  # fuzzy local lost to tier-0 foreign
    assert _gen_full("total retailprice per part name") == (
        "SELECT p_name, SUM(p_retailprice) AS p_retailprice_sum "
        "FROM part GROUP BY p_name"
    )


def test_generator_self_qualified_group_two_words():
    """'per part name' ON the part table groups by p_name — reading
    the table noun as a column grouped by p_partkey and silently
    dropped the stated 'name' (R9 probe)."""
    assert _gen_full("total retailprice per part name") == (
        "SELECT p_name, SUM(p_retailprice) AS p_retailprice_sum "
        "FROM part GROUP BY p_name"
    )


def test_generator_synonym_words_never_fuzzy_rank():
    """A word with a synonym entry whose synonyms all fail must not
    fall through to edit distance: 'top 3 nation name by revenue'
    ranked nations by n_nationkey before (R9 probe). R9 pinned it as
    a refusal; R11's ranked child walk ANSWERS it instead (the
    'top N <table> <col> by <metric>' shape — group by n_name, SUM
    the walked-to metric). A genuinely unresolvable metric still
    refuses rather than ranking by the first numeric column."""
    assert _gen_full("top 3 nation name by revenue") == (
        "SELECT t1.n_name, COALESCE(SUM(t3.o_totalprice), 0) "
        "AS o_totalprice_sum FROM nation t1 "
        "LEFT JOIN customer t2 ON t1.n_nationkey = t2.c_nationkey "
        "LEFT JOIN orders t3 ON t2.c_custkey = t3.o_custkey "
        "GROUP BY t1.n_name ORDER BY o_totalprice_sum DESC LIMIT 3"
    )
    assert _gen_full("top 3 nations by frobnication") == ""
    # the unranked default still works
    assert _gen_full("top 3 orders by totalprice") == (
        "SELECT * FROM orders ORDER BY o_totalprice DESC LIMIT 3"
    )


def test_generator_guard_equality_literal_cue():
    """The guard refuses any SQL that fails to carry a stated
    'is <LITERAL>' equality (R9 cue, the lockstep rule)."""
    gen = t2s.RuleBasedGenerator()
    assert gen._drops_stated_constraint(
        "revenue per nation name where mktsegment is BUILDING",
        "SELECT n_name, SUM(o_totalprice) FROM orders GROUP BY n_name",
    )
    assert not gen._drops_stated_constraint(
        "orders where orderstatus is F",
        "SELECT * FROM orders WHERE o_orderstatus = 'F'",
    )
    # aggregate keywords are not literals
    assert not gen._drops_stated_constraint(
        "what is MAX totalprice", "SELECT MAX(o_totalprice) FROM orders"
    )


def test_generator_r9_review_fixes():
    """Pinned repros of the R9 review findings: partsupp prefix must
    not pass the parent-ownership check (fan-out double-count);
    base-side OR in the FK-count superlative refuses instead of
    becoming a zero-row AND; 'is NOT <v>' passes the guard when the
    negation rendered; 'per order status' (singular table noun) groups
    by the column; quoted-numeric equality renders unquoted and still
    passes the guard."""
    gen = t2s.RuleBasedGenerator()
    ps = (
        "CREATE TABLE part (p_partkey number, p_retailprice number)\n"
        "CREATE TABLE partsupp (ps_partkey number, ps_availqty number)"
    )
    assert gen(t2s.build_prompt(ps, "total retailprice per availqty")) == ""
    assert _gen(
        "which customer placed the most orders "
        "where acctbal over 1000 or acctbal under 10"
    ) == ""
    assert _gen("orders where orderstatus is NOT F") == (
        "SELECT * FROM orders WHERE o_orderstatus <> 'F'"
    )
    assert _gen("total totalprice per order status") == (
        "SELECT o_orderstatus, SUM(o_totalprice) AS o_totalprice_sum "
        "FROM orders GROUP BY o_orderstatus"
    )
    assert _gen("orders where orderkey equals '5'") == (
        "SELECT * FROM orders WHERE o_orderkey = 5"
    )


def test_generator_two_hop_existence():
    """R9 late: existence constraints walk two hops in the counting
    direction — 'nations without orders' correlates through customer
    inside the subquery; an unreachable walk still refuses on the
    anti form rather than dropping the stated exclusion."""
    assert _gen_full("nations without orders") == (
        "SELECT * FROM nation t1 WHERE NOT EXISTS "
        "(SELECT 1 FROM customer t2 JOIN orders t3 "
        "ON t2.c_custkey = t3.o_custkey "
        "WHERE t2.c_nationkey = t1.n_nationkey)"
    )
    assert _gen_full("nations that have orders") == (
        "SELECT * FROM nation t1 WHERE EXISTS "
        "(SELECT 1 FROM customer t2 JOIN orders t3 "
        "ON t2.c_custkey = t3.o_custkey "
        "WHERE t2.c_nationkey = t1.n_nationkey)"
    )
    assert _gen_full("how many nations have no orders") == (
        "SELECT COUNT(*) AS n FROM nation t1 WHERE NOT EXISTS "
        "(SELECT 1 FROM customer t2 JOIN orders t3 "
        "ON t2.c_custkey = t3.o_custkey "
        "WHERE t2.c_nationkey = t1.n_nationkey)"
    )
    # 1-hop keeps its exact old rendering
    assert _gen_full("customers without orders") == (
        "SELECT * FROM customer t1 WHERE NOT EXISTS "
        "(SELECT 1 FROM orders t2 WHERE t2.o_custkey = t1.c_custkey)"
    )
    # no child walk from part to orders -> the stated exclusion refuses
    assert _gen_full("parts without orders") == ""


def test_generator_existence_both_walk_directions():
    """R9 review: EXISTS is a per-row boolean, so BOTH walk
    orientations are sound — 'orders without customers' (the orphan
    scan, parent direction) must keep working alongside the child-
    direction 'nations without orders'; a semi mention that resolves
    to a table with NO walk refuses rather than silently answering
    without the stated constraint."""
    assert _gen("orders without customers") == (
        "SELECT * FROM orders t1 WHERE NOT EXISTS "
        "(SELECT 1 FROM customer t2 WHERE t2.c_custkey = t1.o_custkey)"
    )
    assert _gen("orders that have customers") == (
        "SELECT * FROM orders t1 WHERE EXISTS "
        "(SELECT 1 FROM customer t2 WHERE t2.c_custkey = t1.o_custkey)"
    )
    assert _gen_full("parts that have orders") == ""
    assert _gen_full("parts without orders") == ""


# ---------------------------------------------------------------------------
# R11 (VERDICT r10 #1): ranked groups and grouped superlatives composed
# with the rebase/walk machinery — the judge-probe shapes that refused
# in r10 while their plain-aggregate twins answered
# ---------------------------------------------------------------------------

_NATION_REV_JOINS = (
    "FROM nation t1 "
    "LEFT JOIN customer t2 ON t1.n_nationkey = t2.c_nationkey "
    "LEFT JOIN orders t3 ON t2.c_custkey = t3.o_custkey "
)
_NATION_COLS = "t1.n_nationkey, t1.n_name, t1.n_regionkey"


def test_generator_ranked_child_walk_bare_table():
    """'top 3 nations by revenue': the group names the base TABLE and
    the metric lives in orders — base rows rank by the SUM of the
    walked-to metric over LEFT JOINs (zero-order nations rank with 0,
    COALESCE removes the Spark/DuckDB NULL-order divergence)."""
    assert _gen_full("top 3 nations by revenue") == (
        f"SELECT {_NATION_COLS}, "
        "COALESCE(SUM(t3.o_totalprice), 0) AS o_totalprice_sum "
        f"{_NATION_REV_JOINS}"
        f"GROUP BY {_NATION_COLS} "
        "ORDER BY o_totalprice_sum DESC LIMIT 3"
    )
    # bottom-N takes the ASC mirror
    assert _gen_full("bottom 2 nations by revenue").endswith(
        "ORDER BY o_totalprice_sum ASC LIMIT 2"
    )


def test_generator_ranked_child_walk_group_column():
    """'top 5 nation names by total revenue': the two-word group form
    pins the stated base column; an explicit aggregate word is honored
    ('average' -> AVG with the empty-group HAVING guard)."""
    assert _gen_full("top 5 nation names by total revenue") == (
        "SELECT t1.n_name, "
        "COALESCE(SUM(t3.o_totalprice), 0) AS o_totalprice_sum "
        f"{_NATION_REV_JOINS}"
        "GROUP BY t1.n_name ORDER BY o_totalprice_sum DESC LIMIT 5"
    )
    assert _gen_full("top 5 nation names by average revenue") == (
        "SELECT t1.n_name, AVG(t3.o_totalprice) AS o_totalprice_avg "
        f"{_NATION_REV_JOINS}"
        "GROUP BY t1.n_name HAVING COUNT(t3.o_totalprice) > 0 "
        "ORDER BY o_totalprice_avg DESC LIMIT 5"
    )


def test_generator_ranked_child_walk_local_preference():
    """A metric the base table owns at least as confidently stays the
    LOCAL reading: 'top 5 orders by totalprice' ranks raw rows, 'top 3
    orders by revenue' resolves the synonym locally — neither walks."""
    assert _gen_full("top 5 orders by totalprice") == (
        "SELECT * FROM orders ORDER BY o_totalprice DESC LIMIT 5"
    )
    assert _gen_full("top 3 orders by revenue") == (
        "SELECT * FROM orders ORDER BY o_totalprice DESC LIMIT 3"
    )


def test_generator_ranked_child_walk_refusals():
    """The shape refuses what it cannot honor: a stated sort beyond
    the consumed 'by <metric>' would be silently dropped by the
    ranked answer; a stated group column that resolves nowhere must
    not fall back to the all-columns form. (The 'per region name'
    second grouping ANSWERS since R14 — see the partitioned-ranking
    tests below.)"""
    assert _gen_full("top 3 nations by revenue sorted by name") == ""
    assert _gen_full("top 3 nation frobnicate by revenue") == ""


def test_generator_ranked_child_walk_partitioned():
    """R14 (VERDICT r13 #3, the top remaining refusal family): 'top 3
    nations by revenue per region name' ranks WITHIN each region —
    the parent-direction walk (nation -> region) supplies the
    partition, ROW_NUMBER caps each partition at the stated N, and
    the window tie-breaks on the group columns so the surviving rows
    are deterministic on every engine. A bare 'per region' partitions
    by the walk's landing key; the stated-base-column and count-walk
    variants compose."""
    inner = (
        "SELECT t4.r_name AS r_name, t1.n_nationkey, t1.n_name, "
        "t1.n_regionkey, "
        "COALESCE(SUM(t3.o_totalprice), 0) AS o_totalprice_sum, "
        "ROW_NUMBER() OVER (PARTITION BY t4.r_name "
        "ORDER BY COALESCE(SUM(t3.o_totalprice), 0) DESC, "
        "t1.n_nationkey, t1.n_name, t1.n_regionkey) AS rk "
        "FROM nation t1 "
        "LEFT JOIN customer t2 ON t1.n_nationkey = t2.c_nationkey "
        "LEFT JOIN orders t3 ON t2.c_custkey = t3.o_custkey "
        "JOIN region t4 ON t1.n_regionkey = t4.r_regionkey "
        "GROUP BY t4.r_name, t1.n_nationkey, t1.n_name, t1.n_regionkey"
    )
    assert _gen_full("top 3 nations by revenue per region name") == (
        "SELECT r_name, n_nationkey, n_name, n_regionkey, "
        f"o_totalprice_sum FROM ({inner}) ranked "
        "WHERE rk <= 3 ORDER BY r_name, rk"
    )
    # bare 'per region' partitions by the landing key
    out = _gen_full("top 3 nations by revenue per region")
    assert "PARTITION BY t4.r_regionkey" in out
    assert out.startswith("SELECT r_regionkey, n_nationkey")
    # bottom-N flips the window direction
    assert "ORDER BY COALESCE(SUM(t3.o_totalprice), 0) ASC" in _gen_full(
        "bottom 2 nations by revenue per region name"
    )
    # the count-walk twin ('by number of customers') partitions too
    out = _gen_full("top 2 nations by number of customers per region name")
    assert "COUNT(t2.c_nationkey) AS n" in out and "WHERE rk <= 2" in out
    # stated base column keeps the two-word group form
    out = _gen_full("top 2 nation names by revenue per region name")
    assert out.startswith("SELECT r_name, n_name, o_totalprice_sum")
    # a stated filter still classifies into the metric walk's ON side
    out = _gen_full(
        "top 3 nations by revenue per region name "
        "where mktsegment is BUILDING"
    )
    assert "t2.c_mktsegment = 'BUILDING'" in out


def test_generator_ranked_child_walk_partition_refusals():
    """The per-mention keeps the guard in lockstep: a partition that
    resolves to neither a parent table nor a base column refuses WITH
    a named reason; a child-direction mention (region rows fan into
    nations — no single partition value per row) refuses; 'grouped
    by' and double-'by' phrasings stay refused."""
    gen = t2s.RuleBasedGenerator()
    assert gen(t2s.build_prompt(
        _SCHEMA_FULL, "top 3 nations by revenue per widget"
    )) == ""
    assert "per widget" in gen.last_refusal_reason
    assert gen(t2s.build_prompt(
        _SCHEMA_FULL, "top 3 regions by revenue per nation name"
    )) == ""
    assert "parent-direction" in gen.last_refusal_reason
    assert _gen_full("top 3 nations by revenue grouped by region") == ""
    assert _gen_full("top 3 nations by revenue by region") == ""
    # a stated partition column that does not resolve in the parent
    assert gen(t2s.build_prompt(
        _SCHEMA_FULL, "top 3 nations by revenue per region frobnicate"
    )) == ""
    assert "frobnicate" in gen.last_refusal_reason
    # R14 second review pass: a SECOND per-family mention would be
    # silently dropped (the partition consumes only the first) —
    # refuse with the named reason, across all three per-family forms
    for second in ("per mktsegment", "for each mktsegment",
                   "in each mktsegment"):
        assert gen(t2s.build_prompt(
            _SCHEMA_FULL,
            f"top 3 nations by revenue per region name {second}",
        )) == ""
        assert "two stated groupings" in gen.last_refusal_reason
    # ...and the branch refusals carry specific reasons now
    assert gen(t2s.build_prompt(
        _SCHEMA_FULL, "top 3 nations by revenue sorted by name"
    )) == ""
    assert "silently dropped" in gen.last_refusal_reason
    assert gen(t2s.build_prompt(
        _SCHEMA_FULL,
        "top 3 nations by revenue per region name "
        "where mktsegment is BUILDING or AUTOMOBILE",
    )) == ""
    assert "ON/WHERE" in gen.last_refusal_reason


def test_generator_row_rank_partitioned_local():
    """R14 second pass: 'top N <rows> by <col> per <dim>' previously
    shipped the GLOBAL LIMIT N with the stated per-grouping silently
    dropped. It now ranks within each partition: a LOCAL dim needs no
    join; a parent-table mention joins the parent walk and emits the
    partition column first; refusals stay in lockstep (unresolvable
    partition, two per-mentions, existence constraints)."""
    out = _gen_full("top 5 orders by totalprice per orderstatus")
    assert "PARTITION BY t1.o_orderstatus" in out
    assert "WHERE rk <= 5" in out and "ORDER BY o_orderstatus, rk" in out
    out = _gen_full("bottom 2 orders by totalprice per orderstatus")
    assert "ORDER BY t1.o_totalprice ASC" in out and "rk <= 2" in out
    out = _gen_full("top 2 customers by acctbal per nation name")
    assert out.startswith("SELECT n_name, c_custkey")
    assert "JOIN nation t2 ON t1.c_nationkey = t2.n_nationkey" in out
    # plain rankings are untouched
    assert _gen_full("top 5 orders by totalprice") == (
        "SELECT * FROM orders ORDER BY o_totalprice DESC LIMIT 5"
    )
    gen = t2s.RuleBasedGenerator()
    assert gen(t2s.build_prompt(
        _SCHEMA_FULL, "top 5 orders by totalprice per widget"
    )) == ""
    assert "per widget" in gen.last_refusal_reason
    assert gen(t2s.build_prompt(
        _SCHEMA_FULL,
        "top 5 orders by totalprice per orderstatus per orderpriority",
    )) == ""
    assert "two stated groupings" in gen.last_refusal_reason


def test_generator_table_subject_superlative_per_rewrite():
    """R14 second pass: a which/what TABLE-subject superlative WITH a
    per-grouping previously fell through to the aggregate branch and
    shipped the grouped aggregate with the subject and superlative
    silently dropped ('which nation has the highest total revenue per
    region name' answered as revenue per n_regionkey). It rewrites
    once into the ranked form — the partitioned LIMIT-1 twin."""
    out = _gen_full(
        "which nation has the highest total revenue per region name"
    )
    assert "PARTITION BY t4.r_name" in out and "WHERE rk <= 1" in out
    assert "COALESCE(SUM(t3.o_totalprice), 0)" in out
    # lowest flips the window direction
    out = _gen_full(
        "which nation has the lowest total revenue per region name"
    )
    assert "ORDER BY COALESCE(SUM(t3.o_totalprice), 0) ASC" in out
    # 'most <table>' becomes the count form
    out = _gen_full("which nation has the most customers per region name")
    assert "COUNT(t2.c_nationkey) AS n" in out and "WHERE rk <= 1" in out
    # local metric: the row-rank partitioned path answers
    out = _gen_full("which customer has the highest acctbal per nation name")
    assert "PARTITION BY t2.n_name" in out and "rk <= 1" in out
    # metric-subject superlatives keep the grouped-MAX reading
    out = _gen_full("the largest totalprice per orderstatus")
    assert "MAX(o_totalprice)" in out and "GROUP BY o_orderstatus" in out


def test_generator_ranked_child_walk_partitioned_duckdb():
    """The partitioned ranking executes and matches an independently
    written oracle on the sf0.001 parquet (per-region top-2 nations
    by summed order totalprice, zero-order nations COALESCEd to 0)."""
    import duckdb

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    got = con.execute(
        _gen_full("top 2 nations by revenue per region name")
    ).fetchall()
    want = con.execute("""
        SELECT r_name, n_nationkey, n_name, n_regionkey,
               o_totalprice_sum FROM (
          SELECT r.r_name, n.n_nationkey, n.n_name, n.n_regionkey,
                 COALESCE(SUM(o.o_totalprice), 0) AS o_totalprice_sum,
                 ROW_NUMBER() OVER (PARTITION BY r.r_name
                   ORDER BY COALESCE(SUM(o.o_totalprice), 0) DESC,
                            n.n_nationkey) AS rk
          FROM nation n
          JOIN region r ON n.n_regionkey = r.r_regionkey
          LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
          LEFT JOIN orders o ON o.o_custkey = c.c_custkey
          GROUP BY r.r_name, n.n_nationkey, n.n_name, n.n_regionkey
        ) t WHERE rk <= 2 ORDER BY r_name, rk
    """).fetchall()
    assert len(got) == 10 and got == want


def test_generator_ranked_child_walk_partitioned_spark(spark):
    """The partitioned-ranking SQL shape (window over a grouped
    subquery, rk filter in the outer WHERE) executes through the real
    Q2 path on Spark and keeps exactly N rows per partition."""
    out = t2s.process_query(
        spark, SF_SMOKE, "top 2 nations by revenue per region name",
        tables=["region", "nation", "customer", "orders"],
    )
    rows = out.collect()
    assert len(rows) == 10  # 5 regions x top 2
    per = {}
    for r in rows:
        per.setdefault(r.r_name, []).append(r.o_totalprice_sum)
    assert all(len(v) == 2 and v[0] >= v[1] for v in per.values())


def test_generator_grouped_superlative_foreign_metric():
    """'which nation has the highest total revenue' (refused in r10,
    judge probe): the superlative target is a foreign METRIC — base
    rows rank by its SUM through the child walk, LIMIT 1 keeps the
    winning row; 'lowest' flips to ASC where COALESCE makes the
    zero-order nation the deterministic floor."""
    assert _gen_full("which nation has the highest total revenue") == (
        f"SELECT {_NATION_COLS}, "
        "COALESCE(SUM(t3.o_totalprice), 0) AS o_totalprice_sum "
        f"{_NATION_REV_JOINS}"
        f"GROUP BY {_NATION_COLS} "
        "ORDER BY o_totalprice_sum DESC LIMIT 1"
    )
    assert _gen_full("which nation has the lowest total revenue").endswith(
        "ORDER BY o_totalprice_sum ASC LIMIT 1"
    )
    # a stated AVG drops empty groups instead of coalescing to a wrong 0
    assert _gen_full(
        "which nation has the highest average revenue"
    ) == (
        f"SELECT {_NATION_COLS}, "
        "AVG(t3.o_totalprice) AS o_totalprice_avg "
        f"{_NATION_REV_JOINS}"
        f"GROUP BY {_NATION_COLS} "
        "HAVING COUNT(t3.o_totalprice) > 0 "
        "ORDER BY o_totalprice_avg DESC LIMIT 1"
    )
    # bare mass-noun metric implies SUM, one hop
    assert _gen_full("which customer has the highest revenue") == (
        "SELECT t1.c_custkey, t1.c_name, t1.c_nationkey, t1.c_acctbal, "
        "t1.c_mktsegment, "
        "COALESCE(SUM(t2.o_totalprice), 0) AS o_totalprice_sum "
        "FROM customer t1 "
        "LEFT JOIN orders t2 ON t1.c_custkey = t2.o_custkey "
        "GROUP BY t1.c_custkey, t1.c_name, t1.c_nationkey, t1.c_acctbal, "
        "t1.c_mktsegment "
        "ORDER BY o_totalprice_sum DESC LIMIT 1"
    )


def test_generator_grouped_superlative_local_and_count_twins():
    """The twins keep their old readings: a locally-owned metric stays
    the ROW answer ('total price' is each order's own column), and the
    FK-count superlative is untouched by the metric extension."""
    assert _gen_full("which order has the highest total price") == (
        "SELECT * FROM orders ORDER BY o_totalprice DESC LIMIT 1"
    )
    out = _gen_full("which region has the most orders")
    assert "COUNT(t4.o_custkey) AS n" in out
    assert out.endswith("ORDER BY n DESC LIMIT 1")


def test_generator_count_per_group_table():
    """'how many customers are in each region' (refused in r10, judge
    probe): the stated group names a TABLE — the count walks FROM the
    group table in the child direction with LEFT JOINs, so regions
    with zero customers report 0 instead of vanishing."""
    assert _gen_full("how many customers are in each region") == (
        "SELECT t1.r_regionkey, t1.r_name, "
        "COUNT(t3.c_nationkey) AS n "
        "FROM region t1 "
        "LEFT JOIN nation t2 ON t1.r_regionkey = t2.n_regionkey "
        "LEFT JOIN customer t3 ON t2.n_nationkey = t3.c_nationkey "
        "GROUP BY t1.r_regionkey, t1.r_name"
    )
    # same walk under the 'count of ... per <table>' phrasing
    assert _gen_full("count of customers per region") == _gen_full(
        "how many customers are in each region"
    )
    # a stated sort resolves against the count alias or a group column
    assert _gen_full(
        "how many customers are in each region sorted by count descending"
    ).endswith("GROUP BY t1.r_regionkey, t1.r_name ORDER BY n DESC")
    assert _gen_full(
        "how many customers are in each region sorted by frobnicate"
    ) == ""


def test_generator_count_per_group_table_fanout():
    """When only the fan-out bridge reaches the base table the count
    goes DISTINCT: 'how many orders are in each part' rides
    part -> lineitem -> orders, and an order with three lineitems of
    one part must count once for it."""
    out = _gen_full("how many orders are in each part")
    assert "COUNT(DISTINCT t3.o_orderkey) AS n" in out
    assert "LEFT JOIN lineitem t2 ON t1.p_partkey = t2.l_partkey" in out
    assert "LEFT JOIN orders t3 ON t2.l_orderkey = t3.o_orderkey" in out


def test_generator_value_charset_symbol_literals():
    """ADVICE r10 #3's family: TPC-H-style literals ('Clerk#000000951')
    died at the '#' under the old [\\w-]+ value pattern, so the
    condition never parsed AND the literal guard missed the mixed-case
    token — the question shipped UNFILTERED. Both parsers now carry
    the token whole."""
    clerk_schema = (
        "CREATE TABLE orders (o_orderkey number, o_orderstatus text, "
        "o_totalprice number, o_clerk text)"
    )

    def _gen_c(question):
        return t2s.RuleBasedGenerator()(
            t2s.build_prompt(clerk_schema, question)
        )

    assert _gen_c("orders where clerk is Clerk#000000951") == (
        "SELECT * FROM orders WHERE o_clerk = 'Clerk#000000951'"
    )
    assert _gen_c("orders where clerk is not Clerk#000000951") == (
        "SELECT * FROM orders WHERE o_clerk <> 'Clerk#000000951'"
    )
    # the guard cue alone (lockstep): a future branch that drops such
    # a literal refuses instead of shipping unfiltered SQL
    gen = t2s.RuleBasedGenerator()
    assert gen._drops_stated_constraint(
        "orders where clerk is Clerk#000000951", "SELECT * FROM orders"
    )
    assert gen._drops_stated_constraint(
        "orders where priority is 1-URGENT", "SELECT * FROM orders"
    )


def test_generator_or_parity_guard():
    """R11: a stated 'or' the SQL does not carry is a dropped
    alternative — 'clerk is A or B' previously rendered only
    clerk = 'A' and 'in 1995 or 1996' only the first year. Multi-
    condition ORs that DO render keep answering, and an 'or' inside a
    quoted value is not a connective."""
    assert _gen_full(
        "average totalprice per orderstatus where clerk is A or B"
    ) == ""
    # R11 follow-up: a same-column VALUE disjunction is unambiguous and
    # now ANSWERS as an OR list instead of refusing (r11 pinned this as
    # a refusal when the or-parity guard first landed)
    assert _gen_full("count of orders per orderstatus in 1995 or 1996") == (
        "SELECT o_orderstatus, COUNT(*) AS n FROM orders "
        "WHERE (YEAR(o_orderdate) = 1995 OR YEAR(o_orderdate) = 1996) "
        "GROUP BY o_orderstatus"
    )
    assert _gen_full(
        "show orders where totalprice over 100 or totalprice under 10"
    ) == (
        "SELECT * FROM orders "
        "WHERE o_totalprice > 100 OR o_totalprice < 10"
    )
    gen = t2s.RuleBasedGenerator()
    assert not gen._drops_stated_constraint(
        "orders where comment contains 'red or blue'",
        "SELECT * FROM orders WHERE o_comment LIKE '%red or blue%'",
    )


def test_generator_top_n_limit_guard_lockstep():
    """R11 lockstep: 'top/bottom N' joined the LIMIT cue list — a
    HAVING question skips the top-N branch, and the grouped count it
    falls into previously shipped with the stated cap silently
    dropped."""
    assert _gen_full(
        "top 3 orderstatus by count having count over 5"
    ) == ""
    gen = t2s.RuleBasedGenerator()
    assert gen._drops_stated_constraint(
        "top 3 orderstatus by count",
        "SELECT o_orderstatus, COUNT(*) AS n FROM orders "
        "GROUP BY o_orderstatus",
    )


def test_generator_disjunction_guard_anchors_to_group_nouns():
    """ADVICE r10 #2: the disjunctive-grouping guard must not read an
    'or' that belongs to an adjacent CONDITION as a group disjunction
    — a filter keyword between the cue and the 'or' breaks the window.
    True group disjunctions still refuse."""
    # 'where' right after the group word: the or belongs to the filter
    # (and the or-parity guard owns whether it rendered)
    prio_schema = (
        "CREATE TABLE orders (o_orderkey number, o_orderstatus text, "
        "o_orderpriority text, o_totalprice number)"
    )
    assert t2s.RuleBasedGenerator()(
        t2s.build_prompt(
            prio_schema,
            "count of orders per orderstatus where orderpriority is "
            "1-URGENT or orderstatus is F",
        )
    ) == (
        "SELECT o_orderstatus, COUNT(*) AS n FROM orders "
        "WHERE o_orderpriority = '1-URGENT' OR o_orderstatus = 'F' "
        "GROUP BY o_orderstatus"
    )
    assert _gen_full("count of orders per orderstatus or clerk") == ""
    assert _gen_full("count of orders by orderstatus or clerk") == ""


def test_generator_superlative_metric_year_filter_in_on_clause():
    """'which nation has the highest total revenue in 1995': the year
    condition classifies to the orders side and lives in ITS join's ON
    clause (the zero-match rule), and the year-parser's numeric guard
    is tier-0 only — 'revenue' resolving via a SYNONYM must not block
    the temporal reading (R11; the question refused through the
    in-<year> lockstep cue before)."""
    out = _gen_full("which nation has the highest total revenue in 1995")
    assert "AND YEAR(t3.o_orderdate) = 1995" in out
    assert out.endswith("ORDER BY o_totalprice_sum DESC LIMIT 1")
    # a deterministic numeric column before the year still stays out
    # of the date grammar (and the lockstep cue refuses the question)
    assert _gen_full("orders where totalprice in 1995") == ""


def test_generator_review_catches_r11_batch():
    """Pins for the r11 review findings on the ranked/superlative
    child-walk batch."""
    # 1. a sentence period is punctuation, not part of the literal —
    # 'F.' would match zero rows; the unparsed condition refuses
    assert _gen_full(
        "show orders where orderstatus is F. sorted by totalprice descending"
    ) == ""
    # 2. capitalized English aggregate words are prose, not literals
    assert _gen_full("what is Average totalprice") == (
        "SELECT AVG(o_totalprice) AS o_totalprice_avg FROM orders"
    )
    assert _gen_full("what is Total revenue per nation name") == (
        "SELECT t3.n_name, SUM(t1.o_totalprice) AS o_totalprice_sum "
        "FROM orders t1 JOIN customer t2 ON t1.o_custkey = t2.c_custkey "
        "JOIN nation t3 ON t2.c_nationkey = t3.n_nationkey "
        "GROUP BY t3.n_name"
    )
    # 3. a real foreign column name under a bare superlative is NOT an
    # implied SUM ('highest quantity' plausibly means the max value) —
    # refuse; an explicit aggregate word states the intent and walks
    assert _gen_full("which nation has the highest quantity") == ""
    out = _gen_full("which nation has the highest total quantity")
    assert "COALESCE(SUM(" in out and "l_quantity" in out
    # 4. a second bare 'by' is a grouping this ranked answer would drop
    assert _gen_full("top 3 nations by revenue by region") == ""
    # 5. an uppercase OR inside a quoted SQL literal is not a connective
    gen = t2s.RuleBasedGenerator()
    assert gen._drops_stated_constraint(
        "orders where comment contains 'P OR F' and clerk is A or B",
        "SELECT * FROM orders WHERE o_comment LIKE '%P OR F%' "
        "AND o_clerk = 'A'",
    )


# ---------------------------------------------------------------------------
# R11 follow-up batch: value disjunctions answer, ranked count walks,
# 'does each' count phrasing, numeric-type literal guard
# ---------------------------------------------------------------------------


def test_generator_value_disjunction_answers():
    """A same-column value disjunction is unambiguous — it renders as
    an OR list instead of refusing ('orderstatus is F or P', 'in 1995
    or 1996', 'in march or april'). A disjunct followed by a
    comparator keyword is a NEW condition's column, not a value."""
    assert _gen_full("orders where orderstatus is F or P") == (
        "SELECT * FROM orders "
        "WHERE (o_orderstatus = 'F' OR o_orderstatus = 'P')"
    )
    assert _gen_full("orders in 1995 or 1996") == (
        "SELECT * FROM orders "
        "WHERE (YEAR(o_orderdate) = 1995 OR YEAR(o_orderdate) = 1996)"
    )
    assert _gen_full("orders in march or april") == (
        "SELECT * FROM orders "
        "WHERE (MONTH(o_orderdate) = 3 OR MONTH(o_orderdate) = 4)"
    )
    assert _gen_full(
        "orders where orderstatus is F or totalprice over 100"
    ) == ("SELECT * FROM orders WHERE o_orderstatus = 'F' OR o_totalprice > 100")


def test_generator_ranked_count_walk():
    """'top N <table> by number/count of <other>' — the FK-count
    superlative at LIMIT N; the bare-table shorthand reads the same;
    a fan-out bridge counts DISTINCT; an unreachable stated count
    target refuses."""
    out = _gen_full("top 3 nations by number of orders")
    assert "COUNT(t3.o_custkey) AS n" in out
    assert out.endswith("ORDER BY n DESC LIMIT 3")
    assert _gen_full("top 3 nations by orders") == out
    assert _gen_full("top 3 nation names by count of orders").startswith(
        "SELECT t1.n_name, COUNT(t3.o_custkey) AS n "
    )
    fan = _gen_full("top 3 parts by number of orders")
    assert "COUNT(DISTINCT t3.o_orderkey) AS n" in fan
    assert _gen_full("bottom 2 nations by number of orders").endswith(
        "ORDER BY n ASC LIMIT 2"
    )
    # lineitem IS reachable (nation -> supplier -> lineitem, the
    # supplier-side walk); part is reachable by NO oriented walk from
    # nation (3 child hops exceed none, the fan-out bridge has no
    # edge) -> the stated count target refuses
    assert _gen_full("top 3 nations by number of lineitems").startswith(
        "SELECT t1.n_nationkey, t1.n_name, t1.n_regionkey, "
        "COUNT(t3.l_suppkey) AS n FROM nation t1 "
        "LEFT JOIN supplier t2 ON t1.n_nationkey = t2.s_nationkey "
        "LEFT JOIN lineitem t3 ON t2.s_suppkey = t3.l_suppkey "
    )
    assert _gen_full("top 3 nations by number of parts") == ""


def test_generator_does_each_count_phrasing():
    """'how many X does each Y have' is the count-per-group-table
    shape: the walk runs FROM the group table with LEFT JOINs and the
    trailing verb never reads as a column."""
    out = _gen_full("how many orders does each customer have")
    assert out.startswith("SELECT t1.c_custkey, ")
    assert "COUNT(t2.o_custkey) AS n" in out
    assert "LEFT JOIN orders t2 ON t1.c_custkey = t2.o_custkey" in out
    # the disjunctive form stays refused (the alternative would drop)
    assert _gen_full(
        "how many orders does each customer or supplier have"
    ) == ""


def test_generator_numeric_column_string_literal_refuses():
    """A non-numeric literal against a NUMBER column is a
    mis-resolution — 'priority is 1-URGENT' fuzzy-hit o_shippriority
    (number) and shipped an equality that matches nothing; the span
    now stays unclaimed and the literal guard refuses. Exact mentions
    and numeric values keep answering."""
    clerk_schema = (
        "CREATE TABLE orders (o_orderkey number, o_orderstatus text, "
        "o_orderpriority text, o_shippriority number)"
    )

    def _gen_c(question):
        return t2s.RuleBasedGenerator()(
            t2s.build_prompt(clerk_schema, question)
        )

    assert _gen_c("orders where priority is 1-URGENT") == ""
    assert _gen_c("orders where orderpriority is 1-URGENT") == (
        "SELECT * FROM orders WHERE o_orderpriority = '1-URGENT'"
    )
    assert _gen_c("orders where shippriority is 1") == (
        "SELECT * FROM orders WHERE o_shippriority = 1"
    )
    assert _gen_c("orders where shippriority is not 1") == (
        "SELECT * FROM orders WHERE o_shippriority <> 1"
    )


def test_generator_review_catches_r11_followup():
    """Pins for the review findings on the disjunction/count-walk
    batch."""
    # 1. a disjunct that is a COLUMN mention starts a new condition —
    # the main equality claims alone and the 'or' becomes the
    # connective; an unparseable tail still refuses via or-parity
    assert _gen_full(
        "orders where orderstatus is F or orderdate in 1995"
    ) == (
        "SELECT * FROM orders "
        "WHERE o_orderstatus = 'F' OR YEAR(o_orderdate) = 1995"
    )
    assert _gen_full("orders where orderstatus is F or clerk like Bob") == ""
    # ...with a length floor: 1-2 char VALUES never read as columns
    assert _gen_full("orders where orderstatus is F or P") != ""
    # 2. 'top N <base-table> by count of <other>' reaches the count
    # walk instead of a degenerate local COUNT(*) per fuzzy key, and
    # the agg twin walks instead of refusing
    assert _gen_full("top 3 nations by count of orders") == _gen_full(
        "top 3 nations by number of orders"
    )
    out = _gen_full("top 3 nations by average revenue")
    assert "AVG(t3.o_totalprice)" in out and out.endswith("LIMIT 3")
    # 'count of <base-table>' stays the local row count; a trailing
    # non-'of' word is not a count target
    assert _gen_full("top 3 orderstatus by count of orders").startswith(
        "SELECT o_orderstatus, COUNT(*) AS n "
    )
    # 3. a superlative target naming the BASE table itself refuses —
    # on a schema with no region table, 'which region has the most
    # orders' resolved base=orders and fuzzy-ranked by o_orderstatus
    s4 = (
        "CREATE TABLE customer (c_custkey number, c_name text)\n"
        "CREATE TABLE orders (o_orderkey number, o_custkey number, "
        "o_orderstatus text, o_totalprice number)"
    )
    gen = t2s.RuleBasedGenerator()
    assert gen(t2s.build_prompt(s4, "which region has the most orders")) == ""
    assert gen(
        t2s.build_prompt(s4, "which customer has the most orders")
    ) != ""


def test_generator_bare_agg_having_binds_branch_metric():
    """'having sum over N' without restating the column binds to the
    aggregate branch's own metric; the count paths have no metric to
    bind and refuse; a STATED having column that resolves nowhere
    still refuses."""
    assert _gen_full(
        "total totalprice per orderstatus having sum over 100000000"
    ) == (
        "SELECT o_orderstatus, SUM(o_totalprice) AS o_totalprice_sum "
        "FROM orders GROUP BY o_orderstatus "
        "HAVING SUM(o_totalprice) > 100000000"
    )
    assert _gen_full(
        "count of orders per orderstatus having sum over 1000"
    ) == ""
    assert _gen_full(
        "total totalprice per orderstatus having sum of frobnicate over 5"
    ) == ""


# ---------------------------------------------------------------------------
# R11 paraphrase-battery batch: of-each normalization, bare grouped
# counts, cost adjectives, trailing-superlative cue, grouped-count
# superlative
# ---------------------------------------------------------------------------


def test_generator_of_each_normalizes_to_per():
    """'of each <group>' is the same cue as 'per' — 'total revenue of
    each nation' previously fell through every grouping regex, and
    the bare-metric form shipped SELECT * with the grouping dropped."""
    assert _gen_full("total revenue of each nation") == _gen_full(
        "total revenue per nation"
    )
    assert _gen_full("revenue of each nation") != ""
    assert "SUM" in _gen_full("revenue of each nation")


def test_generator_bare_rows_per_group_counts():
    """'<rows> per <group>' with no aggregate or count word reads as
    the grouped COUNT — 'orders per nation' and 'customers per
    mktsegment' shipped SELECT * with the stated grouping silently
    dropped before."""
    assert _gen_full("customers per mktsegment") == (
        "SELECT c_mktsegment, COUNT(*) AS n FROM customer "
        "GROUP BY c_mktsegment"
    )
    out = _gen_full("orders per nation")
    assert "COUNT(t3.o_custkey) AS n" in out and "FROM nation t1" in out
    # ranked and sorted shapes keep their own readings
    assert _gen_full("top 5 orders by totalprice") == (
        "SELECT * FROM orders ORDER BY o_totalprice DESC LIMIT 5"
    )


def test_generator_cost_adjective_ranking():
    """'top 3 most expensive orders' ranks by the cost-synonym column
    (it previously ranked by the first numeric column, o_orderkey);
    'cheapest' flips the direction under 'top'."""
    assert _gen_full("what are the top 3 most expensive orders") == (
        "SELECT * FROM orders ORDER BY o_totalprice DESC LIMIT 3"
    )
    assert _gen_full("top 2 cheapest parts") == (
        "SELECT * FROM part ORDER BY p_retailprice ASC LIMIT 2"
    )


def test_generator_trailing_superlative_cue():
    """A trailing 'the most/fewest' with no object is a ranking the
    SQL must carry — 'which 5 customers spent the most' shipped a
    plain SELECT * before; grouped-MAX readings with an object stay
    answerable."""
    # R12 upgrades the old refusal: the verb-metric rewrite answers it
    # as 'top 5 customers by total revenue' through the child walk
    sql = _gen_full("which 5 customers spent the most")
    assert "ORDER BY o_totalprice_sum DESC LIMIT 5" in sql
    assert _gen("which order has the most totalprice per orderstatus") != ""


def test_generator_grouped_count_superlative():
    """'which <local-col> has the most <base-rows>' is the grouped
    count superlative: COUNT per group, top 1 ('which market segment
    has the most customers'); 'fewest' flips; a subject that names
    the base table itself still refuses."""
    assert _gen_full("which mktsegment has the most customers") == (
        "SELECT c_mktsegment, COUNT(*) AS n FROM customer "
        "GROUP BY c_mktsegment ORDER BY n DESC LIMIT 1"
    )
    assert _gen_full("which market segment has the most customers") == (
        "SELECT c_mktsegment, COUNT(*) AS n FROM customer "
        "GROUP BY c_mktsegment ORDER BY n DESC LIMIT 1"
    )
    assert _gen_full("which mktsegment has the fewest customers").endswith(
        "ORDER BY n ASC LIMIT 1"
    )
    s4 = (
        "CREATE TABLE customer (c_custkey number, c_name text)\n"
        "CREATE TABLE orders (o_orderkey number, o_custkey number, "
        "o_orderstatus text, o_totalprice number)"
    )
    gen = t2s.RuleBasedGenerator()
    assert gen(t2s.build_prompt(s4, "which region has the most orders")) == ""


def test_generator_review_catches_paraphrase_batch():
    """Pins for the review findings on the paraphrase batch."""
    # 1. a stated 'by <col>' outranks the cost adjective
    assert _gen_full("top 3 most expensive orders by orderdate") == (
        "SELECT * FROM orders ORDER BY o_orderdate DESC LIMIT 3"
    )
    # 2. a stated subject count caps the grouped-count superlative
    assert _gen_full("which 5 mktsegments have the most customers").endswith(
        "ORDER BY n DESC LIMIT 5"
    )
    # 3. a stated grouping refuses on the cost-adjective row ranking
    assert _gen_full("top 3 most expensive orders per orderstatus") == ""
    # 4. the bare-per rewrite leaves sorted and join-listing shapes alone
    assert _gen_full("orders sorted by totalprice per orderstatus") == (
        "SELECT * FROM orders ORDER BY o_totalprice"
    )
    assert "JOIN orders" in _gen_full(
        "show customers with their orders per nation"
    )
    # 5. 'the least' joins the trailing-superlative cue
    # R12: the verb-metric rewrite answers the 'least' twin ranked ASC
    sql = _gen_full("which 5 customers spent the least")
    assert "ORDER BY o_totalprice_sum ASC LIMIT 5" in sql
    # 6. cost adjectives work on the bottom branch; a BARE 'N
    # cheapest' is the same ranking (R12, VERDICT r11 #4 — the
    # adjective carries the direction even without top/bottom), and
    # R13 revision: the number-less plural no longer refuses — it is
    # the full cost-ordered list (no cap stated, none invented); see
    # test_generator_bare_cost_adjective_no_cap
    assert _gen_full("bottom 2 cheapest parts") == (
        "SELECT * FROM part ORDER BY p_retailprice ASC LIMIT 2"
    )
    assert _gen_full("5 cheapest parts") == (
        "SELECT * FROM part ORDER BY p_retailprice ASC LIMIT 5"
    )
    assert _gen_full("the cheapest parts") == (
        "SELECT * FROM part ORDER BY p_retailprice ASC"
    )
    # 7. projection readings of 'of each' stay projections
    assert _gen_full("show the name of each customer") == (
        "SELECT * FROM customer"
    )


# ---------------------------------------------------------------------------
# the REAL catalog schema (all 10 fixture tables, rendered exactly as
# render_schema produces it over register_views) — VERDICT r11 #1b: every
# earlier fixture was TPC-H-only, which is how the 'revenue' -> `events`
# difflib collision shipped undetected. New grammar MUST be probed here.
# ---------------------------------------------------------------------------

_SCHEMA_CATALOG = (
    "CREATE TABLE region (r_regionkey number, r_name text)\n"
    "CREATE TABLE nation (n_nationkey number, n_name text, "
    "n_regionkey number)\n"
    "CREATE TABLE customer (c_custkey number, c_name text, "
    "c_nationkey number, c_acctbal number, c_mktsegment text)\n"
    "CREATE TABLE supplier (s_suppkey number, s_name text, "
    "s_nationkey number, s_acctbal number)\n"
    "CREATE TABLE part (p_partkey number, p_name text, p_brand text, "
    "p_type text, p_size number, p_retailprice number)\n"
    "CREATE TABLE orders (o_orderkey number, o_custkey number, "
    "o_orderstatus text, o_totalprice number, o_orderdate text, "
    "o_orderpriority text)\n"
    "CREATE TABLE lineitem (l_orderkey number, l_partkey number, "
    "l_suppkey number, l_linenumber number, l_quantity number, "
    "l_extendedprice number, l_discount number, l_tax number, "
    "l_returnflag text, l_linestatus text, l_shipdate text)\n"
    "CREATE TABLE events (event_id number, ts text, user_id number, "
    "event_type text, value number, props text)\n"
    "CREATE TABLE documents (doc_id number, text text, lang text, "
    "source text, n_chars number)\n"
    "CREATE TABLE embeddings (vec_id number, embedding text, "
    "label number)"
)


def _gen_cat(question: str) -> str:
    return t2s.RuleBasedGenerator()(
        t2s.build_prompt(_SCHEMA_CATALOG, question)
    )


def test_catalog_schema_fixture_matches_render(spark):
    """The static fixture IS the real rendered catalog — if a fixture
    table's schema drifts, this fails before a stale fixture can
    green-light grammar that breaks on the real one. The nl_probe
    tool's independent pyarrow-footer rendering (a different
    type-collapse code path) is pinned to the same string, so the
    committed README transcript can never be generated from a schema
    that differs from what the Q2 path feeds the generator."""
    from tests.conftest import SF_ORACLE
    from etl_zero_spark.catalog import register_views
    from tools.nl_probe import render_from_parquet

    views = register_views(spark, SF_ORACLE)
    assert t2s.render_schema(spark, views) == _SCHEMA_CATALOG
    assert render_from_parquet(SF_ORACLE) == _SCHEMA_CATALOG


def test_catalog_grouped_superlatives_answer():
    """VERDICT r11 #1a: the grouped-superlative family must answer on
    the full catalog schema — 'revenue' difflib-matched the `events`
    table at 0.62 and the branch refused on a phantom table conflict."""
    sql = _gen_cat("which nation has the highest total revenue")
    assert "SUM(t3.o_totalprice)" in sql
    assert "ORDER BY o_totalprice_sum DESC LIMIT 1" in sql
    assert "events" not in sql
    sql = _gen_cat("which nation has the lowest total revenue")
    assert "ORDER BY o_totalprice_sum ASC LIMIT 1" in sql
    sql = _gen_cat("which nation has the highest average revenue")
    assert "AVG(t3.o_totalprice)" in sql
    assert "ORDER BY o_totalprice_avg DESC LIMIT 1" in sql
    sql = _gen_cat("which nation has the highest total revenue in 1995")
    assert "YEAR(t3.o_orderdate) = 1995" in sql
    assert "ORDER BY o_totalprice_sum DESC LIMIT 1" in sql


def test_catalog_r10_refusal_families_still_answer():
    """The three families the judge verified on the real schema in r11
    stay green alongside the superlative fix."""
    sql = _gen_cat("top 3 nations by revenue")
    assert "SUM(t3.o_totalprice)" in sql and "LIMIT 3" in sql
    sql = _gen_cat("top 5 nation names by total revenue")
    assert sql.startswith("SELECT t1.n_name,") and "LIMIT 5" in sql
    sql = _gen_cat("how many customers are in each region")
    assert "COUNT(t3.c_nationkey) AS n" in sql and "GROUP BY" in sql


def test_catalog_metric_words_never_fuzzy_tables():
    """The R12 rule itself: _SYNONYMS/_AGGS words never reach the
    difflib table tier — while genuinely typo'd table names still do."""
    gen = t2s.RuleBasedGenerator()
    schema = {"events": {"event_id": "number"}, "orders": {
        "o_orderkey": "number", "o_totalprice": "number"}}
    assert gen._table_mention("revenue", "orders", schema) is None
    assert gen._table_mention("total", "orders", schema) is None
    assert gen._table_mention("evnts", "orders", schema) == "events"
    # end-to-end: a typo'd table mention still resolves on the catalog
    assert _gen_cat("show all custmer rows") == "SELECT * FROM customer"


def test_catalog_closed_over_refusals():
    """VERDICT r11 #4: the three composition gaps answer on the full
    catalog schema."""
    assert _gen_cat("show me the 2 cheapest parts") == (
        "SELECT * FROM part ORDER BY p_retailprice ASC LIMIT 2"
    )
    sql = _gen_cat("what is the total revenue per year")
    assert sql == (
        "SELECT year(o_orderdate) AS year, SUM(o_totalprice) AS "
        "o_totalprice_sum FROM orders GROUP BY year(o_orderdate)"
    )
    sql = _gen_cat("revenue by nation in 1995 or 1996")
    assert "SUM(t1.o_totalprice)" in sql
    assert (
        "(YEAR(t1.o_orderdate) = 1995 OR YEAR(t1.o_orderdate) = 1996)"
        in sql
    )


def test_catalog_superlatives_duckdb_verified():
    """The generated SQL executes and matches hand-written oracles on
    the real sf0.01 tables (DuckDB) — the probe the r11 transcript
    claimed but never ran on the full schema."""
    import duckdb

    from tests.conftest import SF_ORACLE

    con = duckdb.connect()
    for t in ("nation", "customer", "orders", "part"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_ORACLE}/{t}.parquet')"
        )
    base = (
        "SELECT n.n_name, {agg} AS m FROM nation n "
        "JOIN customer c ON n.n_nationkey = c.c_nationkey "
        "JOIN orders o ON c.c_custkey = o.o_custkey {w}"
        "GROUP BY 1 ORDER BY m {d} LIMIT 1"
    )
    cases = [
        ("which nation has the highest total revenue",
         base.format(agg="SUM(o.o_totalprice)", w="", d="DESC")),
        ("which nation has the lowest total revenue",
         base.format(agg="SUM(o.o_totalprice)", w="", d="ASC")),
        ("which nation has the highest average revenue",
         base.format(agg="AVG(o.o_totalprice)", w="", d="DESC")),
        ("which nation has the highest total revenue in 1995",
         base.format(agg="SUM(o.o_totalprice)",
                     w="WHERE year(o.o_orderdate) = 1995 ", d="DESC")),
    ]
    for q, oracle in cases:
        sql = _gen_cat(q)
        assert sql, q
        got = con.execute(sql).fetchall()
        want = con.execute(oracle).fetchall()
        assert len(got) == 1 and got[0][1] == want[0][0], q
        assert abs(got[0][3] - want[0][1]) < 1e-6 * abs(want[0][1]), q
    # the closed over-refusals execute too
    two = con.execute(_gen_cat("show me the 2 cheapest parts")).fetchall()
    want2 = con.execute(
        f"SELECT * FROM part ORDER BY p_retailprice ASC LIMIT 2"
    ).fetchall()
    assert [r[0] for r in two] == [r[0] for r in want2]


def test_catalog_r12_review_pins():
    """Pins for the r12 review findings on the grammar batch."""
    # 1. a stated N is never silently shrunk: '5 cheapest parts by
    # name' skipped the bare-N branch (stated 'by <col>') and fell
    # into the row-superlative branch's LIMIT 1 before the cue
    # compared the stated N against the emitted LIMIT
    assert _gen_cat("5 cheapest parts by name") == ""
    # 2. a bare 'by <word>' no branch honors refuses — the year-guard
    # fix made the year render here, which would have shipped the
    # question with the 'by totalprice' mention silently dropped
    assert _gen_cat("orders by totalprice in 1995") == ""
    # ...while the honored twin carries BOTH cues
    sql = _gen_cat("largest order by totalprice in 1995")
    assert "YEAR(o_orderdate) = 1995" in sql
    assert "ORDER BY o_totalprice DESC LIMIT 1" in sql
    # 3. 'sales' rides the revenue mass-noun grammar, never difflib
    sql = _gen_cat("total sales per year")
    assert "SUM(o_totalprice)" in sql and "events" not in sql
    sql = _gen_cat("which nation has the highest total sales")
    assert "ORDER BY o_totalprice_sum DESC LIMIT 1" in sql


def test_catalog_non_tpch_tables_answer():
    """The catalog's non-TPC-H tables (events/documents) work as
    TARGETS, not just as fuzzy-collision hazards — including the R12
    two-word self-qualified group ('event types' -> event_type via
    the naive-plural fallback)."""
    assert _gen_cat("top 3 event types by total value") == (
        "SELECT event_type, SUM(value) AS value_sum FROM events "
        "GROUP BY event_type ORDER BY value_sum DESC LIMIT 3"
    )
    assert _gen_cat("top 5 event types by value") == (
        "SELECT event_type, SUM(value) AS value_sum FROM events "
        "GROUP BY event_type ORDER BY value_sum DESC LIMIT 5"
    )
    assert _gen_cat("bottom 2 event types by average value") == (
        "SELECT event_type, AVG(value) AS value_avg FROM events "
        "GROUP BY event_type ORDER BY value_avg ASC LIMIT 2"
    )
    assert _gen_cat("how many documents per lang") == (
        "SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang"
    )
    assert _gen_cat("average value per event type") == (
        "SELECT event_type, AVG(value) AS value_avg FROM events "
        "GROUP BY event_type"
    )
    sql = _gen_cat("which source has the most documents")
    assert "GROUP BY source ORDER BY n DESC LIMIT 1" in sql
    # the plural fallback never overrides an exact column, and the
    # TPC-H shapes through the same regex are untouched
    assert _gen_cat("top 3 orderstatus by average totalprice") == (
        "SELECT o_orderstatus, AVG(o_totalprice) AS o_totalprice_avg "
        "FROM orders GROUP BY o_orderstatus "
        "ORDER BY o_totalprice_avg DESC LIMIT 3"
    )


def test_catalog_non_tpch_duckdb_verified():
    """The events/documents-table SQL executes and matches hand-written
    oracles on the real sf0.01 parquet."""
    import duckdb

    from tests.conftest import SF_ORACLE

    con = duckdb.connect()
    for t in ("events", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_ORACLE}/{t}.parquet')"
        )
    got = con.execute(_gen_cat("top 3 event types by total value")).fetchall()
    want = con.execute(
        "SELECT event_type, SUM(value) v FROM events GROUP BY 1 "
        "ORDER BY v DESC LIMIT 3"
    ).fetchall()
    assert [r[0] for r in got] == [r[0] for r in want]
    assert all(abs(g[1] - w[1]) < 1e-6 * abs(w[1]) for g, w in zip(got, want))
    got = dict(con.execute(_gen_cat("how many documents per lang")).fetchall())
    want = dict(con.execute(
        "SELECT lang, count(*) FROM documents GROUP BY 1"
    ).fetchall())
    assert got == want and got


def test_catalog_events_time_column_binds():
    """R12: a table with no date-named column binds its UNIQUE
    conventionally-named time column (events.ts); where resolution
    still fails, the month-name guard refuses instead of shipping an
    unfiltered select ('events in march' was a live silent drop)."""
    assert _gen_cat("count of events in 2024") == (
        "SELECT COUNT(*) AS n FROM events WHERE YEAR(ts) = 2024"
    )
    assert _gen_cat("events in january") == (
        "SELECT * FROM events WHERE MONTH(ts) = 1"
    )
    assert _gen_cat("count of events per event type in 2024") == (
        "SELECT event_type, COUNT(*) AS n FROM events "
        "WHERE YEAR(ts) = 2024 GROUP BY event_type"
    )
    assert _gen_cat("total value per month in events") == (
        "SELECT month(ts) AS month, SUM(value) AS value_sum "
        "FROM events GROUP BY month(ts)"
    )
    # customer has neither a date- nor a time-named column: refuse
    assert _gen_cat("customers in march") == ""


def test_catalog_events_time_duckdb_verified():
    import duckdb

    from tests.conftest import SF_ORACLE

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF_ORACLE}/events.parquet')"
    )
    got = con.execute(_gen_cat("count of events in 2024")).fetchone()[0]
    want = con.execute(
        "SELECT count(*) FROM events WHERE year(ts) = 2024"
    ).fetchone()[0]
    assert got == want and got > 0
    got = dict(con.execute(
        _gen_cat("total value per month in events")
    ).fetchall())
    want = dict(con.execute(
        "SELECT month(ts), sum(value) FROM events GROUP BY 1"
    ).fetchall())
    assert set(got) == set(want)
    assert all(abs(got[k] - want[k]) < 1e-6 * abs(want[k]) for k in want)


def test_catalog_attributive_cost_superlatives():
    """R12 sweep: attributive/postfix cost-adjective superlatives are
    the same row ranking ('which part is the most expensive'); stated
    groupings and 'by <col>' keep their refusals."""
    assert _gen_cat("which part is the most expensive") == (
        "SELECT * FROM part ORDER BY p_retailprice DESC LIMIT 1"
    )
    assert _gen_cat("what is the most expensive part") == (
        "SELECT * FROM part ORDER BY p_retailprice DESC LIMIT 1"
    )
    assert _gen_cat("which 3 parts are the most expensive") == (
        "SELECT * FROM part ORDER BY p_retailprice DESC LIMIT 3"
    )
    assert _gen_cat("which part is the cheapest") == (
        "SELECT * FROM part ORDER BY p_retailprice ASC LIMIT 1"
    )
    assert _gen_cat("which order is the most expensive per orderstatus") == ""
    assert _gen_cat("which part is the most expensive by brand") == ""


def test_catalog_table_evidence_outranks_difflib():
    """R12 sweep: deterministic column evidence outranks the difflib
    table tier — 'sources' names a documents column exactly but
    difflib-matched the `orders` table at 0.62 ('number of unique
    sources per lang' resolved ORDERS and refused); 'number of' is the
    count phrase, never column evidence (it resolved LINEITEM via
    l_linenumber). Typo'd table names still difflib-resolve."""
    assert _gen_cat("number of unique sources per lang") == (
        "SELECT lang, COUNT(DISTINCT source) AS n FROM documents "
        "GROUP BY lang"
    )
    assert _gen_cat("how many distinct sources per lang") == (
        "SELECT lang, COUNT(DISTINCT source) AS n FROM documents "
        "GROUP BY lang"
    )
    assert _gen_cat("show all custmer rows") == "SELECT * FROM customer"


def test_catalog_r12_second_review_pins():
    """Pins for the second r12 review pass (six findings)."""
    # 1. the of-each grouping cue reaches the cost-adjective branches
    # (they checked q while the of-each->per rewrite lands in q_main)
    assert _gen_cat("which part is the most expensive of each brand") == ""
    assert _gen_cat("top 3 most expensive parts of each brand") == ""
    assert _gen_cat("show me the 2 cheapest parts of each brand") == ""
    # 2. the plural-strip group fallback is deterministic-tier only:
    # 'sale' must not difflib-hit 'value' and group a query by its
    # own metric
    assert _gen_cat("average value per sales") == ""
    # 3. a NUMBER-typed conventional time column refuses the date
    # grammar (epoch ts would render YEAR(ts)=2024 and mis-execute)
    s = "CREATE TABLE metrics (id number, value number, ts number)"
    gen = t2s.RuleBasedGenerator()
    assert gen(t2s.build_prompt(s, "count of metrics in 2024")) == ""
    assert gen(t2s.build_prompt(s, "metrics in march")) == ""
    # 4. a stated two-word group whose column word never resolves
    # refuses instead of silently ranking raw rows...
    assert _gen_cat("top 5 event kinds by value") == ""
    # ...while sort phrasings keep the raw-row reading and foreign
    # metrics keep the child walk
    assert _gen_cat("top 5 events sorted by value") == (
        "SELECT * FROM events ORDER BY value DESC LIMIT 5"
    )
    assert "LEFT JOIN" in _gen_full("top 3 nation name by revenue")
    # 6. the same plural group phrase resolves on BOTH paths
    assert _gen_cat("average value per event types") == (
        "SELECT event_type, AVG(value) AS value_avg FROM events "
        "GROUP BY event_type"
    )


def test_catalog_sweep2_wrong_sql_fixes():
    """Second r12 sweep: three silent mistranslations fixed."""
    # 1. LIKE literals take the extended charset — 'Customer#0000001'
    # truncated at the '#' and LIKE 'Customer%' matched every row
    assert _gen_cat("customers whose name starts with Customer#0000001") == (
        "SELECT * FROM customer WHERE c_name LIKE 'Customer#0000001%'"
    )
    # 2. two aggregates over TWO columns both render — the single-agg
    # loop shipped AVG(discount) alone, SUM(quantity) silently dropped
    assert _gen_cat("total quantity and average discount per returnflag") == (
        "SELECT l_returnflag, SUM(l_quantity) AS l_quantity_sum, "
        "AVG(l_discount) AS l_discount_avg FROM lineitem "
        "GROUP BY l_returnflag"
    )
    # ...the shared-metric form is untouched
    assert _gen_cat("total and average totalprice per orderstatus") == (
        "SELECT o_orderstatus, SUM(o_totalprice) AS o_totalprice_sum, "
        "AVG(o_totalprice) AS o_totalprice_avg FROM orders "
        "GROUP BY o_orderstatus"
    )
    # ...and unresolvable targets refuse instead of re-dropping one
    assert _gen_cat("total foo and average bar in orders") == ""
    # 3. stated projections render; any failure keeps the SELECT *
    # superset default, and the of-each projection exemption holds
    assert _gen_cat("show name and acctbal of customers") == (
        "SELECT c_name, c_acctbal FROM customer"
    )
    assert _gen_cat("show the name, acctbal and mktsegment of customers") == (
        "SELECT c_name, c_acctbal, c_mktsegment FROM customer"
    )
    assert _gen_cat("show name and frobnicate of customers") == (
        "SELECT * FROM customer"
    )
    assert _gen_cat("show the name of each customer") == (
        "SELECT * FROM customer"
    )
    assert _gen_cat("show all records from the orders table") == (
        "SELECT * FROM orders"
    )


def test_catalog_verb_metric_superlatives():
    """R12 sweep: money-verb superlatives normalize to the walked
    grouped-superlative / ranked shapes; subjects that name no table
    keep the refusal (never re-targeted at the metric's own table)."""
    sql = _gen_cat("what nation earned the most revenue")
    assert "SUM(t3.o_totalprice)" in sql
    assert "ORDER BY o_totalprice_sum DESC LIMIT 1" in sql
    sql = _gen_cat("which 5 customers spent the most")
    assert "ORDER BY o_totalprice_sum DESC LIMIT 5" in sql
    sql = _gen_cat("which customer spent the least")
    assert "ORDER BY o_totalprice_sum ASC LIMIT 1" in sql
    sql = _gen_cat("which nation earned the most revenue in 1995")
    assert "YEAR(t3.o_orderdate) = 1995" in sql
    assert _gen_cat("which analyst spent the most") == ""


def test_generator_grouped_metric_superlative_over_column():
    """R13 (fuzz-found mistranslation): 'which <local-col> has the
    highest total <metric>' previously shipped a row ranking that
    silently dropped BOTH the stated aggregate and the grouping
    ('which category has the highest total price' -> SELECT * ...
    ORDER BY price LIMIT 1). It is the grouped-superlative twin of
    the count form: GROUP BY the subject column, aggregate the
    metric, keep the top group."""
    s = (
        "CREATE TABLE products (p_productkey number, p_name text, "
        "p_price number, p_stock number, p_category text)"
    )
    gen = t2s.RuleBasedGenerator()

    def g(q):
        return gen(t2s.build_prompt(s, q))

    assert g("which category has the highest total price") == (
        "SELECT p_category, SUM(p_price) AS p_price_sum FROM products "
        "GROUP BY p_category ORDER BY p_price_sum DESC LIMIT 1"
    )
    assert g("which category has the highest average price") == (
        "SELECT p_category, AVG(p_price) AS p_price_avg FROM products "
        "GROUP BY p_category ORDER BY p_price_avg DESC LIMIT 1"
    )
    # a bare superlative over a LOCAL metric reads MAX/MIN — 'the
    # category with the highest price' is the one containing it (the
    # same winner the row ranking picks), never an implied SUM
    assert g("which category has the highest price") == (
        "SELECT p_category, MAX(p_price) AS p_price_max FROM products "
        "GROUP BY p_category ORDER BY p_price_max DESC LIMIT 1"
    )
    assert g("which category has the lowest price") == (
        "SELECT p_category, MIN(p_price) AS p_price_min FROM products "
        "GROUP BY p_category ORDER BY p_price_min ASC LIMIT 1"
    )
    # a stated subject count caps the groups
    assert g("which 2 categories have the highest total price").endswith(
        "ORDER BY p_price_sum DESC LIMIT 2"
    )
    # a table subject keeps the documented row ranking
    assert g("which product has the highest price") == (
        "SELECT * FROM products ORDER BY p_price DESC LIMIT 1"
    )
    # a subject resolving to NEITHER table nor column refuses — a row
    # ranking that ignores 'which analyst…' is a guess
    assert g("which analyst has the highest price") == ""
    assert "analyst" in gen.last_refusal_reason


def test_refusal_reasons_surface():
    """VERDICT r12 #6: refusals NAME the missing word. The reason is
    advisory (the '' refusal contract is unchanged) and is cleared
    whenever an answer ships."""
    gen = t2s.RuleBasedGenerator()
    sql = gen(t2s.build_prompt(_SCHEMA_CATALOG,
                               "which nation has the highest quantity"))
    assert sql == ""
    assert "total" in gen.last_refusal_reason
    assert "quantity" in gen.last_refusal_reason
    # the explicit-agg form answers, and answering clears the reason
    sql = gen(t2s.build_prompt(_SCHEMA_CATALOG,
                               "which nation has the highest total quantity"))
    assert "SUM" in sql
    assert gen.last_refusal_reason is None


def test_generator_agg_word_blocks_fuzzy_table_count():
    """R14 walk-fuzz catch (first run of the walk battery): 'which
    movie has the highest total score' on a schema where the metric
    `se_score` lives two hops away and a table named `stores` exists —
    the count-of-table reading fuzzy-matched 'score' -> `stores` and
    shipped a COUNT of stores, silently dropping both the stated SUM
    and the metric. Under a stated aggregate word the table reading
    requires an EXACT/plural table name; the metric walk answers."""
    s = (
        "CREATE TABLE movies (mv_moviekey number, mv_name text)\n"
        "CREATE TABLE stores (st_storekey number, st_moviekey number)\n"
        "CREATE TABLE sellers (se_sellerkey number, se_storekey number, "
        "se_score number)"
    )
    gen = t2s.RuleBasedGenerator()
    sql = gen(t2s.build_prompt(s, "which movie has the highest total score"))
    assert "SUM(t3.se_score)" in sql and "COUNT" not in sql
    # the exact-table count reading is untouched
    sql = gen(t2s.build_prompt(s, "which movie has the most stores"))
    assert "COUNT(t2.st_moviekey)" in sql


def test_refusal_reasons_every_refusal_carries_one():
    """R14 (VERDICT r13 #6): EVERY refusal carries a reason — the
    backstop names its tripped cue, branch refusals stamp specifics,
    and an unmatched question gets the generic fallback — so the
    probe transcript can rank refusal families by frequency."""
    gen = t2s.RuleBasedGenerator()
    cases = {
        "orders where clerk is Clerk#000000951": "equality literal",
        "orders where totalprice in 1995": "year 1995",
        "the cheapest parts per brand": "cost-adjective",
        "customers in march": "month filter",
        "which analyst spent the most": "money-verb",
        "how many orders does each customer or supplier have":
            "alternative",
        "tell me a joke": "no rule answered",
    }
    for q, want in cases.items():
        assert gen(t2s.build_prompt(_SCHEMA_CATALOG, q)) == ""
        assert gen.last_refusal_reason and want in gen.last_refusal_reason, (
            q, gen.last_refusal_reason,
        )


def test_catalog_column_subject_superlatives_duckdb_verified():
    """The new grouped-superlative-over-column shapes execute in DuckDB
    against the real sf0.01 parquet and agree with hand-written
    oracles (the r12 adversarial-battery practice, pinned)."""
    import duckdb

    from tests.conftest import SF_ORACLE

    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_ORACLE}/{t}.parquet')"
        )
    sql = _gen_cat("which mktsegment has the highest total acctbal")
    got = con.execute(sql).fetchall()
    want = con.execute(
        "SELECT c_mktsegment, SUM(c_acctbal) FROM customer "
        "GROUP BY c_mktsegment ORDER BY 2 DESC LIMIT 1"
    ).fetchall()
    assert got[0][0] == want[0][0] and abs(got[0][1] - want[0][1]) < 1e-6
    sql = _gen_cat("which orderstatus has the highest average totalprice")
    got = con.execute(sql).fetchall()
    want = con.execute(
        "SELECT o_orderstatus, AVG(o_totalprice) FROM orders "
        "GROUP BY o_orderstatus ORDER BY 2 DESC LIMIT 1"
    ).fetchall()
    assert got[0][0] == want[0][0] and abs(got[0][1] - want[0][1]) < 1e-6


def test_generator_count_ranked_local_groups():
    """R13: 'top N <local-col-plural> by number/count of <base-rows>'
    is the ranked twin of the grouped-count superlative; -es/-ies
    naive plurals resolve at the deterministic tier only."""
    assert _gen_cat("top 3 mktsegments by number of customers") == (
        "SELECT c_mktsegment, COUNT(*) AS n FROM customer "
        "GROUP BY c_mktsegment ORDER BY n DESC LIMIT 3"
    )
    assert _gen_cat("top 2 orderstatuses by number of orders") == (
        "SELECT o_orderstatus, COUNT(*) AS n FROM orders "
        "GROUP BY o_orderstatus ORDER BY n DESC LIMIT 2"
    )
    assert _gen_cat("bottom 2 langs by count of documents") == (
        "SELECT lang, COUNT(*) AS n FROM documents "
        "GROUP BY lang ORDER BY n ASC LIMIT 2"
    )
    # the walked form is untouched: the group names the base table
    sql = _gen_cat("top 3 nations by number of orders")
    assert "LEFT JOIN" in sql and "COUNT(t3.o_custkey)" in sql
    # a non-resolving stated group still refuses
    s = (
        "CREATE TABLE sales (sl_salekey number, sl_amount number, "
        "sl_status text, sl_priority text)"
    )
    gen = t2s.RuleBasedGenerator()
    assert gen(t2s.build_prompt(s, "top 3 flavors by number of sales")) == ""
    # -es / -ies plurals reach the aggregate ranked groups too
    assert gen(t2s.build_prompt(s, "top 2 statuses by total amount")) == (
        "SELECT sl_status, SUM(sl_amount) AS sl_amount_sum FROM sales "
        "GROUP BY sl_status ORDER BY sl_amount_sum DESC LIMIT 2"
    )
    assert gen(t2s.build_prompt(s, "top 2 priorities by total amount")) == (
        "SELECT sl_priority, SUM(sl_amount) AS sl_amount_sum FROM sales "
        "GROUP BY sl_priority ORDER BY sl_amount_sum DESC LIMIT 2"
    )


def test_generator_superlative_subject_review_pins():
    """R13 code-review pins on the grouped-superlative-over-column
    branch: (1) subject resolution is deterministic-tier only — a
    fuzzy difflib hit must not ship a guessed GROUP BY; (2) the
    what/with framings answer like the which form; (3) a bare 'by
    number' with a literal number-named column keeps the SUM reading,
    count only wins via 'number of' or when no such column exists."""
    gen = t2s.RuleBasedGenerator()

    def g(schema, q):
        return gen(t2s.build_prompt(schema, q))

    # (1) 'sale' fuzzy-matches 'value' at 0.667 — must refuse, never
    # group by a column the user never named
    s1 = ("CREATE TABLE documents (dockey number, lang text, "
          "value number, score number)")
    assert g(s1, "which sale has the highest total score") == ""
    assert "subject" in gen.last_refusal_reason
    # (2) framing twins of the pinned which-form
    s2 = ("CREATE TABLE products (p_productkey number, p_name text, "
          "p_price number, p_stock number, p_category text)")
    want = (
        "SELECT p_category, SUM(p_price) AS p_price_sum FROM products "
        "GROUP BY p_category ORDER BY p_price_sum DESC LIMIT 1"
    )
    assert g(s2, "what category has the highest total price") == want
    assert g(s2, "the category with the highest total price") == want
    # generic row words keep the row reading
    assert g(s2, "the record with the highest price") == (
        "SELECT * FROM products ORDER BY p_price DESC LIMIT 1"
    )
    # (3) literal 'number' column
    s3 = ("CREATE TABLE tickets (tk_ticketkey number, "
          "tk_number number, tk_tier text)")
    assert g(s3, "top 3 tiers by number") == (
        "SELECT tk_tier, SUM(tk_number) AS tk_number_sum FROM tickets "
        "GROUP BY tk_tier ORDER BY tk_number_sum DESC LIMIT 3"
    )
    assert g(s3, "top 2 tiers by number of tickets") == (
        "SELECT tk_tier, COUNT(*) AS n FROM tickets "
        "GROUP BY tk_tier ORDER BY n DESC LIMIT 2"
    )


def test_generator_bare_cost_adjective_no_cap():
    """R13 (r12 refusal backlog): a bare cost adjective with no stated
    N. Singular definite -> the top row (LIMIT 1, the what-is twin);
    plural -> the full cost-ordered list (no cap stated, none
    invented). Grouping still refuses; a missing cost-synonym column
    still refuses."""
    assert _gen_cat("the cheapest parts") == (
        "SELECT * FROM part ORDER BY p_retailprice ASC"
    )
    assert _gen_cat("the most expensive parts") == (
        "SELECT * FROM part ORDER BY p_retailprice DESC"
    )
    assert _gen_cat("the cheapest part") == (
        "SELECT * FROM part ORDER BY p_retailprice ASC LIMIT 1"
    )
    assert _gen_cat("show me the most expensive part") == (
        "SELECT * FROM part ORDER BY p_retailprice DESC LIMIT 1"
    )
    assert _gen_cat("the cheapest parts per brand") == ""
    assert _gen_cat("the cheapest customers") == ""  # no cost synonym
    # the stated-N form is unchanged
    assert _gen_cat("show me the 2 cheapest parts").endswith("LIMIT 2")


def test_generator_cost_adjective_second_review_pins():
    """Second R13 /code-review pass on the bare-cost-adjective branch:
    (1) a stated count/aggregate/distinct operation is a different
    question — never an uncounted row list; (2) a trailing noun after
    the table word is a phrase this branch cannot carry; (3) plural
    doctrine is consistent across phrasings ('which parts are the
    cheapest' == 'the cheapest parts': no invented cap); (4) s-final
    singular classes (-ss/-us/-is) read as singular."""
    assert _gen_cat("count of the cheapest parts") == ""
    assert _gen_cat("how many of the cheapest parts are there") == ""
    assert _gen_cat("average retailprice of the cheapest parts") == ""
    assert _gen_cat("distinct cheapest parts") == ""
    assert _gen_cat("the most expensive part types") == ""
    assert _gen_cat("which parts are the cheapest") == (
        "SELECT * FROM part ORDER BY p_retailprice ASC"
    )
    assert _gen_cat("which part is the cheapest") == (
        "SELECT * FROM part ORDER BY p_retailprice ASC LIMIT 1"
    )
    assert _gen_cat("which 3 parts are the most expensive") == (
        "SELECT * FROM part ORDER BY p_retailprice DESC LIMIT 3"
    )
    # -us/-ss/-is singulars stay LIMIT 1
    s = ("CREATE TABLE status (st_statuskey number, st_price number, "
         "st_label text)")
    gen = t2s.RuleBasedGenerator()
    assert gen(t2s.build_prompt(s, "the cheapest status")).endswith("LIMIT 1")


def test_generator_r14_advice_pins():
    """R14 pins for the three ADVICE r13 findings.

    (1) The bare cost-adjective branch requires an allowlisted tail to
    have RENDERED into a constraint (WHERE/EXISTS) — an unparsed tail
    refuses instead of shipping the unfiltered ORDER BY list.
    (2) _superlative_subject captures a stated count outside the
    which/what group — the with-framing carries it to the grouped
    superlative's LIMIT; a digit SURVIVING in the subject phrase
    refuses in every framing.
    (3) The which-N row ranking threads the parsed count instead of
    the literal LIMIT 1."""
    # (1) unrendered tails refuse (all three refused at the r12 base)
    assert _gen_cat("the cheapest parts with brand B1") == ""
    assert _gen_cat("the cheapest parts in segment BUILDING") == ""
    assert _gen_cat("the most expensive orders that are open") == ""
    # ...while a tail the where-extractor consumes still answers
    assert _gen_cat("the cheapest parts with retailprice over 100") == (
        "SELECT * FROM part WHERE p_retailprice > 100 "
        "ORDER BY p_retailprice ASC"
    )
    # (2) with-framing stated count reaches the grouped superlative
    assert _gen_cat("the 3 mktsegments with the highest total acctbal") == (
        "SELECT c_mktsegment, SUM(c_acctbal) AS c_acctbal_sum "
        "FROM customer GROUP BY c_mktsegment "
        "ORDER BY c_acctbal_sum DESC LIMIT 3"
    )
    # ...and a digit surviving in the subject phrase refuses
    gen = t2s.RuleBasedGenerator()
    assert gen(t2s.build_prompt(
        _SCHEMA_CATALOG, "the 3 4 parts with the highest retailprice"
    )) == ""
    assert gen.last_refusal_reason is not None
    # (3) which-N row ranking carries the stated N
    assert _gen_cat("which 3 customers have the highest acctbal") == (
        "SELECT * FROM customer ORDER BY c_acctbal DESC LIMIT 3"
    )
    assert _gen_cat("which customer has the highest acctbal") == (
        "SELECT * FROM customer ORDER BY c_acctbal DESC LIMIT 1"
    )
