"""Property tests (hypothesis) for the token/shingle expressions that
every text dedup operator builds on — cross-checked against a plain
Python model on generated text, including the whitespace-only / empty /
short-document edges the fixture can't systematically cover.

Alphabet is printable ASCII + whitespace: Java and Python regex/lower
agree there; full-unicode case folding is out of contract (both engines
tokenize identically on what the fixture generator emits).
"""

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_zero_spark.operators import dedup

_WORD = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126), min_size=1, max_size=8
)
_SEP = st.sampled_from([" ", "  ", "\t", "\n", " \t "])
_TEXT = st.lists(_WORD, min_size=0, max_size=12).flatmap(
    lambda ws: _SEP.map(lambda sep: sep.join(ws))
)


def _py_tokens(t: str) -> list[str]:
    return [w for w in re.split(r"\s+", t.lower()) if w]


def _py_shingles(t: str, k: int = 3) -> list[str]:
    toks = _py_tokens(t)
    if len(toks) < k:
        return [" ".join(toks)]
    return list(dict.fromkeys(" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)))


@settings(max_examples=15, deadline=None)
@given(texts=st.lists(_TEXT, min_size=1, max_size=8))
def test_tokens_and_shingles_match_python_model(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    out = df.select(
        "doc_id",
        dedup.tokens_expr(F.col("text")).alias("toks"),
        dedup.shingles_expr(F.col("text")).alias("sh"),
    ).collect()
    for r in out:
        t = texts[r.doc_id]
        assert list(r.toks) == _py_tokens(t), f"tokens({t!r})"
        assert sorted(r.sh) == sorted(_py_shingles(t)), f"shingles({t!r})"


def test_jaccard_expr_bounds(spark):
    """Jaccard of identical shingle sets is 1, of disjoint sets 0, and
    the expression is symmetric."""
    df = spark.createDataFrame(
        [(["a", "b"], ["a", "b"]), (["a"], ["b"]), (["a", "b", "c"], ["b", "c", "d"])],
        "x array<string>, y array<string>",
    )
    rows = df.select(
        dedup.jaccard_expr(F.col("x"), F.col("y")).alias("j1"),
        dedup.jaccard_expr(F.col("y"), F.col("x")).alias("j2"),
    ).collect()
    assert [r.j1 for r in rows] == pytest.approx([1.0, 0.0, 0.5])
    assert all(r.j1 == r.j2 for r in rows)


# ---------------------------------------------------------------------------
# PII scrub: Java-regex vs RE2 parity and masking semantics
# ---------------------------------------------------------------------------

NASTY_PII = [
    "plain text no pii",
    "mail me at bob.smith+x@ex-ample.co.uk today",
    "see https://ex.io/a?b=1&c=2#frag and http://x.y/z_%20q",
    "server at 10.0.0.1 and 192.168.255.254, call 555-867-5309",
    "edge:trailing email a@b.io",
    "https://a.b/c",
    "email-in-url https://site.com/u/a@b.com/page stays one URL",
    "unicode für 10.1.2.3 nearby",
    "10.0.0.1",
    "a@b.io text 1.2.3.4 x 999-123-4567 y http://q.r",
    "phones 123-456-7890 123.456.7890 123 456 7890",
    "not-phone 12-3456-7890, not-ip 1234.5.6.7",
    "",
]


def test_scrub_pii_masks_and_counts(spark):
    from etl_zero_spark.operators import text as T

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(NASTY_PII)], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in T.scrub_pii(df).collect()}
    assert rows[0].text == "plain text no pii"
    assert rows[1].text == "mail me at <EMAIL> today" and rows[1].n_email == 1
    assert rows[2].text == "see <URL> and <URL>" and rows[2].n_url == 2
    assert rows[3].text == "server at <IPV4> and <IPV4>, call <PHONE>"
    assert rows[6].text == "email-in-url <URL> stays one URL"
    assert rows[10].n_phone == 3
    assert rows[11].n_phone == 0 and rows[11].n_ipv4 == 0  # lookalikes stay
    assert rows[12].text == ""


def test_scrub_pii_parity_with_re2_oracle(spark):
    """The declared query's hash depends on Java regex and RE2 agreeing
    on these patterns — pin that agreement on adversarial strings, not
    just the fixture corpus."""
    import duckdb

    from etl_zero_spark.operators import text as T

    data = [(i, s) for i, s in enumerate(NASTY_PII)]
    df = spark.createDataFrame(data, "doc_id long, text string")
    sp = {
        r.doc_id: (r.text, r.n_url, r.n_email, r.n_ipv4, r.n_phone)
        for r in T.scrub_pii(df).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", data)
    p = T.PII_PATTERNS
    duck = con.execute(
        f"""
        SELECT doc_id,
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
            '{p["url"]}', '<URL>', 'g'), '{p["email"]}', '<EMAIL>', 'g'),
            '{p["ipv4"]}', '<IPV4>', 'g'), '{p["phone"]}', '<PHONE>', 'g'),
          len(regexp_extract_all(text, '{p["url"]}')),
          len(regexp_extract_all(text, '{p["email"]}')),
          len(regexp_extract_all(text, '{p["ipv4"]}')),
          len(regexp_extract_all(text, '{p["phone"]}'))
        FROM t
        """
    ).fetchall()
    for doc_id, *vals in duck:
        assert sp[doc_id] == tuple(vals), f"doc {doc_id}: {sp[doc_id]} != {vals}"


# ---------------------------------------------------------------------------
# P6 date parsing: property parity with the reference's dateutil call
# ---------------------------------------------------------------------------

_MON_ABBR = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
             "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
_MON_FULL = ["January", "February", "March", "April", "May", "June", "July",
             "August", "September", "October", "November", "December"]

#: Renderers for the formats where day-first parity with
#: dateutil(dayfirst=True) must be EXACT. Year-leading forms are
#: deliberately absent: dateutil swaps their month/day (see
#: functions/dates.py docstring), and the engine reads them as ISO.
_DAYFIRST_RENDERERS = [
    lambda d, m, y: f"{d:02d}/{m:02d}/{y}",
    lambda d, m, y: f"{d:02d}-{m:02d}-{y}",
    lambda d, m, y: f"{d:02d}.{m:02d}.{y}",
    lambda d, m, y: f"{d} {_MON_ABBR[m - 1]} {y}",
    lambda d, m, y: f"{d} {_MON_FULL[m - 1]} {y}",
    lambda d, m, y: f"{_MON_ABBR[m - 1]} {d} {y}",
]


@settings(max_examples=30, deadline=None)
@given(
    # 4-digit years only: the yyyy formats presume them, and dateutil
    # zero-pad-free strftime breaks its own round-trip below year 1000
    st.dates(min_value=__import__("datetime").date(1000, 1, 1)),
    st.integers(min_value=0, max_value=len(_DAYFIRST_RENDERERS) - 1),
)
def test_date_parse_matches_dateutil_dayfirst(spark, date, fmt_idx):
    """For every day-first/month-name rendering of any valid date, the
    tiered Column parse must emit exactly what the reference's
    dateutil.parse(dayfirst=True) emits."""
    from dateutil import parser as dp

    from etl_zero_spark.functions.dates import standardize_date_expr

    raw = _DAYFIRST_RENDERERS[fmt_idx](date.day, date.month, date.year)
    want = dp.parse(raw, dayfirst=True, fuzzy=True).strftime("%Y-%m-%d")
    assert want == date.strftime("%Y-%m-%d")  # renderer sanity
    got = (
        spark.createDataFrame([(raw,)], "raw string")
        .select(standardize_date_expr("raw").alias("out"))
        .first()
        .out
    )
    assert got == want, f"{raw!r}: engine {got!r} != dateutil {want!r}"


def test_date_parse_invalid_dates_null_on_both_sides(spark):
    """Strictness parity: impossible dates raise in dateutil (-> null in
    the reference) and must null here too."""
    from dateutil import parser as dp

    from etl_zero_spark.functions.dates import standardize_date_expr

    bad = ["29/02/2021", "31/04/2021", "00/01/2021", "not a date", ""]
    for raw in bad:
        try:
            dp.parse(raw, dayfirst=True, fuzzy=True)
            ref_null = False
        except Exception:
            ref_null = True
        assert ref_null, f"expected dateutil to reject {raw!r}"
    rows = (
        spark.createDataFrame([(b,) for b in bad], "raw string")
        .select(standardize_date_expr("raw").alias("out"))
        .collect()
    )
    assert all(r.out is None for r in rows)


def test_date_parse_year_leading_is_iso_documented_deviation(spark):
    """Pin the DELIBERATE divergence: dateutil(dayfirst=True) reads
    2021-04-05 as May 4th; the engine reads ISO. If either side ever
    changes, this test flags the docs for an update."""
    from dateutil import parser as dp

    from etl_zero_spark.functions.dates import standardize_date_expr

    raw = "2021-04-05"
    assert dp.parse(raw, dayfirst=True).strftime("%Y-%m-%d") == "2021-05-04"
    got = (
        spark.createDataFrame([(raw,)], "raw string")
        .select(standardize_date_expr("raw").alias("out"))
        .first()
        .out
    )
    assert got == "2021-04-05"


def test_winnow_fingerprints_match_python_oracle(spark):
    """Winnowing recomputed in plain Python (same xxhash64 via a Spark
    scalar eval for hash parity, window-min + distinct) on fixture
    docs."""
    from pyspark.sql import functions as F

    from etl_zero_spark.catalog import load_table
    from etl_zero_spark.operators.text import winnow_fingerprints_expr
    from tests.conftest import SF_SMOKE

    k, w = 5, 4
    docs = load_table(spark, SF_SMOKE, "documents").where(F.col("doc_id") < 30)
    got = {
        r.doc_id: list(r.fp)
        for r in docs.select(
            "doc_id", winnow_fingerprints_expr(F.col("text"), k, w).alias("fp")
        ).collect()
    }
    # hash parity: evaluate xxhash64 of each k-gram through Spark once
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    grams = []
    for t in texts.values():
        toks = [x for x in t.lower().split() if x]
        if len(toks) < k + w - 1:
            grams.append(" ".join(toks))
        else:
            grams.extend(" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1))
    gdf = spark.createDataFrame([(g,) for g in set(grams)], "g string")
    h = {r.g: r.h for r in gdf.select("g", F.xxhash64("g").alias("h")).collect()}
    for doc_id, t in texts.items():
        toks = [x for x in t.lower().split() if x]
        if len(toks) < k + w - 1:
            want = [h[" ".join(toks)]]
        else:
            hs = [h[" ".join(toks[i : i + k])] for i in range(len(toks) - k + 1)]
            want = sorted({min(hs[i : i + w]) for i in range(len(hs) - w + 1)})
        assert got[doc_id] == want, doc_id


def test_winnow_shared_substring_guarantee(spark):
    """Any shared run of >= window+k-1 tokens must yield a shared
    fingerprint; disjoint texts share none."""
    from pyspark.sql import functions as F

    from etl_zero_spark.operators.text import winnow_overlap_pairs

    shared_run = "lorem ipsum dolor sit amet consectetur adipiscing elit"  # 8 tokens = w+k-1
    df = spark.createDataFrame(
        [
            (1, f"aa bb cc {shared_run} dd ee"),
            (2, f"xx yy {shared_run} zz qq rr"),
            (3, "totally different words with no overlap at all here now"),
        ],
        "doc_id long, text string",
    )
    pairs = winnow_overlap_pairs(df, min_shared=1, k=5, window=4)
    got = {(r.a_id, r.b_id) for r in pairs.collect()}
    assert (1, 2) in got
    assert not any(3 in p for p in got)


def test_winnow_density(spark):
    """The sketch stores roughly 2/(window+1) of the k-gram hashes —
    the winnowing paper's expected density — far smaller than the full
    gram set."""
    from pyspark.sql import functions as F

    from etl_zero_spark.catalog import load_table
    from etl_zero_spark.operators.text import winnow_fingerprints_expr
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    k, w = 5, 8
    stats = docs.select(
        F.size(winnow_fingerprints_expr(F.col("text"), k, w)).alias("n_fp"),
        (
            F.size(F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != ""))
            - k + 1
        ).alias("n_grams"),
    ).where(F.col("n_grams") >= w).agg(
        (F.sum("n_fp") / F.sum("n_grams")).alias("density")
    ).first()
    # fixture text repeats a tiny vocab (duplicate grams collapse), so
    # allow a wide band around 2/(w+1) ≈ 0.22
    assert 0.02 < stats.density < 0.5, stats.density


def test_chunk_documents_boundaries_and_overlap(spark):
    from etl_zero_spark.operators.text import chunk_documents

    words = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([(1, words)], ["doc_id", "text"])
    # disjoint windows: 4+4+2
    got = chunk_documents(df, chunk_tokens=4).orderBy("chunk_id").collect()
    assert [(r.chunk_id, r.n_tokens) for r in got] == [(0, 4), (1, 4), (2, 2)]
    assert got[0].chunk_text == "w0 w1 w2 w3"
    assert got[2].chunk_text == "w8 w9"
    # overlapping windows: stride 3, chunk 4 -> starts 0,3,6 (last
    # window reaches the end, no redundant tail)
    got = chunk_documents(df, chunk_tokens=4, stride=3).orderBy("chunk_id").collect()
    assert [r.chunk_text for r in got] == [
        "w0 w1 w2 w3", "w3 w4 w5 w6", "w6 w7 w8 w9"
    ]
    # full coverage property at several geometries
    for chunk, stride in [(3, 3), (5, 2), (7, 7), (512, 100)]:
        rows = chunk_documents(df, chunk, stride).collect()
        covered = set()
        for r in rows:
            ws = r.chunk_text.split()
            covered |= set(ws)
            assert len(ws) == r.n_tokens <= chunk
        assert covered == {f"w{i}" for i in range(10)}


def test_chunk_documents_short_null_empty(spark):
    from etl_zero_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [(1, "only three words"), (2, None), (3, ""), (4, "   ")],
        "doc_id long, text string",
    )
    got = chunk_documents(df, chunk_tokens=512).collect()
    assert [(r.doc_id, r.chunk_id, r.n_tokens) for r in got] == [(1, 0, 3)]
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, stride=0)


def test_chunk_documents_no_empty_chunk_when_stride_exceeds_doc(spark):
    """Code-review r6: stride > chunk_tokens could compute a grid
    start past the document and posexplode a junk empty chunk."""
    from etl_zero_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(9)))], ["doc_id", "text"]
    )
    got = chunk_documents(df, chunk_tokens=3, stride=5).orderBy("chunk_id").collect()
    assert all(r.n_tokens > 0 and r.chunk_text for r in got)
    assert [r.chunk_text for r in got] == ["w0 w1 w2", "w5 w6 w7"]


def test_chunk_documents_geometry_sweep_vs_python_oracle(spark):
    """Exhaustive small-geometry sweep vs a sequential oracle of the
    documented spec: for every (chunk, stride) and every doc length
    0..13, the emitted (chunk_id, tokens) sequence matches exactly."""
    import math

    from etl_zero_spark.operators.text import chunk_documents

    def oracle(words, chunk, stride):
        n = len(words)
        if n == 0:
            return []
        last = max(1, min(n, math.ceil((n - chunk) / stride) * stride + 1))
        return [
            (i, words[s - 1 : s - 1 + chunk])
            for i, s in enumerate(range(1, last + 1, stride))
        ]

    docs = [(L, " ".join(f"w{i}" for i in range(L))) for L in range(14)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for chunk, stride in [(1, 1), (1, 3), (2, 2), (3, 1), (3, 5),
                          (4, 3), (5, 2), (6, 6), (6, 8)]:
        got = {}
        for r in chunk_documents(df, chunk, stride).collect():
            got.setdefault(r.doc_id, []).append(
                (r.chunk_id, r.chunk_text.split(" ") if r.chunk_text else [])
            )
        for L, text in docs:
            words = text.split() if text else []
            want = oracle(words, chunk, stride)
            assert sorted(got.get(L, [])) == want, (
                f"chunk={chunk} stride={stride} len={L}: "
                f"{sorted(got.get(L, []))} != {want}"
            )


def test_strip_html_extraction(spark):
    """R6: WET-style HTML -> text. Script/style/comment CONTENT gone,
    block boundaries keep words separate, entities decode, whitespace
    collapses; non-HTML text passes through unchanged."""
    from etl_zero_spark.operators.text import strip_html

    html = (
        "<html><head><title>T</title>"
        "<style>body { color: red }</style>"
        "<script>var x = 'evil';</script></head>"
        "<body><!-- hidden -->"
        "<h1>Header</h1><p>First &amp; second &lt;para&gt;.</p>"
        "<div>Third&nbsp;one</div>"
        "<ul><li>alpha</li><li>beta</li></ul>"
        "<a href='x'>a link</a> tail</body></html>"
    )
    df = spark.createDataFrame(
        [(1, html), (2, "plain text stays"), (3, None)], "doc_id long, text string"
    )
    out = {r.doc_id: r.text for r in strip_html(df).collect()}
    got = out[1]
    assert "color" not in got and "evil" not in got and "hidden" not in got
    # the ONLY '<' left is the decoded &lt; entity — no residual tags
    assert got.count("<") == 1 and "<para>" in got
    assert "Header" in got and "First & second <para>." in got
    assert "Third one" in got
    assert "alpha" in got and "beta" in got and "a link tail" in got
    # block boundary: a newline separates header from paragraph
    assert "Header\nFirst" in got
    assert out[2] == "plain text stays"
    assert out[3] is None


def test_strip_html_double_encoded_entities_single_decode(spark):
    """Review r6: '&amp;lt;' is an author-escaped literal '&lt;' — one
    decode pass must yield '&lt;', never double-decode to '<'."""
    from etl_zero_spark.operators.text import strip_html

    df = spark.createDataFrame(
        [(1, "<p>use &amp;lt;b&amp;gt; to bold</p>")], "doc_id long, text string"
    )
    got = strip_html(df).collect()[0].text
    assert got == "use &lt;b&gt; to bold"


def test_normalize_text_codegen_pass(spark):
    """R6: Unicode hygiene before hashing — zero-widths dropped, NBSP
    to space, curly quotes/dashes/ellipsis to ASCII, controls stripped,
    visually-equal variants hash equal afterward."""
    from etl_zero_spark.operators.text import normalize_text

    a = "café ‘quoted’ “double” – dash…"
    b = (
        "café 'quoted'​ \"double\" -­ dash..."
        "\x07"  # bell control char
    )
    df = spark.createDataFrame([(1, a), (2, b), (3, None)], "doc_id long, text string")
    out = {r.doc_id: r.text for r in normalize_text(df).collect()}
    assert out[1] == "café 'quoted' \"double\" - dash..."
    assert out[1] == out[2]  # variants collapse to one form
    assert out[3] is None


def test_normalize_text_nfkc_pass(spark):
    from etl_zero_spark.operators.text import normalize_text

    df = spark.createDataFrame(
        [(1, "ﬁle ＡＢＣ x²")], "doc_id long, text string"
    )
    got = normalize_text(df, nfkc=True).collect()[0].text
    assert got == "file ABC x2"
    # plan sanity: exactly one Arrow stage, no shuffle
    from etl_zero_spark.plans.audit import plan_digest

    d = plan_digest(normalize_text(df, nfkc=True))
    assert d["exchanges"] == 0 and d["arrow_python"] == 1
