"""HTML→text extraction: the north rule's byte-identical-per-url invariant.

Three seams checked:
1. round-trip — ``html_to_text(wrap_html(text)) == text`` byte-for-byte on
   the datagen corpus (Spark Column chain) and on adversarial fixtures
   (pure Python),
2. engine parity — Spark (Java regex) vs Python ``re`` vs DuckDB (RE2) on
   hand-written nasty html AND hypothesis-fuzzed bodies,
3. the plan — extraction must stay UDF-free (no ArrowEvalPython/BatchEval
   node: it runs in whole-stage codegen).
"""

import duckdb
import pandas as pd
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from data_quality_monitoring_spark.datagen import generate_pages
from data_quality_monitoring_spark.operators.extract import (
    extract_pages,
    html_to_text,
    html_to_text_py,
    html_to_text_sql,
    wrap_html,
)

NASTY_HTML = [
    b"<html><body>plain</body></html>",
    b"no tags at all",
    b"<p>a &amp; b &lt;c&gt; &quot;d&quot; &#39;e&#39; f&nbsp;g</p>",
    b"<!-- <p>commented out</p> --><p>kept</p>",
    b"<script>if (a < b && c > d) { alert('<p>not text</p>'); }</script>after",
    b"<style>p > span { color: red }</style>styled",
    b"<head><title>drop me</title><meta x=1></head><body>body only</body>",
    b"<SCRIPT SRC='x.js'>var y;</SCRIPT><P>case insensitive</P>",
    b"<div>block<br>break</div><ul><li>one</li><li>two</li></ul>",
    b"<p>unclosed paragraph",
    b"broken <tag",
    b"<p>double&amp;amp;escape</p>",
    b"  \t surrounding  ws \n\n ",
    b"<h1>title</h1><h6>sub</h6>tail",
    b"<table><tr><td>a</td></tr><tr><td>b</td></tr></table>",
    "<p>unicode café 中文</p>".encode("utf-8"),
    b"",
]


def test_python_spark_duckdb_parity_nasty(spark):
    want = [html_to_text_py(h) for h in NASTY_HTML]
    df = spark.createDataFrame(
        pd.DataFrame({"i": range(len(NASTY_HTML)), "html": NASTY_HTML})
    )
    got = (
        df.select("i", html_to_text(F.col("html")).alias("t"))
        .toPandas()
        .sort_values("i")["t"]
        .tolist()
    )
    assert got == want
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"i": range(len(NASTY_HTML)), "s": [h.decode() for h in NASTY_HTML]}))
    duck = con.execute(
        f"SELECT {html_to_text_sql('s')} AS t FROM t ORDER BY i"
    ).df()["t"].tolist()
    assert duck == want


def test_roundtrip_datagen_corpus(spark):
    """Every datagen page's html extracts to the spec output (Spark ==
    Python, byte-for-byte), and for normal-form texts — no edge
    whitespace, no blank lines, i.e. everything except the deliberately
    dirty whitespace-padded bucket — extraction reproduces ``text``
    byte-identically: the per-url invariant end to end through binary."""
    pdf = (
        generate_pages(spark, 400, partitions=4)
        .withColumn("ex", html_to_text(F.col("html")))
        .toPandas()
    )
    live = pdf[pdf.text.notna()]
    # engine parity on the whole corpus
    assert list(live.ex) == [html_to_text_py(h) for h in live.html]
    ws = " \t\n\r\f\x0b"
    normal = live[[t == t.strip(ws) and "\n" not in t for t in live.text]]
    dirty = live.drop(normal.index)
    assert len(normal) > 300  # the invariant is exercised, not vacuous
    assert (normal.ex == normal.text).all()
    # the only divergence is whitespace normalization of dirty inputs
    assert [t.strip(ws) for t in dirty.text] == [e for e in dirty.ex]
    # null text → null html → null extraction
    assert pdf[pdf.text.isna()].html.isna().all()
    assert pdf[pdf.text.isna()].ex.isna().all()


def test_extract_pages_fills_missing_text(spark):
    pdf = pd.DataFrame(
        {
            "url": ["u1", "u2"],
            "html": [wrap_html("from html", 1), wrap_html("ignored", 2)],
            "text": [None, "already extracted"],
        }
    )
    out = extract_pages(spark.createDataFrame(pdf)).toPandas().set_index("url")
    assert out.loc["u1", "text"] == "from html"
    assert out.loc["u2", "text"] == "already extracted"


def test_extraction_plan_has_no_python_udf(spark):
    pages = generate_pages(spark, 8, partitions=1)
    plan = (
        pages.select(html_to_text(F.col("html")).alias("t"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


# fuzz bodies over an alphabet rich in html metacharacters and the entity
# ampersand — where Java/RE2/Python regex semantics could diverge
_body = st.text(alphabet="ab <>&;#/!-\"'\tqXpscript", max_size=80)


@settings(max_examples=20, deadline=None)
@given(st.lists(_body, min_size=1, max_size=40))
def test_wrap_extract_roundtrip_fuzz(spark, bodies):
    # round-trip guarantee holds for line-trimmed, no-blank-line texts;
    # arbitrary fuzz text is normalized identically by all three engines
    html = [wrap_html(b, i) for i, b in enumerate(bodies)]
    want = [html_to_text_py(h) for h in html]
    df = spark.createDataFrame(
        pd.DataFrame({"i": range(len(html)), "html": html})
    )
    got = (
        df.select("i", html_to_text(F.col("html")).alias("t"))
        .toPandas()
        .sort_values("i")["t"]
        .tolist()
    )
    assert got == want
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"i": range(len(html)), "s": [h.decode() for h in html]}))
    duck = con.execute(
        f"SELECT {html_to_text_sql('s')} AS t FROM t ORDER BY i"
    ).df()["t"].tolist()
    assert duck == want


def test_malformed_bytes_do_not_kill_the_job(spark):
    """ANSI decode() throws on the first bad byte — one malformed page
    would kill a 100-TB job.  html_to_text goes through make_valid_utf8,
    which must match Python's errors='replace' byte for byte."""
    bad = [
        b"<p>ok</p>",
        b"<p>bad \xff\xfe bytes</p>",
        b"\x80\x81<p>lead</p>",
        b"caf\xc3\xa9 <p>\xe4\xb8\xad</p> tail\xc3",  # truncated sequence
    ]
    df = spark.createDataFrame(pd.DataFrame({"i": range(len(bad)), "html": bad}))
    got = (
        df.select("i", html_to_text(F.col("html")).alias("t"))
        .toPandas().sort_values("i")["t"].tolist()
    )
    assert got == [html_to_text_py(h) for h in bad]


# raw tag soup — NOT wrap_html output: unclosed tags, stray brackets,
# half-entities, mixed case, nested script-ish fragments
_soup = st.text(alphabet="<>/!-&;#abcdePSCRIPTstyle \"'\n\t.…", max_size=100)


@settings(max_examples=20, deadline=None)
@given(st.lists(_soup, min_size=1, max_size=40))
def test_raw_fragment_parity_fuzz(spark, frags):
    html = [f.encode("utf-8") for f in frags]
    want = [html_to_text_py(h) for h in html]
    df = spark.createDataFrame(pd.DataFrame({"i": range(len(html)), "html": html}))
    got = (
        df.select("i", html_to_text(F.col("html")).alias("t"))
        .toPandas().sort_values("i")["t"].tolist()
    )
    assert got == want
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"i": range(len(frags)), "s": frags}))
    duck = con.execute(
        f"SELECT {html_to_text_sql('s')} AS t FROM t ORDER BY i"
    ).df()["t"].tolist()
    assert duck == want


def _mk_warc_record(rtype, uri, body, with_http=False):
    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        if with_http
        else body
    )
    head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: " + rtype.encode() + b"\r\n"
        b"WARC-Target-URI: " + uri.encode() + b"\r\n"
        b"WARC-Date: 2024-03-05T12:30:00Z\r\n"
        b"WARC-Record-ID: <urn:uuid:" + rtype.encode() + b"-1>\r\n"
        b"Content-Length: " + str(len(payload)).encode() + b"\r\n\r\n"
    )
    return head + payload + b"\r\n\r\n"


def test_warc_source_roundtrip(spark, tmp_path):
    """Plain + multi-member-gzip WARC files → records → pages projection."""
    import gzip

    from data_quality_monitoring_spark.sources.warc import (
        parse_warc_bytes,
        read_warc,
        warc_to_pages,
    )

    r1 = _mk_warc_record("response", "http://a.com/x", b"<html>alpha</html>", with_http=True)
    r2 = _mk_warc_record("request", "http://a.com/x", b"GET /x HTTP/1.1")
    r3 = _mk_warc_record("response", "http://b.com/y", b"<html>beta</html>", with_http=True)

    # pure-function parse first
    recs = parse_warc_bytes(r1 + r2)
    assert [r["warc_type"] for r in recs] == ["response", "request"]
    assert recs[0]["html"] == b"<html>alpha</html>"  # HTTP headers stripped
    assert recs[0]["url"] == "http://a.com/x"
    assert str(recs[0]["warc_ts"]) == "2024-03-05 12:30:00"

    d = tmp_path / "warc"
    d.mkdir()
    (d / "f1.warc").write_bytes(r1 + r2)
    # Common-Crawl style: one gzip member per record, concatenated
    (d / "f2.warc.gz").write_bytes(gzip.compress(r3) + gzip.compress(r2))

    df = read_warc(spark, str(d)).cache()
    all_rows = df.collect()
    assert len(all_rows) == 4  # r2 appears in both files
    rows = {(r["url"], r["warc_type"]): r for r in all_rows}
    assert bytes(rows[("http://b.com/y", "response")]["html"]) == b"<html>beta</html>"
    assert rows[("http://a.com/x", "response")]["warc_ts"].year == 2024

    pages = warc_to_pages(df)
    got = sorted((r["url"], bytes(r["html"])) for r in pages.collect())
    assert got == [
        ("http://a.com/x", b"<html>alpha</html>"),
        ("http://b.com/y", b"<html>beta</html>"),
    ]
    assert pages.schema.simpleString() == (
        "struct<url:string,warc_ts:timestamp,html:binary,text:string,lang:string>"
    )


def test_robots_noindex_variants(spark):
    """Both attribute orders and any case flag; non-robots meta, index-only
    content, absent meta, and NULL html do not."""
    from pyspark.sql import Row

    from data_quality_monitoring_spark.operators.extract import robots_noindex

    cases = [
        (b'<meta name="robots" content="noindex, nofollow">', True),
        (b"<meta content='NOINDEX' name=robots>", True),
        (b"<META NAME=ROBOTS CONTENT=noindex>", True),
        (b'<meta name="robots" content="index, follow">', False),
        (b"<html>no meta at all</html>", False),
        (b'<meta name="description" content="noindex in prose">', False),
        (None, False),
    ]
    df = spark.createDataFrame(
        [Row(i=i, html=h) for i, (h, _) in enumerate(cases)],
        "i int, html binary",
    )
    from pyspark.sql import functions as F

    got = {
        r["i"]: r["flag"]
        for r in df.select("i", robots_noindex(F.col("html")).alias("flag")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] is want, (i, cases[i])
