"""Scrub chain: native regexp_replace vs Python re vs per-string — byte parity."""

import pandas as pd
from pyspark.sql import functions as F

from data_quality_monitoring_spark.operators.scrub import (
    DEFAULT_SCRUB_CHAIN,
    scrub_column,
    scrub_pandas,
    scrub_str,
)

SAMPLES = [
    "mail me at a.b+c@sub.example.org today",
    "call +1-555-123-4567 or (555) 987-6543 now",
    "ssn 123-45-6789 card 4111-1111-1111-1111 ip 10.0.0.1",
    "that Frakking GORRAM thing",
    "overlap: bob@x.io +1 555 111 2222 123-45-6789",
    "clean text with no pii at all",
    "",
]

EXPECTED = [
    "mail me at [EMAIL] today",
    "call [PHONE] or [PHONE] now",
    "ssn [SSN] card [CARD] ip [IP]",
    "that [REDACTED] [REDACTED] thing",
    "overlap: [EMAIL] [PHONE] [SSN]",
    "clean text with no pii at all",
    "",
]


def test_scrub_str_expected():
    assert [scrub_str(s) for s in SAMPLES] == EXPECTED
    assert scrub_str(None) is None


def test_three_paths_byte_identical(spark):
    py = [scrub_str(s) for s in SAMPLES]
    pd_out = list(scrub_pandas(pd.Series(SAMPLES)))
    df = spark.createDataFrame([(s,) for s in SAMPLES], ["t"])
    native = [r["s"] for r in df.select(scrub_column(F.col("t")).alias("s")).collect()]
    assert py == pd_out == native == EXPECTED


def test_chain_order_email_before_phone():
    # digits inside an email must be eaten by the email rule, not phone
    s = "x 555-123-4567@domain.com y"
    assert scrub_str(s) == "x [EMAIL] y"
    names = [n for n, _, _ in DEFAULT_SCRUB_CHAIN]
    assert names.index("email") < names.index("phone_us")


def test_canonicalize_url_branches(spark):
    """Every normalization branch on hand-picked literals."""
    from pyspark.sql import functions as F

    from data_quality_monitoring_spark.operators.urls import canonicalize_url, url_host

    cases = [
        ("http://WWW.Ex.COM:80//a//b/?b=2&utm_source=x&a=1#frag",
         "http://ex.com/a/b?a=1&b=2"),
        ("https://site.com:443/", "https://site.com"),
        ("https://site.com:8443/x", "https://site.com:8443/x"),
        ("http://site.com:443/x", "http://site.com:443/x"),
        ("https://www.site.com/?utm_medium=rss&fbclid=abc&gclid&ref=hn",
         "https://site.com"),
        ("HTTP://a.B.c/Path/Stays/Case/", "http://a.b.c/Path/Stays/Case"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r[0] for r in df.select(canonicalize_url(F.col("url"))).collect()]
    assert got == [want for _, want in cases]

    hosts = [r[0] for r in df.select(url_host(F.col("url"))).collect()]
    assert hosts == ["ex.com", "site.com", "site.com", "site.com", "site.com", "a.b.c"]
