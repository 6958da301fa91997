"""Property-based parity fuzzing (hypothesis).

Two seams where silent divergence would be catastrophic at scale:
1. rule engine (auto) vs the pure-Python oracle — arbitrary unicode text,
2. scrub chain native (Java regex) vs Python `re` — the byte-identical
   invariant, fuzzed over PII-shaped alphabets where Java/RE2/Python corner
   cases live.

Each example evaluates a whole batch of strings in one Spark job so the
suite stays fast.
"""

import pandas as pd
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from data_quality_monitoring_spark.operators.rules import first_hit
from data_quality_monitoring_spark.operators.scrub import scrub_column, scrub_str
from data_quality_monitoring_spark.oracle import rule_first_hit

FUZZ_RULES = [
    {"type": "missing", "error_code": "MISSING"},
    {"type": "empty_string", "error_code": "EMPTY"},
    {"type": "whitespace", "error_code": "WS"},
    {"type": "regex", "pattern": r"\d{3,}", "error_code": "RX"},
    {"type": "min_words", "min_words": 3, "error_code": "NW"},
    {"type": "max_digit_ratio", "max_ratio": 0.4, "error_code": "DIG"},
    {"type": "max_symbol_ratio", "max_ratio": 0.4, "error_code": "SYM"},
    {"type": "min_distinct_word_ratio", "min_ratio": 0.4, "error_code": "REP"},
    {"type": "parenthesis_check", "error_code": "PAREN"},
    {"type": "contradiction_check", "contradiction_pairs": [["hot", "cold"]], "error_code": "CONTRA"},
]

texts = st.lists(
    st.one_of(
        st.none(),
        st.text(max_size=120),
        st.text(alphabet="abc 0123()!%hotcold\t\n", max_size=120),
    ),
    min_size=1,
    max_size=60,
)

pii_texts = st.lists(
    st.text(alphabet="abz@. -+()0123456789frakking", max_size=120),
    min_size=1,
    max_size=60,
)


@settings(max_examples=15, deadline=None)
@given(texts)
def test_rule_engine_matches_oracle_fuzz(spark, values):
    df = spark.createDataFrame(pd.DataFrame({"v": pd.Series(values, dtype="object")}))
    got = [
        None if f is None else f["code"]
        for f in df.select(first_hit(F.col("v"), FUZZ_RULES, "auto").alias("f")).toPandas()["f"]
    ]
    want = [
        None if (f := rule_first_hit(v, FUZZ_RULES)) is None else f["code"] for v in values
    ]
    assert got == want


PATTERN_CFG = {
    "format_patterns": [r"[a-z]{2}"],
    "max_length": 2,
    "min_length": 2,
    "known_values": ["en", "de", "nl", "fr", "# comment"],
}

# whitespace-padded short codes: the seam where F.trim (ASCII space only)
# diverged from the reference's str.strip() — fuzz the full class
lang_like = st.lists(
    st.one_of(
        st.none(),
        st.text(alphabet="endefr \t\n\r\f\x0b", max_size=8),
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=15, deadline=None)
@given(lang_like)
def test_pattern_detector_matches_oracle_fuzz(spark, values):
    from data_quality_monitoring_spark.operators.patterns import pattern_finding
    from data_quality_monitoring_spark.oracle import pattern_detect

    df = spark.createDataFrame(pd.DataFrame({"v": pd.Series(values, dtype="object")}))
    got = [
        None if f is None else (f["code"], f["probability"])
        for f in df.select(pattern_finding(F.col("v"), PATTERN_CFG).alias("f")).toPandas()["f"]
    ]
    want = [
        None if (f := pattern_detect(v, PATTERN_CFG)) is None else (f["code"], f["probability"])
        for v in values
    ]
    assert got == want


@settings(max_examples=15, deadline=None)
@given(pii_texts)
def test_scrub_native_matches_python_fuzz(spark, values):
    df = spark.createDataFrame(pd.DataFrame({"t": pd.Series(values, dtype="object")}))
    native = [r["s"] for r in df.select(scrub_column(F.col("t")).alias("s")).collect()]
    python = [scrub_str(t) for t in values]
    assert native == python
