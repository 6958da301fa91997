"""Pattern-based detector semantics (reference pattern_based_detector.py:204-252)."""

import pandas as pd
from pyspark.sql import functions as F

from data_quality_monitoring_spark.operators.patterns import pattern_finding
from data_quality_monitoring_spark.oracle import pattern_detect

CFG = {
    "format_patterns": ["[a-z]{2}"],
    "not_empty": True,
    "max_length": 2,
    "known_values": ["en", "de", "nl", "fr", "# comment entry", "# zz"],
    "probabilities": {"UNKNOWN_VALUE": 0.85, "UNKNOWN_VALUE_CLOSE": 0.75},
}

CASES = [
    ("en", None, None),
    ("EN", ("INVALID_FORMAT", 0.8), None),  # format runs on the case-preserved value
    (" de ", None, None),  # stripped before checks (reference :218)
    ("E!", ("INVALID_FORMAT", 0.8), None),
    ("eng", None, ("MAX_LENGTH", 0.8)),  # format [a-z]{2} is re.match → prefix ok
    ("xx", ("UNKNOWN_VALUE", 0.85), None),
    ("ex", ("UNKNOWN_VALUE", 0.85), None),
    ("zz", ("UNKNOWN_VALUE", 0.85), None),  # '#'-comment entries must not count
    (None, None, None),  # null skipped entirely
    ("  ", None, None),  # blank skipped entirely
]


def test_pattern_matches_oracle(spark):
    values = [c[0] for c in CASES]
    expected = [c[1] or c[2] for c in CASES]
    oracle = [pattern_detect(v, CFG) for v in values]
    assert [(None if o is None else (o["code"], o["probability"])) for o in oracle] == expected

    df = spark.createDataFrame(pd.DataFrame({"v": pd.Series(values, dtype="object")}))
    got = df.select(pattern_finding(F.col("v"), CFG).alias("f")).toPandas()["f"]
    assert [
        (None if f is None else (f["code"], f["probability"])) for f in got
    ] == expected


def test_close_match_probability(spark):
    # bidirectional 3-char prefix vs a known value → 0.75, else 0.85
    cfg = {"known_values": ["cotton", "wool"], "probabilities": {}}
    df = spark.createDataFrame([("cottin",), ("steel",), ("co",)], ["v"])
    got = df.select(pattern_finding(F.col("v"), cfg).alias("f")).toPandas()["f"]
    assert got[0]["probability"] == 0.75
    assert got[1]["probability"] == 0.85
    assert got[2]["probability"] == 0.75  # known.startswith(norm[:3]) direction
    assert pattern_detect("cottin", cfg)["probability"] == 0.75
    assert pattern_detect("steel", cfg)["probability"] == 0.85
    assert pattern_detect("co", cfg)["probability"] == 0.75
