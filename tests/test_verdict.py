"""Verdict combination semantics (reference comprehensive_detector.py:503-777)."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_quality_monitoring_spark.operators.rules import FINDING_TYPE
from data_quality_monitoring_spark.operators.verdict import priority_verdict, weighted_verdict

SCHEMA = T.StructType(
    [T.StructField(m, FINDING_TYPE, True) for m in ("validation", "pattern", "ml", "llm")]
)


def _finding(code, prob):
    return {"rule": code.lower(), "code": code, "probability": prob}


def _run(spark, rows, fn, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    findings = {m: F.col(m) for m in ("validation", "pattern", "ml", "llm")}
    return [r["v"] for r in df.select(fn(findings, **kw).alias("v")).collect()]


def test_priority_order(spark):
    rows = [
        # all four present → validation wins, status ERROR
        (_finding("V", 0.5), _finding("P", 0.9), _finding("M", 0.9), _finding("L", 0.9)),
        # pattern+ml → pattern wins, status ANOMALY
        (None, _finding("P", 0.9), _finding("M", 0.95), None),
        # ml only
        (None, None, _finding("M", 0.9), None),
        # llm only
        (None, None, None, _finding("L", 0.9)),
        # nothing
        (None, None, None, None),
    ]
    out = _run(spark, rows, priority_verdict)
    assert [None if v is None else (v["method"], v["status"]) for v in out] == [
        ("validation", "ERROR"),
        ("pattern", "ANOMALY"),
        ("ml", "ANOMALY"),
        ("llm", "ANOMALY"),
        None,
    ]


def test_threshold_gating(spark):
    rows = [
        # pattern below its 0.7 threshold → falls through to llm (0.6 thr)
        (None, _finding("P", 0.65), None, _finding("L", 0.65)),
        # validation threshold is 0.0 → even prob 0 wins
        (_finding("V", 0.0), _finding("P", 0.99), None, None),
        # everything below thresholds → keep
        (None, _finding("P", 0.5), _finding("M", 0.5), _finding("L", 0.5)),
    ]
    out = _run(spark, rows, priority_verdict)
    assert [None if v is None else v["code"] for v in out] == ["L", "V", None]


def test_weighted_combination(spark):
    rows = [
        # validation always wins regardless of weights
        (_finding("V", 0.1), _finding("P", 0.99), _finding("M", 0.99), _finding("L", 0.99)),
        # single strong anomaly: 0.9 * 1/3 = 0.3 → exactly at cutoff → fires
        (None, _finding("P", 0.9), None, None),
        # 0.75 * 1/3 = 0.25 < 0.3 → keep
        (None, _finding("P", 0.75), None, None),
        # two methods: 0.8/3 + 0.7/3 = 0.5 → fires; best detection is P (0.8)
        (None, _finding("P", 0.8), None, _finding("L", 0.7)),
    ]
    out = _run(spark, rows, weighted_verdict)
    assert out[0]["method"] == "validation"
    assert out[1] is not None and out[1]["status"] == "ANOMALY"
    assert out[2] is None
    assert out[3]["method"] == "pattern" and abs(out[3]["probability"] - 0.5) < 1e-9


def test_weighted_custom_weights(spark):
    rows = [(None, _finding("P", 0.9), None, None)]
    out = _run(spark, rows, weighted_verdict, weights={"pattern": 0.1, "ml": 0.45, "llm": 0.45})
    assert out[0] is None  # 0.9*0.1 = 0.09 < 0.3


def test_quality_model_as_fifth_method(spark):
    """Opt-in learned quality tier: absent from the default method set (so
    reference parity is untouched), and when enabled it catches junk that
    the enabled heuristic slice passes."""
    import pandas as pd
    from pyspark.sql import functions as F

    from data_quality_monitoring_spark.plans.pipeline import quality_filter

    import numpy as np

    # junk the FULL default ruleset passes (every heuristic satisfied:
    # length, stopwords, ratios, distinct words) but whose char n-grams
    # are consonant salad — exactly the gap a learned tier closes
    rng = np.random.default_rng(7)
    alpha = np.array(list("zxqvwkjfbpg"))
    stops = (
        "the of and to in is was for that it with as his on be at by this "
        "had not are but from or have an they which one you"
    ).split()
    gib = ["".join(rng.choice(alpha, size=int(rng.integers(4, 9)))) for _ in range(40)]
    junk = " ".join(t for i in range(40) for t in (stops[i % len(stops)], gib[i]))

    clean = (
        "the of and to in is was for that it with as his on be "
        "at by this had not are but from or have an they which "
        "one you were her all she there would their we him been has"
    )
    pages = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["u_clean", "u_junk"],
                "warc_ts": pd.to_datetime(["2024-01-01", "2024-01-01"]),
                "html": [None, None],
                "text": [clean, junk],
                "lang": ["en", "en"],
            }
        )
    )
    base = quality_filter(spark, pages, methods=["validation"])
    rows = {r["url"]: r for r in base.select("url", "keep").collect()}
    assert rows["u_junk"]["keep"]  # full default ruleset passes the junk

    mlq = quality_filter(spark, pages, methods=["validation", "quality_model"])
    rows = {r["url"]: r for r in mlq.select("url", "keep", "verdict").collect()}
    assert rows["u_clean"]["keep"]
    assert not rows["u_junk"]["keep"]
    assert rows["u_junk"]["verdict"]["method"] == "quality_model"
    assert rows["u_junk"]["verdict"]["code"] == "LOW_QUALITY_MODEL"


def test_cascade_preserves_keep_and_nulls_scores(spark):
    """cascade=True: keep/drop identical under both combiners; scorer
    columns NULL exactly where the rule chain already condemned the doc."""
    from pyspark.sql import functions as F

    from data_quality_monitoring_spark.datagen import generate_pages
    from data_quality_monitoring_spark.plans.pipeline import quality_filter

    pages = generate_pages(spark, 400, partitions=4).cache()
    for combine in ("priority", "weighted"):
        full = quality_filter(spark, pages, combine=combine).select(
            "url", "keep", "f_validation", "ppl_score"
        )
        casc = quality_filter(spark, pages, combine=combine, cascade=True).select(
            "url",
            F.col("keep").alias("keep_c"),
            F.col("f_validation").alias("fv_c"),
            F.col("ppl_score").alias("ppl_c"),
        )
        j = full.join(casc, "url").cache()
        assert j.filter("keep <> keep_c").count() == 0, combine
        # condemned rows: scorers skipped → NULL score
        assert j.filter("fv_c IS NOT NULL AND ppl_c IS NOT NULL").count() == 0
        # surviving rows: identical scores
        assert (
            j.filter("fv_c IS NULL")
            .filter("ppl_score IS DISTINCT FROM ppl_c")
            .count()
            == 0
        )
        j.unpersist()
    pages.unpersist()
