"""The BASELINE.json acceptance gate: F1 ≥ 0.99 keep/drop parity vs the
pure-Python oracle labeler and byte-identical text_scrubbed per url, plus
the metamorphic invariants from SURVEY.md §5 (row-order / partition-count
independence)."""

import pandas as pd
import pytest

from data_quality_monitoring_spark.datagen import generate_pages, generate_pages_pandas
from data_quality_monitoring_spark.oracle import label_pages
from data_quality_monitoring_spark.plans.pipeline import (
    default_pattern_cfg,
    default_rules,
    quality_filter,
)

N_DOCS = 800


@pytest.fixture(scope="module")
def oracle_labels():
    return label_pages(generate_pages_pandas(N_DOCS), default_rules(), default_pattern_cfg())


@pytest.fixture(scope="module")
def spark_result(spark):
    pages = generate_pages(spark, N_DOCS, partitions=8)
    return (
        quality_filter(spark, pages)
        .select("url", "keep", "text_scrubbed", "verdict.code", "verdict.method")
        .toPandas()
    )


def _f1(pred_drop: pd.Series, true_drop: pd.Series) -> float:
    tp = int((pred_drop & true_drop).sum())
    fp = int((pred_drop & ~true_drop).sum())
    fn = int((~pred_drop & true_drop).sum())
    if tp == 0:
        return 0.0
    p, r = tp / (tp + fp), tp / (tp + fn)
    return 2 * p * r / (p + r)


def test_keep_drop_f1(spark_result, oracle_labels):
    m = spark_result.merge(oracle_labels, on="url", suffixes=("_s", "_o"))
    assert len(m) == N_DOCS
    f1 = _f1(~m["keep_s"], ~m["keep_o"])
    assert f1 >= 0.99, f"keep/drop F1 {f1} below gate"


def test_verdict_code_parity(spark_result, oracle_labels):
    m = spark_result.merge(oracle_labels, on="url", suffixes=("_s", "_o"))
    mismatch = m[m["code_s"].fillna("-") != m["code_o"].fillna("-")]
    assert len(mismatch) == 0, mismatch.head()


def test_scrub_byte_identical(spark_result, oracle_labels):
    m = spark_result.merge(oracle_labels, on="url", suffixes=("_s", "_o"))
    s = m["text_scrubbed_s"].fillna("@NULL@")
    o = m["text_scrubbed_o"].fillna("@NULL@")
    assert (s == o).all()


def test_partition_count_invariance(spark):
    a = (
        quality_filter(spark, generate_pages(spark, 320, partitions=2))
        .select("url", "keep", "verdict.code")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    b = (
        quality_filter(spark, generate_pages(spark, 320, partitions=16))
        .select("url", "keep", "verdict.code")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_clean_docs_never_flagged_missing_or_empty(spark_result):
    flagged = spark_result[spark_result["code"].isin(["MISSING", "EMPTY"])]
    ids = flagged["url"].str.extract(r"/page/(\d+)$")[0].astype(int)
    assert ((ids % 97 == 13) | (ids % 97 == 29)).all()  # only the injected nulls/empties


def test_llm_slot_decides_end_to_end(spark):
    """English-charset gibberish passes langid but must be dropped by the
    perplexity (llm) slot — keeps the priority chain's last stage live."""
    import datetime

    from data_quality_monitoring_spark.datagen import PAGES_SCHEMA

    gib = " ".join(["thave onthe warthe hade thiso andthe ofthe theyt"] * 12)
    df = spark.createDataFrame(
        [("https://h/x", datetime.datetime(2024, 1, 1), None, gib, "en")], PAGES_SCHEMA
    )
    row = quality_filter(spark, df).select("verdict.method", "verdict.code").collect()[0]
    assert (row["method"], row["code"]) == ("llm", "HIGH_PERPLEXITY")
