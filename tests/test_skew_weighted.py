"""Skew handling + weighted-combine oracle parity."""

from pyspark.sql import functions as F

from data_quality_monitoring_spark.datagen import generate_pages, generate_pages_pandas
from data_quality_monitoring_spark.oracle import label_pages
from data_quality_monitoring_spark.plans.pipeline import (
    default_pattern_cfg,
    default_rules,
    quality_filter,
    salted_group_count,
)


def test_salted_count_equals_naive_on_skewed_hosts(spark):
    """The Zipf host pool concentrates pages on a few hosts; the two-phase
    salted count must agree exactly with the naive groupBy."""
    pages = generate_pages(spark, 1600, partitions=8)
    host = F.regexp_extract("url", r"https://([^/]+)/", 1)
    naive = {
        r["h"]: r["n"] for r in pages.groupBy(host.alias("h")).agg(F.count("*").alias("n")).collect()
    }
    salted = {r["key"]: r["n"] for r in salted_group_count(pages, host, n_salt=16).collect()}
    assert salted == naive
    # the corpus really is skewed (hottest host ≫ median host)
    counts = sorted(naive.values(), reverse=True)
    assert counts[0] > 5 * counts[len(counts) // 2]


def test_weighted_combine_oracle_parity(spark):
    pages = generate_pages(spark, 640, partitions=8)
    res = (
        quality_filter(spark, pages, combine="weighted")
        .select("url", "keep", "verdict.code")
        .toPandas()
    )
    oracle = label_pages(
        generate_pages_pandas(640), default_rules(), default_pattern_cfg(), combine="weighted"
    )
    m = res.merge(oracle, on="url", suffixes=("_s", "_o"))
    assert (m["keep_s"] == m["keep_o"]).all()
    assert (m["code_s"].fillna("-") == m["code_o"].fillna("-")).all()
