"""Deterministic stratified sampling: rates, nesting, key-purity."""

from pyspark.sql import functions as F

from data_quality_monitoring_spark.operators.sampling import (
    sample_bucket,
    stratified_sample,
)


def _docs(spark, n=4000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").when(F.col("id") % 3 == 1, "de")
        .otherwise("zh").alias("lang"),
    )


def test_rates_and_determinism(spark):
    d = _docs(spark)
    s = stratified_sample(d, "doc_id", "lang", {"en": 0.5, "de": 0.2}, 0.05)
    counts = {r["lang"]: r["n"] for r in s.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # md5 buckets are uniform: realized rate within ±5 points of target
    assert abs(counts["en"] / (4000 / 3) - 0.5) < 0.05
    assert abs(counts["de"] / (4000 / 3) - 0.2) < 0.05
    assert abs(counts.get("zh", 0) / (4000 / 3) - 0.05) < 0.05
    # pure function of the key: same rows on a rerun and after repartition
    ids1 = {r["doc_id"] for r in s.collect()}
    ids2 = {r["doc_id"] for r in stratified_sample(d.repartition(7), "doc_id", "lang", {"en": 0.5, "de": 0.2}, 0.05).collect()}
    assert ids1 == ids2


def test_nested_samples(spark):
    """rate 0.1 ⊂ rate 0.3: growing a corpus keeps every earlier pick."""
    d = _docs(spark)
    small = {r["doc_id"] for r in stratified_sample(d, "doc_id", "lang", {}, 0.1).collect()}
    big = {r["doc_id"] for r in stratified_sample(d, "doc_id", "lang", {}, 0.3).collect()}
    assert small < big


def test_bucket_range(spark):
    mm = _docs(spark, 500).select(sample_bucket(F.col("doc_id")).alias("b")).agg(
        F.min("b"), F.max("b")
    ).collect()[0]
    assert 0 <= mm[0] and mm[1] <= 999
