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


def test_mixture_sample_greedy_quota(spark):
    """Greedy md5-ordered prefix per source: quota binds, overshoots by at
    most one doc, unknown sources get quota 0."""
    from pyspark.sql import functions as F

    from data_quality_monitoring_spark.operators.sampling import mixture_sample

    docs = spark.createDataFrame(
        [(i, "a" if i < 6 else ("b" if i < 10 else "ghost"), 100) for i in range(12)],
        "doc_id long, source string, n_tokens int",
    )
    weights = spark.createDataFrame(
        [("a", 3.0), ("b", 1.0)], "source string, weight double"
    )
    # budget 400 → a: 300 tokens (3 docs), b: 100 tokens (1 doc)
    out = mixture_sample(docs, weights, token_budget=400.0).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    assert sum(r["mix_keep"] for r in by_src["a"]) == 3
    assert sum(r["mix_keep"] for r in by_src["b"]) == 1
    assert not any(r["mix_keep"] for r in by_src["ghost"])  # no weight row
    # kept set = the md5-order prefix (deterministic across reruns)
    import hashlib

    order = sorted(
        (r["doc_id"] for r in by_src["a"]),
        key=lambda i: hashlib.md5(str(i).encode()).hexdigest(),
    )
    kept = {r["doc_id"] for r in by_src["a"] if r["mix_keep"]}
    assert kept == set(order[:3])

    # overshoot-by-at-most-one: tokens before the last kept doc < quota
    docs2 = spark.createDataFrame(
        [(1, "a", 250), (2, "a", 250), (3, "a", 250)],
        "doc_id long, source string, n_tokens int",
    )
    w2 = spark.createDataFrame([("a", 1.0)], "source string, weight double")
    out2 = mixture_sample(docs2, w2, token_budget=300.0).collect()
    assert sum(r["mix_keep"] for r in out2) == 2  # 250 + 250 admits, third blocked


def _dsir_corpus(spark):
    """Half the corpus speaks 'target' vocabulary, half 'junk'."""
    rows = []
    for i in range(200):
        if i % 2 == 0:
            rows.append((i, "science method result analysis experiment data " * 8, "en"))
        else:
            rows.append((i, "zzz qqq xxx buy now click here spam offer " * 8, "xx"))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_dsir_scores_separate_target_from_junk(spark):
    from data_quality_monitoring_spark.operators.sampling import dsir_scores

    d = _dsir_corpus(spark)
    target = d.filter(F.col("lang") == "en")
    s = dsir_scores(d, target, "doc_id").toPandas().set_index("doc_id")
    tgt = s.loc[[i for i in range(200) if i % 2 == 0], "avg_log_ratio"]
    junk = s.loc[[i for i in range(200) if i % 2 == 1], "avg_log_ratio"]
    assert tgt.min() > junk.max()  # perfect separation on disjoint vocab
    assert len(s) == 200  # every doc scored, even off-target


def test_dsir_sample_prefers_target_and_is_deterministic(spark):
    from data_quality_monitoring_spark.operators.sampling import dsir_sample

    d = _dsir_corpus(spark)
    target = d.filter(F.col("lang") == "en")
    top = dsir_sample(d, target, "doc_id", n=50, seed=7).toPandas()
    assert len(top) == 50
    assert (top["rank"].sort_values().values == list(range(1, 51))).all()
    # Gumbel noise is O(1), the vocab log-ratio gap is large → mostly target
    assert sum(i % 2 == 0 for i in top["doc_id"]) >= 45
    rerun = dsir_sample(d.repartition(13), target, "doc_id", n=50, seed=7).toPandas()
    assert top.sort_values("rank")["doc_id"].tolist() == \
        rerun.sort_values("rank")["doc_id"].tolist()
    # a different seed reshuffles the Gumbel draws
    other = dsir_sample(d, target, "doc_id", n=50, seed=8).toPandas()
    assert top["doc_id"].tolist() != other["doc_id"].tolist()
