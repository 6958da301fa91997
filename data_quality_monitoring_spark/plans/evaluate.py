"""Multi-sample statistical evaluation — the reference's ``multi-eval``
entry point (``multi_sample_evaluation/multi_sample_evaluation.py:595-1035``)
re-shaped for Spark.

The reference loops N samples through a ProcessPool, re-injecting and
re-detecting per sample.  Here all N samples live in ONE DataFrame with a
``sample_id`` column (SURVEY.md §3.2): the corpus is exploded N ways, each
replica corrupted with a sample-specific seed, the detector runs once over
the union, and per-sample P/R/F1 falls out of a single grouped confusion
join.  One job instead of N, and the per-sample loop becomes a groupBy.

Also here: the threshold-curve generator (reference ``ml_curve_generator``)
built on the single-pass sweep in operators/metrics.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.injection import inject_column
from ..operators.metrics import confusion_matrix, threshold_sweep
from .pipeline import quality_filter


def multi_sample_evaluation(
    spark: SparkSession,
    pages: DataFrame,
    injection_rules: list[dict],
    n_samples: int = 8,
    intensity: float = 0.3,
    **filter_kwargs,
) -> DataFrame:
    """Per-sample confusion metrics: one row per sample_id.

    Inject (seeded per (sample, url)) → detect → grouped confusion.
    """
    replicated = pages.withColumn(
        "sample_id", F.explode(F.array(*[F.lit(i) for i in range(n_samples)]))
    )
    # per-sample deterministic corruption: the injection key carries the
    # sample id so each replica draws independently but reproducibly
    ikey = F.concat(F.col("url"), F.lit("#s"), F.col("sample_id").cast("string"))
    inj = inject_column(F.col("text"), ikey, injection_rules, intensity)
    corrupted = (
        replicated.withColumn("_inj", inj)
        .withColumn("text", F.coalesce(F.col("_inj.corrupted"), F.col("text")))
        .withColumn("_rule", F.col("_inj.rule_name"))
        .drop("_inj")
    )
    labels = corrupted.filter(F.col("_rule").isNotNull()).select(
        "url", "sample_id", F.lit("text").alias("field")
    )
    detected = (
        quality_filter(spark, corrupted.drop("_rule"), **filter_kwargs)
        .filter(~F.col("keep"))
        .select("url", "sample_id", F.lit("text").alias("field"))
    )
    n_rows = pages.count()
    return confusion_matrix(
        detected,
        labels,
        n_rows=n_rows,
        join_cols=["url", "sample_id", "field"],
        group_cols=["sample_id"],
    ).orderBy("sample_id")


def evaluation_summary(per_sample: DataFrame) -> dict:
    """Aggregate the per-sample metrics (reference summary report,
    multi_sample_evaluation.py:274-592)."""
    agg = per_sample.agg(
        F.count("*").alias("n_samples"),
        F.round(F.avg("precision"), 4).alias("precision_mean"),
        F.round(F.stddev_pop("precision"), 4).alias("precision_std"),
        F.round(F.avg("recall"), 4).alias("recall_mean"),
        F.round(F.stddev_pop("recall"), 4).alias("recall_std"),
        F.round(F.avg("f1"), 4).alias("f1_mean"),
        F.round(F.stddev_pop("f1"), 4).alias("f1_std"),
    ).collect()[0]
    return dict(agg.asDict())


def perplexity_threshold_curve(
    spark: SparkSession,
    pages: DataFrame,
    injection_rules: list[dict],
    thresholds: list[float],
    intensity: float = 0.5,
) -> DataFrame:
    """Reference ml_curve_generator re-expressed: build a labeled test set
    by seeded corruption, score ONCE with the perplexity model, then sweep
    all thresholds in a single grouped pass."""
    from ..artifacts import get_bigram_models
    from ..operators.perplexity import perplexity_column

    inj = inject_column(F.col("text"), F.col("url"), injection_rules, intensity, "curve")
    labeled = (
        pages.withColumn("_inj", inj)
        .withColumn("text", F.coalesce(F.col("_inj.corrupted"), F.col("text")))
        .withColumn("is_anom", F.col("_inj.rule_name").isNotNull())
        .drop("_inj")
    )
    scored = labeled.withColumn(
        "score", perplexity_column(spark, get_bigram_models(), F.col("text"), F.col("lang"))
    ).filter(F.col("score").isNotNull())
    return threshold_sweep(scored, "score", "is_anom", thresholds)
