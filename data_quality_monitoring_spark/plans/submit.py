"""spark-submit entrypoint: the packaged form of the pipeline.

Ship as::

    zip -r dqm.zip data_quality_monitoring_spark
    spark-submit --py-files dqm.zip \
        --conf spark.sql.adaptive.enabled=true \
        -m data_quality_monitoring_spark.plans.submit -- \
        --input s3://bucket/pages --output s3://bucket/filtered \
        --n-buckets 4096 --chunk-buckets 256

(locally: ``python -m data_quality_monitoring_spark.plans.submit --input ...``).

Reads a pages table, runs the resumable quality filter, writes the filtered
data + lineage + filter-metrics tables (per-rule fire counts, langid
distribution, perplexity histogram).  Re-running after a crash resumes from
the last committed snapshot — that is the PartitionedSink contract.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..operators.metrics import histogram, rule_fire_counts
from ..sources.manifest import PartitionedSink
from .pipeline import quality_filter


def build_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="web-page quality filter")
    p.add_argument("--input", required=True, help="pages parquet path")
    p.add_argument("--output", required=True, help="output table root")
    p.add_argument("--n-buckets", type=int, default=64)
    p.add_argument("--chunk-buckets", type=int, default=16)
    p.add_argument("--combine", choices=["priority", "weighted"], default="priority")
    p.add_argument("--regex-engine", choices=["auto", "native", "python"], default="auto")
    return p.parse_args(argv)


def run(spark: SparkSession, args: argparse.Namespace) -> dict:
    pages = spark.read.parquet(args.input)
    sink = PartitionedSink(args.output, args.n_buckets, args.chunk_buckets)

    def transform(slice_df):
        res = quality_filter(
            spark, slice_df, combine=args.combine, regex_engine=args.regex_engine
        )
        return res.select(
            "url", "warc_ts", "lang", "keep", "verdict", "ppl_score", "text_scrubbed", "bucket"
        )

    summary = sink.run(pages, transform)

    result = sink.result(spark)
    metrics_root = f"{args.output}/_metrics"
    rule_fire_counts(result).write.mode("overwrite").parquet(f"{metrics_root}/rule_fire_counts")
    result.groupBy("lang").agg(
        F.count("*").alias("n"), F.sum(F.col("keep").cast("long")).alias("n_kept")
    ).write.mode("overwrite").parquet(f"{metrics_root}/lang_distribution")
    histogram(result, "ppl_score", 0.0, 15.0, 30).write.mode("overwrite").parquet(
        f"{metrics_root}/ppl_histogram"
    )
    return summary


def main(argv: list[str] | None = None) -> None:
    args = build_args(argv)
    spark = SparkSession.builder.appName("dqm_quality_filter").getOrCreate()
    print(json.dumps(run(spark, args)))


if __name__ == "__main__":
    main()
