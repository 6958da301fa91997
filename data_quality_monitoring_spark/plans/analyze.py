"""analyze-column entry point — the reference's profiling CLI
(``analyze_column/analyze_column.py:140-158``) as a Spark job.

Resolves a logical field via RunConfig, runs the profile aggregations
(null/distinct stats, top-k value counts, case/whitespace variant groups)
and writes a JSON report — the "filter-metrics table" entry of the north
star.

Usage: ``python -m data_quality_monitoring_spark.plans.analyze
--input pages.parquet --field lang [--config brand.json] [--out report.json]``
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import DataFrame, SparkSession

from ..config import RunConfig
from ..operators.profile import (
    case_variant_groups,
    null_stats,
    value_counts,
    whitespace_variants,
)


def analyze_column(df: DataFrame, column: str, top: int = 20) -> dict:
    stats = null_stats(df, column).collect()[0].asDict()
    counts = [r.asDict() for r in value_counts(df, column, top).collect()]
    variants = [r.asDict() for r in case_variant_groups(df, column, top).collect()]
    ws = whitespace_variants(df, column).collect()[0].asDict()
    return {
        "column": column,
        "stats": stats,
        "top_values": counts,
        "case_variant_groups": variants,
        **ws,
    }


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description="profile one column of a pages table")
    p.add_argument("--input", required=True)
    p.add_argument("--field", required=True)
    p.add_argument("--config", default=None, help="brand-style RunConfig JSON")
    p.add_argument("--out", default=None, help="write the JSON report here")
    p.add_argument("--top", type=int, default=20)
    args = p.parse_args(argv)

    spark = SparkSession.builder.appName("dqm_analyze_column").getOrCreate()
    df = spark.read.parquet(args.input)
    if args.config:
        df = RunConfig.load(args.config).apply_mapping(df)
    report = analyze_column(df, args.field, args.top)
    text = json.dumps(report, indent=2, default=str)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
    print(text)


if __name__ == "__main__":
    main()
