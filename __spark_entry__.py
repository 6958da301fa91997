"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship quality-filter pipeline on sf0.001 documents.
``queries()`` / ``oracle_sql()`` — one entry per implemented operator family
from SURVEY.md §2, checked against DuckDB by the driver at sf0.01.

Implementations live in ``data_quality_monitoring_spark/entry_queries.py``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from data_quality_monitoring_spark.entry_queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full quality-filter
    pipeline (rules + pattern + langid + perplexity → priority verdict →
    scrubbed text) over the documents table."""
    return QUERIES["pipeline_verdict"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
