"""Bucketed tables: shuffle-free co-located joins for repeated big joins.

At 100 TB the expensive joins (pages↔labels, lineitem↔orders) repeat every
run; bucketing both sides on the join key at write time removes the shuffle
from EVERY subsequent join — the classic pay-once layout optimisation.
Spark's ``bucketBy`` requires a saved table (metastore-managed), so these
helpers wrap ``saveAsTable`` with a warehouse under the caller's control.

The test asserts the property that matters: a join of two tables bucketed
on the join key plans with ZERO Exchange operators, where the unbucketed
join plans with two.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, bucket_col: str, n_buckets: int = 16
) -> None:
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, left_key: str, right_key: str
) -> DataFrame:
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key])


def count_exchanges(df: DataFrame) -> int:
    return df._jdf.queryExecution().executedPlan().toString().count("Exchange")
