"""Bucketed co-located join: zero shuffles where the plain join shuffles both sides."""

from pyspark.sql import functions as F

from data_quality_monitoring_spark.sources.bucketed import (
    bucketed_join,
    count_exchanges,
    write_bucketed,
)

SF = "/root/testdata/sf0.001"


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    # warehouse.dir is static config; give the database its own location
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bdemo LOCATION '{tmp_path / 'wh'}'")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet")

    # disable broadcast so the comparison is shuffle-join vs bucket-join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = li.join(o, li.l_orderkey == o.o_orderkey)
        assert count_exchanges(plain) >= 2  # both sides shuffle

        write_bucketed(li, "bdemo.li_b", "l_orderkey", 8)
        write_bucketed(o, "bdemo.o_b", "o_orderkey", 8)
        bucketed = bucketed_join(spark, "bdemo.li_b", "bdemo.o_b", "l_orderkey", "o_orderkey")
        assert count_exchanges(bucketed) == 0  # co-located: no shuffle at all

        # and it computes the same answer
        assert bucketed.count() == plain.count()
        a = plain.agg(F.sum("l_quantity")).collect()[0][0]
        b = bucketed.agg(F.sum("l_quantity")).collect()[0][0]
        assert a == b
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS bdemo.li_b")
        spark.sql("DROP TABLE IF EXISTS bdemo.o_b")
