"""Streaming filter: availableNow drain must match the batch run exactly,
and the checkpoint must make re-triggering a no-op."""

from pyspark.sql import functions as F

from data_quality_monitoring_spark.datagen import generate_pages
from data_quality_monitoring_spark.plans.pipeline import quality_filter
from data_quality_monitoring_spark.streaming.stream_filter import start_filter


def test_stream_matches_batch(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    pages = generate_pages(spark, 320, partitions=4)
    pages.write.parquet(in_dir)

    q = start_filter(spark, in_dir, out_dir, ckpt, available_now=True)
    q.awaitTermination(300)

    streamed = (
        spark.read.parquet(out_dir)
        .select("url", "keep", "text_scrubbed")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    batch = (
        quality_filter(spark, spark.read.parquet(in_dir))
        .select("url", "keep", "text_scrubbed")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert len(streamed) == 320
    assert streamed.equals(batch)

    # exactly-once: draining again with the same checkpoint adds nothing
    q2 = start_filter(spark, in_dir, out_dir, ckpt, available_now=True)
    q2.awaitTermination(300)
    assert spark.read.parquet(out_dir).count() == 320


def test_stream_incremental_files(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    generate_pages(spark, 160, partitions=2).write.parquet(in_dir)
    q = start_filter(spark, in_dir, out_dir, ckpt, available_now=True)
    q.awaitTermination(300)
    n1 = spark.read.parquet(out_dir).count()
    assert n1 == 160
    # new files land → only the delta is processed
    generate_pages(spark, 480, partitions=2).filter(
        F.regexp_extract("url", r"/page/(\d+)$", 1).cast("long") >= 160
    ).write.mode("append").parquet(in_dir)
    q2 = start_filter(spark, in_dir, out_dir, ckpt, available_now=True)
    q2.awaitTermination(300)
    assert spark.read.parquet(out_dir).count() == 480
