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


def test_streaming_dedup(spark, tmp_path):
    from data_quality_monitoring_spark.streaming.stream_filter import (
        deduped_stream,
        read_page_stream,
    )

    in_dir = str(tmp_path / "in")
    pages = generate_pages(spark, 160, partitions=2)
    # duplicate every page once
    pages.unionAll(pages).write.parquet(in_dir)
    out = deduped_stream(read_page_stream(spark, in_dir))
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_t")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("select count(*) n, count(distinct url) d from dedup_t").collect()[0]
    assert got["n"] == got["d"] == 160


def test_stateful_host_stats(spark, tmp_path):
    from data_quality_monitoring_spark.streaming.stream_filter import (
        read_page_stream,
        stateful_host_stats,
    )

    in_dir = str(tmp_path / "in")
    generate_pages(spark, 320, partitions=2).write.parquet(in_dir)
    out = stateful_host_stats(spark, read_page_stream(spark, in_dir, max_files=1))
    q = (
        out.writeStream.format("memory")
        .queryName("hosts_t")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    import pandas as pd

    upd = spark.sql("select * from hosts_t").toPandas()
    # last update per host must equal the batch ground truth
    final = upd.groupby("host").agg({"n_pages": "max", "n_dropped": "max"})
    from data_quality_monitoring_spark.operators.urls import url_host

    truth = (
        quality_filter(spark, spark.read.parquet(in_dir))
        .groupBy(url_host(F.col("url")).alias("host"))
        .agg(F.count("*").alias("n_pages"), F.sum((~F.col("keep")).cast("long")).alias("n_dropped"))
        .toPandas()
        .set_index("host")
    )
    joined = final.join(truth, lsuffix="_s", rsuffix="_t")
    assert (joined["n_pages_s"] == joined["n_pages_t"]).all()
    assert (joined["n_dropped_s"] == joined["n_dropped_t"]).all()


def test_windowed_fire_counts_matches_batch(spark, tmp_path):
    """The streaming filter-metrics table equals the batch
    rule_fire_counts over the same pages, per event-time window."""
    from data_quality_monitoring_spark.operators.metrics import rule_fire_counts
    from data_quality_monitoring_spark.streaming.stream_filter import (
        read_page_stream,
        windowed_fire_counts,
    )

    in_dir = str(tmp_path / "in")
    generate_pages(spark, 320, partitions=2).write.parquet(in_dir)
    # update mode: append would only emit windows the watermark has
    # CLOSED, and the last windows of a finite drain never close.  The
    # two input files fit one microbatch (maxFilesPerTrigger=16), so the
    # single update per key is the final count.
    out = windowed_fire_counts(spark, read_page_stream(spark, in_dir))
    q = (
        out.writeStream.format("memory")
        .queryName("fires_t")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = (
        spark.sql("select * from fires_t").toPandas()
        .sort_values(["window_start", "method", "code"]).reset_index(drop=True)
    )
    truth = (
        rule_fire_counts(
            quality_filter(spark, spark.read.parquet(in_dir)),
            group_cols=(F.window("warc_ts", "1 hour").alias("w"),),
        )
        .select(F.col("w.start").alias("window_start"), "method", "code", "n")
        .toPandas()
        .sort_values(["window_start", "method", "code"]).reset_index(drop=True)
    )
    assert len(got) > 0
    assert got.equals(truth)


def test_stream_extracts_from_raw_html(spark, tmp_path):
    """Raw-payload ingestion: a stream whose pages carry only html (text
    NULL) runs extract→filter and lands exactly where the batch compose
    does — the upstream WARC path works under Structured Streaming."""
    from pyspark.sql import functions as F

    from data_quality_monitoring_spark.operators.extract import extract_pages
    from data_quality_monitoring_spark.streaming.stream_filter import read_page_stream

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    raw = generate_pages(spark, 256, partitions=4).withColumn(
        "text", F.lit(None).cast("string")
    )
    raw.write.parquet(in_dir)

    stream = quality_filter(spark, extract_pages(read_page_stream(spark, in_dir)))
    q = (
        stream.select("url", "keep", "text_scrubbed")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    streamed = (
        spark.read.parquet(out_dir)
        .toPandas().sort_values("url").reset_index(drop=True)
    )
    batch = (
        quality_filter(spark, extract_pages(spark.read.parquet(in_dir)))
        .select("url", "keep", "text_scrubbed")
        .toPandas().sort_values("url").reset_index(drop=True)
    )
    assert len(streamed) == 256
    assert streamed.equals(batch)
    assert streamed.keep.sum() > 0 and (~streamed.keep).sum() > 0


def test_stream_gates_match_batch(spark, tmp_path):
    """filtered_stream(gopher_gate/c4_clean) applies the SAME scan-local
    gates the batch CLI flags do — streamed output equals the batch
    expression tree run over the same files."""
    from pyspark.sql import functions as F

    from data_quality_monitoring_spark.operators.normalize import c4_clean_df
    from data_quality_monitoring_spark.operators.textstats import gopher_gate_df
    from data_quality_monitoring_spark.streaming.stream_filter import (
        filtered_stream,
        read_page_stream,
    )

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    generate_pages(spark, 160, partitions=4).write.parquet(in_dir)

    out = filtered_stream(
        spark, read_page_stream(spark, in_dir), gopher_gate=True, c4_clean=True
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    batch = quality_filter(spark, spark.read.parquet(in_dir)).select(
        "url", "keep", "text_scrubbed"
    )
    batch = (
        c4_clean_df(batch, "text_scrubbed")
        .withColumn("keep", F.col("keep") & F.col("keep_c4"))
        .withColumn("text_scrubbed", F.col("text_c4"))
        .drop("keep_c4", "text_c4")
    )
    batch = (
        gopher_gate_df(batch, "text_scrubbed", out_col="_g")
        .withColumn("keep", F.col("keep") & F.col("_g"))
        .drop("_g")
    )
    b = batch.toPandas().sort_values("url").reset_index(drop=True)
    s = (
        spark.read.parquet(out_dir)
        .select("url", "keep", "text_scrubbed")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert len(s) == 160
    assert s[["url", "keep", "text_scrubbed"]].equals(b[["url", "keep", "text_scrubbed"]])
