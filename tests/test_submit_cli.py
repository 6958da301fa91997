"""The spark-submit entrypoint end-to-end: run, resume no-op, metrics tables."""

from data_quality_monitoring_spark.datagen import generate_pages
from data_quality_monitoring_spark.plans.submit import build_args, run


def test_submit_run_and_resume(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    generate_pages(spark, 320, partitions=4).write.parquet(in_dir)
    args = build_args(
        ["--input", in_dir, "--output", out_dir, "--n-buckets", "8", "--chunk-buckets", "4"]
    )
    summary = run(spark, args)
    assert summary["chunks_run"] == 2

    # re-run = resume no-op
    summary2 = run(spark, args)
    assert summary2["chunks_run"] == 0

    data = spark.read.parquet(f"{out_dir}/data")
    assert data.count() == 320
    assert {"url", "keep", "verdict", "ppl_score", "text_scrubbed", "bucket"} <= set(data.columns)
    for t in ("rule_fire_counts", "lang_distribution", "ppl_histogram"):
        assert spark.read.parquet(f"{out_dir}/_metrics/{t}").count() > 0
    lineage = spark.read.parquet(f"{out_dir}/_lineage")
    assert lineage.select("bucket").distinct().count() == 8
