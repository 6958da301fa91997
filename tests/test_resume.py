"""Kill-and-resume: a run killed mid-way must resume from the last committed
snapshot and converge to the exact table a clean run produces, with one
lineage row per bucket and no double counting (north-rule requirement)."""

import pytest
from pyspark.sql import functions as F

from data_quality_monitoring_spark.datagen import generate_pages
from data_quality_monitoring_spark.plans.pipeline import quality_filter
from data_quality_monitoring_spark.sources.manifest import PartitionedSink

N_DOCS = 640


def _transform(spark):
    def t(slice_df):
        res = quality_filter(spark, slice_df)
        return res.select("url", "keep", "text_scrubbed", "bucket")

    return t


@pytest.fixture()
def pages(spark):
    return generate_pages(spark, N_DOCS, partitions=8)


def _table(sink, spark):
    return (
        sink.result(spark)
        .select("url", "keep", "text_scrubbed", "bucket")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )


def test_kill_and_resume_identical(spark, pages, tmp_path):
    clean = PartitionedSink(str(tmp_path / "clean"), n_buckets=16, chunk_buckets=4)
    clean.run(pages, _transform(spark))

    crashy = PartitionedSink(str(tmp_path / "crashy"), n_buckets=16, chunk_buckets=4)
    with pytest.raises(RuntimeError, match="injected failure"):
        crashy.run(pages, _transform(spark), fail_after_chunks=2)
    committed_mid = crashy.committed_buckets()
    assert len(committed_mid) == 8  # 2 chunks × 4 buckets

    summary = crashy.run(pages, _transform(spark))  # resume
    assert summary["chunks_run"] == 2  # only the remaining half

    a, b = _table(clean, spark), _table(crashy, spark)
    assert a.equals(b)

    lin = crashy.lineage(spark).toPandas()
    assert len(lin) == 16 and sorted(lin["bucket"]) == list(range(16))
    assert lin["n_docs"].sum() == N_DOCS  # no double counting
    lin_clean = clean.lineage(spark).toPandas()
    m = lin.sort_values("bucket").reset_index(drop=True)
    c = lin_clean.sort_values("bucket").reset_index(drop=True)
    assert (m["checksum"].values == c["checksum"].values).all()
    assert (m["n_kept"].values == c["n_kept"].values).all()


def test_rerun_is_noop(spark, pages, tmp_path):
    sink = PartitionedSink(str(tmp_path / "t"), n_buckets=8, chunk_buckets=4)
    sink.run(pages, _transform(spark))
    before = _table(sink, spark)
    summary = sink.run(pages, _transform(spark))
    assert summary["chunks_run"] == 0
    assert _table(sink, spark).equals(before)


def test_metrics_checkpoint_and_resume(spark, pages, tmp_path):
    """Filter-metrics tables are committed per chunk alongside lineage and
    survive a crash+resume bit-identical to a clean run (north rule:
    resumable checkpoints WITH metrics tables)."""
    from data_quality_monitoring_spark.plans.pipeline import filter_metrics

    def t(slice_df):
        res = quality_filter(spark, slice_df)
        return res.select("url", "keep", "verdict", "langid", "ppl_score", "bucket")

    mfn = lambda written: filter_metrics(written, group_cols=("bucket",))

    clean = PartitionedSink(str(tmp_path / "clean"), n_buckets=8, chunk_buckets=2)
    clean.run(pages, t, metrics_fn=mfn)

    crashy = PartitionedSink(str(tmp_path / "crashy"), n_buckets=8, chunk_buckets=2)
    with pytest.raises(RuntimeError, match="injected failure"):
        crashy.run(pages, t, fail_after_chunks=2, metrics_fn=mfn)
    crashy.run(pages, t, metrics_fn=mfn)  # resume

    for name, keys in [
        ("rule_fires", ["bucket", "method", "code"]),
        ("lang_dist", ["bucket", "lang"]),
        ("ppl_hist", ["bucket", "bin"]),
    ]:
        a = (
            clean.metrics(spark, name).toPandas()
            .sort_values(keys).reset_index(drop=True)
        )
        b = (
            crashy.metrics(spark, name).toPandas()
            .sort_values(keys).reset_index(drop=True)
        )
        assert a[keys + ["n"]].equals(b[keys + ["n"]]), name
    # run-level rollup covers every doc exactly once
    total = clean.metrics(spark, "rule_fires").groupBy().sum("n").collect()[0][0]
    assert total == N_DOCS


def test_metrics_orphans_from_precommit_crash_do_not_double_count(spark, pages, tmp_path):
    """A crash BETWEEN the metrics append and the manifest commit leaves
    orphan rows at the snapshot id the resumed chunk re-writes; metrics()
    must still be exactly-once."""
    import shutil

    from pyspark.sql import functions as F

    from data_quality_monitoring_spark.plans.pipeline import filter_metrics

    def t(slice_df):
        res = quality_filter(spark, slice_df)
        return res.select("url", "keep", "verdict", "bucket")

    mfn = lambda written: {"rule_fires": filter_metrics(written, group_cols=("bucket",))["rule_fires"]}

    sink = PartitionedSink(str(tmp_path / "s"), n_buckets=8, chunk_buckets=4)
    sink.run(pages, t, metrics_fn=mfn)
    table = sink.metrics(spark, "rule_fires").toPandas()

    # simulate the pre-commit orphan: duplicate the whole metrics dir
    # content (same snapshot ids, same rows) as a second append
    src = sink.metrics_dir / "rule_fires"
    dup = spark.read.parquet(str(src))
    dup.write.mode("append").parquet(str(src))

    again = sink.metrics(spark, "rule_fires").toPandas()
    keys = ["bucket", "method", "code"]
    assert (
        again.sort_values(keys).reset_index(drop=True)[keys + ["n"]]
        .equals(table.sort_values(keys).reset_index(drop=True)[keys + ["n"]])
    )
    assert again.n.sum() == N_DOCS
