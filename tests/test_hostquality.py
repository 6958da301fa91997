"""Host-level quality aggregation (RefinedWeb-style blocklist): stats
semantics, broadcast blocklist join, and the host-stats → --host-blocklist
CLI roundtrip."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from data_quality_monitoring_spark.operators.hostquality import (
    apply_host_blocklist,
    host_quality_stats,
)


@pytest.fixture(scope="module")
def verdicted(spark):
    # hosts: spammy (30 pages, 5 kept), tiny-spammy (5 pages, 0 kept —
    # below support floor), good (25 pages, 24 kept), nulls (20 pages,
    # keep always NULL)
    rows = (
        [Row(host="spam.example", keep=i < 5) for i in range(30)]
        + [Row(host="tiny.example", keep=False) for _ in range(5)]
        + [Row(host="good.example", keep=i < 24) for i in range(25)]
        + [Row(host="null.example", keep=None) for _ in range(20)]
    )
    return spark.createDataFrame(rows, "host string, keep boolean")


def test_stats_semantics(verdicted):
    stats = {
        r["host"]: r
        for r in host_quality_stats(
            verdicted, min_support=20, min_keep_rate=0.5
        ).collect()
    }
    assert stats["spam.example"]["n_pages"] == 30
    assert stats["spam.example"]["n_kept"] == 5
    assert stats["spam.example"]["blocked"] is True
    # below the support floor: never blocked, however bad the rate
    assert stats["tiny.example"]["blocked"] is False
    assert stats["good.example"]["blocked"] is False
    assert stats["good.example"]["keep_rate"] == pytest.approx(24 / 25)
    # NULL keep counts as a drop, and a fully-NULL host can be blocked
    assert stats["null.example"]["n_kept"] == 0
    assert stats["null.example"]["blocked"] is True


def test_blocklist_join_broadcast_and_flag(spark, verdicted):
    stats = host_quality_stats(verdicted, min_support=20, min_keep_rate=0.5)
    pages = spark.createDataFrame(
        [Row(host=h, text="x") for h in
         ("spam.example", "good.example", "never-seen.example")],
        "host string, text string",
    )
    out = apply_host_blocklist(pages, stats)
    flags = {r["host"]: r["host_blocked"] for r in out.collect()}
    assert flags == {
        "spam.example": True,
        "good.example": False,
        "never-seen.example": False,  # unseen host → not blocked, never NULL
    }
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()


def test_cli_host_stats_roundtrip(spark, tmp_path):
    """filter → host-stats → filter --host-blocklist: pages on blocked
    hosts are gone from the second run's output."""
    from data_quality_monitoring_spark.datagen import generate_pages
    from data_quality_monitoring_spark.operators.urls import url_host
    from data_quality_monitoring_spark.plans.submit import (
        build_args,
        run,
        run_host_stats,
    )

    in_dir = str(tmp_path / "in")
    generate_pages(spark, 400, partitions=4).write.parquet(in_dir)

    out1 = str(tmp_path / "out1")
    run(spark, build_args(
        ["--input", in_dir, "--output", out1, "--n-buckets", "4"]))

    hosts_dir = str(tmp_path / "hosts")
    summary = run_host_stats(spark, build_args(
        ["--mode", "host-stats", "--input", f"{out1}/data",
         "--output", hosts_dir,
         # aggressive thresholds so the synthetic corpus yields blocks
         "--host-min-keep-rate", "0.8", "--host-min-support", "5"]))
    assert summary["hosts"] > 0
    assert summary["blocked_hosts"] > 0
    blocked = {
        r["host"]
        for r in spark.read.parquet(hosts_dir).filter("blocked").collect()
    }
    assert blocked

    out2 = str(tmp_path / "out2")
    run(spark, build_args(
        ["--input", in_dir, "--output", out2, "--n-buckets", "4",
         "--host-blocklist", hosts_dir]))
    d1 = spark.read.parquet(f"{out1}/data")
    d2 = spark.read.parquet(f"{out2}/data")
    # second run dropped exactly the blocked-host pages
    n_blocked_pages = d1.filter(
        url_host(F.col("url")).isin(list(blocked))
    ).count()
    assert n_blocked_pages == summary["blocked_pages"]
    assert d2.count() == d1.count() - n_blocked_pages
    assert d2.filter(url_host(F.col("url")).isin(list(blocked))).count() == 0


def test_merge_host_stats_accumulates_support(spark):
    """A host below the support floor in each single month condemns once
    cumulative counts clear it; verdicts recompute over the union."""
    from pyspark.sql import Row

    from data_quality_monitoring_spark.operators.hostquality import (
        host_quality_stats,
        merge_host_stats,
    )

    month = spark.createDataFrame(
        [Row(host="slowspam.example", keep=i < 3) for i in range(12)]
        + [Row(host="good.example", keep=True) for _ in range(30)],
        "host string, keep boolean",
    )
    m1 = host_quality_stats(month, min_support=20, min_keep_rate=0.5)
    assert {r["host"]: r["blocked"] for r in m1.collect()} == {
        "slowspam.example": False,  # 12 pages < 20 support
        "good.example": False,
    }
    merged = merge_host_stats(m1, m1, min_support=20, min_keep_rate=0.5)
    got = {r["host"]: r for r in merged.collect()}
    assert got["slowspam.example"]["n_pages"] == 24
    assert got["slowspam.example"]["blocked"] is True  # cumulative evidence
    assert got["good.example"]["blocked"] is False


def test_cli_host_stats_merge(spark, tmp_path):
    """host-stats --host-stats-merge: second month accumulates onto the
    first month's table."""
    from data_quality_monitoring_spark.datagen import generate_pages
    from data_quality_monitoring_spark.plans.submit import (
        build_args,
        run,
        run_host_stats,
    )

    in_dir = str(tmp_path / "in")
    generate_pages(spark, 300, partitions=4).write.parquet(in_dir)
    out = str(tmp_path / "f")
    run(spark, build_args(["--input", in_dir, "--output", out, "--n-buckets", "4"]))

    h1 = str(tmp_path / "h1")
    s1 = run_host_stats(spark, build_args(
        ["--mode", "host-stats", "--input", f"{out}/data", "--output", h1]))
    h2 = str(tmp_path / "h2")
    run_host_stats(spark, build_args(
        ["--mode", "host-stats", "--input", f"{out}/data", "--output", h2,
         "--host-stats-merge", h1]))
    t1 = spark.read.parquet(h1)
    t2 = spark.read.parquet(h2)
    assert s1["hosts"] == t1.count() == t2.count()
    import pyspark.sql.functions as F

    doubled = (
        t1.alias("a")
        .join(t2.alias("b"), "host")
        .filter(F.col("b.n_pages") != F.col("a.n_pages") * 2)
        .count()
    )
    assert doubled == 0
