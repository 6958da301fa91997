"""Concurrent writers on one PartitionedSink table (VERDICT r4 task 5):
two run()s racing the same manifest must serialize or one must fail
CLEANLY — no partial-commit visibility, ever.  This is the snapshot
protocol a real Iceberg catalog provides natively (optimistic concurrency
+ atomic snapshot swap); the emulation must prove the same contract on
plain parquet."""

import json
import os
import subprocess
import threading

import pytest

from data_quality_monitoring_spark.datagen import generate_pages
from data_quality_monitoring_spark.sources.manifest import (
    CommitConflictError,
    ConcurrentWriteError,
    PartitionedSink,
)


def _passthrough(slice_df):
    from pyspark.sql import functions as F

    return slice_df.select("url", F.lit(True).alias("keep"), "bucket")


def test_second_concurrent_run_fails_cleanly(spark, tmp_path):
    """A run() entering while another is mid-flight raises
    ConcurrentWriteError BEFORE mutating anything; the first run finishes
    untouched and the table is exactly a single-writer table."""
    pages = generate_pages(spark, 200, partitions=4)
    sink = PartitionedSink(str(tmp_path / "t"), n_buckets=8, chunk_buckets=4)

    in_chunk = threading.Event()
    release = threading.Event()
    first_chunk_seen = threading.Event()

    def blocking_transform(slice_df):
        if not first_chunk_seen.is_set():
            first_chunk_seen.set()
            in_chunk.set()
            assert release.wait(timeout=120), "test deadlock"
        return _passthrough(slice_df)

    errs: list[BaseException] = []
    summaries: list[dict] = []

    def runner():
        try:
            summaries.append(sink.run(pages, blocking_transform))
        except BaseException as e:  # noqa: BLE001 - surfaced below
            errs.append(e)

    t = threading.Thread(target=runner)
    t.start()
    assert in_chunk.wait(timeout=120)
    # the race: a second writer on the SAME table while chunk 1 is in flight
    racer = PartitionedSink(str(tmp_path / "t"), n_buckets=8, chunk_buckets=4)
    before = racer.committed_buckets()
    with pytest.raises(ConcurrentWriteError, match="holds"):
        racer.run(pages, _passthrough)
    # the loser left no trace: same committed set, no snapshot files added
    assert racer.committed_buckets() == before
    release.set()
    t.join(timeout=240)
    assert not errs, errs
    # winner ran to completion: all 8 buckets committed exactly once
    assert summaries and sorted(sink.committed_buckets()) == list(range(8))
    lineage = sink.lineage(spark).toPandas()
    assert sorted(lineage["bucket"]) == list(range(8))
    # the lock is released — a follow-up run is a no-op, not an error
    again = sink.run(pages, _passthrough)
    assert again["chunks_run"] == 0


def test_stale_lock_from_dead_pid_is_stolen(spark, tmp_path):
    """A SIGKILLed run leaves its lock behind; the next run must detect the
    dead pid and proceed instead of wedging the table forever."""
    pages = generate_pages(spark, 100, partitions=4)
    sink = PartitionedSink(str(tmp_path / "t"), n_buckets=4, chunk_buckets=4)
    dead = subprocess.Popen(["true"])
    dead.wait()
    sink._lock_path().write_text(f"{dead.pid} 0.0")
    summary = sink.run(pages, _passthrough)
    assert summary["chunks_run"] == 1
    assert not sink._lock_path().exists()


def test_crash_releases_lock_for_resume(spark, tmp_path):
    """fail_after_chunks (the kill-and-resume path) must not leave the lock
    held — resume acquires it fresh."""
    pages = generate_pages(spark, 200, partitions=4)
    sink = PartitionedSink(str(tmp_path / "t"), n_buckets=8, chunk_buckets=4)
    with pytest.raises(RuntimeError, match="injected failure"):
        sink.run(pages, _passthrough, fail_after_chunks=1)
    assert not sink._lock_path().exists()
    sink.run(pages, _passthrough)
    assert sorted(sink.committed_buckets()) == list(range(8))


def test_commit_is_atomic_exclusive_create(tmp_path):
    """The snapshot-id race (lock bypassed / stolen incorrectly): the loser
    of the exclusive create retries against the refreshed base, so BOTH
    writers' disjoint buckets land and neither snapshot is ever partially
    visible; overlapping buckets raise CommitConflictError instead of
    silently double-committing."""
    a = PartitionedSink(str(tmp_path / "t"), n_buckets=8, chunk_buckets=4)
    b = PartitionedSink(str(tmp_path / "t"), n_buckets=8, chunk_buckets=4)
    assert a._commit([0, 1]) == 0
    # interloper claims snapshot id 1 behind b's back (what a second driver
    # process does between b's base read and b's create)
    (a.manifest_dir / "snapshot-1.json").write_text(
        json.dumps({"snapshot": 1, "buckets": [0, 1, 2], "committed_at_chunk": [2]})
    )
    assert b._commit([3, 4]) == 2  # retried past the taken id
    assert b.committed_buckets() == {0, 1, 2, 3, 4}
    # union semantics: every earlier writer's buckets survive the retry
    data = json.loads((b.manifest_dir / "snapshot-2.json").read_text())
    assert data["buckets"] == [0, 1, 2, 3, 4]
    # a bucket someone else already committed is a CONFLICT, not a merge
    with pytest.raises(CommitConflictError, match=r"\[2\]"):
        b._commit([2, 5])
    # the failed commit left nothing behind
    assert b.committed_buckets() == {0, 1, 2, 3, 4}
    assert not list(b.manifest_dir.glob("*.tmp"))


def test_current_snapshot_derived_from_files(tmp_path):
    """The 'current' pointer is a hint: truth is the max snapshot file, so
    a racer whose pointer rename lands late cannot roll visibility back."""
    s = PartitionedSink(str(tmp_path / "t"), n_buckets=4, chunk_buckets=4)
    s._commit([0])
    s._commit([1])
    # simulate the late pointer rename of a slower racer
    (s.manifest_dir / "current").write_text("0")
    assert s._current_snapshot() == 1
    assert s.committed_buckets() == {0, 1}
    # pid in the lock file is unreadable garbage → treated as stale
    s._lock_path().write_text("not-a-pid")
    s._acquire_lock()
    assert int(s._lock_path().read_text().split()[0]) == os.getpid()
    s._release_lock()


def test_stale_lock_steal_is_single_winner(tmp_path):
    """Round 6 (ADVICE r5 medium): stealing a dead-pid lock goes through an
    atomic rename to a per-stealer name, so when two processes observe the
    same stale lock only ONE steals it — the loser's rename hits
    FileNotFoundError, loops, sees the winner's live lock and raises
    ConcurrentWriteError instead of deleting the winner's fresh lock."""
    import subprocess

    sink = PartitionedSink(str(tmp_path / "t"), n_buckets=4, chunk_buckets=4)
    sink.manifest_dir.mkdir(parents=True, exist_ok=True)
    dead = subprocess.Popen(["true"])
    dead.wait()
    path = sink._lock_path()
    path.write_text(f"{dead.pid} 0.0")

    # simulate the loser: the moment it tries to rename, the winner has
    # already stolen the stale file and created its own (live) lock
    real_rename = os.rename
    live = subprocess.Popen(["sleep", "30"])
    try:

        def racing_rename(src, dst, *a, **kw):
            if str(src) == str(path):
                path.unlink()  # winner's steal...
                path.write_text(f"{live.pid} 0.0")  # ...and fresh lock
                os.rename = real_rename
                raise FileNotFoundError(src)
            return real_rename(src, dst, *a, **kw)

        os.rename = racing_rename
        with pytest.raises(ConcurrentWriteError, match=str(live.pid)):
            sink._acquire_lock()
        # the winner's lock survived the loser's failed steal
        assert path.read_text().split()[0] == str(live.pid)
    finally:
        os.rename = real_rename
        live.kill()
        live.wait()


def test_release_lock_is_owner_verified(tmp_path):
    """Round 6 (ADVICE r5 medium): _release_lock leaves a lock held by a
    DIFFERENT pid untouched (it is not ours to delete) and removes our
    own."""
    sink = PartitionedSink(str(tmp_path / "t"), n_buckets=4, chunk_buckets=4)
    sink.manifest_dir.mkdir(parents=True, exist_ok=True)
    path = sink._lock_path()
    path.write_text(f"{os.getpid() + 1} 0.0")
    sink._release_lock()
    assert path.exists(), "someone else's lock must survive our release"
    path.write_text(f"{os.getpid()} 0.0")
    sink._release_lock()
    assert not path.exists()
