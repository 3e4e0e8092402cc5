"""Single-writer advisory lock: reentrancy, live/dead/stale owners, and
integration with the stateful writers."""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from presencia_etl_spark.sinks.locking import (
    StateLockedError,
    _lock_path,
    state_lock,
)


class TestStateLock:
    def test_acquire_release_and_reentrancy(self, tmp_path):
        target = str(tmp_path / "state")
        with state_lock(target):
            assert os.path.exists(_lock_path(target))
            # Reentrant: the same process may nest (merge → inner compact).
            with state_lock(target):
                pass
            assert os.path.exists(_lock_path(target))
        assert not os.path.exists(_lock_path(target))

    def test_live_owner_raises(self, tmp_path):
        target = str(tmp_path / "state")
        with open(_lock_path(target), "w") as fh:
            json.dump(
                {"pid": os.getpid(), "host": os.uname().nodename, "ts": time.time()},
                fh,
            )
        with pytest.raises(StateLockedError, match="live writer"):
            with state_lock(target):
                pass
        os.unlink(_lock_path(target))

    def test_dead_owner_is_broken(self, tmp_path):
        target = str(tmp_path / "state")
        with open(_lock_path(target), "w") as fh:
            json.dump(
                {"pid": 2**22 - 1, "host": os.uname().nodename, "ts": time.time()},
                fh,
            )
        with state_lock(target):
            pass
        assert not os.path.exists(_lock_path(target))

    def test_stale_remote_owner_is_broken(self, tmp_path):
        target = str(tmp_path / "state")
        with open(_lock_path(target), "w") as fh:
            json.dump(
                {"pid": 1, "host": "some-other-host", "ts": time.time() - 7200},
                fh,
            )
        with state_lock(target, stale_after=3600):
            pass
        assert not os.path.exists(_lock_path(target))

    def test_fresh_remote_owner_raises(self, tmp_path):
        target = str(tmp_path / "state")
        with open(_lock_path(target), "w") as fh:
            json.dump(
                {"pid": 1, "host": "some-other-host", "ts": time.time()}, fh
            )
        with pytest.raises(StateLockedError):
            with state_lock(target):
                pass
        os.unlink(_lock_path(target))


class TestWriterIntegration:
    def test_merge_refuses_locked_state_and_cleans_up(self, spark, tmp_path):
        from presencia_etl_spark.sinks.writers import merge_upsert_parquet

        target = str(tmp_path / "state")
        src = spark.range(0, 50).select(
            F.col("id").cast("string").alias("K"),
            (F.col("id") % 3).cast("string").alias("V"),
        )
        merge_upsert_parquet(spark, src, target, ["K"])
        assert not os.path.exists(_lock_path(target))  # released

        with open(_lock_path(target), "w") as fh:
            json.dump(
                {"pid": os.getpid(), "host": os.uname().nodename, "ts": time.time()},
                fh,
            )
        with pytest.raises(StateLockedError):
            merge_upsert_parquet(spark, src, target, ["K"])
        os.unlink(_lock_path(target))
        # And the state is still mergeable afterward.
        r = merge_upsert_parquet(spark, src, target, ["K"])
        assert r["skip"] == 50

    def test_mor_nested_paths_do_not_deadlock(self, spark, tmp_path):
        """merge_upsert_mor locks the MOR root while its initial load runs
        the COW writer on base/ (a different lock) and rebucket holds the
        root lock across its internal compact (reentrant)."""
        from presencia_etl_spark.sinks import mor
        from presencia_etl_spark.sinks.writers import rebucket

        target = str(tmp_path / "mor")
        src = spark.range(0, 100).select(
            F.col("id").cast("string").alias("K"), F.lit("v").alias("V")
        )
        mor.merge_upsert_mor(spark, src, target, ["K"], num_buckets=4,
                             compact_every=None)
        mut = src.withColumn(
            "V", F.when(F.col("K") == "1", F.lit("x")).otherwise(F.col("V"))
        )
        mor.merge_upsert_mor(spark, mut, target, ["K"], num_buckets=4,
                             compact_every=None)
        rebucket(spark, target, 8)
        assert not os.path.exists(_lock_path(target))
        got = {r["K"]: r["V"] for r in
               mor.read_mor(spark, target).select("K", "V").collect()}
        assert got["1"] == "x" and len(got) == 100


class TestCrossThread:
    def test_other_thread_is_a_concurrent_writer(self, tmp_path):
        import threading

        target = str(tmp_path / "state")
        errs = []

        def other():
            try:
                with state_lock(target):
                    pass
            except StateLockedError as e:
                errs.append(e)

        with state_lock(target):
            t = threading.Thread(target=other)
            t.start()
            t.join()
        assert len(errs) == 1 and "another thread" in str(errs[0])
        # Fully released afterward: a new acquisition works.
        with state_lock(target):
            pass
