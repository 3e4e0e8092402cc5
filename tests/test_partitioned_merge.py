"""Partition-pruned merge: only dirty key-hash buckets get rewritten."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from presencia_etl_spark.sinks.writers import (
    compact_parquet,
    delete_where_parquet,
    delete_where_partitioned,
    merge_upsert_parquet,
    merge_upsert_partitioned,
)


def _bucket_mtimes(path: str) -> dict[str, float]:
    out = {}
    for d in os.listdir(path):
        if d.startswith("_kb="):
            full = os.path.join(path, d)
            out[d] = max(
                os.path.getmtime(os.path.join(full, f)) for f in os.listdir(full)
            )
    return out


class TestPartitionedMerge:
    def test_create_idempotent_localized_update(self, spark, tmp_path):
        target = str(tmp_path / "state")
        src = spark.range(0, 2000).select(
            F.col("id").cast("string").alias("K"),
            (F.col("id") % 7).cast("string").alias("V"),
        )
        r = merge_upsert_partitioned(spark, src, target, ["K"], num_buckets=16)
        assert r["insert"] == 2000

        r = merge_upsert_partitioned(spark, src, target, ["K"], num_buckets=16)
        assert r == {"insert": 0, "update": 0, "skip": 2000, "buckets_rewritten": 0}

        before = _bucket_mtimes(target)
        # Mutate exactly ONE key → exactly one dirty bucket.
        mut = src.withColumn(
            "V", F.when(F.col("K") == "42", F.lit("CHANGED")).otherwise(F.col("V"))
        )
        r = merge_upsert_partitioned(spark, mut, target, ["K"], num_buckets=16)
        assert r["update"] == 1 and r["insert"] == 0
        assert r["buckets_rewritten"] == 1
        after = _bucket_mtimes(target)
        rewritten = [d for d in before if after[d] != before[d]]
        assert len(rewritten) == 1  # only the dirty bucket's files changed

        # State content correct + still idempotent afterwards.
        state = spark.read.parquet(target)
        assert state.count() == 2000
        assert state.filter(F.col("K") == "42").collect()[0]["V"] == "CHANGED"
        r = merge_upsert_partitioned(spark, mut, target, ["K"], num_buckets=16)
        assert r["update"] == 0 and r["insert"] == 0

    def test_inserts_and_updates_mixed(self, spark, tmp_path):
        target = str(tmp_path / "state")
        src = spark.range(0, 500).select(
            F.col("id").cast("string").alias("K"), F.lit("x").alias("V")
        )
        merge_upsert_partitioned(spark, src, target, ["K"], num_buckets=8)
        nxt = spark.range(0, 600).select(
            F.col("id").cast("string").alias("K"),
            F.when(F.col("id") < 10, F.lit("y")).otherwise(F.lit("x")).alias("V"),
        )
        r = merge_upsert_partitioned(spark, nxt, target, ["K"], num_buckets=8)
        assert r["insert"] == 100 and r["update"] == 10 and r["skip"] == 490
        state = spark.read.parquet(target)
        assert state.count() == 600
        ids = [row["id"] for row in state.select("id").collect()]
        assert len(ids) == len(set(ids))


class TestCrashSafety:
    def _seed(self, spark, target, n=2000, buckets=16):
        src = spark.range(0, n).select(
            F.col("id").cast("string").alias("K"),
            (F.col("id") % 7).cast("string").alias("V"),
        )
        merge_upsert_partitioned(spark, src, target, ["K"], num_buckets=buckets)
        return src

    def test_staged_write_failure_leaves_target_intact(
        self, spark, tmp_path, monkeypatch
    ):
        """A failure while STAGING the rebuilt buckets (before any swap)
        must leave the live target byte-identical and re-mergeable —
        the old dynamic-partition overwrite had already replaced
        partitions by this point."""
        target = str(tmp_path / "state")
        src = self._seed(spark, target)
        before = sorted(
            (r["K"], r["V"]) for r in spark.read.parquet(target).collect()
        )

        import presencia_etl_spark.sinks.writers as W

        real_mkdtemp = W.tempfile.mkdtemp

        def exploding_mkdtemp(*a, **kw):  # staging dir creation is step 1
            raise OSError("injected staging failure")

        monkeypatch.setattr(W.tempfile, "mkdtemp", exploding_mkdtemp)
        mut = src.withColumn(
            "V", F.when(F.col("K") == "42", F.lit("CHANGED")).otherwise(F.col("V"))
        )
        with pytest.raises(OSError, match="injected"):
            merge_upsert_partitioned(spark, mut, target, ["K"], num_buckets=16)
        monkeypatch.setattr(W.tempfile, "mkdtemp", real_mkdtemp)

        after = sorted(
            (r["K"], r["V"]) for r in spark.read.parquet(target).collect()
        )
        assert after == before  # untouched
        r = merge_upsert_partitioned(spark, mut, target, ["K"], num_buckets=16)
        assert r["update"] == 1  # re-mergeable, converges

    def test_swap_failure_rolls_back_parked_bucket(
        self, spark, tmp_path, monkeypatch
    ):
        """If a bucket-directory rename fails mid-swap, every bucket must
        end as a COMPLETE old or new version (no missing/partial dirs),
        the state must stay readable, and a re-merge must converge."""
        target = str(tmp_path / "state")
        src = self._seed(spark, target)

        import presencia_etl_spark.sinks.writers as W

        real_rename = os.rename
        calls = {"n": 0}

        def flaky_rename(a, b):
            if "_kb=" in os.path.basename(b):  # the src→dst landing rename
                calls["n"] += 1
                if calls["n"] == 2:
                    raise OSError("injected swap failure")
            real_rename(a, b)

        monkeypatch.setattr(W.os, "rename", flaky_rename)
        # Mutate several keys → several dirty buckets → multiple swaps.
        mut = src.withColumn(
            "V",
            F.when(F.col("K").isin("1", "2", "3", "4", "5"), F.lit("M")).otherwise(
                F.col("V")
            ),
        )
        with pytest.raises(OSError, match="injected"):
            merge_upsert_partitioned(spark, mut, target, ["K"], num_buckets=16)
        monkeypatch.setattr(W.os, "rename", real_rename)

        state = spark.read.parquet(target)
        assert state.count() == 2000  # every key present exactly once
        ks = [r["K"] for r in state.select("K").collect()]
        assert len(ks) == len(set(ks))
        r = merge_upsert_partitioned(spark, mut, target, ["K"], num_buckets=16)
        assert r["insert"] == 0 and r["update"] > 0  # converges
        final = spark.read.parquet(target)
        assert final.filter(F.col("V") == "M").count() == 5

    @pytest.mark.parametrize("new_dir_landed_in_staging", [True, False])
    def test_hard_crash_mid_swap_recovers_from_journal(
        self, spark, tmp_path, new_dir_landed_in_staging
    ):
        """ADVICE r3: a SIGKILL between parking a bucket's old dir and
        renaming its replacement in leaves that bucket ABSENT — the
        Python-exception rollback never runs, and a rerun used to silently
        reclassify the bucket's rows as INSERT with fresh ids. Simulate
        the exact post-crash filesystem state (journal present, bucket dir
        missing, old copy parked in staging ± the staged new dir) and
        assert the next merge repairs it: no phantom inserts, ids stable."""
        import shutil as sh

        from presencia_etl_spark.sinks.writers import MERGE_JOURNAL

        target = str(tmp_path / "state")
        src = self._seed(spark, target)
        ids_before = {
            r["K"]: r["id"] for r in spark.read.parquet(target).collect()
        }

        bucket_dir = next(
            d for d in sorted(os.listdir(target)) if d.startswith("_kb=")
        )
        b = int(bucket_dir.split("=")[1])
        staged = str(tmp_path / "merge_buckets_simcrash")
        os.makedirs(staged)
        if new_dir_landed_in_staging:
            # Crash AFTER the staged write, BEFORE the landing rename:
            # the complete new version sits in staging → roll forward.
            sh.copytree(
                os.path.join(target, bucket_dir), os.path.join(staged, bucket_dir)
            )
        os.rename(
            os.path.join(target, bucket_dir), os.path.join(staged, f"_old_{b}")
        )
        with open(os.path.join(target, MERGE_JOURNAL), "w") as fh:
            import json

            json.dump({"staged": staged, "buckets": [b]}, fh)
        assert not os.path.exists(os.path.join(target, bucket_dir))

        r = merge_upsert_partitioned(spark, src, target, ["K"], num_buckets=16)
        assert r == {"insert": 0, "update": 0, "skip": 2000, "buckets_rewritten": 0}
        assert not os.path.exists(os.path.join(target, MERGE_JOURNAL))
        assert not os.path.exists(staged)
        ids_after = {
            r["K"]: r["id"] for r in spark.read.parquet(target).collect()
        }
        assert ids_after == ids_before  # audit continuity preserved


class TestSchemaEvolution:
    def test_flat_merge_widens_on_new_column(self, spark, tmp_path):
        target = str(tmp_path / "state")
        v1 = spark.range(0, 100).select(
            F.col("id").cast("string").alias("K"), F.lit("a").alias("A")
        )
        merge_upsert_parquet(spark, v1, target, ["K"])
        # v2 grows column B and covers only half the keys.
        v2 = spark.range(0, 50).select(
            F.col("id").cast("string").alias("K"),
            F.lit("a").alias("A"),
            F.lit("b").alias("B"),
        )
        r = merge_upsert_parquet(spark, v2, target, ["K"])
        assert r["update"] == 50  # hash now covers B → overlap reclassifies
        state = spark.read.parquet(target)
        assert "B" in state.columns
        assert state.filter(F.col("B").isNull()).count() == 50  # old rows NULL
        assert state.filter(F.col("B") == "b").count() == 50
        # Idempotency: second identical merge settles to SKIP.
        r = merge_upsert_parquet(spark, v2, target, ["K"])
        assert r["insert"] == 0 and r["update"] == 0

    def test_flat_merge_dropped_column_preserved_as_null(self, spark, tmp_path):
        target = str(tmp_path / "state")
        v1 = spark.range(0, 40).select(
            F.col("id").cast("string").alias("K"),
            F.lit("a").alias("A"),
            F.lit("b").alias("B"),
        )
        merge_upsert_parquet(spark, v1, target, ["K"])
        v2 = spark.range(0, 40).select(
            F.col("id").cast("string").alias("K"), F.lit("a2").alias("A")
        )
        r = merge_upsert_parquet(spark, v2, target, ["K"])
        assert r["update"] == 40
        state = spark.read.parquet(target)
        assert set(state.select("A").distinct().toPandas()["A"]) == {"a2"}
        assert state.filter(F.col("B").isNull()).count() == 40
        r = merge_upsert_parquet(spark, v2, target, ["K"])
        assert r["insert"] == 0 and r["update"] == 0

    def test_partitioned_merge_widens_every_bucket(self, spark, tmp_path):
        target = str(tmp_path / "state")
        v1 = spark.range(0, 400).select(
            F.col("id").cast("string").alias("K"), F.lit("a").alias("A")
        )
        merge_upsert_partitioned(spark, v1, target, ["K"], num_buckets=8)
        # Source grows B but only touches a handful of keys → drift must
        # still rewrite ALL buckets (mixed-schema files are unreadable
        # without mergeSchema).
        v2 = spark.range(0, 10).select(
            F.col("id").cast("string").alias("K"),
            F.lit("a").alias("A"),
            F.lit("b").alias("B"),
        )
        r = merge_upsert_partitioned(spark, v2, target, ["K"], num_buckets=8)
        assert r["buckets_rewritten"] == 8
        state = spark.read.parquet(target)  # plain read, no mergeSchema
        assert "B" in state.columns
        assert state.count() == 400
        assert state.filter(F.col("B") == "b").count() == 10
        assert state.filter(F.col("B").isNull()).count() == 390
        r = merge_upsert_partitioned(spark, v2, target, ["K"], num_buckets=8)
        assert r["insert"] == 0 and r["update"] == 0

    def test_audit_collision_warns(self, spark, tmp_path):
        target = str(tmp_path / "state")
        src = spark.range(0, 10).select(
            F.col("id").cast("string").alias("K"),
            F.col("id").alias("id"),  # natural key named like audit col
        )
        with pytest.warns(UserWarning, match="collide with the audit envelope"):
            merge_upsert_parquet(spark, src, target, ["K"])


class TestKeyBackfill:
    """Merge targets now persist the normalized _cdc_key; targets written
    before that change must be backfilled by a FULL rewrite (a partial one
    would leave mixed schemas), and keep working in the meantime."""

    def _strip_key(self, spark, path, partitioned):
        from presencia_etl_spark.operators.cdc import KEY_COL

        df = spark.read.parquet(path).drop(KEY_COL)
        if partitioned:
            df.write.mode("overwrite").partitionBy("_kb").parquet(path + ".old")
        else:
            df.write.mode("overwrite").parquet(path + ".old")
        import shutil

        shutil.rmtree(path)
        shutil.move(path + ".old", path)

    def test_flat_merge_backfills_key(self, spark, tmp_path):
        from presencia_etl_spark.operators.cdc import KEY_COL

        target = str(tmp_path / "state")
        src = spark.range(0, 300).select(
            F.col("id").cast("string").alias("K"), (F.col("id") % 3).alias("V")
        )
        merge_upsert_parquet(spark, src, target, ["K"])
        self._strip_key(spark, target, partitioned=False)
        assert KEY_COL not in spark.read.parquet(target).columns

        # No-change pass against an old-layout target still works (key is
        # computed on the fly) and must NOT rewrite anything.
        r = merge_upsert_parquet(spark, src, target, ["K"])
        assert r == {"insert": 0, "update": 0, "skip": 300}
        assert KEY_COL not in spark.read.parquet(target).columns

        # Insert-only batch: the append fast-path must be skipped (it would
        # mix schemas) and the rewrite must backfill the key everywhere.
        more = spark.range(0, 320).select(
            F.col("id").cast("string").alias("K"), (F.col("id") % 3).alias("V")
        )
        r = merge_upsert_parquet(spark, more, target, ["K"])
        assert r["insert"] == 20 and r["update"] == 0
        state = spark.read.parquet(target)
        assert KEY_COL in state.columns
        assert state.filter(F.col(KEY_COL).isNull()).count() == 0
        assert state.count() == 320

    def test_partitioned_merge_backfills_key_all_buckets(self, spark, tmp_path):
        from presencia_etl_spark.operators.cdc import KEY_COL

        target = str(tmp_path / "state")
        src = spark.range(0, 400).select(
            F.col("id").cast("string").alias("K"), (F.col("id") % 3).alias("V")
        )
        merge_upsert_partitioned(spark, src, target, ["K"], num_buckets=8)
        self._strip_key(spark, target, partitioned=True)

        mut = src.withColumn(
            "V", F.when(F.col("K") == "5", F.lit(99)).otherwise(F.col("V"))
        )
        r = merge_upsert_partitioned(spark, mut, target, ["K"], num_buckets=8)
        # One dirty key, but the key backfill must reach EVERY bucket.
        assert r["update"] == 1 and r["buckets_rewritten"] == 8
        state = spark.read.parquet(target)  # plain read: schema is uniform
        assert KEY_COL in state.columns
        assert state.filter(F.col(KEY_COL).isNull()).count() == 0
        assert state.count() == 400
        # Next sparse merge prunes again (no more migration).
        mut2 = src.withColumn(
            "V", F.when(F.col("K") == "7", F.lit(98)).otherwise(F.col("V"))
        )
        r = merge_upsert_partitioned(spark, mut2, target, ["K"], num_buckets=8)
        assert r["buckets_rewritten"] < 8


class TestShuffleJoinPath:
    def test_merges_correct_with_broadcast_disabled(
        self, spark, tmp_path, monkeypatch
    ):
        """The 100 TB path: when the dirty set is past the broadcast limit,
        every rewrite join runs as an AQE-chosen shuffle join. Force it by
        zeroing the limit and assert both merges still converge to the
        same state they produce with broadcasts."""
        import presencia_etl_spark.sinks.writers as W

        monkeypatch.setattr(W, "BROADCAST_KEY_LIMIT", 0)
        base = spark.range(0, 600)
        src = base.select(
            F.col("id").cast("string").alias("K"), (F.col("id") % 7).alias("V")
        )
        mut = base.select(
            F.col("id").cast("string").alias("K"),
            F.when(F.col("id") % 50 == 0, F.lit(99))
            .otherwise(F.col("id") % 7)
            .alias("V"),
        )

        flat = str(tmp_path / "flat")
        merge_upsert_parquet(spark, src, flat, ["K"])
        r = merge_upsert_parquet(spark, mut, flat, ["K"])
        assert r["update"] == 12 and r["insert"] == 0
        state = spark.read.parquet(flat)
        assert state.count() == 600
        assert state.filter(F.col("V") == 99).count() == 12

        part = str(tmp_path / "part")
        merge_upsert_partitioned(spark, src, part, ["K"], num_buckets=8)
        r = merge_upsert_partitioned(spark, mut, part, ["K"], num_buckets=8)
        assert r["update"] == 12 and r["insert"] == 0
        state = spark.read.parquet(part)
        assert state.count() == 600
        assert state.filter(F.col("V") == 99).count() == 12
        r = merge_upsert_partitioned(spark, mut, part, ["K"], num_buckets=8)
        assert r["update"] == 0 and r["insert"] == 0  # idempotent


class TestLayoutMismatch:
    def test_partitioned_merge_rejects_flat_target(self, spark, tmp_path):
        target = str(tmp_path / "state")
        src = spark.range(0, 50).select(
            F.col("id").cast("string").alias("K"), F.lit("x").alias("V")
        )
        merge_upsert_parquet(spark, src, target, ["K"])
        with pytest.raises(ValueError, match="not bucketed"):
            merge_upsert_partitioned(spark, src, target, ["K"], num_buckets=8)

    def test_flat_merge_rejects_bucketed_target(self, spark, tmp_path):
        target = str(tmp_path / "state")
        src = spark.range(0, 50).select(
            F.col("id").cast("string").alias("K"), F.lit("x").alias("V")
        )
        merge_upsert_partitioned(spark, src, target, ["K"], num_buckets=8)
        with pytest.raises(ValueError, match="is bucketed"):
            merge_upsert_parquet(spark, src, target, ["K"])


class TestCompaction:
    def test_compact_after_many_appends(self, spark, tmp_path):
        from presencia_etl_spark.sinks.writers import compact_parquet

        path = str(tmp_path / "accreted")
        for i in range(12):
            spark.range(i * 100, (i + 1) * 100).repartition(4).write.mode(
                "append"
            ).parquet(path)
        before = spark.read.parquet(path)
        n_rows = before.count()
        assert n_rows == 1200

        r = compact_parquet(spark, path, target_file_mb=128)
        assert r["files_before"] >= 12
        assert r["files_after"] < r["files_before"]
        after = spark.read.parquet(path)
        assert after.count() == n_rows
        assert {x["id"] for x in after.collect()} == set(range(1200))

    def test_compact_preserves_bucket_layout_then_merge(self, spark, tmp_path):
        """Regression: compacting a _kb=-partitioned merge target used to
        flatten it to root-level files; the next bucket-pruned merge then
        replaced only _kb= dirs, leaving the compacted root rows as stale
        duplicates. Layout must survive compaction and a sparse merge must
        not duplicate keys."""
        target = str(tmp_path / "state")
        src = spark.range(0, 1000).select(
            F.col("id").cast("string").alias("K"),
            (F.col("id") % 5).cast("string").alias("V"),
        )
        merge_upsert_partitioned(spark, src, target, ["K"], num_buckets=8)

        r = compact_parquet(spark, target, target_file_mb=128)
        assert r["files_after"] <= r["files_before"]
        kb_dirs = [d for d in os.listdir(target) if d.startswith("_kb=")]
        assert len(kb_dirs) == 8, "bucket layout must survive compaction"

        mut = src.withColumn(
            "V", F.when(F.col("K") == "7", F.lit("CHANGED")).otherwise(F.col("V"))
        )
        r = merge_upsert_partitioned(spark, mut, target, ["K"], num_buckets=8)
        assert r["update"] == 1
        state = spark.read.parquet(target)
        assert state.count() == 1000  # no stale duplicates
        ks = [row["K"] for row in state.select("K").collect()]
        assert len(ks) == len(set(ks))
        assert state.filter(F.col("K") == "7").collect()[0]["V"] == "CHANGED"


class TestRebucket:
    def _src(self, spark, n=2000):
        return spark.range(0, n).select(
            F.col("id").cast("string").alias("K"),
            (F.col("id") % 7).cast("string").alias("V"),
        )

    def _state(self, spark, target):
        return {
            r["K"]: r["V"]
            for r in spark.read.parquet(target).select("K", "V").collect()
        }

    def test_rebucket_preserves_state_and_later_merges_use_it(
        self, spark, tmp_path
    ):
        from presencia_etl_spark.sinks.writers import rebucket

        target = str(tmp_path / "state")
        src = self._src(spark)
        merge_upsert_partitioned(spark, src, target, ["K"], num_buckets=8)
        want = self._state(spark, target)

        r = rebucket(spark, target, 32)
        assert r == {"rows": 2000, "num_buckets": 32}
        kb_dirs = [d for d in os.listdir(target) if d.startswith("_kb=")]
        assert len(kb_dirs) == 32
        assert self._state(spark, target) == want

        # A later merge at the OLD modulus must follow the state's stored
        # bucket count (32), not the argument — the mismatch that would
        # otherwise duplicate updated keys across bucket dirs.
        mut = src.withColumn(
            "V", F.when(F.col("K") == "7", F.lit("NEW")).otherwise(F.col("V"))
        )
        with pytest.warns(UserWarning, match="was written with 32"):
            r = merge_upsert_partitioned(spark, mut, target, ["K"], num_buckets=8)
        assert r["update"] == 1 and r["buckets_rewritten"] == 1
        got = self._state(spark, target)
        assert got["7"] == "NEW" and len(got) == 2000

    def test_rebucket_mor_state(self, spark, tmp_path):
        from presencia_etl_spark.sinks import mor
        from presencia_etl_spark.sinks.writers import rebucket

        target = str(tmp_path / "mor")
        src = self._src(spark, 1000)
        mor.merge_upsert_mor(spark, src, target, ["K"], num_buckets=8,
                             compact_every=None)
        mut = src.withColumn(
            "V", F.when(F.col("K") == "3", F.lit("x")).otherwise(F.col("V"))
        )
        mor.merge_upsert_mor(spark, mut, target, ["K"], num_buckets=8,
                             compact_every=None)

        r = rebucket(spark, target, 16)
        assert r["rows"] == 1000 and r["num_buckets"] == 16
        assert mor.mor_history(target)["num_buckets"] == 16
        got = {r_["K"]: r_["V"] for r_ in
               mor.read_mor(spark, target).select("K", "V").collect()}
        assert got["3"] == "x" and len(got) == 1000
        # Further merges run against the new modulus.
        mut2 = mut.withColumn(
            "V", F.when(F.col("K") == "5", F.lit("y")).otherwise(F.col("V"))
        )
        r = mor.merge_upsert_mor(spark, mut2, target, ["K"], num_buckets=16,
                                 compact_every=None)
        assert r["update"] == 1

    def test_interrupted_rebucket_rolls_forward(self, spark, tmp_path):
        """Journal present + staged copy complete (the crash window between
        journal write and the renames) → recovery finishes the swap; a
        subsequent merge sees the NEW layout, not an initial load."""
        import json as _json

        from presencia_etl_spark.sinks.writers import (
            REBUCKET_JOURNAL_SUFFIX,
            _recover_interrupted_rebucket,
            rebucket,
        )

        target = str(tmp_path / "state")
        src = self._src(spark, 500)
        merge_upsert_partitioned(spark, src, target, ["K"], num_buckets=4)
        want = self._state(spark, target)

        # Build the staged layout exactly as rebucket would, then "crash"
        # after the journal lands but before any rename.
        import shutil

        staged = target + "__rebucket_staged"
        rebucket(spark, target, 16)       # produces the 16-bucket layout
        shutil.copytree(target, staged)   # staged copy of the new layout
        with open(target + REBUCKET_JOURNAL_SUFFIX, "w") as fh:
            _json.dump({"new_buckets": 16}, fh)

        assert _recover_interrupted_rebucket(target)
        assert not os.path.exists(staged)
        assert not os.path.exists(target + REBUCKET_JOURNAL_SUFFIX)
        assert self._state(spark, target) == want

        # And the crash window after the first rename: live dir gone,
        # staged still present → forward to staged.
        shutil.copytree(target, staged)
        with open(target + REBUCKET_JOURNAL_SUFFIX, "w") as fh:
            _json.dump({"new_buckets": 16}, fh)
        shutil.rmtree(target)
        assert _recover_interrupted_rebucket(target)
        assert self._state(spark, target) == want


class TestCowDeletes:
    """Row-level DELETE on the COW layouts: bucket-pruned rewrite for the
    bucketed state, atomic staged rewrite for the flat state. The
    reference's sync never deletes (trap N6) — this is the data-lifecycle
    extension (GDPR erasure / TTL retention)."""

    def _src(self, spark, n=400):
        return spark.range(0, n).select(
            F.col("id").cast("string").alias("K"),
            (F.col("id") % 10).cast("string").alias("V"),
        )

    def test_partitioned_delete_prunes_clean_buckets(self, spark, tmp_path):
        target = str(tmp_path / "cow")
        merge_upsert_partitioned(spark, self._src(spark), target, ["K"], num_buckets=16)
        before = _bucket_mtimes(target)
        r = delete_where_partitioned(spark, target, F.col("K").isin("5", "250"))
        assert r["delete"] == 2
        after = _bucket_mtimes(target)
        untouched = [d for d in before if before[d] == after.get(d)]
        # Only the victims' buckets rewrote.
        assert len(before) - len(untouched) == r["buckets_rewritten"] <= 2
        got = spark.read.parquet(target)
        assert got.count() == 398
        assert got.filter(F.col("K").isin("5", "250")).count() == 0

    def test_partitioned_delete_null_predicate_keeps_row(self, spark, tmp_path):
        target = str(tmp_path / "cow")
        df = spark.createDataFrame(
            [("a", "1"), ("b", None), ("c", "3")], ["K", "V"]
        )
        merge_upsert_partitioned(spark, df, target, ["K"], num_buckets=4)
        r = delete_where_partitioned(spark, target, F.col("V") > "1")
        assert r["delete"] == 1
        assert {x["K"] for x in spark.read.parquet(target).collect()} == {"a", "b"}

    def test_partitioned_full_delete_stays_readable_and_mergeable(
        self, spark, tmp_path
    ):
        target = str(tmp_path / "cow")
        merge_upsert_partitioned(spark, self._src(spark, 100), target, ["K"], num_buckets=4)
        r = delete_where_partitioned(spark, target, "K >= '0'")
        assert r["delete"] == 100 and r["buckets_rewritten"] == 4
        # Zero rows, but the layout still reads and re-merges (the empty
        # reseed guard) — without it the next merge dies on
        # UNABLE_TO_INFER_SCHEMA.
        assert spark.read.parquet(target).count() == 0
        r = merge_upsert_partitioned(spark, self._src(spark, 50), target, ["K"], num_buckets=4)
        assert r["insert"] == 50
        assert spark.read.parquet(target).count() == 50

    def test_flat_delete_and_layout_guards(self, spark, tmp_path):
        flat = str(tmp_path / "flat")
        merge_upsert_parquet(spark, self._src(spark, 100), flat, ["K"])
        r = delete_where_parquet(spark, flat, F.col("V") == "3")
        assert r["delete"] == 10
        assert spark.read.parquet(flat).count() == 90
        # No-match delete: no rewrite at all.
        mtimes = sorted(os.listdir(flat))
        assert delete_where_parquet(spark, flat, F.col("V") == "zz") == {"delete": 0}
        assert sorted(os.listdir(flat)) == mtimes

        # Cross-layout misuse raises descriptively both ways.
        bucketed = str(tmp_path / "cow")
        merge_upsert_partitioned(spark, self._src(spark, 50), bucketed, ["K"], num_buckets=4)
        with pytest.raises(ValueError, match="bucketed"):
            delete_where_parquet(spark, bucketed, F.lit(True))
        with pytest.raises(ValueError, match="not bucketed"):
            delete_where_partitioned(spark, flat, F.lit(True))


class TestFooterMaxId:
    def test_footer_stats_match_scan(self, spark, tmp_path):
        """_max_id_stat must equal the Spark agg on every layout it serves
        (flat, hive-bucketed, multi-file) — id allocation correctness
        rides on it for insert-bearing merges."""
        from pyspark.sql import functions as F

        from presencia_etl_spark.sinks.writers import (
            _max_id_stat,
            merge_upsert_parquet,
            merge_upsert_partitioned,
        )

        flat = str(tmp_path / "flat")
        df = spark.range(100).select(
            F.col("id").cast("string").alias("K"),
            (F.col("id") % 3).cast("string").alias("V"),
        )
        merge_upsert_parquet(spark, df, flat, ["K"])
        want = spark.read.parquet(flat).agg(F.max("id")).collect()[0][0]
        assert _max_id_stat(flat) == want

        bucketed = str(tmp_path / "bucketed")
        merge_upsert_partitioned(spark, df, bucketed, ["K"], num_buckets=8)
        want = spark.read.parquet(bucketed).agg(F.max("id")).collect()[0][0]
        assert _max_id_stat(bucketed) == want

        # Insert-bearing merge allocates ABOVE the footer max: ids stay
        # unique after an append that used the stats path.
        grown = df.unionByName(
            spark.createDataFrame([("newk1", "x"), ("newk2", "y")], ["K", "V"])
        )
        r = merge_upsert_parquet(spark, grown, flat, ["K"])
        assert r["insert"] == 2
        out = spark.read.parquet(flat)
        assert out.count() == 102
        assert out.select("id").distinct().count() == 102

    def test_no_id_column_returns_none(self, spark, tmp_path):
        from presencia_etl_spark.sinks.writers import _max_id_stat

        p = str(tmp_path / "noid")
        spark.range(10).select(F.col("id").alias("x")).write.parquet(p)
        assert _max_id_stat(p) is None


class TestSwapStagingHygiene:
    def test_orphan_staging_swept_and_invisible(self, spark, tmp_path):
        """A merge SIGKILLed mid-staging-write (before the swap journal
        existed) leaves its staged output inside the target. The dot
        prefix keeps it invisible to Spark reads, and the next merge
        sweeps it under the writer lock."""
        from presencia_etl_spark.sinks import writers as w

        target = str(tmp_path / "state")
        src = spark.range(0, 200).select(
            F.col("id").cast("string").alias("K"),
            (F.col("id") % 7).cast("string").alias("V"),
        )
        merge_upsert_partitioned(spark, src, target, ["K"], num_buckets=8)
        orphan = os.path.join(target, f"{w.SWAP_STAGING_PREFIX}merge_dead")
        os.makedirs(os.path.join(orphan, "_kb=0"))
        with open(os.path.join(orphan, "_kb=0", "part-0.parquet"), "wb") as fh:
            fh.write(b"torn")
        # Invisible to a plain read even while present.
        assert spark.read.parquet(target).count() == 200
        r = merge_upsert_partitioned(spark, src, target, ["K"], num_buckets=8)
        assert r["skip"] == 200
        assert not os.path.exists(orphan)

    def test_max_id_stat_ignores_hidden_dirs(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from presencia_etl_spark.sinks.writers import _max_id_stat

        live = tmp_path / "state" / "_kb=0"
        live.mkdir(parents=True)
        pq.write_table(pa.table({"id": [5, 9]}), live / "part-0.parquet")
        staged = tmp_path / "state" / ".staged_merge_x" / "_kb=0"
        staged.mkdir(parents=True)
        pq.write_table(pa.table({"id": [10_000]}), staged / "part-0.parquet")
        tmpdir = tmp_path / "state" / "_temporary"
        tmpdir.mkdir()
        pq.write_table(pa.table({"id": [20_000]}), tmpdir / "part-1.parquet")
        # Only the Spark-visible file feeds surrogate-id allocation.
        assert _max_id_stat(str(tmp_path / "state")) == 9


class TestFlatSwapJournal:
    def test_flat_merge_swap_crash_recovers_forward(
        self, spark, tmp_path, monkeypatch
    ):
        """The flat merge's whole-dir swap is journaled: a crash between
        'old renamed away' and 'new renamed in' (previously: table GONE,
        new state stranded in a random-named sibling) now rolls forward on
        the next call — identity preserved, no accidental re-initial-load."""
        from presencia_etl_spark.sinks import writers as w

        target = str(tmp_path / "flat")
        v1 = spark.range(0, 100).select(
            F.col("id").cast("string").alias("K"),
            (F.col("id") % 7).cast("string").alias("V"),
        )
        merge_upsert_parquet(spark, v1, target, ["K"])
        before = {
            r["K"]: (r["id"], r["created_at"])
            for r in spark.read.parquet(target).collect()
        }

        v2 = v1.withColumn(
            "V", F.when(F.col("K") == "3", F.lit("mut")).otherwise(F.col("V"))
        )
        orig_rename = w.os.rename
        staged = target + "__rebucket_staged"

        def crashing_rename(src, dst):
            if src == staged:  # the staged→live rename: live already parked
                raise RuntimeError("simulated crash mid-swap")
            return orig_rename(src, dst)

        monkeypatch.setattr(w.os, "rename", crashing_rename)
        with pytest.raises(RuntimeError, match="simulated crash"):
            merge_upsert_parquet(spark, v2, target, ["K"])
        monkeypatch.undo()
        # The table is mid-swap: live dir gone, journal + staged survive.
        assert not os.path.exists(target)
        assert os.path.exists(staged)

        # Replay converges: recovery rolls the completed staged copy
        # forward, then the merge classifies everything as skip.
        r = merge_upsert_parquet(spark, v2, target, ["K"])
        assert (r["insert"], r["update"], r["skip"]) == (0, 0, 100)
        after = {
            r["K"]: (r["id"], r["created_at"], r["V"])
            for r in spark.read.parquet(target).collect()
        }
        assert after["3"][2] == "mut"
        for k, (i, c) in before.items():
            assert after[k][0] == i and after[k][1] == c, k


class TestOverwriteAtomicity:
    def test_overwrite_publishes_old_or_new(self, spark, tmp_path, monkeypatch):
        """S6 overwrite of an EXISTING table stages aside and swaps under
        the rebucket journal: a crash mid-publish leaves the old table (or
        rolls the completed new one forward on the next call) — never the
        partial/empty state Spark's native delete-then-write overwrite
        leaves behind."""
        from presencia_etl_spark.sinks import writers as w

        path = str(tmp_path / "t")
        v1 = spark.range(0, 50).select(F.col("id").alias("n"))
        w.overwrite_parquet(v1, path)
        assert spark.read.parquet(path).count() == 50

        v2 = spark.range(0, 80).select(F.col("id").alias("n"))
        orig_rename = w.os.rename
        staged = path + "__rebucket_staged"

        def crashing_rename(src, dst):
            if src == path:  # crash parking the OLD dir: nothing landed yet
                raise RuntimeError("simulated crash before swap")
            return orig_rename(src, dst)

        monkeypatch.setattr(w.os, "rename", crashing_rename)
        with pytest.raises(RuntimeError, match="simulated crash"):
            w.overwrite_parquet(v2, path)
        monkeypatch.undo()
        # Old table intact through the failure…
        assert os.path.exists(path)
        assert os.path.exists(staged)
        # …and the retry recovers (journal rolls the staged copy forward,
        # then publishes v2 cleanly either way).
        w.overwrite_parquet(v2, path)
        assert spark.read.parquet(path).count() == 80
        assert not os.path.exists(path + w.REBUCKET_JOURNAL_SUFFIX)


class TestSwapCrashWindowInteractions:
    """Review findings: ops that touch a table while a DIFFERENT op's
    journaled swap lies crashed mid-window must recover first, or they
    write under a live journal and the eventual recovery destroys them."""

    def _crash_mid_swap(self, w, monkeypatch, path, staged):
        """Crash _commit_whole_dir_swap between the two renames: live dir
        parked to retired, staged not yet renamed in — journal + staged +
        retired survive, the live path is MISSING."""
        orig_rename = w.os.rename

        def crashing_rename(src, dst):
            if src == staged:
                raise RuntimeError("simulated crash mid-swap")
            return orig_rename(src, dst)

        monkeypatch.setattr(w.os, "rename", crashing_rename)

    def test_overwrite_recovers_missing_live_dir(
        self, spark, tmp_path, monkeypatch
    ):
        """Mid-swap the live dir is GONE; an overwrite guarded behind
        os.path.exists(path) would skip recovery, take the first-time
        branch, and write fresh data UNDER the live journal — which the
        next recovery then clobbers with the stale staged copy."""
        from presencia_etl_spark.sinks import writers as w

        path = str(tmp_path / "t")
        w.overwrite_parquet(spark.range(0, 50).toDF("n"), path)
        staged = path + "__rebucket_staged"
        self._crash_mid_swap(w, monkeypatch, path, staged)
        with pytest.raises(RuntimeError, match="simulated crash"):
            w.overwrite_parquet(spark.range(0, 80).toDF("n"), path)
        monkeypatch.undo()
        assert not os.path.exists(path) and os.path.exists(staged)

        # The next overwrite must roll the completed v2 forward, then
        # publish v3 — and leave no journal/staged/retired debris.
        w.overwrite_parquet(spark.range(0, 30).toDF("n"), path)
        assert spark.read.parquet(path).count() == 30
        assert not os.path.exists(path + w.REBUCKET_JOURNAL_SUFFIX)
        assert not os.path.exists(staged)
        assert not os.path.exists(path + "__rebucket_retired")

    def test_append_survives_crashed_swap_window(
        self, spark, tmp_path, monkeypatch
    ):
        """An append landing while journal+staged+live(old) sit crashed
        (window BEFORE the first rename) must recover first; appended to
        the doomed old dir, its rows vanish when recovery parks it."""
        from presencia_etl_spark.sinks import writers as w

        path = str(tmp_path / "t")
        w.overwrite_parquet(spark.range(0, 50).toDF("n"), path)
        staged = path + "__rebucket_staged"
        orig_rename = w.os.rename

        def crashing_rename(src, dst):
            if src == path:  # crash parking the OLD dir: nothing renamed
                raise RuntimeError("simulated crash before swap")
            return orig_rename(src, dst)

        monkeypatch.setattr(w.os, "rename", crashing_rename)
        with pytest.raises(RuntimeError, match="simulated crash"):
            w.overwrite_parquet(spark.range(0, 80).toDF("n"), path)
        monkeypatch.undo()
        assert os.path.exists(path + w.REBUCKET_JOURNAL_SUFFIX)

        w.append_parquet(spark.range(100, 110).toDF("n"), path)
        # Recovery ran first (v2 rolled forward), so the appended rows
        # landed in the SURVIVING state and persist across later recovery.
        got = {r["n"] for r in spark.read.parquet(path).collect()}
        assert got == set(range(80)) | set(range(100, 110))
        assert not os.path.exists(path + w.REBUCKET_JOURNAL_SUFFIX)

    def test_compact_recovers_interrupted_bucket_swap(self, spark, tmp_path):
        """compact_parquet on a bucketed target carrying an interrupted
        BUCKET swap (_merge_swap_journal): without repair it reads the
        table minus the parked bucket, destroys the only copy in its
        whole-dir swap, and propagates the live journal into the new
        layout (wedging the next merge after the backup is gone)."""
        import json
        import shutil

        from presencia_etl_spark.sinks import writers as w

        target = str(tmp_path / "state")
        src = spark.range(0, 400).select(
            F.col("id").cast("string").alias("K"),
            (F.col("id") % 7).cast("string").alias("V"),
        )
        merge_upsert_partitioned(spark, src, target, ["K"], num_buckets=8)
        expect = {
            r["K"]: r["V"] for r in spark.read.parquet(target).collect()
        }

        # Simulate a SIGKILL mid-swap: one bucket parked into the staging
        # dir, journal present.
        staged = os.path.join(target, f"{w.SWAP_STAGING_PREFIX}merge_dead")
        os.makedirs(staged)
        shutil.move(os.path.join(target, "_kb=3"), os.path.join(staged, "_old_3"))
        journal = os.path.join(target, w.MERGE_JOURNAL)
        with open(journal, "w") as fh:
            json.dump({"staged": staged, "buckets": [3]}, fh)

        r = compact_parquet(spark, target, target_file_mb=1)
        assert r["files_before"] > 0
        got = {r["K"]: r["V"] for r in spark.read.parquet(target).collect()}
        assert got == expect  # the parked bucket was recovered, not lost
        assert not os.path.exists(os.path.join(target, w.MERGE_JOURNAL))
        # And the state still merges cleanly afterwards.
        r = merge_upsert_partitioned(spark, src, target, ["K"], num_buckets=8)
        assert r["skip"] == 400
