"""Merge-on-read upsert sink: O(changes) sparse merges, latest-wins reads,
crash-safe compaction — differential-tested against the flat COW merge."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from presencia_etl_spark.operators import cdc
from presencia_etl_spark.sinks import mor
from presencia_etl_spark.sinks.writers import merge_upsert_parquet


def _src(spark, n=2000, salt="0"):
    return spark.range(0, n).select(
        F.col("id").cast("string").alias("K"),
        F.concat(F.lit(salt), (F.col("id") % 7).cast("string")).alias("V"),
    )


def _state(df):
    """Comparable (key → value) projection, audit/internals stripped."""
    return {
        (r["K"]): r["V"]
        for r in df.select("K", "V").collect()
    }


def _base_files(target):
    base = os.path.join(target, "base")
    out = {}
    for d in os.listdir(base):
        if d.startswith("_kb="):
            full = os.path.join(base, d)
            out[d] = sorted(os.listdir(full))
    return out


class TestMorMerge:
    def test_initial_load_and_noop_replay(self, spark, tmp_path):
        target = str(tmp_path / "mor")
        src = _src(spark)
        r = mor.merge_upsert_mor(spark, src, target, ["K"], num_buckets=16)
        assert r["insert"] == 2000 and r["delta_files"] == 0
        assert _state(mor.read_mor(spark, target)) == _state(src)

        # Replay: all skip, and NOTHING is written (no delta dir).
        r = mor.merge_upsert_mor(spark, src, target, ["K"], num_buckets=16)
        assert (r["insert"], r["update"], r["skip"]) == (0, 0, 2000)
        assert mor._delta_seqs(target) == []

    def test_sparse_update_touches_no_base_file(self, spark, tmp_path):
        target = str(tmp_path / "mor")
        src = _src(spark)
        mor.merge_upsert_mor(spark, src, target, ["K"], num_buckets=16)
        before = _base_files(target)

        mutated = src.withColumn(
            "V", F.when(F.col("K") == "42", F.lit("changed")).otherwise(F.col("V"))
        )
        r = mor.merge_upsert_mor(spark, mutated, target, ["K"], num_buckets=16)
        assert (r["insert"], r["update"], r["skip"]) == (0, 1, 1999)
        assert _base_files(target) == before  # zero base churn
        assert mor._delta_seqs(target) == [1]
        assert _state(mor.read_mor(spark, target)) == _state(mutated)

    def test_differential_vs_flat_cow_merge(self, spark, tmp_path):
        """Same merge sequence through MOR and the flat COW merge must
        converge to the same (key → value) state, with audit semantics
        (created_at/id preserved on update, updated_at refreshed)."""
        mor_t = str(tmp_path / "mor")
        cow_t = str(tmp_path / "cow")
        s1 = _src(spark, 1000)
        s2 = _src(spark, 1200, salt="x")  # 1000 updates + 200 inserts
        for s in (s1, s2):
            mor.merge_upsert_mor(spark, s, mor_t, ["K"], num_buckets=8)
            merge_upsert_parquet(spark, s, cow_t, ["K"])
        got = mor.read_mor(spark, mor_t)
        want = spark.read.parquet(cow_t)
        assert _state(got) == _state(want)
        # Updated keys kept their created_at != updated_at; ids unique.
        upd = got.filter(F.col("K") == "5").collect()[0]
        assert upd["created_at"] < upd["updated_at"]
        assert got.select("id").distinct().count() == got.count()

    def test_latest_wins_across_deltas(self, spark, tmp_path):
        target = str(tmp_path / "mor")
        src = _src(spark, 100)
        mor.merge_upsert_mor(spark, src, target, ["K"], num_buckets=4)
        for val in ("a", "b", "c"):
            m = src.withColumn(
                "V", F.when(F.col("K") == "7", F.lit(val)).otherwise(F.col("V"))
            )
            mor.merge_upsert_mor(spark, m, target, ["K"], num_buckets=4)
        view = mor.read_mor(spark, target)
        assert view.filter(F.col("K") == "7").collect()[0]["V"] == "c"
        assert view.count() == 100  # no duplicate rows from overrides
        assert mor._delta_seqs(target) == [1, 2, 3]

    def test_compaction_folds_and_preserves_state(self, spark, tmp_path):
        target = str(tmp_path / "mor")
        src = _src(spark, 500)
        mor.merge_upsert_mor(spark, src, target, ["K"], num_buckets=8)
        m = src.withColumn(
            "V", F.when(F.col("K").isin("1", "2"), F.lit("m")).otherwise(F.col("V"))
        )
        mor.merge_upsert_mor(spark, m, target, ["K"], num_buckets=8)
        before = _state(mor.read_mor(spark, target))
        files_before = _base_files(target)

        r = mor.compact_mor(spark, target)
        assert r["deltas_folded"] == 1
        assert 0 < r["buckets_rewritten"] <= 2
        assert mor._delta_seqs(target) == []
        assert _state(mor.read_mor(spark, target)) == before
        # Only the dirty buckets' files changed.
        after = _base_files(target)
        changed = [k for k in files_before if files_before[k] != after[k]]
        assert len(changed) == r["buckets_rewritten"]

        # Post-compaction merges keep working (seq keeps rising).
        m2 = m.withColumn(
            "V", F.when(F.col("K") == "3", F.lit("z")).otherwise(F.col("V"))
        )
        mor.merge_upsert_mor(spark, m2, target, ["K"], num_buckets=8)
        assert mor._delta_seqs(target) == [2]  # monotonic, never reused
        assert _state(mor.read_mor(spark, target))["3"] == "z"

    def test_auto_compaction_trigger(self, spark, tmp_path):
        target = str(tmp_path / "mor")
        src = _src(spark, 50)
        mor.merge_upsert_mor(spark, src, target, ["K"], num_buckets=4)
        r = None
        for i in range(2):
            m = src.withColumn(
                "V",
                F.when(F.col("K") == str(i), F.lit(f"v{i}")).otherwise(F.col("V")),
            )
            r = mor.merge_upsert_mor(
                spark, m, target, ["K"], num_buckets=4, compact_every=2
            )
        assert r["compacted"]
        assert mor._delta_seqs(target) == []

    def test_insert_ids_continue_past_delta_ids(self, spark, tmp_path):
        target = str(tmp_path / "mor")
        mor.merge_upsert_mor(spark, _src(spark, 100), target, ["K"], num_buckets=4)
        mor.merge_upsert_mor(spark, _src(spark, 150), target, ["K"], num_buckets=4)
        mor.merge_upsert_mor(spark, _src(spark, 200), target, ["K"], num_buckets=4)
        view = mor.read_mor(spark, target)
        assert view.count() == 200
        assert view.select("id").distinct().count() == 200
        assert view.select(cdc.KEY_COL).distinct().count() == 200


class TestMorDifferentialRandomized:
    def test_random_merge_sequence_matches_flat_cow(self, spark, tmp_path):
        """Seeded random merge sequence (overlapping inserts/updates/no-ops)
        through MOR and the flat COW merge — final states must be
        identical. One sequence, several merges: covers interleavings the
        hand-written cases don't (update-then-insert same batch, repeated
        updates of one key across deltas, partial overlaps)."""
        import random

        rng = random.Random(20260813)
        mor_t = str(tmp_path / "mor")
        cow_t = str(tmp_path / "cow")
        keyspace = [f"k{i}" for i in range(300)]
        current = {}
        for step in range(5):
            picked = rng.sample(keyspace, rng.randint(40, 160))
            rows = []
            for k in picked:
                # ~half keep their old value (no-op), half mutate/insert.
                if k in current and rng.random() < 0.5:
                    v = current[k]
                else:
                    v = f"v{step}_{rng.randint(0, 9)}"
                current[k] = v
                rows.append((k, v))
            batch = spark.createDataFrame(rows, ["K", "V"])
            mor.merge_upsert_mor(
                spark, batch, mor_t, ["K"], num_buckets=8, compact_every=3
            )
            merge_upsert_parquet(spark, batch, cow_t, ["K"])
        got = _state(mor.read_mor(spark, mor_t))
        want = _state(spark.read.parquet(cow_t))
        assert got == want == current


class TestMorSchemaDrift:
    def test_drifted_source_widens_base_and_resumes_deltas(self, spark, tmp_path):
        """A source that grew a column can't land in delta files (the read
        view's union would be ill-typed): the merge folds deltas and runs
        the COW drift path, widening every bucket; later merges resume
        O(changes) deltas against the widened base."""
        target = str(tmp_path / "mor")
        src = _src(spark, 200)
        mor.merge_upsert_mor(spark, src, target, ["K"], num_buckets=4)
        m = src.withColumn(
            "V", F.when(F.col("K") == "1", F.lit("m")).otherwise(F.col("V"))
        )
        mor.merge_upsert_mor(spark, m, target, ["K"], num_buckets=4)
        assert mor._delta_seqs(target) == [1]

        grown = m.withColumn("W", F.concat(F.lit("w"), F.col("K")))
        r = mor.merge_upsert_mor(spark, grown, target, ["K"], num_buckets=4)
        assert r["compacted"] and mor._delta_seqs(target) == []
        view = mor.read_mor(spark, target)
        assert "W" in view.columns
        assert view.filter(F.col("K") == "3").collect()[0]["W"] == "w3"
        assert view.filter(F.col("K") == "1").collect()[0]["V"] == "m"

        # Post-drift sparse merge is a delta again, carrying the new column.
        g2 = grown.withColumn(
            "W", F.when(F.col("K") == "2", F.lit("neww")).otherwise(F.col("W"))
        )
        r = mor.merge_upsert_mor(spark, g2, target, ["K"], num_buckets=4)
        assert r["update"] == 1 and r["delta_files"] >= 1
        assert mor.read_mor(spark, target).filter(F.col("K") == "2").collect()[0]["W"] == "neww"


class TestCompactCli:
    def test_compact_subcommand_detects_state_kind(
        self, spark, tmp_path, capsys
    ):
        """`compact --target DIR` routes by state kind: MOR target folds
        deltas; a MinHash index restores its sorted layout; plain parquet
        rewrites to sized files."""
        import json

        from presencia_etl_spark.__main__ import main
        from presencia_etl_spark.operators import dedup_index

        # MOR state with one outstanding delta.
        mor_t = str(tmp_path / "mor")
        src = _src(spark, 100)
        mor.merge_upsert_mor(spark, src, mor_t, ["K"], num_buckets=4)
        m = src.withColumn(
            "V", F.when(F.col("K") == "1", F.lit("m")).otherwise(F.col("V"))
        )
        mor.merge_upsert_mor(spark, m, mor_t, ["K"], num_buckets=4)
        assert main(["compact", "--target", mor_t]) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["result"]["kind"] == "mor"
        assert mor._delta_seqs(mor_t) == []

        # MinHash index.
        idx = str(tmp_path / "idx")
        docs = spark.createDataFrame(
            [(i, f"document number {i} with words w{i}") for i in range(20)],
            ["doc_id", "text"],
        )
        dedup_index.build_minhash_index(spark, docs, "doc_id", "text", idx)
        assert main(["compact", "--target", idx]) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["result"]["kind"] == "minhash_index"

        # Plain parquet.
        plain = str(tmp_path / "plain")
        src.repartition(8).write.parquet(plain)
        assert main(["compact", "--target", plain]) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["result"]["kind"] == "parquet"
        assert out["result"]["files_after"] <= out["result"]["files_before"]


class TestXxh64HashMode:
    def test_merges_accept_precomputed_xxh64_hash(self, spark, tmp_path):
        """The merges trust a precomputed row_hash column; hashing with
        algo='xxh64' (16x cheaper than sha256 — the classify CPU floor)
        gives the same CDC semantics end-to-end for deployments that
        don't need reference sha parity."""
        from presencia_etl_spark.functions.hashing import with_row_hash
        from presencia_etl_spark.sinks.writers import merge_upsert_partitioned

        target = str(tmp_path / "state")
        src = _src(spark, 500)
        hashed = with_row_hash(src, ["K", "V"], algo="xxh64")
        r = merge_upsert_partitioned(spark, hashed, target, ["K"], num_buckets=8)
        assert r["insert"] == 500

        r = merge_upsert_partitioned(spark, hashed, target, ["K"], num_buckets=8)
        assert (r["insert"], r["update"], r["skip"]) == (0, 0, 500)

        mut = with_row_hash(
            src.withColumn(
                "V", F.when(F.col("K") == "7", F.lit("zz")).otherwise(F.col("V"))
            ),
            ["K", "V"],
            algo="xxh64",
        )
        r = merge_upsert_partitioned(spark, mut, target, ["K"], num_buckets=8)
        assert r["update"] == 1 and r["buckets_rewritten"] == 1

        # Same through MOR.
        mt = str(tmp_path / "mor")
        mor.merge_upsert_mor(spark, hashed, mt, ["K"], num_buckets=8)
        r = mor.merge_upsert_mor(spark, mut, mt, ["K"], num_buckets=8)
        assert r["update"] == 1 and r["delta_files"] >= 1
        assert _state(mor.read_mor(spark, mt))["7"] == "zz"


class TestDeltaCrashSafety:
    """The delta commit point is an atomic rename of a hidden staging dir
    into ``deltas/`` — these pin the three crash windows the advisor
    flagged: torn write, committed-dir-ahead-of-meta, and the non-MOR
    target mis-merge."""

    def _mut(self, src, key, val):
        return src.withColumn(
            "V", F.when(F.col("K") == key, F.lit(val)).otherwise(F.col("V"))
        )

    def test_torn_staging_invisible_to_readers_and_gcd(self, spark, tmp_path):
        target = str(tmp_path / "mor")
        src = _src(spark, 500)
        mor.merge_upsert_mor(spark, src, target, ["K"], num_buckets=8)
        mor.merge_upsert_mor(spark, self._mut(src, "1", "x1"), target, ["K"], num_buckets=8)

        # Crash mid-delta-write: a partial staging dir with garbage bytes.
        torn = os.path.join(target, mor.DELTA_DIR, f"{mor.STAGING_PREFIX}99")
        os.makedirs(torn)
        with open(os.path.join(torn, "part-00000.parquet"), "wb") as f:
            f.write(b"\x00torn")

        # Readers never see it (dot-prefixed = hidden to Spark's file index).
        assert _state(mor.read_mor(spark, target))["1"] == "x1"
        # The next merge garbage-collects it and proceeds normally.
        r = mor.merge_upsert_mor(
            spark,
            self._mut(self._mut(src, "1", "x1"), "2", "x2"),
            target,
            ["K"],
            num_buckets=8,
        )
        assert r["update"] == 1
        assert not os.path.exists(torn)
        st = _state(mor.read_mor(spark, target))
        assert st["1"] == "x1" and st["2"] == "x2"

    def test_committed_delta_ahead_of_meta_does_not_wedge(self, spark, tmp_path):
        """Crash after the rename-commit but before the meta bump: the live
        dir's seq is ahead of meta['seq']. The old code recomputed the same
        seq and failed forever on mode('errorifexists'); _next_seq treats
        live dirs as authoritative."""
        target = str(tmp_path / "mor")
        src = _src(spark, 500)
        mor.merge_upsert_mor(spark, src, target, ["K"], num_buckets=8)
        mor.merge_upsert_mor(spark, self._mut(src, "1", "x1"), target, ["K"], num_buckets=8)

        meta = mor._read_meta(target)
        meta["seq"] -= 1  # simulate the un-bumped meta
        mor._write_meta(target, meta)

        r = mor.merge_upsert_mor(spark, self._mut(src, "1", "x2"), target, ["K"], num_buckets=8)
        assert r["update"] == 1
        assert mor._read_meta(target)["seq"] == max(mor._delta_seqs(target))
        # Latest-wins ordering survived the seq gapless renumbering.
        assert _state(mor.read_mor(spark, target))["1"] == "x2"

    def test_non_mor_target_raises_descriptive_error(self, spark, tmp_path):
        import pytest as _pytest

        from presencia_etl_spark.sinks.writers import merge_upsert_partitioned

        target = str(tmp_path / "cow")
        merge_upsert_partitioned(spark, _src(spark, 100), target, ["K"], num_buckets=4)
        with _pytest.raises(ValueError, match="not a merge-on-read"):
            mor.merge_upsert_mor(spark, _src(spark, 100), target, ["K"], num_buckets=4)


class TestDriftCompactionInterleaving:
    """Seeded property test interleaving schema drift (add AND drop
    columns), explicit compactions, rebuckets AND row-level deletes across
    a random merge sequence — the interleavings the hand-written tests
    can't reach (drift while tombstones are outstanding, compaction right
    after a drift fold, delete then re-insert across a rebucket). The
    Python model mirrors the engine's documented hash discipline: a stored
    row is replaced iff the batch row's (column-set, values) signature
    differs — row_hash covers the batch's own value set, so add/drop
    reclassifies overlapping keys as UPDATE once and settles to SKIP
    (idempotency); deleted keys leave the model entirely."""

    def test_seeded_random_drift_and_compaction_sequence(self, spark, tmp_path):
        import random

        # Seed chosen so the 10-step sequence exercises every action at
        # least once (add/drop column, compact, rebucket, delete) —
        # verified by replaying the rng sequence (it is Spark-independent).
        rng = random.Random(20260825)
        target = str(tmp_path / "mor")
        keyspace = [f"k{i}" for i in range(150)]
        all_extras = ["W1", "W2", "W3"]
        active: list[str] = []
        ever_active: set[str] = set()
        # model[k] = signature dict of the last REPLACING batch row
        model: dict[str, dict] = {}
        last_batch = None

        for step in range(10):
            action = rng.random()
            if action < 0.20 and len(active) < len(all_extras):
                candidates = [c for c in all_extras if c not in active]
                col = rng.choice(candidates)
                active.append(col)
                ever_active.add(col)
            elif action < 0.30 and active:
                active.remove(rng.choice(active))
            elif action < 0.45 and step > 0:
                mor.compact_mor(spark, target)
            elif action < 0.55 and step > 0:
                # Layout evolution mid-sequence: rebucket folds deltas and
                # rewrites the base at a new modulus; semantics must be
                # invisible to the model (later merges follow the stored
                # count regardless of the num_buckets argument below).
                from presencia_etl_spark.sinks.writers import rebucket

                rebucket(spark, target, rng.choice([4, 16]))
            elif action < 0.68 and model and step > 0:
                # Row-level deletes mid-sequence: tombstone deltas must
                # survive drift folds, compactions and rebuckets, and a
                # later merge of a deleted key must re-insert it.
                doomed = rng.sample(
                    sorted(model), rng.randint(1, min(15, len(model)))
                )
                mor.delete_keys_mor(
                    spark,
                    target,
                    spark.createDataFrame([(k,) for k in doomed], ["K"]),
                    ["K"],
                    compact_every=None,
                )
                for k in doomed:
                    model.pop(k)

            picked = rng.sample(keyspace, rng.randint(20, 80))
            rows, cols = [], ["K", "V", *active]
            for k in picked:
                if k in model and rng.random() < 0.4 and set(model[k]) == set(cols):
                    sig = dict(model[k])  # deliberate no-op replay
                else:
                    sig = {"V": f"v{step}_{rng.randint(0, 5)}"}
                    for c in active:
                        sig[c] = f"{c}_{step}_{rng.randint(0, 5)}"
                    sig["K"] = k
                if sig != model.get(k):
                    model[k] = sig
                rows.append(tuple(sig.get(c) for c in cols))
            batch = spark.createDataFrame(rows, cols)
            mor.merge_upsert_mor(
                spark, batch, target, ["K"], num_buckets=8, compact_every=3
            )
            last_batch = batch

        # Final state equals the model on every data column ever seen
        # (absent-at-write columns read back NULL).
        view = mor.read_mor(spark, target)
        got = {
            r["K"]: {c: r[c] for c in ("V", *sorted(ever_active)) if c in view.columns}
            for r in view.collect()
        }
        assert set(got) == set(model)
        for k, sig in model.items():
            for c in ("V", *sorted(ever_active)):
                if c in view.columns:
                    assert got[k][c] == sig.get(c), (k, c, got[k], sig)

        # Idempotency: replaying the final batch is all-SKIP.
        r = mor.merge_upsert_mor(
            spark, last_batch, target, ["K"], num_buckets=8, compact_every=None
        )
        assert r["insert"] == 0 and r["update"] == 0


class TestTimeTravel:
    def test_snapshot_reads_reconstruct_each_merge(self, spark, tmp_path):
        """as_of_seq=N reproduces the exact state after merge N; history
        reflects the live delta set."""
        target = str(tmp_path / "mor")
        s1 = _src(spark, 500)
        s2 = _src(spark, 600, salt="x")   # seq 1: 500 upd + 100 ins
        s3 = _src(spark, 600, salt="y")   # seq 2: 600 upd
        mor.merge_upsert_mor(spark, s1, target, ["K"], num_buckets=8,
                             compact_every=None)
        mor.merge_upsert_mor(spark, s2, target, ["K"], num_buckets=8,
                             compact_every=None)
        mor.merge_upsert_mor(spark, s3, target, ["K"], num_buckets=8,
                             compact_every=None)

        assert _state(mor.read_mor(spark, target, as_of_seq=0)) == _state(s1)
        assert _state(mor.read_mor(spark, target, as_of_seq=1)) == _state(s2)
        assert _state(mor.read_mor(spark, target, as_of_seq=2)) == _state(s3)
        # as_of beyond the head is just the current state.
        assert _state(mor.read_mor(spark, target, as_of_seq=99)) == _state(s3)

        h = mor.mor_history(target)
        assert h["seq"] == 2
        assert h["compacted_through"] == 0
        assert h["live_delta_seqs"] == [1, 2]
        assert h["num_buckets"] == 8

    def test_compaction_sets_floor_and_old_snapshots_raise(self, spark, tmp_path):
        import pytest as _pytest

        target = str(tmp_path / "mor")
        s1 = _src(spark, 300)
        s2 = _src(spark, 300, salt="x")
        mor.merge_upsert_mor(spark, s1, target, ["K"], num_buckets=8,
                             compact_every=None)
        mor.merge_upsert_mor(spark, s2, target, ["K"], num_buckets=8,
                             compact_every=None)
        mor.compact_mor(spark, target)

        h = mor.mor_history(target)
        assert h["compacted_through"] == 1 and h["live_delta_seqs"] == []
        # The floor itself (and anything newer) is readable: the base IS
        # that snapshot. Anything older was folded away and raises.
        assert _state(mor.read_mor(spark, target, as_of_seq=1)) == _state(s2)
        with _pytest.raises(ValueError, match="compacted_through"):
            mor.read_mor(spark, target, as_of_seq=0)

        # Merges after compaction time-travel normally above the floor.
        s3 = _src(spark, 300, salt="y")
        mor.merge_upsert_mor(spark, s3, target, ["K"], num_buckets=8,
                             compact_every=None)
        assert _state(mor.read_mor(spark, target, as_of_seq=1)) == _state(s2)
        assert _state(mor.read_mor(spark, target, as_of_seq=2)) == _state(s3)


class TestIncrementalChanges:
    def test_changes_between_snapshots(self, spark, tmp_path):
        """read_mor_changes(since) returns exactly the keys touched after
        that snapshot, latest version per key, tagged with its seq."""
        target = str(tmp_path / "mor")
        s1 = _src(spark, 400)
        mor.merge_upsert_mor(spark, s1, target, ["K"], num_buckets=8,
                             compact_every=None)
        # seq 1: mutate keys 0-9; seq 2: mutate keys 5-14.
        m1 = s1.withColumn(
            "V", F.when(F.col("K").cast("int") < 10, F.lit("a")).otherwise(F.col("V"))
        )
        mor.merge_upsert_mor(spark, m1, target, ["K"], num_buckets=8,
                             compact_every=None)
        m2 = m1.withColumn(
            "V",
            F.when(
                (F.col("K").cast("int") >= 5) & (F.col("K").cast("int") < 15),
                F.lit("b"),
            ).otherwise(F.col("V")),
        )
        mor.merge_upsert_mor(spark, m2, target, ["K"], num_buckets=8,
                             compact_every=None)

        all_changes = mor.read_mor_changes(spark, target, since_seq=0)
        got = {r["K"]: (r["V"], r["_delta_seq"]) for r in
               all_changes.select("K", "V", "_delta_seq").collect()}
        # Keys 0-4 changed only in seq 1; 5-14 latest is seq 2.
        assert len(got) == 15
        for k in range(5):
            assert got[str(k)] == ("a", 1)
        for k in range(5, 15):
            assert got[str(k)] == ("b", 2)

        since1 = mor.read_mor_changes(spark, target, since_seq=1)
        got1 = {r["K"] for r in since1.select("K").collect()}
        assert got1 == {str(k) for k in range(5, 15)}

        bounded = mor.read_mor_changes(spark, target, since_seq=0, as_of_seq=1)
        gotb = {r["K"]: r["V"] for r in bounded.select("K", "V").collect()}
        assert gotb == {str(k): "a" for k in range(10)}

        # Nothing after the head: empty frame, schema intact.
        empty = mor.read_mor_changes(spark, target, since_seq=2)
        assert empty.count() == 0
        assert "_delta_seq" in empty.columns and "V" in empty.columns

    def test_changes_below_compaction_floor_raise(self, spark, tmp_path):
        import pytest as _pytest

        target = str(tmp_path / "mor")
        s1 = _src(spark, 200)
        mor.merge_upsert_mor(spark, s1, target, ["K"], num_buckets=8,
                             compact_every=None)
        m1 = s1.withColumn(
            "V", F.when(F.col("K") == "7", F.lit("x")).otherwise(F.col("V"))
        )
        mor.merge_upsert_mor(spark, m1, target, ["K"], num_buckets=8,
                             compact_every=None)
        mor.compact_mor(spark, target)
        with _pytest.raises(ValueError, match="compacted_through"):
            mor.read_mor_changes(spark, target, since_seq=0)
        # At the floor: fine, and empty until the next merge.
        assert mor.read_mor_changes(spark, target, since_seq=1).count() == 0
        m2 = m1.withColumn(
            "V", F.when(F.col("K") == "9", F.lit("y")).otherwise(F.col("V"))
        )
        mor.merge_upsert_mor(spark, m2, target, ["K"], num_buckets=8,
                             compact_every=None)
        ch = mor.read_mor_changes(spark, target, since_seq=1)
        assert {r["K"] for r in ch.select("K").collect()} == {"9"}


class TestPartialCompaction:
    def test_keep_last_retains_recent_history(self, spark, tmp_path):
        """compact_mor(keep_last=1) folds only older deltas: the newest
        merge stays time-travelable and in the change feed, the floor
        advances to the folded head, and the read view is unchanged."""
        target = str(tmp_path / "mor")
        s1 = _src(spark, 300)
        s2 = _src(spark, 300, salt="x")
        s3 = _src(spark, 300, salt="y")
        for s in (s1, s2, s3):
            mor.merge_upsert_mor(spark, s, target, ["K"], num_buckets=8,
                                 compact_every=None)

        r = mor.compact_mor(spark, target, keep_last=1)
        assert r["deltas_folded"] == 1  # only seq 1 folded (seq 2 kept)
        h = mor.mor_history(target)
        assert h["compacted_through"] == 1 and h["live_delta_seqs"] == [2]

        # Read view unchanged; snapshots at and above the floor intact.
        assert _state(mor.read_mor(spark, target)) == _state(s3)
        assert _state(mor.read_mor(spark, target, as_of_seq=1)) == _state(s2)
        assert _state(mor.read_mor(spark, target, as_of_seq=2)) == _state(s3)
        # Change feed over the retained range still works.
        ch = mor.read_mor_changes(spark, target, since_seq=1)
        assert {r_["K"] for r_ in ch.select("K").collect()} == set(_state(s3))

        # keep_last larger than the live set: a no-op.
        assert mor.compact_mor(spark, target, keep_last=5) == {
            "buckets_rewritten": 0, "deltas_folded": 0,
            "keep_last_effective": 5,
        }


class TestMorDeletes:
    """Row-level deletes via tombstone deltas — the data-lifecycle
    extension (GDPR erasure / TTL) the reference never had (its sync
    never deletes, trap N6)."""

    def test_delete_where_is_o_changes_and_filters_reads(self, spark, tmp_path):
        target = str(tmp_path / "mor")
        src = _src(spark, 500)
        mor.merge_upsert_mor(spark, src, target, ["K"], num_buckets=8)
        before = _base_files(target)

        r = mor.delete_where_mor(spark, target, F.col("K").isin("3", "77", "401"))
        assert r["delete"] == 3 and r["delta_files"] == 1
        # O(changes): the base is untouched — only a delta dir appeared.
        assert _base_files(target) == before
        view = mor.read_mor(spark, target)
        assert view.count() == 497
        assert view.filter(F.col("K").isin("3", "77", "401")).count() == 0
        # Schema unchanged for readers (no _deleted leakage).
        assert mor.DELETED_COL not in view.columns

    def test_delete_predicate_null_keeps_row(self, spark, tmp_path):
        """SQL DELETE semantics: predicate NULL keeps the row."""
        target = str(tmp_path / "mor")
        rows = [("a", "1"), ("b", None), ("c", "3")]
        df = spark.createDataFrame(rows, ["K", "V"])
        mor.merge_upsert_mor(spark, df, target, ["K"], num_buckets=4)
        r = mor.delete_where_mor(spark, target, F.col("V") > "1")
        assert r["delete"] == 1  # only 'c'; b's NULL comparison keeps it
        assert {x["K"] for x in mor.read_mor(spark, target).collect()} == {"a", "b"}

    def test_delete_keys_prunes_buckets(self, spark, tmp_path):
        target = str(tmp_path / "mor")
        mor.merge_upsert_mor(spark, _src(spark, 500), target, ["K"], num_buckets=8)
        keys = spark.createDataFrame([("42",), ("notthere",)], ["K"])
        r = mor.delete_keys_mor(spark, target, keys, ["K"])
        assert r["delete"] == 1
        assert mor.read_mor(spark, target).filter(F.col("K") == "42").count() == 0
        # Missing keys are a clean no-op delete (idempotent erasure).
        r = mor.delete_keys_mor(spark, target, keys, ["K"])
        assert r["delete"] == 0 and mor._delta_seqs(target)[-1:] == [1]

    def test_snapshot_and_change_feed_semantics(self, spark, tmp_path):
        target = str(tmp_path / "mor")
        src = _src(spark, 300)
        mor.merge_upsert_mor(spark, src, target, ["K"], num_buckets=8)
        m = src.withColumn(
            "V", F.when(F.col("K") == "7", F.lit("m")).otherwise(F.col("V"))
        )
        mor.merge_upsert_mor(spark, m, target, ["K"], num_buckets=8)   # seq 1
        mor.delete_where_mor(spark, target, F.col("K") == "7")          # seq 2

        # Time travel: pre-delete snapshots still see the row.
        assert mor.read_mor(spark, target, as_of_seq=1).filter(
            F.col("K") == "7"
        ).collect()[0]["V"] == "m"
        assert mor.read_mor(spark, target).filter(F.col("K") == "7").count() == 0

        # Change feed: tombstone with full pre-delete image (CDF preimage).
        ch = mor.read_mor_changes(spark, target, since_seq=1).collect()
        assert len(ch) == 1
        assert ch[0]["K"] == "7" and ch[0][mor.DELETED_COL] and ch[0]["V"] == "m"

        # Delete → re-insert: latest feed row is the live re-insert, and
        # the merge classifies it as INSERT with a FRESH surrogate id.
        old_id = ch[0]["id"]
        re_ins = spark.createDataFrame([("7", "reborn")], ["K", "V"])
        r = mor.merge_upsert_mor(spark, re_ins, target, ["K"], num_buckets=8)
        assert (r["insert"], r["update"]) == (1, 0)
        latest = mor.read_mor_changes(spark, target, since_seq=2).collect()
        assert len(latest) == 1 and not latest[0][mor.DELETED_COL]
        assert latest[0]["V"] == "reborn" and latest[0]["id"] != old_id

    def test_compaction_physically_removes_and_empties_buckets(
        self, spark, tmp_path
    ):
        target = str(tmp_path / "mor")
        mor.merge_upsert_mor(spark, _src(spark, 400), target, ["K"], num_buckets=4)
        mor.delete_where_mor(spark, target, F.lit(True), compact_every=None)
        assert mor.read_mor(spark, target).count() == 0
        r = mor.compact_mor(spark, target)
        assert r["buckets_rewritten"] == 4
        # All rows physically gone, layout still readable and mergeable.
        assert mor.read_mor(spark, target).count() == 0
        assert mor._delta_seqs(target) == []
        r = mor.merge_upsert_mor(spark, _src(spark, 50), target, ["K"], num_buckets=4)
        assert r["insert"] == 50
        assert mor.read_mor(spark, target).count() == 50

    def test_randomized_upsert_delete_sequence_matches_model(
        self, spark, tmp_path
    ):
        """Seeded random interleaving of merges, predicate deletes, key
        deletes and compactions against a driver-side dict model — the
        delete analog of the COW differential."""
        import random

        rng = random.Random(20260814)
        target = str(tmp_path / "mor")
        keyspace = [f"k{i}" for i in range(200)]
        model: dict[str, str] = {}
        for step in range(8):
            op = rng.random()
            if op < 0.5 or not model:
                picked = rng.sample(keyspace, rng.randint(20, 80))
                rows = [(k, f"v{step}_{rng.randint(0, 4)}") for k in picked]
                model.update(rows)
                mor.merge_upsert_mor(
                    spark,
                    spark.createDataFrame(rows, ["K", "V"]),
                    target,
                    ["K"],
                    num_buckets=8,
                    compact_every=None,
                )
            elif op < 0.75:
                doomed = rng.sample(sorted(model), rng.randint(1, len(model)))
                mor.delete_keys_mor(
                    spark,
                    target,
                    spark.createDataFrame([(k,) for k in doomed], ["K"]),
                    ["K"],
                    compact_every=None,
                )
                for k in doomed:
                    model.pop(k)
            else:
                suffix = str(rng.randint(0, 4))
                mor.delete_where_mor(
                    spark,
                    target,
                    F.col("V").endswith(suffix),
                    compact_every=None,
                )
                model = {k: v for k, v in model.items() if not v.endswith(suffix)}
            if rng.random() < 0.3:
                mor.compact_mor(spark, target, keep_last=rng.choice([0, 1]))
            assert _state(mor.read_mor(spark, target)) == model, f"step {step}"
        mor.compact_mor(spark, target)
        assert _state(mor.read_mor(spark, target)) == model

    def test_delete_on_non_mor_target_raises(self, spark, tmp_path):
        target = str(tmp_path / "flat")
        merge_upsert_parquet(spark, _src(spark, 50), target, ["K"])
        import pytest

        with pytest.raises(ValueError, match="not a merge-on-read state"):
            mor.delete_where_mor(spark, target, F.lit(True))


class TestDeleteCli:
    def test_delete_subcommand_routes_by_state_kind(
        self, spark, tmp_path, capsys
    ):
        """`delete --target DIR --where PRED` routes like compact: MOR →
        tombstone delta, bucketed COW → pruned rewrite, flat → atomic
        rewrite."""
        import json

        from presencia_etl_spark.__main__ import main
        from presencia_etl_spark.sinks.writers import merge_upsert_partitioned

        src = _src(spark, 100)

        mor_t = str(tmp_path / "mor")
        mor.merge_upsert_mor(spark, src, mor_t, ["K"], num_buckets=4)
        assert main(["delete", "--target", mor_t, "--where", "V = '01'"]) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["result"]["kind"] == "mor" and out["result"]["delete"] > 0
        assert mor.read_mor(spark, mor_t).filter(F.col("V") == "01").count() == 0

        cow_t = str(tmp_path / "cow")
        merge_upsert_partitioned(spark, src, cow_t, ["K"], num_buckets=4)
        assert main(["delete", "--target", cow_t, "--where", "V = '01'"]) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["result"]["kind"] == "bucketed" and out["result"]["delete"] > 0

        flat = str(tmp_path / "flat")
        merge_upsert_parquet(spark, src, flat, ["K"])
        assert main(["delete", "--target", flat, "--where", "V = '01'"]) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["result"]["kind"] == "parquet" and out["result"]["delete"] > 0


class TestLifecycle:
    """Kind-routed delete_rows + TTL apply_retention (sinks/lifecycle)."""

    def test_apply_retention_ttl_on_mor_state(self, spark, tmp_path):
        from presencia_etl_spark.sinks.lifecycle import apply_retention, delete_rows

        target = str(tmp_path / "mor")
        rows = [
            ("a", "2026-01-01"), ("b", "2026-06-01"),
            ("c", "2026-08-01"), ("d", None),  # NULL age → retained
        ]
        df = spark.createDataFrame(rows, ["K", "day"]).withColumn(
            "day", F.to_date("day")
        )
        mor.merge_upsert_mor(spark, df, target, ["K"], num_buckets=4)
        r = apply_retention(spark, target, "day", cutoff="2026-07-01")
        assert r["kind"] == "mor" and r["delete"] == 2
        kept = {x["K"] for x in mor.read_mor(spark, target).collect()}
        assert kept == {"c", "d"}

        # keep_days form runs (cutoff = engine-side current_date − N; with
        # a huge window nothing else expires).
        r = apply_retention(spark, target, "day", keep_days=100_000)
        assert r["delete"] == 0
        import pytest

        with pytest.raises(ValueError, match="exactly one"):
            apply_retention(spark, target, "day")

        # delete_rows routes flat states too.
        flat = str(tmp_path / "flat")
        merge_upsert_parquet(spark, _src(spark, 30), flat, ["K"])
        r = delete_rows(spark, flat, "V = '01'")
        assert r["kind"] == "parquet" and r["delete"] > 0

    def test_delete_cli_ttl_form(self, spark, tmp_path, capsys):
        import json

        from presencia_etl_spark.__main__ import main

        target = str(tmp_path / "mor")
        df = spark.createDataFrame(
            [("a", "2000-01-01"), ("b", "2099-01-01")], ["K", "day"]
        ).withColumn("day", F.to_date("day"))
        mor.merge_upsert_mor(spark, df, target, ["K"], num_buckets=4)
        rc = main([
            "delete", "--target", target,
            "--retain-days", "3650", "--date-col", "day",
        ])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["result"]["delete"] == 1
        assert {x["K"] for x in mor.read_mor(spark, target).collect()} == {"b"}


class TestSnapshotDiffDeletes:
    """delete_missing=True — MERGE ... WHEN NOT MATCHED BY SOURCE THEN
    DELETE: full-snapshot syncs tombstone vanished keys atomically with
    the run's upserts."""

    def test_vanished_keys_tombstone_in_same_delta(self, spark, tmp_path):
        target = str(tmp_path / "mor")
        src = _src(spark, 300)
        mor.merge_upsert_mor(spark, src, target, ["K"], num_buckets=8)

        # Snapshot 2: rows 0-249 survive (10 mutated), 250-299 vanish.
        snap2 = _src(spark, 250).withColumn(
            "V",
            F.when(F.col("K").cast("int") < 10, F.lit("m")).otherwise(F.col("V")),
        )
        r = mor.merge_upsert_mor(
            spark, snap2, target, ["K"], num_buckets=8, delete_missing=True
        )
        assert (r["insert"], r["update"], r["delete"]) == (0, 10, 50)
        # ONE delta dir: upserts and tombstones committed atomically.
        assert mor._delta_seqs(target) == [1]
        assert _state(mor.read_mor(spark, target)) == _state(snap2)

        # Replay the same snapshot: fully idempotent, nothing written.
        r = mor.merge_upsert_mor(
            spark, snap2, target, ["K"], num_buckets=8, delete_missing=True
        )
        assert (r["insert"], r["update"], r["delete"]) == (0, 0, 0)
        assert mor._delta_seqs(target) == [1]

        # The change feed shows both event kinds from the one sequence.
        ch = mor.read_mor_changes(spark, target, since_seq=0)
        by_kind = {
            bool(r_[mor.DELETED_COL]) for r_ in ch.select(mor.DELETED_COL).collect()
        }
        assert by_kind == {True, False}
        assert ch.filter(F.col(mor.DELETED_COL)).count() == 50

        # A vanished key returning in snapshot 3 re-inserts fresh.
        snap3 = _src(spark, 251).withColumn(
            "V",
            F.when(F.col("K").cast("int") < 10, F.lit("m")).otherwise(F.col("V")),
        )
        r = mor.merge_upsert_mor(
            spark, snap3, target, ["K"], num_buckets=8, delete_missing=True
        )
        assert (r["insert"], r["delete"]) == (1, 0)
        assert _state(mor.read_mor(spark, target)) == _state(snap3)

    def test_delete_only_snapshot_and_default_never_deletes(
        self, spark, tmp_path
    ):
        target = str(tmp_path / "mor")
        src = _src(spark, 100)
        mor.merge_upsert_mor(spark, src, target, ["K"], num_buckets=4)
        shrunk = _src(spark, 80)

        # Default (reference semantics): absence is NOT deletion.
        r = mor.merge_upsert_mor(spark, shrunk, target, ["K"], num_buckets=4)
        assert r["delete"] == 0 and r["skip"] == 80
        assert mor.read_mor(spark, target).count() == 100

        # Opt-in: a delete-only diff still commits (no upserts at all).
        r = mor.merge_upsert_mor(
            spark, shrunk, target, ["K"], num_buckets=4, delete_missing=True
        )
        assert (r["insert"], r["update"], r["delete"]) == (0, 0, 20)
        assert mor.read_mor(spark, target).count() == 80

    def test_snapshot_diff_through_drift_merge(self, spark, tmp_path):
        """A snapshot that simultaneously drifts the schema AND drops keys:
        the COW fold widens, then vanished keys tombstone (follow-up
        sequence; replays converge)."""
        target = str(tmp_path / "mor")
        src = _src(spark, 120)
        mor.merge_upsert_mor(spark, src, target, ["K"], num_buckets=4)
        grown = _src(spark, 100).withColumn("W", F.concat(F.lit("w"), F.col("K")))
        r = mor.merge_upsert_mor(
            spark, grown, target, ["K"], num_buckets=4, delete_missing=True
        )
        assert r["delete"] == 20
        view = mor.read_mor(spark, target)
        assert view.count() == 100 and "W" in view.columns
        # Replay converges.
        r = mor.merge_upsert_mor(
            spark, grown, target, ["K"], num_buckets=4, delete_missing=True
        )
        assert r["delete"] == 0 and r["insert"] == 0 and r["update"] == 0

    def test_sync_plan_wires_sync_deletes(self, spark, tmp_path):
        import pytest

        from presencia_etl_spark.plans.incremental_sync import (
            incremental_sync_table,
        )
        from presencia_etl_spark.sources.registry import TableConfig

        df = spark.createDataFrame(
            [(str(i), f"v{i}") for i in range(50)], ["K", "V"]
        )
        cfg = TableConfig("t", key_cols=["K"], merge_mode="mor",
                          num_buckets=4, sync_deletes=True)
        incremental_sync_table(spark, df, cfg, str(tmp_path))
        shrunk = df.filter(F.col("K").cast("int") < 40)
        r = incremental_sync_table(spark, shrunk, cfg, str(tmp_path))
        assert r["delete"] == 10
        assert mor.read_mor(spark, str(tmp_path / "t")).count() == 40

        bad = TableConfig("t2", key_cols=["K"], sync_deletes=True)
        with pytest.raises(ValueError, match="requires merge_mode='mor'"):
            incremental_sync_table(spark, df, bad, str(tmp_path))


class TestEmptySnapshotGuard:
    def test_empty_source_snapshot_refused(self, spark, tmp_path):
        """The classic snapshot-sync disaster guard: an empty source with
        delete_missing must refuse rather than erase the table; truncation
        must be an explicit delete."""
        import pytest

        target = str(tmp_path / "mor")
        src = _src(spark, 100)
        mor.merge_upsert_mor(spark, src, target, ["K"], num_buckets=4)
        empty = src.filter(F.lit(False))
        with pytest.raises(ValueError, match="source snapshot is EMPTY"):
            mor.merge_upsert_mor(
                spark, empty, target, ["K"], num_buckets=4, delete_missing=True
            )
        # Nothing was written; state intact.
        assert mor._delta_seqs(target) == []
        assert mor.read_mor(spark, target).count() == 100
        # The explicit form still works.
        r = mor.delete_where_mor(spark, target, F.lit(True))
        assert r["delete"] == 100


class TestEmptyBaseCrashRecovery:
    """A crash inside compact_mor between the bucket swap and the
    empty-layout reseed (tombstones emptied EVERY bucket) leaves zero base
    parquet files. Every path must heal or tolerate that, not wedge on
    UNABLE_TO_INFER_SCHEMA."""

    def _crashed_empty_base(self, spark, tmp_path, monkeypatch):
        target = str(tmp_path / "mor")
        mor.merge_upsert_mor(
            spark, _src(spark, 40), target, ["K"], num_buckets=4,
            compact_every=None,
        )
        mor.delete_where_mor(
            spark, target, F.lit(True), compact_every=None
        )
        # Simulate the crash: the swap lands (all buckets empty), then the
        # process dies before the reseed runs.
        def boom(*a, **k):
            raise RuntimeError("simulated crash before reseed")

        monkeypatch.setattr(mor, "_reseed_empty_layout", boom)
        try:
            mor.compact_mor(spark, target)
        except RuntimeError:
            pass
        monkeypatch.undo()
        assert not mor._has_parquet_files(os.path.join(target, "base"))
        # The crash window precedes delta removal: deltas survive.
        assert mor._delta_seqs(target)
        return target

    def test_read_paths_tolerate_fileless_base(self, spark, tmp_path, monkeypatch):
        target = self._crashed_empty_base(spark, tmp_path, monkeypatch)
        # Readers hold no lock: they substitute an empty base (schema from
        # the delta footers) WITHOUT writing anything.
        view = mor.read_mor(spark, target)
        assert view.count() == 0
        assert "K" in view.columns and "V" in view.columns
        assert not mor._has_parquet_files(os.path.join(target, "base"))

    def test_write_paths_heal_fileless_base(self, spark, tmp_path, monkeypatch):
        target = self._crashed_empty_base(spark, tmp_path, monkeypatch)
        # The next merge heals the layout under its writer lock, then
        # proceeds normally (the surviving tombstone deltas re-apply —
        # idempotent — and the new rows land as a fresh delta).
        r = mor.merge_upsert_mor(
            spark, _src(spark, 10, salt="x"), target, ["K"], num_buckets=4,
            compact_every=None,
        )
        assert r["insert"] == 10
        assert mor._has_parquet_files(os.path.join(target, "base"))
        assert mor.read_mor(spark, target).count() == 10
        # And a retried compaction completes what the crash interrupted.
        mor.compact_mor(spark, target)
        assert mor.read_mor(spark, target).count() == 10

    def test_compact_retry_alone_recovers(self, spark, tmp_path, monkeypatch):
        target = self._crashed_empty_base(spark, tmp_path, monkeypatch)
        mor.compact_mor(spark, target)
        assert mor._has_parquet_files(os.path.join(target, "base"))
        assert mor.read_mor(spark, target).count() == 0
        assert not mor._delta_seqs(target)


class TestBucketPrunedRead:
    """read_mor(buckets=...) prunes the base read at the file LISTING —
    and must stay an exact filter-equivalent (delta overrides and
    tombstones from other buckets must not leak in, ones inside must)."""

    def test_buckets_read_equals_filtered_read(self, spark, tmp_path):
        target = str(tmp_path / "mor")
        src = _src(spark, 400)
        mor.merge_upsert_mor(spark, src, target, ["K"], num_buckets=8,
                             compact_every=None)
        m = src.withColumn(
            "V", F.when(F.col("K").isin("5", "9"), F.lit("mut")).otherwise(F.col("V"))
        )
        mor.merge_upsert_mor(spark, m, target, ["K"], num_buckets=8,
                             compact_every=None)
        mor.delete_where_mor(spark, target, F.col("K") == "17",
                             compact_every=None)
        full = mor.read_mor(spark, target)
        for b in range(8):
            pruned = mor.read_mor(spark, target, buckets=[b])
            want = _state(full.filter(F.col(mor.BUCKET_COL) == b))
            assert _state(pruned) == want
        # Missing bucket numbers are an empty (not erroring) read.
        assert mor.read_mor(spark, target, buckets=[999]).count() == 0

    def test_buckets_read_lists_only_named_dirs(self, spark, tmp_path):
        target = str(tmp_path / "mor")
        mor.merge_upsert_mor(spark, _src(spark, 400), target, ["K"],
                             num_buckets=8)
        df = mor.read_mor(spark, target, buckets=[3])
        files = df.inputFiles()
        assert files and all("_kb=3" in f for f in files), files
        # And the listing itself was pruned: one root, not num_buckets.
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryFileIndex(1 paths)" in plan, plan


class TestCompactCrashWindows:
    """The post-swap crash windows must be CONSERVATIVE: once the base is
    folded, an old snapshot/change cursor raises — never silently returns
    the folded state labeled as old history (time travel) or a change set
    missing the folded deltas (the change feed's zero-loss guarantee)."""

    def test_floor_is_raised_before_delta_removal(
        self, spark, tmp_path, monkeypatch
    ):
        import pytest as _pytest

        target = str(tmp_path / "mor")
        s1 = _src(spark, 300)
        s2 = _src(spark, 300, salt="x")
        mor.merge_upsert_mor(spark, s1, target, ["K"], num_buckets=8,
                             compact_every=None)
        mor.merge_upsert_mor(spark, s2, target, ["K"], num_buckets=8,
                             compact_every=None)

        orig_rmtree = mor.shutil.rmtree  # bind BEFORE the patch

        def crashing_rmtree(path, *a, **k):
            # Crash exactly at delta removal (after the swap landed); the
            # staged-dir cleanup and any other rmtree proceed normally.
            if f"{os.sep}{mor.DELTA_DIR}{os.sep}" in str(path):
                raise RuntimeError("simulated crash during delta removal")
            return orig_rmtree(path, *a, **k)

        monkeypatch.setattr(mor.shutil, "rmtree", crashing_rmtree)
        with _pytest.raises(RuntimeError, match="simulated crash"):
            mor.compact_mor(spark, target)
        monkeypatch.undo()

        # The swap landed, the deltas survived the crash — and the floor
        # was ALREADY raised, so both history APIs refuse loudly instead
        # of lying.
        assert mor._delta_seqs(target)  # deltas still live
        assert mor._read_meta(target)["compacted_through"] == 1
        with _pytest.raises(ValueError, match="compacted_through"):
            mor.read_mor(spark, target, as_of_seq=0)
        with _pytest.raises(ValueError, match="compacted_through"):
            mor.read_mor_changes(spark, target, since_seq=0)

        # Current reads re-apply the surviving deltas idempotently …
        assert _state(mor.read_mor(spark, target)) == _state(s2)
        # … and a retried compact converges (folds + removes them).
        r = mor.compact_mor(spark, target)
        assert r["deltas_folded"] >= 1
        assert mor._delta_seqs(target) == []
        assert _state(mor.read_mor(spark, target)) == _state(s2)

    def test_swap_failure_with_complete_rollback_restores_floor(
        self, spark, tmp_path, monkeypatch
    ):
        """A transient Python failure MID-SWAP rolls the base back fully;
        the pre-raised compacted_through floor must come back down so
        lagging change-feed cursors / old snapshots keep working — every
        delta they need still exists on disk."""
        import pytest as _pytest

        from presencia_etl_spark.sinks import writers as writers_mod

        target = str(tmp_path / "mor")
        s1 = _src(spark, 300)
        s2 = _src(spark, 300, salt="x")
        mor.merge_upsert_mor(spark, s1, target, ["K"], num_buckets=8,
                             compact_every=None)
        mor.merge_upsert_mor(spark, s2, target, ["K"], num_buckets=8,
                             compact_every=None)
        before_files = _base_files(target)
        base_path = os.path.join(target, "base")

        orig_rename = writers_mod.os.rename
        seen = {"n": 0, "fired": False}

        def flaky_rename(src, dst):
            # Fail ONCE, on the second rename that lands a staged bucket
            # into the live base — so one bucket is already fully swapped
            # (the mixed-state case) and the rollback must un-swap it.
            if (
                str(dst).startswith(base_path)
                and os.path.basename(str(dst)).startswith("_kb=")
                and str(src).find("_old_") < 0
            ):
                seen["n"] += 1
                if seen["n"] == 2 and not seen["fired"]:
                    seen["fired"] = True
                    raise OSError("simulated transient rename failure")
            return orig_rename(src, dst)

        monkeypatch.setattr(writers_mod.os, "rename", flaky_rename)
        with _pytest.raises(OSError, match="simulated transient"):
            mor.compact_mor(spark, target)
        monkeypatch.undo()

        # Rollback was complete: base byte-layout restored, floor back
        # down, every history API still works.
        assert _base_files(target) == before_files
        assert mor._read_meta(target)["compacted_through"] == 0
        assert mor._delta_seqs(target)
        assert _state(mor.read_mor(spark, target, as_of_seq=0)) == _state(s1)
        changes = mor.read_mor_changes(spark, target, since_seq=0)
        assert changes.count() > 0
        assert _state(mor.read_mor(spark, target)) == _state(s2)
        # A retried compact converges.
        r = mor.compact_mor(spark, target)
        assert r["deltas_folded"] >= 1
        assert mor._delta_seqs(target) == []
        assert _state(mor.read_mor(spark, target)) == _state(s2)

    def test_swap_failure_with_incomplete_rollback_keeps_floor(
        self, spark, tmp_path, monkeypatch
    ):
        """When the inline rollback itself fails (base may be mixed old/
        folded), the raised floor must STAY raised: old cursors raise
        loudly instead of mislabeling folded data as history."""
        import pytest as _pytest

        from presencia_etl_spark.sinks import writers as writers_mod

        target = str(tmp_path / "mor")
        mor.merge_upsert_mor(spark, _src(spark, 300), target, ["K"],
                             num_buckets=8, compact_every=None)
        mor.merge_upsert_mor(spark, _src(spark, 300, salt="x"), target,
                             ["K"], num_buckets=8, compact_every=None)
        base_path = os.path.join(target, "base")

        orig_rename = writers_mod.os.rename

        def broken_rename(src, dst):
            # EVERY rename landing anything into a live bucket dir fails
            # — the forward swap fails AND the in-flight parked restore
            # fails, so the rollback reports incomplete.
            if str(dst).startswith(base_path) and os.path.basename(
                str(dst)
            ).startswith("_kb="):
                raise OSError("simulated persistent rename failure")
            return orig_rename(src, dst)

        monkeypatch.setattr(writers_mod.os, "rename", broken_rename)
        with _pytest.raises(OSError, match="simulated persistent"):
            mor.compact_mor(spark, target)
        monkeypatch.undo()

        # Floor stays raised (conservative), old reads raise loudly,
        # current reads still correct via surviving deltas.
        assert mor._read_meta(target)["compacted_through"] == 1
        with _pytest.raises(ValueError, match="compacted_through"):
            mor.read_mor_changes(spark, target, since_seq=0)
        assert _state(mor.read_mor(spark, target)) == _state(
            _src(spark, 300, salt="x")
        )

        # The incomplete rollback may have left a bucket's ONLY copy
        # parked under the staged dir — the journal and the staged dir
        # must both SURVIVE (removing either would orphan the copy and
        # let the next merge reclassify the bucket's rows as inserts).
        journal = os.path.join(base_path, writers_mod.MERGE_JOURNAL)
        assert os.path.exists(journal)
        import json as _json

        staged_ref = _json.load(open(journal))["staged"]
        assert os.path.isdir(staged_ref)
        # The next op recovers from the journal and converges.
        r = mor.compact_mor(spark, target)
        assert not os.path.exists(journal)
        assert not os.path.exists(staged_ref)
        assert mor._delta_seqs(target) == []
        assert _state(mor.read_mor(spark, target)) == _state(
            _src(spark, 300, salt="x")
        )

    def test_orphan_compact_staging_swept_on_next_merge(self, spark, tmp_path):
        target = str(tmp_path / "mor")
        mor.merge_upsert_mor(spark, _src(spark, 100), target, ["K"],
                             num_buckets=4, compact_every=None)
        # A compact SIGKILLed mid-staging-write (before the swap journal
        # existed) leaves its whole staged output orphaned in the target.
        orphan = os.path.join(target, f"{mor.COMPACT_STAGING_PREFIX}dead")
        os.makedirs(os.path.join(orphan, "_kb=0"))
        with open(os.path.join(orphan, "_kb=0", "part-0.parquet"), "wb") as fh:
            fh.write(b"torn")
        mor.merge_upsert_mor(spark, _src(spark, 100, salt="x"), target,
                             ["K"], num_buckets=4, compact_every=None)
        assert not os.path.exists(orphan)
        assert _state(mor.read_mor(spark, target)) == _state(
            _src(spark, 100, salt="x")
        )

    def test_hidden_dirs_invisible_to_fileless_probe(self, tmp_path):
        base = tmp_path / "base"
        (base / ".staged_merge_x" / "_kb=0").mkdir(parents=True)
        (base / ".staged_merge_x" / "_kb=0" / "part-0.parquet").write_bytes(b"x")
        (base / "_temporary" / "0").mkdir(parents=True)
        (base / "_temporary" / "0" / "part-1.parquet").write_bytes(b"x")
        # Only Spark-visible parquet counts: staged dot-dirs and committer
        # _temporary trees must not make a fileless base look populated.
        assert not mor._has_parquet_files(str(base))
        (base / "_kb=0").mkdir()
        (base / "_kb=0" / "part-2.parquet").write_bytes(b"x")
        assert mor._has_parquet_files(str(base))


class TestMixedChangeBatch:
    """merge_upsert_mor(delete_keys=...): an explicit upsert+delete batch
    committed as ONE delta sequence — the CDC-feed-apply / view-refresh
    shape."""

    def _seeded(self, spark, tmp_path, n=2000):
        t = str(tmp_path / "mixed")
        mor.merge_upsert_mor(
            spark, _src(spark, n), t, ["K"], num_buckets=16,
            compact_every=None,
        )
        return t

    def test_upserts_and_deletes_in_one_sequence(self, spark, tmp_path):
        t = self._seeded(spark, tmp_path)
        ups = _src(spark, 2010, salt="9").filter(
            (F.col("K").cast("long") % 500 == 0)
            | (F.col("K").cast("long") >= 2000)
        )  # 4 updates + 10 inserts
        dels = spark.createDataFrame([("7",), ("13",)], "K string")
        seq0 = mor.mor_history(t)["seq"]
        r = mor.merge_upsert_mor(
            spark, ups, t, ["K"], compact_every=None, delete_keys=dels
        )
        assert (r["insert"], r["update"], r["delete"]) == (10, 4, 2)
        assert mor.mor_history(t)["seq"] == seq0 + 1  # ONE atomic commit
        st = _state(mor.read_mor(spark, t))
        assert "7" not in st and "13" not in st
        assert st["2005"].startswith("9") and st["500"].startswith("9")
        assert len(st) == 2000 - 2 + 10

    def test_upsert_wins_over_delete_of_same_key(self, spark, tmp_path):
        t = self._seeded(spark, tmp_path, n=100)
        ups = _src(spark, 100, salt="z").filter(F.col("K") == "42")
        dels = spark.createDataFrame([("42",), ("43",)], "K string")
        r = mor.merge_upsert_mor(
            spark, ups, t, ["K"], compact_every=None, delete_keys=dels
        )
        assert r["update"] == 1 and r["delete"] == 1
        st = _state(mor.read_mor(spark, t))
        assert st["42"].startswith("z") and "43" not in st

    def test_pure_delete_batch_and_idempotent_replay(self, spark, tmp_path):
        t = self._seeded(spark, tmp_path, n=100)
        empty = _src(spark, 0)
        dels = spark.createDataFrame([("5",), ("6",), ("999",)], "K string")
        r = mor.merge_upsert_mor(
            spark, empty, t, ["K"], compact_every=None, delete_keys=dels
        )
        # key 999 is not live -> no-op for it
        assert r["delete"] == 2 and r["insert"] == 0 and r["update"] == 0
        seq1 = mor.mor_history(t)["seq"]
        # replay: tombstoned keys are no longer live; NOTHING written
        r2 = mor.merge_upsert_mor(
            spark, empty, t, ["K"], compact_every=None, delete_keys=dels
        )
        assert r2["delete"] == 0 and r2["delta_files"] == 0
        assert mor.mor_history(t)["seq"] == seq1
        assert len(_state(mor.read_mor(spark, t))) == 98

    def test_mutually_exclusive_with_delete_missing(self, spark, tmp_path):
        import pytest

        t = self._seeded(spark, tmp_path, n=50)
        dels = spark.createDataFrame([("1",)], "K string")
        with pytest.raises(ValueError, match="mutually exclusive"):
            mor.merge_upsert_mor(
                spark, _src(spark, 50), t, ["K"],
                delete_missing=True, delete_keys=dels,
            )

    def test_change_feed_carries_both_sides(self, spark, tmp_path):
        """The mixed delta feeds downstream consumers correctly: deletes
        come back flagged with the pre-delete image, upserts unflagged."""
        t = self._seeded(spark, tmp_path, n=100)
        since = mor.mor_history(t)["seq"]
        ups = _src(spark, 100, salt="w").filter(F.col("K") == "10")
        dels = spark.createDataFrame([("20",)], "K string")
        mor.merge_upsert_mor(
            spark, ups, t, ["K"], compact_every=None, delete_keys=dels
        )
        feed = mor.read_mor_changes(spark, t, since_seq=since).collect()
        by_key = {r["K"]: r for r in feed}
        assert set(by_key) == {"10", "20"}
        assert not by_key["10"][mor.DELETED_COL]
        assert by_key["20"][mor.DELETED_COL] and by_key["20"]["V"] is not None

    def test_sidecar_stays_valid_across_mixed_batch(self, spark, tmp_path):
        from presencia_etl_spark.sinks import digest_store

        t = self._seeded(spark, tmp_path, n=400)
        # second merge seeds the sidecar (first classify pass saves it)
        mor.merge_upsert_mor(
            spark, _src(spark, 400), t, ["K"], compact_every=None
        )
        assert digest_store.load(t) is not None
        ups = _src(spark, 410, salt="q").filter(F.col("K").cast("long") >= 400)
        dels = spark.createDataFrame([("3",), ("4",)], "K string")
        mor.merge_upsert_mor(
            spark, ups, t, ["K"], compact_every=None, delete_keys=dels
        )
        side = digest_store.load(t)
        assert side is not None
        # maintained digest == digest recomputed from the live view
        live = mor.read_mor(spark, t)
        rows = cdc._digest(
            live.select(cdc.KEY_COL, "row_hash"), "row_hash",
            cdc.DIGEST_MICRO_BUCKETS, "s",
        ).collect()
        scan = {r[cdc.MB_COL]: (r["_cs"], r["_xs"], r["_ys"]) for r in rows}
        assert side == scan

    def test_classify_prune_differential(self, spark, tmp_path, monkeypatch):
        """The known-subset classify prune (source-bucket + In-pushed
        target read) must be exactly filter-equivalent: the same mixed
        batch applied with the prune forced OFF (KEY_PUSHDOWN_LIMIT=0)
        lands the identical state and counts."""
        results = []
        for tag, limit in (("pruned", None), ("full", 0)):
            if limit is not None:
                monkeypatch.setattr(mor, "KEY_PUSHDOWN_LIMIT", limit)
            else:
                monkeypatch.undo()
            t = str(tmp_path / f"st_{tag}")
            mor.merge_upsert_mor(
                spark, _src(spark, 300), t, ["K"], num_buckets=8,
                compact_every=None,
            )
            ups = _src(spark, 310, salt="p").filter(
                (F.col("K").cast("long") % 50 == 0)
                | (F.col("K").cast("long") >= 300)
            )
            dels = spark.createDataFrame([("17",), ("18",), ("888",)], "K string")
            r = mor.merge_upsert_mor(
                spark, ups, t, ["K"], compact_every=None,
                digest_prune=False, delete_keys=dels,
            )
            results.append(
                (
                    (r["insert"], r["update"], r["delete"], r["skip"]),
                    _state(mor.read_mor(spark, t)),
                )
            )
        assert results[0] == results[1]
