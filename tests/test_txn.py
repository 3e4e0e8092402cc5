"""Atomic multi-table commit (sinks/txn) — visibility, rollback, crash
recovery at every window (before the journal, after it, mid-publish),
idempotent replay, lock discipline, digest deferral, and a randomized
transactional-vs-plain equivalence."""

from __future__ import annotations

import json
import os
import random

import pytest
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from presencia_etl_spark.sinks import digest_store, maintenance, mor
from presencia_etl_spark.sinks import txn as txn_mod
from presencia_etl_spark.sinks.locking import StateLockedError
from presencia_etl_spark.sinks.txn import (
    MultiTableTxn,
    TxnError,
    TxnUnsupported,
    recover_transactions,
)

SCHEMA = StructType(
    [
        StructField("K", StringType()),
        StructField("v", LongType()),
    ]
)


def _df(spark, pairs):
    return spark.createDataFrame(
        [(str(k), int(v)) for k, v in pairs], SCHEMA
    )


def _seed(spark, tmp_path, names=("t1", "t2"), n=40):
    paths = []
    for name in names:
        p = str(tmp_path / name)
        mor.merge_upsert_mor(
            spark, _df(spark, [(i, i * 10) for i in range(n)]), p, ["K"],
            num_buckets=4, compact_every=None,
        )
        paths.append(p)
    return paths


def _state(spark, path):
    return {
        r["K"]: r["v"] for r in mor.read_mor(spark, path).collect()
    }


class TestCommit:
    def test_all_tables_publish_atomically(self, spark, tmp_path):
        t1, t2 = _seed(spark, tmp_path)
        root = str(tmp_path / "txn")
        pre1, pre2 = _state(spark, t1), _state(spark, t2)
        seq1 = mor.mor_history(t1)["seq"]
        with MultiTableTxn(root) as txn:
            r1 = txn.merge(
                spark, _df(spark, [(1, 111), (100, 1000)]), t1, ["K"]
            )
            r2 = txn.merge(
                spark, _df(spark, [(2, 222)]), t2, ["K"],
                delete_keys=_df(spark, [(3, 0)]).select("K"),
            )
            # staged, not visible: reads still serve the pre-state and
            # no cursor moved
            assert _state(spark, t1) == pre1
            assert _state(spark, t2) == pre2
            assert mor.mor_history(t1)["seq"] == seq1
            assert r1 == {**r1, "insert": 1, "update": 1}
            assert r2["update"] == 1 and r2["delete"] == 1
            c = txn.commit()
        assert c["tables"] == 2
        s1, s2 = _state(spark, t1), _state(spark, t2)
        assert s1["1"] == 111 and s1["100"] == 1000
        assert s2["2"] == 222 and "3" not in s2
        assert mor.mor_history(t1)["seq"] == seq1 + 1
        # journal removed; staged dirs gone
        assert not [
            f for f in os.listdir(root) if f.startswith(txn_mod.JOURNAL_PREFIX)
        ]
        for t in (t1, t2):
            assert not [
                d
                for d in os.listdir(os.path.join(t, mor.DELTA_DIR))
                if d.startswith(txn_mod.TXN_PREFIX)
            ]
        # the tables keep working normally afterwards
        mor.merge_upsert_mor(
            spark, _df(spark, [(7, 777)]), t1, ["K"], compact_every=None
        )
        assert _state(spark, t1)["7"] == 777

    def test_empty_commit(self, spark, tmp_path):
        root = str(tmp_path / "txn")
        with MultiTableTxn(root) as txn:
            assert txn.commit() == {"tables": 0, "txn_id": txn.txn_id}

    def test_noop_merge_stages_nothing(self, spark, tmp_path):
        (t1,) = _seed(spark, tmp_path, names=("t1",))
        root = str(tmp_path / "txn")
        with MultiTableTxn(root) as txn:
            r = txn.merge(
                spark, _df(spark, [(1, 10)]), t1, ["K"]
            )  # identical row → skip
            assert r["insert"] == r["update"] == 0
            assert txn.commit()["tables"] == 0


class TestAbortAndRefusals:
    def test_abort_rolls_back_and_releases(self, spark, tmp_path):
        t1, t2 = _seed(spark, tmp_path)
        root = str(tmp_path / "txn")
        pre = _state(spark, t1)
        txn = MultiTableTxn(root)
        txn.merge(spark, _df(spark, [(1, 999)]), t1, ["K"])
        txn.abort()
        assert _state(spark, t1) == pre
        assert not [
            d
            for d in os.listdir(os.path.join(t1, mor.DELTA_DIR))
            if d.startswith(txn_mod.TXN_PREFIX)
        ]
        # lock released: a plain merge succeeds
        mor.merge_upsert_mor(
            spark, _df(spark, [(1, 999)]), t1, ["K"], compact_every=None
        )
        assert _state(spark, t1)["1"] == 999

    def test_context_exit_without_commit_aborts(self, spark, tmp_path):
        (t1,) = _seed(spark, tmp_path, names=("t1",))
        pre = _state(spark, t1)
        with MultiTableTxn(str(tmp_path / "txn")) as txn:
            txn.merge(spark, _df(spark, [(1, 5)]), t1, ["K"])
        assert _state(spark, t1) == pre

    def test_double_merge_same_table_refused(self, spark, tmp_path):
        (t1,) = _seed(spark, tmp_path, names=("t1",))
        with MultiTableTxn(str(tmp_path / "txn")) as txn:
            txn.merge(spark, _df(spark, [(1, 5)]), t1, ["K"])
            with pytest.raises(TxnError, match="already has a staged"):
                txn.merge(spark, _df(spark, [(2, 6)]), t1, ["K"])

    def test_initial_load_refused(self, spark, tmp_path):
        with MultiTableTxn(str(tmp_path / "txn")) as txn:
            with pytest.raises(TxnUnsupported, match="initial load"):
                txn.merge(
                    spark, _df(spark, [(1, 1)]),
                    str(tmp_path / "fresh"), ["K"],
                )

    def test_reuse_after_done_refused(self, spark, tmp_path):
        (t1,) = _seed(spark, tmp_path, names=("t1",))
        txn = MultiTableTxn(str(tmp_path / "txn"))
        txn.commit()
        with pytest.raises(TxnError, match="already committed"):
            txn.merge(spark, _df(spark, [(1, 5)]), t1, ["K"])

    def test_outside_writer_blocked_while_preparing(self, spark, tmp_path):
        """A writer on ANOTHER thread (the cron-double-run shape) is
        refused while the transaction holds the table. (Same-thread
        calls would reenter by design — that's the merge-holds-lock-
        during-compact discipline.)"""
        import threading

        (t1,) = _seed(spark, tmp_path, names=("t1",))
        with MultiTableTxn(str(tmp_path / "txn")) as txn:
            txn.merge(spark, _df(spark, [(1, 5)]), t1, ["K"])
            caught: list = []

            def outside():
                try:
                    mor.merge_upsert_mor(
                        spark, _df(spark, [(2, 6)]), t1, ["K"],
                        compact_every=None,
                    )
                except StateLockedError as e:
                    caught.append(e)

            th = threading.Thread(target=outside)
            th.start()
            th.join()
            assert len(caught) == 1


class TestCrashRecovery:
    def test_crash_before_commit_point_rolls_back(self, spark, tmp_path):
        """Torn prepare: staged dirs exist, no journal. Recovery sweeps
        them (locks freed — the 'process' died) and the tables are
        untouched."""
        t1, t2 = _seed(spark, tmp_path)
        root = str(tmp_path / "txn")
        pre1 = _state(spark, t1)
        txn = MultiTableTxn(root)
        txn.merge(spark, _df(spark, [(1, 999)]), t1, ["K"])
        txn.merge(spark, _df(spark, [(2, 888)]), t2, ["K"])
        txn._locks.close()  # simulate the process dying pre-journal
        r = recover_transactions(root, tables=[t1, t2])
        assert r["rolled_forward"] == 0 and r["swept_staged"] == 2
        assert _state(spark, t1) == pre1
        mor.merge_upsert_mor(  # table is healthy afterwards
            spark, _df(spark, [(5, 55)]), t1, ["K"], compact_every=None
        )

    def test_live_preparing_txn_not_swept(self, spark, tmp_path):
        (t1,) = _seed(spark, tmp_path, names=("t1",))
        root = str(tmp_path / "txn")
        with MultiTableTxn(root) as txn:
            txn.merge(spark, _df(spark, [(1, 999)]), t1, ["K"])
            r = recover_transactions(root, tables=[t1])
            assert r["swept_staged"] == 0  # lock held → left alone
            assert txn.commit()["tables"] == 1
        assert _state(spark, t1)["1"] == 999

    def test_crash_after_commit_point_rolls_forward(self, spark, tmp_path):
        """The journal exists, no rename ran: recovery publishes every
        table — the all-or-nothing guarantee — idempotently on replay."""
        t1, t2 = _seed(spark, tmp_path)
        root = str(tmp_path / "txn")
        txn = MultiTableTxn(root)
        txn.merge(spark, _df(spark, [(1, 999), (300, 3)]), t1, ["K"])
        txn.merge(spark, _df(spark, [(2, 888)]), t2, ["K"])
        jp = txn_mod._journal_path(root, txn.txn_id)
        with open(jp + ".tmp", "w") as fh:
            json.dump({"txn_id": txn.txn_id, "entries": txn._entries}, fh)
        os.replace(jp + ".tmp", jp)
        txn._locks.close()  # crash right after the commit point
        r = recover_transactions(root, tables=[t1, t2])
        assert r["rolled_forward"] == 1
        s1, s2 = _state(spark, t1), _state(spark, t2)
        assert s1["1"] == 999 and s1["300"] == 3 and s2["2"] == 888
        # replay is a no-op
        r2 = recover_transactions(root, tables=[t1, t2])
        assert r2["rolled_forward"] == 0 and r2["swept_staged"] == 0

    def test_crash_mid_publish_completes(self, spark, tmp_path):
        """One table's rename landed, the other's didn't, metas never
        bumped: recovery completes the remainder and both cursors
        advance."""
        t1, t2 = _seed(spark, tmp_path)
        root = str(tmp_path / "txn")
        txn = MultiTableTxn(root)
        txn.merge(spark, _df(spark, [(1, 999)]), t1, ["K"])
        txn.merge(spark, _df(spark, [(2, 888)]), t2, ["K"])
        jp = txn_mod._journal_path(root, txn.txn_id)
        with open(jp, "w") as fh:
            json.dump({"txn_id": txn.txn_id, "entries": txn._entries}, fh)
        e0 = txn._entries[0]
        os.rename(e0["staged"], e0["final"])  # crash after rename #1
        txn._locks.close()
        recover_transactions(root, tables=[t1, t2])
        assert _state(spark, t1)["1"] == 999
        assert _state(spark, t2)["2"] == 888
        for t, e in zip((t1, t2), txn._entries):
            assert mor.mor_history(t)["seq"] == e["seq"]


    def test_interloper_seq_collision_renumbered(self, spark, tmp_path):
        """Crash after the commit point; an unrelated writer then takes
        the staged sequence number. Recovery must NOT drop the journaled
        delta: it renumbers it to the next free sequence — the
        transaction serializes after the interloper."""
        (t1,) = _seed(spark, tmp_path, names=("t1",))
        root = str(tmp_path / "txn")
        txn = MultiTableTxn(root)
        txn.merge(spark, _df(spark, [(1, 999)]), t1, ["K"])
        staged_seq = txn._entries[0]["seq"]
        jp = txn_mod._journal_path(root, txn.txn_id)
        with open(jp, "w") as fh:
            json.dump({"txn_id": txn.txn_id, "entries": txn._entries}, fh)
        txn._locks.close()  # crash; locks die with the process
        # interloper merge commits — it can't see the staged dir, so it
        # takes the same sequence number
        mor.merge_upsert_mor(
            spark, _df(spark, [(1, 555)]), t1, ["K"], compact_every=None
        )
        assert mor.mor_history(t1)["seq"] == staged_seq
        r = recover_transactions(root, tables=[t1])
        assert r["rolled_forward"] == 1
        # the transaction's write wins (serialized after the interloper)
        assert _state(spark, t1)["1"] == 999
        assert mor.mor_history(t1)["seq"] == staged_seq + 1

    def test_live_journaled_txn_deferred_not_swept(self, spark, tmp_path):
        """A journal whose tables are still locked by a live process is
        DEFERRED (not rolled forward under a racing writer), and its
        staged dirs are protected from the torn-prepare sweep."""
        (t1,) = _seed(spark, tmp_path, names=("t1",))
        root = str(tmp_path / "txn")
        txn = MultiTableTxn(root)
        txn.merge(spark, _df(spark, [(1, 999)]), t1, ["K"])
        jp = txn_mod._journal_path(root, txn.txn_id)
        with open(jp, "w") as fh:
            json.dump({"txn_id": txn.txn_id, "entries": txn._entries}, fh)
        r = recover_transactions(root, tables=[t1])  # lock still held
        assert r["rolled_forward"] == 0 and r["deferred"] == 1
        assert r["swept_staged"] == 0
        assert os.path.isdir(txn._entries[0]["staged"])
        txn._locks.close()  # now the owner is gone
        r = recover_transactions(root, tables=[t1])
        assert r["rolled_forward"] == 1
        assert _state(spark, t1)["1"] == 999


class TestEnterRecovery:
    def test_entering_a_context_rolls_forward_crashed_commits(
        self, spark, tmp_path
    ):
        """A transaction that reached its commit point and died must be
        published BEFORE a new transaction on the same root classifies
        anything — otherwise the newcomer is blind to committed rows and
        collides with their staged sequence numbers."""
        (t1,) = _seed(spark, tmp_path, names=("t1",))
        root = str(tmp_path / "txn")
        dead = MultiTableTxn(root)
        dead.merge(spark, _df(spark, [(1, 999)]), t1, ["K"])
        jp = txn_mod._journal_path(root, dead.txn_id)
        with open(jp, "w") as fh:
            json.dump({"txn_id": dead.txn_id, "entries": dead._entries}, fh)
        dead._locks.close()  # crash right after the commit point
        with MultiTableTxn(root) as txn2:
            # __enter__ already converged the root: the dead commit is
            # visible before txn2 stages anything
            assert _state(spark, t1)["1"] == 999
            assert not os.path.exists(jp)
            txn2.merge(spark, _df(spark, [(1, 1000)]), t1, ["K"])
            txn2.commit()
        assert _state(spark, t1)["1"] == 1000


class TestDigestDeferral:
    def test_sidecar_saved_after_publish_and_valid(self, spark, tmp_path):
        """A transactional merge must not bind a sidecar fingerprint to
        the pre-rename listing: the save happens at commit, after the
        renames, and the sidecar validates against the final table."""
        (t1,) = _seed(spark, tmp_path, names=("t1",))
        maintenance.seed_digest(spark, t1)
        assert digest_store.load(t1) is not None
        with MultiTableTxn(str(tmp_path / "txn")) as txn:
            txn.merge(spark, _df(spark, [(1, 999), (400, 4)]), t1, ["K"])
            # not saved yet — and the PRE-txn sidecar reads STALE while
            # the staged dir exists (the fingerprint deliberately
            # includes hidden/staging files: over-invalidation is safe,
            # a missed invalidation is not)
            assert digest_store.load(t1) is None
            txn.commit()
        dig = digest_store.load(t1)
        assert dig is not None, (
            "the deferred sidecar must validate against the final listing"
        )
        # and the next merge's digest prune still proves a no-change
        r = mor.merge_upsert_mor(
            spark, _df(spark, [(1, 999)]), t1, ["K"], compact_every=None
        )
        assert r["insert"] == r["update"] == 0

    def test_empty_commit_still_flushes_scan_built_digests(
        self, spark, tmp_path
    ):
        """An all-noop atomic sync rebuilt its digests from a scan (no
        sidecar existed); the zero-entry commit must persist them — the
        listings are unchanged, and dropping them re-pays the scan on
        every future merge."""
        (t1,) = _seed(spark, tmp_path, names=("t1",))
        assert digest_store.load(t1) is None  # no sidecar yet
        with MultiTableTxn(str(tmp_path / "txn")) as txn:
            r = txn.merge(spark, _df(spark, [(1, 10)]), t1, ["K"])
            assert r["insert"] == r["update"] == 0  # noop
            assert txn.commit()["tables"] == 0
        assert digest_store.load(t1) is not None


class TestAtomicSync:
    def test_ep2_registry_as_one_commit(self, spark, tmp_path):
        """incremental_sync(atomic=True): the whole registry lands as one
        transaction, and the run still records a pinnable generation."""
        from presencia_etl_spark.plans.generations import load_manifest
        from presencia_etl_spark.plans.incremental_sync import (
            incremental_sync,
        )
        from presencia_etl_spark.sources.registry import TableConfig

        wh = str(tmp_path / "wh")
        tables = {
            n: spark.createDataFrame(
                [(str(j), f"{n}_{j}") for j in range(30)], ["K", "V"]
            )
            for n in ("ta", "tb")
        }
        configs = {
            n: TableConfig(n, key_cols=["K"], merge_mode="mor", num_buckets=4)
            for n in tables
        }
        # seed (initial loads are transaction-refused by design)
        incremental_sync(spark, tables, configs, wh, max_parallel=1)
        mutated = {
            "ta": spark.createDataFrame(
                [("1", "ta_CHANGED"), ("99", "ta_new")], ["K", "V"]
            ),
            "tb": spark.createDataFrame([("2", "tb_CHANGED")], ["K", "V"]),
        }
        r = incremental_sync(spark, mutated, configs, wh, atomic=True)
        assert r["ta"]["mode"] == "incremental_mor_txn"
        assert r["ta"]["insert"] == 1 and r["ta"]["update"] == 1
        assert r["tb"]["update"] == 1
        def vstate(path):
            return {
                r["K"]: r["V"] for r in mor.read_mor(spark, path).collect()
            }

        assert vstate(f"{wh}/ta")["1"] == "ta_CHANGED"
        assert vstate(f"{wh}/tb")["2"] == "tb_CHANGED"
        gens = load_manifest(wh)["generations"]
        assert gens, "the atomic run must record a generation"
        # idempotent replay through a second transaction: all skips
        r2 = incremental_sync(spark, mutated, configs, wh, atomic=True)
        assert all(
            v["insert"] == v["update"] == 0 for v in r2.values()
        )

    def test_atomic_refuses_cow_registry(self, spark, tmp_path):
        from presencia_etl_spark.plans.incremental_sync import (
            incremental_sync,
        )
        from presencia_etl_spark.sources.registry import TableConfig

        tables = {
            "tc": spark.createDataFrame([("1", "x")], ["K", "V"]),
        }
        configs = {"tc": TableConfig("tc", key_cols=["K"])}  # cow default
        with pytest.raises(ValueError, match="atomic sync requires"):
            incremental_sync(
                spark, tables, configs, str(tmp_path / "wh"), atomic=True
            )


class TestCliAtomic:
    def test_cli_incremental_atomic(self, spark, tmp_path, capsys):
        """`incremental --mor --atomic` from the CLI: seed run, then an
        atomic run whose tables all report the transactional mode."""
        from presencia_etl_spark.__main__ import main

        src = tmp_path / "src"
        src.mkdir()
        wh = str(tmp_path / "wh")
        spark.createDataFrame(
            [(str(i), f"v{i}") for i in range(20)], ["K", "V"]
        ).write.mode("overwrite").parquet(str(src / "ta.parquet"))
        base_args = [
            "incremental", "--source", str(src), "--target", wh,
            "--key", "K", "--mor", "--buckets", "4",
        ]
        assert main(base_args) == 0  # seed (initial load)
        capsys.readouterr()
        spark.createDataFrame(
            [("1", "CHANGED"), ("99", "new")], ["K", "V"]
        ).write.mode("overwrite").parquet(str(src / "ta.parquet"))
        assert main([*base_args, "--atomic"]) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        r = out["result"]["ta"]
        assert r["mode"] == "incremental_mor_txn"
        assert r["insert"] == 1 and r["update"] == 1
        vals = {
            row["K"]: row["V"]
            for row in mor.read_mor(spark, f"{wh}/ta").collect()
        }
        assert vals["1"] == "CHANGED" and vals["99"] == "new"


class TestEquivalence:
    def test_randomized_txn_equals_plain(self, spark, tmp_path):
        """The same random merge/delete batches applied through
        transactions and through plain merges produce identical
        tables."""
        rng = random.Random(515)
        ta1, ta2 = _seed(spark, tmp_path / "a", n=30)
        tb1, tb2 = _seed(spark, tmp_path / "b", n=30)
        root = str(tmp_path / "txn")
        for _step in range(3):
            batch1 = [(rng.randrange(60), rng.randrange(1000)) for _ in range(8)]
            batch2 = [(rng.randrange(60), rng.randrange(1000)) for _ in range(8)]
            dels = [(rng.randrange(60), 0) for _ in range(3)]
            with MultiTableTxn(root) as txn:
                txn.merge(spark, _df(spark, batch1), ta1, ["K"])
                txn.merge(
                    spark, _df(spark, batch2), ta2, ["K"],
                    delete_keys=_df(spark, dels).select("K"),
                )
                txn.commit()
            mor.merge_upsert_mor(
                spark, _df(spark, batch1), tb1, ["K"], compact_every=None
            )
            mor.merge_upsert_mor(
                spark, _df(spark, batch2), tb2, ["K"], compact_every=None,
                delete_keys=_df(spark, dels).select("K"),
            )
            assert _state(spark, ta1) == _state(spark, tb1)
            assert _state(spark, ta2) == _state(spark, tb2)
            assert (
                mor.mor_history(ta1)["seq"] == mor.mor_history(tb1)["seq"]
            )
