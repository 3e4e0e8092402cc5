"""Object-store conformance of the driver-plane commit protocols.

docs/SCALE.md maps the local-FS primitives to object-store ones:
``os.replace``/single-file ``os.rename`` ↔ atomic object PUT;
staging-dir publish ↔ PUT at the final key (visible exactly when the
one object lands); ``O_EXCL`` lock create ↔ conditional PUT
(If-None-Match:* / if-generation-match:0). This suite turns that prose
into executable checks, per the r11 verdict:

1. PRIMITIVE FOOTPRINT — run the pure-Python protocols (driver trickle
   merge, digest sidecar save, sessionless replication catch-up, writer
   lock) under a recording shim and assert every filesystem mutation
   they perform is one an object store offers:
   - file renames/replaces: single-object atomic PUT(+DELETE) — fine;
   - directory renames: allowed ONLY when the directory holds exactly
     one object (the publish is then one atomic PUT at the final key —
     no multi-object atomic commit exists on S3/GCS and none may be
     required);
   - exclusive creates: create-if-absent (conditional PUT);
   - no appends, no flock, no fsync-ordering assumptions.
2. CRASH AT THE COPY/DELETE SEAM — an object-store "move" is
   PUT-then-DELETE; a crash between them leaves both keys. Inject
   exactly that and assert the state reads consistently and the next
   writer converges (orphan staging is GC'd, the batch re-classifies
   as skips).
3. LOCK OVER PUT-IF-ABSENT — the lock protocol may only use
   put-if-absent / get / delete; contention and stale-break scenarios
   must behave identically through the shim.

The Spark-side writers are out of scope here by design: on a real
cluster those go through Hadoop committers / a table format, which own
their object-store commit story (documented in SCALE.md).
"""

from __future__ import annotations

import json
import os
import shutil

import pytest

from presencia_etl_spark.functions import driver_parity as dp
from presencia_etl_spark.operators import cdc
from presencia_etl_spark.sinks import digest_store, driver_mor as dm, mor
from presencia_etl_spark.sinks.locking import StateLockedError, state_lock


class SimulatedCrash(Exception):
    pass


class ObjectStoreShim:
    """Records (and constrains) the python-side FS mutations to the
    object-store primitive set. Install with ``monkeypatch`` — Spark is
    never started by these tests, so every mutation of interest flows
    through these four calls."""

    def __init__(self, monkeypatch, crash_before_delete: bool = False):
        self.ops: list[tuple] = []
        self.violations: list[str] = []
        self.crash_before_delete = crash_before_delete
        self._real_rename = os.rename
        self._real_replace = os.replace
        self._real_open = os.open
        monkeypatch.setattr(os, "rename", self._rename)
        monkeypatch.setattr(os, "replace", self._replace)
        monkeypatch.setattr(os, "open", self._open)

    # --- primitives -----------------------------------------------------
    def _rename(self, src, dst, **kw):
        if os.path.isdir(src):
            files = [
                os.path.join(r, f)
                for r, _d, fs in os.walk(src)
                for f in fs
            ]
            if len(files) > 1:
                self.violations.append(
                    f"multi-object atomic dir publish required: {src} -> "
                    f"{dst} ({len(files)} objects)"
                )
            # object-store move: PUT each object at its final key
            # (atomic per object), then DELETE the source keys
            for fp in files:
                rel = os.path.relpath(fp, src)
                tgt = os.path.join(dst, rel)
                os.makedirs(os.path.dirname(tgt), exist_ok=True)
                shutil.copy2(fp, tgt)
                self.ops.append(("put", tgt))
            if not files:
                os.makedirs(dst, exist_ok=True)
            if self.crash_before_delete:
                raise SimulatedCrash(f"crash between PUT and DELETE: {src}")
            shutil.rmtree(src)
            self.ops.append(("delete_prefix", src))
            return
        self.ops.append(("put", dst))
        self._real_rename(src, dst, **kw)

    def _replace(self, src, dst, **kw):
        self.ops.append(("put", dst))
        self._real_replace(src, dst, **kw)

    def _open(self, path, flags, *a, **kw):
        if flags & os.O_CREAT and flags & os.O_EXCL:
            # conditional PUT — create-if-absent, atomic on S3 (If-None-
            # Match:*) and GCS (if-generation-match:0)
            self.ops.append(("put_if_absent", path))
        elif flags & (os.O_WRONLY | os.O_RDWR) and flags & os.O_APPEND:
            self.violations.append(f"append open on {path}")
        return self._real_open(path, flags, *a, **kw)


def _seed_state(tmp_path, spark_less=True):
    """Build a tiny MOR state WITHOUT Spark: driver commit onto a
    pyarrow-written base (the sessionless replication target shape)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "state")
    nb = 4
    rows = []
    for k in range(8):
        key = dp.composite_key([k], ["int64"])
        h = dp.row_hash_value({"k": k, "v": f"v{k}"}, ["k", "v"],
                              {"k": "int64", "v": "string"})
        rows.append(
            {
                "k": k, "v": f"v{k}", "row_hash": h, cdc.KEY_COL: key,
                "id": k + 1, "created_at": None, "updated_at": None,
                "_kb": dp.pmod_bucket(key, nb),
            }
        )
    sch = pa.schema(
        [
            pa.field("k", pa.int64()), pa.field("v", pa.string()),
            pa.field("row_hash", pa.string()),
            pa.field(cdc.KEY_COL, pa.string()),
            pa.field("id", pa.int64()),
            pa.field("created_at", pa.timestamp("us")),
            pa.field("updated_at", pa.timestamp("us")),
        ]
    )
    for b in sorted({r["_kb"] for r in rows}):
        brows = sorted(
            (r for r in rows if r["_kb"] == b),
            key=lambda r: r[cdc.KEY_COL],
        )
        bdir = os.path.join(path, mor.BASE_DIR, f"_kb={b}")
        os.makedirs(bdir, exist_ok=True)
        tbl = pa.Table.from_pydict(
            {n: [r.get(n) for r in brows] for n in sch.names}, schema=sch
        )
        pq.write_table(tbl, os.path.join(bdir, "part-0.parquet"))
    with open(os.path.join(path, "_mor_meta.json"), "w") as fh:
        json.dump(
            {"seq": 0, "compacted_through": 0, "num_buckets": nb}, fh
        )
    return path


class TestPrimitiveFootprint:
    def test_trickle_merge_uses_only_objectstore_primitives(
        self, tmp_path, monkeypatch
    ):
        path = _seed_state(tmp_path)
        shim = ObjectStoreShim(monkeypatch)
        r = dm.trickle_merge(
            path,
            [{"k": 3, "v": "mut"}, {"k": 100, "v": "new"}],
            ["k"],
            delete_keys=[dp.composite_key([5], ["int64"])],
        )
        assert r["insert"] == 1 and r["update"] == 1 and r["delete"] == 1
        assert shim.violations == [], shim.violations
        # the publish was ONE object PUT at the final delta key — the
        # single-PUT visibility invariant that makes the S3 mapping real
        delta_puts = [
            p for op, p in shim.ops
            if op == "put" and f"{mor.SEQ_COL}=" in p and p.endswith(".parquet")
        ]
        assert len(delta_puts) == 1
        live = dm.read_live_rows_for_keys(
            path,
            [dp.composite_key([k], ["int64"]) for k in (3, 5, 100)],
        )
        assert live[dp.composite_key([3], ["int64"])]["v"] == "mut"
        assert dp.composite_key([5], ["int64"]) not in live
        assert live[dp.composite_key([100], ["int64"])]["v"] == "new"

    def test_digest_sidecar_single_put(self, tmp_path, monkeypatch):
        path = _seed_state(tmp_path)
        shim = ObjectStoreShim(monkeypatch)
        digest_store.save(path, {3: (1, 5, -7)})
        assert digest_store.load(path) == {3: (1, 5, -7)}
        assert shim.violations == []
        side_puts = [
            p for op, p in shim.ops
            if op == "put" and digest_store.SIDE_FILE in p
            and not p.endswith(".tmp")
        ]
        assert len(side_puts) == 1  # tmp-write + one atomic PUT publish

    def test_sessionless_replication_footprint(self, tmp_path, monkeypatch):
        from presencia_etl_spark.plans.replica_sync import (
            _write_replicate_cursor,
            replicate_changes,
        )

        src = _seed_state(tmp_path / "s")
        tgt = _seed_state(tmp_path / "t")
        _write_replicate_cursor(tgt, 0)
        # a source-side trickle produces the feed the replica pulls
        dm.trickle_merge(src, [{"k": 2, "v": "mut2"}], ["k"])
        shim = ObjectStoreShim(monkeypatch)
        r = replicate_changes(None, src, tgt, ["k"])
        assert r["mode"] == "feed" and r.get("driver")
        assert r["update"] == 1
        assert shim.violations == [], shim.violations


class TestCrashAtCopyDeleteSeam:
    def test_crash_between_put_and_delete_converges(
        self, tmp_path, monkeypatch
    ):
        """An object-store move is PUT then DELETE; crash between them.
        The delta IS visible (the PUT landed — commit point), the
        staging source remains as an orphan. The state must read the
        committed delta, and the next writer must GC the orphan and
        apply a re-sent batch as skips."""
        path = _seed_state(tmp_path)
        shim = ObjectStoreShim(monkeypatch, crash_before_delete=True)
        with pytest.raises(SimulatedCrash):
            dm.trickle_merge(path, [{"k": 3, "v": "crash"}], ["k"])
        shim.crash_before_delete = False
        # committed: the PUT at the final key happened before the crash
        live = dm.read_live_rows_for_keys(
            path, [dp.composite_key([3], ["int64"])]
        )
        assert live[dp.composite_key([3], ["int64"])]["v"] == "crash"
        orphans = [
            d for d in os.listdir(os.path.join(path, mor.DELTA_DIR))
            if d.startswith(mor.STAGING_PREFIX)
        ]
        assert orphans, "the crash must have left the staging orphan"
        # next writer: orphan GC'd, identical batch re-classifies SKIP
        r = dm.trickle_merge(path, [{"k": 3, "v": "crash"}], ["k"])
        assert r == {
            "insert": 0, "update": 0, "skip": 1, "delete": 0,
            "delta_files": 0, "compacted": False, "compaction_due": False,
            "driver": True,
        }
        orphans = [
            d for d in os.listdir(os.path.join(path, mor.DELTA_DIR))
            if d.startswith(mor.STAGING_PREFIX)
        ]
        assert not orphans

    def test_meta_write_is_atomic_put(self, tmp_path, monkeypatch):
        path = _seed_state(tmp_path)
        shim = ObjectStoreShim(monkeypatch)
        dm.trickle_merge(path, [{"k": 4, "v": "x"}], ["k"])
        meta_puts = [
            p for op, p in shim.ops
            if op == "put" and p.endswith("_mor_meta.json")
        ]
        assert meta_puts, "meta must publish via an atomic object PUT"


class TestLockOverPutIfAbsent:
    def test_lock_primitives_and_contention(self, tmp_path, monkeypatch):
        path = str(tmp_path / "locked_state")
        os.makedirs(path)
        shim = ObjectStoreShim(monkeypatch)
        with state_lock(path):
            assert ("put_if_absent", path + ".writer_lock") in shim.ops
            assert shim.violations == []
        # a live foreign owner refuses immediately
        lockf = path + ".writer_lock"
        with open(lockf, "w") as fh:
            json.dump(
                {"pid": os.getpid(), "host": "elsewhere", "ts": 1e18}, fh
            )
        with pytest.raises(StateLockedError):
            with state_lock(path):
                pass
        # a stale foreign owner is broken: DELETE + fresh put_if_absent
        with open(lockf, "w") as fh:
            json.dump({"pid": 1, "host": "elsewhere", "ts": 0}, fh)
        with state_lock(path):
            pass
        assert not os.path.exists(lockf)
        assert shim.violations == []


class TestCowSwapBoundary:
    def test_bucket_swap_has_a_park_window_documented_boundary(
        self, tmp_path, monkeypatch
    ):
        """The honest NEGATIVE finding: the COW bucket swap is a
        local-FS protocol. Each bucket dir holds one object (single-PUT
        fine), but the swap PARKS the live dir before landing the new
        one — on an object store that is DELETE-then-PUT, a window where
        a reader lists the bucket as missing. Local FS hides it (rename
        is atomic and the window is between two metadata ops); an
        object-store port therefore maps this path to a table-format /
        committer snapshot commit, NOT to raw key moves — exactly what
        SCALE.md documents. This test pins the primitive ORDER so the
        boundary stays explicit instead of prose."""
        from presencia_etl_spark.sinks.writers import (
            BUCKET_COL,
            swap_bucket_dirs,
        )

        target = str(tmp_path / "cow_state")
        staged = str(tmp_path / "staged")
        for root, tag in ((target, "old"), (staged, "new")):
            for b in (0, 1):
                d = os.path.join(root, f"{BUCKET_COL}={b}")
                os.makedirs(d)
                with open(os.path.join(d, "part-0.parquet"), "w") as fh:
                    fh.write(tag)
        shim = ObjectStoreShim(monkeypatch)
        swap_bucket_dirs(staged, target, [0, 1])
        assert shim.violations == []  # one object per bucket dir
        for b in (0, 1):
            f = os.path.join(target, f"{BUCKET_COL}={b}", "part-0.parquet")
            assert open(f).read() == "new"
        # the park-then-land order IS the delete-before-put window
        puts = [p for op, p in shim.ops if op == "put"]
        for b in (0, 1):
            parked_at = next(
                i for i, p in enumerate(puts) if f"_old_{b}" in p
            )
            landed_at = next(
                i for i, p in enumerate(puts)
                if p.endswith(f"{BUCKET_COL}={b}/part-0.parquet")
                and target in p
            )
            assert parked_at < landed_at, (
                "live bucket is parked (reader-visible gap on an object "
                "store) before the new version lands — table-format "
                "commit territory, as documented"
            )


class TestSessionlessDeclineReasons:
    """Reason tags for the state-shaped decline classes, pinned without
    a SparkSession (the _seed_state helper builds the MOR state with
    pyarrow) — completes the per-class telemetry coverage."""

    def test_journal_fileless_and_footerless(self, tmp_path):
        from presencia_etl_spark.sinks.writers import MERGE_JOURNAL

        path = _seed_state(tmp_path)
        # interrupted bucket swap journal
        jpath = os.path.join(path, mor.BASE_DIR, MERGE_JOURNAL)
        with open(jpath, "w") as fh:
            fh.write("{}")
        with pytest.raises(dm.DriverDecline) as ei:
            dm.trickle_merge(path, [{"k": 1, "v": "x"}], ["k"])
        assert ei.value.reason == "journal"
        os.remove(jpath)
        # fileless base (meta exists, no base parquet)
        for b in os.listdir(os.path.join(path, mor.BASE_DIR)):
            shutil.rmtree(os.path.join(path, mor.BASE_DIR, b))
        with pytest.raises(dm.DriverDecline) as ei:
            dm.trickle_merge(path, [{"k": 1, "v": "x"}], ["k"])
        assert ei.value.reason == "fileless_base"
        # no parquet footers anywhere → table_kinds declines
        with pytest.raises(dm.DriverDecline) as ei:
            dm.table_kinds(path)
        assert ei.value.reason == "no_footers"

    def test_batch_and_dup_reasons_without_spark(self, tmp_path):
        path = _seed_state(tmp_path)
        with pytest.raises(dm.DriverDecline) as ei:
            dm.trickle_merge(
                path,
                [{"k": 1, "v": "a"}, {"k": 1, "v": "b"}],
                ["k"],
            )
        assert ei.value.reason == "duplicate_keys"
        with pytest.raises(dm.DriverDecline) as ei:
            dm.trickle_merge(path, [{"k": 1}], ["k"])
        assert ei.value.reason == "schema_drift"


class TestOrderingDeclineReasons:
    """Reason tags for the JVM-ordering decline classes in the agg
    driver fold — pure unit calls, no Spark."""

    def test_nan_and_nonbmp_ordering(self):
        import math

        from presencia_etl_spark.plans import incremental_agg as ia

        with pytest.raises(dm.DriverDecline) as ei:
            ia._cmp_lt(math.nan, 1.0)
        assert ei.value.reason == "nan_order"
        with pytest.raises(dm.DriverDecline) as ei:
            ia._cmp_lt("a", "b\U0001F600")
        assert ei.value.reason == "nonbmp_order"
        assert ia._cmp_lt(1.0, 2.0) is True
        assert ia._cmp_lt("b", "a") is False


class TestTxnCommitBoundary:
    """sinks/txn on the object-store primitive map: the COMMIT POINT is
    one journal PUT; publish renames are per-object PUT+DELETE whose
    seam crash CONVERGES under recovery (the renumber branch lands the
    same rows at a second sequence — latest-wins reads are unchanged).
    Spark-side staged writes stay out of scope (table-format commit);
    these legs drive the pure-python protocol over driver-plane deltas."""

    def _stage(self, tmp_path, name, txn_id):
        """A real staged single-object delta: publish one trickle merge,
        then un-publish it into the txn staging name + rewound cursor."""
        path = _seed_state(tmp_path / name)
        dm.trickle_merge(
            path, [{"k": 3, "v": f"mut-{name}"}], ["k"], compact_every=None
        )
        droot = os.path.join(path, mor.DELTA_DIR)
        final = os.path.join(droot, f"{mor.SEQ_COL}=1")
        staged = os.path.join(droot, f".txn_{txn_id}_1")
        os.rename(final, staged)
        with open(os.path.join(path, "_mor_meta.json"), "w") as fh:
            json.dump(
                {"seq": 0, "compacted_through": 0, "num_buckets": 4}, fh
            )
        return path, {
            "table": path, "seq": 1, "staged": staged, "final": final,
        }

    def test_commit_point_is_one_journal_put(self, tmp_path, monkeypatch):
        from presencia_etl_spark.sinks.txn import MultiTableTxn

        t1, e1 = self._stage(tmp_path, "a", "tx1")
        t2, e2 = self._stage(tmp_path, "b", "tx1")
        txn = MultiTableTxn(str(tmp_path / "root"), txn_id="tx1")
        txn._entries = [e1, e2]
        shim = ObjectStoreShim(monkeypatch)
        r = txn.commit()
        assert r["tables"] == 2
        assert shim.violations == [], shim.violations
        journal_puts = [
            p for op, p in shim.ops if op == "put" and "_txn_tx1.json" in p
        ]
        assert len(journal_puts) == 1  # THE commit point: one object PUT
        for t, name in ((t1, "a"), (t2, "b")):
            live = dm.read_live_rows_for_keys(
                t, [dp.composite_key([3], ["int64"])]
            )
            assert live[dp.composite_key([3], ["int64"])]["v"] == f"mut-{name}"

    def test_publish_seam_crash_converges(self, tmp_path, monkeypatch):
        from presencia_etl_spark.sinks.txn import (
            _journal_path,
            recover_transactions,
        )

        t1, e1 = self._stage(tmp_path, "c", "tx2")
        root = str(tmp_path / "root")
        os.makedirs(root, exist_ok=True)
        jp = _journal_path(root, "tx2")
        with open(jp, "w") as fh:
            json.dump({"txn_id": "tx2", "entries": [e1]}, fh)
        # crash between the final-key PUTs and the staged-key DELETEs
        shim = ObjectStoreShim(monkeypatch, crash_before_delete=True)
        with pytest.raises(SimulatedCrash):
            recover_transactions(root, tables=[t1])
        monkeypatch.undo()
        assert os.path.isdir(e1["staged"]) and os.path.isdir(e1["final"])
        # recovery converges: the leftover staged copy renumbers to the
        # next sequence — SAME rows, so the latest-wins read view is
        # unchanged — and the journal clears
        r = recover_transactions(root, tables=[t1])
        assert r["rolled_forward"] == 1
        assert not os.path.exists(jp)
        live = dm.read_live_rows_for_keys(
            t1, [dp.composite_key([3], ["int64"])]
        )
        assert live[dp.composite_key([3], ["int64"])]["v"] == "mut-c"
        seqs = sorted(
            int(d.split("=")[1])
            for d in os.listdir(os.path.join(t1, mor.DELTA_DIR))
            if d.startswith(f"{mor.SEQ_COL}=")
        )
        assert seqs == [1, 2]  # duplicate-content delta, not lost data
        # replay is a no-op
        r2 = recover_transactions(root, tables=[t1])
        assert r2 == {"rolled_forward": 0, "swept_staged": 0, "deferred": 0}
