"""Atomic multi-table commit for merge-on-read tables.

The reference syncs its 10 tables one after another
(sync_ALL.py:339-356, sync_INCREMENTAL.py:509-533): a crash mid-run
leaves the warehouse with some tables at the new sync and some at the
old — the cross-table joins its reconcile queries validate
(context/context.md:795-831) then compare MISALIGNED snapshots until the
next run. At 100 TB a sync is long and crashes are routine; partial
multi-table visibility is the steady state unless commits are atomic.

This module makes a multi-table sync all-or-nothing by riding the MOR
sink's existing visibility seam — a delta becomes visible ONLY via the
atomic rename of its staged dir to ``_delta_seq=N`` (mor._commit_delta),
and live dirs are authoritative over the meta cursor (mor._next_seq):

1. PREPARE — each ``txn.merge(...)`` runs the full merge_upsert_mor
   computation (classify, digest prune, audit columns, tombstones) but
   lands its delta as ``deltas/.txn_<id>_<seq>`` — dot-prefixed, so
   invisible to Spark scans, ``_delta_seqs``, and the driver-plane
   walkers — and bumps NO cursor. The table's single-writer lock is
   taken at first touch and HELD until commit/abort, so no other writer
   can commit, compact, or GC under the transaction.
2. COMMIT POINT — one journal file ``<txn_root>/_txn_<id>.json`` listing
   every (table, staged dir, final dir, seq), written tmp-then-replace.
   Its existence IS the transaction: before it, nothing is visible and
   recovery rolls BACK; after it, recovery rolls FORWARD.
3. PUBLISH — the renames + per-table meta bumps, in sequence; then the
   deferred digest sidecars (fingerprints must bind to the FINAL
   listing); then the journal is removed.

Crash anywhere: ``recover_transactions(txn_root, tables)`` — run it
before trusting a warehouse after a restart (entering a transaction
context rolls this txn_root's journals forward; the ``tables=`` sweep
of torn prepares still needs the explicit list, as in the atomic
sync) — completes journaled publishes
idempotently (rename already done → skip; meta already bumped → skip)
and sweeps unjournaled ``.txn_*`` staged dirs of UNLOCKED tables
(a held lock means a live transaction is still preparing).

Reader semantics: publish is per-table-atomic but sequential, so an
unpinned reader racing the commit can see table A at the new sync and
table B at the old for the duration of two renames — exactly the window
``plans/generations`` closes: record a generation after commit and pin
cross-table reads to it (``sql.py generation=N``). Durability is
all-or-nothing regardless: after a crash the warehouse converges to
either every table's delta published or none.

What a transaction refuses (TxnUnsupported) — shapes with no staged
form: the INITIAL load of a table (the COW bucketed write has no
rename-one-dir commit point; seed tables first) and a schema-drift
merge (it rewrites base buckets COW-style). One delta per table per
transaction (TxnError otherwise): a second merge of the same table
would classify against the pre-transaction state, blind to the staged
rows.

Scale: prepare cost = the merges' normal cost; the commit point is one
small file write; publish is N renames + N meta writes — O(tables),
independent of data size. On an object store the rename maps to the
same copy-free namespace move the delta commit already relies on, and
the journal to a put-if-absent object (docs/SCALE.md, object-store
conformance suite).
"""

from __future__ import annotations

import contextlib
import json
import os
import shutil
import uuid

from presencia_etl_spark.sinks import digest_store
from presencia_etl_spark.sinks.locking import (
    StateLockedError,
    held_in_process,
    state_lock,
)

TXN_PREFIX = ".txn_"
JOURNAL_PREFIX = "_txn_"


class TxnError(RuntimeError):
    """Transaction misuse (double-merge of a table, reuse after
    commit/abort)."""


class TxnUnsupported(TxnError):
    """This merge shape has no staged form (initial load, schema
    drift) — run it outside the transaction."""


def _journal_path(txn_root: str, txn_id: str) -> str:
    return os.path.join(txn_root, f"{JOURNAL_PREFIX}{txn_id}.json")


class MultiTableTxn:
    """One all-or-nothing commit across several MOR tables.

    Usage::

        with MultiTableTxn(txn_root) as txn:
            txn.merge(spark, socios_df, socios_path, ["NUMSOCIO"])
            txn.merge(spark, liq_df, liq_path, ["CUPLIQUIDA"],
                      delete_keys=gone)
            txn.commit()
        # exiting without commit() aborts (rolls back the staged deltas)

    All calls must run on the thread that created the transaction (the
    writer-lock registry is thread-affine)."""

    def __init__(self, txn_root: str, txn_id: str | None = None):
        self.txn_root = txn_root
        self.txn_id = txn_id or uuid.uuid4().hex[:12]
        os.makedirs(txn_root, exist_ok=True)
        self._entries: list[dict] = []
        self._tables: set[str] = set()
        self._digests: dict[str, object] = {}
        self._locks = contextlib.ExitStack()
        self._done = False

    # -- context manager ---------------------------------------------------

    def __enter__(self):
        # Entering a transaction converges this txn_root first: any
        # CRASHED-BUT-COMMITTED transaction's journal rolls forward NOW,
        # so this transaction never classifies blind to rows whose
        # commit point was already reached (and never collides with
        # their staged sequence numbers). Sweeps need a table list and
        # run in recover_transactions(tables=...) / the atomic sync.
        recover_transactions(self.txn_root)
        return self

    def __exit__(self, exc_type, _exc, _tb):
        if not self._done:
            self.abort()
        return False

    # -- the public surface ------------------------------------------------

    def merge(self, spark, src, target_path, key_cols, **kwargs) -> dict:
        """``merge_upsert_mor`` whose delta lands INSIDE this
        transaction — visible only at ``commit()``. Accepts the merge's
        kwargs except ``compact_every`` (compaction has no staged form;
        compact outside the transaction)."""
        from presencia_etl_spark.sinks.mor import merge_upsert_mor

        self._check_open()
        if kwargs.pop("compact_every", None) is not None:
            raise TxnUnsupported(
                "auto-compaction inside a transaction is not supported — "
                "compact outside it"
            )
        norm = os.path.abspath(target_path)
        if norm in self._tables:
            raise TxnError(
                f"{target_path!r} already has a staged delta in this "
                "transaction — a second merge would classify against the "
                "pre-transaction state, blind to the staged rows"
            )
        self._acquire(norm)
        self._tables.add(norm)
        return merge_upsert_mor(
            spark, src, target_path, key_cols, compact_every=None,
            txn=self, **kwargs,
        )

    def commit(self) -> dict:
        """Publish every staged delta atomically: journal (THE commit
        point) → renames + meta bumps → deferred digest sidecars →
        journal removal → locks released."""
        self._check_open()
        self._done = True
        try:
            if not self._entries:
                # nothing staged, nothing to journal — but noop merges
                # may have rebuilt digests from a scan (deferred because
                # deferral is uniform); their listings are unchanged, so
                # persisting them now is safe and saves the next sync
                # the same scan
                for path, dig in self._digests.items():
                    digest_store.save(path, dig)
                return {"tables": 0, "txn_id": self.txn_id}
            journal = _journal_path(self.txn_root, self.txn_id)
            with open(journal + ".tmp", "w") as fh:
                json.dump({"txn_id": self.txn_id, "entries": self._entries}, fh)
            os.replace(journal + ".tmp", journal)  # <-- the commit point
            _publish(self._entries)
            for path, dig in self._digests.items():
                digest_store.save(path, dig)
            os.remove(journal)
            return {"tables": len(self._entries), "txn_id": self.txn_id}
        finally:
            self._locks.close()

    def abort(self) -> None:
        """Discard every staged delta; the warehouse is untouched."""
        self._done = True
        try:
            for e in self._entries:
                shutil.rmtree(e["staged"], ignore_errors=True)
            self._entries.clear()
        finally:
            self._locks.close()

    # -- hooks merge_upsert_mor calls --------------------------------------

    def _stage_delta(self, target_path, meta, out, n_rows) -> int:
        """The transactional twin of ``mor._commit_delta``: same staged
        parquet write, but the publishing rename is deferred to
        ``commit()`` and no cursor moves."""
        from presencia_etl_spark.sinks.mor import (
            DELTA_DIR,
            SEQ_COL,
            _next_seq,
            _write_delta_files,
        )

        norm = os.path.abspath(target_path)
        seq = _next_seq(target_path, meta)
        final = os.path.join(norm, DELTA_DIR, f"{SEQ_COL}={seq}")
        staged = os.path.join(
            norm, DELTA_DIR, f"{TXN_PREFIX}{self.txn_id}_{seq}"
        )
        n_files = _write_delta_files(out, staged, n_rows)
        self._entries.append(
            {"table": norm, "seq": seq, "staged": staged, "final": final}
        )
        return n_files

    def _defer_digest(self, target_path, dig) -> None:
        """Sidecar saves move to after publish — a fingerprint taken now
        would bind to the pre-rename listing and invalidate itself."""
        if dig is not None:
            self._digests[os.path.abspath(target_path)] = dig

    # -- internals ---------------------------------------------------------

    def _check_open(self) -> None:
        if self._done:
            raise TxnError(
                f"transaction {self.txn_id} is already committed/aborted"
            )

    def _acquire(self, norm_path: str) -> None:
        self._locks.enter_context(state_lock(norm_path))


def _publish(entries: list[dict]) -> None:
    """Roll the journaled publish forward, idempotently: a rename whose
    staged dir is gone and final dir present already happened; a meta
    cursor at or past the entry's seq is already bumped (and live dirs
    are authoritative anyway — ``mor._next_seq``). If an UNRELATED
    writer took the staged sequence number after a crash (journal
    written, recovery not yet run, interloper merges), the staged delta
    is RE-NUMBERED to the next free sequence instead of being dropped —
    equivalent to the transaction serializing after the interloper
    (latest-wins reads converge either way). Caller must hold every
    table's writer lock.

    The collision branch distinguishes "interloper took the seq" from
    "my own publish half-landed" by LOCAL rename atomicity (final
    existing ⇒ a complete committed delta). On an object store a dir
    move is PUT-then-DELETE, so a seam crash leaves BOTH complete —
    the renumber then lands the same rows at a second sequence, which
    latest-wins reads absorb (identical content), pinned by the
    conformance suite; a production object-store port routes delta
    publishes through a table-format commit anyway (the suite's
    documented scope for Spark-side writers)."""
    from presencia_etl_spark.sinks.mor import (
        SEQ_COL,
        _next_seq,
        _read_meta,
        _write_meta,
    )

    for e in entries:
        table = e["table"]
        if os.path.isdir(e["staged"]):
            if os.path.isdir(e["final"]):
                # seq collision with a post-crash writer: take the next
                # free number (live dirs are authoritative, so _next_seq
                # can't collide again under the held lock)
                meta = _read_meta(table)
                e["seq"] = _next_seq(table, meta)
                e["final"] = os.path.join(
                    os.path.dirname(e["final"]), f"{SEQ_COL}={e['seq']}"
                )
            os.rename(e["staged"], e["final"])
        meta = _read_meta(table)
        if meta.get("seq", 0) < e["seq"]:
            meta["seq"] = e["seq"]
            _write_meta(table, meta)


def recover_transactions(
    txn_root: str, tables: list[str] | None = None
) -> dict:
    """Converge the warehouse after a crash: every journaled transaction
    is rolled FORWARD (the commit point was reached — publish finishes,
    idempotently) and its journal removed; then, for each table in
    ``tables`` whose writer lock is free, unjournaled ``.txn_*`` staged
    dirs (torn prepares) are swept. A held lock means a transaction is
    live and preparing — its staging is left alone."""
    from presencia_etl_spark.sinks.mor import DELTA_DIR

    rolled, swept, deferred = 0, 0, 0
    if os.path.isdir(txn_root):
        for name in sorted(os.listdir(txn_root)):
            if not (name.startswith(JOURNAL_PREFIX) and name.endswith(".json")):
                continue
            jp = os.path.join(txn_root, name)
            try:
                with open(jp) as fh:
                    data = json.load(fh)
            except (OSError, json.JSONDecodeError):
                # a torn tmp never replaces the journal; an unreadable
                # journal here is a real anomaly — leave it for a human
                continue
            # publish under every table's lock — a post-crash interloper
            # merge mid-flight must not race the renames. A live holder
            # defers this journal to the next recovery (idempotent).
            try:
                with contextlib.ExitStack() as locks:
                    for e in data["entries"]:
                        if held_in_process(e["table"]):
                            raise StateLockedError(e["table"])
                        locks.enter_context(state_lock(e["table"]))
                    _publish(data["entries"])
            except StateLockedError:
                deferred += 1
                continue
            os.remove(jp)
            rolled += 1
    # staged dirs named by SURVIVING (deferred/unreadable) journals are
    # still owned by their transaction — only truly unjournaled staging
    # is a torn prepare
    journaled: set[str] = set()
    if os.path.isdir(txn_root):
        for name in os.listdir(txn_root):
            if not (name.startswith(JOURNAL_PREFIX) and name.endswith(".json")):
                continue
            with contextlib.suppress(OSError, json.JSONDecodeError):
                with open(os.path.join(txn_root, name)) as fh:
                    for e in json.load(fh)["entries"]:
                        journaled.add(os.path.abspath(e["staged"]))
    for t in tables or []:
        droot = os.path.join(t, DELTA_DIR)
        if not os.path.isdir(droot):
            continue
        stale = [
            os.path.join(droot, d)
            for d in os.listdir(droot)
            if d.startswith(TXN_PREFIX)
            and os.path.abspath(os.path.join(droot, d)) not in journaled
        ]
        if not stale:
            continue
        if held_in_process(t):
            # a live transaction in THIS process (possibly this very
            # thread — same-thread lock reentrancy would let us in)
            continue
        try:
            with state_lock(t):
                for d in stale:
                    shutil.rmtree(d, ignore_errors=True)
                    swept += 1
        except StateLockedError:
            pass  # live transaction preparing on this table
    return {
        "rolled_forward": rolled,
        "swept_staged": swept,
        "deferred": deferred,
    }
