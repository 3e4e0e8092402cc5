"""Operational maintenance: inspect a managed state, then run the policy
a nightly cron "optimize" pass would.

The reference leaves table upkeep to hand-run scripts (indexes rebuilt
manually after bulk loads, `context/context.md:1396-1400`; cleanup is a
separate `clean_all_tables.py`). At 100 TB upkeep must be a POLICY: the
operator points one command at a state dir and the engine decides — from
filesystem metadata alone — whether anything needs doing, then does only
that. Two maintenance axes exist for our states:

- **Delta-log depth** (MOR): every outstanding delta dir is a file-open
  and a union branch on every read; `compact_mor` folds them. The policy
  compacts when the live delta count reaches a threshold, honoring
  change-feed consumer checkpoints (`consumer_checkpoints`) so no
  consumer's unprocessed history is folded away.
- **Digest sidecar** (any keyed layout): a table whose sidecar is absent
  or stale pays one full narrow scan on its next merge to re-enter the
  merkle steady state. Seeding it explicitly (one narrow aggregation
  under the writer lock) moves that cost OFF the sync path — after a
  bulk load, the very first incremental sync already runs sidecar-fast.

`inspect_state` is pure fs metadata (no SparkSession, callable from a
dry-run CLI); `maintain` creates a session lazily and only if an action
actually fires — the "nothing to do" pass never starts a JVM, the same
discipline as the sync-replica / replicate steady states.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from presencia_etl_spark.operators import cdc
from presencia_etl_spark.sinks import digest_store
from presencia_etl_spark.sinks.lifecycle import table_layout
from presencia_etl_spark.sinks.locking import state_lock


def sidecar_status(path: str) -> str:
    """'valid' | 'stale' | 'absent' | 'disabled' — driver-side only."""
    if not digest_store.enabled():
        return "disabled"
    if not os.path.exists(os.path.join(path, digest_store.SIDE_FILE)):
        return "absent"
    return "valid" if digest_store.load(path) is not None else "stale"


def inspect_state(path: str) -> dict:
    """What is this state and what would maintenance do — from fs
    metadata alone (no Spark job, no session)."""
    from presencia_etl_spark.sinks.mor import delta_bytes_in_range, mor_history

    layout = table_layout(path)
    out: dict = {"path": path, "layout": layout, "sidecar": sidecar_status(path)}
    if layout == "mor":
        hist = mor_history(path)
        out.update(
            {
                "seq": hist["seq"],
                "compacted_through": hist["compacted_through"],
                "live_deltas": len(hist["live_delta_seqs"]),
                "delta_bytes": delta_bytes_in_range(
                    path, hist["compacted_through"], hist["seq"]
                ),
                "num_buckets": hist["num_buckets"],
            }
        )
    return out


def seed_digest(spark: SparkSession, path: str) -> dict:
    """Compute and persist the digest sidecar from ONE narrow scan of the
    live view, under the state's writer lock (a writer landing between
    the scan and the save would otherwise fingerprint-validate a digest
    describing the pre-write rows). No-op when a valid sidecar already
    exists or the store is disabled."""
    status = sidecar_status(path)
    if status == "disabled":
        return {"seeded": False, "sidecar": status}
    with state_lock(path):
        if digest_store.load(path) is not None:
            return {"seeded": False, "sidecar": "valid"}
        from presencia_etl_spark.sql import read_state

        dig = cdc.state_digest(read_state(spark, path))
        digest_store.save(path, dig)
        seeded = digest_store.load(path) is not None  # save never raises
        return {
            "seeded": seeded,
            "sidecar": "valid" if seeded else status,
            "micro_buckets": len(dig),
            "rows": sum(c for c, _x, _y in dig.values()),
        }


def maintain(
    spark: SparkSession | None,
    path: str,
    compact_threshold: int = 16,
    keep_last: int = 0,
    consumer_checkpoints: list[str] | None = None,
    seed: bool = True,
    dry_run: bool = False,
) -> dict:
    """Inspect, decide, act. Returns the inspection report plus the
    actions taken (or, under ``dry_run``, the actions that WOULD fire).
    ``spark`` may be None — a session is created lazily only when an
    action actually needs one."""
    report = inspect_state(path)
    actions: list[dict] = []
    want_compact = (
        report["layout"] == "mor"
        and report.get("live_deltas", 0) >= compact_threshold
    )
    want_seed = seed and report["sidecar"] in ("absent", "stale")
    report["would"] = (["compact"] if want_compact else []) + (
        ["seed_digest"] if want_seed else []
    )
    if dry_run or not (want_compact or want_seed):
        return {**report, "actions": actions, "dry_run": dry_run}

    if spark is None:
        from presencia_etl_spark.session import get_spark

        spark = get_spark(app_name="maintain")
        spark.sparkContext.setLogLevel("ERROR")
    if want_compact:
        from presencia_etl_spark.sinks.mor import compact_mor

        r = compact_mor(
            spark,
            path,
            keep_last=keep_last,
            consumer_checkpoints=consumer_checkpoints,
        )
        actions.append({"action": "compact", **r})
        # compaction carries a valid sidecar forward; re-check before
        # paying a seed scan
        report["sidecar"] = sidecar_status(path)
        want_seed = seed and report["sidecar"] in ("absent", "stale")
    if want_seed:
        r = seed_digest(spark, path)
        actions.append({"action": "seed_digest", **r})
        report["sidecar"] = r["sidecar"]
    return {**report, "actions": actions, "dry_run": False}
