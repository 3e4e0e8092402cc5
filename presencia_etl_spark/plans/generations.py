"""Warehouse sync generations: cross-table consistent snapshots.

The reference syncs ~10 tables per cron run into MySQL with no notion of
a run-level snapshot — a consumer querying mid-sync sees table A after
the run and table B before it. At 100 TB with concurrent consumers that
tear matters. This module records, after each sync run, a GENERATION: a
manifest entry pinning every merge-on-read table at the delta sequence
the run left it at. Reading "generation N" then reconstructs EVERY MOR
table at its recorded sequence (``read_mor(as_of_seq=...)``) — a
warehouse-wide consistent snapshot, the read-side analog of a
multi-table transaction, on plain parquet.

Scope honesty: only MOR tables time-travel (their delta log retains
history back to the compaction floor). COW tables (flat or bucketed)
mutate in place, so a generation read resolves them to their CURRENT
state; ``non_snapshot_tables(root, gen)`` reports exactly which dirs
fall outside the guarantee (COW tables, plus MOR tables created AFTER
the pinned generation — those are EXCLUDED from the view set entirely:
they did not exist in that snapshot). An all-MOR warehouse gets the
full guarantee. Retention follows the MOR rules: a generation older
than a table's compaction floor raises on read (fold less often /
``keep_last`` to retain more history).

The manifest is driver-side JSON (tmp + atomic rename, the sidecar
discipline of ``_mor_meta.json``); no Spark job reads or writes it.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import SparkSession

from presencia_etl_spark.sinks import mor as mor_mod
from presencia_etl_spark.sinks.writers import BUCKET_COL
from presencia_etl_spark.sinks.writers import is_reserved_sibling as _is_sibling
from presencia_etl_spark.sinks.locking import state_lock

MANIFEST = "_warehouse_manifest.json"


def _manifest_path(root: str) -> str:
    return os.path.join(root, MANIFEST)


def load_manifest(root: str) -> dict:
    p = _manifest_path(root)
    if not os.path.exists(p):
        return {"generations": []}
    with open(p) as fh:
        return json.load(fh)


def record_generation(spark: SparkSession, root: str) -> dict:
    """Append a generation pinning every state dir under ``root`` at its
    current position. Call after a sync run completes (the sync plans and
    CLI do). Returns the new entry.

    The load → append → atomic-replace runs under the same single-writer
    lock discipline as the state sinks, keyed on the manifest itself —
    two sync runs finishing together serialize here instead of silently
    losing a generation entry or duplicating a gen number."""
    with state_lock(os.path.join(root, "_warehouse_manifest")):
        return _record_generation_locked(spark, root)


def _record_generation_locked(spark: SparkSession, root: str) -> dict:
    manifest = load_manifest(root)
    gens = manifest["generations"]
    entry: dict = {
        "gen": (gens[-1]["gen"] + 1) if gens else 1,
        "ts": int(time.time()),
        "tables": {},
    }
    for d in sorted(os.listdir(root)):
        path = os.path.join(root, d)
        # Reserved siblings: a crashed journaled swap's staged/retired
        # dir holds real parquet but is not a table.
        if not os.path.isdir(path) or d.startswith((".", "_")) or _is_sibling(d):
            continue
        # Metadata-only kind probe — NO parquet footer reads: only MOR
        # states carry a pinnable sequence, so the bucketed/flat
        # distinction (which would cost a schema read per table per sync)
        # is irrelevant here; both record as non-snapshot 'cow'.
        if os.path.exists(os.path.join(path, mor_mod.META_FILE)):
            entry["tables"][d] = {
                "kind": "mor",
                "seq": mor_mod.mor_history(path)["seq"],
            }
        elif any(
            c.endswith(".parquet") or c.startswith(f"{BUCKET_COL}=")
            for c in os.listdir(path)
        ):
            entry["tables"][d] = {"kind": "cow"}
    gens.append(entry)
    with open(_manifest_path(root) + ".tmp", "w") as fh:
        json.dump(manifest, fh)
    os.replace(_manifest_path(root) + ".tmp", _manifest_path(root))
    return entry


def generation_entry(root: str, gen: int | None = None) -> dict:
    """The manifest entry for generation ``gen`` (default: latest)."""
    gens = load_manifest(root)["generations"]
    if not gens:
        raise ValueError(f"no generations recorded under {root!r}")
    if gen is None:
        return gens[-1]
    for e in gens:
        if e["gen"] == gen:
            return e
    raise ValueError(
        f"generation {gen} not found under {root!r} "
        f"(have {[e['gen'] for e in gens]})"
    )


def non_snapshot_tables(root: str, gen: int | None = None) -> list[str]:
    """The state dirs a ``generation=gen`` read can NOT pin: COW tables
    (they mutate in place and resolve to their current state) plus MOR
    tables that exist on disk but are absent from the pinned entry (they
    were created after run ``gen``; the SQL surface excludes their views
    from a pinned registration — at generation N they did not exist).
    Metadata-only: one listing plus the manifest, no Spark job."""
    entry = generation_entry(root, gen)
    pinned = {d for d, t in entry["tables"].items() if t["kind"] == "mor"}
    out = []
    for d in sorted(os.listdir(root)):
        path = os.path.join(root, d)
        # Reserved siblings: a crashed journaled swap's staged/retired
        # dir holds real parquet but is not a table.
        if not os.path.isdir(path) or d.startswith((".", "_")) or _is_sibling(d):
            continue
        if os.path.exists(os.path.join(path, mor_mod.META_FILE)):
            if d not in pinned:
                out.append(d)
        elif any(
            c.endswith(".parquet") or c.startswith(f"{BUCKET_COL}=")
            for c in os.listdir(path)
        ):
            out.append(d)
    return out


def prune_generations(root: str) -> dict:
    """Drop manifest entries no longer readable: a generation is DEAD once
    any of its pinned MOR sequences fell below that table's compaction
    floor (``read_mor(as_of_seq=...)`` would raise on it). Without
    pruning the manifest grows one entry per sync run forever and every
    ``generation_entry(-1)`` scan is linear in dead weight. The newest
    generation is always kept (it is by construction at-or-above every
    floor the moment it is recorded; keeping it also preserves the gen
    counter). Runs under the manifest writer lock, same as
    ``record_generation``. Returns {'pruned': n, 'kept': m}."""
    with state_lock(os.path.join(root, "_warehouse_manifest")):
        manifest = load_manifest(root)
        gens = manifest["generations"]
        if not gens:
            return {"pruned": 0, "kept": 0}
        floors: dict[str, int] = {}
        for e in gens:
            for d, t in e["tables"].items():
                if t["kind"] == "mor" and d not in floors:
                    p = os.path.join(root, d)
                    if os.path.exists(os.path.join(p, mor_mod.META_FILE)):
                        floors[d] = mor_mod.mor_history(p)["compacted_through"]
        def readable(e: dict) -> bool:
            # A pinned MOR table whose state dir (or its meta sidecar)
            # vanished — dropped, or externally deleted — has no floor
            # entry; a generation read of it fails at view registration,
            # so the entry is dead weight, not readable history.
            return all(
                d in floors and t["seq"] >= floors[d]
                for d, t in e["tables"].items()
                if t["kind"] == "mor"
            )
        kept = [e for e in gens[:-1] if readable(e)] + [gens[-1]]
        pruned = len(gens) - len(kept)
        if pruned:
            manifest["generations"] = kept
            with open(_manifest_path(root) + ".tmp", "w") as fh:
                json.dump(manifest, fh)
            os.replace(_manifest_path(root) + ".tmp", _manifest_path(root))
        return {"pruned": pruned, "kept": len(kept)}
