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
state and reports them in ``non_snapshot_tables`` — an all-MOR warehouse
gets the full guarantee. Retention follows the MOR rules: a generation
older than a table's compaction floor raises on read (fold less often /
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
    CLI do). Returns the new entry."""
    manifest = load_manifest(root)
    gens = manifest["generations"]
    entry: dict = {
        "gen": (gens[-1]["gen"] + 1) if gens else 1,
        "ts": int(time.time()),
        "tables": {},
    }
    for d in sorted(os.listdir(root)):
        path = os.path.join(root, d)
        if not os.path.isdir(path) or d.startswith((".", "_")):
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
            c.endswith(".parquet") or c.startswith("_kb=")
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
