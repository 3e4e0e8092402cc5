"""Data-lifecycle operations: kind-routed deletes and TTL retention.

The reference has no lifecycle story at all — its sync never deletes
(trap N6) and its MySQL warehouse grows monotonically. At 100 TB the
lifecycle is a first-class workload: TTL retention on event tables,
GDPR erasure by subject key, compliance-window trims. These helpers
route one predicate to whichever delete implementation matches the
state's layout, so callers (CLI, schedulers) don't care how a state was
written:

- merge-on-read  → O(matches) tombstone delta (``mor.delete_where_mor``)
- bucketed COW   → dirty-bucket rewrite (``writers.delete_where_partitioned``)
- flat parquet   → atomic staged rewrite (``writers.delete_where_parquet``)
"""

from __future__ import annotations

import os

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

from presencia_etl_spark.sinks import mor as mor_mod
from presencia_etl_spark.sinks.writers import (
    BUCKET_COL,
    delete_where_parquet,
    delete_where_partitioned,
)


def table_layout(path: str) -> str:
    """'mor' | 'bucketed' | 'flat' from FILESYSTEM metadata alone (no
    SparkSession, no schema read) — THE layout detector; ``state_kind``
    and the replica sync build on it so the notion of "what kind of
    state is this dir" cannot drift between callers."""
    if os.path.exists(os.path.join(path, mor_mod.META_FILE)):
        return "mor"
    if not os.path.isdir(path):
        if os.path.exists(path):
            return "flat"  # a bare parquet file — readable as a flat state
        raise ValueError(f"{path!r} is not a managed state dir")
    from presencia_etl_spark.sinks.writers import BUCKET_META

    if os.path.exists(os.path.join(path, BUCKET_META)) or any(
        d.startswith(f"{BUCKET_COL}=") for d in os.listdir(path)
    ):
        return "bucketed"
    return "flat"


def state_kind(spark: SparkSession, target_path: str) -> str:
    """'mor' | 'bucketed' | 'parquet' — ``table_layout`` plus one schema
    read as the bucketed fallback for hand-laid states that carry the
    ``_kb`` column without hive dirs or the bucket-meta sidecar (none
    are written by this engine; the fallback keeps the old contract)."""
    kind = table_layout(target_path)
    if kind == "flat" and BUCKET_COL in spark.read.parquet(target_path).columns:
        return "bucketed"
    return "parquet" if kind == "flat" else kind


def delete_rows(
    spark: SparkSession, target_path: str, predicate: Column | str
) -> dict:
    """DELETE rows where ``predicate`` is TRUE, routed by state kind.
    Returns the underlying writer's counts plus {'kind': ...}."""
    kind = state_kind(spark, target_path)
    fn = {
        "mor": mor_mod.delete_where_mor,
        "bucketed": delete_where_partitioned,
        "parquet": delete_where_parquet,
    }[kind]
    return {"kind": kind, **fn(spark, target_path, predicate)}


def apply_retention(
    spark: SparkSession,
    target_path: str,
    date_col: str,
    keep_days: int | None = None,
    cutoff: str | None = None,
) -> dict:
    """TTL retention: drop rows whose ``date_col`` is strictly BEFORE the
    cutoff. Exactly one of ``keep_days`` (cutoff = today − N days,
    evaluated engine-side so a scheduled run needs no driver clock
    plumbing) or ``cutoff`` (explicit 'YYYY-MM-DD', the reproducible
    form) must be given. NULL dates are retained (unknown age is not
    expired — and SQL DELETE's NULL-keeps-the-row semantics would do the
    same anyway). On a MOR state this is an O(expired) tombstone write;
    retention on a 100 TB event table costs the expired rows, not a
    table rewrite."""
    if (keep_days is None) == (cutoff is None):
        raise ValueError("give exactly one of keep_days or cutoff")
    bound = (
        F.date_sub(F.current_date(), keep_days)
        if cutoff is None
        else F.to_date(F.lit(cutoff))
    )
    pred = F.col(date_col) < bound
    out = delete_rows(spark, target_path, pred)
    return {**out, "date_col": date_col}
