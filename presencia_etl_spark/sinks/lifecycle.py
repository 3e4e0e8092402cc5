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


def state_kind(spark: SparkSession, target_path: str) -> str:
    """'mor' | 'bucketed' | 'parquet' — from metadata only (one schema
    read at most, no job)."""
    if os.path.exists(os.path.join(target_path, mor_mod.META_FILE)):
        return "mor"
    if BUCKET_COL in spark.read.parquet(target_path).columns:
        return "bucketed"
    return "parquet"


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
