"""Scan-parallelism repair for expensive per-row projections.

A single large parquet file only splits at row-group boundaries, so a
table that arrives as one file (or one row group) runs its whole
projection chain on one task while the rest of the cluster idles. Any
operator that does real per-row work (hashing, shingling, SQL folds over
gram arrays) sits behind this helper: when the input's partition count is
well below the session's parallelism, pay one cheap round-robin shuffle
of the raw bytes to unlock N-way execution of the expensive part.

No-op when the input is already parallel enough — the 100 TB case, where
sources arrive as thousands of splits and an extra shuffle would be pure
cost.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def parallelize_scan(
    df: DataFrame, factor: int = 2, min_bytes: int = 256 << 10
) -> DataFrame:
    """Repartition ``df`` to the session's default parallelism when its
    current partition count is more than ``factor``× below it.

    Tiny inputs are left alone: when the frame reads local files totalling
    under ``min_bytes``, the shuffle would cost more than the single-task
    projection it parallelizes. The threshold is COMPRESSED bytes and set
    low (256 KB) on purpose — text parquet decompresses ~5-10× and the
    callers of this helper do heavy per-row expression work, so even a
    sub-megabyte file repays one round-robin shuffle. Sizing uses file
    metadata only — no job is triggered — and non-file or remote-scheme
    plans skip the check (assume big)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() * factor > target:
        return df
    try:
        files = df.inputFiles()
        local = [f[len("file:"):] for f in files if f.startswith("file:")]
        if files and len(local) == len(files):
            total = sum(os.path.getsize(f) for f in local if os.path.exists(f))
            if total < min_bytes:
                return df
    except Exception:
        pass  # non-file source (rdd, in-memory, jdbc): size unknown → widen
    return df.repartition(target)
