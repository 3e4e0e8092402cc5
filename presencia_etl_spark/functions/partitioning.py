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

from pyspark.sql import DataFrame


def parallelize_scan(df: DataFrame, factor: int = 2) -> DataFrame:
    """Repartition ``df`` to the session's default parallelism when its
    current partition count is more than ``factor``× below it."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() * factor <= target:
        return df.repartition(target)
    return df
