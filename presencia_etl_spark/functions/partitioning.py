"""Scan-parallelism repair for expensive per-row projections.

A single large parquet file only splits at row-group boundaries, so a
table that arrives as one file (or one row group) runs its whole
projection chain on one task while the rest of the cluster idles. Any
operator that does real per-row work (hashing, shingling, SQL folds over
gram arrays) sits behind this helper: when the input scan's estimated
split count is well below the session's parallelism, pay one cheap
round-robin shuffle of the raw bytes to unlock N-way execution of the
expensive part.

No-op when the input is already parallel enough — the 100 TB case, where
sources arrive as thousands of splits and an extra shuffle would be pure
cost. Everything here is PLAN METADATA ONLY: file listings and session
confs — no job, no ``df.rdd`` (which would force an RDD conversion of
the analyzed plan on every call).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SIZE_SUFFIXES = (
    ("kb", 1 << 10),
    ("mb", 1 << 20),
    ("gb", 1 << 30),
    ("tb", 1 << 40),
    ("k", 1 << 10),
    ("m", 1 << 20),
    ("g", 1 << 30),
    ("t", 1 << 40),
    ("b", 1),
)


def _as_bytes(v: str) -> int:
    """Parse a Spark byte-size conf string ('134217728', '128m', '4MB')."""
    s = str(v).strip().lower()
    for suf, mult in _SIZE_SUFFIXES:
        if s.endswith(suf):
            return int(float(s[: -len(suf)])) * mult
    return int(float(s))


def _estimate_scan_partitions(df: DataFrame, files: list[str], target: int) -> int:
    """Split-count estimate from file metadata alone, mirroring how Spark
    packs FilePartitions: ``maxSplitBytes = min(maxPartitionBytes,
    max(openCostInBytes, sizePlusOpen / parallelism))`` and files are
    bin-packed into partitions of that size. Remote-scheme files can't be
    stat'ed — fall back to one split per file (a lower bound)."""
    local = [f[len("file:"):] for f in files if f.startswith("file:")]
    if len(local) != len(files):
        return len(files)
    conf = df.sparkSession.conf
    max_pb = _as_bytes(conf.get("spark.sql.files.maxPartitionBytes", "128m"))
    open_cost = _as_bytes(conf.get("spark.sql.files.openCostInBytes", "4m"))
    padded = sum(
        os.path.getsize(f) for f in local if os.path.exists(f)
    ) + open_cost * len(local)
    split = min(max_pb, max(open_cost, padded // max(target, 1)))
    return max(1, math.ceil(padded / max(split, 1)))


def parallelize_scan(
    df: DataFrame, factor: int = 2, min_bytes: int = 256 << 10
) -> DataFrame:
    """Repartition ``df`` to the session's default parallelism when its
    scan's estimated split count is more than ``factor``× below it.

    Tiny inputs are left alone: when the frame reads local files totalling
    under ``min_bytes``, the shuffle would cost more than the single-task
    projection it parallelizes. The threshold is COMPRESSED bytes and set
    low (256 KB) on purpose — text parquet decompresses ~5-10× and the
    callers of this helper do heavy per-row expression work, so even a
    sub-megabyte file repays one round-robin shuffle. Non-file plans
    (in-memory frames, JDBC) are returned unchanged: their parallelism is
    already source-controlled (``createDataFrame`` slices to the default
    parallelism; JDBC shards via its partitioning options), and there is
    no metadata-only way to size them without materializing the plan."""
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        return df
    if not files:
        return df
    local = [f[len("file:"):] for f in files if f.startswith("file:")]
    if len(local) == len(files):
        total = sum(os.path.getsize(f) for f in local if os.path.exists(f))
        if total < min_bytes:
            return df
    if _estimate_scan_partitions(df, files, target) * factor > target:
        return df
    # Deterministic hash spread, NOT round-robin: a keyless
    # ``repartition(n)`` first pays a full LOCAL SORT of its input
    # (sortBeforeRepartition, on by default since SPARK-23207 so retried
    # tasks reproduce their row→partition assignment) — and on the
    # single-task scans this helper exists to fix, that sort runs on one
    # core over the whole table (r13: the bench merge's source spread was
    # a 2.9 s one-task sort+shuffle job). Hashing a position-derived key
    # is retry-deterministic for free (same input split → same ids), so
    # no sort; 64× more key values than partitions keep the spread even
    # (guide-recommended headroom for hash collisions).
    return df.repartition(
        target,
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(target * 64)),
    )
