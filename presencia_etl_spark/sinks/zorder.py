"""Z-order (Morton-curve) clustered parquet layout for multi-column skipping.

``write_range_sorted`` gives file-level skipping on ONE column; queries
filtering a second column still touch every file (each file spans that
column's full range). Z-ordering interleaves the bits of per-column RANK
buckets so rows close in the multi-dimensional key space land in the
same files — parquet min/max stats then stay tight on EVERY z-order
column at once, and a 2-D box predicate prunes to the files whose curve
segment crosses the box. This is the data-skipping layout Delta Lake's
OPTIMIZE ZORDER BY and Iceberg's sort-order rewrite apply at 100 TB
(Morton 1966; the OSS Delta implementation uses the same
range-partition-id construction per column).

Rank buckets, not value buckets: each column's bucket id comes from a
``repartitionByRange`` pass (sampled split points → ``spark_partition_id``),
the distributed equivalent of an equi-depth histogram — skewed columns
still spread across the full bucket range, where a min/max-scaled
``width_bucket`` would collapse them into a handful of codes. Cost is one
range shuffle per z-order column plus the final layout shuffle — the same
passes Delta's OPTIMIZE pays; run it at rest-write time, not per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET_PREFIX = "_zb_"
_Z_COL = "_z"


def _range_bucket(df: DataFrame, col: str, n_buckets: int, out: str) -> DataFrame:
    """Equi-depth bucket id for ``col``: range-partition on it (sampled
    split points, NULLs in the lowest partition) and record the partition
    id. Deterministic for a given input."""
    return df.repartitionByRange(n_buckets, F.col(col)).withColumn(
        out, F.spark_partition_id()
    )


def zorder_key(df: DataFrame, cols: list[str], bits: int = 8) -> DataFrame:
    """Append the interleaved Morton code ``_z`` (bigint) for ``cols``.

    ``bits`` bits per column (2^bits rank buckets each); the interleave
    is pure JVM integer arithmetic (shift/and/or), no UDF. With d columns
    the code uses d·bits bits — keep d·bits ≤ 62."""
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if len(cols) * bits > 62:
        raise ValueError(
            f"{len(cols)} cols × {bits} bits exceeds a bigint; lower bits"
        )
    out = df
    bucket_cols = []
    for c in cols:
        b = f"{_BUCKET_PREFIX}{c}"
        out = _range_bucket(out, c, 1 << bits, b)
        bucket_cols.append(b)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(bucket_cols):
            bit = F.shiftright(F.col(b), i).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit.cast("long"), i * len(bucket_cols) + j)
    return out.withColumn(_Z_COL, z).drop(*bucket_cols)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int = 8,
    bits: int = 8,
) -> None:
    """Write parquet clustered on the Z-order curve of ``cols``: files own
    disjoint curve ranges (range shuffle on the Morton code + sort within
    partitions), so min/max stats stay tight on every listed column and
    multi-column box predicates skip whole files. The curve key itself is
    dropped — it's a layout device, not data."""
    keyed = zorder_key(df, cols, bits=bits)
    (
        keyed.repartitionByRange(num_files, F.col(_Z_COL))
        .sortWithinPartitions(_Z_COL)
        .drop(_Z_COL)
        .write.mode("overwrite")
        .parquet(path)
    )
