"""Row hashing — the CDC change-detection primitive.

Parity target: the reference's ``calculate_row_hash``
(``sync_ALL.py:184-191``, ``sync_INCREMENTAL.py:169-176``): column names
sorted alphabetically; each value rendered ``str(val) if val else 'NULL'``
(so empty string AND missing both become the literal ``'NULL'``); values
joined with ``'|'``; SHA-256 hex digest.

Spark-first: one JVM-side expression
``sha2(concat_ws('|', coalesce(nullif(cast(c as string),''),'NULL') ...), 256)``
— fully inside whole-stage codegen, no Python in the loop, so it scales
linearly with partitions (the reference hashed 88K rows/s single-threaded;
this does millions/s/core).

Scale note: the hash is computed on the *pre-cast string* representation,
exactly like the reference hashes raw CSV strings. When inputs are already
typed (parquet), the cast-to-string rendering is Spark's — deterministic
across executors, which is all CDC needs (hashes are compared only against
hashes produced by this same function).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_NULL_SENTINEL = "NULL"


def row_hash(columns: Iterable[str]) -> Column:
    """SHA-256 over the sorted, '|'-joined, NULL-sentineled column values.

    Semantics trap N3 (SURVEY §2.8): ``''`` and NULL both hash as the
    sentinel ``'NULL'`` — reproduced with ``coalesce(nullif(x, ''), 'NULL')``.
    """
    parts = [
        F.coalesce(
            F.nullif(F.col(c).cast("string"), F.lit("")),
            F.lit(HASH_NULL_SENTINEL),
        )
        for c in sorted(columns)
    ]
    return F.sha2(F.concat_ws("|", *parts), 256)


def with_row_hash(
    df: DataFrame,
    columns: Iterable[str] | None = None,
    hash_col: str = "row_hash",
) -> DataFrame:
    """Attach the row hash over ``columns`` (default: all current columns)."""
    cols = list(columns) if columns is not None else df.columns
    return df.withColumn(hash_col, row_hash(cols))
