"""NULL/empty-string semantics and defaulting coercions.

Parity targets (SURVEY §2.8 traps N1/F5/F10):

- N1 — the reference's exclusion filter is Python ``row.get(f) != v`` which
  is TRUE for missing values; SQL ``col <> lit`` drops NULLs. We must write
  ``col IS NULL OR col <> lit``.
- F5 — empty string → NULL at every sink boundary
  (``sync_INCREMENTAL.py:321-322``).
- F10 — ``float(x or 0)`` with errors contributing 0
  (``compare_noviembre_2025.py:172-179``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def null_safe_neq(col: Column | str, value) -> Column:
    """``col != value`` that KEEPS NULLs (trap N1)."""
    c = _c(col)
    return c.isNull() | (c != F.lit(value))


def empty_to_null(col: Column | str) -> Column:
    """'' → NULL (F5). Apply before casts."""
    return F.nullif(_c(col).cast("string"), F.lit(""))


def empty_strings_to_null(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Apply F5 to every string column (or the given subset)."""
    targets = set(
        columns
        if columns is not None
        else [f.name for f in df.schema.fields if f.dataType.simpleString() == "string"]
    )
    return df.select(
        *[
            empty_to_null(c).alias(c) if c in targets else F.col(c)
            for c in df.columns
        ]
    )


def coerce_double(col: Column | str, default: float = 0.0) -> Column:
    """Parse-as-double with default on empty/garbage (F10).

    ``coalesce(try_cast(nullif(c,'') as double), default)`` — mirrors the
    reference's ``float(x or 0)`` inside try/except.
    """
    return F.coalesce(empty_to_null(col).try_cast("double"), F.lit(float(default)))
