"""CDC classification and reconciliation set operations (SURVEY §2.3).

The reference's incremental sync loads the whole target key→(id, hash) map
into a Python dict and probes it per source row
(``sync_INCREMENTAL.py:226-268,404-435``) — its documented "golden rule"
(never SELECT per row) is exactly the build side of a hash join. Spark-first
that becomes ONE left-outer join keyed on the normalized key, and Catalyst/
AQE picks broadcast vs shuffled-hash vs sort-merge from actual sizes:

- target small (the 100K-row reference case) → broadcast, zero shuffle of
  the source;
- both huge (100 TB case) → shuffled join; pre-bucketing both sides on the
  key makes it shuffle-free across repeated syncs.

Buckets are INSERT / UPDATE / SKIP only — the reference never deletes
(trap N6).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from presencia_etl_spark.functions.hashing import with_row_hash
from presencia_etl_spark.functions.keys import composite_key

OP_COL = "_cdc_op"
KEY_COL = "_cdc_key"
INSERT, UPDATE, SKIP = "insert", "update", "skip"


def with_cdc_key(df: DataFrame, key_cols: Iterable[str], out: str = KEY_COL) -> DataFrame:
    """Attach the normalized (possibly composite) CDC key (F7+F8)."""
    return df.withColumn(out, composite_key(list(key_cols)))


def ensure_cdc_key(df: DataFrame, key_cols: Iterable[str]) -> DataFrame:
    """``with_cdc_key``, but trust an existing ``_cdc_key`` column.

    Merge targets persist the normalized key (like they persist
    ``row_hash``), so steady-state syncs read it from parquet instead of
    re-running the normalize expression over the whole target every pass —
    at 100 TB that recompute dwarfs the column's storage cost."""
    return df if KEY_COL in df.columns else with_cdc_key(df, key_cols)


def cdc_classify(
    src: DataFrame,
    tgt: DataFrame,
    key_cols: list[str],
    hash_cols: list[str] | None = None,
    tgt_hash_col: str = "row_hash",
) -> DataFrame:
    """Classify every source row as insert/update/skip vs the target.

    src: incoming batch (raw columns; hash computed here over ``hash_cols``
         or all source columns).
    tgt: current target state — only its key columns + stored hash are read
         (column pruning keeps the scan narrow at scale).

    Returns src columns + ``row_hash`` + ``_cdc_op``.

    If src ALREADY carries a ``row_hash`` column it is trusted as-is — the
    pipelines hash raw pre-cast strings (F6 parity) and casting would
    otherwise change the rendering and misclassify everything as updated.
    """
    hashed = (
        src if "row_hash" in src.columns else with_row_hash(src, hash_cols or src.columns)
    )
    s = with_cdc_key(hashed, key_cols)
    t = ensure_cdc_key(tgt, key_cols).select(
        F.col(KEY_COL), F.col(tgt_hash_col).alias("_tgt_hash")
    )
    joined = s.join(t, on=KEY_COL, how="left_outer")
    op = (
        F.when(F.col("_tgt_hash").isNull(), F.lit(INSERT))
        .when(F.col("row_hash") != F.col("_tgt_hash"), F.lit(UPDATE))
        .otherwise(F.lit(SKIP))
    )
    return joined.withColumn(OP_COL, op).drop("_tgt_hash")


def cdc_counts(classified: DataFrame) -> DataFrame:
    """(op, count) summary — the reference's 'Nuevos/Modificados/Sin
    cambios' report."""
    return classified.groupBy(F.col(OP_COL).alias("op")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


def key_set_diff(
    a: DataFrame, b: DataFrame, key_cols: list[str]
) -> tuple[DataFrame, DataFrame]:
    """J4: keys only in a, keys only in b (both directions), via anti joins.

    Mirrors compare_noviembre_2025.py:193-214 (cupones present on one side
    only). Distinct-then-anti keeps the shuffled data to the key columns.
    """
    ka = a.select(*key_cols).distinct()
    kb = b.select(*key_cols).distinct()
    return (
        ka.join(kb, on=key_cols, how="left_anti"),
        kb.join(ka, on=key_cols, how="left_anti"),
    )
