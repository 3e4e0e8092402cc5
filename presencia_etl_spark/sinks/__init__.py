"""Sinks: overwrite / append / merge-upsert writers (SURVEY §2.1 S5–S8)."""

from presencia_etl_spark.sinks.writers import (
    append_parquet,
    drop_path,
    merge_upsert_parquet,
    overwrite_parquet,
    with_audit_columns,
    write_jdbc_append,
)

__all__ = [
    "append_parquet",
    "drop_path",
    "merge_upsert_parquet",
    "overwrite_parquet",
    "with_audit_columns",
    "write_jdbc_append",
]
