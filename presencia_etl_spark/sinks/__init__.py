"""Sinks: overwrite / append / merge-upsert writers (SURVEY §2.1 S5–S8)."""

from presencia_etl_spark.sinks.lifecycle import (
    apply_retention,
    delete_rows,
    state_kind,
)
from presencia_etl_spark.sinks.mor import (
    compact_mor,
    delete_keys_mor,
    delete_where_mor,
    merge_upsert_mor,
    mor_history,
    read_mor,
    read_mor_changes,
)
from presencia_etl_spark.sinks.writers import (
    append_parquet,
    delete_where_parquet,
    delete_where_partitioned,
    drop_path,
    merge_upsert_parquet,
    merge_upsert_partitioned,
    overwrite_parquet,
    rebucket,
    with_audit_columns,
    write_bucketed_table,
    write_jdbc_append,
    write_range_sorted,
)

__all__ = [
    "append_parquet",
    "apply_retention",
    "delete_rows",
    "state_kind",
    "compact_mor",
    "delete_keys_mor",
    "delete_where_mor",
    "delete_where_parquet",
    "delete_where_partitioned",
    "merge_upsert_mor",
    "mor_history",
    "read_mor",
    "read_mor_changes",
    "drop_path",
    "merge_upsert_parquet",
    "merge_upsert_partitioned",
    "overwrite_parquet",
    "rebucket",
    "with_audit_columns",
    "write_bucketed_table",
    "write_jdbc_append",
    "write_range_sorted",
]
