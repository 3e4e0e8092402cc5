"""Sources: readers + table registry (SURVEY §2.1 S1–S4)."""

from presencia_etl_spark.sources.readers import (
    read_csv_all_string,
    read_jdbc,
    read_parquet,
    read_table,
    table_exists,
)
from presencia_etl_spark.sources.registry import PRESENCIA_REGISTRY, TableConfig

__all__ = [
    "PRESENCIA_REGISTRY",
    "TableConfig",
    "read_csv_all_string",
    "read_jdbc",
    "read_parquet",
    "read_table",
    "table_exists",
]
