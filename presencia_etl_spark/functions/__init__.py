"""Scalar / row-wise semantics kernel (SURVEY §2.5, traps §2.8)."""

from presencia_etl_spark.functions.dates import (
    ACCESS_DATE_FORMATS,
    ACCESS_DATETIME_FORMATS,
    is_date_column,
    month_key,
    parse_access_datetime,
)
from presencia_etl_spark.functions.hashing import (
    HASH_NULL_SENTINEL,
    row_hash,
    with_row_hash,
)
from presencia_etl_spark.functions.inference import (
    access_type_to_spark,
    apply_cast_plan,
    infer_schema_by_name,
    infer_type_by_name,
)
from presencia_etl_spark.functions.keys import composite_key, normalize_key
from presencia_etl_spark.functions.nulls import (
    coerce_double,
    empty_strings_to_null,
    empty_to_null,
    null_safe_neq,
)

__all__ = [
    "ACCESS_DATETIME_FORMATS",
    "ACCESS_DATE_FORMATS",
    "HASH_NULL_SENTINEL",
    "access_type_to_spark",
    "apply_cast_plan",
    "coerce_double",
    "composite_key",
    "empty_strings_to_null",
    "empty_to_null",
    "infer_schema_by_name",
    "infer_type_by_name",
    "is_date_column",
    "month_key",
    "normalize_key",
    "null_safe_neq",
    "parse_access_datetime",
    "row_hash",
    "with_row_hash",
]
