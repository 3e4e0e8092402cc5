"""Pipelines: the reference's entry points re-expressed as Spark plans."""

from presencia_etl_spark.plans.full_sync import full_sync, prepare_table
from presencia_etl_spark.plans.incremental_agg import (
    build_agg_snapshot,
    read_agg_snapshot,
    refresh_agg_snapshot,
)
from presencia_etl_spark.plans.incremental_sync import (
    incremental_sync,
    incremental_sync_table,
)
from presencia_etl_spark.plans.reconcile import key_reconcile, monthly_reconcile

__all__ = [
    "build_agg_snapshot",
    "read_agg_snapshot",
    "refresh_agg_snapshot",
    "full_sync",
    "incremental_sync",
    "incremental_sync_table",
    "key_reconcile",
    "monthly_reconcile",
    "prepare_table",
]
