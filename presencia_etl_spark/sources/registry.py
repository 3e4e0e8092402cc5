"""Config-driven table registry.

Replaces the reference's hardcoded constants — TABLES/TABLE_FILTERS
(``sync_ALL.py:20-45``), the unique-key map (``sync_INCREMENTAL.py:191-202``)
and FULL_REFRESH_TABLES (``sync_INCREMENTAL.py:46-48``) — with one declarative
config object per table.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from presencia_etl_spark.operators.filters import Predicate


@dataclass(frozen=True)
class TableConfig:
    name: str
    source_path: str | None = None  # parquet/csv path or JDBC table
    format: str = "parquet"  # parquet | csv | jdbc
    filters: list[Predicate] = field(default_factory=list)
    key_cols: list[str] = field(default_factory=list)  # [] → first column
    full_refresh: bool = False  # no reliable key → drop/recreate each run
    semi_join: tuple[str, str] | None = None  # (other_table, key_col)
    num_buckets: int = 0  # >0 → bucket-pruned partitioned merge state
    merge_mode: str = "cow"  # cow | mor (merge-on-read delta state, sinks/mor.py)
    # Snapshot-diff sync (WHEN NOT MATCHED BY SOURCE THEN DELETE): tombstone
    # live keys the source snapshot no longer contains. Requires
    # merge_mode="mor" and a source that is a FULL snapshot per run (the
    # reference's shape — it re-exports whole Access tables each sync).
    sync_deletes: bool = False


# The docs describe an earlier/alternate Socios filter shape —
# BAJA<>1 AND COMSOCIO='CU' (context/context.md:710-716) — vs the code's
# COBSOCIO='30' (sync_ALL.py:38-40). SURVEY §0 deems the code authoritative
# but both shapes worth supporting; they are the same Predicate machinery.
SOCIOS_DOCS_VARIANT = TableConfig(
    "Socios",
    filters=[Predicate("BAJA", "neq", "1"), Predicate("COMSOCIO", "eq", "CU")],
    key_cols=["NUMSOCIO", "NOMSOCIO"],
    full_refresh=True,
)

# The reference's 10-table business registry, expressed declaratively.
# Filters: sync_ALL.py:34-45 (COBSOCIO='30' on Socios, NUMCOB='30' on
# Cobradores, BAJA<>'1' NULL-keeping on Liquidaciones); keys:
# sync_INCREMENTAL.py:191-202; Socios is full-refresh (composite key has
# duplicates), TbComentariosSocios is semi-joined to filtered Socios
# (sync_ALL.py:341-345).
PRESENCIA_REGISTRY: dict[str, TableConfig] = {
    cfg.name: cfg
    for cfg in [
        TableConfig("Cobradores", filters=[Predicate("NUMCOB", "eq", "30")], key_cols=["NUMCOB"]),
        TableConfig(
            "Socios",
            filters=[Predicate("COBSOCIO", "eq", "30")],
            key_cols=["NUMSOCIO", "NOMSOCIO"],
            full_refresh=True,
        ),
        TableConfig(
            "Liquidaciones",
            filters=[Predicate("COBLIQUIDA", "eq", "30"), Predicate("BAJA", "neq", "1")],
            key_cols=["CUPLIQUIDA"],
        ),
        TableConfig("TblObras", key_cols=["NUNOSOCIAL"]),
        TableConfig("TblPlanes", key_cols=["NUMPLAN"]),
        TableConfig("TblFPagos", key_cols=["NUMFPAGO"]),
        TableConfig("TblIva", key_cols=["CATIVA"]),
        TableConfig("TblZonas", key_cols=["NUMZONA"]),
        TableConfig("TblPromotores", key_cols=["NUMPROMOTOR"]),
        TableConfig(
            "TbComentariosSocios",
            key_cols=["IdComment"],
            semi_join=("Socios", "NUMSOCIO"),
        ),
    ]
}
