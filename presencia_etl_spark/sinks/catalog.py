"""S8/S9 — catalog DDL: drop sinks and the auxiliary control-plane tables.

The reference's Flask server creates three auxiliary MySQL tables with
enums/defaults/indexes (``server.py:70-87,147-165,193-212``); its cleanup
script drops the business tables (``clean_all_tables.py:40-51``). Spark has
no ENUM — allowed values are declared here and enforced by
``validate_enums`` (CHECK-constraint analog); indexes are a storage-layout
concern (partitioning/bucketing) rather than DDL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# server.py:70-87 — MensajesEnviados (sent WhatsApp messages log)
MENSAJES_ENVIADOS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("telefono", T.StringType(), False),
        T.StructField("mensaje", T.StringType(), True),
        T.StructField("estado", T.StringType(), True),  # ENUM
        T.StructField("fecha_envio", T.TimestampType(), True),
        T.StructField("respuesta_api", T.StringType(), True),
    ]
)
# server.py:147-165 — IAUsageLogs (LLM API usage accounting)
IA_USAGE_LOGS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("modelo", T.StringType(), True),
        T.StructField("tokens_input", T.IntegerType(), True),
        T.StructField("tokens_output", T.IntegerType(), True),
        T.StructField("costo_usd", T.DecimalType(10, 6), True),
        T.StructField("fecha", T.TimestampType(), True),
    ]
)
# server.py:193-212 — Conversaciones (chat threads)
CONVERSACIONES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("telefono", T.StringType(), False),
        T.StructField("rol", T.StringType(), True),  # ENUM
        T.StructField("contenido", T.StringType(), True),
        T.StructField("fecha", T.TimestampType(), True),
    ]
)

AUX_TABLES: dict[str, T.StructType] = {
    "MensajesEnviados": MENSAJES_ENVIADOS_SCHEMA,
    "IAUsageLogs": IA_USAGE_LOGS_SCHEMA,
    "Conversaciones": CONVERSACIONES_SCHEMA,
}

# ENUM columns and their allowed values (Spark has no enum type).
ENUM_VALUES: dict[tuple[str, str], tuple[str, ...]] = {
    ("MensajesEnviados", "estado"): ("enviado", "fallido", "pendiente"),
    ("Conversaciones", "rol"): ("user", "assistant"),
}


def create_aux_tables(spark: SparkSession, root: str | None = None) -> list[str]:
    """S9: CREATE TABLE IF NOT EXISTS for the three aux tables.

    With ``root`` set, creates empty parquet datasets under it; otherwise
    registers empty temp views (catalog-only, the test path).
    """
    created = []
    for name, schema in AUX_TABLES.items():
        empty = spark.createDataFrame([], schema)
        if root is not None:
            import os

            path = f"{root}/{name}"
            if not os.path.exists(path):
                empty.write.mode("ignore").parquet(path)
        else:
            if not spark.catalog.tableExists(name):
                empty.createOrReplaceTempView(name)
        created.append(name)
    return created


def validate_enums(df: DataFrame, table: str) -> DataFrame:
    """CHECK-constraint analog: rows whose enum columns hold disallowed
    values (empty result = valid)."""
    conds = []
    for (tbl, col), allowed in ENUM_VALUES.items():
        if tbl == table and col in df.columns:
            conds.append(~F.col(col).isin(*allowed) & F.col(col).isNotNull())
    if not conds:
        return df.limit(0)
    bad = conds[0]
    for c in conds[1:]:
        bad = bad | c
    return df.filter(bad)


def drop_tables(spark: SparkSession, names: list[str], root: str | None = None) -> None:
    """S8: drop sink (clean_all_tables analog)."""
    import shutil

    for name in names:
        if root is not None:
            shutil.rmtree(f"{root}/{name}", ignore_errors=True)
        else:
            spark.catalog.dropTempView(name)
