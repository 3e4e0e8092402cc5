"""Schema inference: Access-type mapping (F3) and name-convention typing (F4).

Parity targets:

- F3 — ``convert_access_type_to_mysql`` (``sync_ALL.py:99-126``): map the
  types ``mdb-schema`` emits to sink types. Here we map straight to Spark
  types (the MySQL names were only ever an encoding of these).
- F4 — ``infer_column_type`` (``sync_INCREMENTAL.py:100-148``): when no
  authoritative schema exists, infer the type from the COLUMN NAME. The
  exception lists are business truth (e.g. NUMSOCIO is Text in Access even
  though it starts with NUM) and are ported verbatim — they are data, not
  code.

These are driver-side rules that produce a cast plan; the casts themselves
run JVM-side (``try_cast`` so garbage degrades to NULL instead of failing
the job under ANSI mode, matching the reference's swallow-and-NULL
behavior).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from presencia_etl_spark.functions.dates import is_date_column, parse_access_datetime
from presencia_etl_spark.functions.nulls import empty_to_null

# ---------------------------------------------------------------------------
# F3: Access (mdb-schema) type → Spark type (sync_ALL.py:99-126).
# ---------------------------------------------------------------------------

_VARCHAR_RE = re.compile(r"varchar\s*\((\d+)\)")


def access_type_to_spark(access_type: str) -> T.DataType:
    """Map an ``mdb-schema``-emitted type string to a Spark DataType."""
    t = access_type.lower().replace("not null", "").strip()
    if "auto_increment" in t:
        return T.LongType()  # surrogate ids are 64-bit in our engine
    if t.startswith("varchar") or t == "text":
        return T.StringType()
    if t in ("smallint", "int", "integer"):
        return T.IntegerType()
    if t in ("double", "float"):
        return T.DoubleType()
    if t == "boolean":
        return T.BooleanType()
    if t in ("date", "datetime"):
        return T.TimestampType()
    return T.StringType()


# ---------------------------------------------------------------------------
# F4: name-convention inference (sync_INCREMENTAL.py:100-148).
# Exception lists ported verbatim — they encode which Access columns are
# Text despite id-ish names.
# ---------------------------------------------------------------------------

DATE_ALLOWLIST = frozenset(
    {"ALTCOB", "ALTSOCIO", "BAJAFECHA", "PERLIQUIDANRO", "F1CSOCIO", "FBUSCAHR"}
)
MONEY_ALLOWLIST = frozenset({"ABOLIQUIDA", "COMCOB", "IMPSOCIO", "SUBFACTURA"})
INT_TEXT_EXCEPTIONS = frozenset(
    {
        "NUMSOCIO", "NUMPROMOTOR", "NUMFACTURA", "CUPLIQUIDA", "SOCLIQUIDA",
        "OBSCOB", "OBISOCIO", "NOMCOB", "DOMCOB", "LOCCOB", "TELCOB", "CELCOB",
        "IVACOB", "CUICOB", "NOMSOCIO", "FANSOCIO", "DOMSOCIO", "LOCSOCIO",
        "PROSOCIO", "TELSOCIO", "IVASOCIO", "CUISOCIO", "COMSOCIO", "DESZONA",
        "ESTLIQUIDA", "PERLIQUIDA", "OBSLIQUIDA", "PAGLIQUIDA", "COMLIQUIDA",
    }
)
INT_ALLOWLIST = frozenset(
    {
        "BAJA", "POSCOB", "PROCOB", "ULTCOB", "ZONCOB", "COBSOCIO",
        "PLASOCIO", "ZONSOCIO", "POSSOCIO", "SUBSOCIO", "ZONLIQUIDA",
        "COBLIQUIDA",
    }
)
_INT_PREFIXES = ("NUM", "COD", "ID", "CANT", "POS", "PRO", "ZON", "ULT")
_INT_SUFFIXES = ("COB", "SOCIO", "ZONA", "LIQUIDA")
_MONEY_PREFIXES = ("IMP", "MONTO", "PRECIO", "TOTAL")
_MONEY_SUFFIXES = ("IMP", "MONTO", "PRECIO")


def infer_type_by_name(col_name: str) -> T.DataType:
    """Name-convention type inference (F4), priority order preserved:
    dates > money (DECIMAL 15,4) > int-ish ids (minus Text exceptions) >
    VARCHAR default."""
    u = col_name.upper()
    if is_date_column(u) or u in DATE_ALLOWLIST:
        return T.TimestampType()
    if (
        any(u.startswith(p) for p in _MONEY_PREFIXES)
        or any(u.endswith(s) for s in _MONEY_SUFFIXES)
        or "IMPORTE" in u
        or "COMISION" in u
        or u in MONEY_ALLOWLIST
    ):
        return T.DecimalType(15, 4)
    id_shaped = (
        any(u.startswith(p) for p in _INT_PREFIXES)
        or any(u.endswith(s) for s in _INT_SUFFIXES)
    )
    if (id_shaped and u not in INT_TEXT_EXCEPTIONS) or u in INT_ALLOWLIST:
        return T.IntegerType()
    return T.StringType()


def infer_schema_by_name(columns: list[str]) -> T.StructType:
    """Build a full StructType for an all-string source via F4."""
    return T.StructType(
        [T.StructField(c, infer_type_by_name(c), True) for c in columns]
    )


def cast_failure_condition(
    df: DataFrame, schema: T.StructType | None = None
):
    """Column expression: TRUE when any non-string cast would turn a
    NON-EMPTY raw value into NULL (garbage, not merely missing)."""
    target = schema or infer_schema_by_name(df.columns)
    by_name = {f.name: f.dataType for f in target.fields}
    cond = F.lit(False)
    for c in df.columns:
        dt = by_name.get(c, T.StringType())
        if isinstance(dt, T.StringType):
            continue
        s = empty_to_null(F.col(c))
        casted = parse_access_datetime(s) if isinstance(dt, T.TimestampType) else s.try_cast(dt)
        cond = cond | (s.isNotNull() & casted.isNull())
    return cond


def cast_with_quarantine(
    df: DataFrame, schema: T.StructType | None = None
) -> tuple[DataFrame, DataFrame]:
    """Cast plan + quarantine split (the engine's N5 deviation).

    The reference silently swallows bad rows at insert time
    (``sync_ALL.py:299-317``); we deliberately do NOT reproduce that data
    loss. Returns (typed_good_rows, quarantined_raw_rows) — the
    badRecordsPath discipline: nothing disappears, bad rows stay raw and
    inspectable.
    """
    target = schema or infer_schema_by_name(df.columns)
    bad = cast_failure_condition(df, target)
    return apply_cast_plan(df.filter(~bad), target), df.filter(bad)


def apply_cast_plan(
    df: DataFrame, schema: T.StructType | None = None
) -> DataFrame:
    """Cast an all-string DataFrame to its inferred/derived schema.

    Empty strings become NULL first (F5); date-ish columns go through the
    multi-format Access parser (F1); everything else ``try_cast`` so bad
    values degrade to NULL (reference behavior) rather than erroring under
    ANSI mode.
    """
    target = schema or infer_schema_by_name(df.columns)
    by_name = {f.name: f.dataType for f in target.fields}
    out = []
    for c in df.columns:
        dt = by_name.get(c, T.StringType())
        s = empty_to_null(c)
        if isinstance(dt, T.TimestampType):
            out.append(parse_access_datetime(s).alias(c))
        elif isinstance(dt, T.StringType):
            out.append(s.alias(c))
        else:
            out.append(s.try_cast(dt).alias(c))
    return df.select(*out)
