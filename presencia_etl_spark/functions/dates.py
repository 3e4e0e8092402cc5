"""Multi-format date parsing and date-column election.

Parity targets:

- ``convert_date_value`` (``sync_INCREMENTAL.py:150-167``; ``sync_ALL.py:
  167-182`` adds two date-only formats): try formats in order, first success
  wins, unparseable/empty → NULL. Format order matters (semantics trap N2).
- Date-column election by name (``sync_INCREMENTAL.py:324-327``): a column
  is date-parsed iff its upper-cased name contains FEC/FECHA/DATE or is in
  an explicit allowlist.

Spark-first: ``coalesce(try_to_timestamp(c, fmt1), try_to_timestamp(c, fmt2),
…)`` — JVM-side, codegen-friendly, NULL on failure exactly like the
reference's swallowed ValueError. Two-digit years: Spark's ``yy`` resolves
to 2000–2068-ish via SIMPLE datetime policy; all reference data is
2006–2025 (safe zone per SURVEY N2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Order matters — first matching format wins (sync_ALL.py:174-179).
# Python '%m/%d/%y %H:%M:%S' ↔ Spark 'M/d/yy H:mm:ss' (strptime tolerates
# non-zero-padded fields; Spark single-letter patterns do the same).
ACCESS_DATETIME_FORMATS: tuple[str, ...] = (
    "M/d/yy H:mm:ss",
    "M/d/yyyy H:mm:ss",
    "yyyy-M-d H:mm:ss",
)
# sync_ALL.py additionally accepts date-only forms.
ACCESS_DATE_FORMATS: tuple[str, ...] = ACCESS_DATETIME_FORMATS + (
    "M/d/yy",
    "M/d/yyyy",
)

# F2: name-based date-column election (sync_INCREMENTAL.py:104-116).
DATE_NAME_SUBSTRINGS: tuple[str, ...] = ("FEC", "FECHA", "DATE")
DATE_NAME_ALLOWLIST: frozenset[str] = frozenset(
    {"ALTCOB", "ALTSOCIO", "BAJAFECHA", "PERLIQUIDANRO", "F1CSOCIO", "FBUSCAHR"}
)


def parse_access_datetime(
    col: Column | str, formats: tuple[str, ...] = ACCESS_DATE_FORMATS
) -> Column:
    """First-match-wins multi-format parse; empty/unparseable → NULL."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.nullif(c.cast("string"), F.lit(""))
    return F.coalesce(*[F.try_to_timestamp(s, F.lit(fmt)) for fmt in formats])


def is_date_column(name: str) -> bool:
    """Should this column be date-converted? (name-convention rule F2)."""
    upper = name.upper()
    return upper in DATE_NAME_ALLOWLIST or any(
        sub in upper for sub in DATE_NAME_SUBSTRINGS
    )


def month_key(col: Column | str) -> Column:
    """'yyyy-MM' month bucket (compare_historico_mensual.py:64-65)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM")


def epoch_seconds(col: Column | str) -> Column:
    """Epoch seconds from any timestamp flavor (LTZ, NTZ, or string).

    ``CAST(ts AS LONG)`` is legal on TIMESTAMP but raises
    CAST_WITHOUT_SUGGESTION on TIMESTAMP_NTZ; routing through
    ``cast("timestamp")`` first accepts both. An NTZ value is interpreted
    in the session timezone (UTC for this engine), and in relative
    arithmetic (gaps, band buckets) any fixed offset cancels anyway.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp").cast("long")
