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


# r13: NECESSARY-condition shape guards per known format. A failed
# ``try_to_timestamp`` is expensive (java.time raises and Spark swallows,
# ~µs per attempt), and in a first-match cascade most rows fail 1-2
# formats before hitting theirs. Each guard is a cheap regex that every
# string PARSEABLE by its format must match (strict java.time widths:
# ``yy`` = exactly 2 digits, ``yyyy`` = 4+ digits with optional sign
# beyond 4, ``M``/``d``/``H`` = 1-2 digits, literal separators) — so
# wrapping the leg in ``when(guard, parse)`` never changes the cascade's
# result, it only skips attempts that were guaranteed to fail.
# Unlisted formats parse unguarded (same as before).
_FORMAT_GUARDS: dict[str, str] = {
    "M/d/yy H:mm:ss": r"^\d{1,2}/\d{1,2}/\d{2} ",
    "M/d/yyyy H:mm:ss": r"^\d{1,2}/\d{1,2}/[+-]?\d{4}",
    "yyyy-M-d H:mm:ss": r"^[+-]?\d{4,}-",
    "M/d/yy": r"^\d{1,2}/\d{1,2}/\d{2}$",
    "M/d/yyyy": r"^\d{1,2}/\d{1,2}/[+-]?\d{4,}$",
}


def parse_access_datetime(
    col: Column | str, formats: tuple[str, ...] = ACCESS_DATE_FORMATS
) -> Column:
    """First-match-wins multi-format parse; empty/unparseable → NULL.

    The input string is bound once via the ``transform(array(.))[0]``
    idiom (each format leg references it; inlined it would re-cast and
    re-nullif per leg)."""
    c = F.col(col) if isinstance(col, str) else col
    s_expr = F.nullif(c.cast("string"), F.lit(""))

    def cascade(s: Column) -> Column:
        legs = []
        for fmt in formats:
            leg = F.try_to_timestamp(s, F.lit(fmt))
            guard = _FORMAT_GUARDS.get(fmt)
            if guard is not None:
                leg = F.when(s.rlike(guard), leg)
            legs.append(leg)
        return F.coalesce(*legs)

    return F.transform(F.array(s_expr), cascade)[0]


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
