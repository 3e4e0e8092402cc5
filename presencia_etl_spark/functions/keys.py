"""Key normalization and composite-key construction.

Parity target: ``normalize_key_value`` (``sync_INCREMENTAL.py:211-224``):
None → ``''``; trim; if the string parses as a number, canonicalize
(``"30.0"`` → ``"30"``, integer-valued floats lose the decimal part,
non-integer floats keep Python's shortest float repr); otherwise the trimmed
raw string. Composite keys join normalized parts with ``'|'``
(``sync_INCREMENTAL.py:242-248,414-417``).

Spark-first: a ``when``-chain over ``try_cast('double')`` — no UDF, stays in
codegen. NaN/Infinity strings fall through to the raw-string branch (the
reference's ``int(float(s))`` raises on those and falls back the same way).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F


_SMALL_INT_TYPES = frozenset({"tinyint", "smallint", "int", "boolean"})
# Doubles are exact integers up to 2^53; inside that range the full
# trim/parse/canonicalize chain provably renders a bigint as its plain
# decimal string, so the cast IS the normalization.
_DOUBLE_EXACT = 9007199254740992  # 2**53


def normalize_key(col: Column | str, dtype: str | None = None) -> Column:
    """Canonical string form of a join/CDC key value.

    ``dtype`` (the column's Spark simpleString type, when the caller has a
    schema) enables a type-directed fast path — r13: for integral and
    boolean columns the full chain (trim → try_cast(double) → isnan/inf →
    floor/integrality checks → re-render) is a per-row no-op by
    construction: the cast string has no spaces, parses back exactly, and
    re-renders to itself. int/smallint/tinyint/boolean always qualify;
    bigint qualifies when |v| ≤ 2^53 (above that the double parse is
    lossy and the canonical form is the ROUNDED long — reference parity:
    ``int(float(s))`` — so a runtime range guard keeps the full chain for
    the huge tail). Same output, byte for byte, at a fraction of the
    per-row cost on every CDC classify/merge scan.

    The trimmed string and its double-parse are bound ONCE per row via the
    ``transform(array(<expr>), x -> ...)[0]`` idiom — inlining them into
    the when-chain re-parses the string at every branch reference (~1.6×
    slower measured on the 600 K-row bench scan; this expression sits on
    every CDC classify/merge path, so per-scan cost compounds)."""
    c = F.col(col) if isinstance(col, str) else col
    if dtype in _SMALL_INT_TYPES:
        return F.coalesce(c.cast("string"), F.lit(""))
    if dtype == "bigint":
        # Huge tail (|v| > 2^53, where the double parse is lossy): the
        # generic chain's work reduces to pure scalar arithmetic for a
        # bigint input — str(v) has no whitespace, parses back to exactly
        # cast(v as double) (both are round-to-nearest), is always
        # integral at this magnitude, and is never NaN/Inf — so render
        # the rounded long below 2^62 and the double's string form above,
        # with no higher-order-function branch at all. The r13 fast path
        # kept the full HOF chain in the ELSE branch; its mere presence
        # in the projection pushed the generated code past JIT-friendly
        # size and cost ~1.5-2x on EVERY row of every CDC classify/merge
        # scan even though the branch never executed (r14 measured).
        d = c.cast("double")
        return (
            F.when(c.isNull(), F.lit(""))
            .when(
                (c >= -_DOUBLE_EXACT) & (c <= _DOUBLE_EXACT), c.cast("string")
            )
            .when(F.abs(d) < F.lit(2.0**62), d.cast("long").cast("string"))
            .otherwise(d.cast("string"))
        )
    s_expr = F.coalesce(F.trim(c.cast("string")), F.lit(""))

    def with_parsed(s: Column) -> Column:
        def render(d: Column) -> Column:
            numeric = d.isNotNull() & ~F.isnan(d) & (F.abs(d) != float("inf"))
            is_integral = numeric & (d == F.floor(d)) & (F.abs(d) < F.lit(2.0**62))
            return (
                F.when(s == "", s)
                .when(is_integral, d.cast("long").cast("string"))
                .when(numeric, d.cast("string"))
                .otherwise(s)
            )

        return F.transform(F.array(s.try_cast("double")), render)[0]

    return F.transform(F.array(s_expr), with_parsed)[0]


def composite_key(
    cols: Iterable[str], dtypes: dict[str, str] | None = None
) -> Column:
    """Multi-column logical key: normalized parts joined by '|'.

    ``dtypes`` (column → Spark type simpleString, e.g. ``dict(df.dtypes)``)
    lets each part take the type-directed normalize fast path.

    Parity: ``sync_INCREMENTAL.py:414-417`` (e.g. Socios keyed on
    NUMSOCIO+NOMSOCIO because NUMSOCIO alone has duplicates).
    """
    dtypes = dtypes or {}
    return F.concat_ws(
        "|", *[normalize_key(c, dtypes.get(c)) for c in cols]
    )
