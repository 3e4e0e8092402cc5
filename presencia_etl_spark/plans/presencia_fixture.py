"""Presencia-shaped synthetic corpus at reference scale (FIXTURES.md).

Spark-native generation — ``spark.range`` plus xxhash64-derived choices,
no driver-side row loops — of all 10 registry tables with the CSV-ingest
contract the reference's sync receives (``sync_ALL.py:234,242-244``):
every column a STRING, messy multi-format dates, ``'-'`` placeholders,
empty-string NULLs, duplicate natural keys (Socios' ``"0"`` cluster), and
4-decimal money strings. Default sizes are the reference's documented row
counts (~102K rows total), so ``bench.py`` can time the reference's
ACTUAL workload shape — full load (~88K-row fact), no-change incremental,
sparse mutation — against BASELINE.md rather than TPC-H proxies.

Deterministic for a fixed seed: every value is a pure function of
(row id, seed, column salt), so a regenerated frame replays byte-for-byte
and a no-change incremental really sees zero changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REFERENCE_SIZES = {
    "Liquidaciones": 88_460,   # FIXTURES.md §1
    "TbComentariosSocios": 8_287,  # §4
    "Socios": 5_041,           # §2
    "TblZonas": 344,           # §5
    "TblObras": 57,
    "TblPromotores": 28,
    "Cobradores": 26,          # §3
    "TblPlanes": 24,
    "TblIva": 4,
    "TblFPagos": 1,
}


def _h(seed: int, salt: int, m: int):
    """Deterministic pseudo-random int in [0, m) per row id."""
    return F.pmod(F.xxhash64(F.col("id"), F.lit(seed), F.lit(salt)), F.lit(m))


def _pick(seed: int, salt: int, options: list):
    """Uniform choice from a literal list (None → NULL string)."""
    arr = F.array(
        *[
            F.lit(o) if o is not None else F.lit(None).cast("string")
            for o in options
        ]
    )
    return F.element_at(arr, (_h(seed, salt, len(options)) + 1).cast("int"))


def _money(seed: int, salt: int, lo: int, hi: int):
    cents = _h(seed, salt, (hi - lo) * 100)
    return F.format_string(
        "%d.%02d", (cents / 100).cast("int") + F.lit(lo), F.pmod(cents, F.lit(100))
    )


def _messy_date(seed: int, salt: int):
    """``MM/dd/yy HH:mm:ss`` strings, 2022-2025 — the reference's dominant
    Access export format (cascade leg 1, sync_ALL.py:173-174)."""
    return F.format_string(
        "%02d/%02d/%02d 00:00:00",
        (_h(seed, salt, 12) + 1).cast("int"),
        (_h(seed, salt + 1, 28) + 1).cast("int"),
        (_h(seed, salt + 2, 4) + 22).cast("int"),
    )


def synth_liquidaciones(spark: SparkSession, n: int, seed: int = 7) -> DataFrame:
    """The fact table: unique CUPLIQUIDA, duplicate-heavy NUMLIQUIDA,
    weighted ESTLIQUIDA (CA 73 / DE 8 / AD 8 / BO 1 per 90), ~90%
    COBLIQUIDA='30', NULL-or-empty BAJA, messy PAGLIQUIDA text dates."""
    est = _h(seed, 10, 90)
    baja = F.when(
        _h(seed, 11, 10) < 2, _pick(seed, 12, ["1", "", None])
    ).otherwise(F.lit(""))
    return spark.range(n).select(
        F.format_string("CUP%06d", F.col("id")).alias("CUPLIQUIDA"),
        _h(seed, 13, 2000).cast("string").alias("NUMLIQUIDA"),
        _messy_date(seed, 14).alias("FECLIQUIDA"),
        F.when(est < 73, "CA")
        .when(est < 81, "DE")
        .when(est < 89, "AD")
        .otherwise("BO")
        .alias("ESTLIQUIDA"),
        F.format_string(
            "Mes%02d /20%02d",
            (_h(seed, 15, 12) + 1).cast("int"),
            (_h(seed, 16, 4) + 22).cast("int"),
        ).alias("PERLIQUIDA"),
        _pick(seed, 17, ["-", "obs", ""]).alias("OBSLIQUIDA"),
        _pick(seed, 18, ["--/--/--", "11/3/202", ""]).alias("PAGLIQUIDA"),
        F.lit("N").alias("COMLIQUIDA"),
        _money(seed, 19, 100, 30_000).alias("IMPLIQUIDA"),
        _money(seed, 20, 0, 20_000).alias("ABOLIQUIDA"),
        _h(seed, 21, 5041).cast("string").alias("SOCLIQUIDA"),
        F.when(_h(seed, 22, 10) < 9, "30").otherwise("31").alias("COBLIQUIDA"),
        baja.alias("BAJA"),
        (_h(seed, 23, 344) + 1).cast("string").alias("ZONLIQUIDA"),
        F.format_string("F%07d", _h(seed, 24, 10_000_000)).alias("NUMFACTURA"),
        _money(seed, 25, 0, 5_000).alias("SUBFACTURA"),
    )


def synth_socios(spark: SparkSession, n: int, seed: int = 11) -> DataFrame:
    """Members: ~10% of NUMSOCIO collapse to the '0' duplicate cluster
    (the no-reliable-key trait that forces full_refresh mode)."""
    return spark.range(n).select(
        F.when(_h(seed, 30, 10) == 0, F.lit("0"))
        .otherwise(F.col("id").cast("string"))
        .alias("NUMSOCIO"),
        F.format_string("SOCIO %04d", F.col("id")).alias("NOMSOCIO"),
        _pick(seed, 31, ["30"] * 7 + ["31", "32", ""]).alias("COBSOCIO"),
        _pick(seed, 32, ["CU"] * 2 + ["FA", "FB", ""]).alias("COMSOCIO"),
        _money(seed, 33, 0, 5_000).alias("IMPSOCIO"),
        _messy_date(seed, 34).alias("ALTSOCIO"),
        _pick(seed, 35, ["1", "", None]).alias("BAJA"),
        F.format_string("DOM %d", _h(seed, 36, 500)).alias("DOMSOCIO"),
    )


def synth_comentarios(spark: SparkSession, n: int, seed: int = 13) -> DataFrame:
    return spark.range(n).select(
        F.col("id").cast("string").alias("IdComment"),
        _h(seed, 40, 5041).cast("string").alias("NUMSOCIO"),
        F.format_string("comment %d", _h(seed, 41, 100_000)).alias("Comment"),
        _messy_date(seed, 42).alias("FechaCommet"),
        _pick(seed, 43, ["0"] * 9 + ["1"]).alias("Baja"),
    )


def synth_cobradores(spark: SparkSession, n: int = 26, seed: int = 17) -> DataFrame:
    """Collectors 20..45 — includes the '30' the sync filter selects."""
    return spark.range(n).select(
        (F.col("id") + 20).cast("string").alias("NUMCOB"),
        F.format_string("COBRADOR %02d", F.col("id") + 20).alias("NOMCOB"),
        _money(seed, 50, 0, 100).alias("COMCOB"),
        (_h(seed, 51, 344) + 1).cast("string").alias("ZONCOB"),
        _messy_date(seed, 52).alias("ALTCOB"),
    )


def _small_master(spark, n, key_name, key_expr, desc_name, desc_fmt):
    return spark.range(n).select(
        key_expr.alias(key_name),
        F.format_string(desc_fmt, F.col("id")).alias(desc_name),
    )


def synth_presencia_tables(
    spark: SparkSession,
    sizes: dict[str, int] | None = None,
    seed: int = 7,
) -> dict[str, DataFrame]:
    """All 10 registry tables, CSV-shaped (every column a string)."""
    s = dict(REFERENCE_SIZES)
    if sizes:
        s.update(sizes)
    one = F.col("id") + 1
    return {
        "Liquidaciones": synth_liquidaciones(spark, s["Liquidaciones"], seed),
        "Socios": synth_socios(spark, s["Socios"], seed + 1),
        "TbComentariosSocios": synth_comentarios(
            spark, s["TbComentariosSocios"], seed + 2
        ),
        "Cobradores": synth_cobradores(spark, s["Cobradores"], seed + 3),
        "TblZonas": _small_master(
            spark, s["TblZonas"], "NUMZONA", one.cast("string"), "DESZONA", "ZONA %d"
        ),
        "TblObras": _small_master(
            spark, s["TblObras"], "NUNOSOCIAL", one.cast("string"), "DESOSOCIAL", "OBRA %d"
        ),
        "TblPromotores": _small_master(
            spark,
            s["TblPromotores"],
            "NUMPROMOTOR",
            F.format_string("P%03d", F.col("id")),
            "NOMPROMOTOR",
            "PROMOTOR %d",
        ),
        "TblPlanes": _small_master(
            spark, s["TblPlanes"], "NUMPLAN", one.cast("string"), "DESPLAN", "PLAN %d"
        ),
        "TblIva": _small_master(
            spark, s["TblIva"], "CATIVA", one.cast("string"), "DESIVA", "IVA %d"
        ),
        "TblFPagos": _small_master(
            spark, s["TblFPagos"], "NUMFPAGO", one.cast("string"), "DESFPAGO", "FPAGO %d"
        ),
    }


def mutate_sparse(liq: DataFrame, every: int = 1000) -> DataFrame:
    """Sparse mutation (~0.1% of coupons get a new state) — the
    reference's '100 changed rows ≈ 12 s' incremental scenario."""
    victim = F.pmod(F.xxhash64("CUPLIQUIDA"), F.lit(every)) == 0
    return liq.withColumn(
        "ESTLIQUIDA", F.when(victim, F.lit("XX")).otherwise(F.col("ESTLIQUIDA"))
    )
