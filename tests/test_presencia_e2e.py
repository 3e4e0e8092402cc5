"""End-to-end reference-workload simulation: FIXTURES.md-shaped synthetic
Liquidaciones/Socios/Cobradores data (all-string CSV-style input with messy
dates, '-' placeholders, NULL BAJA flags) through the full EP1 → EP2 → EP4
lifecycle: full load, no-change incremental (idempotency), mutated
incremental, and the reconciliation report."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from presencia_etl_spark.plans.full_sync import full_sync
from presencia_etl_spark.plans.incremental_sync import incremental_sync
from presencia_etl_spark.plans.reconcile import reconcile_report
from presencia_etl_spark.sources.registry import PRESENCIA_REGISTRY

ESTADOS = ["CA"] * 73 + ["DE"] * 8 + ["AD"] * 7 + ["BO"] * 2


def synth_liquidaciones(spark, n=2000, seed=7):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        y = rng.choice([2022, 2023, 2024, 2025])
        mo, d = rng.randint(1, 12), rng.randint(1, 28)
        rows.append(
            (
                f"CUP{i:06d}",                                   # CUPLIQUIDA (unique)
                str(rng.choice([1254] * 5 + list(range(2000)))),  # NUMLIQUIDA (dups)
                f"{mo:02d}/{d:02d}/{str(y)[2:]} 00:00:00",        # FECLIQUIDA messy fmt
                rng.choice(ESTADOS),                              # ESTLIQUIDA
                rng.choice(["-", "obs", ""]),                     # OBSLIQUIDA
                rng.choice(["--/--/--", "11/3/202", ""]),         # PAGLIQUIDA stays text
                f"{rng.uniform(100, 30000):.2f}",                 # IMPLIQUIDA
                f"{rng.uniform(0, 20000):.2f}",                   # ABOLIQUIDA
                str(rng.randint(0, 400)),                         # SOCLIQUIDA
                rng.choice(["30"] * 9 + ["31"]),                  # COBLIQUIDA (filter)
                rng.choice(["1", "", None]) if rng.random() < 0.2 else "",  # BAJA
                str(rng.randint(1, 9)),                           # ZONLIQUIDA
            )
        )
    return spark.createDataFrame(
        rows,
        schema=[
            "CUPLIQUIDA", "NUMLIQUIDA", "FECLIQUIDA", "ESTLIQUIDA",
            "OBSLIQUIDA", "PAGLIQUIDA", "IMPLIQUIDA", "ABOLIQUIDA",
            "SOCLIQUIDA", "COBLIQUIDA", "BAJA", "ZONLIQUIDA",
        ],
    )


def synth_socios(spark, n=400, seed=11):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        rows.append(
            (
                str(i if rng.random() > 0.1 else 0),              # NUMSOCIO (0-dups)
                f"SOCIO {i:04d}",
                rng.choice(["30"] * 7 + ["31", "32", ""]),        # COBSOCIO (filter)
                f"{rng.uniform(0, 5000):.2f}",                    # IMPSOCIO
                f"{rng.randint(1,12):02d}/{rng.randint(1,28):02d}/22",  # ALTSOCIO
            )
        )
    return spark.createDataFrame(
        rows, schema=["NUMSOCIO", "NOMSOCIO", "COBSOCIO", "IMPSOCIO", "ALTSOCIO"]
    )


@pytest.fixture(scope="module")
def presencia_tables(spark):
    return {
        "Liquidaciones": synth_liquidaciones(spark),
        "Socios": synth_socios(spark),
        "Cobradores": spark.createDataFrame(
            [("30", "COBRADOR 30", "1"), ("31", "COBRADOR 31", "2")],
            schema=["NUMCOB", "NOMCOB", "ZONCOB"],
        ),
    }


class TestPresenciaLifecycle:
    def test_full_then_incremental_then_reconcile(self, spark, tmp_path, presencia_tables):
        wh = str(tmp_path / "warehouse")
        configs = {
            k: v for k, v in PRESENCIA_REGISTRY.items() if k in presencia_tables
        }

        # --- EP1: full load ------------------------------------------------
        counts = full_sync(spark, presencia_tables, configs, wh)
        liq = spark.read.parquet(f"{wh}/Liquidaciones")
        src_liq = presencia_tables["Liquidaciones"]
        # Filter parity: COBLIQUIDA='30' AND BAJA<>'1' with NULL-keeping <>.
        expected = src_liq.filter(
            (F.col("COBLIQUIDA") == "30")
            & (F.col("BAJA").isNull() | (F.col("BAJA") != "1"))
        ).count()
        assert counts["Liquidaciones"] == expected > 0

        # Type plan parity (F4 name-convention inference).
        dt = dict(liq.dtypes)
        assert dt["FECLIQUIDA"] == "timestamp"          # date name rule
        assert dt["IMPLIQUIDA"] == "decimal(15,4)"      # money rule
        assert dt["CUPLIQUIDA"] == "string"             # Text exception
        assert dt["COBLIQUIDA"] == "int"                # int rule
        assert dt["PAGLIQUIDA"] == "string"             # messy text stays text
        # Messy-format dates parsed, not nulled.
        assert liq.filter(F.col("FECLIQUIDA").isNull()).count() == 0
        # Audit envelope present.
        for c in ("id", "row_hash", "created_at", "updated_at"):
            assert c in liq.columns

        # --- EP2: incremental, no changes → all SKIP (idempotency) --------
        r = incremental_sync(spark, presencia_tables, configs, wh)
        assert r["Liquidaciones"]["insert"] == 0
        assert r["Liquidaciones"]["update"] == 0
        assert r["Socios"]["mode"] == "full_refresh"    # unreliable key table

        # --- EP2: mutated batch → exact classify counts --------------------
        mutated = dict(presencia_tables)
        mutated["Liquidaciones"] = src_liq.withColumn(
            "ESTLIQUIDA",
            F.when(F.col("CUPLIQUIDA") == "CUP000001", F.lit("XX")).otherwise(
                F.col("ESTLIQUIDA")
            ),
        )
        kept_mutation = mutated["Liquidaciones"].filter(
            (F.col("CUPLIQUIDA") == "CUP000001")
            & (F.col("COBLIQUIDA") == "30")
            & (F.col("BAJA").isNull() | (F.col("BAJA") != "1"))
        ).count()
        r2 = incremental_sync(spark, mutated, configs, wh)
        assert r2["Liquidaciones"]["update"] == kept_mutation
        assert r2["Liquidaciones"]["insert"] == 0

        # --- EP4: reconciliation report ------------------------------------
        state = spark.read.parquet(f"{wh}/Liquidaciones")
        rep = reconcile_report(
            state,
            state,
            "CUPLIQUIDA",
            state_col="ESTLIQUIDA",
            date_col="FECLIQUIDA",
            amount_col="IMPLIQUIDA",
        )
        assert all(row["diff"] == "OK" for row in rep.collect())


class TestSparkNativeFixture:
    """The bench-scale Spark-native corpus generator (plans.presencia_fixture)
    must be deterministic (a regenerated frame replays byte-for-byte, so a
    no-change incremental really sees zero changes) and CSV-shaped (all
    strings), and must flow through the same EP1/EP2 plans as the
    hand-rolled test fixture."""

    def test_deterministic_and_all_string(self, spark):
        from presencia_etl_spark.plans.presencia_fixture import (
            synth_presencia_tables,
        )

        sizes = {"Liquidaciones": 500, "Socios": 100, "TbComentariosSocios": 80}
        t1 = synth_presencia_tables(spark, sizes)
        t2 = synth_presencia_tables(spark, sizes)
        assert set(t1) == set(t2) and len(t1) == 10
        for name, df in t1.items():
            assert all(dt == "string" for _, dt in df.dtypes), name
            rows1 = sorted(map(tuple, df.collect()))
            rows2 = sorted(map(tuple, t2[name].collect()))
            assert rows1 == rows2, name

    def test_full_then_nochange_then_sparse(self, spark, tmp_path):
        from presencia_etl_spark.plans.presencia_fixture import (
            mutate_sparse,
            synth_presencia_tables,
        )

        sizes = {"Liquidaciones": 800, "Socios": 120, "TbComentariosSocios": 60}
        tables = synth_presencia_tables(spark, sizes)
        wh = str(tmp_path / "wh")
        counts = full_sync(spark, tables, PRESENCIA_REGISTRY, wh)
        assert counts["Liquidaciones"] > 0
        liq = spark.read.parquet(f"{wh}/Liquidaciones")
        dt = dict(liq.dtypes)
        assert dt["FECLIQUIDA"] == "timestamp"
        assert dt["IMPLIQUIDA"] == "decimal(15,4)"
        assert liq.filter(F.col("FECLIQUIDA").isNull()).count() == 0

        r = incremental_sync(spark, tables, PRESENCIA_REGISTRY, wh)
        assert r["Liquidaciones"]["insert"] == 0
        assert r["Liquidaciones"]["update"] == 0

        mutated = dict(tables)
        mutated["Liquidaciones"] = mutate_sparse(tables["Liquidaciones"], every=50)
        r2 = incremental_sync(spark, mutated, PRESENCIA_REGISTRY, wh)
        assert r2["Liquidaciones"]["insert"] == 0
        assert 0 < r2["Liquidaciones"]["update"] < counts["Liquidaciones"]
