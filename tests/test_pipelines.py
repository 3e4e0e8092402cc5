"""Pipeline tests: EP1/EP2 shapes + the reference's idempotency property
(SURVEY §5: rerunning incremental sync on identical input must classify
0 inserts / 0 updates)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from presencia_etl_spark.operators import cdc
from presencia_etl_spark.plans.full_sync import full_sync, prepare_table
from presencia_etl_spark.plans.incremental_sync import incremental_sync_table
from presencia_etl_spark.sinks.writers import merge_upsert_parquet
from presencia_etl_spark.sources.registry import Predicate, TableConfig


@pytest.fixture()
def socios_like(spark):
    rows = [
        ("1", "ANA", "30", "100.5", "01/15/22 00:00:00"),
        ("2", "BOB", "30", "", "02/20/22 00:00:00"),
        ("3", "CARLA", "31", "7.25", ""),          # filtered out (COBSOCIO != 30)
        ("0", "DUP", "30", "0", "03/01/22 00:00:00"),
        ("0", "DUP2", "30", "1", "03/02/22 00:00:00"),  # same NUMSOCIO, diff NOMSOCIO
    ]
    return spark.createDataFrame(
        rows, schema=["NUMSOCIO", "NOMSOCIO", "COBSOCIO", "IMPSOCIO", "ALTSOCIO"]
    )


CFG = TableConfig(
    "Socios",
    filters=[Predicate("COBSOCIO", "eq", "30")],
    key_cols=["NUMSOCIO", "NOMSOCIO"],
    full_refresh=True,
)


class TestPrepareTable:
    def test_filter_cast_hash(self, socios_like):
        out = prepare_table(socios_like, CFG)
        rows = out.collect()
        assert len(rows) == 4  # CARLA filtered
        dtypes = dict(out.dtypes)
        assert dtypes["IMPSOCIO"] == "decimal(15,4)"   # money inference (F4)
        assert dtypes["ALTSOCIO"] == "timestamp"       # date allowlist (F2)
        assert dtypes["NUMSOCIO"] == "string"          # Text exception (F4)
        assert dtypes["row_hash"] == "string"
        by_name = {r["NOMSOCIO"]: r for r in rows}
        assert by_name["BOB"]["IMPSOCIO"] is None      # '' → NULL (F5)
        assert by_name["ANA"]["ALTSOCIO"] is not None  # multi-format parse (F1)

    def test_null_keeping_filter(self, spark):
        df = spark.createDataFrame(
            [("a", "1"), ("b", "0"), ("c", None)], schema=["K", "BAJA"]
        )
        cfg = TableConfig("T", filters=[Predicate("BAJA", "neq", "1")], key_cols=["K"])
        out = prepare_table(df, cfg, typed=False)
        assert {r["K"] for r in out.collect()} == {"b", "c"}  # NULL kept (N1)


class TestMergeUpsert:
    def test_create_then_idempotent(self, spark, tmp_path, socios_like):
        target = str(tmp_path / "socios")
        src = socios_like.filter(F.col("COBSOCIO") == "30")

        r1 = merge_upsert_parquet(spark, src, target, ["NUMSOCIO", "NOMSOCIO"])
        assert r1["insert"] == 4 and r1["update"] == 0

        # Idempotency: identical input → all SKIP.
        r2 = merge_upsert_parquet(spark, src, target, ["NUMSOCIO", "NOMSOCIO"])
        assert r2 == {"insert": 0, "update": 0, "skip": 4}

    def test_update_and_insert(self, spark, tmp_path, socios_like):
        target = str(tmp_path / "socios")
        src = socios_like.filter(F.col("COBSOCIO") == "30")
        merge_upsert_parquet(spark, src, target, ["NUMSOCIO", "NOMSOCIO"])

        changed = src.withColumn(
            "IMPSOCIO",
            F.when(F.col("NOMSOCIO") == "ANA", F.lit("999")).otherwise(F.col("IMPSOCIO")),
        )
        new_row = spark.createDataFrame(
            [("9", "ZOE", "30", "5", "04/01/22 00:00:00")], schema=src.columns
        )
        r = merge_upsert_parquet(
            spark, changed.unionByName(new_row), target, ["NUMSOCIO", "NOMSOCIO"]
        )
        assert r == {"insert": 1, "update": 1, "skip": 3}

        state = spark.read.parquet(target)
        assert state.count() == 5
        ana = state.filter(F.col("NOMSOCIO") == "ANA").collect()[0]
        assert ana["IMPSOCIO"] == "999"
        # Audit: ids unique, created_at preserved semantics implied by id set.
        ids = [r["id"] for r in state.select("id").collect()]
        assert len(ids) == len(set(ids))

    def test_composite_key_normalization(self, spark, tmp_path):
        # '30' and '30.0' are the same normalized key (F7) → update not insert.
        target = str(tmp_path / "t")
        a = spark.createDataFrame([("30", "x")], schema=["K", "V"])
        merge_upsert_parquet(spark, a, target, ["K"])
        b = spark.createDataFrame([("30.0", "y")], schema=["K", "V"])
        r = merge_upsert_parquet(spark, b, target, ["K"])
        assert r["insert"] == 0 and r["update"] == 1


class TestFullSync:
    def test_registry_semi_join(self, spark, tmp_path):
        socios = spark.createDataFrame(
            [("1", "A", "30"), ("2", "B", "31")],
            schema=["NUMSOCIO", "NOMSOCIO", "COBSOCIO"],
        )
        comments = spark.createDataFrame(
            [("c1", "1"), ("c2", "2"), ("c3", "1")],
            schema=["IdComment", "NUMSOCIO"],
        )
        configs = {
            "Socios": TableConfig(
                "Socios",
                filters=[Predicate("COBSOCIO", "eq", "30")],
                key_cols=["NUMSOCIO", "NOMSOCIO"],
            ),
            "TbComentariosSocios": TableConfig(
                "TbComentariosSocios",
                key_cols=["IdComment"],
                semi_join=("Socios", "NUMSOCIO"),
            ),
        }
        counts = full_sync(
            spark,
            {"Socios": socios, "TbComentariosSocios": comments},
            configs,
            str(tmp_path / "warehouse"),
        )
        # Socio 2 filtered out; its comment vanishes via the semi join (P5).
        assert counts == {"Socios": 1, "TbComentariosSocios": 2}


class TestIncrementalTable:
    def test_full_refresh_mode(self, spark, tmp_path, socios_like):
        r = incremental_sync_table(
            spark, socios_like, CFG, str(tmp_path / "wh")
        )
        assert r["mode"] == "full_refresh" and r["insert"] == 4

    def test_bucketed_state_mode(self, spark, tmp_path):
        """num_buckets>0 in TableConfig routes the sync through the
        bucket-pruned partitioned merge: state lands in _kb= dirs, a
        localized change rewrites only its bucket, idempotency holds."""
        cfg = TableConfig("T", key_cols=["K"], num_buckets=8)
        src = spark.range(0, 400).select(
            F.col("id").cast("string").alias("K"), (F.col("id") % 5).alias("V")
        )
        wh = str(tmp_path / "wh")
        r = incremental_sync_table(spark, src, cfg, wh)
        assert r["mode"] == "incremental" and r["insert"] == 400
        import os

        kb_dirs = [d for d in os.listdir(f"{wh}/T") if d.startswith("_kb=")]
        assert len(kb_dirs) == 8

        r = incremental_sync_table(spark, src, cfg, wh)
        assert r["insert"] == 0 and r["update"] == 0

        mut = src.withColumn(
            "V", F.when(F.col("K") == "42", F.lit(99)).otherwise(F.col("V"))
        )
        r = incremental_sync_table(spark, mut, cfg, wh)
        assert r["update"] == 1 and r["buckets_rewritten"] == 1

    def test_mor_state_mode(self, spark, tmp_path):
        """merge_mode='mor' routes the sync through the merge-on-read
        sink: a localized change writes one delta dir and zero base
        files; read_mor shows the merged state; idempotency holds."""
        import os

        from presencia_etl_spark.sinks.mor import read_mor

        cfg = TableConfig("T", key_cols=["K"], num_buckets=8, merge_mode="mor")
        src = spark.range(0, 400).select(
            F.col("id").cast("string").alias("K"), (F.col("id") % 5).alias("V")
        )
        wh = str(tmp_path / "wh")
        r = incremental_sync_table(spark, src, cfg, wh)
        assert r["mode"] == "incremental_mor" and r["insert"] == 400

        r = incremental_sync_table(spark, src, cfg, wh)
        assert r["insert"] == 0 and r["update"] == 0
        assert not os.path.isdir(f"{wh}/T/deltas")  # no-op wrote nothing

        mut = src.withColumn(
            "V", F.when(F.col("K") == "42", F.lit(99)).otherwise(F.col("V"))
        )
        r = incremental_sync_table(spark, mut, cfg, wh)
        assert r["update"] == 1 and r["delta_files"] >= 1
        state = read_mor(spark, f"{wh}/T")
        assert state.count() == 400
        # prepare_table's name-inference keeps V string-typed, like the
        # bucketed-mode sibling state.
        assert state.filter(F.col("K") == "42").collect()[0]["V"] == "99"

    def test_cdc_counts_shape(self, spark):
        old = spark.createDataFrame([("1", "a"), ("2", "b")], ["K", "V"])
        old = cdc.with_row_hash(old, ["K", "V"])
        new = spark.createDataFrame([("1", "a"), ("2", "B"), ("3", "c")], ["K", "V"])
        classified = cdc.cdc_classify(new, old, ["K"], hash_cols=["K", "V"])
        counts = {r["op"]: r["cnt"] for r in cdc.cdc_counts(classified).collect()}
        assert counts == {"insert": 1, "update": 1, "skip": 1}


class TestReconcileReport:
    def test_full_report_shape(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from presencia_etl_spark.plans.reconcile import reconcile_report
        from presencia_etl_spark.sources.readers import read_table

        orders = read_table(spark, sf_dir, "orders")
        tgt = orders.filter(F.col("o_orderkey") % 10 != 0)
        rep = reconcile_report(
            orders, tgt, "o_orderkey",
            state_col="o_orderstatus", date_col="o_orderdate",
            amount_col="o_totalprice",
        )
        rows = {(r["section"], r["metric"]): r for r in rep.collect()}
        total = rows[("counts", "total_rows")]
        assert total["diff"] == "DIFF"
        assert int(total["src_value"]) > int(total["tgt_value"])
        ko = rows[("key_diff", "keys_only_in_src")]
        assert int(ko["src_value"]) > 0 and ko["diff"] == "DIFF"
        assert rows[("key_diff", "keys_only_in_tgt")]["tgt_value"] == "0"
        assert rows[("dates", "min_date")]["diff"] in ("OK", "DIFF")
        # identical frames → everything OK
        rep2 = reconcile_report(orders, orders, "o_orderkey",
                                state_col="o_orderstatus")
        assert all(r["diff"] == "OK" for r in rep2.collect())

    def test_reconcile_from_maintained_snapshots(self, spark, tmp_path):
        """EP4 as a maintained pipeline: two month rollups kept fresh by
        the agg rung, diffed in O(months) — the result must equal a
        from-scratch reconcile of the live states."""
        from pyspark.sql import functions as F

        from presencia_etl_spark.plans import incremental_agg as ia
        from presencia_etl_spark.plans.reconcile import (
            reconcile_from_snapshots,
        )
        from presencia_etl_spark.sinks import mor

        def rows(n, drop=()):
            return [
                (i, f"2024-{1 + i % 3:02d}", float(i))
                for i in range(n)
                if i not in drop
            ]

        schema = "k long, month string, amt double"
        src_t, tgt_t = str(tmp_path / "rs"), str(tmp_path / "rt")
        mor.merge_upsert_mor(
            spark, spark.createDataFrame(rows(40), schema), src_t, ["k"],
            num_buckets=4, compact_every=None,
        )
        mor.merge_upsert_mor(
            spark, spark.createDataFrame(rows(40, drop={7, 8}), schema),
            tgt_t, ["k"], num_buckets=4, compact_every=None,
        )
        agg_s, agg_t = str(tmp_path / "ras"), str(tmp_path / "rat")
        ia.build_agg_snapshot(spark, src_t, agg_s, ["month"], ["amt"])
        ia.build_agg_snapshot(spark, tgt_t, agg_t, ["month"], ["amt"])
        # drift: src gains rows, tgt catches one up
        mor.merge_upsert_mor(
            spark,
            spark.createDataFrame([(100, "2024-02", 5.0)], schema),
            src_t, ["k"], compact_every=None,
        )
        mor.merge_upsert_mor(
            spark, spark.createDataFrame([(7, "2024-02", 7.0)], schema),
            tgt_t, ["k"], compact_every=None,
        )
        assert ia.refresh_agg_snapshot(spark, src_t, agg_s)["mode"] == "incremental"
        assert ia.refresh_agg_snapshot(spark, tgt_t, agg_t)["mode"] == "incremental"
        got = {
            r["month"]: (r["n_rows_src"], r["n_rows_tgt"], r["n_rows_diff"])
            for r in reconcile_from_snapshots(spark, agg_s, agg_t).collect()
        }
        want = {
            r["month"]: (r["ns"] or 0, r["nt"] or 0)
            for r in mor.read_mor(spark, src_t)
            .groupBy("month")
            .agg(F.count(F.lit(1)).alias("ns"))
            .join(
                mor.read_mor(spark, tgt_t)
                .groupBy("month")
                .agg(F.count(F.lit(1)).alias("nt")),
                on="month",
                how="full_outer",
            )
            .collect()
        }
        assert {m: (s, t) for m, (s, t, _d) in got.items()} == want
        assert all(d == s - t for s, t, d in got.values())
        # the sum measure rides along
        sums = reconcile_from_snapshots(spark, agg_s, agg_t).columns
        assert {"sum_amt_src", "sum_amt_tgt", "sum_amt_diff"} <= set(sums)
        # snapshots carrying minmax/hll columns reconcile too: those
        # columns aren't numeric measures (dates / binary sketches) and
        # must be SKIPPED, not coalesce(c,0)-subtracted (pre-fix this
        # raised AnalysisException on the hll binary column)
        agg_s2, agg_t2 = str(tmp_path / "ras2"), str(tmp_path / "rat2")
        ia.build_agg_snapshot(
            spark, src_t, agg_s2, ["month"], ["amt"],
            minmax_cols=["amt"], hll_cols=["k"],
        )
        ia.build_agg_snapshot(
            spark, tgt_t, agg_t2, ["month"], ["amt"],
            minmax_cols=["amt"], hll_cols=["k"],
        )
        rich = reconcile_from_snapshots(spark, agg_s2, agg_t2)
        assert not [
            c for c in rich.columns
            if c.startswith(("min_", "max_", "hll_"))
        ]
        got2 = {
            r["month"]: (r["n_rows_src"], r["n_rows_tgt"])
            for r in rich.collect()
        }
        assert got2 == {m: (s, t) for m, (s, t, _d) in got.items()}


class TestSociosDocsVariant:
    def test_docs_filter_shape(self, spark):
        from presencia_etl_spark.plans.full_sync import prepare_table
        from presencia_etl_spark.sources.registry import SOCIOS_DOCS_VARIANT

        df = spark.createDataFrame(
            [
                ("1", "A", None, "CU"),    # kept: NULL BAJA + CU
                ("2", "B", "", "CU"),      # kept: empty BAJA coerces != '1'
                ("3", "C", "1", "CU"),     # dropped: BAJA=1
                ("4", "D", "0", "FA"),     # dropped: not CU
            ],
            schema=["NUMSOCIO", "NOMSOCIO", "BAJA", "COMSOCIO"],
        )
        out = prepare_table(df, SOCIOS_DOCS_VARIANT, typed=False)
        assert {r["NUMSOCIO"] for r in out.collect()} == {"1", "2"}


class TestSqlSurface:
    def test_register_state_views_layout_aware(self, spark, tmp_path):
        """One call registers every warehouse state as a SQL view with the
        correct reader per layout: a MOR table's view applies latest-wins
        + tombstone filtering; internal columns (_kb, _cdc_key) are hidden
        while the audit envelope (part of the reference's warehouse
        schema) stays. Views snapshot at registration — re-registering
        advances them past later merges (the documented REFRESH move)."""
        from pyspark.sql import functions as F

        from presencia_etl_spark.sinks import mor
        from presencia_etl_spark.sinks.writers import (
            merge_upsert_parquet,
            merge_upsert_partitioned,
        )
        from presencia_etl_spark.sql import register_state_views

        wh = str(tmp_path / "wh")
        import os

        os.makedirs(wh)
        df = spark.createDataFrame(
            [(i, f"n{i}") for i in range(40)], ["k", "name"]
        )
        mor.merge_upsert_mor(spark, df, f"{wh}/Socios", ["k"], num_buckets=4)
        merge_upsert_partitioned(
            spark, df, f"{wh}/Liquidaciones", ["k"], num_buckets=4
        )
        merge_upsert_parquet(spark, df, f"{wh}/Cobradores", ["k"])

        # A crashed journaled swap's staged sibling holds real parquet
        # but is NOT a table: view registration and generation manifests
        # must both skip it.
        import shutil

        shutil.copytree(
            f"{wh}/Cobradores", f"{wh}/Cobradores__rebucket_staged"
        )
        views = register_state_views(spark, wh)
        assert set(views) == {"socios", "liquidaciones", "cobradores"}
        from presencia_etl_spark.plans.generations import record_generation

        gen = record_generation(spark, wh)
        assert set(gen["tables"]) == {"Socios", "Liquidaciones", "Cobradores"}
        shutil.rmtree(f"{wh}/Cobradores__rebucket_staged")
        assert spark.sql("SELECT count(*) c FROM socios").collect()[0]["c"] == 40
        cols = spark.table("liquidaciones").columns
        assert "_kb" not in cols and "_cdc_key" not in cols
        assert "row_hash" in cols and "id" in cols  # audit stays

        # MOR view reflects deletes/upserts after RE-registration.
        mor.delete_keys_mor(
            spark, f"{wh}/Socios",
            spark.createDataFrame([(7,)], ["k"]), ["k"],
        )
        register_state_views(spark, wh)
        got = spark.sql("SELECT k FROM socios WHERE k = 7").collect()
        assert got == []

        # include_internal exposes the layout columns for operators.
        register_state_views(spark, wh, include_internal=True, prefix="raw_")
        assert "_kb" in spark.table("raw_liquidaciones").columns

        # Joining across layouts through plain SQL.
        n = spark.sql(
            "SELECT count(*) c FROM socios s JOIN liquidaciones l ON s.k = l.k"
        ).collect()[0]["c"]
        assert n == 39


class TestWarehouseGenerations:
    def test_generation_reads_are_cross_table_consistent(self, spark, tmp_path):
        """Each sync run records a generation pinning every MOR table's
        sequence; register_state_views(generation=N) reconstructs run N's
        warehouse — joins across tables see one run's state even after
        newer syncs landed."""
        import os

        from pyspark.sql import functions as F

        from presencia_etl_spark.plans.generations import (
            generation_entry,
            record_generation,
        )
        from presencia_etl_spark.sinks import mor
        from presencia_etl_spark.sql import register_state_views

        wh = str(tmp_path / "wh")
        os.makedirs(wh)

        def sync(step):
            a = spark.createDataFrame(
                [(i, f"a{step}_{i}") for i in range(20)], ["k", "va"]
            )
            b = spark.createDataFrame(
                [(i, f"b{step}_{i}") for i in range(20)], ["k", "vb"]
            )
            mor.merge_upsert_mor(spark, a, f"{wh}/ta", ["k"], num_buckets=4,
                                 compact_every=None)
            mor.merge_upsert_mor(spark, b, f"{wh}/tb", ["k"], num_buckets=4,
                                 compact_every=None)
            return record_generation(spark, wh)

        g1 = sync(1)
        g2 = sync(2)
        assert (g1["gen"], g2["gen"]) == (1, 2)
        assert g1["tables"]["ta"]["seq"] == 0  # initial load, no deltas
        assert g2["tables"]["ta"]["seq"] == 1

        # Generation 1: both tables show run-1 values, consistently.
        register_state_views(spark, wh, generation=1)
        row = spark.sql(
            "SELECT va, vb FROM ta JOIN tb USING (k) WHERE k = 3"
        ).collect()[0]
        assert (row["va"], row["vb"]) == ("a1_3", "b1_3")

        # Latest (-1) resolves to generation 2.
        register_state_views(spark, wh, generation=-1)
        row = spark.sql("SELECT va FROM ta WHERE k = 3").collect()[0]
        assert row["va"] == "a2_3"

        # Unknown generation raises with the available list.
        import pytest

        with pytest.raises(ValueError, match="generation 9 not found"):
            register_state_views(spark, wh, generation=9)

        # Retention: compacting past gen-1's sequences expires it.
        mor.compact_mor(spark, f"{wh}/ta")
        with pytest.raises(ValueError, match="predates the last compaction"):
            register_state_views(spark, wh, generation=1)
        assert generation_entry(wh)["gen"] == 2


class TestGenerationHygiene:
    """Manifest locking, the non-snapshot report, pinned-view exclusion,
    view-name collisions, and dead-generation pruning."""

    def _wh(self, spark, tmp_path, n_runs=1):
        import os

        from presencia_etl_spark.plans.generations import record_generation
        from presencia_etl_spark.sinks import mor

        wh = str(tmp_path / "wh")
        os.makedirs(wh)
        for step in range(1, n_runs + 1):
            df = spark.createDataFrame(
                [(i, f"v{step}_{i}") for i in range(20)], ["k", "v"]
            )
            mor.merge_upsert_mor(spark, df, f"{wh}/ta", ["k"], num_buckets=4,
                                 compact_every=None)
            record_generation(spark, wh)
        return wh

    def test_record_generation_respects_writer_lock(self, spark, tmp_path):
        from presencia_etl_spark.plans.generations import record_generation
        from presencia_etl_spark.sinks.locking import StateLockedError, state_lock

        wh = self._wh(spark, tmp_path)
        import threading

        # A concurrent holder of the manifest lock (another sync run's
        # record step) forces the second writer to fail loudly instead of
        # interleaving load→append→replace and losing an entry.
        errs = []
        import os

        hold = threading.Event()
        release = threading.Event()

        def holder():
            with state_lock(os.path.join(wh, "_warehouse_manifest")):
                hold.set()
                release.wait(10)

        t = threading.Thread(target=holder)
        t.start()
        hold.wait(10)
        try:
            with pytest.raises(StateLockedError):
                record_generation(spark, wh)
        finally:
            release.set()
            t.join(10)
        # Lock released → records fine.
        assert record_generation(spark, wh)["gen"] == 2

    def test_non_snapshot_report_and_pinned_exclusion(self, spark, tmp_path):
        from presencia_etl_spark.plans.generations import (
            non_snapshot_tables,
            record_generation,
        )
        from presencia_etl_spark.sinks import mor
        from presencia_etl_spark.sinks.writers import merge_upsert_parquet
        from presencia_etl_spark.sql import register_state_views

        wh = self._wh(spark, tmp_path)  # gen 1 pins only 'ta'
        df = spark.createDataFrame([(1, "x")], ["k", "v"])
        merge_upsert_parquet(spark, df, f"{wh}/cowt", ["k"])
        mor.merge_upsert_mor(spark, df, f"{wh}/late_mor", ["k"], num_buckets=2,
                             compact_every=None)
        # COW tables and the MOR table created after gen 1 are reported.
        assert non_snapshot_tables(wh, 1) == ["cowt", "late_mor"]
        # The pinned registration EXCLUDES the late MOR table (it did not
        # exist at gen 1) but still serves COW at current state.
        views = register_state_views(spark, wh, generation=1)
        assert "late_mor" not in views and "ta" in views and "cowt" in views
        # After recording gen 2 the late table is pinned and visible.
        record_generation(spark, wh)
        assert non_snapshot_tables(wh, 2) == ["cowt"]
        views = register_state_views(spark, wh, generation=2)
        assert "late_mor" in views

    def test_view_name_collision_raises(self, spark, tmp_path):
        from presencia_etl_spark.sinks.writers import merge_upsert_parquet
        from presencia_etl_spark.sql import register_state_views

        import os

        wh = str(tmp_path / "wh")
        os.makedirs(wh)
        df = spark.createDataFrame([(1, "x")], ["k", "v"])
        merge_upsert_parquet(spark, df, f"{wh}/a-b", ["k"])
        merge_upsert_parquet(spark, df, f"{wh}/a_b", ["k"])
        with pytest.raises(ValueError, match="normalize to view name"):
            register_state_views(spark, wh)

    def test_prune_generations_drops_exactly_expired(self, spark, tmp_path):
        from presencia_etl_spark.plans.generations import (
            generation_entry,
            load_manifest,
            prune_generations,
        )
        from presencia_etl_spark.sinks import mor

        wh = self._wh(spark, tmp_path, n_runs=3)  # gens 1(seq0) 2(seq1) 3(seq2)
        # Nothing compacted: nothing prunable.
        assert prune_generations(wh) == {"pruned": 0, "kept": 3}
        # Fold all but the newest delta: floor = seq 1, so gen 1 (seq 0)
        # becomes unreadable and is pruned; gens 2 and 3 survive.
        mor.compact_mor(spark, f"{wh}/ta", keep_last=1)
        assert mor.mor_history(f"{wh}/ta")["compacted_through"] == 1
        assert prune_generations(wh) == {"pruned": 1, "kept": 2}
        assert [e["gen"] for e in load_manifest(wh)["generations"]] == [2, 3]
        # Gen numbering continues from the kept tail.
        from presencia_etl_spark.plans.generations import record_generation

        assert record_generation(spark, wh)["gen"] == 4
        assert generation_entry(wh)["gen"] == 4

    def test_prune_drops_generations_pinning_vanished_tables(
        self, spark, tmp_path
    ):
        """A generation pinning a MOR table whose state dir was dropped /
        externally deleted is unreadable (view registration of it fails)
        — prune must drop it rather than retain it forever."""
        import os
        import shutil

        from presencia_etl_spark.plans.generations import (
            load_manifest,
            prune_generations,
            record_generation,
        )
        from presencia_etl_spark.sinks import mor

        wh = self._wh(spark, tmp_path)  # gen 1 pins 'ta'
        df = spark.createDataFrame([(1, "x")], ["k", "v"])
        mor.merge_upsert_mor(spark, df, f"{wh}/doomed", ["k"], num_buckets=2,
                             compact_every=None)
        record_generation(spark, wh)  # gen 2 pins ta + doomed
        record_generation(spark, wh)  # gen 3 (newest, always kept)
        assert prune_generations(wh) == {"pruned": 0, "kept": 3}
        shutil.rmtree(os.path.join(wh, "doomed"))
        # Gens 2 and 3 pin the vanished table. Gen 3 is the newest (kept
        # by construction); gen 2 is dead weight and goes; gen 1 never
        # pinned the table and stays readable.
        assert prune_generations(wh) == {"pruned": 1, "kept": 2}
        assert [e["gen"] for e in load_manifest(wh)["generations"]] == [1, 3]


class TestSqlCli:
    def test_sql_subcommand_cross_layout_join(self, spark, tmp_path, capsys):
        """`sql --warehouse DIR --query ...` registers layout-aware views
        and answers a JOIN across a MOR table and a flat COW table — the
        warehouse consumer surface driven end-to-end through the CLI."""
        import json
        import os

        from presencia_etl_spark.__main__ import main
        from presencia_etl_spark.sinks import mor
        from presencia_etl_spark.sinks.writers import merge_upsert_parquet

        wh = str(tmp_path / "wh")
        os.makedirs(wh)
        df = spark.createDataFrame(
            [(i, f"n{i}") for i in range(30)], ["k", "name"]
        )
        amounts = spark.createDataFrame(
            [(i, i * 10) for i in range(30)], ["k", "amount"]
        )
        mor.merge_upsert_mor(spark, df, f"{wh}/Socios", ["k"], num_buckets=4)
        merge_upsert_parquet(spark, amounts, f"{wh}/Pagos", ["k"])
        mor.delete_keys_mor(
            spark, f"{wh}/Socios", spark.createDataFrame([(7,)], ["k"]), ["k"]
        )

        assert main([
            "sql", "--warehouse", wh, "--query",
            "SELECT count(*) AS c, sum(p.amount) AS s "
            "FROM socios s JOIN pagos p ON s.k = p.k",
        ]) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        r = out["result"]
        assert set(r["views"]) == {"socios", "pagos"}
        # 29 rows: the MOR view dropped the tombstoned key before the join.
        assert r["rows"][0]["c"] == 29
        assert r["rows"][0]["s"] == sum(i * 10 for i in range(30)) - 70

        # The surface is read-only: DDL/DML heads are rejected loudly.
        import pytest

        with pytest.raises(ValueError, match="read-only SQL surface"):
            main(["sql", "--warehouse", wh, "--query", "DROP VIEW socios"])

    def test_sql_generation_pinned_via_cli(self, spark, tmp_path, capsys):
        import json
        import os

        from presencia_etl_spark.__main__ import main
        from presencia_etl_spark.plans.generations import record_generation
        from presencia_etl_spark.sinks import mor

        wh = str(tmp_path / "wh")
        os.makedirs(wh)
        for step in (1, 2):
            df = spark.createDataFrame(
                [(i, f"v{step}") for i in range(10)], ["k", "v"]
            )
            mor.merge_upsert_mor(spark, df, f"{wh}/ta", ["k"], num_buckets=2,
                                 compact_every=None)
            record_generation(spark, wh)
        assert main([
            "sql", "--warehouse", wh, "--generation", "1", "--query",
            "SELECT DISTINCT v FROM ta",
        ]) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert [r["v"] for r in out["result"]["rows"]] == ["v1"]


class TestParallelTableSync:
    def test_parallel_equals_sequential(self, spark, tmp_path):
        """Concurrent table syncs (max_parallel=4) must land byte-for-byte
        the same warehouse as the sequential loop — distinct targets,
        per-target writer locks, no cross-table coupling."""
        from presencia_etl_spark.plans.full_sync import full_sync
        from presencia_etl_spark.plans.incremental_sync import incremental_sync
        from presencia_etl_spark.sources.registry import TableConfig

        tables = {
            f"t{i}": spark.createDataFrame(
                [(str(j), f"v{i}_{j % 3}") for j in range(50)], ["K", "V"]
            )
            for i in range(6)
        }
        configs = {n: TableConfig(n, key_cols=["K"]) for n in tables}

        whs = {}
        for mode, par in (("seq", 1), ("par", 4)):
            wh = str(tmp_path / mode)
            c = full_sync(spark, tables, configs, wh, max_parallel=par)
            assert sum(c.values()) == 300
            mutated = dict(tables)
            mutated["t2"] = tables["t2"].withColumn(
                "V",
                F.when(F.col("K") == "7", F.lit("mut")).otherwise(F.col("V")),
            )
            r = incremental_sync(spark, mutated, configs, wh, max_parallel=par)
            assert r["t2"]["update"] == 1
            assert sum(v["insert"] + v["update"] for k, v in r.items() if k != "t2") == 0
            whs[mode] = wh

        for n in tables:
            a = {
                (row["K"], row["V"], row["row_hash"])
                for row in spark.read.parquet(f"{whs['seq']}/{n}").collect()
            }
            b = {
                (row["K"], row["V"], row["row_hash"])
                for row in spark.read.parquet(f"{whs['par']}/{n}").collect()
            }
            assert a == b


class TestSqlReadOnlyGuard:
    def test_with_prefixed_dml_is_rejected_before_execution(
        self, spark, tmp_path
    ):
        """Spark's grammar allows a CTE prefix on DML — `WITH x AS (...)
        INSERT OVERWRITE DIRECTORY ...` passes a head-keyword check and
        would EXECUTE on spark.sql(). The surface must reject it at parse
        time, before anything runs."""
        import os

        from presencia_etl_spark.sinks.writers import merge_upsert_parquet
        from presencia_etl_spark.sql import run_sql

        wh = str(tmp_path / "wh")
        os.makedirs(wh)
        merge_upsert_parquet(
            spark, spark.createDataFrame([(1, "a")], ["k", "v"]), f"{wh}/t", ["k"]
        )
        victim = str(tmp_path / "escape_target")
        stmt = (
            "WITH x AS (SELECT 1 AS a) "
            f"INSERT OVERWRITE DIRECTORY '{victim}' USING parquet "
            "SELECT * FROM x"
        )
        with pytest.raises(ValueError, match="read-only SQL surface"):
            run_sql(spark, wh, stmt)
        assert not os.path.exists(victim)  # nothing executed

        # Plain CTE SELECTs still pass.
        out = run_sql(
            spark, wh, "WITH c AS (SELECT k FROM t) SELECT count(*) AS n FROM c"
        )
        assert out["rows"] == [{"n": 1}]
        # Other DML/DDL shapes are rejected too.
        for bad in (
            "INSERT INTO t VALUES (2, 'b')",
            "DROP VIEW t",
            "CREATE TABLE zz (a INT)",
        ):
            with pytest.raises(ValueError, match="read-only SQL surface"):
                run_sql(spark, wh, bad)

    def test_multi_statement_and_expression_escapes(self, spark, tmp_path):
        """The remaining SELECT-shaped escapes: a second statement behind a
        `;` (Spark's parser takes ONE statement — the guard surfaces that
        as its own ValueError, nothing executed), reflect()/java_method()
        (arbitrary JVM calls on executors), and path-based / qualified
        relation refs that read outside the registered views. A `;` INSIDE
        a string literal and identifiers merely NAMED reflect stay legal."""
        import os

        from presencia_etl_spark.sinks.writers import merge_upsert_parquet
        from presencia_etl_spark.sql import run_sql

        wh = str(tmp_path / "wh")
        os.makedirs(wh)
        merge_upsert_parquet(
            spark, spark.createDataFrame([(1, "a")], ["k", "v"]), f"{wh}/t", ["k"]
        )
        run_sql(spark, wh, "SELECT 1 AS one")  # view `t` now registered
        pwned = str(tmp_path / "pwned")
        for bad in (
            "SELECT 1; DROP VIEW t",
            "SELECT reflect('java.lang.System','getProperty','user.dir') AS x",
            "SELECT Java_Method('java.lang.Thread','sleep',1) AS x",
            "WITH c AS (SELECT try_reflect('a','b') AS x) SELECT x FROM c",
            "SELECT * FROM parquet.`/etc/hostname`",
            "SELECT * FROM global_temp.t",
            # Hive script transform: runs a shell command on executors.
            f"SELECT TRANSFORM(k) USING 'touch {pwned}' AS (o STRING) FROM t",
            # IDENTIFIER() defers name resolution past the parse-time
            # gate: a smuggled reflect() call / path-based relation
            # carries none of the tokens the other checks match.
            "SELECT IDENTIFIER('reflect')"
            "('java.lang.System','getProperty','user.dir') AS x",
            "SELECT * FROM IDENTIFIER('parquet.`/etc/hostname`')",
        ):
            with pytest.raises(ValueError, match="read-only SQL surface"):
                run_sql(spark, wh, bad)
        assert spark.catalog.tableExists("t")  # the DROP never ran
        assert not os.path.exists(pwned)  # the TRANSFORM shell never ran
        # Positive cases: `;` inside a literal, and reflect as a NAME.
        out = run_sql(spark, wh, "SELECT 'a;b' AS s")
        assert out["rows"] == [{"s": "a;b"}]
        out = run_sql(
            spark, wh,
            "WITH reflect AS (SELECT k AS java_method FROM t) "
            "SELECT java_method FROM reflect",
        )
        assert out["rows"] == [{"java_method": 1}]

    def test_pinned_registration_drops_stale_late_table_view(
        self, spark, tmp_path
    ):
        """A view registered at current state by an earlier UNPINNED
        registration must not survive a pinned registration that excludes
        the table — the long-running-server scenario."""
        import os

        from presencia_etl_spark.plans.generations import record_generation
        from presencia_etl_spark.sinks import mor
        from presencia_etl_spark.sql import register_state_views

        wh = str(tmp_path / "wh")
        os.makedirs(wh)
        df = spark.createDataFrame([(1, "x")], ["k", "v"])
        mor.merge_upsert_mor(spark, df, f"{wh}/ta", ["k"], num_buckets=2,
                             compact_every=None)
        record_generation(spark, wh)  # gen 1 pins only ta
        mor.merge_upsert_mor(spark, df, f"{wh}/late", ["k"], num_buckets=2,
                             compact_every=None)

        register_state_views(spark, wh)  # unpinned: 'late' registered
        assert spark.sql("SELECT count(*) c FROM late").collect()[0]["c"] == 1
        register_state_views(spark, wh, generation=1)  # pinned: excluded
        with pytest.raises(Exception, match="TABLE_OR_VIEW_NOT_FOUND|late"):
            spark.sql("SELECT * FROM late").collect()

    def test_reregistration_retires_views_of_deleted_dirs(
        self, spark, tmp_path
    ):
        """A view for a state dir that vanished between registrations
        (dropped table, external cleanup) must not survive re-registration
        serving a deleted snapshot's listing."""
        import os
        import shutil

        from presencia_etl_spark.sinks.writers import merge_upsert_parquet
        from presencia_etl_spark.sql import register_state_views

        wh = str(tmp_path / "wh")
        os.makedirs(wh)
        df = spark.createDataFrame([(1, "x")], ["k", "v"])
        merge_upsert_parquet(spark, df, f"{wh}/keepme", ["k"])
        merge_upsert_parquet(spark, df, f"{wh}/dropme", ["k"])
        register_state_views(spark, wh)
        assert spark.sql("SELECT count(*) c FROM dropme").collect()[0]["c"] == 1

        shutil.rmtree(f"{wh}/dropme")
        views = register_state_views(spark, wh)
        assert set(views) == {"keepme"}
        with pytest.raises(Exception, match="TABLE_OR_VIEW_NOT_FOUND|dropme"):
            spark.sql("SELECT * FROM dropme").collect()
