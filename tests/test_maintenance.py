"""Maintenance policy (sinks/maintenance): fs-metadata inspection, the
compact + seed-digest policy, and the explicit sidecar seed that moves
the scan-path cost off the first incremental sync."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from presencia_etl_spark.operators import cdc
from presencia_etl_spark.sinks import digest_store, maintenance, mor
from presencia_etl_spark.sinks.writers import merge_upsert_parquet
from presencia_etl_spark.sql import read_state


def _src(spark, n=200, salt="0"):
    return spark.range(0, n).select(
        F.col("id").cast("string").alias("K"),
        F.concat(F.lit(salt), (F.col("id") % 7).cast("string")).alias("V"),
    )


class TestInspect:
    def test_mor_report_is_fs_metadata_only(self, spark, tmp_path):
        t = str(tmp_path / "t")
        mor.merge_upsert_mor(spark, _src(spark), t, ["K"], num_buckets=8,
                             compact_every=None)
        mor.merge_upsert_mor(spark, _src(spark, salt="1", n=205), t, ["K"],
                             compact_every=None)
        r = maintenance.inspect_state(t)
        assert r["layout"] == "mor"
        assert r["live_deltas"] == 1 and r["seq"] == 1
        assert r["delta_bytes"] > 0
        assert r["sidecar"] in ("valid", "stale", "absent")

    def test_flat_report(self, spark, tmp_path):
        t = str(tmp_path / "flat")
        merge_upsert_parquet(spark, _src(spark, 50), t, ["K"])
        r = maintenance.inspect_state(t)
        assert r["layout"] in ("flat", "bucketed")
        assert "live_deltas" not in r


class TestSeedDigest:
    def test_seed_matches_scan_and_fast_syncs_next_merge(self, spark, tmp_path):
        t = str(tmp_path / "t")
        # ONE merge: state exists, sidecar not yet seeded
        mor.merge_upsert_mor(spark, _src(spark), t, ["K"], num_buckets=8,
                             compact_every=None)
        assert maintenance.sidecar_status(t) == "absent"
        r = maintenance.seed_digest(spark, t)
        assert r["seeded"] and r["rows"] == 200
        side = digest_store.load(t)
        assert side is not None
        assert side == cdc.state_digest(read_state(spark, t))
        # the very next no-change sync is digest-proven (all skips,
        # nothing written)
        m = mor.merge_upsert_mor(spark, _src(spark), t, ["K"],
                                 compact_every=None)
        assert m["skip"] == 200 and m["delta_files"] == 0

    def test_seed_noop_when_valid(self, spark, tmp_path):
        t = str(tmp_path / "t")
        mor.merge_upsert_mor(spark, _src(spark), t, ["K"], compact_every=None)
        maintenance.seed_digest(spark, t)
        r = maintenance.seed_digest(spark, t)
        assert r == {"seeded": False, "sidecar": "valid"}

    def test_seed_flat_layout(self, spark, tmp_path):
        t = str(tmp_path / "flat")
        merge_upsert_parquet(spark, _src(spark, 80), t, ["K"])
        if maintenance.sidecar_status(t) == "valid":
            # the COW merge may have seeded it already — force staleness
            os.utime(t)  # no-op for content; rewrite a data file instead
            import glob

            f = glob.glob(os.path.join(t, "**", "*.parquet"), recursive=True)[0]
            os.utime(f)
        # regardless of the path above, a stale/absent sidecar seeds
        if maintenance.sidecar_status(t) != "valid":
            r = maintenance.seed_digest(spark, t)
            assert r["seeded"]
        assert digest_store.load(t) == cdc.state_digest(read_state(spark, t))


class TestMaintainPolicy:
    def _deep(self, spark, tmp_path, n_deltas=4):
        t = str(tmp_path / "deep")
        mor.merge_upsert_mor(spark, _src(spark), t, ["K"], num_buckets=8,
                             compact_every=None)
        for i in range(n_deltas):
            mor.merge_upsert_mor(
                spark, _src(spark, salt=f"s{i}", n=200), t, ["K"],
                compact_every=None,
            )
        return t

    def test_dry_run_reports_without_acting(self, spark, tmp_path):
        t = self._deep(spark, tmp_path)
        seq0 = mor.mor_history(t)["seq"]
        r = maintenance.maintain(None, t, compact_threshold=3, dry_run=True)
        assert "compact" in r["would"] and r["actions"] == []
        assert mor.mor_history(t)["seq"] == seq0  # untouched

    def test_policy_compacts_and_seeds(self, spark, tmp_path):
        t = self._deep(spark, tmp_path)
        r = maintenance.maintain(spark, t, compact_threshold=3)
        names = [a["action"] for a in r["actions"]]
        assert "compact" in names
        assert mor.mor_history(t)["live_delta_seqs"] == []
        # post-maintenance the sidecar is valid (carried or seeded)
        assert maintenance.sidecar_status(t) == "valid"

    def test_nothing_to_do_never_needs_spark(self, spark, tmp_path):
        t = str(tmp_path / "ok")
        mor.merge_upsert_mor(spark, _src(spark), t, ["K"], compact_every=None)
        maintenance.seed_digest(spark, t)
        # spark=None proves the noop pass touches no session
        r = maintenance.maintain(None, t, compact_threshold=3)
        assert r["actions"] == [] and r["would"] == []


class TestCli:
    def test_maintain_subcommand(self, spark, tmp_path, capsys):
        import json as _json

        from presencia_etl_spark.__main__ import main

        t = str(tmp_path / "t")
        mor.merge_upsert_mor(spark, _src(spark), t, ["K"], num_buckets=8,
                             compact_every=None)
        for i in range(3):
            mor.merge_upsert_mor(
                spark, _src(spark, salt=f"c{i}", n=200), t, ["K"],
                compact_every=None,
            )
        assert main(["maintain", "--target", t, "--compact-threshold", "3",
                     "--dry-run"]) == 0
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["result"]["would"] == ["compact", "seed_digest"] or (
            "compact" in out["result"]["would"]
        )
        assert main(["maintain", "--target", t, "--compact-threshold", "3"]) == 0
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert any(a["action"] == "compact" for a in out["result"]["actions"])
        assert mor.mor_history(t)["live_delta_seqs"] == []
