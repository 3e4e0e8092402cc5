"""HTTP control plane: the reference server.py trigger surface, end-to-end
against a live (ephemeral-port) server sharing the test SparkSession."""

from __future__ import annotations

import json
import os
import urllib.error
import urllib.request

import pytest
from pyspark.sql import functions as F

from presencia_etl_spark.server import _start_background


def _get(url: str):
    try:
        with urllib.request.urlopen(url, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture(scope="module")
def server(spark, tmp_path_factory):
    # Fence /run/clean to the pytest temp root — every per-test tmp_path
    # lives under it, so in-fence cleans succeed and anything else is 403.
    root = tmp_path_factory.getbasetemp()
    srv, base = _start_background(spark, warehouse_root=str(root))
    yield base
    srv.shutdown()


@pytest.fixture(scope="module")
def unfenced_server(spark):
    srv, base = _start_background(spark)  # no warehouse_root
    yield base
    srv.shutdown()


class TestControlPlane:
    def test_catalog_and_health(self, server):
        code, body = _get(f"{server}/")
        assert code == 200 and body["status"] == "online"
        assert "/run/full-sync" in body["endpoints"]
        code, body = _get(f"{server}/health")
        assert code == 200 and body["status"] == "ok"

    def test_full_then_incremental_then_clean(self, spark, server, tmp_path):
        src = tmp_path / "src"
        src.mkdir()
        spark.range(0, 200).select(
            F.col("id").cast("string").alias("K"), (F.col("id") % 5).alias("V")
        ).write.parquet(str(src / "widgets.parquet"))
        target = tmp_path / "wh"

        code, body = _get(
            f"{server}/run/full-sync?source={src}&target={target}&key=K"
        )
        assert code == 200 and body["status"] == "ok", body
        assert spark.read.parquet(f"{target}/widgets").count() == 200

        code, body = _get(
            f"{server}/run/incremental?source={src}&target={target}&key=K"
        )
        assert code == 200 and body["status"] == "ok", body
        widgets = body["result"]["widgets"]
        assert widgets["insert"] == 0 and widgets["update"] == 0

        code, body = _get(f"{server}/run/clean?target={target}")
        assert code == 200 and body["status"] == "ok"
        import os

        assert not os.path.exists(str(target))

    def test_incremental_mor_param(self, spark, server, tmp_path):
        """&mor=1 routes the sync through the merge-on-read state."""
        from presencia_etl_spark.sinks.mor import read_mor

        src = tmp_path / "src"
        src.mkdir()
        spark.range(0, 100).select(
            F.col("id").cast("string").alias("K"), (F.col("id") % 5).alias("V")
        ).write.parquet(str(src / "gadgets.parquet"))
        target = tmp_path / "whm"
        code, body = _get(
            f"{server}/run/incremental?source={src}&target={target}&key=K&mor=1"
        )
        assert code == 200 and body["status"] == "ok", body
        assert body["result"]["gadgets"]["mode"] == "incremental_mor"
        assert read_mor(spark, f"{target}/gadgets").count() == 100

    def test_missing_params_is_400(self, server):
        code, body = _get(f"{server}/run/full-sync")
        assert code == 400 and body["status"] == "error"

    def test_pipeline_failure_is_500_json(self, server, tmp_path):
        empty = tmp_path / "empty"
        empty.mkdir()
        code, body = _get(
            f"{server}/run/full-sync?source={empty}&target={tmp_path}/t"
        )
        assert code == 500 and body["status"] == "error"
        assert "no <table>.parquet" in body["error"]

    def test_unknown_path_is_404(self, server):
        code, body = _get(f"{server}/nope")
        assert code == 404 and body["status"] == "error"

    def test_clean_outside_root_is_403(self, server, tmp_path):
        victim = tmp_path / "keepme"
        victim.mkdir()
        # Absolute path outside the fence.
        code, body = _get(f"{server}/run/clean?target=/root/repo/presencia_etl_spark")
        assert code == 403 and "outside the warehouse root" in body["error"]
        # Traversal out of an in-fence prefix resolves outside → rejected.
        code, body = _get(f"{server}/run/clean?target={tmp_path}/../../../../etc")
        assert code == 403 and body["status"] == "error"
        assert victim.exists()

    def test_clean_disabled_without_root(self, unfenced_server, tmp_path):
        victim = tmp_path / "keepme2"
        victim.mkdir()
        code, body = _get(f"{unfenced_server}/run/clean?target={victim}")
        assert code == 403 and "disabled" in body["error"]
        assert victim.exists()


class TestDeleteAndHistoryEndpoints:
    def test_run_delete_fenced_and_routed(self, spark, server, tmp_path):
        from presencia_etl_spark.sinks import mor

        target = str(tmp_path / "mor")
        df = spark.createDataFrame(
            [(i, f"n{i}") for i in range(30)], ["k", "name"]
        )
        mor.merge_upsert_mor(spark, df, target, ["k"], num_buckets=4)

        code, out = _get(f"{server}/run/delete?target={target}&where=k%20%3C%205")
        assert code == 200 and out["result"]["kind"] == "mor"
        assert out["result"]["delete"] == 5
        assert mor.read_mor(spark, target).count() == 25

        # TTL form needs date_col.
        code, out = _get(f"{server}/run/delete?target={target}&retain_days=30")
        assert code == 400
        # Outside the fence → 403, nothing deleted.
        code, out = _get(f"{server}/run/delete?target=/etc&where=1%3D1")
        assert code == 403

    def test_state_history_endpoint(self, spark, server, tmp_path):
        import os

        from presencia_etl_spark.plans.generations import record_generation
        from presencia_etl_spark.sinks import mor

        wh = str(tmp_path / "wh")
        os.makedirs(wh)
        df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
        mor.merge_upsert_mor(spark, df, f"{wh}/t", ["k"], num_buckets=2)
        record_generation(spark, wh)

        code, out = _get(f"{server}/state/history?target={wh}/t")
        assert code == 200 and out["result"]["mor"]["seq"] == 0

        code, out = _get(f"{server}/state/history?target={wh}")
        assert code == 200
        assert out["result"]["generations"][0]["tables"]["t"]["kind"] == "mor"


class TestSqlEndpoint:
    def test_sql_endpoint_reads_warehouse(self, spark, server, tmp_path):
        import urllib.parse

        from presencia_etl_spark.sinks import mor

        wh = str(tmp_path / "wh")
        os.makedirs(wh)
        df = spark.createDataFrame([(i, i * 2) for i in range(12)], ["k", "v"])
        mor.merge_upsert_mor(spark, df, f"{wh}/tbl", ["k"], num_buckets=2)
        q = urllib.parse.urlencode(
            {"q": "SELECT sum(v) AS s FROM tbl", "warehouse": wh}
        )
        code, body = _get(f"{server}/sql?{q}")
        assert code == 200 and body["status"] == "ok"
        assert body["result"]["rows"] == [{"s": sum(i * 2 for i in range(12))}]

        # Mutating statements are rejected with the 500 error envelope.
        q = urllib.parse.urlencode({"q": "DROP VIEW tbl", "warehouse": wh})
        code, body = _get(f"{server}/sql?{q}")
        assert code == 500 and "read-only" in body["error"]

        # Missing q is a 400.
        code, body = _get(f"{server}/sql?warehouse={wh}")
        assert code == 400
