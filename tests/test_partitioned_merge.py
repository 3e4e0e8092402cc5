"""Partition-pruned merge: only dirty key-hash buckets get rewritten."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from presencia_etl_spark.sinks.writers import merge_upsert_partitioned


def _bucket_mtimes(path: str) -> dict[str, float]:
    out = {}
    for d in os.listdir(path):
        if d.startswith("_kb="):
            full = os.path.join(path, d)
            out[d] = max(
                os.path.getmtime(os.path.join(full, f)) for f in os.listdir(full)
            )
    return out


class TestPartitionedMerge:
    def test_create_idempotent_localized_update(self, spark, tmp_path):
        target = str(tmp_path / "state")
        src = spark.range(0, 2000).select(
            F.col("id").cast("string").alias("K"),
            (F.col("id") % 7).cast("string").alias("V"),
        )
        r = merge_upsert_partitioned(spark, src, target, ["K"], num_buckets=16)
        assert r["insert"] == 2000

        r = merge_upsert_partitioned(spark, src, target, ["K"], num_buckets=16)
        assert r == {"insert": 0, "update": 0, "skip": 2000, "buckets_rewritten": 0}

        before = _bucket_mtimes(target)
        # Mutate exactly ONE key → exactly one dirty bucket.
        mut = src.withColumn(
            "V", F.when(F.col("K") == "42", F.lit("CHANGED")).otherwise(F.col("V"))
        )
        r = merge_upsert_partitioned(spark, mut, target, ["K"], num_buckets=16)
        assert r["update"] == 1 and r["insert"] == 0
        assert r["buckets_rewritten"] == 1
        after = _bucket_mtimes(target)
        rewritten = [d for d in before if after[d] != before[d]]
        assert len(rewritten) == 1  # only the dirty bucket's files changed

        # State content correct + still idempotent afterwards.
        state = spark.read.parquet(target)
        assert state.count() == 2000
        assert state.filter(F.col("K") == "42").collect()[0]["V"] == "CHANGED"
        r = merge_upsert_partitioned(spark, mut, target, ["K"], num_buckets=16)
        assert r["update"] == 0 and r["insert"] == 0

    def test_inserts_and_updates_mixed(self, spark, tmp_path):
        target = str(tmp_path / "state")
        src = spark.range(0, 500).select(
            F.col("id").cast("string").alias("K"), F.lit("x").alias("V")
        )
        merge_upsert_partitioned(spark, src, target, ["K"], num_buckets=8)
        nxt = spark.range(0, 600).select(
            F.col("id").cast("string").alias("K"),
            F.when(F.col("id") < 10, F.lit("y")).otherwise(F.lit("x")).alias("V"),
        )
        r = merge_upsert_partitioned(spark, nxt, target, ["K"], num_buckets=8)
        assert r["insert"] == 100 and r["update"] == 10 and r["skip"] == 490
        state = spark.read.parquet(target)
        assert state.count() == 600
        ids = [row["id"] for row in state.select("id").collect()]
        assert len(ids) == len(set(ids))


class TestCompaction:
    def test_compact_after_many_appends(self, spark, tmp_path):
        from presencia_etl_spark.sinks.writers import compact_parquet

        path = str(tmp_path / "accreted")
        for i in range(12):
            spark.range(i * 100, (i + 1) * 100).repartition(4).write.mode(
                "append"
            ).parquet(path)
        before = spark.read.parquet(path)
        n_rows = before.count()
        assert n_rows == 1200

        r = compact_parquet(spark, path, target_file_mb=128)
        assert r["files_before"] >= 12
        assert r["files_after"] < r["files_before"]
        after = spark.read.parquet(path)
        assert after.count() == n_rows
        assert {x["id"] for x in after.collect()} == set(range(1200))
