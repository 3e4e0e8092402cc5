"""Sequence packing: budget compliance, determinism, oversize handling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from presencia_etl_spark.operators.packing import pack_sequences, pack_stats


@pytest.fixture(scope="module")
def corpus(spark):
    # 500 docs, token counts 1..200 in a deterministic pattern.
    return spark.range(0, 500).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 37) % 200 + 1).alias("n_tokens"),
    )


class TestPackSequences:
    def test_every_doc_assigned_once_and_budget_held(self, corpus):
        packed = pack_sequences(corpus, "doc_id", "n_tokens", budget=512)
        rows = packed.collect()
        assert len(rows) == 500
        assert len({r["doc_id"] for r in rows}) == 500
        sums = (
            packed.groupBy("pack_id")
            .agg(F.sum("n_tokens").alias("t"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        for r in sums:
            # Multi-doc packs must respect the budget; only a single
            # over-budget doc may exceed it.
            assert r["t"] <= 512 or r["n"] == 1

    def test_deterministic_across_partitioning(self, corpus):
        a = {
            r["doc_id"]: r["pack_id"]
            for r in pack_sequences(
                corpus.repartition(32), "doc_id", "n_tokens", 512
            ).collect()
        }
        b = {
            r["doc_id"]: r["pack_id"]
            for r in pack_sequences(
                corpus.coalesce(1), "doc_id", "n_tokens", 512
            ).collect()
        }
        assert a == b

    def test_oversized_doc_gets_own_pack(self, spark):
        df = spark.createDataFrame(
            [(1, 100), (2, 9000), (3, 100)], ["doc_id", "n_tokens"]
        )
        packed = pack_sequences(df, "doc_id", "n_tokens", budget=512)
        by_doc = {r["doc_id"]: r["pack_id"] for r in packed.collect()}
        assert by_doc[2] not in (by_doc[1], by_doc[3])

    def test_shards_pack_independently(self, spark):
        # Ids straddling a shard boundary never share a pack.
        df = spark.range(0, 200).select(
            F.col("id").alias("doc_id"), F.lit(10).alias("n_tokens")
        )
        packed = pack_sequences(df, "doc_id", "n_tokens", budget=10_000, shard_size=100)
        packs = packed.select("doc_id", "pack_id").collect()
        shard_of = {r["doc_id"]: r["pack_id"] >> 32 for r in packs}
        assert shard_of[99] == 0 and shard_of[100] == 1

    def test_fill_is_tight_and_stats_consistent(self, corpus):
        packed = pack_sequences(corpus, "doc_id", "n_tokens", budget=512)
        stats = pack_stats(packed, "n_tokens", 512).collect()[0]
        assert stats["n_docs"] == 500
        # Greedy in-order packing of ~100-token docs should fill well.
        assert stats["mean_fill"] > 0.7
        assert 0.0 <= stats["pad_waste_ratio"] < 0.3

    def test_budget_validation(self, corpus):
        with pytest.raises(ValueError, match="budget"):
            pack_sequences(corpus, "doc_id", "n_tokens", budget=0)

    def test_non_numeric_id_rejected(self, spark):
        df = spark.createDataFrame([("a", 10)], ["doc_id", "n_tokens"])
        with pytest.raises(TypeError, match="numeric id"):
            pack_sequences(df, "doc_id", "n_tokens", budget=512)
