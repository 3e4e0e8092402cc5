"""Semantic dedup (operators/semdedup): planted near-duplicate recovery,
min-id winner selection, determinism under repartitioning, and the
oversized-cluster salt-split cap."""

from __future__ import annotations

import random

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StructField,
    StructType,
)

from presencia_etl_spark.operators import semdedup

SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)

DIM = 16


def _unit(rng):
    v = [rng.gauss(0, 1) for _ in range(DIM)]
    n = sum(x * x for x in v) ** 0.5
    return [x / n for x in v]


def _perturb(v, rng, eps=0.01):
    w = [x + rng.gauss(0, eps) for x in v]
    n = sum(x * x for x in w) ** 0.5
    return [x / n for x in w]


def _corpus(spark, n_base=60, dup_groups=10, dups_per=3, seed=5):
    """n_base independent random unit vectors (pairwise cosine ~ 0 at
    DIM=16 w.h.p. — far below threshold) + dup_groups neighborhoods of
    near-identical copies. Returns (df, expected_kept_ids)."""
    rng = random.Random(seed)
    rows, expected = [], set()
    nid = 0
    for _ in range(n_base):
        rows.append((nid, _unit(rng)))
        expected.add(nid)
        nid += 1
    for _ in range(dup_groups):
        base = _unit(rng)
        group = []
        for _ in range(dups_per):
            rows.append((nid, _perturb(base, rng)))
            group.append(nid)
            nid += 1
        expected.add(min(group))  # min id wins its neighborhood
    return spark.createDataFrame(rows, SCHEMA), expected


class TestSemanticDedup:
    def test_planted_duplicates_removed_min_id_kept(self, spark):
        df, expected = _corpus(spark)
        kept = semdedup.semantic_dedup(
            df, threshold=0.9, n_clusters=8, seed=42
        )
        got = {r["vec_id"] for r in kept.select("vec_id").collect()}
        # Every duplicate neighborhood collapsed to its min id; all the
        # independent vectors survive.
        assert got == expected
        assert kept.columns == ["vec_id", "embedding"]

    def test_flags_mark_dropped_rows(self, spark):
        df, expected = _corpus(spark)
        flagged = semdedup.semantic_dedup_flags(
            df, threshold=0.9, n_clusters=8, seed=42
        )
        assert flagged.count() == df.count()  # nothing lost, only marked
        kept = {
            r["vec_id"]
            for r in flagged.filter(F.col(semdedup.KEEP_COL)).collect()
        }
        assert kept == expected

    def test_deterministic_under_repartition(self, spark):
        df, _ = _corpus(spark, seed=9)
        a = semdedup.semantic_dedup(df.repartition(13), threshold=0.9,
                                    n_clusters=8)
        b = semdedup.semantic_dedup(df.coalesce(1), threshold=0.9,
                                    n_clusters=8)
        ids = lambda d: sorted(r["vec_id"] for r in d.select("vec_id").collect())
        assert ids(a) == ids(b)

    def test_identical_vectors_collapse_at_any_threshold(self, spark):
        rng = random.Random(3)
        v = _unit(rng)
        df = spark.createDataFrame([(i, v) for i in range(10)], SCHEMA)
        kept = semdedup.semantic_dedup(df, threshold=1.0, n_clusters=2)
        assert [r["vec_id"] for r in kept.collect()] == [0]

    def test_oversized_cluster_salt_split_bounds_groups(self, spark):
        """With max_cluster=8 a 30-row duplicate pile splits into shards;
        each shard still dedups internally (≥1 survivor per shard, far
        fewer than 30 total) and the result stays deterministic."""
        rng = random.Random(11)
        base = _unit(rng)
        rows = [(i, _perturb(base, rng)) for i in range(30)]
        df = spark.createDataFrame(rows, SCHEMA)
        kept1 = semdedup.semantic_dedup(
            df, threshold=0.9, n_clusters=2, max_cluster=8
        )
        kept2 = semdedup.semantic_dedup(
            df.repartition(7), threshold=0.9, n_clusters=2, max_cluster=8
        )
        ids1 = sorted(r["vec_id"] for r in kept1.collect())
        ids2 = sorted(r["vec_id"] for r in kept2.collect())
        assert ids1 == ids2
        # ≤ 1 survivor per (cluster, salt shard): 2 clusters × ceil(30/8)
        # shards = 8 worst case, far below the 30 inputs.
        assert 1 <= len(ids1) <= 8

    def test_zero_vectors_always_kept(self, spark):
        rng = random.Random(13)
        rows = [(0, [0.0] * DIM), (1, [0.0] * DIM), (2, _unit(rng))]
        df = spark.createDataFrame(rows, SCHEMA)
        kept = semdedup.semantic_dedup(df, threshold=0.5, n_clusters=1)
        assert {r["vec_id"] for r in kept.collect()} == {0, 1, 2}

    def test_shared_centroids_reuse(self, spark):
        from presencia_etl_spark.operators.similarity import ivf_fit_centroids

        df, expected = _corpus(spark, seed=21)
        cents = ivf_fit_centroids(df, n_clusters=8)
        kept = semdedup.semantic_dedup(
            df, threshold=0.9, centroids=cents
        )
        assert {r["vec_id"] for r in kept.collect()} == expected
