"""Salting correctness (vs plain aggregation/join) and IVF ANN recall."""

from __future__ import annotations

from pyspark.sql import functions as F

from presencia_etl_spark.operators import similarity
from presencia_etl_spark.operators.skew import (
    choose_join_strategy,
    salted_agg,
    salted_join,
    skew_aware_join,
)


class TestSalting:
    def test_salted_agg_matches_plain(self, spark):
        # 90% of rows share one hot key.
        df = spark.range(0, 10_000).select(
            F.when(F.col("id") % 10 != 0, F.lit("HOT"))
            .otherwise(F.col("id").cast("string"))
            .alias("k"),
            (F.col("id") % 97).alias("x"),
        )
        plain = {
            r["k"]: (r["cnt"], r["s"], r["mx"])
            for r in df.groupBy("k")
            .agg(F.count(F.lit(1)).alias("cnt"), F.sum("x").alias("s"), F.max("x").alias("mx"))
            .collect()
        }
        salted = {
            r["k"]: (r["cnt"], r["s"], r["mx"])
            for r in salted_agg(
                df, "k", {"cnt": ("count", "*"), "s": ("sum", "x"), "mx": ("max", "x")}
            ).collect()
        }
        assert salted == plain

    def test_salted_join_matches_plain(self, spark):
        big = spark.range(0, 5_000).select(
            F.when(F.col("id") % 5 != 0, F.lit(1)).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("v"),
        )
        small = spark.range(0, 100).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        plain = big.join(small, "k").agg(
            F.count(F.lit(1)).alias("n"), F.sum(F.col("v") + F.col("w")).alias("s")
        ).collect()[0]
        salted = salted_join(big, small, "k").agg(
            F.count(F.lit(1)).alias("n"), F.sum(F.col("v") + F.col("w")).alias("s")
        ).collect()[0]
        assert (salted["n"], salted["s"]) == (plain["n"], plain["s"])

    def test_auto_trigger_selects_salting_only_on_skew(self, spark):
        hot = spark.range(0, 5_000).select(
            F.when(F.col("id") % 10 != 0, F.lit(1)).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("v"),
        )
        uniform = spark.range(0, 5_000).select(
            (F.col("id") % 500).alias("k"), F.col("id").alias("v")
        )
        assert choose_join_strategy(hot, "k", sample_fraction=1.0) == "salted"
        assert choose_join_strategy(uniform, "k", sample_fraction=1.0) == "plain"

    def test_skew_aware_join_matches_plain_both_routes(self, spark):
        small = spark.range(0, 100).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        for big in (
            spark.range(0, 5_000).select(  # hot: 90% of rows on k=1
                F.when(F.col("id") % 5 != 0, F.lit(1)).otherwise(F.col("id")).alias("k"),
                F.col("id").alias("v"),
            ),
            spark.range(0, 5_000).select(  # uniform
                (F.col("id") % 100).alias("k"), F.col("id").alias("v")
            ),
        ):
            plain = big.join(small, "k").agg(
                F.count(F.lit(1)).alias("n"), F.sum(F.col("v") + F.col("w")).alias("s")
            ).collect()[0]
            auto = skew_aware_join(big, small, "k", sample_fraction=1.0).agg(
                F.count(F.lit(1)).alias("n"), F.sum(F.col("v") + F.col("w")).alias("s")
            ).collect()[0]
            assert (auto["n"], auto["s"]) == (plain["n"], plain["s"])


class TestIVF:
    def test_ivf_recall_vs_exact(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        queries = emb.filter(F.col("vec_id") < 10)
        exact = similarity.cosine_topk(emb, queries, k=3)
        approx = similarity.ivf_topk(emb, queries, k=3, n_clusters=8, n_probe=4)
        e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
        a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
        recall = len(e & a) / len(e)
        # probing half the clusters on isotropic data ≈ half the corpus.
        assert recall >= 0.4, f"IVF recall too low: {recall}"

    def test_ivf_index_persist_roundtrip(self, spark, sf_dir, tmp_path):
        """A saved index (posting lists == cluster= partition dirs) reused
        via index= must reproduce the on-the-fly result exactly."""
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        queries = emb.filter(F.col("vec_id") < 10)
        direct = similarity.ivf_topk(emb, queries, k=3, n_clusters=8, n_probe=4)

        assigned, centroids = similarity.build_ivf_index(emb, n_clusters=8)
        path = str(tmp_path / "ivf_index")
        similarity.save_ivf_index(assigned, path)
        # Posting lists ARE the partition layout: one cluster= dir each.
        import os

        cluster_dirs = [d for d in os.listdir(path) if d.startswith("cluster=")]
        assert len(cluster_dirs) >= 2, cluster_dirs

        loaded = similarity.load_ivf_index(spark, path)
        via_index = similarity.ivf_topk(
            emb, queries, k=3, n_probe=4, index=(loaded, centroids)
        )
        d = {(r["query_id"], r["neighbor_id"], r["rk"]) for r in direct.collect()}
        i = {(r["query_id"], r["neighbor_id"], r["rk"]) for r in via_index.collect()}
        assert d == i

    def test_ivf_assign_probe_list_shape(self, spark):
        """Query-side probe assignment is distributed (array<int> column),
        deterministic, and returns the n_probe nearest distinct clusters."""
        cents = [[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]]
        df = spark.createDataFrame(
            [(1, [0.1, 0.2]), (2, [9.0, 1.0]), (3, [1.0, 9.0])], ["vec_id", "v"]
        ).withColumn("v", F.col("v").cast("array<float>"))
        out = {
            r["vec_id"]: r["p"]
            for r in similarity.ivf_assign(df, cents, "v", out="p", n_probe=2).collect()
        }
        assert out[1][0] == 0 and out[2][0] == 1 and out[3][0] == 2
        assert all(len(v) == 2 and len(set(v)) == 2 for v in out.values())


class TestIvfIncremental:
    def test_self_describing_index_and_incremental_add(self, spark, sf_dir, tmp_path):
        """Centroids persist with the index (_ivf_meta.json): a fresh
        session queries without re-fitting, update_ivf_index appends new
        vectors assigned against the STORED centroids, and the new
        vectors are findable afterward."""
        import os

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        history = emb.filter(F.col("vec_id") % 10 != 0)
        newbies = emb.filter(F.col("vec_id") % 10 == 0)
        assigned, centroids = similarity.build_ivf_index(history, n_clusters=8)
        path = str(tmp_path / "ivf")
        similarity.save_ivf_index(assigned, path, centroids=centroids)
        assert os.path.exists(f"{path}/_ivf_meta.json")
        assert similarity.load_ivf_centroids(path) == centroids

        added = similarity.update_ivf_index(spark, newbies, path)
        assert added == newbies.count()

        # A query identical to an added vector must find it at rank 1.
        probe_id = newbies.select("vec_id").first()["vec_id"]
        q = emb.filter(F.col("vec_id") == probe_id).select(
            (F.col("vec_id") + 10**6).alias("vec_id"), "embedding"
        )
        top = similarity.query_ivf_index(spark, q, path, k=1, n_probe=2)
        assert top.collect()[0]["neighbor_id"] == probe_id

    def test_compact_preserves_ivf_meta(self, spark, sf_dir, tmp_path):
        """compact_parquet's staged swap must carry the _ivf_meta.json
        sidecar (the centroid store) across the rewrite."""
        import os

        from presencia_etl_spark.sinks.writers import compact_parquet

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        assigned, centroids = similarity.build_ivf_index(emb, n_clusters=4)
        path = str(tmp_path / "ivf")
        similarity.save_ivf_index(assigned, path, centroids=centroids)
        # Accrete files via a few incremental adds.
        for i in range(3):
            similarity.update_ivf_index(
                spark, emb.filter(F.col("vec_id") % 7 == i), path
            )
        r = compact_parquet(spark, path, target_file_mb=64)
        assert r["files_after"] < r["files_before"]
        assert os.path.exists(f"{path}/_ivf_meta.json")
        assert similarity.load_ivf_centroids(path) == centroids


class TestLshPersistedIndex:
    def test_index_matches_one_shot_and_supports_adds(self, spark, sf_dir, tmp_path):
        """The persisted LSH index (same planes, same bucketing) must
        reproduce the one-shot lsh_topk exactly; incremental adds bucket
        against the stored parameters and become findable."""
        import os

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        history = emb.filter(F.col("vec_id") % 10 != 0)
        queries = emb.filter(F.col("vec_id") < 5)
        path = str(tmp_path / "lsh")
        similarity.save_lsh_index(spark, history, path, n_planes=8, n_tables=8)
        assert os.path.exists(f"{path}/_lsh_meta.json")
        assert len([d for d in os.listdir(path) if d.startswith("tbl=")]) == 8

        direct = similarity.lsh_topk(
            history, queries, k=3, n_planes=8, n_tables=8, multiprobe=True
        )
        via_index = similarity.query_lsh_index(spark, queries, path, k=3)
        d = {(r["query_id"], r["neighbor_id"], r["rk"]) for r in direct.collect()}
        i = {(r["query_id"], r["neighbor_id"], r["rk"]) for r in via_index.collect()}
        assert d == i

        newbies = emb.filter(F.col("vec_id") % 10 == 0)
        assert similarity.update_lsh_index(spark, newbies, path) == newbies.count()
        probe_id = newbies.select("vec_id").first()["vec_id"]
        q = emb.filter(F.col("vec_id") == probe_id).select(
            (F.col("vec_id") + 10**6).alias("vec_id"), "embedding"
        )
        top = similarity.query_lsh_index(spark, q, path, k=1)
        assert top.collect()[0]["neighbor_id"] == probe_id
