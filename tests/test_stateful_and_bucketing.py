"""Cross-batch stateful streaming dedup (applyInPandasWithState) and the
bucketed co-located join layout (shuffle-free repeated joins at scale)."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from presencia_etl_spark.functions.hashing import with_row_hash
from presencia_etl_spark.streaming.stateful import streaming_dedup


class TestStreamingDedup:
    def test_dedup_across_batches(self, spark, tmp_path):
        src = str(tmp_path / "in")
        out_dir = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")

        def write_batch(rows):
            df = spark.createDataFrame(rows, ["k", "v"])
            with_row_hash(df, ["k", "v"]).write.mode("append").parquet(src)

        # Batch 1: two distinct rows + an in-batch duplicate.
        write_batch([("a", "1"), ("a", "1"), ("b", "2")])
        schema = with_row_hash(
            spark.createDataFrame([("x", "y")], ["k", "v"]), ["k", "v"]
        ).schema

        def drain():
            stream = spark.readStream.schema(schema).parquet(src)
            q = (
                streaming_dedup(stream, "k")
                .writeStream.format("parquet")
                .option("path", out_dir)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        drain()
        got1 = spark.read.parquet(out_dir).collect()
        assert sorted((r["k"], r["v"]) for r in got1) == [("a", "1"), ("b", "2")]

        # Batch 2: one replay of (a,1) — must be suppressed by STATE from
        # the previous micro-batch — plus one genuinely new row.
        write_batch([("a", "1"), ("a", "3")])
        drain()
        got2 = spark.read.parquet(out_dir).collect()
        assert sorted((r["k"], r["v"]) for r in got2) == [
            ("a", "1"),
            ("a", "3"),
            ("b", "2"),
        ]


class TestBucketedJoin:
    def test_bucketed_join_has_no_shuffle(self, spark, sf_dir):
        """Pre-bucketing both join sides on the key removes the per-query
        shuffle — the layout to use for repeated CDC joins at 100 TB."""
        suffix = uuid.uuid4().hex[:8]
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        t_o, t_l = f"orders_b_{suffix}", f"lineitem_b_{suffix}"
        (
            orders.write.format("parquet")
            .bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .saveAsTable(t_o)
        )
        (
            lineitem.write.format("parquet")
            .bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .saveAsTable(t_l)
        )
        old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            joined = spark.table(t_o).join(
                spark.table(t_l),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert joined.count() > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
            spark.sql(f"DROP TABLE IF EXISTS {t_o}")
            spark.sql(f"DROP TABLE IF EXISTS {t_l}")
