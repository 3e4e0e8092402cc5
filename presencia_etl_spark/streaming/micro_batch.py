"""Micro-batch incremental sync — the Structured Streaming form of EP2.

The reference re-runs its batch CDC on a cron
(``context/context.md:687-697``). The Spark-native equivalent: a file-source
stream feeding each micro-batch through the SAME merge-upsert used by the
batch pipeline (foreachBatch), so batch and streaming share one code path
and the idempotency property (hash-identical rows classify as SKIP) gives
exactly-once-effective upserts even on replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from presencia_etl_spark.sinks.writers import merge_upsert_parquet


def incremental_upsert_stream(
    spark: SparkSession,
    source_path: str,
    source_schema,
    target_path: str,
    key_cols: list[str],
    checkpoint_path: str,
    trigger_once: bool = True,
):
    """readStream(parquet dir) → foreachBatch(merge upsert). Returns the
    started StreamingQuery (caller awaits/stops)."""
    stream = spark.readStream.schema(source_schema).parquet(source_path)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_upsert_parquet(spark, batch_df, target_path, key_cols)

    writer = stream.writeStream.foreachBatch(upsert).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
