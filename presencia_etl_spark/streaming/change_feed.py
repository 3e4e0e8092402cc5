"""The MOR change feed as a Structured Streaming SOURCE.

``read_mor_changes`` is the batch pull (give me everything after seq N);
this module is the push form: every committed delta dir is a new file
set under ``deltas/``, and Spark's file stream source discovers new
files per micro-batch with exactly-once tracking in the checkpoint — so
the seq-numbered delta log doubles as a streaming CDC topic with no
broker. This is Delta Lake's ``readChangeFeed`` streaming mode
re-expressed on the plain-parquet delta log:

- each streamed row is ONE change event: the row's new version (or its
  pre-delete image with ``_deleted = true`` for tombstones), stamped
  with the ``_delta_seq`` it committed in;
- a key updated in three merges arrives three times, in commit order —
  consumers that want latest-wins fold per micro-batch (the
  ``foreachBatch`` below) or keep state (``applyInPandasWithState``);
- delivery is exactly-once per FILE (the source's checkpoint), so a
  restarted consumer resumes where it left off.

RETENTION CONTRACT (the Hudi/Delta one): compaction DELETES folded delta
dirs. Files a consumer already processed are fine; an UNPROCESSED delta
folded away is lost to the stream — size ``compact_every`` /
``keep_last`` to cover the slowest consumer's lag, exactly like CDF
retention hours or a Kafka topic's retention.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from presencia_etl_spark.sinks.mor import (
    BASE_DIR,
    DELETED_COL,
    DELTA_DIR,
    SEQ_COL,
)


def change_feed_schema(spark: SparkSession, target_path: str) -> StructType:
    """The stream's row schema: the base layout + ``_delta_seq`` (from
    the hive dir name) + ``_deleted``. Derived from one footer read of
    the base — no job."""
    base = spark.read.parquet(os.path.join(target_path, BASE_DIR))
    return base.schema.add(SEQ_COL, "integer").add(DELETED_COL, "boolean")


def stream_mor_changes(spark: SparkSession, target_path: str) -> DataFrame:
    """Streaming DataFrame of change events from a MOR state's delta log.

    File-source mechanics make the log a topic: hidden ``.staging_*``
    dirs are invisible to the listing (Spark skips dot/underscore paths),
    so a delta only enters the stream at its atomic rename commit —
    torn writes can never stream. Upsert deltas don't carry the
    ``_deleted`` column; the explicit schema reads it as NULL and the
    projection below normalizes to false (tombstone dirs wrote true).

    Pair with ``foreachBatch`` for latest-wins folding, or feed it
    straight to a sink for an event-sourced audit log.
    """
    droot = os.path.join(target_path, DELTA_DIR)
    # The dir may not exist until the first change-bearing merge; the
    # file source requires the path at start. An empty dir is invisible
    # to the batch readers (they list _delta_seq= children).
    os.makedirs(droot, exist_ok=True)
    raw = (
        spark.readStream.schema(change_feed_schema(spark, target_path))
        .option("basePath", droot)
        .parquet(droot)
    )
    return raw.withColumn(
        DELETED_COL, F.coalesce(F.col(DELETED_COL), F.lit(False))
    )


def mirror_mor_changes(
    spark: SparkSession,
    target_path: str,
    sink_path: str,
    checkpoint_path: str,
    trigger_once: bool = True,
):
    """Reference consumer: append every change event (latest-wins folded
    WITHIN each micro-batch, delete events kept as flagged rows) to a
    parquet audit/downstream table. The downstream gets one row per key
    per micro-batch — the incremental feed a search-index refresher or
    feature pipeline tails instead of re-diffing snapshots. Returns the
    started StreamingQuery (caller awaits/stops)."""
    from pyspark.sql import Window

    from presencia_etl_spark.operators import cdc

    stream = stream_mor_changes(spark, target_path)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        w = Window.partitionBy(cdc.KEY_COL).orderBy(F.col(SEQ_COL).desc())
        latest = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        latest.write.mode("append").parquet(sink_path)

    writer = stream.writeStream.foreachBatch(fold).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def consumer_progress(checkpoint_path: str, target_path: str) -> dict:
    """Size the retention knobs from an ACTUAL consumer's checkpoint.

    Reads the file-source checkpoint's processed-file log (``sources/*/``,
    one v1 JSON-lines file per micro-batch) and the live delta dirs, and
    returns:

    - ``cursor``: the highest sequence N such that every file of every
      live delta ≤ N has been processed — the consumer's safe resume
      point (a partially-read delta, possible under maxFilesPerTrigger,
      keeps the cursor below it).
    - ``unprocessed_live_seqs``: live deltas the consumer has not fully
      read — the window compaction must NOT fold.
    - ``min_safe_keep_last``: the smallest ``compact_mor(keep_last=...)``
      that folds nothing unprocessed, i.e. how far this consumer lags.

    Driver-side file reads only (checkpoint log + dir listing); no Spark
    job. Deltas already folded below the compaction floor are treated as
    processed — nothing retention can do for them retroactively."""
    import json as _json

    from presencia_etl_spark.sinks.mor import _delta_seqs, _read_meta

    processed: set[str] = set()
    sources = os.path.join(checkpoint_path, "sources")
    if os.path.isdir(sources):
        for src in sorted(os.listdir(sources)):
            sdir = os.path.join(sources, src)
            if not os.path.isdir(sdir):
                continue
            for batch_file in os.listdir(sdir):
                p = os.path.join(sdir, batch_file)
                # Skip Hadoop checksum sidecars (.«name».crc, binary) and
                # anything else hidden.
                if not os.path.isfile(p) or batch_file.startswith("."):
                    continue
                with open(p, errors="replace") as fh:
                    for line in fh:
                        line = line.strip()
                        if not line or not line.startswith("{"):
                            continue  # the "v1" version header
                        try:
                            entry = _json.loads(line)
                        except ValueError:
                            continue
                        # Matching is by part-file BASENAME (unique per
                        # Spark write job), so the checkpoint's file: URI
                        # prefix needs no normalization.
                        processed.add(os.path.basename(entry.get("path", "")))

    droot = os.path.join(target_path, DELTA_DIR)
    live = _delta_seqs(target_path)
    unprocessed = []
    for s in live:
        d = os.path.join(droot, f"{SEQ_COL}={s}")
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        if any(f not in processed for f in files):
            unprocessed.append(s)
    # Folded deltas (≤ the compaction floor) count as processed — the
    # cursor starts there, then advances through fully-processed live
    # deltas until the first gap.
    cursor = _read_meta(target_path).get("compacted_through", 0)
    for s in live:
        if s in unprocessed:
            break
        cursor = max(cursor, s)
    # keep_last counts NEWEST deltas spared from folding — every live
    # delta at or above the first unprocessed one must survive.
    if unprocessed:
        first_bad = unprocessed[0]
        keep = sum(1 for s in live if s >= first_bad)
    else:
        keep = 0
    return {
        "cursor": cursor,
        "processed_live_seqs": [s for s in live if s not in unprocessed],
        "unprocessed_live_seqs": unprocessed,
        "min_safe_keep_last": keep,
    }
