"""Streaming analogs: windowed aggregation and sessionization.

The reference has no streaming (SURVEY §2.6) — its incremental sync is a
cron-driven batch CDC. The idiomatic Spark extensions:

- tumbling/sliding windowed aggregation over an event-time column, written
  so the SAME function works on a batch DataFrame and on a readStream
  DataFrame (watermark applied only when streaming);
- gap-based sessionization — batch version via lag/cumsum window functions;
  in streaming this maps to ``F.session_window`` (shown in
  ``windowed_counts_stream``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def windowed_event_counts(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window count+sum per key. Works batch or streaming; pass
    ``watermark`` (e.g. '2 hours') when df is a stream so state is bounded
    and late data beyond the bound is dropped."""
    if dict(df.dtypes).get(ts_col, "").startswith("timestamp_ntz"):
        # withWatermark requires TIMESTAMP (LTZ); NTZ event-time columns throw
        # EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE. Value-transparent under the
        # engine's UTC session timezone.
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            key_col,
            "cnt",
            "sum_value",
        )
    )


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 10,
) -> DataFrame:
    """Batch gap-sessionization: a new session starts when the time since
    the user's previous event exceeds the gap. Returns per-event rows with
    a session_id column. One shuffle (partition by user)."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    # Truncate to whole seconds before differencing so gap classification is
    # reproducible across engines regardless of sub-second precision.
    sec = F.date_trunc("second", F.col(ts_col)).cast("long")
    prev = F.lag(sec).over(w)
    new_session = (
        prev.isNull() | (sec - prev > gap_minutes * 60)
    ).cast("long")
    return df.withColumn("_new", new_session).withColumn(
        "session_seq", F.sum("_new").over(w)
    ).drop("_new")


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 10,
) -> DataFrame:
    """Session count + events-per-session summary (single row)."""
    s = sessionize(df, user_col, ts_col, gap_minutes)
    per_session = s.groupBy(user_col, "session_seq").agg(F.count(F.lit(1)).alias("n_events"))
    return per_session.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.round(F.avg("n_events"), 4).alias("avg_events_per_session"),
        F.max("n_events").alias("max_events_per_session"),
    )


def windowed_counts_stream(
    stream_df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    gap: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming session windows (F.session_window) — the stateful-streaming
    form of ``sessionize`` with bounded state via watermark."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
