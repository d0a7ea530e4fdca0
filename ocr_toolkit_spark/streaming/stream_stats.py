"""Watermarked event-time windowed aggregation — the late-data pattern.

The reference is strictly batch (SURVEY.md §2.6); this is the engine's
streaming-analytics leg over an event stream (the driver `events` table
shape): tumbling event-time windows with a watermark bounding how late a
row may arrive and still update its window's state. Append output mode
emits each window exactly once — when the watermark passes the window end —
so the sink is idempotent and the state store stays bounded (Spark drops
window state older than the watermark; without it, 10^12-event state grows
forever).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..schema import EVENTS_SCHEMA


def read_events_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def windowed_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling event-time window counts per event_type. Rows later than
    `watermark` behind the max seen event time are dropped; rows within it
    update their window before it finalizes."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_event_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked per-user SESSION windows (native `session_window`
    merging state): a session finalizes once the watermark passes its
    close (last event + gap), so state per user is one open session, not
    unbounded history. The batch twin is operators/sessions.sessionize —
    fuzz-pinned equal to the native operator away from the exact-gap
    boundary (tests/test_operators.py::TestSessionizeVsNative)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def stream_session_counts(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
) -> StreamingQuery:
    """Event files → watermarked session windows → parquet sink, append
    mode: each closed session row is written exactly once; the checkpoint
    resumes open-session state across availableNow drains."""
    agg = session_event_counts(read_events_stream(spark, input_dir), gap,
                               watermark)
    return (
        agg.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_windowed_event_counts(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    window: str = "10 minutes",
    watermark: str = "10 minutes",
) -> StreamingQuery:
    """Event files → watermarked windowed counts → parquet sink, append mode:
    a window row is WRITTEN exactly once, when the watermark passes the
    window end. Re-running with the same checkpoint resumes the watermark
    and window state — the cron-style incremental rollup shape (each
    availableNow drain picks up new files, finalizes what the advancing
    watermark allows, and appends only those rows)."""
    agg = windowed_event_counts(
        read_events_stream(spark, input_dir), window, watermark
    )
    return (
        agg.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
