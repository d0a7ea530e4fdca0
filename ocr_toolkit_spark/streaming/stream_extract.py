"""Streaming extraction: the same Arrow-batched stage over a file stream.

The reference is strictly batch (SURVEY.md §2.6 — no streaming operators);
this module is the engine's incremental-ingest path: new parquet files
landing under the documents directory are extracted exactly once, with
Spark's checkpointing providing the resume semantics the batch path gets
from the lineage table.

`Trigger.AvailableNow` (the `availableNow=True` option) drains everything
currently available and stops — the streaming analog of an idempotent batch
catch-up run, suitable for cron-style incremental processing at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.extract import extract_spans
from ..schema import DOCUMENTS_SCHEMA


def read_documents_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(DOCUMENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    with_images: bool = True,
    available_now: bool = True,
) -> StreamingQuery:
    """documents stream → extraction stage → parquet sink, exactly-once via
    the checkpoint. Stateless per document, so no watermark is needed; the
    mapInArrow stage is streaming-safe (no cross-batch state)."""
    extracted = extract_spans(read_documents_stream(spark, input_dir), with_images)
    writer = (
        extracted.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_method_counts(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
) -> tuple[StreamingQuery, str]:
    """Running per-method doc counts as an in-memory table — the streaming
    analog of the reference's ProcessingStats accumulator (stats.py:28-85).
    Complete-mode aggregation; returns (query, table_name)."""
    extracted = extract_spans(read_documents_stream(spark, input_dir))
    counts = extracted.groupBy("method").agg(
        F.count("*").alias("docs"),
        F.sum(F.col("success").cast("int")).alias("succeeded"),
    )
    name = "stream_method_counts"
    q = (
        counts.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    return q, name
