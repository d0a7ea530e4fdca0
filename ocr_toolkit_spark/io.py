"""Table-IO seam — Parquet now, Iceberg when a runtime catalog is present.

The north_rule targets Iceberg tables (snapshot commits, partition listing).
This sandbox ships no Iceberg runtime jar and has no network, so the seam
isolates every table operation behind functions whose Parquet implementation
emulates the needed semantics:

- `write_extracted` uses dynamic partition overwrite (the Parquet analog of
  Iceberg `overwritePartitions()`): re-running a partition replaces its files
  instead of duplicating them → idempotent per-partition commits.
- `append_lineage` appends small commit records (the analog of snapshot
  metadata) AFTER the data write, so a crash between the two re-processes the
  partition on resume — safe under overwrite semantics.

With an Iceberg catalog configured, swap these for `writeTo(...).overwrite...`
/ `.append()`; nothing else in the engine changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .schema import DOCUMENTS_SCHEMA, LINEAGE_SCHEMA


def read_documents(spark: SparkSession, path: str) -> DataFrame:
    """Scan the documents table with the declared schema (never inferred)."""
    return spark.read.schema(DOCUMENTS_SCHEMA).parquet(path)


def write_extracted(df: DataFrame, path: str) -> None:
    """Per-partition idempotent write: only partitions present in `df` are
    replaced; previously committed partitions are untouched."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("partition_id")
        .parquet(path)
    )


def read_extracted(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def append_lineage(df: DataFrame, path: str) -> None:
    df.write.mode("append").parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int = 64,
) -> None:
    """Bucketed external table (the Parquet analog of Iceberg's
    `bucket(N, col)` partition transform): both sides of a recurring join
    written with the same bucket spec join WITHOUT a shuffle — the exchange
    is paid once at write time, then every downstream join/aggregation on
    the bucket key is co-located. This is the 100-TB answer for join keys
    used repeatedly (doc_id enrichments, media_ref attachments)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .option("path", path)
        .format("parquet")
        .saveAsTable(table)
    )


def read_lineage(spark: SparkSession, path: str) -> DataFrame | None:
    try:
        return spark.read.schema(LINEAGE_SCHEMA).parquet(path)
    except Exception:
        return None  # first run: no lineage table yet
