"""Iceberg seam — the catalog-backed implementation of the table-IO contract.

The north_rule targets Iceberg tables (bucket partitioning, snapshot commits,
`overwritePartitions` idempotency). This sandbox ships no Iceberg runtime jar
(verified: nothing matching iceberg in pyspark/jars) and has no network, so
these functions raise a clear error unless a catalog is configured; the
Parquet emulation in `ocr_toolkit_spark.io` implements the same semantics
(dynamic partition overwrite ≙ overwritePartitions, lineage append ≙ snapshot
metadata) and everything else in the engine is identical either way.

To deploy against Iceberg, configure e.g.:

    spark.sql.catalog.docs = org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.docs.type = rest            # or hive / hadoop
    spark.sql.catalog.docs.uri = <catalog uri>

and create the tables:

    CREATE TABLE docs.documents (doc_id string,
        spans array<struct<kind string, text string, media_ref string, offset int>>)
    USING iceberg PARTITIONED BY (bucket(64, doc_id));
    CREATE TABLE docs.extracted (...) USING iceberg
        PARTITIONED BY (partition_id);
    CREATE TABLE docs.lineage (...) USING iceberg;
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def catalog_available(spark: SparkSession, catalog: str = "docs") -> bool:
    try:
        impl = spark.conf.get(f"spark.sql.catalog.{catalog}")
        return bool(impl)
    except Exception:
        return False


def _require(spark: SparkSession, catalog: str) -> None:
    if not catalog_available(spark, catalog):
        raise RuntimeError(
            f"no Iceberg catalog {catalog!r} configured (and no Iceberg "
            "runtime jar ships in this sandbox) — use ocr_toolkit_spark.io's "
            "Parquet emulation, which provides the same commit semantics"
        )


def read_documents(spark: SparkSession, catalog: str = "docs") -> DataFrame:
    _require(spark, catalog)
    return spark.read.table(f"{catalog}.documents")


def write_extracted(df: DataFrame, catalog: str = "docs") -> None:
    """Idempotent per-partition commit: replaces exactly the partitions
    present in `df`, atomically, as one snapshot."""
    _require(df.sparkSession, catalog)
    df.writeTo(f"{catalog}.extracted").overwritePartitions()


def append_lineage(df: DataFrame, catalog: str = "docs") -> None:
    _require(df.sparkSession, catalog)
    df.writeTo(f"{catalog}.lineage").append()


def read_lineage(spark: SparkSession, catalog: str = "docs") -> DataFrame | None:
    _require(spark, catalog)
    try:
        return spark.read.table(f"{catalog}.lineage")
    except Exception:
        return None
