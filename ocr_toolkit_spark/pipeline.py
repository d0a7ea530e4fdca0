"""End-to-end extraction pipeline: read → resume → salt → extract → commit.

The distributed replacement for the reference's per-file driver loop
(/root/reference/ocr_toolkit/cli/convert.py:366-551), with the scale
mechanics the reference lacks (SURVEY.md §2.5 E5 — no checkpointing there):

1. **Bucketing**: `partition_id = pmod(xxhash64(doc_id), n_buckets)` — the
   engine-side analog of an Iceberg `bucket(N, doc_id)` partition spec.
2. **Resume**: previously committed partitions (lineage rows) are excluded
   with a broadcast LEFT ANTI join — a re-run only processes what's missing.
3. **Skew salting**: AQE cannot split a single giant row, so documents whose
   span count exceeds a threshold get an explicit salt and the repartition is
   on (partition_id, salt) — heavy docs of one bucket spread across tasks.
4. **Extract**: ONE Arrow-batched stage (operators/extract.py).
5. **Commit**: dynamic-partition-overwrite data write, then lineage append
   (doc/span/byte/failure counts per partition) — idempotent per partition.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import io as tio
from .operators.extract import extract_spans

DEFAULT_BUCKETS = 64
# span-count threshold above which a document is considered oversized; the
# fixture skew slice generates 2k-8k-span docs vs a ~6-span median
DEFAULT_SALT_THRESHOLD = 500
DEFAULT_SALT_K = 8


@dataclass
class RunStats:
    run_id: str
    partitions_processed: int
    partitions_skipped: int


def with_partition_id(df: DataFrame, n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    return df.withColumn(
        "partition_id", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int")
    )


def committed_partitions(spark: SparkSession, lineage_path: str) -> DataFrame | None:
    lin = tio.read_lineage(spark, lineage_path)
    if lin is None:
        return None
    return lin.select("partition_id").distinct()


def salt_oversized(
    df: DataFrame,
    threshold: int = DEFAULT_SALT_THRESHOLD,
    k: int = DEFAULT_SALT_K,
) -> DataFrame:
    """Explicit skew salt: oversized docs (by span count) get k distinct salts
    so one bucket's giants spread across tasks (SURVEY.md §4 'custom work')."""
    return df.withColumn(
        "salt",
        F.when(
            F.size("spans") > threshold,
            F.pmod(F.xxhash64("doc_id", F.lit("salt")), F.lit(k)).cast("int"),
        ).otherwise(F.lit(0)),
    )


def run_extraction(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    lineage_path: str,
    run_id: str,
    with_images: bool = True,
    pages: str | frozenset[int] | None = None,
    n_buckets: int = DEFAULT_BUCKETS,
    salt_threshold: int = DEFAULT_SALT_THRESHOLD,
    salt_k: int = DEFAULT_SALT_K,
    parallelism: int | None = None,
) -> RunStats:
    docs = with_partition_id(tio.read_documents(spark, input_path), n_buckets)

    done = committed_partitions(spark, lineage_path)
    skipped = 0
    if done is not None:
        skipped = done.count()
        # broadcast anti-join: the committed set is tiny (≤ n_buckets rows)
        docs = docs.join(F.broadcast(done), "partition_id", "left_anti")

    docs = salt_oversized(docs, salt_threshold, salt_k)
    shuffle_n = parallelism or int(spark.conf.get("spark.sql.shuffle.partitions"))
    docs = docs.repartition(shuffle_n, "partition_id", "salt")

    extracted = extract_spans(docs.select("doc_id", "spans"), with_images, pages)
    # partition_id is recomputed from doc_id (deterministic hash) rather than
    # threaded through the Arrow stage — keeps the UDF schema minimal
    out = with_partition_id(extracted, n_buckets)

    tio.write_extracted(out, output_path)

    result = tio.read_extracted(spark, output_path)
    lineage = (
        result.groupBy("partition_id")
        .agg(
            F.count("*").alias("doc_count"),
            F.sum("n_spans").cast("long").alias("span_count"),
            F.sum("n_chars").cast("long").alias("byte_count"),
            F.sum(F.when(~F.col("success"), 1).otherwise(0))
            .cast("long")
            .alias("failure_count"),
        )
        .withColumn("run_id", F.lit(run_id))
        .withColumn("committed_at", F.current_timestamp())
        .select(
            "run_id",
            "partition_id",
            "doc_count",
            "span_count",
            "byte_count",
            "failure_count",
            "committed_at",
        )
    )
    if done is not None:
        lineage = lineage.join(F.broadcast(done), "partition_id", "left_anti")
    n_new = lineage.count()
    tio.append_lineage(lineage, lineage_path)
    return RunStats(run_id=run_id, partitions_processed=n_new, partitions_skipped=skipped)


def render_markdown_col() -> "F.Column":
    """The reference's final artifact: one markdown string per document —
    `"\\n\\n"`-joined non-image span texts (openocr_doc_handler.py:276,
    markdown sink cli/convert.py:61-64). Pure JVM array algebra."""
    return F.array_join(
        F.transform(
            F.filter(F.col("out_spans"), lambda s: s["kind"] != "image"),
            lambda s: s["text"],
        ),
        "\n\n",
    )


def with_markdown(extracted: DataFrame) -> DataFrame:
    return extracted.withColumn("markdown", render_markdown_col())


def with_output_quality(extracted: DataFrame) -> DataFrame:
    """T10 quality scoring over the rendered output (quality_evaluator.py:
    46-126) — the distributed version of per-file post-scoring."""
    from .operators.textstats import quality_columns

    df = with_markdown(extracted)
    for name, col in quality_columns(F.col("markdown")).items():
        df = df.withColumn(name, col)
    return df


def extraction_stats(extracted: DataFrame) -> DataFrame:
    """Corpus-level metrics — the distributed ProcessingStats
    (/root/reference/ocr_toolkit/processors/stats.py:28-85): Catalyst handles
    partial+final aggregation; `groupBy(method)` is the per-method counter."""
    return extracted.groupBy("method").agg(
        F.count("*").alias("docs"),
        F.sum(F.col("success").cast("int")).alias("succeeded"),
        F.sum("n_spans").alias("spans"),
        F.sum("n_chars").alias("chars"),
        F.avg("elapsed_ms").alias("avg_elapsed_ms"),
    )
