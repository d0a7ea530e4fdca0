"""Stateful streaming dedup — `applyInPandasWithState` over a content key.

Training-data ingest needs exactly-first-occurrence semantics ACROSS
micro-batches: a document whose content hash was already admitted in any
earlier batch must be dropped, forever. Watermark-less `dropDuplicates`
keeps unbounded state with no control; this operator owns its state
explicitly (first-seen count + timestamp per content hash) and is the
engine's example of a custom stateful operator the built-ins can't express.

State key: md5 of normalized text. Per key we keep (n_seen, first_seen_ms);
only the first arrival is emitted. GroupStateTimeout is configurable —
production would use a TTL so the state table tracks the dedup horizon
instead of growing forever.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = T.StructType(
    [
        T.StructField("content_key", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("n_dupes_so_far", T.LongType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_seen", T.LongType(), False),
    ]
)


def _dedup_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (n_seen,) = state.get if state.exists else (0,)
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values("doc_id", kind="stable")  # deterministic winner
    out = []
    if n_seen == 0 and len(rows):
        out.append(
            {
                "content_key": key[0],
                "doc_id": rows.iloc[0]["doc_id"],
                "n_dupes_so_far": 0,
            }
        )
    n_seen += len(rows)
    state.update((n_seen,))
    yield pd.DataFrame(out, columns=["content_key", "doc_id", "n_dupes_so_far"])


def stream_dedup_first_seen(
    spark_or_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """streaming df(id, text) → first-ever arrival per normalized-content
    hash. State persists across micro-batches AND restarts (checkpoint)."""
    from ..operators.dedup import normalize_text

    df = spark_or_df
    keyed = df.select(
        F.md5(normalize_text(F.col(text_col))).alias("content_key"),
        F.col(id_col).cast("string").alias("doc_id"),
    )
    return keyed.groupBy("content_key").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stream_dedup(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema: str = "doc_id long, text string",
):
    """availableNow drain: new files → first-seen rows appended to parquet."""
    src = spark.readStream.schema(schema).parquet(input_dir)
    deduped = stream_dedup_first_seen(src)
    return (
        deduped.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
