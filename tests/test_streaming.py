"""Structured Streaming extraction: availableNow drain of a documents
directory, exactly-once via checkpoint, output equal to the batch path."""

import os

import pyarrow.parquet as pq

from ocr_toolkit_spark.fixtures import generate_documents, to_arrow


def test_stream_extract_availablenow(spark, tmpdir_path):
    from ocr_toolkit_spark.streaming.stream_extract import stream_extract

    docs = generate_documents(120, 42)
    in_dir = os.path.join(tmpdir_path, "in")
    os.makedirs(in_dir)
    half = len(docs) // 2
    pq.write_table(to_arrow(docs[:half]), os.path.join(in_dir, "a.parquet"))
    pq.write_table(to_arrow(docs[half:]), os.path.join(in_dir, "b.parquet"))

    out_dir = os.path.join(tmpdir_path, "out")
    ckpt = os.path.join(tmpdir_path, "ckpt")
    q = stream_extract(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(120)

    result = spark.read.parquet(out_dir)
    assert result.count() == len(docs)
    assert result.select("doc_id").distinct().count() == len(docs)

    # restart with the same checkpoint: nothing new → no duplicates
    q2 = stream_extract(spark, in_dir, out_dir, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == len(docs)

    # a new file lands → only it is processed (incremental ingest)
    extra = [(f"extra-{i}", [{"kind": "text", "text": f"new doc {i}",
                              "media_ref": "", "offset": 0}]) for i in range(5)]
    pq.write_table(to_arrow(extra), os.path.join(in_dir, "c.parquet"))
    q3 = stream_extract(spark, in_dir, out_dir, ckpt)
    q3.awaitTermination(120)
    final = spark.read.parquet(out_dir)
    assert final.count() == len(docs) + 5
    assert final.filter("doc_id like 'extra-%'").count() == 5


def test_streaming_method_counts(spark, tmpdir_path):
    from ocr_toolkit_spark.streaming.stream_extract import streaming_method_counts

    docs = generate_documents(80, 7)
    in_dir = os.path.join(tmpdir_path, "in")
    os.makedirs(in_dir)
    pq.write_table(to_arrow(docs), os.path.join(in_dir, "a.parquet"))

    q, table = streaming_method_counts(
        spark, in_dir, os.path.join(tmpdir_path, "ckpt2"))
    q.awaitTermination(120)
    rows = {r.method: r.docs for r in spark.sql(f"select * from {table}").collect()}
    assert sum(rows.values()) == len(docs)
    assert "text" in rows
