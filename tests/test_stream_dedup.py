"""Stateful streaming dedup (applyInPandasWithState): first occurrence wins
across micro-batches and across restarts."""

import os

import pyarrow as pa
import pyarrow.parquet as pq


def _write(path, rows):
    pq.write_table(
        pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "text": [r[1] for r in rows]}),
        path,
    )


def test_first_seen_across_batches_and_restarts(spark, tmpdir_path):
    from ocr_toolkit_spark.streaming.stream_dedup import run_stream_dedup

    in_dir = os.path.join(tmpdir_path, "in")
    os.makedirs(in_dir)
    out = os.path.join(tmpdir_path, "out")
    ckpt = os.path.join(tmpdir_path, "ckpt")

    _write(os.path.join(in_dir, "a.parquet"), [
        (1, "alpha content one"),
        (2, "beta content two"),
        (3, "Alpha  CONTENT one!!"),  # normalized dup of 1 (same batch)
    ])
    q = run_stream_dedup(spark, in_dir, out, ckpt)
    q.awaitTermination(600)
    first = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert first == {"1", "2"}  # doc 3 deduped in-batch; min doc_id wins

    # restart with NEW file: cross-batch dupes must be dropped via state
    _write(os.path.join(in_dir, "b.parquet"), [
        (4, "beta content two"),       # dup of 2 from a PREVIOUS run
        (5, "gamma content three"),    # new
    ])
    q2 = run_stream_dedup(spark, in_dir, out, ckpt)
    q2.awaitTermination(600)
    rows = spark.read.parquet(out).collect()
    ids = sorted(r.doc_id for r in rows)
    assert ids == ["1", "2", "5"], ids
