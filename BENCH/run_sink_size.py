"""Flat-sink size mitigation A/B (r5 verdict #6).

The r5 lifecycle soak measured the flat batch_id=N layout at 3.68 GB vs
567 MB nested for IDENTICAL rows on the redundant fixture corpus: a
100k-doc flat file overflows parquet's 1 MB dictionary page on
out_spans.text and falls back to PLAIN encoding. Two public knobs fix it
without any engine change:

- `maxRecordsPerFile` (DataFrameWriter option): caps rows per file, so
  each file's column chunks keep their dictionary under the page limit
  and stay dictionary-encoded — still a flat layout, just several files
  per batch directory;
- `compression` codec: zstd compresses the PLAIN fallback far better
  than snappy even when the dictionary is lost.

This harness writes the SAME extracted 100k-doc batch through the sink's
write shape under a matrix of (codec × maxRecordsPerFile) and reports
bytes, files, write seconds, and a full-scan read back. Output:
BENCH/sink_size.json. Usage: python BENCH/run_sink_size.py [n_docs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _measure import cpu_stat, steal_pct  # noqa: E402


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    cache = os.environ.get("SPARK_GRAFT_BENCH_CACHE",
                           "/dev/shm/ocr_toolkit_bench")
    root = os.path.join(cache, "sink_size")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)

    import pyarrow.parquet as pq

    from ocr_toolkit_spark.fixtures import generate_documents, to_arrow
    from ocr_toolkit_spark.operators.extract import extract_spans
    from ocr_toolkit_spark.pipeline import with_partition_id
    from ocr_toolkit_spark.session import get_spark

    corpus = os.path.join(root, "corpus.parquet")
    pq.write_table(to_arrow(generate_documents(n_docs, seed=1000)), corpus)

    spark = get_spark(app_name="sink_size", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    from pyspark.sql import functions as F

    extracted = (
        with_partition_id(extract_spans(spark.read.parquet(corpus)))
        .withColumn("batch_id", F.lit(0))
        .localCheckpoint(eager=True)  # extraction cost out of the A/B
    )
    n_rows = extracted.count()

    matrix = [
        ("snappy", None),
        ("snappy", 2_000),
        ("snappy", 4_000),
        ("snappy", 8_000),
        ("snappy", 32_000),
        ("zstd", None),
        ("zstd", 2_000),
        ("zstd", 8_000),
    ]
    results = []
    for codec, cap in matrix:
        out = os.path.join(root, f"t_{codec}_{cap or 0}")
        c0, t0 = cpu_stat(), time.time()
        w = (
            extracted.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .option("compression", codec)
            .partitionBy("batch_id")
        )
        if cap:
            w = w.option("maxRecordsPerFile", cap)
        w.parquet(out)
        t_write = time.time() - t0
        st = steal_pct(c0, cpu_stat())

        n_bytes, n_files = 0, 0
        for r, _d, files in os.walk(out):
            for f in files:
                if f.endswith(".parquet"):
                    n_files += 1
                    n_bytes += os.path.getsize(os.path.join(r, f))
        t0 = time.time()
        rows = spark.read.parquet(out).count()
        t_read = time.time() - t0
        assert rows == n_rows
        rec = {
            "codec": codec,
            "max_records_per_file": cap,
            "mb": round(n_bytes / 1e6, 1),
            "files": n_files,
            "write_sec": round(t_write, 2),
            "read_sec": round(t_read, 2),
            "steal_pct": round(st, 1),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)
        shutil.rmtree(out, ignore_errors=True)

    out_j = {"n_docs": n_docs, "rows": n_rows, "cpus": cpus,
             "matrix": results}
    print(json.dumps(out_j), flush=True)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "sink_size.json"), "w") as f:
        json.dump(out_j, f, indent=1)
    spark.stop()
    shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
