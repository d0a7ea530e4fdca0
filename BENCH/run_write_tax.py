"""Decompose extract_write = kernel + Arrow→JVM conversion + parquet write.

r3 verdict #3: extract_write carries ~25% over extract at sf0.1 and the 1M
soak showed ~11 GB of span structs re-converted JVM-side on the write path.
This harness measures where the time actually goes:

1. `kernel_1t`  — the Python kernel ALONE: _process_batch over the corpus's
   Arrow batches (512 rows, the production batch size), single-threaded, no
   Spark. Core-seconds floor of the extraction itself.
2. `extract`    — Spark scan → mapInArrow → tiny aggregate. Adds scheduling
   + Arrow IPC + Arrow→UnsafeRow conversion of every returned column (the
   JVM must row-convert the kernel's output batches regardless of the
   downstream operator — there is no columnar consumer for mapInArrow
   output in OSS Spark).
3. `write_live` — the same plan with the partitioned parquet sink (bench.py
   extract_write shape). write tax = write_live − extract.
4. `write_cached` — write the SAME rows from a localCheckpoint: pure sink
   cost with kernel+conversion already paid. Isolates parquet encoding +
   shuffle-free dynamic overwrite from the pipeline cost.
5. `write_live@N` — Arrow batch-size sweep on the live write leg (256/512/
   1024; sandbox memory note: 1024 measured 2× wall at local[32] in r2's
   sweep — re-verified here on the WRITE leg specifically).

Each leg best-of-N (default 3) with /proc/stat steal% recorded per pass —
single runs on this VM are untrustworthy (BENCH/BASELINE.md methodology).

Output: one JSON object to stdout and BENCH/write_tax.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _measure import cpu_stat, steal_pct  # noqa: E402


def main() -> int:
    from bench import DOCS_PER_SF, _corpus_path, _sf_from_dir

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    sf = _sf_from_dir(sf_dir)
    n_docs = max(int(DOCS_PER_SF * sf), 1000)
    corpus = _corpus_path(sf, n_docs)

    result: dict = {"sf": sf, "cpus": cpus, "n_docs": n_docs, "runs": runs}

    def best_of(fn, prep=None) -> tuple[float, list, list]:
        # `prep` runs OUTSIDE the timed region (r4 review #7: deleting the
        # previous pass's partitioned output inside the timing inflated
        # the write legs and skewed the batch sweep)
        times, steals = [], []
        for _ in range(runs):
            if prep is not None:
                prep()
            s0 = cpu_stat()
            t0 = time.perf_counter()
            fn()
            times.append(round(time.perf_counter() - t0, 3))
            steals.append(round(steal_pct(s0, cpu_stat()), 1))
        return min(times), times, steals

    # --- 1. single-threaded kernel floor (no Spark) -----------------------
    import pyarrow.parquet as pq

    from ocr_toolkit_spark.operators.extract import _process_batch

    tbl = pq.read_table(corpus, columns=["doc_id", "spans"])

    def kernel_pass():
        n = 0
        for b in tbl.to_batches(max_chunksize=512):
            n += _process_batch(b, True).num_rows
        assert n == n_docs

    kernel_1t, k_times, k_steals = best_of(kernel_pass)
    result["kernel_1t"] = {"best": kernel_1t, "times": k_times,
                           "steal_pct": k_steals,
                           "ideal_wall_at_cpus": round(kernel_1t / cpus, 3)}

    # --- Spark legs -------------------------------------------------------
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "64g")
    from pyspark.sql import functions as F

    from ocr_toolkit_spark.operators.extract import extract_spans
    from ocr_toolkit_spark.pipeline import with_partition_id
    from ocr_toolkit_spark.session import get_spark

    spark = get_spark(app_name="write_tax", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.range(1000).count()

    docs_aligned = with_partition_id(spark.read.parquet(corpus)).repartition(
        cpus * 2, "partition_id"
    )
    sel = docs_aligned.select("doc_id", "spans")
    write_dir = os.path.join(
        os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/dev/shm/ocr_toolkit_bench"),
        "write_tax_out",
    )

    def run_extract():
        (
            extract_spans(sel)
            .groupBy()
            .agg({"n_chars": "sum", "doc_id": "count"})
            .collect()
        )

    def clean():
        shutil.rmtree(write_dir, ignore_errors=True)

    def write_of(frame):
        def fn():
            (
                frame.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("partition_id")
                .parquet(write_dir)
            )
        return fn

    live_frame = with_partition_id(extract_spans(sel))
    best, times, steals = best_of(run_extract)
    result["extract"] = {"best": best, "times": times, "steal_pct": steals}
    best, times, steals = best_of(write_of(live_frame), prep=clean)
    result["write_live"] = {"best": best, "times": times, "steal_pct": steals}

    # cached-source write: kernel + conversion paid once up front
    cached = with_partition_id(extract_spans(sel)).localCheckpoint(eager=True)
    best, times, steals = best_of(write_of(cached), prep=clean)
    result["write_cached"] = {"best": best, "times": times, "steal_pct": steals}
    cached.unpersist()

    # Arrow batch sweep on the live write leg; the session-default size is
    # already measured as write_live — reuse it rather than paying another
    # N write passes (r4 review pass 2, #6)
    from ocr_toolkit_spark.session import ARROW_MAX_RECORDS

    sweep = {}
    for mrpb in (256, 512, 1024):
        if mrpb == ARROW_MAX_RECORDS:
            sweep[str(mrpb)] = dict(result["write_live"], reused=True)
            continue
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(mrpb))
        best, times, steals = best_of(write_of(live_frame), prep=clean)
        sweep[str(mrpb)] = {"best": best, "times": times, "steal_pct": steals}
    spark.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_MAX_RECORDS)
    )
    result["write_live_batch_sweep"] = sweep

    # decomposition summary (bests; VM noise bounded by per-pass steal%)
    result["decomposition"] = {
        "kernel_core_seconds": kernel_1t,
        "kernel_ideal_wall": round(kernel_1t / cpus, 3),
        "sched_ipc_conversion_wall": round(
            result["extract"]["best"] - kernel_1t / cpus, 3
        ),
        "write_tax_wall": round(
            result["write_live"]["best"] - result["extract"]["best"], 3
        ),
        "pure_sink_wall": result["write_cached"]["best"],
    }

    shutil.rmtree(write_dir, ignore_errors=True)
    spark.stop()
    out = json.dumps(result)
    print(out)
    with open(os.path.join(ROOT, "BENCH", "write_tax.json"), "w") as f:
        f.write(out + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
