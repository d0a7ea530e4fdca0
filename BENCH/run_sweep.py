"""Parameter sweep over the extraction stage's two throughput knobs —
Arrow batch size × partition count — the engine's analog of the reference's
batch/threads grid (/root/reference/scripts/benchmark_zh_params.py:26-27).
CSV to stdout and BENCH/sweep_results.csv.

Usage: python BENCH/run_sweep.py [n_docs]
"""

from __future__ import annotations

import csv
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BATCH_SIZES = (256, 1024, 4096)
PARTITION_FACTORS = (1, 2, 4)  # × cpu count


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from ocr_toolkit_spark.fixtures import write_corpus
    from ocr_toolkit_spark.operators.extract import extract_spans
    from ocr_toolkit_spark.pipeline import salt_oversized
    from ocr_toolkit_spark.session import get_spark

    cache = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/dev/shm/ocr_toolkit_bench")
    os.makedirs(cache, exist_ok=True)
    corpus = os.path.join(cache, f"sweep_{n_docs}.parquet")
    if not os.path.exists(corpus):
        write_corpus(corpus, n_docs=n_docs, seed=42, row_group_size=2048)

    rows = []
    for batch_size in BATCH_SIZES:
        spark = get_spark(
            app_name="sweep",
            master=f"local[{cpus}]",
            shuffle_partitions=cpus,
            extra_conf={
                "spark.sql.execution.arrow.maxRecordsPerBatch": str(batch_size)
            },
        )
        docs = salt_oversized(spark.read.parquet(corpus))
        for factor in PARTITION_FACTORS:
            sel = docs.repartition(cpus * factor, "doc_id", "salt").select(
                "doc_id", "spans"
            )
            extract_spans(sel).groupBy().count().collect()  # warm
            t0 = time.time()
            extract_spans(sel).groupBy().count().collect()
            dt = time.time() - t0
            rows.append({
                "batch_size": batch_size,
                "partitions": cpus * factor,
                "seconds": round(dt, 3),
                "docs_per_sec": round(n_docs / dt, 1),
            })
            print(rows[-1], file=sys.stderr)
        spark.stop()

    out = os.path.join(REPO, "BENCH", "sweep_results.csv")
    with open(out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    for r in rows:
        print(",".join(str(v) for v in r.values()))
    return 0


if __name__ == "__main__":
    sys.exit(main())
