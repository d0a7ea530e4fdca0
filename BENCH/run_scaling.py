"""Scaling-efficiency evidence: the SAME extraction job at two parallelism
levels (local[8] vs local[32] — N vs 4N cores; no real cluster in this
sandbox) on IDENTICAL input. Efficiency = (T_N / T_4N) / 4; target ≥ 0.8
(north_rule). Each run is a fresh JVM (subprocess) so the measurements don't
share executor state. Results → BENCH/scaling_results.json; prose summary
maintained in BENCH/BASELINE.md.

Usage: python BENCH/run_scaling.py [n_docs] [repeats]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from ocr_toolkit_spark.session import get_spark
from ocr_toolkit_spark.operators.extract import extract_spans
from ocr_toolkit_spark.pipeline import salt_oversized

cpus = int(sys.argv[1]); corpus = sys.argv[2]
spark = get_spark(app_name=f"scale{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=cpus)
docs = salt_oversized(spark.read.parquet(corpus)).repartition(cpus * 2, "doc_id", "salt")
sel = docs.select("doc_id", "spans")
# warm-up pass (JIT, Python worker pool spin-up) then measured pass
extract_spans(sel).groupBy().count().collect()
t0 = time.time()
agg = extract_spans(sel).groupBy().agg({{"n_chars": "sum", "doc_id": "count"}}).collect()[0]
dt = time.time() - t0
print(json.dumps({{"cpus": cpus, "seconds": dt, "docs": agg["count(doc_id)"],
                   "chars": agg["sum(n_chars)"]}}))
spark.stop()
"""


def run_once(cpus: int, corpus: str) -> dict:
    script = RUNNER.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cpus), corpus],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    cache = "/tmp/ocr_toolkit_bench"
    os.makedirs(cache, exist_ok=True)
    corpus = os.path.join(cache, f"scaling_{n_docs}.parquet")
    if not os.path.exists(corpus):
        sys.path.insert(0, REPO)
        from ocr_toolkit_spark.fixtures import write_corpus

        write_corpus(corpus, n_docs=n_docs, seed=42, row_group_size=2048)

    results = {}
    for cpus in (8, 32):
        times = []
        for r in range(repeats):
            res = run_once(cpus, corpus)
            times.append(res["seconds"])
            print(f"local[{cpus}] run {r}: {res['seconds']:.2f}s "
                  f"({res['docs']/res['seconds']:.0f} docs/s)", file=sys.stderr)
        best = min(times)
        results[f"local[{cpus}]"] = {
            "seconds_best": round(best, 3),
            "seconds_median": round(statistics.median(times), 3),
            "docs_per_sec_best": round(n_docs / best, 1),
            "all": [round(t, 3) for t in times],
        }

    t8 = results["local[8]"]["seconds_best"]
    t32 = results["local[32]"]["seconds_best"]
    eff = (t8 / t32) / 4
    summary = {
        "n_docs": n_docs,
        "corpus_bytes": os.path.getsize(corpus),
        "results": results,
        "speedup_8_to_32": round(t8 / t32, 3),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    out_path = os.path.join(REPO, "BENCH", "scaling_results.json")
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
