"""Round-7 optimization measurement harness (bench.py is FROZEN — this file
is the guide-§1 isolation bench: per-query timing with the same session
shape as bench.py, plus `.explain("formatted")` capture to plans/r07/).

Usage:
    python bench_extra.py [--sf-dir DIR] [--runs N] [--queries a,b,c]
                          [--explain-tag before|after|none] [--json OUT]

Times each bench workload with `collect()` exactly like bench.py does (the
outputs are small aggregates, so collect == compute; the noop sink is used
for the extract kernel where the output is wide). Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

BENCH_QUERIES = [
    "tpch_q1",
    "tpch_q3_topk",
    "quality_scores",
    "window_running",
    "similarity_bruteforce",
    "minhash_dedup",
    "simhash_dedup",
    "exact_dedup",
    "token_stats",
    "sessionize",
    "embedding_near_dups",
    "tpch_q5",
]

DOCS_PER_SF = 200_000


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--queries", default="")
    ap.add_argument("--explain-tag", default="none",
                    help="before|after|none: dump explain('formatted') to "
                         "plans/r07/<q>_<tag>.txt")
    ap.add_argument("--json", default="")
    ap.add_argument("--skip-extract", action="store_true")
    args = ap.parse_args()

    sf_dir = args.sf_dir
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf = float(base.replace("sf", ""))
    except ValueError:
        sf = 0.1
    n_docs = max(int(DOCS_PER_SF * sf), 1000)

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "64g")
    from ocr_toolkit_spark.session import get_spark

    import __spark_entry__ as entrymod
    from bench import _corpus_path

    spark = get_spark(app_name="bench_extra", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.range(1000).count()

    sel_queries = [q for q in args.queries.split(",") if q] or BENCH_QUERIES

    workloads = []
    if not args.skip_extract:
        corpus = _corpus_path(sf, n_docs)
        from ocr_toolkit_spark.operators.extract import extract_spans
        from ocr_toolkit_spark.pipeline import salt_oversized, with_partition_id

        docs = salt_oversized(spark.read.parquet(corpus)).repartition(
            cpus * 2, "doc_id", "salt")
        sel = docs.select("doc_id", "spans")

        def run_extract():
            (extract_spans(sel).groupBy()
             .agg({"n_chars": "sum", "n_spans": "sum", "doc_id": "count"})
             .collect())

        import shutil
        write_dir = os.path.join(
            os.environ.get("SPARK_GRAFT_BENCH_CACHE",
                           "/dev/shm/ocr_toolkit_bench"), "bench_extra_write")
        docs_aligned = with_partition_id(spark.read.parquet(corpus)).repartition(
            cpus * 2, "partition_id")
        sel_aligned = docs_aligned.select("doc_id", "spans")

        def run_extract_write():
            shutil.rmtree(write_dir, ignore_errors=True)
            out = with_partition_id(extract_spans(sel_aligned))
            (out.write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("partition_id").parquet(write_dir))

        workloads += [("extract", run_extract, lambda: extract_spans(sel)),
                      ("extract_write", run_extract_write,
                       lambda: with_partition_id(extract_spans(sel_aligned)))]

    qs = entrymod.queries()
    for name in sel_queries:
        if name in ("extract", "extract_write"):
            continue
        workloads.append((
            name,
            lambda name=name: qs[name](spark, sf_dir).collect(),
            lambda name=name: qs[name](spark, sf_dir),
        ))
    if args.queries:
        workloads = [w for w in workloads if w[0] in sel_queries]

    plans_dir = os.path.join(_REPO, "plans", "r07")
    if args.explain_tag != "none":
        os.makedirs(plans_dir, exist_ok=True)
        for name, _, mk in workloads:
            try:
                txt = mk()._sc._jvm.PythonSQLUtils.explainString(
                    mk()._jdf.queryExecution(), "formatted")
            except Exception:
                import contextlib
                import io
                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    mk().explain("formatted")
                txt = buf.getvalue()
            with open(os.path.join(
                    plans_dir, f"{name}_{args.explain_tag}.txt"), "w") as f:
                f.write(txt)

    if args.runs <= 0:  # plans-only mode
        print(json.dumps({"plans": args.explain_tag, "sf": sf}))
        spark.stop()
        return 0

    results: dict[str, list[float]] = {}
    for name, fn, _ in workloads:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        samples = []
        for _ in range(args.runs):
            t0 = time.time()
            fn()
            samples.append(round(time.time() - t0, 3))
        results[name] = samples
        spark.sparkContext.setJobDescription(None)
        print(f"## {name}: best={min(samples)} all={samples}",
              file=sys.stderr, flush=True)

    out = {
        "sf": sf,
        "cpus": cpus,
        "runs": args.runs,
        "best": {n: min(v) for n, v in results.items()},
        "all": results,
        "total_best": round(sum(min(v) for v in results.values()), 3),
    }
    line = json.dumps(out)
    if args.json:
        with open(args.json, "w") as f:
            f.write(line + "\n")
    print(line)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
