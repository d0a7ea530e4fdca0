"""Incremental EMBEDDING dedup scale ladder: delta cost must track the
DELTA, not the table (the r6c third delta modality — the embedding
analog of BENCH/run_delta_dedup.py).

Corpus: seeded unit vectors (dim 64); 5% of the base and 20% of the
delta are near-duplicates (small additive noise, cosine ≫ 0.9) of
earlier vectors, so both rounds and the batch re-run find real pairs.
Three measured legs per base size:

1. `bootstrap` — round 0: SRP buckets for the base corpus, committed as
   signature-state ingest 0 (one-time, amortized over every ingest).
2. `delta`     — the incremental round: SRP buckets for the delta only,
   broadcast-semi-join against the persisted state, star-capped
   candidates, exact-cosine verify, state append.
3. `full`      — the naive alternative: similarity.embedding_near_dups
   re-run over the whole union.

Plus the equivalence the numbers depend on: union of round-0 + delta
pairs vs the full re-run (symmetric difference must be 0).

Prints one JSON object; results land in BENCH/embed_delta.json.
Box-idle discipline applies (BENCH/BASELINE.md methodology).

Usage: python BENCH/run_embed_delta.py [base_sizes_csv] [n_delta]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _measure import cpu_stat, steal_pct  # noqa: E402

DIM = 64
# 16 bits → 65,536 buckets: at 1M random vectors the mean bucket is ~15
# members, far under skew.DEFAULT_MAX_BUCKET (256), so the star cap never
# fires and the union==batch equivalence is exact (under capping the two
# paths legitimately diverge — the documented minhash contract). Recall
# is identical on both sides by construction (same buckets).
CFG = dict(dim=DIM, threshold=0.9, n_bits=16, seed=42)


def build_vectors(path: str, n: int, start_id: int, dup_frac: float,
                  seed: int, dup_source: np.ndarray | None = None):
    """Write (vec_id, embedding) parquet; returns the fresh vectors so a
    delta can near-duplicate base vectors. Near-dups = source + 2% noise,
    renormalized (cosine ≈ 0.999)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    n_dup = int(n * dup_frac)
    n_fresh = n - n_dup
    fresh = rng.standard_normal((n_fresh, DIM)).astype(np.float32)
    fresh /= np.linalg.norm(fresh, axis=1, keepdims=True)
    pool = fresh if dup_source is None else dup_source
    src = pool[rng.integers(len(pool), size=n_dup)]
    dups = src + 0.02 * rng.standard_normal((n_dup, DIM)).astype(np.float32)
    dups /= np.linalg.norm(dups, axis=1, keepdims=True)
    m = np.concatenate([fresh, dups]).astype(np.float32)
    ids = np.arange(start_id, start_id + n, dtype=np.int64)
    tbl = pa.table({
        "vec_id": ids,
        "embedding": pa.array(list(m), type=pa.list_(pa.float32())),
    })
    pq.write_table(tbl, path)
    return fresh


def main() -> int:
    sizes = [int(x) for x in
             (sys.argv[1] if len(sys.argv) > 1 else "200000,1000000").split(",")]
    n_delta = int(sys.argv[2]) if len(sys.argv) > 2 else 10000

    from pyspark.sql import functions as F  # noqa: F401

    from ocr_toolkit_spark.operators.incremental import (
        incremental_embedding_round,
    )
    from ocr_toolkit_spark.operators.similarity import embedding_near_dups
    from ocr_toolkit_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="embed-delta-bench", master=f"local[{cpus}]")
    out = {"dim": DIM, "n_delta": n_delta, "cpus": cpus, "cfg": CFG,
           "ladder": []}

    for n_base in sizes:
        root = tempfile.mkdtemp(prefix="embed_delta_")
        base_p = os.path.join(root, "base.parquet")
        delta_p = os.path.join(root, "delta.parquet")
        state = os.path.join(root, "state")
        fresh = build_vectors(base_p, n_base, 0, 0.05, seed=1)
        build_vectors(delta_p, n_delta, n_base, 0.20, seed=2,
                      dup_source=fresh)
        base = spark.read.parquet(base_p)
        delta = spark.read.parquet(delta_p)
        union = base.unionByName(delta)

        c0, t0 = cpu_stat(), time.time()
        p0 = incremental_embedding_round(
            spark, base, base, state, "base", **CFG)
        n0 = p0.count()
        boot = {"sec": round(time.time() - t0, 2), "pairs": n0,
                "steal_pct": steal_pct(c0, cpu_stat())}

        c0, t0 = cpu_stat(), time.time()
        p1 = incremental_embedding_round(
            spark, delta, union, state, "delta", **CFG)
        n1 = p1.count()
        drun = {"sec": round(time.time() - t0, 2), "pairs": n1,
                "steal_pct": steal_pct(c0, cpu_stat())}

        c0, t0 = cpu_stat(), time.time()
        full = embedding_near_dups(
            union, dim=DIM, threshold=CFG["threshold"],
            n_bits=CFG["n_bits"], seed=CFG["seed"],
            id_col="vec_id", vec_col="embedding",
        )
        fset = {(r.id_a, r.id_b) for r in full.select("id_a", "id_b").collect()}
        frun = {"sec": round(time.time() - t0, 2), "pairs": len(fset),
                "steal_pct": steal_pct(c0, cpu_stat())}

        iset = ({(r.id_a, r.id_b) for r in p0.select("id_a", "id_b").collect()}
                | {(r.id_a, r.id_b) for r in p1.select("id_a", "id_b").collect()})
        leg = {"n_base": n_base, "bootstrap": boot, "delta": drun,
               "full": frun, "pair_sym_diff": len(iset ^ fset),
               "speedup_delta_vs_full": round(frun["sec"] / drun["sec"], 2)}
        out["ladder"].append(leg)
        print(json.dumps(leg), flush=True)
        shutil.rmtree(root, ignore_errors=True)

    print(json.dumps(out), flush=True)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "embed_delta.json"), "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
