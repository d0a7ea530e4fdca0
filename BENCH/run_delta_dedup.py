"""Incremental-dedup scale soak: delta cost must track the DELTA, not the
table (r4 verdict #2 — the 100-TB ingest shape).

Corpus: a seeded base table (default 200k docs) and a delta ingest
(default 10k docs; 60% fresh, 20% exact copies of base docs, 20%
one-token near-copies of base docs). Three measured legs:

1. `bootstrap` — round 0: MinHash banded signatures for the base corpus,
   committed as signature-state ingest 0 (one-time cost, amortized over
   every later ingest).
2. `delta`     — the incremental round: signatures for the 10k new docs
   only, broadcast-semi-join against the state, star-capped candidates,
   exact Jaccard verify, state append.
3. `full`      — the naive alternative: complete re-run of the batch
   near-dup path over the 210k union.

Plus the equivalence check the numbers depend on: the union of round-0 +
delta pairs vs the full re-run's pairs (symmetric difference must be 0,
same discipline as cc.full_near_dedup_keep_first's soak).

Prints one JSON object; results land in BENCH/delta_dedup.json.
Box-idle discipline applies (BENCH/BASELINE.md methodology).

Usage: python BENCH/run_delta_dedup.py [n_base] [n_delta]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _measure import cpu_stat, steal_pct  # noqa: E402

VOCAB = (
    "snapshot commit vector token shingle hash bucket join scan filter "
    "partition lineage resume salt skew window session stream batch arrow "
    "kernel span document extract quality score method markdown table page "
    "image media text heading cluster dedup similar embed probe band chunk"
).split()

CFG = dict(k=5, n_hashes=32, bands=8)
THRESHOLD = 0.5


def build_tables(base_path: str, delta_path: str, n_base: int,
                 n_delta: int, seed: int = 42) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    lens = rng.integers(30, 60, size=n_base)
    base = [
        " ".join(rng.choice(VOCAB, size=ln)) + f" uid{i}"
        for i, ln in enumerate(lens)
    ]
    pq.write_table(
        pa.table({"doc_id": pa.array(np.arange(n_base, dtype=np.int64)),
                  "text": pa.array(base)}),
        base_path, row_group_size=8192)

    n_fresh = int(n_delta * 0.60)
    n_exact = int(n_delta * 0.20)
    n_near = n_delta - n_fresh - n_exact
    fresh_lens = rng.integers(30, 60, size=n_fresh)
    texts = [
        " ".join(rng.choice(VOCAB, size=ln)) + f" uid{n_base + i}"
        for i, ln in enumerate(fresh_lens)
    ]
    texts += [base[s] for s in rng.integers(0, n_base, size=n_exact)]
    for s in rng.integers(0, n_base, size=n_near):
        toks = base[s].split()
        toks[int(rng.integers(0, len(toks) - 1))] = str(rng.choice(VOCAB))
        texts.append(" ".join(toks))
    pq.write_table(
        pa.table({
            "doc_id": pa.array(np.arange(n_base, n_base + n_delta,
                                         dtype=np.int64)),
            "text": pa.array(texts)}),
        delta_path, row_group_size=8192)


def main() -> int:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_delta = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    cache = os.environ.get("SPARK_GRAFT_BENCH_CACHE",
                           "/dev/shm/ocr_toolkit_bench")
    os.makedirs(cache, exist_ok=True)
    base_p = os.path.join(cache, f"delta_base_{n_base}.parquet")
    delta_p = os.path.join(cache, f"delta_new_{n_base}_{n_delta}.parquet")
    if not (os.path.exists(base_p) and os.path.exists(delta_p)):
        build_tables(base_p, delta_p, n_base, n_delta)

    from ocr_toolkit_spark.operators.dedup import (
        jaccard_verify,
        minhash_banded_frame,
        minhash_lsh_candidates,
    )
    from ocr_toolkit_spark.operators.incremental import (
        append_signatures,
        incremental_dedup_round,
    )
    from ocr_toolkit_spark.session import get_spark

    spark = get_spark(app_name="delta_dedup_bench", master=f"local[{cpus}]")
    state = os.path.join(cache, "delta_sig_state")
    shutil.rmtree(state, ignore_errors=True)

    base_df = spark.read.parquet(base_p)
    delta_df = spark.read.parquet(delta_p)
    union_df = base_df.unionByName(delta_df)
    out: dict = {"n_base": n_base, "n_delta": n_delta, "cpus": cpus,
                 "cfg": {**CFG, "threshold": THRESHOLD}}

    def leg(name, fn):
        c0, t0 = cpu_stat(), time.time()
        res = fn()
        dt = time.time() - t0
        out[name] = {"sec": round(dt, 2),
                     "steal_pct": round(steal_pct(c0, cpu_stat()), 1)}
        print(json.dumps({name: out[name]}), flush=True)
        return res

    # 1. bootstrap: round-0 signatures + base self-pairs + state commit
    def bootstrap():
        return incremental_dedup_round(
            spark, base_df, base_df, state, "ingest-0",
            threshold=THRESHOLD, **CFG)
    p0 = leg("bootstrap", bootstrap)

    # 2. the delta round (the recurring cost at every future ingest)
    def delta_round():
        return incremental_dedup_round(
            spark, delta_df, union_df, state, "ingest-1",
            threshold=THRESHOLD, **CFG)
    p1 = leg("delta", delta_round)
    out["delta_pairs"] = p1.count()

    # 3. the naive full re-run over the union
    def full_run():
        cand = minhash_lsh_candidates(union_df, **CFG)
        pairs = jaccard_verify(cand, union_df, k=CFG["k"],
                               threshold=THRESHOLD)
        return pairs.localCheckpoint(eager=True)
    full = leg("full", full_run)
    out["full_pairs"] = full.count()

    # equivalence: (round-0 ∪ delta) pairs == full re-run pairs
    inc = p0.select("id_a", "id_b").unionByName(p1.select("id_a", "id_b"))
    fp = full.select("id_a", "id_b")
    out["pair_sym_diff"] = (
        inc.exceptAll(fp).unionAll(fp.exceptAll(inc)).count()
    )
    out["inc_pairs"] = inc.count()

    # scale verdict: the recurring delta cost vs re-running the world,
    # and vs proportionality (delta share of the union's docs)
    out["delta_speedup_vs_full"] = round(
        out["full"]["sec"] / out["delta"]["sec"], 2)
    out["delta_share_of_docs"] = round(n_delta / (n_base + n_delta), 4)
    out["delta_share_of_time"] = round(
        out["delta"]["sec"] / out["full"]["sec"], 4)

    # amortization: state reuse pays off after this many ingests
    out["bootstrap_amortized_after_ingests"] = round(
        out["bootstrap"]["sec"]
        / max(out["full"]["sec"] - out["delta"]["sec"], 1e-9), 2)

    print(json.dumps(out), flush=True)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "delta_dedup.json"), "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()
    return 0 if out["pair_sym_diff"] == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
