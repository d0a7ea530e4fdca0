"""Dedup/ANN scale soak: the full near-dup path on a 200k-document corpus
(40× the sf0.1 documents table) with a controlled duplicate structure, plus
ANN top-k over 200k synthetic embeddings.

Corpus: seeded vocabulary sentences; 60% unique docs, 25% exact duplicates
of earlier docs, 15% near-duplicates (one token substituted per ~40 tokens),
so exact/minhash recall is checkable against construction ground truth.

Prints one JSON line per stage; results land in BENCH/dedup_scale.json.
Box-idle discipline applies (see BENCH/BASELINE.md methodology).

Usage: python BENCH/run_dedup_scale.py [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VOCAB = (
    "snapshot commit vector token shingle hash bucket join scan filter "
    "partition lineage resume salt skew window session stream batch arrow "
    "kernel span document extract quality score method markdown table page "
    "image media text heading cluster dedup similar embed probe band chunk"
).split()


def build_corpus(path: str, n_docs: int, seed: int = 42) -> dict:
    rng = np.random.default_rng(seed)
    n_unique = int(n_docs * 0.60)
    n_exact = int(n_docs * 0.25)
    n_near = n_docs - n_unique - n_exact

    lens = rng.integers(30, 60, size=n_unique)
    uniq = [
        " ".join(rng.choice(VOCAB, size=ln))
        + f" uid{i}"  # uniquifier token so 'unique' docs never collide
        for i, ln in enumerate(lens)
    ]
    texts = list(uniq)
    src_exact = rng.integers(0, n_unique, size=n_exact)
    texts += [uniq[s] for s in src_exact]
    src_near = rng.integers(0, n_unique, size=n_near)
    for s in src_near:
        toks = uniq[s].split()
        toks[int(rng.integers(0, len(toks) - 1))] = str(rng.choice(VOCAB))
        texts.append(" ".join(toks))

    import pyarrow as pa
    import pyarrow.parquet as pq

    order = rng.permutation(n_docs)
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
        "text": pa.array([texts[i] for i in order]),
    })
    pq.write_table(tbl, path, row_group_size=8192)
    return {"n_unique": n_unique, "n_exact": n_exact, "n_near": n_near}


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    base = os.environ.get("SPARK_GRAFT_BENCH_CACHE",
                          "/dev/shm/ocr_toolkit_bench")
    os.makedirs(base, exist_ok=True)
    corpus = os.path.join(base, f"dedup_scale_{n_docs}.parquet")
    if not os.path.exists(corpus):
        truth = build_corpus(corpus, n_docs)
    else:
        truth = {"n_unique": int(n_docs * 0.60),
                 "n_exact": int(n_docs * 0.25),
                 "n_near": n_docs - int(n_docs * 0.60) - int(n_docs * 0.25)}

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "64g")
    from pyspark.sql import functions as F

    from ocr_toolkit_spark.operators import dedup
    from ocr_toolkit_spark.operators.cc import near_dedup_keep_first
    from ocr_toolkit_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        lsh_topk,
    )
    from ocr_toolkit_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="dedup-scale", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.range(10).count()
    d = spark.read.parquet(corpus)
    d.count()

    results: dict = {"n_docs": n_docs, "cpus": cpus, "truth": truth}

    t0 = time.time()
    r = dedup.exact_dedup_stats(d).collect()[0]
    results["exact"] = {
        "seconds": round(time.time() - t0, 2),
        "duplicate_docs": int(r.duplicate_docs),
    }

    t0 = time.time()
    cand = dedup.minhash_lsh_candidates(d, "doc_id", "text", k=5,
                                        n_hashes=32, bands=8)
    pairs = dedup.jaccard_verify(cand, d, "doc_id", "text", k=5,
                                 threshold=0.8)
    kept = near_dedup_keep_first(d, pairs)
    n_kept = kept.count()
    results["minhash_cc_keep_first"] = {
        "seconds": round(time.time() - t0, 2),
        "verified_pairs": pairs.count(),
        "docs_kept": n_kept,
        "docs_removed": n_docs - n_kept,
    }

    from ocr_toolkit_spark.operators.cc import full_near_dedup_keep_first

    t0 = time.time()
    kept_fast = full_near_dedup_keep_first(d, k=5, n_hashes=32, bands=8,
                                           threshold=0.8)
    # SET equality, not count equality — counts can coincide while the
    # two paths kept different documents. Materialized id projections so
    # neither heavy pipeline re-executes for the two excepts.
    ids_fast = kept_fast.select("doc_id").localCheckpoint(eager=True)
    n_kept_fast = ids_fast.count()
    fast_seconds = round(time.time() - t0, 2)  # before the untimed compare
    ids_direct = kept.select("doc_id").localCheckpoint(eager=True)
    sym_diff = (
        ids_fast.exceptAll(ids_direct).count()
        + ids_direct.exceptAll(ids_fast).count()
    )
    results["exact_collapse_then_minhash"] = {
        "seconds": fast_seconds,
        "docs_kept": n_kept_fast,
        "keep_set_symmetric_difference": sym_diff,
        "same_keep_set_as_direct": sym_diff == 0,
    }

    t0 = time.time()
    sh = dedup.simhash_near_dups(d, "doc_id", "text", max_hamming=3)
    results["simhash"] = {
        "seconds": round(time.time() - t0, 2),
        "pairs": sh.count(),
    }

    # --- ANN over synthetic embeddings (same scale) -----------------------
    # Mixture of Gaussians (1000 centers, sigma 0.35): document embeddings
    # cluster by topic — i.i.d. Gaussian vectors are the no-structure
    # adversarial case where NO sublinear ANN can beat chance (near-
    # orthogonal neighbors), so the soak uses the realistic geometry and
    # says so. The driver-table recall floors cover the small-scale case.
    rng = np.random.default_rng(7)
    dim = 64
    centers = rng.standard_normal((1000, dim))
    assign = rng.integers(0, 1000, size=n_docs)
    emb = (centers[assign]
           + 0.35 * rng.standard_normal((n_docs, dim))).astype(np.float32)
    import pyarrow as pa
    import pyarrow.parquet as pq

    epath = os.path.join(base, f"emb_scale_{n_docs}.parquet")
    if not os.path.exists(epath):
        pq.write_table(pa.table({
            "vec_id": pa.array(np.arange(n_docs, dtype=np.int64)),
            "embedding": pa.array(list(emb)),
        }), epath, row_group_size=8192)
    e = spark.read.parquet(epath)
    e.count()
    q = e.filter(F.col("vec_id") < 20)

    t0 = time.time()
    bf = {(r.query_id, r.neighbor_id)
          for r in brute_force_topk(e, q, k=10).collect()}
    results["ann_bruteforce"] = {"seconds": round(time.time() - t0, 2)}

    for name, fn in [
        ("ann_lsh", lambda: lsh_topk(e, q, dim=dim, k=10, n_bits=10,
                                     n_probe=3, n_tables=4)),
        ("ann_ivf", lambda: ivf_topk(e, q, dim=dim, k=10, n_centroids=256,
                                     n_probe=16)),
    ]:
        t0 = time.time()
        got = {(r.query_id, r.neighbor_id) for r in fn().collect()}
        results[name] = {
            "seconds": round(time.time() - t0, 2),
            "recall_at_10": round(len(got & bf) / len(bf), 3),
        }

    spark.stop()
    out = os.path.join(REPO, "BENCH", "dedup_scale.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
