"""Delta-dedup lifecycle soak at 1M scale (r5 verdict #5 + #1's soak leg).

The full production ingest loop, composed end-to-end across enough cycles
that BOTH tables cross their expiry boundaries:

per cycle (36 × 28k docs ≈ 1M):
1. a new documents file lands; `stream_extract_committed` drains it into
   the snapshot-committed extraction table (one snapshot per cycle);
2. `dedup_extracted_changes` consumes (cursor, tip]: renders the new
   docs' markdown, runs ONE incremental dedup round against the persisted
   signature state (broadcast-semi-join, state never shuffled), appends
   the state ingest; the cursor advances;
3. `expire_snapshots(keep_last=4)` prunes the EXTRACTION table's history —
   past the first fold checkpoint (snapshot 32) this actually deletes
   log files BEHIND the advancing dedup cursor, proving the cursor
   survives expiry;

state-table maintenance events (the r5 verdict-#1 lifecycle, at scale):
- cycle 18 and 30: `compact_signature_state` (per-ingest file rewrite,
  band-sorted);
- cycle 31: `gc_signature_state` tombstones 1k cycle-0 docs (repair
  pairs verified against the live corpus);
- cycle 33: `merge_signature_state` collapses all ~33 ingest partitions
  into ONE (r6b atomic claim-and-de-own) — later cycles append on top;
- cycle 34: `expire_signature_state(keep_last=4)` once the state log
  crossed ITS checkpoint.

Final checks: per-cycle delta pairs all touch that cycle's docs; the
accumulated pair set (pruned of tombstones ∪ GC repair) vs a full batch
re-run over the final live corpus — symmetric difference must be 0
(no caps fire at these dup-group sizes); total docs identity.

Prints one JSON object; results land in BENCH/delta_lifecycle.json.
Usage: python BENCH/run_delta_lifecycle.py [cycles] [docs_per_cycle]
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
from run_delta_dedup import VOCAB  # noqa: E402

CFG = dict(k=5, n_hashes=32, bands=8, threshold=0.5)


def make_cycle_docs(rng, cycle, n, pool, start_uid):
    """70% fresh, 15% exact copies of earlier docs, 15% near copies —
    duplicates deliberately cross cycle boundaries via `pool`."""
    n_fresh = int(n * 0.70)
    n_exact = int(n * 0.15)
    n_near = n - n_fresh - n_exact
    lens = rng.integers(30, 60, size=n_fresh)
    texts = [
        " ".join(rng.choice(VOCAB, size=ln)) + f" uid{start_uid + i}"
        for i, ln in enumerate(lens)
    ]
    fresh_end = len(texts)
    if pool:
        for s in rng.integers(0, len(pool), size=n_exact):
            texts.append(pool[int(s)])
        for s in rng.integers(0, len(pool), size=n_near):
            toks = pool[int(s)].split()
            toks[int(rng.integers(0, len(toks) - 1))] = str(rng.choice(VOCAB))
            texts.append(" ".join(toks))
    else:  # cycle 0: dups drawn from this cycle's own fresh docs
        for s in rng.integers(0, fresh_end, size=n_exact + n_near):
            texts.append(texts[int(s)])
    pool.extend(texts[:fresh_end])
    return [
        (f"c{cycle:02d}-{i:06d}",
         [{"kind": "text", "text": t, "media_ref": "", "offset": 0}])
        for i, t in enumerate(texts)
    ]


def main() -> int:
    cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 36
    per_cycle = int(sys.argv[2]) if len(sys.argv) > 2 else 28_000
    keep_last = 4
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    cache = os.environ.get("SPARK_GRAFT_BENCH_CACHE",
                           "/dev/shm/ocr_toolkit_bench")
    root = os.path.join(cache, "delta_lifecycle")
    shutil.rmtree(root, ignore_errors=True)
    in_dir = os.path.join(root, "in")
    table = os.path.join(root, "table")
    ckpt = os.path.join(root, "ckpt")
    state = os.path.join(root, "sigstate")
    os.makedirs(in_dir)

    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    from ocr_toolkit_spark import io as tio
    from ocr_toolkit_spark.fixtures import to_arrow
    from ocr_toolkit_spark.operators.dedup import (
        jaccard_verify,
        minhash_lsh_candidates,
    )
    from ocr_toolkit_spark.operators.incremental import (
        compact_signature_state,
        merge_signature_state,
        dedup_extracted_changes,
        expire_signature_state,
        gc_signature_state,
        read_signature_state,
    )
    from ocr_toolkit_spark.pipeline import render_markdown_col
    from ocr_toolkit_spark.session import get_spark
    from ocr_toolkit_spark.streaming.stream_extract import (
        stream_extract_committed,
    )

    spark = get_spark(app_name="delta_lifecycle", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    rng = np.random.default_rng(42)
    pool: list[str] = []
    out_j: dict = {"cycles": cycles, "docs_per_cycle": per_cycle,
                   "keep_last": keep_last, "cpus": cpus, "per_cycle": [],
                   "maintenance": []}

    cursor = 0
    total_docs = 0
    all_pairs: set = set()
    tomb_ids: list[str] = []
    for c in range(cycles):
        docs = make_cycle_docs(rng, c, per_cycle, pool,
                               start_uid=c * per_cycle)
        pq.write_table(to_arrow(docs), os.path.join(in_dir, f"c{c}.parquet"))
        total_docs += len(docs)

        c0, t0 = cpu_stat(), time.time()
        q = stream_extract_committed(spark, in_dir, table, ckpt)
        q.awaitTermination(900)
        t_ingest = time.time() - t0

        tip = tio.latest_snapshot_id(table)
        t0 = time.time()
        pairs = dedup_extracted_changes(
            spark, table, state, cursor, tip,
            run_id=f"dedup-{cursor}-{tip}", partition_col="batch_id",
            **CFG,
        )
        rows = pairs.select("id_a", "id_b").collect()
        t_dedup = time.time() - t0
        prefix = f"c{c:02d}-"
        assert all(
            r.id_a.startswith(prefix) or r.id_b.startswith(prefix)
            for r in rows
        ), f"cycle {c}: delta pair not touching this cycle's docs"
        all_pairs |= {(r.id_a, r.id_b) for r in rows}
        cursor = tip

        t0 = time.time()
        expired = tio.expire_snapshots(table, keep_last)
        t_expire = time.time() - t0

        rec = {
            "cycle": c,
            "ingest_sec": round(t_ingest, 2),
            "dedup_delta_sec": round(t_dedup, 2),
            "delta_pairs": len(rows),
            "table_expired": len(expired),
            "state_ingests": tio.latest_snapshot_id(state),
            "steal_pct": round(steal_pct(c0, cpu_stat()), 1),
        }
        out_j["per_cycle"].append(rec)
        print(json.dumps(rec), flush=True)

        # --- state-table maintenance events --------------------------------
        if c in (18, 30):
            c0, t0 = cpu_stat(), time.time()
            res = compact_signature_state(spark, state, f"state-compact-{c}")
            out_j["maintenance"].append({
                "cycle": c, "op": "state_compact",
                "sec": round(time.time() - t0, 2),
                "steal_pct": round(steal_pct(c0, cpu_stat()), 1), **res})
            print(json.dumps(out_j["maintenance"][-1]), flush=True)
        if c == 31:
            # tombstone 1k cycle-0 docs; live corpus = rendered markdown of
            # everything else
            tomb_ids = [f"c00-{i:06d}" for i in range(1000)]
            tomb = spark.createDataFrame([(t,) for t in tomb_ids],
                                         "id string")
            live = (
                spark.read.parquet(table).filter("success")
                .filter(~F.col("doc_id").isin(tomb_ids))
                .select("doc_id", render_markdown_col().alias("text"))
            )
            c0, t0 = cpu_stat(), time.time()
            repair = gc_signature_state(spark, tomb, live, state,
                                        "state-gc-31")
            rep_rows = repair.select("id_a", "id_b").collect()
            out_j["maintenance"].append({
                "cycle": c, "op": "state_gc",
                "sec": round(time.time() - t0, 2),
                "tombstones": len(tomb_ids),
                "repair_pairs": len(rep_rows),
                "steal_pct": round(steal_pct(c0, cpu_stat()), 1)})
            print(json.dumps(out_j["maintenance"][-1]), flush=True)
            ts = set(tomb_ids)
            all_pairs = {(a, b) for a, b in all_pairs
                         if a not in ts and b not in ts}
            all_pairs |= {(r.id_a, r.id_b) for r in rep_rows}
        if c == 33:
            # collapse ~33 ingest partitions into ONE (r6b) — the
            # partition-count cost center; later cycles append on top and
            # the final pair_sym_diff must still be 0
            c0, t0 = cpu_stat(), time.time()
            res = merge_signature_state(spark, state, "state-merge-33")
            out_j["maintenance"].append({
                "cycle": c, "op": "state_merge",
                "sec": round(time.time() - t0, 2),
                "steal_pct": round(steal_pct(c0, cpu_stat()), 1), **res})
            print(json.dumps(out_j["maintenance"][-1]), flush=True)
        if c == 34:
            t0 = time.time()
            exp = expire_signature_state(state, keep_last)
            out_j["maintenance"].append({
                "cycle": c, "op": "state_expire",
                "sec": round(time.time() - t0, 3), "expired": len(exp)})
            print(json.dumps(out_j["maintenance"][-1]), flush=True)

    # --- final equivalence: accumulated delta pairs vs full batch re-run ----
    live_docs = spark.read.parquet(table).filter("success")
    if tomb_ids:
        live_docs = live_docs.filter(~F.col("doc_id").isin(tomb_ids))
    rendered = live_docs.select("doc_id", render_markdown_col().alias("text"))
    c0, t0 = cpu_stat(), time.time()
    full = jaccard_verify(
        minhash_lsh_candidates(rendered, k=CFG["k"],
                               n_hashes=CFG["n_hashes"], bands=CFG["bands"]),
        rendered, k=CFG["k"], threshold=CFG["threshold"])
    full_set = {(r.id_a, r.id_b)
                for r in full.select("id_a", "id_b").collect()}
    t_full = time.time() - t0

    st = read_signature_state(spark, state)
    out_j.update({
        "total_docs": total_docs,
        "inc_pairs": len(all_pairs),
        "full_pairs": len(full_set),
        "pair_sym_diff": len(all_pairs ^ full_set),
        "full_rerun_sec": round(t_full, 2),
        "full_rerun_steal_pct": round(steal_pct(c0, cpu_stat()), 1),
        "sum_delta_sec": round(
            sum(x["dedup_delta_sec"] for x in out_j["per_cycle"]), 2),
        "state_rows": st.count(),
        "state_report": {
            k: v for k, v in tio.table_report(state).items()
            if k != "by_partition"
        },
    })

    # --- r6b retention leg: merge sources live exactly as long as the ---
    # history referencing them. While retained snapshots still resolve
    # the pre-merge ingests, the sweep must refuse them (they are
    # `historical`, time-travel-reachable); after padding the log past
    # the next fold checkpoint, expiry drops that history and the SAME
    # sweep reclaims every source dir — state rows never move.
    rows_before = st.count()
    rep0 = tio.table_report(state)
    refused = tio.sweep_orphan_partitions(state, older_than_s=-5)
    if refused:
        raise AssertionError(
            f"sweep reclaimed retained history: {refused}")
    n_hist = len(rep0["historical_partitions"])
    # pad with pure log commits (no data) until the fold boundary of the
    # oldest retained id can pass the merge commit, then expire
    tip_owned = [int(p) for p in
                 tio.partitions_as_of(state, tio.latest_snapshot_id(state))]
    target = ((tio.latest_snapshot_id(state) // tio.CHECKPOINT_EVERY) + 1
              ) * tio.CHECKPOINT_EVERY + keep_last
    t0 = time.time()
    while tio.latest_snapshot_id(state) < target:
        tio.snapshot_commit(state, f"retention-pad-{tio.latest_snapshot_id(state)}",
                            [max(tip_owned)])
    expired = tio.expire_snapshots(state, keep_last)
    swept = tio.sweep_orphan_partitions(state, older_than_s=-5)
    rows_after = read_signature_state(spark, state).count()
    out_j["retention"] = {
        "historical_before": n_hist,
        "sweep_refused_while_retained": True,
        "expired_snapshots": len(expired),
        "swept_after_expiry": len(swept),
        "state_rows_before": rows_before,
        "state_rows_after": rows_after,
        "sec": round(time.time() - t0, 2),
    }
    if rows_after != rows_before:
        raise AssertionError(
            f"retention leg changed state rows: {rows_before} -> {rows_after}")
    if n_hist and len(swept) < n_hist:
        raise AssertionError(
            f"expiry freed history but sweep reclaimed only {swept} "
            f"of {n_hist} historical partitions")
    print(json.dumps({"retention": out_j["retention"]}), flush=True)
    print(json.dumps({k: v for k, v in out_j.items()
                      if k not in ("per_cycle", "maintenance")}), flush=True)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "delta_lifecycle.json"), "w") as f:
        json.dump(out_j, f, indent=1)
    spark.stop()
    shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
