"""Incremental IVF index (r5 verdict #8): delta appends assign with the
frozen quantizer, commit through the snapshot log, refuse drifted
distributions loudly — and delta-indexed recall matches a full rebuild."""

import os

import numpy as np
import pytest

from pyspark.sql import functions as F

from ocr_toolkit_spark import io as tio
from ocr_toolkit_spark.operators.ivf_index import (
    IvfDriftError,
    append_ivf_index,
    build_ivf_index,
    compact_ivf_index,
    ivf_index_meta,
    ivf_index_topk,
    read_ivf_index,
)
from ocr_toolkit_spark.operators.similarity import brute_force_topk

DIM = 16
N_CLUSTERS = 8


def _clustered(seed, n, start_id=0, noise=0.05, centers_seed=7):
    """Unit vectors tightly packed around N_CLUSTERS shared centers —
    within-cluster cosine ≫ across, so true neighbors share a cell and
    recall is deterministic."""
    rng = np.random.default_rng(seed)
    crng = np.random.default_rng(centers_seed)
    centers = crng.standard_normal((N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(n):
        c = centers[(start_id + i) % N_CLUSTERS]
        v = c + noise * rng.standard_normal(DIM)
        v = v / np.linalg.norm(v)
        rows.append((start_id + i, [float(x) for x in v]))
    return rows


def _mk(spark, rows):
    return spark.createDataFrame(rows, "vec_id int, embedding array<float>")


def _recall(ann, bf):
    hits = ann.join(
        bf.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"], "left_semi",
    ).count()
    total = bf.count()
    return hits / total if total else 1.0


def test_delta_append_recall_matches_full_rebuild(spark, tmpdir_path):
    base = _clustered(1, 400)
    delta = _clustered(2, 100, start_id=1000)
    union = base + delta
    queries = _mk(spark, _clustered(3, 10, start_id=5000))

    idx = os.path.join(tmpdir_path, "ivf")
    rep = build_ivf_index(spark, _mk(spark, base), DIM, idx, "base",
                          n_centroids=N_CLUSTERS, seed=11)
    assert rep["n_vectors"] == 400 and rep["base_qerr"] > 0
    arep = append_ivf_index(spark, _mk(spark, delta), idx, "delta-1")
    assert arep["ingest_id"] == 1 and arep["n_vectors"] == 100
    assert arep["qerr_ratio"] < 1.5  # same distribution: no drift

    assert read_ivf_index(spark, idx).count() == 500
    bf = brute_force_topk(_mk(spark, union), queries, k=5)
    ann_delta = ivf_index_topk(spark, queries, idx, k=5, n_probe=2)
    r_delta = _recall(ann_delta, bf)

    # full rebuild on the union (fresh path, re-trained quantizer)
    idx2 = os.path.join(tmpdir_path, "ivf_full")
    build_ivf_index(spark, _mk(spark, union), DIM, idx2, "full",
                    n_centroids=N_CLUSTERS, seed=11)
    r_full = _recall(ivf_index_topk(spark, queries, idx2, k=5, n_probe=2), bf)

    assert r_delta >= 0.9 and r_full >= 0.9
    assert abs(r_delta - r_full) <= 0.05  # delta path ≈ full rebuild


def test_append_idempotent_on_run_id(spark, tmpdir_path):
    idx = os.path.join(tmpdir_path, "ivf")
    build_ivf_index(spark, _mk(spark, _clustered(4, 100)), DIM, idx, "base",
                    n_centroids=N_CLUSTERS)
    d = _mk(spark, _clustered(5, 40, start_id=1000))
    append_ivf_index(spark, d, idx, "round-1")
    n = read_ivf_index(spark, idx).count()
    tip = tio.latest_snapshot_id(idx)

    rep = append_ivf_index(spark, d, idx, "round-1")  # replay
    assert rep.get("replayed") and rep["ingest_id"] == 1
    assert tio.latest_snapshot_id(idx) == tip
    assert read_ivf_index(spark, idx).count() == n


def test_drift_trigger_demands_retrain(spark, tmpdir_path):
    idx = os.path.join(tmpdir_path, "ivf")
    # tight base → small base_qerr; drifted delta from FRESH random
    # centers quantizes much worse against the frozen quantizer
    build_ivf_index(spark, _mk(spark, _clustered(6, 200, noise=0.02)),
                    DIM, idx, "base", n_centroids=N_CLUSTERS,
                    drift_ratio=2.0)
    drifted = _clustered(7, 50, start_id=1000, noise=0.02, centers_seed=99)
    with pytest.raises(IvfDriftError, match="Rebuild the index"):
        append_ivf_index(spark, _mk(spark, drifted), idx, "bad-delta")
    # nothing committed by the refused append
    assert tio.latest_snapshot_id(idx) == 1
    assert read_ivf_index(spark, idx).count() == 200

    # an in-distribution delta still appends fine afterwards
    ok = append_ivf_index(
        spark, _mk(spark, _clustered(8, 50, start_id=2000, noise=0.02)),
        idx, "good-delta")
    assert ok["ingest_id"] == 1 + 1 - 1  # next id after base = 1
    assert ok["qerr_ratio"] <= 2.0


def test_empty_delta_refused_and_meta_pinned(spark, tmpdir_path):
    idx = os.path.join(tmpdir_path, "ivf")
    build_ivf_index(spark, _mk(spark, _clustered(9, 80)), DIM, idx, "base",
                    n_centroids=N_CLUSTERS)
    meta = ivf_index_meta(idx)
    assert meta["n_centroids"] == N_CLUSTERS and meta["base_qerr"] > 0
    empty = spark.createDataFrame([], "vec_id int, embedding array<float>")
    with pytest.raises(ValueError, match="EMPTY delta"):
        append_ivf_index(spark, empty, idx, "r-empty")
    # double-build into the same path is refused (r6b: now caught on the
    # committed log BEFORE re-training, not at the pin)
    with pytest.raises(ValueError, match="already has committed ingests"):
        build_ivf_index(spark, _mk(spark, _clustered(9, 80)), DIM, idx,
                        "base2", n_centroids=N_CLUSTERS)


def test_probe_filter_prunes_cell_partitions(spark, tmpdir_path):
    """Scale shape: the probed-cell filter must land on the physical
    `cell` partition column so unprobed cells are pruned at file-listing
    time, not scanned."""
    idx = os.path.join(tmpdir_path, "ivf")
    build_ivf_index(spark, _mk(spark, _clustered(10, 200)), DIM, idx,
                    "base", n_centroids=N_CLUSTERS)
    queries = _mk(spark, _clustered(11, 3, start_id=5000))
    out = ivf_index_topk(spark, queries, idx, k=5, n_probe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the cell filter appears in PartitionFilters (pruning), not only as
    # a post-scan Filter
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("cell" in ln for ln in pf), pf


def test_generic_compaction_refuses_index_layout(spark, tmpdir_path):
    """r6: compact_extracted's single-level rewrite would flatten the
    index's ingest_id=N/cell=M layout and silently destroy probe
    pruning — it must refuse, not proceed."""
    from ocr_toolkit_spark import io as tio

    idx = os.path.join(tmpdir_path, "ivf")
    build_ivf_index(spark, _mk(spark, _clustered(12, 100)), DIM, idx,
                    "base", n_centroids=N_CLUSTERS)
    with pytest.raises(ValueError, match="probe-pruning|flatten"):
        tio.compact_extracted(spark, idx, run_id="bad-compact")


def test_orphan_uncommitted_ingest_excluded(spark, tmpdir_path):
    """Crash-consistency of index reads: an ingest partition whose
    parquet write landed but whose snapshot_commit did not must stay out
    of read_ivf_index and of query results — an orphan planted as an
    exact copy of a query vector would otherwise rank #1 with sim 1.0."""
    idx = os.path.join(tmpdir_path, "ivf")
    build_ivf_index(spark, _mk(spark, _clustered(13, 200)), DIM, idx,
                    "base", n_centroids=N_CLUSTERS)
    queries = _mk(spark, _clustered(14, 3, start_id=5000))

    # orphan = the first query vector itself, written to every cell so it
    # is guaranteed to sit inside a probed partition if it leaks
    qv = queries.limit(1).collect()[0]["embedding"]
    orphan = spark.createDataFrame(
        [(8000 + c, qv, c) for c in range(N_CLUSTERS)],
        "vec_id int, embedding array<float>, cell int",
    ).withColumn("ingest_id", F.lit(7))
    orphan.write.mode("append").partitionBy("ingest_id", "cell").parquet(idx)

    assert read_ivf_index(spark, idx).count() == 200
    out = ivf_index_topk(spark, queries, idx, k=5, n_probe=2)
    assert out.filter(F.col("neighbor_id") >= 8000).count() == 0
    # exclusion happens at listing time on the physical partition column
    plan = out._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("ingest_id" in ln for ln in pf), pf

    # a real append still commits the next sequential ingest and becomes
    # visible; the orphan stays invisible
    append_ivf_index(spark, _mk(spark, _clustered(15, 50, start_id=1000)),
                     idx, "delta-1")
    v = read_ivf_index(spark, idx)
    assert v.count() == 250
    assert v.filter(F.col("vec_id") >= 8000).count() == 0


def test_orphan_sweep_on_nested_index_layout(spark, tmpdir_path):
    """io.sweep_orphan_partitions reclaims an uncommitted ingest dir of
    the nested ingest_id=N/cell=M layout (age-guarded), leaving the
    committed index byte-identical to readers."""
    import time

    idx = os.path.join(tmpdir_path, "ivf")
    build_ivf_index(spark, _mk(spark, _clustered(16, 150)), DIM, idx,
                    "base", n_centroids=N_CLUSTERS)
    orphan = spark.createDataFrame(
        [(8100, [1.0] + [0.0] * (DIM - 1), 0)],
        "vec_id int, embedding array<float>, cell int",
    ).withColumn("ingest_id", F.lit(5))
    orphan.write.mode("append").partitionBy("ingest_id", "cell").parquet(idx)

    # young orphan: kept; backdated orphan: swept, committed rows intact
    assert tio.sweep_orphan_partitions(idx, older_than_s=3600) == []
    old = time.time() - 7200
    for dirpath, dirnames, filenames in os.walk(
            os.path.join(idx, "ingest_id=5")):
        os.utime(dirpath, (old, old))
        for n in filenames:
            os.utime(os.path.join(dirpath, n), (old, old))
    os.utime(os.path.join(idx, "ingest_id=5"), (old, old))
    assert tio.sweep_orphan_partitions(idx, older_than_s=3600) == ["5"]
    assert not os.path.isdir(os.path.join(idx, "ingest_id=5"))
    assert read_ivf_index(spark, idx).count() == 150


def test_compact_index_merges_ingests_preserving_pruning(spark, tmpdir_path):
    """compact_ivf_index merges N committed ingests into one: results and
    layout-pruning identical, files reduced, sources de-owned atomically,
    replay idempotent."""
    idx = os.path.join(tmpdir_path, "ivf")
    build_ivf_index(spark, _mk(spark, _clustered(17, 300)), DIM, idx,
                    "base", n_centroids=N_CLUSTERS)
    append_ivf_index(spark, _mk(spark, _clustered(18, 60, start_id=1000)),
                     idx, "d1")
    append_ivf_index(spark, _mk(spark, _clustered(19, 60, start_id=2000)),
                     idx, "d2")
    queries = _mk(spark, _clustered(20, 4, start_id=5000))
    before = sorted(
        map(tuple, ivf_index_topk(spark, queries, idx, k=5, n_probe=2)
            .collect())
    )

    rep = compact_ivf_index(spark, idx, "compact-1")
    assert rep["ingests_before"] == 3 and rep["new_ingest"] == 3
    assert rep["files_after"] < rep["files_before"]
    owners = tio.partitions_as_of(idx, tio.latest_snapshot_id(idx))
    assert sorted(owners) == ["3"]
    # r6b: sources are de-owned, NOT deleted — retained snapshots still
    # reference them (time travel); expiry + sweep reclaims them later
    assert rep["deowned"] == [0, 1, 2]
    for pid in (0, 1, 2):
        assert os.path.isdir(os.path.join(idx, f"ingest_id={pid}"))
    assert read_ivf_index(spark, idx).count() == 420

    after = sorted(
        map(tuple, ivf_index_topk(spark, queries, idx, k=5, n_probe=2)
            .collect())
    )
    assert before == after
    # probed-cell pruning survives the rewrite
    out = ivf_index_topk(spark, queries, idx, k=5, n_probe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("cell" in ln for ln in pf), pf

    # replay under the same run_id: nothing rewritten
    tip = tio.latest_snapshot_id(idx)
    rep2 = compact_ivf_index(spark, idx, "compact-1")
    assert rep2.get("replayed") and rep2["new_ingest"] == 3
    assert tio.latest_snapshot_id(idx) == tip

    # appends continue above the merged id
    nxt = append_ivf_index(
        spark, _mk(spark, _clustered(21, 30, start_id=3000)), idx, "d3")
    assert nxt["ingest_id"] == 4
    assert read_ivf_index(spark, idx).count() == 450


def test_compact_index_crash_window_never_double_counts(spark, tmpdir_path):
    """The commit de-owns sources and claims the merge in ONE snapshot, so
    even with the source dirs still on disk (crash before cleanup) no
    reader ever sees both copies; the leftovers are sweepable orphans."""
    idx = os.path.join(tmpdir_path, "ivf")
    build_ivf_index(spark, _mk(spark, _clustered(22, 150)), DIM, idx,
                    "base", n_centroids=N_CLUSTERS)
    append_ivf_index(spark, _mk(spark, _clustered(23, 50, start_id=1000)),
                     idx, "d1")
    rep = compact_ivf_index(spark, idx, "compact-1")
    assert rep["ingests_before"] == 2
    # sources still on disk, but de-owned → invisible, not doubled
    assert os.path.isdir(os.path.join(idx, "ingest_id=0"))
    assert read_ivf_index(spark, idx).count() == 200
    # r6b: the sweep must NOT reclaim them while retained snapshots
    # reference them (time travel / incremental catch-up) ...
    assert tio.sweep_orphan_partitions(idx, older_than_s=-5) == []
    assert os.path.isdir(os.path.join(idx, "ingest_id=0"))
    # ... only after expiry drops the pre-compaction history do they
    # become ordinary orphans (pad the log past the fold checkpoint so
    # expire_snapshots has room — pure log commits, no data)
    while tio.latest_snapshot_id(idx) < tio.CHECKPOINT_EVERY + 1:
        tio.snapshot_commit(idx, f"pad-{tio.latest_snapshot_id(idx)}", [2])
    assert tio.expire_snapshots(idx, keep_last=1)
    swept = tio.sweep_orphan_partitions(idx, older_than_s=-5)
    assert swept == ["0", "1"]
    assert read_ivf_index(spark, idx).count() == 200


def test_build_crash_between_pin_and_commit_is_recoverable(
        spark, tmpdir_path, monkeypatch):
    """r6b: a build that dies between _pin_files and ingest 0's snapshot
    commit used to wedge the path permanently (build raised 'already
    initialized', append crashed on an empty ownership map). The retry
    must re-train to the identical pin, tolerate it, and commit."""
    import ocr_toolkit_spark.operators.ivf_index as ivf

    idx = os.path.join(tmpdir_path, "ivf")
    base = _mk(spark, _clustered(41, 200))

    def boom(*a, **k):
        raise RuntimeError("simulated crash after pin")

    monkeypatch.setattr(ivf, "_write_ingest", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        build_ivf_index(spark, base, DIM, idx, "base",
                        n_centroids=N_CLUSTERS, seed=11)
    monkeypatch.undo()
    # wedged state: pinned, tip 0 — append must explain the recovery path
    assert ivf_index_meta(idx) is not None
    assert tio.latest_snapshot_id(idx) == 0
    with pytest.raises(ValueError, match="re-run build_ivf_index"):
        append_ivf_index(
            spark, _mk(spark, _clustered(42, 20, start_id=1000)), idx, "d1")

    # the retry completes end-to-end
    rep = build_ivf_index(spark, base, DIM, idx, "base",
                          n_centroids=N_CLUSTERS, seed=11)
    assert rep["n_vectors"] == 200 and tio.latest_snapshot_id(idx) == 1
    assert read_ivf_index(spark, idx).count() == 200

    # replay of the COMPLETED build: no new snapshot, no rewrite
    rep2 = build_ivf_index(spark, base, DIM, idx, "base",
                           n_centroids=N_CLUSTERS, seed=11)
    assert rep2.get("replayed") and tio.latest_snapshot_id(idx) == 1
    # a different run_id against a committed index is an error, not a
    # silent second base
    with pytest.raises(ValueError, match="already has committed ingests"):
        build_ivf_index(spark, base, DIM, idx, "base-2",
                        n_centroids=N_CLUSTERS, seed=11)

    # a retry with a DIFFERENT config against a wedged pin still refuses
    # loudly — tolerance is for the identical crashed build only
    idx2 = os.path.join(tmpdir_path, "ivf2")
    monkeypatch.setattr(ivf, "_write_ingest", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        build_ivf_index(spark, base, DIM, idx2, "base",
                        n_centroids=N_CLUSTERS, seed=11)
    monkeypatch.undo()
    with pytest.raises(ValueError, match="DIFFERENT quantizer/config"):
        build_ivf_index(spark, base, DIM, idx2, "base",
                        n_centroids=N_CLUSTERS, seed=12)


def test_zero_error_base_treats_any_drift_as_infinite(spark, tmpdir_path):
    """r6b: when the base's quantization error is exactly 0 (every base
    vector IS a centroid — tiny bases do this), the old ratio fell back
    to 1.0 and silently disabled the drift guard; any positive delta
    error must instead be infinite drift and refuse the append."""
    idx = os.path.join(tmpdir_path, "ivf0")
    base_rows = [(i, [1.0 if j == i else 0.0 for j in range(DIM)])
                 for i in range(4)]
    rep = build_ivf_index(spark, _mk(spark, base_rows), DIM, idx, "base",
                          n_centroids=4, seed=5)
    assert rep["base_qerr"] == 0.0
    drifted = _mk(spark, _clustered(43, 20, start_id=100))
    with pytest.raises(IvfDriftError):
        append_ivf_index(spark, drifted, idx, "d1")


def test_crashed_writer_stale_cells_never_leak(spark, tmpdir_path):
    """r6c: dynamic overwrite here is keyed on (ingest_id, cell), so a
    crashed writer's cells that a later writer's data does not cover
    would survive the overwrite and be committed as part of the later
    ingest — never-committed vectors served in every query. The target
    ingest dir is cleared before writing; this pins it."""
    idx = os.path.join(tmpdir_path, "ivf")
    build_ivf_index(spark, _mk(spark, _clustered(31, 200)), DIM, idx,
                    "base", n_centroids=N_CLUSTERS)

    # simulate a crashed append: ingest_id=1 fully written across MANY
    # cells (all 8 clusters), but no snapshot commit
    from ocr_toolkit_spark.operators.ivf_index import (
        _assigned, load_quantizer,
    )
    ghost = _assigned(
        _mk(spark, _clustered(32, 80, start_id=9000)),
        load_quantizer(idx), "vec_id", "embedding",
    )
    (
        ghost.withColumn("ingest_id", F.lit(1))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("ingest_id", "cell")
        .parquet(idx)
    )
    assert os.path.isdir(os.path.join(idx, "ingest_id=1"))

    # a DIFFERENT delta (one vector → one cell) reuses ingest id 1
    delta = _mk(spark, _clustered(33, 1, start_id=5000))
    rep = append_ivf_index(spark, delta, idx, "d1")
    assert rep["ingest_id"] == 1

    # the ghost's vectors are gone — not one leaked through the commit
    vecs = read_ivf_index(spark, idx)
    assert vecs.filter(F.col("vec_id") >= 9000).count() == 0
    assert vecs.count() == 201


def test_compact_index_noop_when_already_compact(spark, tmpdir_path):
    """r6c: compacting an already-compacted index (single ingest, ≤ one
    file per cell) is a noop — without it every rerun under a fresh
    run_id appends another replace snapshot and another historical
    directory."""
    idx = os.path.join(tmpdir_path, "ivf")
    build_ivf_index(spark, _mk(spark, _clustered(41, 200)), DIM, idx,
                    "base", n_centroids=N_CLUSTERS)
    append_ivf_index(spark, _mk(spark, _clustered(42, 50, start_id=1000)),
                     idx, "d1")
    rep = compact_ivf_index(spark, idx, "compact-1")
    assert rep["ingests_before"] == 2 and "noop" not in rep
    tip = tio.latest_snapshot_id(idx)

    rep2 = compact_ivf_index(spark, idx, "compact-2")  # fresh run_id
    assert rep2["noop"] and rep2["new_ingest"] == rep["new_ingest"]
    assert tio.latest_snapshot_id(idx) == tip
    assert read_ivf_index(spark, idx).count() == 250


def test_ivf_chaos_crash_injection(spark, tmpdir_path, monkeypatch):
    """Operator-level chaos soak (r6c), IVF edition: a seeded random
    interleaving of append / compact / sweep after a (possibly crashing)
    build, where each op's snapshot commit on the chaos index may crash
    BEFORE or AFTER landing, retried once with the SAME run_id. A
    crash-free twin executes the identical sequence; after every op the
    two indexes must serve identical committed vector sets and identical
    top-k answers, and no crashed writer's rows may ever leak into a
    commit (the stale-cell mode)."""
    import random

    idx = os.path.join(tmpdir_path, "chaos")
    twin = os.path.join(tmpdir_path, "twin")
    rng = random.Random(20260818)

    real_commit = tio.snapshot_commit
    mode = {"value": None}

    def inject(path, run_id, pids, operation="append", **kw):
        if path != idx or mode["value"] is None:
            return real_commit(path, run_id, pids, operation=operation, **kw)
        m, mode["value"] = mode["value"], None
        if m == "before":
            raise RuntimeError("chaos: crash before commit")
        real_commit(path, run_id, pids, operation=operation, **kw)
        raise RuntimeError("chaos: crash after commit")

    monkeypatch.setattr(tio, "snapshot_commit", inject)

    queries = _mk(spark, _clustered(60, 4, start_id=50000))

    def committed_ids(path):
        return {r[0] for r in read_ivf_index(spark, path)
                .select("vec_id").collect()}

    def topk(path):
        return sorted(map(tuple, ivf_index_topk(
            spark, queries, path, k=5, n_probe=2).collect()))

    crashes = {"n": 0}

    def run(op):
        """Run op on twin crash-free, then on chaos with a random fault,
        retrying once under the same run_id."""
        op(twin)
        mode["value"] = rng.choice([None, "before", "after"])
        try:
            op(idx)
            mode["value"] = None
        except RuntimeError:
            crashes["n"] += 1
            # between crash and retry: committed reads never include the
            # crashed op's uncommitted rows (they may lag the twin)
            try:
                assert committed_ids(idx) <= committed_ids(twin)
            except ValueError:
                pass  # build crashed before ingest 0's commit: no index yet
            op(idx)  # retry, same run_id
        assert committed_ids(idx) == committed_ids(twin)
        assert topk(idx) == topk(twin)

    base = _mk(spark, _clustered(61, 250))
    run(lambda p: build_ivf_index(
        spark, base, DIM, p, "build", n_centroids=N_CLUSTERS))

    start = 1000
    for i in range(8):
        kind = rng.choice(["append", "append", "compact", "sweep"])
        rid = f"op{i}-{kind}"
        if kind == "append":
            delta = _mk(spark, _clustered(70 + i, 40, start_id=start))
            start += 1000
            run(lambda p, d=delta, r=rid: append_ivf_index(spark, d, p, r))
        elif kind == "compact":
            run(lambda p, r=rid: compact_ivf_index(spark, p, r))
        else:
            run(lambda p: tio.sweep_orphan_partitions(p, older_than_s=-5))

    assert crashes["n"] >= 3, f"seed produced only {crashes['n']} crashes"
    assert ivf_index_meta(idx) == ivf_index_meta(twin)
