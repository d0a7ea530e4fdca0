"""Paired A/B benchmark driver for the r7 optimization round.

The box has documented intermittent wedge phases (BENCH/BASELINE.md), so a
"before" run and an "after" run taken minutes apart can differ 3-50x for
environmental reasons. This driver alternates full bench_extra passes
between the round-start worktree (A) and the working tree (B) — A B A B ...
— so each pair shares a window, and reports per-query medians and the
pairwise B/A ratios.

Usage: python tools/ab_bench.py --sf-dir /root/testdata/sf0.1 --pairs 3
                                [--queries a,b,c] [--skip-extract]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

A_DIR = "/root/r7base"
B_DIR = "/root/repo"


def run_pass(tree: str, sf_dir: str, queries: str, skip_extract: bool,
             tag: str) -> dict:
    out_json = f"/tmp/ab_{tag}.json"
    cmd = [sys.executable, "bench_extra.py", "--sf-dir", sf_dir,
           "--runs", "2", "--json", out_json]
    if queries:
        cmd += ["--queries", queries]
    if skip_extract:
        cmd += ["--skip-extract"]
    env = dict(os.environ)
    r = subprocess.run(cmd, cwd=tree, env=env, capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-2000:], r.stderr[-2000:])
        raise SystemExit(f"pass failed in {tree}")
    with open(out_json) as f:
        return json.load(f)["best"]


def steal_window():
    with open("/proc/stat") as f:
        v = list(map(int, f.readline().split()[1:]))
    return sum(v), v[7]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--queries", default="")
    ap.add_argument("--skip-extract", action="store_true")
    args = ap.parse_args()

    a_runs: dict[str, list[float]] = {}
    b_runs: dict[str, list[float]] = {}
    for i in range(args.pairs):
        t0, s0 = steal_window()
        ra = run_pass(A_DIR, args.sf_dir, args.queries, args.skip_extract,
                      f"a{i}")
        rb = run_pass(B_DIR, args.sf_dir, args.queries, args.skip_extract,
                      f"b{i}")
        t1, s1 = steal_window()
        steal = 100 * (s1 - s0) / max(1, t1 - t0)
        for k, v in ra.items():
            a_runs.setdefault(k, []).append(v)
        for k, v in rb.items():
            b_runs.setdefault(k, []).append(v)
        print(f"# pair {i}: steal={steal:.1f}% "
              f"A={ {k: ra[k] for k in sorted(ra)} } "
              f"B={ {k: rb[k] for k in sorted(rb)} }", flush=True)

    print(f"{'query':24s} {'A_med':>8s} {'B_med':>8s} {'B/A':>6s}  pairs(B/A)")
    for k in sorted(a_runs):
        am = statistics.median(a_runs[k])
        bm = statistics.median(b_runs.get(k, [float('nan')]))
        ratios = [round(b / a, 3) for a, b in zip(a_runs[k], b_runs[k])]
        print(f"{k:24s} {am:8.3f} {bm:8.3f} {bm/am:6.2f}  {ratios}")


if __name__ == "__main__":
    main()
