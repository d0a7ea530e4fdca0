"""Shared measurement helpers for the BENCH harnesses.

Hypervisor steal arrives in bursts on this VM, so every harness samples
/proc/stat around each measured pass and reports the per-pass steal%% next
to the time — single unannotated runs are untrustworthy (BASELINE.md
methodology). One copy here so the parsing cannot drift between harnesses
(r4 review pass 2, #5).
"""

from __future__ import annotations


def cpu_stat() -> tuple[int, int]:
    """(total jiffies, steal jiffies) from the aggregate /proc/stat line."""
    with open("/proc/stat") as f:
        vals = [int(x) for x in f.readline().split()[1:]]
    return sum(vals), vals[7] if len(vals) > 7 else 0


def steal_pct(before: tuple[int, int], after: tuple[int, int]) -> float:
    dt = after[0] - before[0]
    return 100.0 * (after[1] - before[1]) / dt if dt else 0.0
