"""Physical-plan assertions — the properties that matter at 100 TB,
checkable in tests and tools/explain_report.py:

- the extraction path has exactly ONE Python (MapInArrow) stage;
- filters/columns reach the parquet scan (PushedFilters / ReadSchema);
- small dimension sides broadcast instead of shuffling.

No custom Catalyst rules anywhere — these verify that the *declarative* plans
we build get the built-in optimizations we rely on (SURVEY.md §4).
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame

# formatted plans print each node twice (tree + "(n) Node" detail section);
# count the detail headers so each physical node counts once
_PY_NODE_RE = re.compile(
    r"^\(\d+\) (MapInArrow|MapInPandas|ArrowEvalPython|BatchEvalPython)",
    re.MULTILINE,
)


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def assert_single_python_stage(df: DataFrame) -> None:
    plan = formatted_plan(df)
    nodes = _PY_NODE_RE.findall(plan)
    assert len(nodes) == 1, f"expected exactly 1 Python stage, found {nodes}:\n{plan}"
    assert "BatchEvalPython" not in plan, "row-at-a-time Python UDF in plan"


def assert_filter_pushed(df: DataFrame, fragment: str) -> None:
    plan = formatted_plan(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and any(fragment in ln for ln in pushed), (
        f"filter {fragment!r} not pushed to scan:\n{plan}"
    )


def assert_broadcast_join(df: DataFrame) -> None:
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        f"no broadcast join in plan:\n{plan}"
    )
