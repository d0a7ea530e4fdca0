"""Sessionization — gap-based event sessions, a training-data/analytics
staple the reference has no analog for (SURVEY.md §2.6: the engine's
relational surface goes beyond the reference's batch CLI).

Classic two-window shape, all JVM-side:

1. `is_new_session` = first event of a user OR gap to the previous event
   above the threshold (lag window);
2. `session_seq` = running sum of the flags (cumulative window) — a stable
   per-user session ordinal;
3. per-session stats = one hash aggregation on (user, session_seq).

Scale: both windows partition by user_id — ONE shuffle on user_id feeds
lag + running sum + the final agg (same key, Catalyst reuses the
partitioning); skewed power-users are bounded by their own event counts,
and the state per task is a single row (lag) — no materialized per-user
buffers.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# sentinel: distinguishes "caller said nothing" (default tiebreaker
# 'event_id', warn if absent) from an explicitly-passed column (raise if
# absent) and an explicit opt-out (None — silent ts-only ordering). A
# unique object, NOT the string "event_id": string-identity would make the
# raise/warn split depend on CPython interning of the caller's value
# (r4 review #5).
_DEFAULT_TIEBREAK: "str" = type(
    "_DefaultTiebreak", (str,), {"__slots__": ()}
)("event_id")


def with_session_seq(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    tiebreak_col: str | None = _DEFAULT_TIEBREAK,
) -> DataFrame:
    # Deterministic window order needs a tiebreaker for equal timestamps.
    # Silent fallback to ts-only ordering makes equal-ts events get
    # nondeterministic session ordinals across runs (r3 ADVICE), so the
    # fallback is never silent: an explicitly-passed missing column raises,
    # the missing DEFAULT column warns, and only tiebreak_col=None (the
    # caller's explicit opt-out) orders by ts alone quietly.
    order = [ts_col]
    if tiebreak_col is not None:
        if tiebreak_col in events.columns:
            order.append(tiebreak_col)
        elif tiebreak_col is not _DEFAULT_TIEBREAK:
            raise ValueError(
                f"tiebreak_col {tiebreak_col!r} not in frame columns "
                f"{events.columns}; pass tiebreak_col=None to order by "
                f"{ts_col!r} alone (equal-timestamp events then get "
                "nondeterministic session ordinals across runs)"
            )
        else:
            warnings.warn(
                f"with_session_seq: default tiebreak column "
                f"{_DEFAULT_TIEBREAK!r} not in frame; ordering by "
                f"{ts_col!r} alone — equal-timestamp events may get "
                "different session ordinals across runs",
                stacklevel=2,
            )
    w = Window.partitionBy(user_col).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    # NTZ timestamps cannot cast straight to long; the double cast yields
    # epoch seconds. All uses are DIFFERENCES, so the session-timezone
    # offset cancels and the DuckDB twin's epoch() arithmetic matches.
    def secs(c):
        return c.cast("timestamp").cast("long")
    is_new = F.when(
        prev.isNull() | (secs(F.col(ts_col)) - secs(prev) > gap_minutes * 60),
        1,
    ).otherwise(0)
    return events.withColumn(
        "session_seq",
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session stats: (user_id, session_seq, n_events, session_start,
    session_end, duration_secs)."""
    tagged = with_session_seq(events, user_col, ts_col, gap_minutes)
    return tagged.groupBy(user_col, "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (
            F.max(F.col(ts_col).cast("timestamp").cast("long"))
            - F.min(F.col(ts_col).cast("timestamp").cast("long"))
        ).alias("duration_secs"),
    )
