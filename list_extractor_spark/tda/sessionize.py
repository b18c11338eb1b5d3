"""Gap-based sessionization of an event stream — the classic behavioral
aggregation (a session ends when the user is silent longer than ``gap_sec``).

Scale shape: ONE exchange on the user key; the lag flag and the running
session counter are windows over the SAME (user, ts) sort, so the sort runs
once, and the session-level groupBy keys on (user, session_idx) — a superset
of the window partitioning, so rows are already co-located and no second
exchange is needed (verified in the plan test).  Hot users (bot traffic)
concentrate one partition's sort; AQE skew-split handles the exchange side,
and the window state is O(1) per row.

Determinism: the gap test is pure timestamp arithmetic — ``ts - lag(ts)``
is a day-time interval carrying exact integer microseconds, compared against
an exact interval literal, so there is no floating point and no timezone
dependence anywhere (the events table is TIMESTAMP_NTZ; casting it through
an epoch double would both fail under ANSI rules and drag the session
timezone into the result).  Ties on ts order by the event id, so the
flag/counter are a function of the data, not of partition layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    events: DataFrame,
    gap_sec: int = 28800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Session-level rollup: (user, session_idx, n_events, start_ts,
    end_ts).  session_idx is 1-based per user in time order; a new session
    starts when the silence since the previous event EXCEEDS gap_sec
    (strictly greater, so a gap of exactly gap_sec stays in-session)."""
    if int(gap_sec) != gap_sec or int(gap_sec) < 1:
        raise ValueError(
            f"sessionize: gap_sec must be a positive whole number of "
            f"seconds, got {gap_sec!r} (an INTERVAL n SECOND literal would "
            f"silently truncate a fractional gap)"
        )
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev = F.lag(F.col(ts_col)).over(w)
    gap = F.expr(f"INTERVAL {int(gap_sec)} SECOND")
    flag = F.when(
        prev.isNull() | ((F.col(ts_col) - prev) > gap), F.lit(1)
    ).otherwise(F.lit(0))
    run = Window.partitionBy(user_col).orderBy(ts_col, id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    flagged = events.select(
        F.col(user_col), F.col(ts_col), F.col(id_col), flag.alias("_new")
    ).withColumn("session_idx", F.sum("_new").over(run))
    return flagged.groupBy(user_col, "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
    )
