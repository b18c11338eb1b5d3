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


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    round_to: int = 6,
) -> DataFrame:
    """Ordered event funnel: for each step k, the number of users who reached
    it IN SEQUENCE — a user reaches step k at the earliest event of that type
    at-or-after the timestamp at which they reached step k-1 (the standard
    product-analytics funnel; ties at the exact same timestamp count, so an
    event stream with equal timestamps for consecutive steps still converts).

    Output: (step:int 1-based, event_type, users, conv_overall, conv_prev),
    conversion ratios rounded half-up to ``round_to`` (NULL when the
    denominator step had zero users).

    Scale shape: ONE exchange on the user key, then every per-step "earliest
    at-or-after" is a conditional min WINDOW over that same partitioning —
    the cascade t_k = min(ts WHERE type=step_k AND ts >= t_{k-1}) OVER
    (PARTITION BY user) runs as in-partition passes with no further shuffle,
    and the final rollup is one tiny global aggregate emitted with stack().
    No self-joins (the naive k-way join form shuffles the event table k
    times); hot users cost an in-partition scan, handled by AQE skew split
    on the single exchange."""
    if not steps:
        raise ValueError("funnel: need at least one step")
    for s in steps:
        if "'" in s or "\\" in s:
            # step names are spliced into the stack() SQL literal below
            raise ValueError(f"funnel: step name {s!r} may not contain ' or \\")
    w = Window.partitionBy(user_col)
    df = events.select(user_col, ts_col, type_col)
    prev_t = None
    tcols = []
    for i, step in enumerate(steps):
        cond = F.col(type_col) == F.lit(step)
        if prev_t is not None:
            cond = cond & (F.col(ts_col) >= F.col(prev_t))
        name = f"_t{i}"
        df = df.withColumn(name, F.min(F.when(cond, F.col(ts_col))).over(w))
        tcols.append(name)
        prev_t = name
    per_user = df.groupBy(user_col).agg(
        *[F.first(c).alias(c) for c in tcols]
    )
    counts = per_user.agg(
        *[F.count(c).alias(f"_n{i}") for i, c in enumerate(tcols)]
    )
    rows = ", ".join(
        f"{i + 1}, '{s}', _n{i}" for i, s in enumerate(steps)
    )
    stacked = counts.select(
        F.expr(
            f"stack({len(steps)}, {rows}) AS (step, event_type, users)"
        )
    )
    w0 = Window.orderBy("step").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    first_users = F.first("users").over(w0)
    prev_users = F.lag("users").over(Window.orderBy("step"))
    return stacked.select(
        "step",
        "event_type",
        "users",
        F.round(F.col("users") / F.nullif(first_users, F.lit(0)), round_to)
        .alias("conv_overall"),
        F.round(F.col("users") / F.nullif(prev_users, F.lit(0)), round_to)
        .alias("conv_prev"),
    )
