"""As-of join: for each left row, the latest right row at-or-before its
timestamp, per key — the standard event-log enrichment operator Spark has no
native SQL form of (pandas-on-Spark merge_asof exists but materializes a
sorted merge per key driver-style; this stays a DataFrame plan).

Implemented as a composition of built-in ops that scales: UNION the two
sides tagged, ONE window per key ordered by (ts, side) with right rows
sorting first at timestamp ties (inclusive semantics), carry the last
non-null right payload forward, keep the left rows.  One shuffle total (the
window partitioning) and no join operator at all — the per-key time sort an
as-of needs is exactly what the window sort provides, so there is no
candidate explosion on hot keys (contrast a range-join formulation, which
fans out per matching pair before taking the max).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_SIDE = "_asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    payloads: list[str],
    inclusive: bool = True,
) -> DataFrame:
    """left(key, ts, ...) x right(key, ts, *payloads) -> left columns +
    payload columns holding the right row with the greatest ts <= left.ts
    (``inclusive=False``: strictly <), NULL when no such row.

    ``right`` must be unique per (key, ts) — pre-aggregate to make the
    result deterministic (e.g. groupBy(key, ts).agg(max(...)))."""
    l = left.withColumn(_SIDE, F.lit(1))
    for c in payloads:
        l = l.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    r = right.select(key, ts, *payloads).withColumn(_SIDE, F.lit(0))
    for c in left.columns:
        if c not in (key, ts):
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = l.unionByName(r)

    # inclusive: right rows visible to same-ts left rows -> right sorts first
    # (side 0 asc); exclusive: right sorts after same-ts left rows
    side_order = F.col(_SIDE).asc() if inclusive else F.col(_SIDE).desc()
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in payloads:
        u = u.withColumn(c, F.last(F.when(F.col(_SIDE) == 0, F.col(c)), True).over(w))
    return u.filter(F.col(_SIDE) == 1).drop(_SIDE)
