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

from pyspark.sql import DataFrame, Window, functions as F, types as T

_SIDE = "_asof_side"


def _bq(name: str) -> str:
    """Backtick-quote a column NAME so dots/spaces resolve as the literal
    column, never as nested-field access."""
    return "`" + name.replace("`", "``") + "`"


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
    result deterministic (e.g. groupBy(key, ts).agg(max(...))).

    Semantics pinned to a true as-of (DuckDB ASOF JOIN): the payload columns
    come from ONE matched right row carried as a struct — so a NULL payload
    value in the latest match stays NULL (it is not skipped for an older
    non-null one, which a naive last(col, ignorenulls) would do) and
    multi-payload outputs are never stitched from different right rows.
    Right rows with a NULL timestamp can never be a match and are dropped;
    a left row with a NULL timestamp matches nothing (it sorts before every
    right row)."""
    collisions = set(payloads) & set(left.columns)
    if collisions:
        raise ValueError(
            f"left side already has payload column(s) {sorted(collisions)}; "
            "rename before asof_join"
        )
    carry = "_asof_row"
    reserved = {_SIDE, carry} & (set(left.columns) | set(right.columns))
    if reserved:
        raise ValueError(
            f"column(s) {sorted(reserved)} collide with asof_join internals; "
            "rename before asof_join"
        )
    # build the carry type as a DataType object, not a DDL string — payload
    # names needing backtick quoting (spaces, dots, colons) would produce an
    # unparseable simpleString cast
    carry_type = T.StructType([right.schema[c] for c in payloads])
    l = left.withColumn(_SIDE, F.lit(1)).withColumn(
        carry, F.lit(None).cast(carry_type)
    )
    r = (
        right.filter(F.col(ts).isNotNull())
        .select(
            key, ts,
            F.struct(*[F.col(_bq(c)).alias(c) for c in payloads]).alias(carry),
        )
        .withColumn(_SIDE, F.lit(0))
    )
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
    u = u.withColumn(carry, F.last(F.when(F.col(_SIDE) == 0, F.col(carry)), True).over(w))
    out = u.filter(F.col(_SIDE) == 1)
    for c in payloads:
        out = out.withColumn(c, F.col(carry).getField(c))  # dotted-name safe
    return out.drop(_SIDE, carry)
