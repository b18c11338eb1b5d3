"""Banded range join: pairs of rows whose timestamps fall within a window of
each other (per key) — telemetry sessionization / co-occurrence shape.

Spark CAN express ``|t_a - t_b| <= W`` directly as a non-equi join condition,
but plans it as a broadcast-nested-loop or an unconstrained sort-merge — a
per-key cross product at scale.  The scale pattern is BANDING: bucket time
into W-wide bins, explode ONE side to its bin and both neighbors, equi-join
on (key, bin), then apply the exact predicate.  Any true pair's bins differ
by at most 1, and each pair meets on exactly ONE of the three exploded bins
(the left row's own bin), so the candidate join is an equi-join with fan-out
3 and needs no post-dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def banded_time_pairs(
    events: DataFrame,
    window_sec: int,
    key: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """(key, id_a, id_b) pairs (id_a < id_b) whose ``ts`` values lie within
    ``window_sec`` of each other, per ``key``.  One equi-join on (key, bin)
    with fan-out 3 — never a per-key cross product."""
    secs = F.unix_timestamp(F.col(ts))
    binned = events.select(
        F.col(key), F.col(id_col), secs.alias("_t"),
        F.floor(secs / window_sec).alias("_bin"),
    )
    a = binned.select(
        F.col(key), F.col(id_col).alias("id_a"), F.col("_t").alias("t_a"), "_bin"
    )
    b = binned.select(
        F.col(key), F.col(id_col).alias("id_b"), F.col("_t").alias("t_b"),
        F.explode(
            F.array(F.col("_bin") - 1, F.col("_bin"), F.col("_bin") + 1)
        ).alias("_bin"),
    )
    return (
        a.join(b, [key, "_bin"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("t_a") - F.col("t_b")) <= window_sec)
        )
        .select(key, "id_a", "id_b")
    )
