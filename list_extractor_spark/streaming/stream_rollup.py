"""Streaming maintenance of the hypertable continuous aggregate.

TimescaleDB keeps its continuous aggregates fresh with a background refresh
policy; the Spark-first equivalent is a foreachBatch loop over the events
stream: each micro-batch appends to the raw hypertable, then refreshes ONLY
the day partitions the batch touched (tda/hypertable.refresh_rollup —
dynamic partition overwrite).  Late data is handled for free: a batch
carrying an event for an old day invalidates from that day forward, and the
refresh recomputes those days from the raw table, converging to exactly the
one-pass rollup (refresh is idempotent, so a batch retried after a partial
failure re-heals the same partitions).

Scale notes: the per-batch refresh cost is proportional to the INVALIDATED
days' raw volume, not the table size; the append is a narrow write.  The
raw append is made idempotent the foreachBatch way: each batch OVERWRITES
its own ``batch_id=N`` partition dir, so a batch replayed after a failure
rewrites the same files instead of double-appending (the standard
exactly-once recipe for non-transactional sinks; a production deployment
would use a transactional table format instead).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from ..tda.hypertable import refresh_rollup


def stream_rollup_refresh(
    events_stream: DataFrame,
    raw_path: str,
    rollup_path: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Start a streaming query that maintains raw table + hourly rollup.

    Per micro-batch: append the batch to ``raw_path``, compute the earliest
    day the batch touches, and incrementally refresh ``rollup_path`` for
    days >= that day from the full raw table.  Returns the StreamingQuery.
    """

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        # idempotent raw append: overwrite THIS batch's partition dir
        batch_df.write.mode("overwrite").parquet(
            os.path.join(raw_path, f"batch_id={batch_id}")
        )
        since_day = batch_df.select(
            F.min(F.to_date("ts")).cast("string").alias("d")
        ).first()["d"]
        refresh_rollup(spark.read.parquet(raw_path), rollup_path, since_day)

    writer = (
        events_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
