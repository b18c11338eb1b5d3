"""Hypertable-style continuous aggregate: a materialized time-bucket rollup
of the events stream plus a serving path that answers coarser-grained
queries from the ROLLUP, never the raw table.

The TimescaleDB pattern re-expressed Spark-first: the rollup is an hourly
(bucket, event_type) aggregate written as parquet partitioned by DAY, so a
time-ranged query partition-prunes to the touched days and re-aggregates
hours -> requested grain.  count and sum re-aggregate losslessly, which is
exactly why those are the stored measures — and the sum is stored as a
DECIMAL so re-aggregation is EXACT, not merely associativity-close: summing
hourly double partials and rounding can differ from a one-pass raw sum in
the 4th decimal on near-tie corpora, a data-dependent contract flake.

Refresh follows TimescaleDB's continuous-aggregate model: a full build
(`write_hourly_rollup`) plus an incremental `refresh_rollup` that recomputes
ONLY the invalidated day partitions (everything at/after the earliest
late-arriving timestamp) and dynamically overwrites just those `day=` dirs.
At 100-TB scale that is the difference between rewriting years of history
per refresh and rewriting the late-data window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# Exact-summable measure type: wide enough that petabyte-scale event counts
# cannot overflow (28-10=18 integer digits), fine enough that the 4-dp
# serving round is far inside the stored precision.
_MEASURE_DECIMAL = "decimal(28,10)"


def _hourly(events: DataFrame) -> DataFrame:
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("bucket"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(_MEASURE_DECIMAL)).alias("sum_value"),
        )
        .withColumn("day", F.to_date("bucket"))
    )


def write_hourly_rollup(events: DataFrame, path: str) -> None:
    """events(ts, event_type, value, ...) -> hourly rollup parquet
    partitioned by day: (day | bucket, event_type, n_events, sum_value)."""
    _hourly(events).write.mode("overwrite").partitionBy("day").parquet(path)


def refresh_rollup(events: DataFrame, path: str, since_day: str) -> None:
    """Incremental continuous-aggregate refresh: recompute the day partitions
    invalidated by late data (``day >= since_day``, i.e. the earliest
    late-arriving event's day) FROM THE RAW TABLE and overwrite only those
    ``day=`` dirs via dynamic partition overwrite.  Days before
    ``since_day`` keep their existing files untouched.

    ``events`` must be the full raw table (or at least all rows with
    ``ts >= since_day``): each touched day is rebuilt from scratch, which
    keeps the refresh idempotent — re-running it after a partial failure
    converges to the same partition contents.
    """
    touched = _hourly(events.filter(F.to_date("ts") >= F.lit(since_day)))
    (
        touched.write.mode("overwrite")
        # per-write option: only partitions present in `touched` are
        # replaced; no session-level partitionOverwriteMode mutation
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day")
        .parquet(path)
    )


def daily_from_rollup(
    spark: SparkSession, path: str, from_day: str | None = None,
    to_day: str | None = None,
) -> DataFrame:
    """Daily totals served FROM the materialized hourly rollup (the raw table
    is never touched); the optional day range partition-prunes the scan.
    The decimal partial sums re-aggregate exactly, so the served total is
    bit-identical to a one-pass aggregate over raw events at any grain."""
    r = spark.read.parquet(path)
    if from_day:
        r = r.filter(F.col("day") >= from_day)
    if to_day:
        r = r.filter(F.col("day") <= to_day)
    return r.groupBy(F.col("day"), F.col("event_type")).agg(
        F.sum("n_events").alias("n_events"),
        F.round(F.sum("sum_value"), 4).cast("double").alias("sum_value"),
    )
