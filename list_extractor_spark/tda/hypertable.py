"""Hypertable-style continuous aggregate: a materialized time-bucket rollup
of the events stream plus a serving path that answers coarser-grained
queries from the ROLLUP, never the raw table.

The TimescaleDB pattern re-expressed Spark-first: the rollup is an hourly
(bucket, event_type) aggregate written as parquet partitioned by DAY, so a
time-ranged query partition-prunes to the touched days and re-aggregates
hours -> requested grain.  count and sum re-aggregate losslessly, which is
exactly why those are the stored measures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_hourly_rollup(events: DataFrame, path: str) -> None:
    """events(ts, event_type, value, ...) -> hourly rollup parquet
    partitioned by day: (day | bucket, event_type, n_events, sum_value)."""
    hourly = (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("bucket"),
            F.col("event_type"),
        )
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .withColumn("day", F.to_date("bucket"))
    )
    hourly.write.mode("overwrite").partitionBy("day").parquet(path)


def daily_from_rollup(
    spark: SparkSession, path: str, from_day: str | None = None,
    to_day: str | None = None,
) -> DataFrame:
    """Daily totals served FROM the materialized hourly rollup (the raw table
    is never touched); the optional day range partition-prunes the scan."""
    r = spark.read.parquet(path)
    if from_day:
        r = r.filter(F.col("day") >= from_day)
    if to_day:
        r = r.filter(F.col("day") <= to_day)
    return r.groupBy(F.col("day"), F.col("event_type")).agg(
        F.sum("n_events").alias("n_events"),
        F.round(F.sum("sum_value"), 4).alias("sum_value"),
    )
