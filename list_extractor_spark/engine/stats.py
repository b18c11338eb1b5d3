"""Zero-job size probes over Catalyst plan statistics.

Shared by the size-adaptive link join (engine/linking.py), the
canonicalization path decision (engine/canonicalize.py) and the Bloom sizing
count (engine/bloom.py): tiny driver jobs cost ~0.3-0.5 s of scheduling
latency each on a busy driver, so decisions that Catalyst already knows the
answer to should not run jobs.

Two probes with DIFFERENT safety envelopes:

* ``local_relation_rows`` — EXACT row count when the plan collapsed to a
  LocalRelation (driver-resident data).  Safe for any decision, including
  "small enough to collect" (the rows already live in the driver JVM).
* ``stats_size_bytes`` — Catalyst's sizeInBytes estimate.  For file scans
  this is the COMPRESSED on-disk size, i.e. an underestimate of in-memory
  size: fine for the decisions Spark's own planner makes with the same
  number (broadcast thresholds), NOT fine for "small enough to collect to
  the python driver" decisions — use an exact bounded count for those.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# LogicalRDD etc. report defaultSizeInBytes = Long.MaxValue: "no estimate",
# not "the table is 8 EiB"
_UNKNOWN_STATS = 1 << 62


def _optimized_plan(df: DataFrame):
    return df._jdf.queryExecution().optimizedPlan()


def local_relation_rows(df: DataFrame) -> int | None:
    """Exact row count straight from the plan when it collapsed to a
    LocalRelation, else None.  Zero jobs either way."""
    plan = _optimized_plan(df)
    if plan.getClass().getSimpleName() == "LocalRelation":
        return plan.data().size()
    return None


def stats_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's sizeInBytes estimate, or None when the plan carries only
    the defaultSizeInBytes sentinel (e.g. python createDataFrame lists ->
    LogicalRDD)."""
    size = int(_optimized_plan(df).stats().sizeInBytes())
    return size if size < _UNKNOWN_STATS else None
