"""Table profiling: the data-quality pass a 100-TB ingest runs before
anything else — per-column null counts, cardinality, and min/max, computed
in ONE aggregation over the table (no per-column jobs, no shuffle beyond the
final single-row reduce) and returned long-form (one row per column).

Cardinality modes: ``exact=False`` (default) uses approx_count_distinct
(HyperLogLog++, constant memory per column — the only sane choice at
billions of rows); ``exact=True`` uses count(DISTINCT ...), which Spark
plans via EXPAND — row volume multiplies by the number of distinct aggs, so
reserve it for small tables and oracle verification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile(df: DataFrame, columns: list[str] | None = None,
            exact: bool = False) -> DataFrame:
    """-> (column, n_rows, n_nulls, n_distinct, min_value, max_value) per
    profiled column; min/max are computed on the NATIVE type and cast to
    string afterwards (lexicographic min of a stringified numeric would be
    wrong)."""
    cols = columns or df.columns
    distinct = F.count_distinct if exact else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    one = df.agg(*aggs)
    stack_args = []
    for c in cols:
        stack_args += [
            F.lit(c), F.col("__n"), F.col(f"{c}__nulls"),
            F.col(f"{c}__distinct"), F.col(f"{c}__min"), F.col(f"{c}__max"),
        ]
    return one.select(
        F.stack(
            F.lit(len(cols)), *stack_args
        ).alias("column", "n_rows", "n_nulls", "n_distinct", "min_value",
                "max_value")
    )


def profile_numeric(df: DataFrame, columns: list[str] | None = None,
                    exact: bool = False) -> DataFrame:
    """Typed numeric profile — the twin ``profile`` cannot provide because it
    stringifies min/max (double formatting differs across engines):
    (column, n_rows, n_nulls, n_distinct, min_value, max_value, mean_value)
    with min/max/mean as DOUBLE, still ONE aggregation pass.

    ``columns`` defaults to every numeric column.  The mean accumulates as
    DECIMAL(38,10) (exact, order-independent — a double sum's value depends
    on partition reduce order, which would flake any cross-engine
    comparison), then divides and rounds in double: one deterministic
    rounding step on each engine.  38,10 = 28 integer digits per value;
    values at |x| >= 1e28 would overflow the cast and (non-ANSI) null the
    mean — past double's exact-integer range anyway, where a "mean" is
    already nominal."""
    from pyspark.sql.types import NumericType

    cols = columns or [
        f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)
    ]
    distinct = F.count_distinct if exact else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("double").alias(f"{c}__min"),
            F.max(F.col(c)).cast("double").alias(f"{c}__max"),
            F.round(
                F.sum(F.col(c).cast("decimal(38,10)")).cast("double")
                / F.count(F.col(c)),
                4,
            ).alias(f"{c}__mean"),
        ]
    one = df.agg(*aggs)
    stack_args = []
    for c in cols:
        stack_args += [
            F.lit(c), F.col("__n"), F.col(f"{c}__nulls"),
            F.col(f"{c}__distinct"), F.col(f"{c}__min"), F.col(f"{c}__max"),
            F.col(f"{c}__mean"),
        ]
    return one.select(
        F.stack(
            F.lit(len(cols)), *stack_args
        ).alias("column", "n_rows", "n_nulls", "n_distinct", "min_value",
                "max_value", "mean_value")
    )


def profile_quantiles(
    df: DataFrame,
    columns: list[str] | None = None,
    ps: tuple = (0.25, 0.5, 0.75, 0.95),
    exact: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Per-column percentile profile, long form: (column, p, value).

    ``exact=False`` (default) uses percentile_approx — a bounded-memory
    quantile sketch that combines map-side, the only shape that survives
    billions of rows; ``exact=True`` uses percentile (exact linear
    interpolation, a full per-group sort inside the agg) for small tables
    and the oracle gate, matching DuckDB's quantile_cont.  Either way the
    whole profile is ONE aggregation pass (len(cols) * len(ps) agg
    expressions — no arrays to unpack, no per-column jobs); values round to
    6 dp so the one interpolation step cannot flake the comparison."""
    from pyspark.sql.types import NumericType

    cols = columns or [
        f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)
    ]
    aggs = []
    for c in cols:
        for i, p in enumerate(ps):
            e = (
                F.percentile(F.col(c), F.lit(p))
                if exact
                else F.percentile_approx(F.col(c), F.lit(p), F.lit(accuracy))
            )
            # index-based alias: a '0.25' suffix would parse as a nested
            # field reference in the stack() projection below
            aggs.append(F.round(e.cast("double"), 6).alias(f"{c}__q{i}"))
    one = df.agg(*aggs)
    stack_args = []
    for c in cols:
        for i, p in enumerate(ps):
            stack_args += [F.lit(c), F.lit(float(p)), F.col(f"{c}__q{i}")]
    return one.select(
        F.stack(F.lit(len(cols) * len(ps)), *stack_args).alias(
            "column", "p", "value"
        )
    )
