"""Dataset-assembly operators for training pipelines: deterministic split
assignment and token-budget sequence packing.

Both are pure codegen expressions (no UDFs, no shuffles beyond the ones the
semantics require) and both are deterministic functions of the data — the
properties a 100-TB training-data pipeline needs so that re-running a job,
adding a shard, or re-partitioning the input NEVER moves a document across
the train/eval boundary or reshuffles pack membership.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_SPLIT_BUCKETS = 1 << 16  # 4 hex chars of md5: plenty of resolution for splits


def _bucket16(col):
    """Stable 16-bit bucket from md5(doc_id): first 4 hex chars decoded.

    md5 (not Spark's hash/xxhash64) on purpose: every engine computes the
    same value, so the oracle — and any downstream system auditing the split
    — can recompute membership in plain SQL."""
    hx = F.substring(F.md5(col), 1, 4)
    digit = lambda i: (  # noqa: E731
        F.instr(F.lit("0123456789abcdef"), F.substring(hx, i, 1)) - 1
    )
    return digit(1) * 4096 + digit(2) * 256 + digit(3) * 16 + digit(4)


def hash_split(documents: DataFrame, splits: dict[str, float],
               key: str = "doc_id") -> DataFrame:
    """Assign every document to a named split by hashing ``key``: content-
    stable (a doc keeps its split across runs, re-shards, and corpus growth),
    leakage-free (membership depends only on the doc's own key), and exact
    in expectation (fractions partition the 16-bit bucket space by cumulative
    ranges).  ``splits`` fractions must sum to 1 (e.g. {"train": .9,
    "val": .05, "test": .05})."""
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    bucket = _bucket16(F.col(key))
    expr = None
    acc = 0.0
    names = list(splits)
    for name in names[:-1]:
        acc += splits[name]
        bound = int(round(acc * _SPLIT_BUCKETS))
        cond = bucket < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    expr = (
        F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    )
    return documents.withColumn("split", expr)


def pack_documents(documents: DataFrame, budget_tokens: int,
                   token_col: str = "n_tokens", n_ranges: int = 1) -> DataFrame:
    """Assign a ``pack_id`` grouping documents into ~budget_tokens bins for
    sequence packing: within each range, order deterministically by (token
    count desc, doc_id), take a running token total, and cut packs at
    floor((cumsum - tokens) / budget).

    This is the cumulative-sum approximation standard in data pipelines: a
    boundary document may straddle two budgets (downstream chunkers split at
    sequence boundaries anyway), but every pack's INTERIOR is within budget
    and the assignment is a deterministic function of the corpus.

    ``n_ranges=1`` is exact global packing — but a global running-sum window
    serializes into ONE task, the classic scale cliff.  ``n_ranges=R``
    shards documents by a stable md5 bucket of doc_id and packs each shard
    independently (window partitionBy range → R parallel tasks, one
    shuffle); pack ids stay globally unique and deterministic via
    ``local_pack * R + range``.  At 10^8+ docs pick R ~ cores so each
    running sum handles corpus/R rows."""
    if n_ranges < 1:
        raise ValueError("n_ranges must be >= 1")
    rng = _bucket16(F.col("doc_id")) % n_ranges
    d = documents.withColumn("_rng", rng)
    w = Window.partitionBy("_rng").orderBy(
        F.col(token_col).desc(), F.col("doc_id").asc()
    )
    cum = F.sum(token_col).over(w)
    local = F.floor((cum - F.col(token_col)) / F.lit(budget_tokens))
    return d.withColumn(
        "pack_id", local * F.lit(n_ranges) + F.col("_rng")
    ).drop("_rng")


def stratified_sample(documents: DataFrame, rates: dict[str, float],
                      stratum_col: str, key: str = "doc_id",
                      default_rate: float = 0.0) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a document iff its
    16-bit md5 bucket falls under its stratum's rate — the reproducible
    alternative to df.sampleBy (which reseeds per run and per partitioning).
    A document's fate depends only on (its key, its stratum's rate), so
    re-runs, re-shards, and corpus growth keep exactly the same rows, and
    raising a rate strictly GROWS the kept set (nested samples: the 5%
    sample is a subset of the 20% sample — the property curriculum /
    ablation pipelines rely on).  Strata absent from ``rates`` fall back to
    ``default_rate`` (0.0 = drop)."""
    bucket = _bucket16(F.col(key))
    rate = None
    for stratum, r in rates.items():
        bound = int(round(r * _SPLIT_BUCKETS))
        cond = F.col(stratum_col) == stratum
        rate = F.when(cond, F.lit(bound)) if rate is None else rate.when(
            cond, F.lit(bound)
        )
    rate = (
        F.lit(int(round(default_rate * _SPLIT_BUCKETS)))
        if rate is None
        else rate.otherwise(F.lit(int(round(default_rate * _SPLIT_BUCKETS))))
    )
    return documents.filter(bucket < rate)


def mix_sources(
    documents: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    key: str = "doc_id",
) -> DataFrame:
    """Domain-mixture weighting: downsample each source so the kept corpus
    approaches the target mixture proportions ``weights`` — the data-mixing
    stage (Pile / DoReMi-style domain weights) between curation and split
    assignment in a training pipeline.

    Where stratified_sample takes per-stratum RATES as given, this solves
    for them: with n_s docs observed per source and target fraction w_s
    (weights are normalized internally), the largest downsample-only corpus
    hitting the mixture is N_out = min_s(n_s / w_s), giving keep rate
    r_s = w_s * N_out / n_s (= 1 for the binding source).  The keep
    decision then reuses the 16-bit md5 bucket draw (bucket < round(r_s *
    2^16)) — deterministic and content-keyed, so re-runs/re-shards keep the
    same rows and any engine can replay membership in plain SQL.

    Output: the kept (key, source, mix_rate) rows, mix_rate rounded to 6
    decimals.  Sources absent from ``weights`` are dropped; weighted
    sources absent from the corpus are ignored in the min (they cannot
    contribute docs, so the mixture is computed over present sources).
    Upsampling (repeating docs) is out of scope by design — repetition
    schedules belong to the trainer, not the corpus.

    Scale shape: two passes, like every count-then-act operator here (DSIR
    fit/score): one map-side-combined count per source, then one narrow
    filter pass; the per-source table is bounded by the user's weight dict,
    broadcast unconditionally; N_out is a 1-row broadcast."""
    if not weights:
        raise ValueError("mix_sources: weights must be non-empty")
    if any(w <= 0 for w in weights.values()):
        raise ValueError(
            "mix_sources: weights must be > 0 (omit a source to drop it)"
        )
    import pandas as pd

    spark = documents.sparkSession
    total = float(sum(weights.values()))
    w_df = spark.createDataFrame(
        pd.DataFrame(
            [(s, float(w) / total) for s, w in sorted(weights.items())],
            columns=[source_col, "w"],
        ),
        schema=f"{source_col} string, w double",
    )
    per_src = (
        documents.groupBy(source_col)
        .agg(F.count("*").alias("n_src"))
        .join(F.broadcast(w_df), source_col)
    )
    n_out = per_src.select(
        F.min(F.col("n_src") / F.col("w")).alias("n_out")
    )
    rate = F.least(
        F.lit(1.0), F.col("w") * F.col("n_out") / F.col("n_src")
    )
    return (
        documents.join(F.broadcast(per_src), source_col)
        .crossJoin(F.broadcast(n_out))
        .filter(
            _bucket16(F.col(key).cast("string"))
            < F.round(rate * _SPLIT_BUCKETS)
        )
        .select(key, source_col, F.round(rate, 6).alias("mix_rate"))
    )


def chunk_documents(
    documents: DataFrame, chunk_tokens: int = 128, overlap: int = 16
) -> DataFrame:
    """Split documents into fixed-size token windows with overlap — the
    context-window chunking step between cleaning and packing in a training
    pipeline (overlap keeps boundary sentences learnable in two windows).

    Output: (doc_id, chunk_idx, text, n_tokens); every document yields at
    least one chunk (short docs pass through whole), chunk i starts at
    token i*(chunk_tokens-overlap), and the last chunk may be short.

    Scale shape: fully narrow — tokens split in the scan task, chunk fan-out
    via explode(sequence), window text via slice + array_join (all codegen,
    no interpreted HOF, no python); output rows ~ corpus_tokens /
    (chunk_tokens - overlap), no shuffle at all."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    step = chunk_tokens - overlap
    t = F.split(F.trim("text"), r"\s+")
    d = documents.select("doc_id", t.alias("t")).withColumn("n", F.size("t"))
    n_chunks = F.greatest(
        F.lit(1), F.ceil((F.col("n") - F.lit(overlap)) / F.lit(float(step)))
    )
    return (
        d.select(
            "doc_id",
            "t",
            "n",
            F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias(
                "chunk_idx"
            ),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.array_join(
                F.slice("t", F.col("chunk_idx") * step + 1, chunk_tokens), " "
            ).alias("text"),
            F.least(
                F.lit(chunk_tokens), F.col("n") - F.col("chunk_idx") * step
            ).cast("int").alias("n_tokens"),
        )
    )
