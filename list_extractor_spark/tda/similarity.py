"""Similarity search over an embedding column (array<float>).

  brute-force cosine top-k   exact baseline: one narrow pass + global top-k
  LSH-bucketed ANN           scale path: random-hyperplane signs bucket the
                             vectors; search touches one bucket per probe

Cosine is computed JVM-side with F.zip_with/F.aggregate in double precision —
no Python UDF in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _cosine(vec_col, query):
    """cos(vec, query) as a JVM expression; query is a Python list (literal)."""
    q = F.array(*[F.lit(float(x)) for x in query])
    dot = F.aggregate(
        F.zip_with(vec_col, q, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    n1 = F.sqrt(
        F.aggregate(vec_col, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x)
    )
    n2 = float(sum(x * x for x in query)) ** 0.5
    return dot / (n1 * F.lit(n2))


def brute_force_topk(embeddings: DataFrame, query, k: int = 10) -> DataFrame:
    """Exact top-k by cosine to ``query``.  orderBy+limit compiles to a
    TakeOrderedAndProject — partial top-k per partition, no full sort."""
    return (
        embeddings.select(
            "vec_id", F.round(_cosine(F.col("embedding"), query), 4).alias("cos_sim")
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def hyperplane_signatures(embeddings: DataFrame, planes) -> DataFrame:
    """Random-hyperplane LSH: sign bit per plane -> integer bucket id.
    ``planes`` is a seeded list of unit vectors (deterministic, no RNG at
    execution time).  At scale the bucket id becomes the partition key, so a
    probe reads one bucket instead of the full corpus."""
    bucket = sum(
        [
            F.when(
                F.aggregate(
                    F.zip_with(
                        "embedding",
                        F.array(*[F.lit(float(x)) for x in plane]),
                        lambda a, b: a.cast("double") * b,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                > 0,
                F.lit(1 << i),
            ).otherwise(F.lit(0))
            for i, plane in enumerate(planes)
        ],
        F.lit(0),
    )
    return embeddings.select("vec_id", "embedding", bucket.alias("bucket"))


def lsh_topk(embeddings: DataFrame, query, planes, k: int = 10) -> DataFrame:
    """ANN top-k: restrict the exact scoring to the query's LSH bucket."""
    q_bucket = 0
    for i, plane in enumerate(planes):
        if sum(a * b for a, b in zip(query, plane)) > 0:
            q_bucket |= 1 << i
    sigs = hyperplane_signatures(embeddings, planes)
    return (
        sigs.filter(F.col("bucket") == q_bucket)
        .select("vec_id", F.round(_cosine(F.col("embedding"), query), 4).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def cosine_near_dup_pairs(
    embeddings: DataFrame, threshold: float = 0.95, block_col: str = "label"
) -> DataFrame:
    """Embedding near-duplicate pairs, blocked on ``block_col`` to keep the
    self-join linear in block size (the unblocked variant is quadratic)."""
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb"), block_col
    )
    norm = e.withColumn(
        "nrm", F.sqrt(F.aggregate("emb", F.lit(0.0), lambda a, x: a + x * x))
    )
    a = norm.select(
        F.col("vec_id").alias("id_a"), F.col("emb").alias("emb_a"),
        F.col("nrm").alias("nrm_a"), block_col,
    )
    b = norm.select(
        F.col("vec_id").alias("id_b"), F.col("emb").alias("emb_b"),
        F.col("nrm").alias("nrm_b"), block_col,
    )
    return (
        a.join(b, block_col)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos_sim",
            F.round(
                F.aggregate(
                    F.zip_with("emb_a", "emb_b", lambda x, y: x * y),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                / (F.col("nrm_a") * F.col("nrm_b")),
                4,
            ),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def make_planes(dim: int, n_planes: int = 8, seed: int = 42):
    """Deterministic pseudo-random hyperplanes (LCG, no numpy RNG state)."""
    planes = []
    state = seed
    for _ in range(n_planes):
        plane = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
            plane.append((state / float(1 << 63)) * 2.0 - 1.0)
        planes.append(plane)
    return planes
