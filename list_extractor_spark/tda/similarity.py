"""Similarity search over an embedding column (array<float>).

  brute-force cosine top-k   exact baseline: explode + broadcast-join the
                             query vector + one aggregation (all whole-stage
                             codegen; TakeOrderedAndProject for the top-k)
  LSH-bucketed ANN           scale path: random-hyperplane signs bucket the
                             vectors; a probe scores one bucket, not the corpus
  blocked near-dup pairs     numpy matmul per block via applyInPandas (the
                             Arrow-batched slow path done right)

Design rule (measured, see tda/dedup.py): higher-order functions
(zip_with/aggregate) evaluate INTERPRETED in Spark — vector math either stays
in codegen'd relational form (explode + groupBy) or goes through Arrow to
numpy.  No row-at-a-time Python anywhere.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T


def _exploded(embeddings: DataFrame) -> DataFrame:
    """(vec_id, dim_idx, val:double) — codegen-friendly long form."""
    return embeddings.select(
        "vec_id", F.posexplode(F.col("embedding").cast("array<double>")).alias("dim_idx", "val")
    )


def brute_force_topk(embeddings: DataFrame, query, k: int = 10) -> DataFrame:
    """Exact top-k by cosine to ``query``.

    explode -> broadcast equi-join on dim index -> sum aggregation ->
    TakeOrderedAndProject (partial top-k per partition, no global sort).

    r7 note: an unrolled ``sum(embedding[i] * q_i)`` projection (zero
    exchanges, bit-identical addition order) was A/B'd and REVERTED — the
    128-term expression tree falls out of whole-stage codegen and the
    interpreted projection measured 2x slower than this relational form
    (1.10 s vs 0.51 s at sf1.0)."""
    qnorm = float(sum(x * x for x in query)) ** 0.5
    spark = embeddings.sparkSession
    qdf = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(query)], schema="dim_idx int, qval double"
    )
    scored = (
        _exploded(embeddings)
        .join(F.broadcast(qdf), "dim_idx")
        .groupBy("vec_id")
        .agg(
            F.sum(F.col("val") * F.col("qval")).alias("dot"),
            F.sum(F.col("val") * F.col("val")).alias("norm2"),
        )
        .select(
            "vec_id",
            F.round(F.col("dot") / (F.sqrt("norm2") * F.lit(qnorm)), 4).alias("cos_sim"),
        )
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc("vec_id")).limit(k)


def hyperplane_buckets(
    embeddings: DataFrame, planes, keep_embedding: bool = False
) -> DataFrame:
    """Random-hyperplane LSH bucket per vector: sign bit per plane packed into
    an int, computed as ONE numpy matmul per Arrow batch (mapInPandas) — a
    narrow plan with zero shuffle.

    The previous relational form (posexplode -> broadcast-join the plane
    table -> two groupBys) pushed N·d·P intermediate rows through codegen
    plus a shuffle the matmul doesn't need; this is the same shape as
    ivf_assign, the measured-fast inner loop of both ANN index builds.

    ``keep_embedding=True`` carries the vector through the pass so the index
    builders (write_bucketed_embeddings, cosine_near_dup_pairs_lsh) need no
    vec_id join back to the corpus.

    Sign-boundary caveat: the bucket bit is ``(e @ plane) > 0`` computed by
    numpy/BLAS; a vector whose dot against a plane is within float rounding
    of zero could in principle land on either side vs a sequentially-summed
    evaluation (e.g. the DuckDB oracle's list_dot_product).  query_bucket
    uses the SAME matmul path so probe and corpus always agree with each
    other; multi-probe (n_probe_buckets > 1) additionally covers the
    nearest-margin flips, which is exactly the unlucky-split case."""
    import numpy as np

    pl = [list(map(float, p)) for p in planes]
    # derive vec_id (and embedding) types from the input so non-long ids
    # pass through unchanged instead of being silently narrowed to long
    fields = [
        embeddings.schema["vec_id"],
        T.StructField("bucket", T.LongType(), False),
    ]
    if keep_embedding:
        fields.append(embeddings.schema["embedding"])
    schema = T.StructType(fields)

    def run(batches):
        p = np.array(pl, dtype="float64").T  # dim x n_planes
        weights = (np.int64(1) << np.arange(len(pl), dtype="int64"))
        for pdf in batches:
            x = np.stack(pdf["embedding"].to_numpy()).astype("float64")
            bucket = (((x @ p) > 0) * weights).sum(axis=1)
            out = {"vec_id": pdf["vec_id"], "bucket": bucket}
            if keep_embedding:
                out["embedding"] = pdf["embedding"]
            yield pd.DataFrame(out)

    return embeddings.select("vec_id", "embedding").mapInPandas(run, schema=schema)


def query_buckets(query, planes, n_probe_buckets: int = 1) -> list[int]:
    """Multi-probe LSH probe set (driver-side, tiny): the query's own bucket
    first, then single-bit flips ordered by |margin| — the planes the query
    sits CLOSEST to are the ones a true neighbor most plausibly falls on the
    other side of (Lv et al., multi-probe LSH, VLDB'07).  n_probe_buckets=1
    is the classic single-bucket probe; the dots are computed with the same
    numpy matmul as hyperplane_buckets so probe and corpus bucketing agree
    bit-for-bit.

    Probe width is capped at ``len(planes) + 1`` (the base bucket + one
    single-bit flip per plane — multi-bit flips are not generated; their
    marginal recall at these plane counts never paid for the extra scan).
    Asking for more raises rather than silently scanning narrower than
    requested."""
    import numpy as np

    if n_probe_buckets > len(planes) + 1:
        raise ValueError(
            f"n_probe_buckets={n_probe_buckets} exceeds the single-bit-flip "
            f"ceiling of len(planes)+1={len(planes) + 1}; add planes or "
            "lower the probe width"
        )

    q = np.asarray([float(v) for v in query], dtype="float64")
    p = np.array([[float(v) for v in pl] for pl in planes], dtype="float64").T
    dots = q @ p
    weights = np.int64(1) << np.arange(len(planes), dtype="int64")
    base = int(((dots > 0) * weights).sum())
    buckets = [base]
    for bit in np.argsort(np.abs(dots)):  # nearest margins first
        if len(buckets) >= n_probe_buckets:
            break
        buckets.append(base ^ (1 << int(bit)))
    return buckets


def query_bucket(query, planes) -> int:
    """Hyperplane-sign bucket of a query vector (driver-side, tiny)."""
    return query_buckets(query, planes, n_probe_buckets=1)[0]


def lsh_topk(
    embeddings: DataFrame, query, planes, k: int = 10, n_probe_buckets: int = 1
) -> DataFrame:
    """ANN top-k computing buckets inline: restrict exact scoring to the
    query's LSH bucket(s).  One-shot form — every probe recomputes the corpus
    buckets, so for repeated probes use write_bucketed_embeddings +
    lsh_topk_bucketed (partition-pruned scan) instead.  n_probe_buckets > 1
    widens the probe to the nearest-margin bit flips (multi-probe) — linear
    extra scan cost, measured recall lift under unlucky hyperplane splits."""
    in_bucket = (
        hyperplane_buckets(embeddings, planes, keep_embedding=True)
        .filter(F.col("bucket").isin(query_buckets(query, planes, n_probe_buckets)))
        .drop("bucket")
    )
    return brute_force_topk(in_bucket, query, k)


def write_bucketed_embeddings(embeddings: DataFrame, planes, path: str) -> None:
    """Materialize the corpus ONCE as parquet partitioned by LSH bucket.

    The scale path for ANN serving: bucket assignment (the full-corpus scan)
    is paid at build time; every probe afterwards reads exactly one
    partition directory (Catalyst partition pruning on bucket=<q>), not the
    corpus.  2^n_planes directories; pick n_planes so a bucket ~ one task."""
    with_bucket = hyperplane_buckets(embeddings, planes, keep_embedding=True)
    with_bucket.write.mode("overwrite").partitionBy("bucket").parquet(path)


def lsh_topk_bucketed(
    spark, path: str, query, planes, k: int = 10, n_probe_buckets: int = 1
) -> DataFrame:
    """Probe a materialized bucketed corpus: partition-pruned scan -> exact
    cosine top-k inside the matching bucket(s).  Multi-probe keeps partition
    pruning (isin over bucket= dirs): n_probe_buckets dirs scanned, never the
    corpus."""
    qbs = query_buckets(query, planes, n_probe_buckets)
    in_bucket = spark.read.parquet(path).filter(F.col("bucket").isin(qbs)).drop("bucket")
    return brute_force_topk(in_bucket, query, k)


_PAIRS_SCHEMA = T.StructType(
    [
        T.StructField("id_a", T.LongType(), False),
        T.StructField("id_b", T.LongType(), False),
        T.StructField("cos_sim", T.DoubleType(), False),
    ]
)


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    block_col: str = "label",
    cell_cap: int | None = 4096,
) -> DataFrame:
    """Embedding near-duplicate pairs, blocked on ``block_col``: one numpy
    matmul per block inside applyInPandas (Arrow batch in, Arrow batch out).
    Blocking keeps the quadratic term inside blocks; at scale block =
    LSH bucket (hyperplane_buckets) or k-means cell (SemDeDup).

    ``cell_cap`` is the oversized-block guard (the blocked-cosine twin of
    the df_cap/bucket_cap hub guards in tda/dedup.py): a block materializes
    as ONE pandas group, so a hot cell at web scale would OOM its task.
    Blocks larger than ``cell_cap`` are deterministically hash-chunked
    (xxhash64(vec_id) % n_chunks) and every chunk PAIR (i <= j) becomes its
    own group computing intra- (i == j) or cross-chunk (i < j) similarities
    — EXACT (every pair is covered exactly once, no recall loss, unlike
    salting) with per-task memory bounded by cell_cap^2 and the hot cell's
    work spread over (B/cap)^2 parallel tasks instead of one.  The total
    work is unchanged (all-pairs within the block is the operator's
    contract); the replicated rows are proportional to B * n_chunks, i.e.
    exactly the join fan-out the pair count already implies.  ``None``
    disables the guard (single group per block, the pre-r6 behavior)."""

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({"id_a": [], "id_b": [], "cos_sim": []}).astype(
            {"id_a": "int64", "id_b": "int64", "cos_sim": "float64"}
        )

    def _round4(a):
        import numpy as np

        # round half-AWAY-FROM-ZERO to match DuckDB round() / Spark F.round
        # (np.round is half-to-even: dyadic 4-decimal ties would diverge from
        # the SQL oracle data-dependently)
        return np.copysign(np.floor(np.abs(a) * 1e4 + 0.5) / 1e4, a)

    def _norm(pdf: pd.DataFrame):
        import numpy as np

        ids = pdf["vec_id"].to_numpy()
        m = np.stack(pdf["embedding"].to_numpy()).astype("float64")
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        return ids, m

    def _intra(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        if len(pdf) < 2:
            return _empty()
        ids, m = _norm(pdf.sort_values("vec_id"))
        sims = m @ m.T
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = sims[ia, ib] >= threshold
        return pd.DataFrame(
            {
                "id_a": ids[ia[keep]],
                "id_b": ids[ib[keep]],
                "cos_sim": _round4(sims[ia[keep], ib[keep]]),
            }
        )

    if not cell_cap:
        return (
            embeddings.select("vec_id", "embedding", block_col)
            .groupBy(block_col)
            .applyInPandas(lambda pdf: _intra(pdf), schema=_PAIRS_SCHEMA)
        )

    def chunk_pairs(key, pdf):  # no hints: Spark infers the grouped-map
        # eval type from the arg count (string hints warn unresolvable here)
        import numpy as np

        ca, cb = key[-2], key[-1]
        if ca == cb:
            return _intra(pdf)
        a, b = pdf[pdf["_chunk"] == ca], pdf[pdf["_chunk"] == cb]
        if not len(a) or not len(b):
            return _empty()
        ids_a, ma = _norm(a)
        ids_b, mb = _norm(b)
        sims = ma @ mb.T
        ia, ib = np.nonzero(sims >= threshold)
        # chunks are hash-assigned, so order pair ids explicitly
        lo = np.minimum(ids_a[ia], ids_b[ib])
        hi = np.maximum(ids_a[ia], ids_b[ib])
        return pd.DataFrame(
            {"id_a": lo, "id_b": hi, "cos_sim": _round4(sims[ia, ib])}
        )

    d = embeddings.select("vec_id", "embedding", block_col)
    # materialize the block assignment ONCE: it is referenced by the sizes
    # aggregate AND the join probe side below, and upstream it is usually an
    # expensive per-row numpy pass (ivf_assign / hyperplane_buckets) that
    # would otherwise run twice per action — same pattern as
    # minhash_lsh_pairs' stats checkpoint
    d = d.localCheckpoint(eager=True)
    # per-block sizes: map-side partial agg -> n_blocks rows, broadcast by
    # AQE in every real blocking scheme (LSH buckets / k-means cells / label
    # domains are all small), so the corpus side stays narrow into the ONE
    # exchange the grouped UDF needs.  NULL-SAFE join: groupBy treats a NULL
    # block as a real group (the uncapped path pairs those rows), so the
    # sizes join must not silently drop them
    sizes = d.groupBy(block_col).agg(F.count("*").alias("_n"))
    nch = F.greatest(F.lit(1), F.ceil(F.col("_n") / F.lit(cell_cap)))
    return (
        d.join(
            sizes.withColumnRenamed(block_col, "_blk"),
            F.col(block_col).eqNullSafe(F.col("_blk")),
        )
        .drop("_blk")
        .withColumn("_chunk", F.pmod(F.xxhash64("vec_id"), nch).cast("int"))
        .withColumn(
            "_other", F.explode(F.sequence(F.lit(0), nch.cast("int") - 1))
        )
        .select(
            "vec_id",
            "embedding",
            block_col,
            "_chunk",
            F.least("_chunk", "_other").alias("_ca"),
            F.greatest("_chunk", "_other").alias("_cb"),
        )
        .groupBy(block_col, "_ca", "_cb")
        .applyInPandas(chunk_pairs, schema=_PAIRS_SCHEMA)
    )


def cosine_near_dup_pairs_lsh(
    embeddings: DataFrame, planes, threshold: float = 0.95,
    cell_cap: int | None = 4096,
) -> DataFrame:
    """Embedding near-dup pairs blocked on the LSH bucket — the scale form of
    cosine_near_dup_pairs (no label column needed): hyperplane buckets bound
    the quadratic term, one numpy matmul per bucket.  Recall = pairs whose
    members share all hyperplane signs; more planes -> smaller blocks, lower
    recall (standard LSH trade).  ``cell_cap`` guards hot buckets (exact
    chunking, see cosine_near_dup_pairs)."""
    with_bucket = hyperplane_buckets(embeddings, planes, keep_embedding=True)
    return cosine_near_dup_pairs(
        with_bucket, threshold=threshold, block_col="bucket", cell_cap=cell_cap
    )


# -- IVF (inverted-file) ANN --------------------------------------------------


def kmeans_centroids(embeddings: DataFrame, k: int = 16, iters: int = 5,
                     sample: int = 4096):
    """Deterministic coarse quantizer: Lloyd iterations on a fixed sample.

    The standard IVF train path — the quantizer is trained driver-side on a
    bounded sample (orderBy vec_id limit N: deterministic regardless of
    partitioning), assignment runs distributed.  Init = first k sample
    vectors; an emptied cluster keeps its previous centroid.  Returns a
    list[list[float]] (plain python: ships as a tiny broadcast/literal)."""
    import numpy as np

    rows = embeddings.orderBy("vec_id").limit(sample).select("embedding").collect()
    return lloyd_centroids([r["embedding"] for r in rows], k, iters)


def lloyd_centroids(vectors, k: int = 16, iters: int = 5):
    """Pure Lloyd loop over an already-sampled vector list (float64 numpy);
    shared by the Spark trainer and the contract-oracle generator so both
    produce bit-identical centroids."""
    import numpy as np

    x = np.array(vectors, dtype="float64")
    cents = x[:k].copy()
    for _ in range(iters):
        scores = -2.0 * (x @ cents.T) + (cents * cents).sum(axis=1)
        assign = scores.argmin(axis=1)
        for c in range(k):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return [[float(v) for v in c] for c in cents]


def ivf_assign(embeddings: DataFrame, centroids, keep_embedding: bool = False) -> DataFrame:
    """(vec_id, centroid_id[, embedding]): nearest centroid by L2, computed as
    argmin(-2 e·c + ||c||^2) with one numpy matmul per Arrow batch.

    ``keep_embedding=True`` carries the vector through the same narrow pass —
    the cell-build path (write_ivf_cells / ivf_topk) uses it so assignment
    needs NO join back to the corpus (a vec_id equi-join would shuffle the
    full embedding table)."""
    import numpy as np
    import pandas as pd

    cents = [list(map(float, c)) for c in centroids]
    schema = "vec_id long, centroid_id int" + (
        ", embedding array<float>" if keep_embedding else ""
    )

    def run(batches):
        c = np.array(cents, dtype="float64")
        c_norm2 = (c * c).sum(axis=1)
        for pdf in batches:
            x = np.stack(pdf["embedding"].to_numpy()).astype("float64")
            assign = (-2.0 * (x @ c.T) + c_norm2).argmin(axis=1)
            out = {"vec_id": pdf["vec_id"], "centroid_id": assign.astype("int32")}
            if keep_embedding:
                out["embedding"] = pdf["embedding"]
            yield pd.DataFrame(out)

    return embeddings.select("vec_id", "embedding").mapInPandas(run, schema=schema)


def ivf_probe_centroids(query, centroids, nprobe: int = 2):
    """The nprobe nearest centroid ids to the query (driver-side, tiny)."""
    scored = []
    for i, c in enumerate(centroids):
        s = -2.0 * sum(a * b for a, b in zip(query, c)) + sum(v * v for v in c)
        scored.append((s, i))
    scored.sort()
    return [i for (_s, i) in scored[:nprobe]]


def ivf_topk(embeddings: DataFrame, centroids, query, k: int = 10,
             nprobe: int = 2) -> DataFrame:
    """One-shot IVF ANN top-k: score only vectors assigned to the nprobe
    nearest centroids.  Assignment carries the vector through the SAME narrow
    mapInPandas pass and the probe is a plain filter on centroid_id — no join
    back to the corpus, no broadcast of a membership set (the previous form
    broadcast ~nprobe/k of the corpus' vec_ids per probe: an OOM at 10^9
    vectors).  For repeated probes use write_ivf_cells + ivf_topk_partitioned
    so the full-corpus assignment scan is paid once, not per query."""
    probe = ivf_probe_centroids(query, centroids, nprobe)
    in_cells = (
        ivf_assign(embeddings, centroids, keep_embedding=True)
        .filter(F.col("centroid_id").isin(probe))
        .drop("centroid_id")
    )
    return brute_force_topk(in_cells, query, k)


def write_ivf_cells(embeddings: DataFrame, centroids, path: str) -> None:
    """Materialize the corpus ONCE as parquet partitioned by IVF cell.

    The ANN serving path at scale (twin of write_bucketed_embeddings for the
    hyperplane-LSH index): the full-corpus assignment scan is paid at build
    time, and every subsequent probe reads exactly nprobe partition
    directories via Catalyst partition pruning — never the corpus."""
    cells = ivf_assign(embeddings, centroids, keep_embedding=True)
    cells.write.mode("overwrite").partitionBy("centroid_id").parquet(path)


def ivf_topk_partitioned(spark, path: str, centroids, query, k: int = 10,
                         nprobe: int = 2) -> DataFrame:
    """Probe a materialized IVF index: partition-pruned scan of the nprobe
    nearest cells -> exact cosine top-k inside them."""
    probe = ivf_probe_centroids(query, centroids, nprobe)
    in_cells = (
        spark.read.parquet(path)
        .filter(F.col("centroid_id").isin(probe))
        .drop("centroid_id")
    )
    return brute_force_topk(in_cells, query, k)


def make_planes(dim: int, n_planes: int = 8, seed: int = 42):
    """Deterministic pseudo-random hyperplanes (LCG, no RNG state at exec time)."""
    planes = []
    state = seed
    for _ in range(n_planes):
        plane = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
            plane.append((state / float(1 << 63)) * 2.0 - 1.0)
        planes.append(plane)
    return planes


# -- SemDeDup (semantic dedup over embedding space) ---------------------------


def semantic_dedup_k(n_docs: int, target_cell: int = 4096,
                     sample: int = 4096) -> int:
    """Corpus-size-derived cell count for SemDeDup: k = ceil(n / target_cell)
    so the EXPECTED cell is matmul-sized, clamped to sample//4 (the Lloyd
    quantizer needs a few sample points per cell to be meaningful).  The
    SemDeDup paper uses k=50k at web scale (Abbas et al. 2023 §3) — at that
    scale pass ``sample`` >= 4*k and train on the larger sample; the 4096
    default bounds the driver collect for the contract/bench path."""
    import math

    return max(1, min(sample // 4, math.ceil(n_docs / max(1, target_cell))))


def semantic_dedup_pairs(
    embeddings: DataFrame,
    k: int | str = 16,
    iters: int = 5,
    sample: int = 4096,
    threshold: float = 0.95,
    cell_cap: int | None = 4096,
    target_cell: int = 4096,
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs (Abbas et al. 2023):
    k-means-cluster the embedding space with the existing IVF coarse
    quantizer, then compute cosine pairs ONLY within each cluster cell.

    Pure composition of scale-proven pieces — kmeans_centroids (bounded
    driver sample) -> ivf_assign (narrow Arrow pass, embedding carried, no
    join back to the corpus) -> cosine_near_dup_pairs blocked on
    centroid_id (one numpy matmul per cell) — so the quadratic term is
    bounded by the largest CELL, never the corpus: semantic dedup at 100 TB
    without a new engine primitive.

    ``k="auto"`` derives the cell count from a corpus count (parquet
    metadata makes this near-free): k = ceil(n / target_cell), clamped —
    see semantic_dedup_k.  ``cell_cap`` additionally hard-bounds any HOT
    cell's group memory via exact chunking (cosine_near_dup_pairs), so a
    skewed quantizer cannot OOM a task regardless of k."""
    if k == "auto":
        # localCheckpoint BEFORE counting (r7, ADVICE): embeddings is
        # usually the tail of an expensive upstream plan, and the count
        # would otherwise run it once for sizing and again for the kmeans
        # sample/assign passes.  Checkpoint materializes it exactly once.
        embeddings = embeddings.localCheckpoint(eager=True)
        k = semantic_dedup_k(embeddings.count(), target_cell, sample)
    cents = kmeans_centroids(embeddings, k=k, iters=iters, sample=sample)
    assigned = ivf_assign(embeddings, cents, keep_embedding=True)
    return cosine_near_dup_pairs(
        assigned, threshold=threshold, block_col="centroid_id",
        cell_cap=cell_cap,
    )


def semantic_dedup(
    embeddings: DataFrame,
    k: int | str = 16,
    iters: int = 5,
    sample: int = 4096,
    threshold: float = 0.95,
    cell_cap: int | None = 4096,
    target_cell: int = 4096,
) -> DataFrame:
    """Full SemDeDup verdict: (doc_id, cluster_id, keep) over the semantic
    pair graph — semantic_dedup_pairs resolved with the shared
    connected-components survivor machinery (tda/dedup.near_dup_resolve,
    keep_min).  Join ``keep`` back to the corpus on vec_id to filter."""
    from .dedup import near_dup_resolve

    pairs = semantic_dedup_pairs(
        embeddings, k=k, iters=iters, sample=sample, threshold=threshold,
        cell_cap=cell_cap, target_cell=target_cell,
    ).selectExpr("id_a as doc_a", "id_b as doc_b")
    return near_dup_resolve(pairs)


# -- Product quantization (PQ) ANN --------------------------------------------


def pq_codebooks(embeddings: DataFrame, m: int = 4, ksub: int = 16,
                 iters: int = 5, sample: int = 4096):
    """Per-subspace PQ codebooks (Jégou et al., "Product Quantization for
    Nearest Neighbor Search", TPAMI 2011): the embedding dimension is split
    into ``m`` contiguous subvectors and each subspace gets its own
    ``ksub``-word codebook from the SAME deterministic Lloyd loop the IVF
    coarse quantizer uses (lloyd_centroids — shared with the contract-oracle
    generator, so both sides train bit-identical codebooks).

    Trained driver-side on a bounded sample (orderBy vec_id limit N —
    deterministic regardless of partitioning), exactly like
    kmeans_centroids.  Returns list[m][ksub][dsub] of plain python floats
    (tiny: ships as literals / closure state, never a shuffle)."""
    rows = embeddings.orderBy("vec_id").limit(sample).select("embedding").collect()
    vecs = [list(map(float, r["embedding"])) for r in rows]
    if not vecs:
        raise ValueError("pq_codebooks: empty embedding sample")
    dim = len(vecs[0])
    if dim % m:
        raise ValueError(f"pq_codebooks: dim {dim} not divisible by m={m}")
    dsub = dim // m
    return [
        lloyd_centroids([v[mi * dsub:(mi + 1) * dsub] for v in vecs], ksub, iters)
        for mi in range(m)
    ]


def pq_encode(embeddings: DataFrame, codebooks) -> DataFrame:
    """(vec_id, codes:array<int>) — per subspace, the L2-nearest codeword
    index, computed as argmin(-2 x_sub·c + ||c||^2) with one numpy matmul per
    (Arrow batch, subspace).  A narrow zero-shuffle pass, same shape as
    ivf_assign.

    This is THE scale lever of PQ: a 64-dim float corpus (256 B/vector)
    compresses to m int8-sized codes (m=4 -> 4 B/vector, 64x), so the code
    table for 10^9 vectors fits a handful of executors and an ADC scan of the
    FULL corpus is memory-bandwidth cheap — no probe-time access to the raw
    vectors at all."""
    import numpy as np

    cb = [[list(map(float, c)) for c in book] for book in codebooks]
    m = len(cb)
    dsub = len(cb[0][0])
    schema = T.StructType([
        embeddings.schema["vec_id"],
        T.StructField("codes", T.ArrayType(T.IntegerType(), False), False),
    ])

    def run(batches):
        books = np.array(cb, dtype="float64")          # m x ksub x dsub
        norm2 = (books * books).sum(axis=2)            # m x ksub
        for pdf in batches:
            if not len(pdf):                           # Arrow: empty batch would
                continue                               # mistype list<int32>
            x = np.stack(pdf["embedding"].to_numpy()).astype("float64")
            codes = np.empty((len(x), m), dtype="int32")
            for mi in range(m):
                xs = x[:, mi * dsub:(mi + 1) * dsub]
                codes[:, mi] = (
                    -2.0 * (xs @ books[mi].T) + norm2[mi]
                ).argmin(axis=1)
            yield pd.DataFrame({"vec_id": pdf["vec_id"], "codes": list(codes)})

    return embeddings.select("vec_id", "embedding").mapInPandas(run, schema=schema)


def pq_adc_lut(query, codebooks):
    """m x ksub asymmetric-distance lookup table: the query subvector's inner
    product with every codeword (driver-side, tiny).  Sequential python sums
    (like ivf_probe_centroids) so the oracle generator can inline the SAME
    float literals."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    lut = []
    for mi, book in enumerate(codebooks):
        qs = [float(v) for v in query[mi * dsub:(mi + 1) * dsub]]
        lut.append([sum(a * b for a, b in zip(qs, c)) for c in book])
    return lut


def pq_adc_topk(codes: DataFrame, query, codebooks, k: int = 10) -> DataFrame:
    """ADC top-k over a PQ-encoded corpus: score(vec) = sum_m lut[m][code_m],
    the classic asymmetric-distance inner-product approximation.  The lookup
    is pure JVM — element_at over an m-literal-array LUT (no UDF, no join,
    whole-stage codegen) — followed by TakeOrderedAndProject; the scan reads
    ONLY the code table, never the raw vectors."""
    from functools import reduce
    from operator import add

    lut = pq_adc_lut(query, codebooks)
    terms = [
        F.element_at(
            F.array(*[F.lit(float(v)) for v in lut[mi]]),
            F.col("codes").getItem(mi) + F.lit(1),
        )
        for mi in range(len(lut))
    ]
    return (
        codes.select(
            "vec_id", F.round(reduce(add, terms), 4).alias("adc_score")
        )
        .orderBy(F.desc("adc_score"), F.asc("vec_id"))
        .limit(k)
    )


def pq_topk_rerank(
    embeddings: DataFrame, codes: DataFrame, query, codebooks,
    k: int = 10, shortlist: int | None = None,
) -> DataFrame:
    """The full PQ serving pattern: ADC over the compressed code table picks
    a ``shortlist`` (default 4k) of candidates, then ONLY those raw vectors
    are fetched and exactly re-ranked by cosine (brute_force_topk on the
    pruned set).  ADC alone resolves to code granularity — near-identical
    vectors share a code and tie — so the re-rank step is what buys exact
    ordering while still never scanning raw vectors beyond the shortlist.
    The shortlist join broadcasts ~4k ids: bounded by construction."""
    shortlist = shortlist or 4 * k
    short = pq_adc_topk(codes, query, codebooks, k=shortlist).select("vec_id")
    return brute_force_topk(
        embeddings.join(F.broadcast(short), "vec_id"), query, k
    )


# -- IVF-PQ composed index -----------------------------------------------------


def ivfpq_encode(embeddings: DataFrame, centroids, codebooks) -> DataFrame:
    """(vec_id, centroid_id, codes): coarse IVF assignment AND PQ encode in
    ONE narrow Arrow pass — the combined index build never shuffles and
    never re-reads the corpus.  The stored index carries NO raw vectors:
    cell id + m code bytes per vector is the entire serving state (the
    FAISS IVF-PQ layout; this variant quantizes the raw vector rather than
    the residual-vs-centroid, trading a little ADC sharpness for an oracle-
    exact composition of the two quantizers)."""
    import numpy as np

    cents = [list(map(float, c)) for c in centroids]
    cb = [[list(map(float, c)) for c in book] for book in codebooks]
    m = len(cb)
    dsub = len(cb[0][0])
    schema = T.StructType([
        embeddings.schema["vec_id"],
        T.StructField("centroid_id", T.IntegerType(), False),
        T.StructField("codes", T.ArrayType(T.IntegerType(), False), False),
    ])

    def run(batches):
        c = np.array(cents, dtype="float64")
        c_norm2 = (c * c).sum(axis=1)
        books = np.array(cb, dtype="float64")
        b_norm2 = (books * books).sum(axis=2)
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype("float64")
            assign = (-2.0 * (x @ c.T) + c_norm2).argmin(axis=1)
            codes = np.empty((len(x), m), dtype="int32")
            for mi in range(m):
                xs = x[:, mi * dsub:(mi + 1) * dsub]
                codes[:, mi] = (
                    -2.0 * (xs @ books[mi].T) + b_norm2[mi]
                ).argmin(axis=1)
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"],
                "centroid_id": assign.astype("int32"),
                "codes": list(codes),
            })

    return embeddings.select("vec_id", "embedding").mapInPandas(run, schema=schema)


def write_ivfpq_index(embeddings: DataFrame, centroids, codebooks,
                      path: str) -> None:
    """Materialize the IVF-PQ index ONCE as parquet partitioned by cell:
    probes prune to nprobe directories AND scan only code columns — the
    10^9-vector serving shape (cells bound the scan, codes bound the
    bytes).

    The code rows are pre-shuffled onto their cell before the partitioned
    write: without it every writer task opens a file in every cell dir
    (tasks x cells small files — measured 74.6 s vs 4.0 s at 1M x 256
    cells, scripts/smoke_pq.py), and unlike write_ivf_cells the thing being
    shuffled here is the 64x-compressed code table, not raw vectors, so the
    exchange is ~free."""
    ivfpq_encode(embeddings, centroids, codebooks).repartition(
        "centroid_id"
    ).write.mode("overwrite").partitionBy("centroid_id").parquet(path)


def ivfpq_topk(spark, path: str, centroids, codebooks, query,
               k: int = 10, nprobe: int = 2) -> DataFrame:
    """Probe a materialized IVF-PQ index: partition-pruned scan of the
    nprobe nearest cells, ADC scoring over their code columns (pure JVM,
    pq_adc_topk) — raw vectors are never touched; chain pq_topk_rerank
    against the raw corpus when exact ordering of the shortlist matters."""
    probe = ivf_probe_centroids(query, centroids, nprobe)
    in_cells = spark.read.parquet(path).filter(
        F.col("centroid_id").isin(probe)
    )
    return pq_adc_topk(in_cells, query, codebooks, k=k)
