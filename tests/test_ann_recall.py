"""Planted-near-neighbor recall gate for the ANN serving paths.

Both indexes (hyperplane-LSH buckets, IVF cells) trade recall for scan
bounds; this gate MEASURES that trade on a seeded clustered corpus instead
of leaving it as a docstring claim: ground truth = exact cosine top-k
(numpy), recall@10 averaged over one query per planted cluster, asserted
for the single-probe default AND the widened probe (multi-probe LSH /
nprobe=2 IVF).  Measured values are recorded in BENCH/BASELINE.md.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from list_extractor_spark.tda import similarity

DIM, N_CLUSTERS, PER_CLUSTER, K = 32, 24, 40, 10


@pytest.fixture(scope="module")
def planted(spark):
    rng = np.random.RandomState(7)
    centers = rng.normal(size=(N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = np.repeat(centers, PER_CLUSTER, axis=0) + rng.normal(
        scale=0.05, size=(N_CLUSTERS * PER_CLUSTER, DIM)
    )
    queries = centers[:8] + rng.normal(scale=0.05, size=(8, DIM))
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(vecs)],
        schema="vec_id long, embedding array<float>",
    ).coalesce(4)
    # ground truth from the same float32 values the index stores
    v32 = vecs.astype("float32").astype("float64")
    v32n = v32 / np.linalg.norm(v32, axis=1, keepdims=True)
    truth = []
    for q in queries:
        sims = v32n @ (q / np.linalg.norm(q))
        truth.append(set(np.argsort(-sims)[:K].tolist()))
    return df, queries, truth


def _recall(topk_ids, true_ids):
    return len(set(topk_ids) & true_ids) / len(true_ids)


def test_lsh_recall_and_multiprobe_lift(spark, tmp_path, planted):
    df, queries, truth = planted
    planes = similarity.make_planes(DIM, n_planes=6)
    path = str(tmp_path / "lsh")
    similarity.write_bucketed_embeddings(df, planes, path)

    def avg_recall(n_probe):
        rs = []
        for q, t in zip(queries, truth):
            got = [
                r["vec_id"]
                for r in similarity.lsh_topk_bucketed(
                    spark, path, [float(v) for v in q], planes, k=K,
                    n_probe_buckets=n_probe,
                ).collect()
            ]
            rs.append(_recall(got, t))
        return sum(rs) / len(rs)

    single, multi = avg_recall(1), avg_recall(4)
    print(f"\nLSH recall@10: single-probe={single:.3f} multi-probe(4)={multi:.3f}")
    assert multi >= single  # widening the probe never loses candidates
    assert single >= 0.40   # single bucket of 64: planted floor
    assert multi >= 0.80 and multi >= single + 0.2  # margin flips recover splits


def test_ivf_recall_vs_nprobe(spark, tmp_path, planted):
    df, queries, truth = planted
    cents = similarity.kmeans_centroids(df, k=16, iters=5)
    path = str(tmp_path / "ivf")
    similarity.write_ivf_cells(df, cents, path)

    def avg_recall(nprobe):
        rs = []
        for q, t in zip(queries, truth):
            got = [
                r["vec_id"]
                for r in similarity.ivf_topk_partitioned(
                    spark, path, cents, [float(v) for v in q], k=K, nprobe=nprobe
                ).collect()
            ]
            rs.append(_recall(got, t))
        return sum(rs) / len(rs)

    n1, n2 = avg_recall(1), avg_recall(2)
    print(f"IVF recall@10: nprobe=1 {n1:.3f} nprobe=2 {n2:.3f}")
    assert n2 >= n1
    assert n1 >= 0.60   # the planted cluster usually maps to one cell
    assert n2 >= 0.90   # two cells recover boundary-straddling clusters


def test_semantic_dedup_planted_near_dup_recall(spark):
    """SemDeDup recall gate at the threshold band it exists for: plant 40
    near-identical copies (cos > 0.999) of existing corpus vectors and
    require the cell-blocked pair pass to recover >= 90% of them — a
    near-identical pair can only be missed when the quantizer splits two
    almost-coincident points across a cell boundary, which must stay rare.
    (At LOW thresholds cell blocking is measured much weaker — recall 0.45
    at cos 0.3 with k=4 — which is the documented trade: SemDeDup is a
    near-duplicate operator, not a general similarity join.)"""
    import numpy as np

    base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = base.orderBy("vec_id").limit(40).collect()
    rng = np.random.default_rng(7)
    extra = []
    for r in rows:
        v = np.array(r["embedding"], dtype="float64")
        noisy = v * (1.0 + rng.normal(0, 1e-4, size=v.shape))
        extra.append((int(r["vec_id"]) + 900000, [float(x) for x in noisy], 99))
    emb = base.select("vec_id", "embedding", "label").unionByName(
        spark.createDataFrame(
            extra, schema=base.select("vec_id", "embedding", "label").schema
        )
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in similarity.semantic_dedup_pairs(emb, k=8, threshold=0.999).collect()
    }
    want = {(int(r["vec_id"]), int(r["vec_id"]) + 900000) for r in rows}
    recall = len(pairs & want) / len(want)
    assert recall >= 0.9, (recall, sorted(want - pairs)[:5])


def test_pq_encode_matches_python_replica(spark, planted):
    """pq_encode's batched numpy argmin == a per-vector L2 argmin in plain
    python over the same codebooks (float32-roundtripped values, exactly
    what Arrow hands the kernel)."""
    df, _queries, _truth = planted
    books = similarity.pq_codebooks(df, m=4, ksub=16, iters=5)
    cb = np.array(books, dtype="float64")
    dsub = DIM // 4
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype="float64")
        for r in df.filter(F.col("vec_id") < 50).collect()
    }
    got = {
        r["vec_id"]: list(r["codes"])
        for r in similarity.pq_encode(df, books).filter("vec_id < 50").collect()
    }
    for vid, x in vecs.items():
        exp = [
            int(((cb[mi] - x[mi * dsub:(mi + 1) * dsub]) ** 2).sum(axis=1).argmin())
            for mi in range(4)
        ]
        assert got[vid] == exp


def test_pq_adc_cluster_precision_and_rerank_recall(spark, planted):
    """PQ resolves to code granularity: pure ADC must land in the query's
    planted cluster (precision gate), and the ADC-shortlist -> exact-rerank
    serving path must recover near-exact top-k (recall gate).  Measured:
    cluster precision 0.875, rerank recall 0.90 (BENCH/BASELINE.md)."""
    df, queries, truth = planted
    books = similarity.pq_codebooks(df, m=4, ksub=16, iters=5)
    codes = similarity.pq_encode(df, books)
    codes = codes.localCheckpoint(eager=True)

    precs, recs, adc_recs = [], [], []
    for qi, (q, t) in enumerate(zip(queries, truth)):
        qv = [float(v) for v in q]
        adc = [r["vec_id"] for r in similarity.pq_adc_topk(codes, qv, books, k=K).collect()]
        precs.append(sum(1 for i in adc if i // PER_CLUSTER == qi) / K)
        adc_recs.append(_recall(adc, t))
        rr = [
            r["vec_id"]
            for r in similarity.pq_topk_rerank(df, codes, qv, books, k=K).collect()
        ]
        recs.append(_recall(rr, t))
    prec, rec, adc_rec = (sum(x) / len(x) for x in (precs, recs, adc_recs))
    print(f"\nPQ: ADC cluster precision={prec:.3f} rerank recall@10={rec:.3f} "
          f"(pure ADC recall {adc_rec:.3f})")
    assert prec >= 0.80
    assert rec >= 0.85
    assert rec >= adc_rec  # re-ranking never loses vs the raw shortlist


def test_pq_codebooks_validation(spark, planted):
    df, _q, _t = planted
    with pytest.raises(ValueError, match="divisible"):
        similarity.pq_codebooks(df, m=5)  # DIM=32 not divisible by 5


def test_ivfpq_index_is_vectorless_and_equals_composition(spark, tmp_path, planted):
    """The IVF-PQ index must (a) store NO raw vectors — cell id + codes is
    the entire serving state, the storage win the composition exists for —
    and (b) return exactly what composing the two individually-verified
    operators returns: pq_adc_topk over the vectors that ivf_assign puts in
    the probed cells."""
    df, queries, _truth = planted
    cents = similarity.kmeans_centroids(df, k=16, iters=5)
    books = similarity.pq_codebooks(df, m=4, ksub=16, iters=5)
    path = str(tmp_path / "ivfpq")
    similarity.write_ivfpq_index(df, cents, books, path)

    stored = spark.read.parquet(path)
    assert "embedding" not in stored.columns
    assert set(stored.columns) == {"vec_id", "codes", "centroid_id"}
    assert stored.count() == df.count()

    for q in queries[:3]:
        qv = [float(v) for v in q]
        got = [tuple(r) for r in
               similarity.ivfpq_topk(spark, path, cents, books, qv,
                                     k=10, nprobe=2).collect()]
        probe = similarity.ivf_probe_centroids(qv, cents, nprobe=2)
        in_cells = (
            similarity.ivf_assign(df, cents, keep_embedding=True)
            .filter(F.col("centroid_id").isin(probe))
        )
        want = [tuple(r) for r in
                similarity.pq_adc_topk(
                    similarity.pq_encode(in_cells, books), qv, books, k=10
                ).collect()]
        assert got == want and got
