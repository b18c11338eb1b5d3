"""Scale smoke for the PQ (product-quantization) ANN path: codebook train ->
full-corpus encode -> ADC probe -> shortlist re-rank, at N vectors x 64 dims.

The corpus is a closed-form function of the row index (hash-noise formula,
no RNG state): C planted clusters, vector i = center(i % C) + 0.05 * noise(i)
— so results are partition-layout independent and re-runs are identical.
The query is cluster 0's center, so the re-ranked top-k has a known answer
set to score against without a 64M-row brute-force ground truth.

What the numbers evidence at 100 TB: the encode pass is the one full-corpus
scan (narrow mapInPandas, linear); after it the serving state is m bytes per
vector (64x smaller than raw float32 at m=4), and an ADC probe touches ONLY
that code table.

Usage: python scripts/smoke_pq.py [N_VECS] [CPUS]
Emits one JSON line.  Benchmark discipline: run inside tmux on a quiet host
(background Bash tasks are CPU-throttled on this box).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from list_extractor_spark.engine.session import get_spark  # noqa: E402
from list_extractor_spark.tda import similarity  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
CPUS = sys.argv[2] if len(sys.argv) > 2 else os.environ.get("SPARK_GRAFT_CPUS", "32")
DIM, CLUSTERS, M, KSUB, K = 64, 1000, 4, 16, 10


def _noise(idx, dim):
    """Deterministic hash-noise in [-1, 1): fract(sin(a*i + b*d) * 43758.5453)."""
    i = idx[:, None].astype("float64")
    d = np.arange(dim, dtype="float64")[None, :]
    x = np.sin(i * 12.9898 + d * 78.233) * 43758.5453
    return (x - np.floor(x)) * 2.0 - 1.0


def _centers():
    c = _noise(np.arange(CLUSTERS) + 10_000_000, DIM)
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def build_corpus(spark):
    centers = _centers()

    def gen(batches):
        for pdf in batches:
            idx = pdf["id"].to_numpy()
            vecs = centers[idx % CLUSTERS] + 0.05 * _noise(idx, DIM)
            yield pd.DataFrame(
                {"vec_id": idx, "embedding": list(vecs.astype("float32"))}
            )

    return (
        spark.range(N).repartition(int(CPUS) * 2)
        .mapInPandas(gen, schema="vec_id long, embedding array<float>")
    )


def main():
    spark = get_spark("smoke-pq", master=f"local[{CPUS}]",
                      shuffle_partitions=int(CPUS))
    corpus = build_corpus(spark).localCheckpoint(eager=True)

    t0 = time.time()
    books = similarity.pq_codebooks(corpus, m=M, ksub=KSUB, iters=5)
    t_train = time.time() - t0

    t0 = time.time()
    codes = corpus  # encode is the one full scan; materialize its output
    codes = similarity.pq_encode(corpus, books).localCheckpoint(eager=True)
    n_codes = codes.count()
    t_encode = time.time() - t0

    query = [float(v) for v in _centers()[0]]
    t0 = time.time()
    adc = [r["vec_id"] for r in
           similarity.pq_adc_topk(codes, query, books, k=K).collect()]
    t_adc = time.time() - t0

    t0 = time.time()
    rr = [r["vec_id"] for r in
          similarity.pq_topk_rerank(corpus, codes, query, books, k=K).collect()]
    t_rerank = time.time() - t0

    # IVF-PQ composed index: build once (one narrow pass), probe pruned
    import tempfile

    t0 = time.time()
    cents = similarity.kmeans_centroids(corpus, k=256, iters=5)
    path = tempfile.mkdtemp(prefix="sg_smoke_ivfpq_")
    similarity.write_ivfpq_index(corpus, cents, books, path)
    t_ivfpq_build = time.time() - t0
    t0 = time.time()
    ivfpq = [r["vec_id"] for r in
             similarity.ivfpq_topk(spark, path, cents, books, query,
                                   k=K, nprobe=2).collect()]
    t_ivfpq_probe = time.time() - t0

    adc_in_cluster = sum(1 for i in adc if i % CLUSTERS == 0) / K
    rerank_in_cluster = sum(1 for i in rr if i % CLUSTERS == 0) / K
    ivfpq_in_cluster = sum(1 for i in ivfpq if i % CLUSTERS == 0) / K
    print(json.dumps({
        "n_vecs": n_codes, "dim": DIM, "m": M, "ksub": KSUB, "cpus": CPUS,
        "train_sec": round(t_train, 2),
        "encode_sec": round(t_encode, 2),
        "encode_vecs_per_sec": int(n_codes / t_encode),
        "adc_probe_sec": round(t_adc, 2),
        "rerank_sec": round(t_rerank, 2),
        "raw_mb": round(N * DIM * 4 / 1e6, 1),
        "codes_mb": round(N * M * 4 / 1e6, 1),  # int32 codes; int8-packable to N*M
        "adc_cluster_precision": adc_in_cluster,
        "rerank_cluster_precision": rerank_in_cluster,
        "ivfpq_build_sec": round(t_ivfpq_build, 2),
        "ivfpq_probe_sec": round(t_ivfpq_probe, 2),
        "ivfpq_cluster_precision": ivfpq_in_cluster,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
