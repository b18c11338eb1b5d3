"""SemDeDup smoke at corpus scale: auto-k quantizer, bounded cells, planted
duplicate families, distributed CC (pair count pushed past the driver
union-find threshold on purpose).

Usage: python scripts/smoke_semantic_dedup.py [N_DOCS] [N_DUPS]
Emits one JSON line: sizes, auto-k, max/mean cell, pair count, cluster
count, per-stage wall.  Embeddings are deterministic per vec_id (partition-
layout independent): doc i >= N and i - N < N_DUPS re-uses doc (i - N)'s
vector times (1 + 1e-4) — a planted near-identical family per duplicated id.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F, types as T  # noqa: E402

from list_extractor_spark.engine.session import get_spark  # noqa: E402
from list_extractor_spark.tda import similarity  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
N_DUPS = int(sys.argv[2]) if len(sys.argv) > 2 else 150_000
DIM = 64
STAGE = f"/tmp/sg_semdedup_{N}_{N_DUPS}"

spark = get_spark(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")

out = {"n_docs": N + N_DUPS, "n_planted_dups": N_DUPS, "dim": DIM}

t0 = time.time()
if not os.path.exists(STAGE):
    schema = T.StructType([
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.DoubleType(), False), False),
    ])

    def gen(batches):
        import numpy as np

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            base = np.where((ids >= N) & (ids - N < N_DUPS), ids - N, ids)
            vecs = np.empty((len(ids), DIM))
            for j, b in enumerate(base):
                vecs[j] = np.random.default_rng(int(b)).standard_normal(DIM)
            vecs[ids >= N] *= 1.0001
            yield pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})

    tmp = STAGE + ".build"
    (spark.range(N + N_DUPS).repartition(64)
     .mapInPandas(gen, schema=schema).write.mode("overwrite").parquet(tmp))
    os.rename(tmp, STAGE)
out["gen_sec"] = round(time.time() - t0, 1)

emb = spark.read.parquet(STAGE)

t0 = time.time()
k = similarity.semantic_dedup_k(emb.count())
cents = similarity.kmeans_centroids(emb, k=k, iters=5, sample=4096)
out["k_auto"] = k
out["train_sec"] = round(time.time() - t0, 1)

t0 = time.time()
assigned = similarity.ivf_assign(emb, cents, keep_embedding=True)
cells = assigned.groupBy("centroid_id").count()
stats = cells.agg(
    F.max("count").alias("mx"), F.avg("count").alias("mean"),
    F.count("*").alias("n")).first()
out["n_cells"] = stats["n"]
out["max_cell"] = stats["mx"]
out["mean_cell"] = round(stats["mean"], 1)
out["assign_sec"] = round(time.time() - t0, 1)

t0 = time.time()
pairs = similarity.semantic_dedup_pairs(
    emb, k=k, threshold=0.999, cell_cap=4096
).selectExpr("id_a as doc_a", "id_b as doc_b").localCheckpoint(eager=True)
n_pairs = pairs.count()
out["pairs"] = n_pairs
out["pairs_sec"] = round(time.time() - t0, 1)

t0 = time.time()
from list_extractor_spark.tda.dedup import near_dup_resolve  # noqa: E402

resolved = near_dup_resolve(pairs)
agg = resolved.agg(
    F.count("*").alias("members"),
    F.count_distinct("cluster_id").alias("clusters"),
    F.sum((~F.col("keep")).cast("long")).alias("dropped"),
).first()
out["members"] = agg["members"]
out["clusters"] = agg["clusters"]
out["dropped"] = agg["dropped"]
out["resolve_sec"] = round(time.time() - t0, 1)
out["planted_recall"] = round(agg["dropped"] / N_DUPS, 4)

print(json.dumps(out))
