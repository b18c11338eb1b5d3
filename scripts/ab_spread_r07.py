"""r7 A/B: spread_scan vs bare load for the marginal queries (tmux only).
Warmed session, min-of-5 noop timings, interleaved to cancel drift."""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from list_extractor_spark.engine.session import get_spark  # noqa: E402
from list_extractor_spark.engine.stats import spread_scan  # noqa: E402
from list_extractor_spark.tda import dedup, multimodal, similarity  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
spark = get_spark("ab_spread_r07", master="local[32]", shuffle_partitions=32)

docs = spark.read.parquet(f"{SF}/documents.parquet")
emb = spark.read.parquet(f"{SF}/embeddings.parquet").filter(F.col("vec_id") != 0)
import duckdb

(vec,) = duckdb.sql(
    f"select embedding from '{SF}/embeddings.parquet' where vec_id = 0"
).fetchone()
query = [float(x) for x in vec]


def media_feats(d):
    feats = multimodal.extract_media_features(multimodal.media_from_documents(d))
    return feats.select(
        "doc_id", "media_type", F.col("n_bytes").cast("long").alias("n_bytes"),
        F.posexplode("feature").alias("dim_idx", "val"),
    ).withColumn("val", F.col("val").cast("double"))


CASES = {
    "media_bare": lambda: media_feats(docs),
    "media_spread": lambda: media_feats(spread_scan(docs)),
    "simtopk_bare": lambda: similarity.brute_force_topk(emb, query, k=10),
    "simtopk_spread": lambda: similarity.brute_force_topk(spread_scan(emb), query, k=10),
    "exact_bare": lambda: dedup.exact_dedup(docs),
    "exact_spread": lambda: dedup.exact_dedup(spread_scan(docs)),
}

# warm every case once
for fn in CASES.values():
    fn().write.format("noop").mode("overwrite").save()

out = {k: [] for k in CASES}
for rep in range(5):
    for k, fn in CASES.items():
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        out[k].append(round(time.time() - t0, 3))
print(json.dumps({k: min(v) for k, v in out.items()}))
print(json.dumps(out))
