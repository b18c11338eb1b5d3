"""r7 scale sanity (tmux only): 5x the sf1.0 documents table (shifted ids)
-> do the rewritten dedup paths scale linearly with no plan cliffs?"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from list_extractor_spark.engine.session import get_spark  # noqa: E402
from list_extractor_spark.tda import dedup, textstats  # noqa: E402

spark = get_spark("scale_check", master="local[32]", shuffle_partitions=32)
base = spark.read.parquet("/root/testdata/sf1.0/documents.parquet")
out_dir = "/tmp/scale_check_docs"
if not os.path.exists(os.path.join(out_dir, "_SUCCESS")):
    parts = []
    for i in range(5):
        parts.append(
            base.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
        )
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big.repartition(64).write.mode("overwrite").parquet(out_dir)

docs = spark.read.parquet(out_dir).select(
    F.col("doc_id").cast("string").alias("doc_id"), "text"
)
n = docs.count()

CASES = {
    "minhash": lambda d: dedup.minhash_lsh_pairs(d, k=16, bands=4, threshold=0.2, bucket_cap=50),
    "shingle": lambda d: dedup.shingle_jaccard_pairs(d, threshold=0.2, df_cap=50),
    "quality": lambda d: textstats.quality_scores(d),
}
small = spark.read.parquet("/root/testdata/sf1.0/documents.parquet").select(
    F.col("doc_id").cast("string").alias("doc_id"), "text"
)
out = {"n_docs_big": n}
for name, fn in CASES.items():
    for tag, d in (("1x", small), ("5x", docs)):
        best = None
        for _ in range(3):
            t0 = time.time()
            fn(d).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[f"{name}_{tag}"] = round(best, 3)
    out[f"{name}_ratio"] = round(out[f"{name}_5x"] / out[f"{name}_1x"], 2)
print(json.dumps(out))
