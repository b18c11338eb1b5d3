"""A/B timing of minhash_lsh_pairs strategies at sf0.1 (quiet host only)."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from list_extractor_spark.engine.session import get_spark  # noqa: E402
from list_extractor_spark.tda import dedup  # noqa: E402

spark = get_spark("local[32]")
docs = (
    spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    .select(F.col("doc_id").cast("string").alias("doc_id"), "text")
)
docs.count()  # warm scan

out = {}
for rep in range(3):
    for strat in ("arrow", "relational"):
        t = time.time()
        n = dedup.minhash_lsh_pairs(
            docs, k=16, bands=4, threshold=0.2, bucket_cap=50, strategy=strat
        ).count()
        out.setdefault(strat, []).append(round(time.time() - t, 3))
        out[f"{strat}_rows"] = n

print(json.dumps(out))
