"""Stage-level timing of minhash_lsh_pairs at sf0.1 (quiet host only)."""
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

t = time.time()
posting = dedup.shingle_posting(docs)
out["posting_window"] = [posting.count(), round(time.time() - t, 3)]

t = time.time()
pn = dedup.shingle_posting(docs, strategy="narrow")
out["posting_narrow"] = [pn.count(), round(time.time() - t, 3)]

t = time.time()
sigs = dedup.minhash_signatures(docs)
out["signatures"] = [sigs.count(), round(time.time() - t, 3)]

for rep in range(2):
    t = time.time()
    pairs = dedup.minhash_lsh_pairs(docs, k=16, bands=4, threshold=0.2,
                                    bucket_cap=50)
    out[f"full_pairs_{rep}"] = [pairs.count(), round(time.time() - t, 3)]

print(json.dumps(out))
