"""r7 breakdown of minhash_lsh_pairs at $SPARK_GRAFT_SF_DIR (tmux only):
stats pass alone vs checkpoint vs candidates vs full query."""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from list_extractor_spark.engine.session import get_spark  # noqa: E402
from list_extractor_spark.engine.stats import spread_scan  # noqa: E402
from list_extractor_spark.tda import dedup  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
spark = get_spark("profile_minhash_r07", master="local[32]", shuffle_partitions=32)
docs = spark.read.parquet(f"{SF}/documents.parquet").select(
    F.col("doc_id").cast("string").alias("doc_id"), "text"
)
docs.count()  # warm

def t(fn):
    best = None
    for _ in range(3):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)

def noop(df):
    df.write.format("noop").mode("overwrite").save()

out = {}
out["stats_noop"] = t(lambda: noop(dedup.minhash_doc_stats(spread_scan(docs))))
out["stats_ckpt"] = t(lambda: dedup.minhash_doc_stats(spread_scan(docs)).localCheckpoint(eager=True))

# candidates only (band join + distinct), reusing one checkpoint
stats = dedup.minhash_doc_stats(spread_scan(docs)).localCheckpoint(eager=True)
bands = 4
banded = stats.select(
    "doc_id",
    F.stack(F.lit(bands), *[x for b in range(bands) for x in (F.lit(b), F.col(f"bh_{b}"))]).alias("band_id", "bh"),
)
banded = dedup._cap_postings(banded, ["band_id", "bh"], 50)
cand = (
    banded.alias("x").join(banded.alias("y"), ["band_id", "bh"])
    .filter(F.col("x.doc_id") < F.col("y.doc_id"))
    .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
    .distinct()
)
out["n_candidates"] = cand.count()
out["cand_noop"] = t(lambda: noop(cand))
out["full"] = t(lambda: noop(dedup.minhash_lsh_pairs(docs, k=16, bands=4, threshold=0.2, bucket_cap=50)))
print(json.dumps(out))
