"""r7 A/B: eager vs lazy localCheckpoint in the arrow pair-dedup paths
(tmux only).  Patches the eager flag via monkeypatched DataFrame method."""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from list_extractor_spark.engine.session import get_spark  # noqa: E402
from list_extractor_spark.tda import dedup  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
spark = get_spark("ab_ckpt_r07", master="local[32]", shuffle_partitions=32)
docs = spark.read.parquet(f"{SF}/documents.parquet").select(
    F.col("doc_id").cast("string").alias("doc_id"), "text"
)
docs.count()

_orig = DataFrame.localCheckpoint


def lazy_ckpt(self, eager=True):
    return _orig(self, eager=False)


def run(q):
    q().write.format("noop").mode("overwrite").save()


CASES = {
    "minhash": lambda: dedup.minhash_lsh_pairs(docs, k=16, bands=4, threshold=0.2, bucket_cap=50),
    "shingle": lambda: dedup.shingle_jaccard_pairs(docs, threshold=0.2, df_cap=50),
}
for fn in CASES.values():
    run(fn)

out = {}
for rep in range(4):
    for name, fn in CASES.items():
        for mode in ("eager", "lazy"):
            DataFrame.localCheckpoint = _orig if mode == "eager" else lazy_ckpt
            t0 = time.time()
            run(fn)
            out.setdefault(f"{name}_{mode}", []).append(round(time.time() - t0, 3))
DataFrame.localCheckpoint = _orig
print(json.dumps({k: min(v) for k, v in out.items()}))
print(json.dumps(out))
