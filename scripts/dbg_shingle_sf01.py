"""Why is shingle_jaccard slower at sf0.1 than sf1.0? Print the FINAL AQE
plan skeleton at both SFs after execution (tmux only)."""
import re
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from list_extractor_spark.engine.session import get_spark  # noqa: E402
from list_extractor_spark.tda import dedup  # noqa: E402

spark = get_spark("dbg_shingle", master="local[32]", shuffle_partitions=32)
for sf in ("0.1", "1.0"):
    docs = spark.read.parquet(f"/root/testdata/sf{sf}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    df = dedup.shingle_jaccard_pairs(docs, threshold=0.2, df_cap=50)
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    ops = [l.strip("+-: *") for l in plan.splitlines()
           if re.search(r"(Join|Exchange|Window|Sort\b|Aggregate|Generate|AQEShuffleRead)", l)]
    print(f"=== sf{sf} ===")
    for o in ops[:28]:
        print("  ", o.split("(")[0][:100])
