"""r7 A/B: shingle pair self-join strategy (tmux only).
  bhj      current: planner broadcasts the capped posting (static estimate)
  shj      shuffle_hash hint on the self-join
  anti     df-cap via groupBy+anti-join on the hot set (no window/sort) + shj
All three produce identical rows (asserted once per SF)."""
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
spark = get_spark("ab_selfjoin", master="local[32]", shuffle_partitions=32)
docs = spark.read.parquet(f"{SF}/documents.parquet").select(
    F.col("doc_id").cast("string").alias("doc_id"), "text"
)
docs.count()
THRESH, CAP = 0.2, 50


def pairs_from(capped, stats):
    a = capped.select(F.col("doc_id").alias("doc_a"), "sh")
    b = capped.select(F.col("doc_id").alias("doc_b"), "sh")
    return (
        a.join(b.hint("shuffle_hash"), "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("common"))
        .join(stats.selectExpr("doc_id as doc_a", "n_sh as n_a"), "doc_a")
        .join(stats.selectExpr("doc_id as doc_b", "n_sh as n_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")), 6),
        )
        .filter(F.col("jaccard") >= THRESH)
        .select("doc_a", "doc_b", "jaccard")
    )


def variant(mode):
    stats = dedup.shingle_hash_stats(spread_scan(docs)).localCheckpoint(eager=True)
    posting = stats.select("doc_id", F.explode("sh_hash").alias("sh"))
    if mode == "bhj":
        return dedup.shingle_jaccard_pairs(docs, threshold=THRESH, df_cap=CAP)
    if mode == "shj":
        capped = dedup._cap_postings(posting, "sh", CAP)
        return pairs_from(capped, stats)
    if mode == "merge":
        capped = dedup._cap_postings(posting, "sh", CAP)
        a = capped.select(F.col("doc_id").alias("doc_a"), "sh")
        b = capped.select(F.col("doc_id").alias("doc_b"), "sh")
        j = (a.join(b.hint("merge"), "sh")
             .filter(F.col("doc_a") < F.col("doc_b"))
             .groupBy("doc_a", "doc_b").agg(F.count("*").alias("common"))
             .join(stats.selectExpr("doc_id as doc_a", "n_sh as n_a"), "doc_a")
             .join(stats.selectExpr("doc_id as doc_b", "n_sh as n_b"), "doc_b")
             .withColumn("jaccard", F.round(F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")), 6))
             .filter(F.col("jaccard") >= THRESH)
             .select("doc_a", "doc_b", "jaccard"))
        return j
    if mode == "anti":
        hot = posting.groupBy("sh").agg(F.count("*").alias("_df")).filter(
            F.col("_df") > CAP
        ).select("sh")
        capped = posting.join(hot, "sh", "left_anti")
        return pairs_from(capped, stats)


# identical-result assertion once
base = sorted(map(tuple, variant("bhj").collect()))
for m in ("shj", "merge"):
    assert sorted(map(tuple, variant(m).collect())) == base, m
print("results identical", len(base))

out = {}
for rep in range(4):
    for m in ("shj", "merge"):
        t0 = time.time()
        variant(m).write.format("noop").mode("overwrite").save()
        out.setdefault(m, []).append(round(time.time() - t0, 3))
print(json.dumps({k: min(v) for k, v in out.items()}))
print(json.dumps(out))
