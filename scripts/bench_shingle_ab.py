"""A/B: shingle posting strategies at scale (same discipline as
bench_winnow_ab).  narrow = explode(sequence)+slice in the scan task (one
exchange: the distinct); window = posexplode + per-doc window lead (extra
full-corpus exchange before the distinct).  Measures both the posting alone
and the full shingle_jaccard_pairs query.  Run inside tmux only.

Usage: python scripts/bench_shingle_ab.py [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from list_extractor_spark.engine.session import get_spark  # noqa: E402
from list_extractor_spark.tda import dedup  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    spark = get_spark("shingle-ab", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    n_base = base.count()
    copies = max(1, n_docs // n_base)
    staged = os.path.join("/tmp", f"winnow_ab_{n_base}x{copies}")  # reuse corpus
    if not os.path.exists(os.path.join(staged, "_SUCCESS")):
        (
            base.select("doc_id", "text")
            .crossJoin(spark.range(copies).select(F.col("id").alias("rep")))
            .select(
                F.concat_ws("_", F.col("doc_id").cast("string"), "rep").alias("doc_id"),
                "text",
            )
            .repartition(CPUS * 4)
            .write.mode("overwrite")
            .parquet(staged)
        )
    docs = spark.read.parquet(staged)
    total = docs.count()

    counts = {
        st: dedup.shingle_posting(docs, strategy=st).count()
        for st in ("narrow", "window")
    }
    assert counts["narrow"] == counts["window"], counts

    best: dict[str, float] = {}
    jobs = {
        "posting_narrow": lambda: dedup.shingle_posting(docs, strategy="narrow"),
        "posting_window": lambda: dedup.shingle_posting(docs, strategy="window"),
        "pairs_narrow": lambda: dedup.shingle_jaccard_pairs(
            docs, threshold=0.2, df_cap=50, posting_strategy="narrow"),
        "pairs_window": lambda: dedup.shingle_jaccard_pairs(
            docs, threshold=0.2, df_cap=50, posting_strategy="window"),
    }
    order = list(jobs) + list(reversed(list(jobs)))
    for _ in range(max(1, REPS - 1)):
        for name in order:
            t0 = time.time()
            jobs[name]().write.format("noop").mode("overwrite").save()
            best[name] = min(best.get(name, float("inf")), time.time() - t0)

    print(json.dumps({
        "n_docs": total, "n_shingles": counts["narrow"],
        **{k: round(v, 3) for k, v in best.items()},
        "posting_speedup_narrow": round(best["posting_window"] / best["posting_narrow"], 3),
        "pairs_speedup_narrow": round(best["pairs_window"] / best["pairs_narrow"], 3),
        "reps": REPS, "cpus": CPUS,
    }))


if __name__ == "__main__":
    main()
