"""A/B: winnowing posting strategies at scale (VERDICT r3 task 8).

A = explode + per-doc window min (tda/textstats.winnow_posting): one
    shuffle carrying one row per character position (~2x corpus bytes).
B = per-doc rolling min inside mapInPandas (winnow_posting_arrow): zero
    shuffle, vectorized xxhash64 replica per Arrow batch.

Corpus: sf0.1 documents text replicated to ~N docs (distributed, staged
through parquet so generator cost stays out of the timing).  Interleaved
min-of-REPS per the host-noise protocol.  Run inside tmux only.

Usage: python scripts/bench_winnow_ab.py [n_docs]
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
from list_extractor_spark.tda import textstats  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    spark = get_spark("winnow-ab", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    n_base = base.count()
    copies = max(1, n_docs // n_base)
    staged = os.path.join("/tmp", f"winnow_ab_{n_base}x{copies}")
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

    strategies = {
        "window": textstats.winnow_posting,
        "arrow": textstats.winnow_posting_arrow,
    }
    # row-count sanity: both must select the identical number of fingerprints
    counts = {name: fn(docs).count() for name, fn in strategies.items()}
    assert counts["window"] == counts["arrow"], counts

    best: dict[str, float] = {}
    order = ["window", "arrow", "arrow", "window"] * ((REPS + 1) // 2)
    for name in order[: 2 * REPS]:
        t0 = time.time()
        strategies[name](docs).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best[name] = min(best.get(name, float("inf")), dt)

    print(
        json.dumps(
            {
                "n_docs": total,
                "n_fp": counts["arrow"],
                "window_sec": round(best["window"], 3),
                "arrow_sec": round(best["arrow"], 3),
                "speedup_arrow": round(best["window"] / best["arrow"], 3),
                "reps": REPS,
                "cpus": CPUS,
            }
        )
    )


if __name__ == "__main__":
    main()
