"""Scale smoke for continuous-ingestion dedup (minhash_incremental_pairs +
dedup_incoming): a committed corpus of N_CORPUS docs, an incoming batch of
N_INCOMING docs with planted duplicates —

  * every incoming doc with id % 20 == 0 is an exact copy of a corpus doc
    (cross-side dup: must drop, the committed copy wins);
  * every incoming doc with id % 20 == 7 is an exact copy of the incoming
    doc at id-4 (a normal doc, mod 3 — NOT a cross-plant, whose text is a
    corpus doc's; within-batch dup: keep_min keeps id-4, drops id).

Everything is a deterministic function of doc_id (no RNG).  The smoke
asserts planted recall/precision exactly at threshold 0.5 (exact copies
have Jaccard 1.0 and identical band hashes, so LSH cannot miss them; the
word-soup originals share almost nothing, so false pairs would be a bug)
and reports wall time for the pair join and the verdict.

Usage: python scripts/smoke_incremental_dedup.py [N_TOTAL] [CPUS]
Emits one JSON line.  Benchmark discipline: run inside tmux on a quiet host
(background Bash tasks are CPU-throttled on this box).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from list_extractor_spark.engine.session import get_spark  # noqa: E402
from list_extractor_spark.tda.dedup import (  # noqa: E402
    dedup_incoming,
    minhash_incremental_pairs,
)

N_TOTAL = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
CPUS = sys.argv[2] if len(sys.argv) > 2 else os.environ.get("SPARK_GRAFT_CPUS", "32")
N_CORPUS = (N_TOTAL * 3) // 4
VOCAB = 50_000
DOC_LEN = 80


def build_docs(spark):
    r = spark.range(N_TOTAL).select(F.col("id").alias("doc_id"))
    incoming = F.col("doc_id") >= N_CORPUS
    mod = F.pmod(F.col("doc_id"), F.lit(20))
    # planted dups read their text from another doc's effective id
    eff = (
        F.when(incoming & (mod == 0), F.col("doc_id") - N_CORPUS)
        .when(incoming & (mod == 7), F.col("doc_id") - 4)
        .otherwise(F.col("doc_id"))
    )
    j = F.sequence(F.lit(0), F.lit(DOC_LEN - 1))
    word = (
        F.pmod(
            (F.col("eff") + F.col("k")) * F.lit(2654435761),
            F.pmod(F.col("k") * F.lit(40503) + F.col("eff"), F.lit(VOCAB)) + 1,
        )
    ).cast("long")
    return (
        r.select("doc_id", eff.alias("eff"))
        .select("doc_id", "eff", F.explode(j).alias("k"))
        .select("doc_id", F.concat(F.lit("w"), word).alias("w"))
        .groupBy("doc_id")
        .agg(F.concat_ws(" ", F.collect_list("w")).alias("text"))
        .select(F.col("doc_id").cast("string").alias("doc_id"), "text")
    )


def main():
    spark = get_spark(
        "smoke-incremental-dedup",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    docs = build_docs(spark).localCheckpoint()  # exclude synth from timings
    corpus = docs.filter(F.col("doc_id").cast("long") < N_CORPUS)
    incoming = docs.filter(F.col("doc_id").cast("long") >= N_CORPUS)
    out = {"n_corpus": N_CORPUS, "n_incoming": N_TOTAL - N_CORPUS, "cpus": int(CPUS)}

    t0 = time.time()
    pairs = minhash_incremental_pairs(
        corpus, incoming, threshold=0.5, bucket_cap=50
    )
    out["n_pairs"] = pairs.count()
    out["pairs_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    verdict = dedup_incoming(corpus, incoming, threshold=0.5, bucket_cap=50)
    dropped = {
        int(r["doc_id"])
        for r in verdict.filter(~F.col("keep")).collect()
    }
    out["verdict_sec"] = round(time.time() - t0, 2)
    out["n_dropped"] = len(dropped)

    planted = {
        d
        for d in range(N_CORPUS, N_TOTAL)
        if d % 20 == 0 or d % 20 == 7
    }
    out["n_planted"] = len(planted)
    hit = len(dropped & planted)
    out["planted_recall"] = round(hit / len(planted), 6)
    out["drop_precision"] = round(hit / max(len(dropped), 1), 6)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
