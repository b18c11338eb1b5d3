"""Exact-substring span dedup at corpus scale, over the smoke_curate corpus
(run scripts/smoke_curate.py once first to stage it): the 2% near-dup
families share every sentence except one swapped per copy, so family
members carry long identical token runs — exactly the planted structure
the ExactSubstr pass must find, and the base docs (the canonical copies)
must keep.

Usage: python scripts/smoke_span_dedup.py [N_DOCS] [CPUS] [W]
Emits one JSON line: detection + removal wall times and accounting.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from list_extractor_spark.engine.session import get_spark  # noqa: E402
from list_extractor_spark.tda.dedup import (  # noqa: E402
    dup_span_windows,
    remove_dup_spans,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
CPUS = sys.argv[2] if len(sys.argv) > 2 else os.environ.get("SPARK_GRAFT_CPUS", "32")
W = int(sys.argv[3]) if len(sys.argv) > 3 else 25
STAGE = f"/tmp/sg_curate_corpus_{N}"
if not os.path.exists(STAGE):
    sys.exit(f"corpus not staged — run: python scripts/smoke_curate.py {N}")

spark = get_spark(f"local[{CPUS}]")
docs = spark.read.parquet(STAGE)
out = {"n_docs": N, "cpus": int(CPUS), "w": W}

t0 = time.time()
det = dup_span_windows(docs, w=W).groupBy().agg(
    F.count("*").alias("dup_windows"),
    F.count_distinct("doc_id").alias("docs_hit"),
    F.sum(F.col("is_canonical").cast("long")).alias("canonical"),
).collect()[0]
out["detect_sec"] = round(time.time() - t0, 1)
out["dup_windows"] = int(det["dup_windows"])
out["docs_hit"] = int(det["docs_hit"])
out["distinct_dup_grams"] = int(det["canonical"])

t0 = time.time()
rm = remove_dup_spans(docs, w=W, affected_only=True).groupBy().agg(
    F.count("*").alias("docs_cut"),
    F.sum("n_spans").alias("spans"),
    F.sum("n_tokens_removed").alias("tokens_removed"),
    F.sum("n_tokens_kept").alias("tokens_kept"),
).collect()[0]
out["removal_sec"] = round(time.time() - t0, 1)
out["docs_cut"] = int(rm["docs_cut"])
out["spans"] = int(rm["spans"])
out["tokens_removed"] = int(rm["tokens_removed"])
out["docs_per_sec"] = round(N / (out["detect_sec"] + out["removal_sec"]), 1)
print(json.dumps(out))
