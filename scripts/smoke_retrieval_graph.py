"""Scale smoke for the retrieval family and the KG graph analytics:

  * TF-IDF top-terms + BM25 search over a deterministic N-doc corpus with a
    Zipf-ish vocabulary (hub terms appear in most docs, tail terms in few —
    the df skew a real crawl shows);
  * degree_stats + 5-iteration quantized PageRank over a deterministic
    E-edge multigraph with planted hub nodes (10 hubs absorb ~10% of all
    edges, in-degree E/100 each — the in-degree skew of a real KG).

Everything is a closed-form function of the row index (no RNG state), so
results are partition-layout independent and re-runs are identical.

Usage: python scripts/smoke_retrieval_graph.py [N_DOCS] [N_EDGES] [CPUS]
Emits one JSON line.  Benchmark discipline: run inside tmux on a quiet host
(background Bash tasks are CPU-throttled on this box).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from list_extractor_spark.engine.graphstats import degree_stats, pagerank  # noqa: E402
from list_extractor_spark.engine.session import get_spark  # noqa: E402
from list_extractor_spark.tda.retrieval import bm25_search, tfidf_top_terms  # noqa: E402

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
N_EDGES = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
CPUS = sys.argv[3] if len(sys.argv) > 3 else os.environ.get("SPARK_GRAFT_CPUS", "32")

VOCAB = 50_000
DOC_LEN = 80


def build_docs(spark):
    """text = DOC_LEN words; word j of doc i indexes the vocab through a
    squared-hash fold, so low term-ids are hot (Zipf-ish df) and high ones
    rare; a 'probe<i%1000>' marker gives BM25 a selective query term."""
    r = spark.range(N_DOCS).select(F.col("id").alias("doc_id"))
    j = F.sequence(F.lit(0), F.lit(DOC_LEN - 1))
    word = (
        F.pmod(
            (F.col("doc_id") + F.col("k")) * F.lit(2654435761),
            F.pmod(F.col("k") * F.lit(40503) + F.col("doc_id"), F.lit(VOCAB)) + 1,
        )
    ).cast("long")
    return (
        r.select("doc_id", F.explode(j).alias("k"))
        .select("doc_id", F.concat(F.lit("w"), word).alias("w"))
        .groupBy("doc_id")
        .agg(F.concat_ws(" ", F.collect_list("w")).alias("body"))
        .select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.concat(
                F.lit("probe"), F.pmod(F.col("doc_id"), F.lit(1000)),
                F.lit(" "), F.col("body"),
            ).alias("text"),
        )
    )


def build_triples(spark):
    """(subj, pred, obj, obj_dt) entity edges; every 10th edge retargets to
    one of 10 hub nodes (id%10==0 makes id%100 take only {0,10,...,90}), so
    each hub absorbs E/100 in-edges — the mega-list in-degree skew."""
    n_nodes = max(N_DOCS, 1000)
    e = spark.range(N_EDGES)
    src = F.pmod(F.col("id") * F.lit(1103515245) + F.lit(12345), F.lit(n_nodes))
    tail_dst = F.pmod(F.col("id") * F.lit(2654435761), F.lit(n_nodes))
    hub_dst = F.pmod(F.col("id"), F.lit(100))
    dst = F.when(F.pmod(F.col("id"), F.lit(10)) == 0, hub_dst).otherwise(tail_dst)
    return e.select(
        F.concat(F.lit("e"), src).alias("subj"),
        F.lit("p").alias("pred"),
        F.concat(F.lit("e"), dst).alias("obj"),
        F.lit(None).cast("string").alias("obj_dt"),
    )


def main():
    spark = get_spark(
        "smoke-retrieval-graph", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    out = {"n_docs": N_DOCS, "n_edges": N_EDGES, "cpus": int(CPUS)}

    docs = build_docs(spark).localCheckpoint()  # exclude synth cost from timings
    t0 = time.time()
    out["tfidf_rows"] = tfidf_top_terms(docs, k=3).count()
    out["tfidf_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    hits = bm25_search(docs, "probe7 w3 w11", k=10).collect()
    out["bm25_sec"] = round(time.time() - t0, 2)
    out["bm25_top_score"] = hits[0]["score"] if hits else None

    triples = build_triples(spark).localCheckpoint()
    t0 = time.time()
    deg = degree_stats(triples)
    out["graph_nodes"] = deg.count()
    top = deg.orderBy(F.desc("in_degree")).limit(1).collect()[0]
    out["top_hub_in_degree"] = top["in_degree"]
    out["degree_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    pr = pagerank(triples, iters=5)
    out["pagerank_rows"] = pr.count()
    out["pagerank_sec"] = round(time.time() - t0, 2)
    out["pagerank_max"] = pr.agg(F.max("pagerank")).collect()[0][0]

    # 2M edges >> the 100k driver threshold: this exercises the DISTRIBUTED
    # min-label-propagation CC loop, the production path for web-scale KGs
    from list_extractor_spark.engine.graphstats import connected_components

    t0 = time.time()
    cc = connected_components(triples)
    out["cc_rows"] = cc.count()
    out["cc_sec"] = round(time.time() - t0, 2)
    agg = cc.agg(
        F.max("component_size").alias("g"),
        F.count_distinct("component_id").alias("k"),
    ).collect()[0]
    out["cc_giant"] = agg["g"]
    out["cc_n_components"] = agg["k"]

    print(json.dumps(out))


if __name__ == "__main__":
    main()
