"""Scale smoke for the two round-6 relational additions:

  * nhop_neighborhood — frontier BFS over a deterministic E-edge multigraph
    with planted hubs (same closed-form generator as
    smoke_retrieval_graph.py: 10 hubs absorb ~10% of all edges), 3 hops from
    the hub — the worst seed: the frontier explodes through the densest node;
  * funnel — 4-step ordered conversion over a deterministic E-event stream
    (U users, per-user event sequence a closed-form function of the index),
    exercising the single user-keyed exchange + 4-window cascade at volume.

Everything is a closed-form function of the row index (no RNG state), so
results are partition-layout independent and re-runs are identical.

Usage: python scripts/smoke_graph_funnel.py [N_EDGES] [N_EVENTS] [CPUS]
Emits one JSON line.  Benchmark discipline: run inside tmux on a quiet host
(background Bash tasks are CPU-throttled on this box).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from list_extractor_spark.engine.graphstats import nhop_neighborhood  # noqa: E402
from list_extractor_spark.engine.session import get_spark  # noqa: E402
from list_extractor_spark.tda.sessionize import funnel  # noqa: E402

N_EDGES = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
N_EVENTS = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
CPUS = sys.argv[3] if len(sys.argv) > 3 else os.environ.get("SPARK_GRAFT_CPUS", "32")
N_NODES = 400_000
N_USERS = 100_000
STEPS = ["signup", "view", "click", "purchase"]


def build_triples(spark):
    """Closed-form multigraph with planted hubs (smoke_retrieval_graph
    shape) but HASH-mixed endpoints: affine (LCG) endpoint maps collapse the
    hub's in-neighbors into gcd-cosets (measured: 800 or 4000 distinct
    neighbors regardless of 20k in-edges) and starve the BFS frontier;
    xxhash64 endpoints have no residue structure, so hop 2 fans out to most
    of the graph — the frontier-growth stress an n-hop query actually
    faces.  Still deterministic and partition-layout independent."""
    e = spark.range(N_EDGES)
    src = F.pmod(F.xxhash64(F.col("id")), F.lit(N_NODES))
    tail_dst = F.pmod(F.xxhash64(F.col("id") + F.lit(N_EDGES)), F.lit(N_NODES))
    hub_dst = F.pmod(F.col("id"), F.lit(100))
    dst = F.when(F.pmod(F.col("id"), F.lit(10)) == 0, hub_dst).otherwise(tail_dst)
    return e.select(
        F.concat(F.lit("e"), src).alias("subj"),
        F.lit("p").alias("pred"),
        F.concat(F.lit("e"), dst).alias("obj"),
        F.lit(None).cast("string").alias("obj_dt"),
    )


def build_events(spark):
    """Per-user sequences: user = i % U, seq = i // U, ts = epoch + seq
    minutes, type = seq-th element of a fixed 7-cycle — so ~all users march
    through signup -> view -> click -> purchase in order (plus noise types),
    a realistic high-conversion stream."""
    cyc = ["signup", "view", "error", "click", "view", "purchase", "error"]
    e = spark.range(N_EVENTS)
    seq = (F.col("id") / F.lit(N_USERS)).cast("long")
    return e.select(
        F.pmod(F.col("id"), F.lit(N_USERS)).alias("user_id"),
        (F.lit("2026-01-01 00:00:00").cast("timestamp")
         + F.make_interval(mins=seq)).alias("ts"),
        F.element_at(
            F.array(*[F.lit(t) for t in cyc]), (seq % len(cyc) + 1).cast("int")
        ).alias("event_type"),
    )


def main():
    spark = get_spark("smoke-graph-funnel", master=f"local[{CPUS}]",
                      shuffle_partitions=int(CPUS))
    out = {"n_edges": N_EDGES, "n_events": N_EVENTS, "cpus": int(CPUS)}

    triples = build_triples(spark).localCheckpoint()  # exclude synth cost
    t0 = time.time()
    hood = nhop_neighborhood(triples, hops=3, seed="e0")  # hub 0: worst seed
    rows = hood.groupBy("hop").count().orderBy("hop").collect()
    out["nhop_sec"] = round(time.time() - t0, 2)
    out["nhop_per_hop"] = {int(r["hop"]): r["count"] for r in rows}
    out["nhop_nodes"] = int(sum(r["count"] for r in rows))

    events = build_events(spark).localCheckpoint()
    t0 = time.time()
    frows = funnel(events, steps=STEPS).collect()
    out["funnel_sec"] = round(time.time() - t0, 2)
    out["funnel_users"] = {r["step"]: r["users"] for r in frows}
    out["funnel_events_per_sec"] = int(N_EVENTS / out["funnel_sec"])
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
