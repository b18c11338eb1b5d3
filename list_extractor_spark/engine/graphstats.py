"""Graph analytics over the materialized triple table: degree statistics,
PageRank, and connected components.  The reference stops at emitting .ttl files (rdf_builder.py); a
KG-construction engine at dump scale also needs the standard post-materialize
quality surface — hub detection, connectivity profile, entity importance —
computed on the SAME DataFrame the sink writes, without exporting to a
separate graph system.

Graph model: the entity graph is the subset of triples whose object is a
resource (obj_dt IS NULL in our schema — typed literals carry their XSD
datatype IRI); subjects with only literal triples are not graph nodes.
Parallel edges (two predicates between the same pair) count per occurrence,
matching GraphX's multigraph semantics.

Scale shape:
  * degree_stats is two partial-aggregated groupBys (out side keyed on subj
    over ALL triples, in side keyed on obj over entity edges) merged with one
    outer join — no collect, no windows; hub skew is irrelevant because the
    aggregation value is a count, combined map-side.
  * pagerank is the join-agg iteration (contributions = rank/out_deg shuffled
    on dst, summed with map-side combine), GraphX staticPageRank convention:
    initial rank 1.0, update (1-d) + d * sum(contribs), NO dangling-mass
    redistribution (keeps every iteration a pure join+agg with zero driver
    actions).  Edges are localCheckpoint'd once so the upstream extract plan
    is not re-run per iteration, and ranks re-checkpoint every
    ``checkpoint_every`` rounds to bound lineage depth — the same discipline
    as the distributed CC loop (tda/dedup.near_dup_resolve).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def entity_edges(triples: DataFrame) -> DataFrame:
    """(src, dst) multigraph edges: triples whose object is a resource."""
    return triples.filter(F.col("obj_dt").isNull()).select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )


def degree_stats(triples: DataFrame) -> DataFrame:
    """Per-entity degree profile over the triple table.

    Output: (entity, out_degree, in_degree, n_pred_out) where out_degree
    counts ALL triples with the entity as subject (literal statements
    included — it is the statement fan-out the Turtle sink writes),
    in_degree counts entity edges pointing at it, and n_pred_out the
    distinct predicates it uses as subject.  Entities = distinct subjects
    UNION entity-valued objects; absent sides coalesce to 0."""
    out_side = triples.groupBy(F.col("subj").alias("entity")).agg(
        F.count("*").alias("out_degree"),
        F.count_distinct("pred").alias("n_pred_out"),
    )
    in_side = (
        entity_edges(triples)
        .groupBy(F.col("dst").alias("entity"))
        .agg(F.count("*").alias("in_degree"))
    )
    return (
        out_side.join(in_side, "entity", "full_outer")
        .select(
            "entity",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
            F.coalesce("n_pred_out", F.lit(0)).alias("n_pred_out"),
        )
    )


def pagerank(
    triples: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    checkpoint_every: int = 4,
    round_to: int = 6,
) -> DataFrame:
    """Fixed-iteration PageRank over the entity graph (GraphX staticPageRank
    convention: init 1.0, rank' = (1-d) + d * sum(in-contribs), parallel
    edges contribute per occurrence, no dangling redistribution).

    Output: (entity, pagerank).  The operator is *quantized PageRank* — a
    fully deterministic algorithm, not a float approximation of one.  Two
    measures kill run-to-run (and engine-vs-replica) nondeterminism:

      1. contributions are cast to DECIMAL(28,15) before the shuffle sum, so
         the aggregation is EXACT and summation order is immaterial (a plain
         double sum adds in shuffle order; these rational rank values
         cluster on terminating decimals, and a boundary value — 0.7545625
         on the fixture graph — flipped its 6th digit between local[8] and
         local[32] partitionings);
      2. ranks are re-rounded to ``round_to`` decimals after every
         iteration, so state entering each round is the same exact decimal
         everywhere.

    Envelope: DECIMAL(28,15) carries 13 integer digits; per-node sums are
    bounded by the node count, so the exact path holds to ~10^13 nodes
    (overflow under non-ANSI Spark would NULL a rank — same envelope note
    as tda/profile.py's mean).

    Each iteration is one shuffle (contributions keyed on dst) plus a
    broadcast-eligible join of ranks against the static out-degree table;
    nodes without in-edges fall back to (1-d) via outer join + coalesce."""
    if iters < 1:
        raise ValueError("pagerank: iters must be >= 1")
    edges = entity_edges(triples).localCheckpoint(eager=False)
    # nodes and out_deg are re-joined EVERY iteration: checkpoint both so
    # the distinct/agg shuffles run once, not once per iteration
    nodes = (
        edges.select(F.col("src").alias("entity"))
        .union(edges.select(F.col("dst").alias("entity")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    out_deg = (
        edges.groupBy(F.col("src").alias("entity"))
        .agg(F.count("*").alias("out_deg"))
        .localCheckpoint(eager=False)
    )
    base = F.lit(1.0 - damping)
    ranks = nodes.select("entity", F.lit(1.0).alias("rank"))
    for i in range(iters):
        per_src = ranks.join(out_deg, "entity").select(
            F.col("entity").alias("src"),
            (F.col("rank") / F.col("out_deg"))
            .cast("decimal(28,15)")
            .alias("c"),
        )
        contribs = (
            edges.join(per_src, "src")
            .groupBy(F.col("dst").alias("entity"))
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(contribs, "entity", "left").select(
            "entity",
            F.round(
                base
                + F.lit(damping)
                * F.coalesce(F.col("s").cast("double"), F.lit(0.0)),
                round_to,
            ).alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("entity", F.col("rank").alias("pagerank"))


def connected_components(
    triples: DataFrame, driver_threshold: int = 100_000
) -> DataFrame:
    """Connected components of the entity graph (edges treated undirected):
    the third leg of the post-materialize QA trio (degree profile, PageRank,
    connectivity) — how many islands the KG splits into, and how big the
    giant component is, without exporting to a separate graph system.

    Output: (entity, component_id, component_size) for every node of the
    entity graph; component_id = the component's minimum entity IRI, the
    same labeling rule as the canonicalization CC (engine/canonicalize) and
    the dedup resolver (tda/dedup.near_dup_resolve), whose size-adaptive
    machinery this reuses directly: edge lists up to ``driver_threshold``
    rows resolve with the exact pure-Python union-find in one bounded
    collect; past it the distributed min-label-propagation +
    pointer-doubling loop runs (O(log d) rounds, two equi-joins per round,
    localCheckpoint-truncated lineage).

    Scale shape: sizes come from one count aggregation (map-side combined —
    a web-scale giant component is ONE group whose partial counts merge,
    never one task's rows) joined back size-gated; parallel edges and
    self-loops collapse inside the union-find, so multigraph triple tables
    need no pre-distinct."""
    from ..engine.stats import maybe_broadcast
    from ..tda.dedup import near_dup_resolve

    members = near_dup_resolve(
        entity_edges(triples).select(
            F.col("src").alias("doc_a"), F.col("dst").alias("doc_b")
        ),
        driver_threshold=driver_threshold,
    ).select(
        F.col("doc_id").alias("entity"),
        F.col("cluster_id").alias("component_id"),
    )
    sizes = members.groupBy("component_id").agg(
        F.count("*").alias("component_size")
    )
    return members.join(maybe_broadcast(sizes), "component_id").select(
        "entity", "component_id", "component_size"
    )


def hub_entity(edges: DataFrame) -> str:
    """The highest-degree node of an undirected edge list (ties to the
    lexically smallest IRI) — the deterministic default BFS seed.  One tiny
    count-aggregate + TakeOrdered(1); the single-row collect is bounded by
    construction."""
    row = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .groupBy("node")
        .count()
        .orderBy(F.desc("count"), F.asc("node"))
        .limit(1)
        .collect()
    )
    if not row:
        raise ValueError("hub_entity: empty edge list")
    return row[0]["node"]


def nhop_neighborhood(
    triples: DataFrame, hops: int = 3, seed: str | None = None
) -> DataFrame:
    """BFS neighborhood of ``seed`` over the entity graph, edges treated
    undirected: (entity, hop) for every node within ``hops`` of the seed,
    hop = exact BFS distance (seed itself at hop 0).  ``seed=None`` picks
    the graph's hub entity — the subgraph-extraction op a KG serving layer
    runs constantly ("give me everything within 2 hops of X").

    Scale shape: frontier-expansion BFS — per hop, ONE equi-join of the
    (tiny) frontier against the edge table keyed on src, then one anti-join
    against the visited set; the edge table is localCheckpoint'd once in
    undirected form so the upstream extract plan never re-runs, and the
    visited/frontier sets re-checkpoint per round to keep lineage flat
    (the same loop discipline as pagerank / the CC resolver).  A fixed
    ``hops`` bound keeps the round count static — no driver-side
    convergence probe on the hot path."""
    if hops < 0:
        raise ValueError(f"nhop_neighborhood: hops must be >= 0, got {hops}")
    e = entity_edges(triples)
    und = (
        e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    if seed is None:
        seed = hub_entity(und)
    spark = triples.sparkSession
    visited = spark.createDataFrame(
        [(seed, 0)], schema="entity string, hop int"
    ).localCheckpoint(eager=False)
    frontier = visited
    for h in range(1, hops + 1):
        nxt = (
            und.join(
                frontier.select(F.col("entity").alias("src")).distinct(), "src"
            )
            .select(F.col("dst").alias("entity"))
            .distinct()
            .join(visited.select("entity"), "entity", "left_anti")
            .withColumn("hop", F.lit(h))
            .localCheckpoint(eager=False)
        )
        visited = visited.unionAll(nxt).localCheckpoint(eager=False)
        frontier = nxt
    return visited
