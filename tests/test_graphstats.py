"""Graph analytics over the triple table (engine/graphstats): hand-computed
degree and PageRank values on tiny graphs; GraphX staticPageRank conventions
(init 1.0, (1-d) + d*sum update, parallel edges per occurrence)."""

import pytest

from list_extractor_spark.engine.graphstats import degree_stats, pagerank

GYEAR = "http://www.w3.org/2001/XMLSchema#gYear"
SCHEMA = "subj string, pred string, obj string, obj_dt string"


@pytest.fixture(scope="module")
def triples(spark):
    return spark.createDataFrame(
        [
            ("A", "p1", "B", None),
            ("A", "p1", "C", None),
            ("A", "p2", "1999", GYEAR),
            ("B", "p1", "C", None),
            ("D", "p3", "x", GYEAR),
        ],
        SCHEMA,
    )


def test_degree_stats_hand_values(spark, triples):
    rows = {r["entity"]: r for r in degree_stats(triples).collect()}
    # out over ALL triples (literals included), in over entity edges only
    assert (rows["A"]["out_degree"], rows["A"]["in_degree"], rows["A"]["n_pred_out"]) == (3, 0, 2)
    assert (rows["B"]["out_degree"], rows["B"]["in_degree"], rows["B"]["n_pred_out"]) == (1, 1, 1)
    assert (rows["C"]["out_degree"], rows["C"]["in_degree"], rows["C"]["n_pred_out"]) == (0, 2, 0)
    # literal-only subject still profiled; literal objects are not entities
    assert (rows["D"]["out_degree"], rows["D"]["in_degree"]) == (1, 0)
    assert "1999" not in rows and "x" not in rows


def test_pagerank_two_iterations_hand_values(spark, triples):
    # entity graph: A->B, A->C, B->C; D has no entity edges -> not a node
    rows = {r["entity"]: r["pagerank"] for r in pagerank(triples, iters=2).collect()}
    assert set(rows) == {"A", "B", "C"}
    # iter1: A=0.15, B=0.575, C=1.425
    # iter2: A=0.15, B=0.15+0.85*0.075=0.21375, C=0.15+0.85*(0.075+0.575)=0.7025
    assert rows["A"] == 0.15
    assert rows["B"] == 0.21375
    assert rows["C"] == 0.7025


def test_pagerank_parallel_edges_count_per_occurrence(spark):
    t = spark.createDataFrame(
        [("A", "p1", "B", None), ("A", "p2", "B", None)], SCHEMA
    )
    rows = {r["entity"]: r["pagerank"] for r in pagerank(t, iters=1).collect()}
    # out_deg(A)=2, both edges land on B: B = 0.15 + 0.85*(0.5+0.5) = 1.0
    assert rows["A"] == 0.15 and rows["B"] == 1.0


def test_pagerank_matches_python_replica_on_fixture_graph(spark):
    from list_extractor_spark.fixtures.contract_oracle import (
        _fixture_docs,
        kg_pagerank_rows,
    )
    from list_extractor_spark.fixtures import corpus_to_rows, make_snapshots
    from list_extractor_spark.engine.pipeline import run_pipeline
    from list_extractor_spark.engine.schemas import DOCUMENTS_SCHEMA

    docs = spark.createDataFrame(
        corpus_to_rows(_fixture_docs()), DOCUMENTS_SCHEMA
    )
    got = sorted(
        (r["entity"], r["pagerank"])
        for r in pagerank(run_pipeline(spark, docs, make_snapshots()), iters=5).collect()
    )
    assert got == sorted(kg_pagerank_rows())


def test_pagerank_rejects_zero_iters(spark, triples):
    with pytest.raises(ValueError):
        pagerank(triples, iters=0)


def test_decimal15_cast_replica_matches_jvm(spark):
    """Pin the replica's double->DECIMAL(28,15) quantization against Spark's
    actual cast on midpoint-adversarial values: Spark goes through the
    SHORTEST DECIMAL REPR (BigDecimal.valueOf / Double.toString), so
    Decimal(repr(x)) is correct and Decimal(x) (exact binary) is NOT —
    0.150001/1024 = ...4853515625e-4 rounds UP via repr but DOWN via the
    exact binary value, which sits just below the 15-dp midpoint."""
    from decimal import Decimal

    from list_extractor_spark.fixtures.contract_oracle import _dec15
    from pyspark.sql import functions as F

    cases = [
        float(r) / od
        for r in ("0.150001", "0.754563", "0.21375", "0.999999", "0.000001")
        for od in (3, 7, 512, 1024, 2048, 4096, 850000)
    ]
    df = spark.createDataFrame([(x,) for x in cases], "x double").select(
        "x", F.col("x").cast("decimal(28,15)").alias("d")
    )
    for row in df.collect():
        assert Decimal(str(row["d"])) == _dec15(row["x"]), row["x"]
    # and the known midpoint case really is a midpoint that diverges
    x = 0.150001 / 1024
    assert _dec15(x) != Decimal(x).quantize(Decimal("1e-15"))


class TestConnectedComponents:
    def test_hand_values(self, spark, triples):
        from list_extractor_spark.engine.graphstats import connected_components

        rows = {
            r["entity"]: (r["component_id"], r["component_size"])
            for r in connected_components(triples).collect()
        }
        # entity graph: A-B, A-C, B-C one component; literal-only D absent
        assert rows == {"A": ("A", 3), "B": ("A", 3), "C": ("A", 3)}

    def test_two_islands_and_multigraph_collapse(self, spark):
        from list_extractor_spark.engine.graphstats import connected_components

        t = spark.createDataFrame(
            [
                ("A", "p1", "B", None),
                ("A", "p2", "B", None),  # parallel edge
                ("B", "p1", "B", None),  # self loop
                ("X", "p1", "Y", None),
                ("Y", "p1", "Z", None),
            ],
            SCHEMA,
        )
        rows = {
            r["entity"]: (r["component_id"], r["component_size"])
            for r in connected_components(t).collect()
        }
        assert rows == {
            "A": ("A", 2), "B": ("A", 2),
            "X": ("X", 3), "Y": ("X", 3), "Z": ("X", 3),
        }

    def test_distributed_path_matches_fast_path(self, spark):
        """driver_threshold=0 forces the min-label-propagation loop; results
        must equal the union-find fast path on the fixture KG (21
        components, giant of 717)."""
        from list_extractor_spark.engine.graphstats import connected_components
        from list_extractor_spark.engine.pipeline import run_pipeline
        from list_extractor_spark.fixtures.contract_oracle import _fixture_docs
        from list_extractor_spark.engine.schemas import DOCUMENTS_SCHEMA
        from list_extractor_spark.fixtures import corpus_to_rows, make_snapshots

        docs = spark.createDataFrame(
            corpus_to_rows(_fixture_docs()), schema=DOCUMENTS_SCHEMA
        )
        triples = run_pipeline(spark, docs, make_snapshots()).localCheckpoint()
        fast = sorted(map(tuple, connected_components(triples).collect()))
        dist = sorted(
            map(
                tuple,
                connected_components(triples, driver_threshold=0).collect(),
            )
        )
        assert fast == dist
        sizes = {c: s for _, c, s in fast}
        assert max(sizes.values()) == 717 and len(sizes) == 21


# ------------------------------------------------------------- nhop BFS


class TestNhopNeighborhood:
    def test_chain_hand_values(self, spark):
        from list_extractor_spark.engine.graphstats import nhop_neighborhood

        t = spark.createDataFrame(
            [("A", "p", "B", None), ("B", "p", "C", None),
             ("C", "p", "D", None), ("D", "p", "E", None)],
            SCHEMA,
        )
        got = {
            (r["entity"], r["hop"])
            for r in nhop_neighborhood(t, hops=2, seed="A").collect()
        }
        # undirected BFS: E is 4 hops out, excluded at hops=2
        assert got == {("A", 0), ("B", 1), ("C", 2)}

    def test_undirected_and_hub_seed_tiebreak(self, spark):
        from list_extractor_spark.engine.graphstats import (
            hub_entity, nhop_neighborhood,
        )

        # star around Z (degree 3) reached AGAINST edge direction from leaves;
        # B ties nobody — Z is the unique hub
        t = spark.createDataFrame(
            [("A", "p", "Z", None), ("B", "p", "Z", None),
             ("C", "p", "Z", None)],
            SCHEMA,
        )
        got = {
            (r["entity"], r["hop"])
            for r in nhop_neighborhood(t, hops=1).collect()
        }
        assert got == {("Z", 0), ("A", 1), ("B", 1), ("C", 1)}
        # degree tie (A-B edge only): lexically smallest wins
        t2 = spark.createDataFrame([("B", "p", "A", None)], SCHEMA)
        from list_extractor_spark.engine.graphstats import entity_edges

        assert hub_entity(entity_edges(t2)) == "A"

    def test_hops_zero_and_validation(self, spark):
        from list_extractor_spark.engine.graphstats import nhop_neighborhood

        t = spark.createDataFrame([("A", "p", "B", None)], SCHEMA)
        assert [tuple(r) for r in nhop_neighborhood(t, hops=0, seed="A").collect()] == [
            ("A", 0)
        ]
        with pytest.raises(ValueError, match="hops"):
            nhop_neighborhood(t, hops=-1)

    def test_matches_python_bfs_on_fixture_graph(self, spark):
        """Spark frontier BFS == the oracle replica on the full fixture KG
        (parallel edges, cycles, a 717-node giant component)."""
        from list_extractor_spark.fixtures.contract_oracle import kg_nhop_rows

        import __spark_entry__ as entry

        got = sorted(
            (r["entity"], r["hop"])
            for r in entry.queries()["kg_nhop"](spark, None).collect()
        )
        assert got == kg_nhop_rows(hops=3)
