"""End-to-end parity gate: Spark pipeline triple set == pure-Python oracle
(BASELINE.md §2: P/R >= 0.95; the engine targets exact agreement), plus the
per-row parse invariant, parallelism invariance, canonicalization agreement
and kill-and-resume reproducibility."""

import shutil

import pytest

from list_extractor_spark.core.parser import parse_spans
from list_extractor_spark.engine.extract import parse_items
from list_extractor_spark.engine.pipeline import Pipeline, run_pipeline, snapshots_to_dfs
from list_extractor_spark.engine.schemas import DOCUMENTS_SCHEMA
from list_extractor_spark.fixtures import corpus_to_rows, make_corpus, make_snapshots
from list_extractor_spark.fixtures.oracle import oracle_triples

N_DOCS = 36


@pytest.fixture(scope="module")
def corpus():
    return make_corpus(N_DOCS, hub_every=24, hub_items=60)


@pytest.fixture(scope="module")
def snapshots():
    return make_snapshots()


@pytest.fixture(scope="module")
def documents_df(spark, corpus):
    return spark.createDataFrame(corpus_to_rows(corpus), schema=DOCUMENTS_SCHEMA)


def _collect_triples(df):
    return {(r["subj"], r["pred"], r["obj"], r["obj_dt"]) for r in df.collect()}


def _pr(got, want):
    tp = len(got & want)
    precision = tp / len(got) if got else 1.0
    recall = tp / len(want) if want else 1.0
    return precision, recall


def test_pipeline_matches_oracle_exactly(spark, corpus, snapshots, documents_df):
    got = _collect_triples(run_pipeline(spark, documents_df, snapshots))
    want = oracle_triples(corpus, snapshots)
    precision, recall = _pr(got, want)
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)
    # engine target is exact agreement — show diffs on failure
    assert got == want, (
        sorted(got - want)[:5],
        sorted(want - got)[:5],
    )


def test_parse_invariant_per_document(spark, corpus, documents_df):
    """Per-row invariant (BASELINE.json input_hint): the Spark parse stage and
    the reference-faithful parser agree on every item sequence per doc."""
    rows = parse_items(documents_df).collect()
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], []).append(
            (r["section_path"], r["item_idx"], r["depth"], r["item_text"])
        )
    for d in corpus:
        want = []
        for sect, items in parse_spans(d["spans"], d["lang"]).items():
            for idx, it in enumerate(items):
                for t in (it if isinstance(it, list) else [it]):
                    want.append((sect, idx, 2 if isinstance(it, list) else 1, t))
        assert sorted(got.get(d["doc_id"], [])) == sorted(want), d["doc_id"]


def test_parallelism_invariance(spark, corpus, snapshots, documents_df):
    got1 = _collect_triples(run_pipeline(spark, documents_df.repartition(1), snapshots))
    got16 = _collect_triples(run_pipeline(spark, documents_df.repartition(16), snapshots))
    assert got1 == got16


def test_salted_link_join_same_result(spark, corpus, snapshots, documents_df):
    plain = _collect_triples(run_pipeline(spark, documents_df, snapshots, salt=0))
    salted = _collect_triples(run_pipeline(spark, documents_df, snapshots, salt=4))
    assert plain == salted


def test_skew_repartition_same_result(spark, corpus, snapshots, documents_df):
    base = _collect_triples(run_pipeline(spark, documents_df, snapshots))
    skewed = _collect_triples(
        run_pipeline(spark, documents_df, snapshots, skew_repartition=True)
    )
    assert base == skewed


def test_canonicalization_spark_matches_oracle(spark, snapshots):
    from list_extractor_spark.core.canonical import build_edges, canonical_map
    from list_extractor_spark.engine.canonicalize import canonical_map_df, identity_edges

    # add a chain, a 2-cycle, a 3-cycle with a tail entering it, and a
    # self-loop on top of the fixture edges (cycle -> min-IRI semantics)
    snaps = {
        "redirects": snapshots["redirects"]
        + [("A", "B"), ("B", "C"), ("C", "D")]
        + [("Zx", "Zy"), ("Zy", "Zx")]
        + [("Tail1", "Tail2"), ("Tail2", "CycA"),
           ("CycA", "CycC"), ("CycC", "CycB"), ("CycB", "CycA")]
        + [("Self", "Self")],
        "sameas": snapshots["sameas"],
    }
    mention_index, sameas, redirects = snapshots_to_dfs(spark, snaps | {"mention_index": []})
    want = set(canonical_map(build_edges(snaps["redirects"], snaps["sameas"])).items())
    # driver fast path (small edge sets) AND the distributed pointer-doubling
    # loop (forced via driver_threshold=0) must both equal the oracle
    for threshold in (100_000, 0):
        got = {
            (r["uri"], r["canonical"])
            for r in canonical_map_df(
                identity_edges(redirects, sameas), driver_threshold=threshold
            ).collect()
        }
        assert got == want, threshold


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_canonicalization_random_digraphs(spark, seed):
    """Randomized functional digraphs (chains, trees, cycles with tails,
    self-loops all arise) through the DISTRIBUTED pointer-doubling +
    cycle-collapse path must equal the pure union-find oracle."""
    import random

    from list_extractor_spark.core.canonical import canonical_map
    from list_extractor_spark.engine.canonicalize import canonical_map_df

    rng = random.Random(seed)
    nodes = [f"n{i:02d}" for i in range(24)]
    parent = {}
    for n in nodes:
        if rng.random() < 0.8:  # each node gets at most one outgoing edge
            parent[n] = rng.choice(nodes)
    edges = spark.createDataFrame(
        sorted(parent.items()), schema="uri string, parent string"
    )
    got = {
        (r["uri"], r["canonical"])
        for r in canonical_map_df(edges, driver_threshold=0).collect()
    }
    want = set(canonical_map(parent).items())
    assert got == want, (seed, sorted(got ^ want)[:6])


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_canonicalization_random_multigraphs(spark, seed):
    """Randomized digraphs WITH duplicate-source edges: the engine dedupes
    min-parent, so the oracle is canonical_map over the min-parent dict —
    both the driver fast path and the distributed path must match it."""
    import random

    from list_extractor_spark.core.canonical import canonical_map
    from list_extractor_spark.engine.canonicalize import canonical_map_df

    rng = random.Random(seed)
    nodes = [f"m{i:02d}" for i in range(20)]
    edge_rows = []
    for n in nodes:
        for _ in range(rng.randrange(0, 3)):  # 0-2 outgoing edges per node
            edge_rows.append((n, rng.choice(nodes)))
    if not edge_rows:
        edge_rows = [("m00", "m01")]
    parent: dict = {}
    for u, p in edge_rows:
        if u not in parent or p < parent[u]:
            parent[u] = p
    want = set(canonical_map(parent).items())
    edges = spark.createDataFrame(edge_rows, schema="uri string, parent string")
    for threshold in (100_000, 0):
        got = {
            (r["uri"], r["canonical"])
            for r in canonical_map_df(edges, driver_threshold=threshold).collect()
        }
        assert got == want, (seed, threshold, sorted(got ^ want)[:6])


def test_canonicalization_chains_longer_than_doubling_budget(spark):
    """An acyclic chain (and a cycle with a tail) LONGER than 2^max_iters must
    still resolve to the true sink / cycle-min: non-convergence alone does not
    mean 'pure cycles', so the doubling loop must keep going until the
    surviving pointers form a permutation before min-collapsing."""
    from list_extractor_spark.core.canonical import canonical_map
    from list_extractor_spark.engine.canonicalize import canonical_map_df

    parent = {f"c{i:03d}": f"c{i + 1:03d}" for i in range(40)}  # chain -> c040
    parent.update({f"t{i:02d}": f"t{i + 1:02d}" for i in range(20)})  # tail
    parent["t20"] = "cycB"  # tail enters a 3-cycle
    parent.update({"cycB": "cycC", "cycC": "cycA", "cycA": "cycB"})
    edges = spark.createDataFrame(
        sorted(parent.items()), schema="uri string, parent string"
    )
    # max_iters=2 -> only 4-step advancement per doubling batch; both the
    # 40-chain and the 21-tail rho exceed it
    got = {
        (r["uri"], r["canonical"])
        for r in canonical_map_df(edges, max_iters=2, driver_threshold=0).collect()
    }
    want = set(canonical_map(parent).items())
    assert got == want, sorted(got ^ want)[:6]


def test_canonicalization_duplicate_source_edges_deterministic(spark):
    """A uri with several outgoing edges (dirty redirect dump) resolves via
    the MIN parent on BOTH the driver fast path and the distributed path."""
    from list_extractor_spark.core.canonical import canonical_map
    from list_extractor_spark.engine.canonicalize import canonical_map_df

    rows = [("X", "B"), ("X", "A"), ("A", "S1"), ("B", "S2"), ("Y", "X")]
    edges = spark.createDataFrame(rows, schema="uri string, parent string")
    want = set(canonical_map({"X": "A", "A": "S1", "B": "S2", "Y": "X"}).items())
    for threshold in (100_000, 0):
        got = {
            (r["uri"], r["canonical"])
            for r in canonical_map_df(edges, driver_threshold=threshold).collect()
        }
        assert got == want, (threshold, sorted(got ^ want))


def test_resume_reproduces_identical_triples(spark, corpus, snapshots, documents_df, tmp_path):
    run_dir = str(tmp_path / "run")
    first = _collect_triples(
        run_pipeline(spark, documents_df, snapshots, run_dir=run_dir)
    )
    # simulate a kill after the extract stage committed: later stages vanish
    shutil.rmtree(f"{run_dir}/linked", ignore_errors=True)
    shutil.rmtree(f"{run_dir}/triples", ignore_errors=True)
    # resume with EMPTY documents: only the candidates checkpoint can supply
    # data, proving the resume path actually reuses the committed stage
    empty_docs = spark.createDataFrame([], schema=DOCUMENTS_SCHEMA)
    mention_index, sameas, redirects = snapshots_to_dfs(spark, snapshots)
    pipe = Pipeline(spark, run_dir=run_dir)
    resumed = _collect_triples(
        pipe.run(empty_docs, mention_index, sameas, redirects, linkable_keys=set())
    )
    assert resumed == first
    assert any(s["stage"] == "candidates" and s["reused"] for s in pipe.lineage)


def test_arrow_extract_matches_pandas_extract(spark, documents_df, snapshots):
    from list_extractor_spark.engine.extract import (
        extract_candidates,
        extract_candidates_arrow,
    )

    keys = {(lang, s) for (lang, s, w, r) in snapshots["mention_index"]}
    cols = ["doc_id", "subj", "pred", "obj", "obj_dt", "link_lang", "link_surface"]
    a = sorted(tuple(r) for r in extract_candidates(documents_df, linkable_keys=keys)
               .select(cols).collect())
    b = sorted(tuple(r) for r in extract_candidates_arrow(documents_df, linkable_keys=keys)
               .select(cols).collect())
    assert a == b


def test_build_edges_duplicate_sources_min_wins():
    """core/build_edges must resolve duplicate-source identity edges (e.g. a
    sameAs snapshot with one wikidata entity per language) to the MIN parent
    — the same rule the Spark engine applies, so oracle and engine agree."""
    from list_extractor_spark.core.canonical import build_edges

    parent = build_edges(
        redirects=[("X", "B"), ("X", "A")],
        sameas=[("wd:Q1", "dbr:Zebra"), ("wd:Q1", "dbr:Aardvark")],
    )
    dbr = "http://dbpedia.org/resource/"
    assert parent[dbr + "X"] == dbr + "A"
    assert parent["wd:Q1"] == "dbr:Aardvark"
