"""Turtle writer parity: date-literal normalization must match the rdflib
output visible in the reference's golden .ttl files."""

from list_extractor_spark.core.extractors import DBO, XSD_GYEAR, XSD_GYEARMONTH
from list_extractor_spark.engine.sinks import to_turtle

DBR = "http://dbpedia.org/resource/"


def test_gyear_normalized_like_golden():
    # golden: dbr:Neuromancer dbo:activeYear "1984-01-01"^^xsd:gYear
    # (reference extracted/ListExtractor_William_Gibson_en_2017_07_12.ttl)
    ttl = to_turtle([(DBR + "Neuromancer", DBO + "activeYear", "1984", XSD_GYEAR)])
    assert 'dbr:Neuromancer\n    dbo:activeYear "1984-01-01"^^xsd:gYear .' in ttl


def test_gyearmonth_normalized_like_golden():
    # golden: "1991-11-01"^^xsd:gYearMonth (Skinner's Room, William_Gibson ttl)
    ttl = to_turtle([(DBR + "Skinner", DBO + "activeYear", "1991-11", XSD_GYEARMONTH)])
    assert '"1991-11-01"^^xsd:gYearMonth' in ttl


def test_percent_encoded_iri_kept_verbatim():
    ttl = to_turtle(
        [(DBR + "Agrippa_%28A_Book_of_the_Dead%29", DBO + "author", DBR + "X", None)]
    )
    assert "<http://dbpedia.org/resource/Agrippa_%28A_Book_of_the_Dead%29>" in ttl
    assert "dbo:author dbr:X ." in ttl


def test_subject_grouping_and_prefixes():
    rows = [
        (DBR + "A", DBO + "author", DBR + "B", None),
        (DBR + "A", DBO + "activeYear", "2001", XSD_GYEAR),
    ]
    ttl = to_turtle(rows)
    assert ttl.count("dbr:A") == 1  # grouped under one subject block
    assert "@prefix dbo:" in ttl and "@prefix xsd:" in ttl


def test_write_graph_emits_per_partition_lineage(spark, tmp_path):
    """The <path>_lineage table must carry one row per committed table
    partition, and its counts must reconcile exactly with the data."""
    from list_extractor_spark.engine.sinks import write_graph

    rows = [(f"s{i}", f"http://dbpedia.org/ontology/p{i % 5}", f"o{i}", None)
            for i in range(200)]
    triples = spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_dt string"
    )
    path = str(tmp_path / "graph")
    write_graph(triples, path)
    data = spark.read.parquet(path)
    lineage = spark.read.parquet(path + "_lineage")
    got = {r["pred_bucket"]: r for r in lineage.collect()}
    want = {r["pred_bucket"]: r["n"] for r in
            data.groupBy("pred_bucket").agg(__import__("pyspark").sql.functions.count("*").alias("n")).collect()}
    assert {b: r["n_rows"] for b, r in got.items()} == want
    assert sum(r["n_rows"] for r in got.values()) == 200
    assert all(r["n_subjects"] >= 1 and r["n_predicates"] >= 1 for r in got.values())


def test_write_graph_empty_input_succeeds(spark, tmp_path):
    """Zero triples must still commit an empty graph + empty lineage (a
    schema-less re-read of a rows-less partitioned write would crash)."""
    from list_extractor_spark.engine.sinks import write_graph

    empty = spark.createDataFrame(
        [], "subj string, pred string, obj string, obj_dt string"
    )
    path = str(tmp_path / "empty_graph")
    write_graph(empty, path)
    assert spark.read.parquet(path + "_lineage").count() == 0


def test_reference_compat_cli(spark, tmp_path):
    """scripts/list_extractor.py mirrors the reference CLI contract
    (collect_mode/source/language, dated Turtle naming)."""
    import glob
    import subprocess
    import sys

    from list_extractor_spark.engine.schemas import DOCUMENTS_SCHEMA
    from list_extractor_spark.fixtures import corpus_to_rows, make_corpus

    docs_dir = str(tmp_path / "docs")
    spark.createDataFrame(
        corpus_to_rows(make_corpus(8, hub_every=0)), schema=DOCUMENTS_SCHEMA
    ).write.parquet(docs_dir)
    out_dir = str(tmp_path / "extracted")
    res = subprocess.run(
        [sys.executable, "scripts/list_extractor.py", "a", "Writer", "en",
         "--input", docs_dir, "--out-dir", out_dir],
        capture_output=True, text=True, timeout=240,
        cwd="/root/repo",
    )
    assert res.returncode == 0, res.stderr[-800:]
    (ttl,) = glob.glob(out_dir + "/ListExtractor_Writer_en_*.ttl")
    text = open(ttl).read()
    assert "@prefix dbo:" in text and "dbo:author" in text


def test_compat_cli_class_mode_bounds_turtle_collect(spark, tmp_path):
    """Class mode's safety rail: the partitioned graph table is always
    written; past the ttl budget the driver-side Turtle collect is REFUSED
    with a pointer at --force-ttl, and --force-ttl restores it."""
    import glob
    import subprocess
    import sys

    from list_extractor_spark.engine.schemas import DOCUMENTS_SCHEMA
    from list_extractor_spark.fixtures import corpus_to_rows, make_corpus

    docs_dir = str(tmp_path / "docs")
    spark.createDataFrame(
        corpus_to_rows(make_corpus(8, hub_every=0)), schema=DOCUMENTS_SCHEMA
    ).write.parquet(docs_dir)

    def run(out, *extra):
        return subprocess.run(
            [sys.executable, "scripts/list_extractor.py", "a", "Writer", "en",
             "--input", docs_dir, "--out-dir", out, "--ttl-budget", "1", *extra],
            capture_output=True, text=True, timeout=240, cwd="/root/repo",
        )

    out_a = str(tmp_path / "refused")
    res = run(out_a)
    assert res.returncode == 0, res.stderr[-800:]
    assert "refusing to serialize" in res.stdout and "--force-ttl" in res.stdout
    (graph_dir,) = glob.glob(out_a + "/graph_Writer_en_*[!e]")  # not _lineage
    assert spark.read.parquet(graph_dir).count() > 1
    assert glob.glob(graph_dir + "_lineage/*.parquet") or glob.glob(
        graph_dir + "_lineage/*/*.parquet"
    )
    assert not glob.glob(out_a + "/*.ttl")

    out_b = str(tmp_path / "forced")
    res = run(out_b, "--force-ttl")
    assert res.returncode == 0, res.stderr[-800:]
    (ttl,) = glob.glob(out_b + "/ListExtractor_Writer_en_*.ttl")
    assert "dbo:author" in open(ttl).read()
