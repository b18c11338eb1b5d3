"""Rule-table validation (rulesGenerator parity) and multi-type dispatch."""

import pytest

from list_extractor_spark.core.extractors import DBO
from list_extractor_spark.core.mappers import extract_document
from list_extractor_spark.rules import validate as V

DBR = "http://dbpedia.org/resource/"


def test_vendored_rules_validate():
    V.validate_all()


def test_custom_mapper_validation_rejects_bad_shapes():
    with pytest.raises(V.RuleError):
        V.validate_custom_mapper("X", {"headers": {"en": []}, "extractors": [9],
                                       "ontology": {"en": {"a": "b"}}, "years": "Yes"})
    with pytest.raises(V.RuleError):
        V.validate_custom_mapper("X", {"extractors": [1], "ontology": {"en": {"a": "b"}},
                                       "years": "Yes"})


def test_register_custom_mapper_roundtrip():
    cfg = {
        "headers": {"en": ["inventions"]},
        "extractors": [1, 4],
        "ontology": {"en": {"default": "notableWork", "patent": "patent"}},
        "years": "No",
    }
    V.register_custom_mapper("CUSTOM_INVENTOR_MAPPER", cfg)
    V.register_mapping("Inventor", ["CUSTOM_INVENTOR_MAPPER"])
    try:
        spans = [
            ("section:0", "Inventions", "", 0),
            ("list_item:1", "''Widget Press'' prototype", "", 1),
        ]
        triples, _ = extract_document("Inventor_1", "Inventor", "en", spans)
        assert (DBR + "Widget_Press", DBO + "notableWork", DBR + "Inventor_1", None) in triples
    finally:
        from list_extractor_spark.rules import tables

        tables.CUSTOM_MAPPERS.pop("CUSTOM_INVENTOR_MAPPER", None)
        tables.MAPPING.pop("Inventor", None)


def test_multi_type_shared_domain_dedup():
    spans = [
        ("section:0", "Bibliography", "", 0),
        ("list_item:1", "''Book A'' (1990)", "", 1),
        ("section:0", "Career", "", 2),
        ("list_item:1", "Editor at the Gazette", "", 3),
    ]
    # Writer alone: BIBLIOGRAPHY fires, CAREER is not in Writer's domains
    t_writer, _ = extract_document("D", "Writer", "en", spans)
    preds_w = {p for (_, p, _, _) in t_writer}
    assert DBO + "author" in preds_w and DBO + "Employer" not in preds_w
    # Writer + Person: CAREER now fires via Person; BIBLIOGRAPHY not re-run
    t_both, _ = extract_document("D", ["Person", "Writer"], "en", spans)
    preds_b = {p for (_, p, _, _) in t_both}
    assert DBO + "author" in preds_b and DBO + "Employer" in preds_b
    # order Writer-first must give the same set (shared mapped_domains dedup)
    t_rev, _ = extract_document("D", ["Writer", "Person"], "en", spans)
    assert t_rev == t_both


def test_pipeline_with_page_types(spark):
    from list_extractor_spark.engine.pipeline import run_pipeline
    from list_extractor_spark.engine.schemas import DOCUMENTS_SCHEMA
    from list_extractor_spark.fixtures import (
        corpus_to_rows,
        make_corpus,
        make_page_types,
        make_snapshots,
    )
    from list_extractor_spark.fixtures.oracle import oracle_triples

    corpus = make_corpus(24, hub_every=0)
    snaps = dict(make_snapshots())
    snaps["page_types"] = make_page_types(corpus)
    df = spark.createDataFrame(corpus_to_rows(corpus), schema=DOCUMENTS_SCHEMA)
    got = {
        (r["subj"], r["pred"], r["obj"], r["obj_dt"])
        for r in run_pipeline(spark, df, snaps, use_page_types=True).collect()
    }
    want = oracle_triples(corpus, snaps, page_types=snaps["page_types"])
    assert got == want
    # the Person-only Career section must have produced triples
    assert any(p == "http://dbpedia.org/ontology/Employer" for (_, p, _, _) in got)
