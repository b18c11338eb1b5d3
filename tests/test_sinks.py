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
