"""Per-language (de/it/es) parity fixtures: the localized rule tables
(EXCLUDED_SECTIONS, per-lang SECTION_DICTS keywords, TRANSLATIONS) are pinned
by HAND-WRITTEN expected outputs, not just vendored from the reference
(mapping_rules.py:67-72, :265-270; mapper.py:1448-1495).

The expected triples below are frozen constants, hand-checked against the
reference's behavior chains: localized section keywords dispatch the mapper,
localized excluded titles are dropped by exact match, the page namespace is
http://<lang>.dbpedia.org/resource/, and es BIBLIOGRAPHY's empty-string
keyword matches every surviving section (vendored-rule quirk kept).
"""

import pytest

from list_extractor_spark.core.links import Linker
from list_extractor_spark.core.mappers import extract_document

DBO = "http://dbpedia.org/ontology/"
GYEAR = "http://www.w3.org/2001/XMLSchema#gYear"


def _dbr(lang):
    return f"http://{lang}.dbpedia.org/resource/"


# (doc_id, res_class, spans, expected frozen triples)
PAGES = {
    "de": (
        "Franz_Kafka_Test",
        "Writer",
        [
            ("section:0", "Werke", "", 0),
            ("list_item:1", "''Der Prozess'' (1925)", "", 1),
            ("list_item:1", "''Das Schloss'' (1926)", "", 2),
            # EXCLUDED_SECTIONS["de"]: dropped before mapping
            ("section:0", "Einzelnachweise", "", 3),
            ("list_item:1", "''Soll nicht erscheinen'' (1999)", "", 4),
        ],
        {
            (_dbr("de") + "Der_Prozess", DBO + "author",
             _dbr("de") + "Franz_Kafka_Test", None),
            (_dbr("de") + "Der_Prozess", DBO + "activeYear", "1925", GYEAR),
            (_dbr("de") + "Das_Schloss", DBO + "author",
             _dbr("de") + "Franz_Kafka_Test", None),
            (_dbr("de") + "Das_Schloss", DBO + "activeYear", "1926", GYEAR),
        },
    ),
    "it": (
        "Italo_Calvino_Test",
        "Writer",
        [
            ("section:0", "Opere", "", 0),
            ("list_item:1", "''Il barone rampante'' (1957)", "", 1),
            ("section:0", "Collegamenti esterni", "", 2),  # excluded (it)
            ("list_item:1", "''Niente da vedere'' (2000)", "", 3),
        ],
        {
            (_dbr("it") + "Il_barone_rampante", DBO + "author",
             _dbr("it") + "Italo_Calvino_Test", None),
            (_dbr("it") + "Il_barone_rampante", DBO + "activeYear", "1957", GYEAR),
        },
    ),
    "es": (
        "Gabriel_Garcia_Test",
        "Writer",
        [
            ("section:0", "Obras", "", 0),
            ("list_item:1", "''Cien años de soledad'' (1967)", "", 1),
            ("section:0", "Referencias", "", 2),  # excluded (es), exact match
            ("list_item:1", "''No debe aparecer'' (1999)", "", 3),
            # NOT excluded: exclusion is exact-match on the full title...
            ("section:0", "Referencias - Notas", "", 4),
            # ...and es BIBLIOGRAPHY carries an empty-string keyword that
            # matches every section (vendored reference quirk)
            ("list_item:1", "''Quirk superviviente'' (1980)", "", 5),
        ],
        {
            # multi-byte char percent-encoded in the minted IRI
            (_dbr("es") + "Cien_a%C3%B1os_de_soledad", DBO + "author",
             _dbr("es") + "Gabriel_Garcia_Test", None),
            (_dbr("es") + "Cien_a%C3%B1os_de_soledad", DBO + "activeYear",
             "1967", GYEAR),
            (_dbr("es") + "Quirk_superviviente", DBO + "author",
             _dbr("es") + "Gabriel_Garcia_Test", None),
            (_dbr("es") + "Quirk_superviviente", DBO + "activeYear", "1980", GYEAR),
        },
    ),
}


@pytest.mark.parametrize("lang", sorted(PAGES))
def test_localized_page_core(lang):
    doc_id, res_class, spans, want = PAGES[lang]
    triples, _ = extract_document(doc_id, res_class, lang, spans, Linker())
    assert triples == want


def test_localized_pages_through_spark_pipeline(spark):
    """The same frozen expectations through the distributed pipeline (extract
    UDF + link join; no canonical edges for these pages)."""
    from list_extractor_spark.engine.pipeline import run_pipeline

    rows = [
        (doc_id, lang, res_class,
         [{"kind": k, "text": t, "media_ref": m, "offset": o} for k, t, m, o in spans])
        for lang, (doc_id, res_class, spans, _w) in sorted(PAGES.items())
    ]
    docs = spark.createDataFrame(
        rows,
        schema="doc_id string, lang string, res_class string, "
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    snaps = {"mention_index": [], "sameas": [], "redirects": []}
    got = {
        (r["subj"], r["pred"], r["obj"], r["obj_dt"])
        for r in run_pipeline(spark, docs, snaps).collect()
    }
    want = set().union(*(w for (_d, _c, _s, w) in PAGES.values()))
    assert got == want


def test_sentence_splitter_translations():
    """TRANSLATIONS (reference mapping_rules.py:265-270) is sparse by design:
    'for' exists for en+it, 'from' for en only; a missing entry raises
    KeyError (swallowed by the dispatcher, reference mapper.py:126-127)."""
    from list_extractor_spark.core.extractors import sentence_splitter

    linker = Linker()
    assert (
        sentence_splitter("Hugo Award for Best Novel", "for", "en", linker)
        == "Best_Novel"
    )
    assert (
        sentence_splitter("Premio Strega per La strada", "for", "it", linker)
        == "La_strada"
    )
    assert sentence_splitter("no split marker here", "for", "en", linker) is None
    with pytest.raises(KeyError):
        sentence_splitter("Premio da Qualcuno", "from", "it", linker)
    with pytest.raises(KeyError):
        sentence_splitter("Preis für Etwas", "for", "de", linker)
    with pytest.raises(KeyError):
        sentence_splitter("Premio para Algo", "for", "es", linker)


@pytest.mark.parametrize(
    "lang,excluded,kept",
    [
        ("de", "Einzelnachweise", "Werke"),
        ("it", "Collegamenti esterni", "Opere"),
        ("es", "Referencias", "Obras"),
        ("en", "External links", "Works"),
    ],
)
def test_clean_dictionary_excluded_sections(lang, excluded, kept):
    from list_extractor_spark.core.parser import clean_dictionary

    d = {excluded: ["x"], kept: ["y"], f"{excluded} - Notas": ["z"]}
    out = clean_dictionary(lang, d)
    assert excluded not in out
    assert kept in out
    # exclusion is exact-match on the full concatenated title
    assert f"{excluded} - Notas" in out
