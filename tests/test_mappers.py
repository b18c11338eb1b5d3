"""Mapper-quirk tests (SURVEY.md §7.3 bug-compatibility list) against the
pure-Python core, one per observable quirk that changes the triple set."""

from list_extractor_spark.core.extractors import DBO, RDF_TYPE, XSD_GYEAR, XSD_STRING
from list_extractor_spark.core.links import Linker
from list_extractor_spark.core.mappers import (
    GraphSet,
    MapContext,
    extract_document,
    map_band_members,
    map_bibliography,
    map_honors,
    map_staff,
    select_mapping,
)

DBR = "http://dbpedia.org/resource/"
RES = DBR + "Page_X"


def _ctx():
    return MapContext("en", Linker())


def test_band_members_nested_crashes_like_reference():
    g = GraphSet()
    try:
        map_band_members(["a – guitar", ["nested"], "b – bass"], "Members", RES, "en", g, 0, _ctx())
        raised = False
    except NameError:
        raised = True
    assert raised  # reference mapper.py:930 calls undefined map_members
    # triples emitted before the nested element survive; the rest is lost
    subs = {s for (s, p, o, dt) in g.triples()}
    assert DBR + "a" in subs and DBR + "b" not in subs


def test_dispatch_swallows_band_member_crash():
    spans = [
        ("section:0", "Band members", "", 0),
        ("list_item:1", "Alpha One – guitar", "", 1),
        ("list_item:2", "nested member", "", 2),
        ("list_item:1", "Beta Two – bass", "", 3),
    ]
    triples, _ = extract_document("Page_X", "Group", "en", spans)
    subs = {s for (s, p, o, dt) in triples}
    assert DBR + "Alpha_One" in subs
    assert DBR + "Beta_Two" not in subs  # lost after the crash, like the reference


def test_staff_anti_join_and_zero_count():
    g = GraphSet()
    g.add((DBR + "Jane", DBO + "alumni", RES, None))
    n = map_staff(["Jane", "Bob"], "Staff", RES, "en", g, 0, _ctx())
    assert n == 0  # reference never increments elems in map_staff
    assert not g.has(DBR + "Jane", DBO + "staff", RES)
    assert g.has(DBR + "Bob", DBO + "staff", RES)


def test_honors_sticky_status():
    g = GraphSet()
    map_honors(
        ["Nominated for Big Prize", "Small Medal"],  # 2nd elem inherits Nominated
        "Recognition",
        RES,
        "en",
        g,
        0,
        _ctx(),
    )
    statuses = {(s, o) for (s, p, o, dt) in g.triples() if p == DBO + "awardStatus"}
    assert all(o == DBO + "Nominated" for _, o in statuses) and len(statuses) == 2


def test_honors_default_winner():
    g = GraphSet()
    map_honors(["Golden Quill"], "Recognition", RES, "en", g, 0, _ctx())
    assert (DBR + "Golden_Quill", DBO + "awardStatus", DBO + "Winner", None) in g.triples()


def test_bibliography_genre_and_isbn_and_year():
    g = GraphSet()
    map_bibliography(
        ["''Neuromancer'' (1984) ISBN 0-553-08853-X"], "Novels", RES, "en", g, 0, _ctx()
    )
    t = g.triples()
    assert (DBR + "Neuromancer", DBO + "author", RES, None) in t
    assert (DBR + "Neuromancer", DBO + "literaryGenre", DBO + "Novel", None) in t
    assert (DBR + "Neuromancer", DBO + "isbn", "0-553-08853-X", XSD_STRING) in t
    # year_mapper sees the ISBN digits too (reference computes years on the
    # raw element): 1984 plus the 0885 run from the ISBN
    years = {o for (s, p, o, dt) in t if dt == XSD_GYEAR}
    assert "1984" in years and "0885" in years


def test_discography_via_dispatch_rdf_type():
    spans = [
        ("section:0", "Discography", "", 0),
        ("list_item:1", "''Dark Album'' (1991)", "", 1),
    ]
    triples, _ = extract_document("Band_Y", "Band", "en", spans)
    assert (DBR + "Dark_Album", RDF_TYPE, DBO + "Album", None) in triples
    assert (DBR + "Dark_Album", DBO + "musicalArtist", DBR + "Band_Y", None) in triples
    assert (DBR + "Dark_Album", DBO + "releaseYear", "1991", XSD_GYEAR) in triples


def test_custom_mapper_default_keyerror_skips_section():
    # CUSTOM_BIBLIOGRAPHY_MAPPER has no "default" ontology key: a section whose
    # name matches no ontology key raises KeyError (reference mapper.py:188-196),
    # swallowed by the dispatcher -> zero triples from that section
    spans = [
        ("section:0", "Bibliography", "", 0),
        ("list_item:1", "''Lost Book'' (1977)", "", 1),
    ]
    triples, _ = extract_document("Writer_Z", "CUSTOM_WRITER", "en", spans)
    assert triples == set()


def test_custom_mapper_ontology_match():
    spans = [
        ("section:0", "Bibliography", "", 0),
        ("section:1", "Novel series", "", 1),
        ("list_item:1", "''Found Book'' (1977)", "", 2),
    ]
    triples, _ = extract_document("Writer_Z", "CUSTOM_WRITER", "en", spans)
    assert (DBR + "Found_Book", DBO + "Novel", DBR + "Writer_Z", None) in triples


def test_music_genre_default_fallback():
    spans = [
        ("section:0", "Artists", "", 0),
        ("list_item:1", "Cool Artist", "", 1),
    ]
    triples, _ = extract_document("Genre_Q", "MusicGenre", "en", spans)
    assert (DBR + "Cool_Artist", DBO + "notableArtist", DBR + "Genre_Q", None) in triples


def test_unmapped_class_returns_nothing():
    g = GraphSet()
    n = select_mapping({"Works": ["''A''"]}, "X", "en", "Asteroid", g, _ctx())
    assert n == 0 and len(g) == 0


def test_linking_hit_and_sameas():
    lk = Linker(
        {("en", "{{Hugo Award}}"): "http://www.wikidata.org/entity/Q42"},
        {"http://www.wikidata.org/entity/Q42": DBR + "Hugo_Award"},
    )
    spans = [
        ("section:0", "Awards", "", 0),
        ("list_item:1", "received the {{Hugo Award}} gala", "", 1),
    ]
    triples, _ = extract_document("Person_L", "Athlete", "en", spans, lk)
    assert (DBR + "Hugo_Award", DBO + "awardedTo", DBR + "Person_L", None) in triples


def test_linking_hit_no_sameas_keeps_wikidata():
    lk = Linker({("en", "{{Obscure Prize}}"): "http://www.wikidata.org/entity/Q77"}, {})
    spans = [
        ("section:0", "Awards", "", 0),
        ("list_item:1", "the {{Obscure Prize}} event", "", 1),
    ]
    triples, _ = extract_document("Person_L", "Athlete", "en", spans, lk)
    subs = {s for (s, p, o, dt) in triples}
    assert "http://www.wikidata.org/entity/Q77" in subs


def test_non_en_namespace():
    spans = [
        ("section:0", "Opere", "", 0),
        ("list_item:1", "''Il Libro'' (1964)", "", 1),
    ]
    triples, _ = extract_document("Scrittore_A", "Writer", "it", spans)
    it = "http://it.dbpedia.org/resource/"
    assert (it + "Il_Libro", DBO + "author", it + "Scrittore_A", None) in triples
