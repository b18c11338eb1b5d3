"""End-to-end parity against the reference's COMMITTED golden output
(/root/reference/extracted/ListExtractor_Metallica_en_2017_08_15.ttl).

This is the one correctness anchor that shares no code with the
implementation: the expected triples are parsed straight from the .ttl the
reference itself published, and the input is a span reconstruction of the
page's list sections.  It validates the mapper vocabulary (rdf:type Album,
musicalArtist, releaseYear, bandMember, awardedTo/awardStatus/AwardedFor),
year literal semantics (gYear lexicals — rdflib serializes Literal("1983",
gYear) as "1983-01-01", inverted here), the URI percent-encoding quirks
(%27 in Kill_'Em_All, %28/%29 in (album), dots kept in Hardwired..., St._),
and the miss-path fallback mint for {{...}} references (members/awards were
wiki-links the 2017 run resolved over HTTP; with no snapshot rows the minted
IRI must equal the published one).

The William Gibson golden is not FULLY triple-compared: its bibliography
shape (dbo:Novel used as predicate) predates the current reference mapper.py
(lines 899-910 emit dbo:author + dbo:literaryGenre), so full agreement is
impossible for any faithful implementation of today's code.  Its
shape-INVARIANT slice — every subject IRI and every dbo:activeYear
gYear/gYearMonth literal — IS compared (test_gibson_subjects_and_years...),
anchoring a second published page.
"""

import re

from list_extractor_spark.core.extractors import (
    RDF_TYPE,
    XSD_GYEAR,
    XSD_GYEARMONTH,
    XSD_STRING,
)
from list_extractor_spark.core.links import NULL_LINKER
from list_extractor_spark.core.mappers import extract_document

GOLDEN_METALLICA = "/root/reference/extracted/ListExtractor_Metallica_en_2017_08_15.ttl"

DBO = "http://dbpedia.org/ontology/"
DBR = "http://dbpedia.org/resource/"
_TOKEN = re.compile(r'<[^>]+>|"[^"]*"\^\^xsd:\w+|\S+')


def _term(tok: str) -> str:
    if tok.startswith("<"):
        return tok[1:-1]
    if tok.startswith("dbo:"):
        return DBO + tok[4:]
    if tok.startswith("dbr:"):
        return DBR + tok[4:]
    if tok.startswith("rdf:"):
        return "http://www.w3.org/1999/02/22-rdf-syntax-ns#" + tok[4:]
    raise ValueError(tok)


def _obj_term(tok: str):
    m = re.fullmatch(r'"([^"]*)"\^\^xsd:(\w+)', tok)
    if m:
        lex, dt = m.groups()
        if dt == "gYear":  # rdflib normalization: "1983" -> "1983-01-01"
            return lex[:4], XSD_GYEAR
        if dt == "gYearMonth":  # "1985-11" -> "1985-11-01"
            return lex[:7], XSD_GYEARMONTH
        if dt == "string":
            return lex, XSD_STRING
        raise NotImplementedError(dt)
    return _term(tok), None


def parse_turtle(path: str):
    """Minimal reader for rdflib-serialized turtle (prefixed names, literal
    objects, ';' predicate lists, ',' object lists).  No rdflib in the
    container, and the golden files use only this subset."""
    toks = []
    for line in open(path, encoding="utf-8"):
        line = line.strip()
        if not line or line.startswith("@prefix"):
            continue
        toks.extend(_TOKEN.findall(line))
    triples = set()
    subj = pred = None
    state = "subj"
    for t in toks:
        if state == "sep" or t in (".", ";", ","):
            if t == ".":
                state = "subj"
            elif t == ";":
                state = "pred"
            elif t == ",":
                state = "obj"
            else:
                raise ValueError(f"expected separator, got {t}")
            continue
        attached_comma = t.endswith(",") and not t.startswith('"')
        if attached_comma:
            t = t[:-1]
        if state == "subj":
            subj = _term(t)
            state = "pred"
        elif state == "pred":
            pred = RDF_TYPE if t == "a" else _term(t)
            state = "obj"
        elif state == "obj":
            o, dt = _obj_term(t)
            triples.add((subj, pred, o, dt))
            state = "obj" if attached_comma else "sep"
    return triples


# -- span reconstruction of the Metallica list sections ----------------------

_ALBUMS = [
    ("Kill 'Em All", 1983), ("Ride the Lightning", 1984), ("Master of Puppets", 1986),
    ("...And Justice for All (album)", 1988), ("Metallica (album)", 1991),
    ("Load (album)", 1996), ("Reload (Metallica album)", 1997), ("St. Anger", 2003),
    ("Death Magnetic", 2008), ("Hardwired... to Self-Destruct", 2016),
]
_MEMBERS = [
    "James Hetfield", "Lars Ulrich", "Kirk Hammett", "Robert Trujillo",
    "Dave Mustaine", "Ron McGovney", "Cliff Burton", "Jason Newsted", "Bob Rock",
]
_AWARDS = [
    ("Grammy Award for Best Hard Rock Performance", 2000, "Whiskey in the Jar"),
    ("Grammy Award for Best Metal Performance", 1990, "One (Metallica song)"),
    ("Grammy Award for Best Metal Performance", 1991, "Metallica (album)"),
    ("Grammy Award for Best Metal Performance", 1992, "Stone Cold Crazy"),
    ("Grammy Award for Best Metal Performance", 1999, "Better than You (Metallica song)"),
    ("Grammy Award for Best Metal Performance", 2004, "St. Anger (song)"),
    ("Grammy Award for Best Metal Performance", 2009, "My Apocalypse"),
    ("Grammy Award for Best Rock Instrumental Performance", 2001, "The Call of Ktulu"),
    ("Grammy Award for Best Recording Package", 2009, "Death Magnetic"),
]


def metallica_spans():
    spans, off = [], 0

    def add(kind, text):
        nonlocal off
        spans.append((kind, text, "", off))
        off += 1

    add("section:0", "Discography")
    add("section:1", "Studio albums")
    for title, year in _ALBUMS:
        add("list_item:1", f"''{title}'' ({year})")
    add("section:0", "Band members")
    for name in _MEMBERS:
        add("list_item:1", f"{{{{{name}}}}} – instrument")
    add("section:0", "Awards")
    for award, year, work in _AWARDS:
        add("list_item:1", f"Nominated {{{{{award}}}}} {year} for {work}")
    return spans


def test_metallica_triples_match_committed_golden():
    got, _stats = extract_document(
        "Metallica", "Band", "en", metallica_spans(), NULL_LINKER
    )
    want = parse_turtle(GOLDEN_METALLICA)
    assert got == want, (sorted(got - want)[:8], sorted(want - got)[:8])


def test_metallica_spark_pipeline_matches_committed_golden(spark):
    from list_extractor_spark.engine.pipeline import run_pipeline
    from list_extractor_spark.engine.schemas import DOCUMENTS_SCHEMA

    docs = spark.createDataFrame(
        [("Metallica", "en", "Band", metallica_spans())], schema=DOCUMENTS_SCHEMA
    )
    snapshots = {"mention_index": [], "sameas": [], "redirects": []}
    got = {
        (r["subj"], r["pred"], r["obj"], r["obj_dt"])
        for r in run_pipeline(spark, docs, snapshots).collect()
    }
    want = parse_turtle(GOLDEN_METALLICA)
    assert got == want, (sorted(got - want)[:8], sorted(want - got)[:8])


def test_turtle_sink_roundtrips_through_golden_parser(tmp_path):
    """Closing the serialization loop: our Turtle sink's output (S6), parsed
    by the same reader that parses the reference's goldens, must reproduce
    the triple set exactly — including the rdflib gYear normalization the
    sink emulates ("1988" -> "1988-01-01") and its inversion."""
    from list_extractor_spark.engine.sinks import to_turtle

    triples, _ = extract_document(
        "Metallica", "Band", "en", metallica_spans(), NULL_LINKER
    )
    p = tmp_path / "out.ttl"
    p.write_text(to_turtle(sorted(triples)), encoding="utf-8")
    assert parse_turtle(str(p)) == triples


# -- William Gibson: shape-invariant slice of the 2017 golden ----------------
# The golden's bibliography TRIPLE SHAPE predates the current reference code
# (genre-as-predicate, see module docstring), but two things are invariant
# across both shapes and still published in the file: the SUBJECT IRIs (all
# encoding quirks) and the dbo:activeYear gYear/gYearMonth literals.  Both are
# asserted here from a span reconstruction.

GOLDEN_GIBSON = "/root/reference/extracted/ListExtractor_William_Gibson_en_2017_07_12.ttl"

_GIBSON_WORKS = [
    ("Neuromancer", "1984"), ("Count Zero", "1986"), ("Mona Lisa Overdrive", "1988"),
    ("Virtual Light", "1993"), ("Idoru", "1996"),
    ("All Tomorrow's Parties (novel)", "1999"), ("Pattern Recognition (novel)", "2003"),
    ("Spook Country", "2007"), ("Zero History", "2010"), ("The Peripheral", "2014"),
    ("The Difference Engine", "1990"), ("Bridge trilogy", None),
    ("Sprawl trilogy", None), ("Hubertus Bigend", None),
    ("Johnny Mnemonic", "1981"), ("Burning Chrome", "1982"),
    ("Burning Chrome (short story collection)", "1986"),
    ("New Rose Hotel", "1981"), ("The Winter Market", "November 1985"),
    ("Skinner's Room", "November 1991"), ("Red Star, Winter Orbit", "1983"),
    ("Dogfight (short story)", "1985"), ("Hinterlands (short story)", "1981"),
    ("Fragments of a Hologram Rose", "1977"), ("The Gernsback Continuum", "1981"),
    ("The Belonging Kind", "1981"), ("Agrippa (A Book of the Dead)", "1992"),
    ("Distrust That Particular Flavor", "2012"), ("Wired (magazine)", "1993"),
]


def gibson_spans():
    spans = [("section:0", "Bibliography", "", 0), ("section:1", "Novels", "", 1)]
    for i, (title, year) in enumerate(_GIBSON_WORKS):
        text = f"''{title}'' ({year})" if year else f"''{title}''"
        spans.append(("list_item:1", text, "", i + 2))
    return spans


def test_gibson_subjects_and_years_match_committed_golden():
    got, _ = extract_document(
        "William_Gibson", "Writer", "en", gibson_spans(), NULL_LINKER
    )
    golden = parse_turtle(GOLDEN_GIBSON)
    got_subjects = {s for (s, _p, _o, _dt) in got}
    golden_subjects = {s for (s, _p, _o, _dt) in golden}
    assert got_subjects == golden_subjects, (
        sorted(got_subjects - golden_subjects)[:5],
        sorted(golden_subjects - got_subjects)[:5],
    )
    year_pred = DBO + "activeYear"
    got_years = {t for t in got if t[1] == year_pred}
    golden_years = {t for t in golden if t[1] == year_pred}
    assert got_years == golden_years, (
        sorted(got_years - golden_years)[:5],
        sorted(golden_years - got_years)[:5],
    )


# -- Taylor Swift: full-file parity (current shape throughout) ---------------

GOLDEN_SWIFT = "/root/reference/extracted/ListExtractor_Taylor_Swift_en_2017_08_04.ttl"

_SWIFT_ALBUMS = [
    ("Taylor Swift (album)", "2006"), ("Fearless (Taylor Swift album)", "2008"),
    ("Speak Now", "2010"), ("Red (Taylor Swift album)", "2012"),
    ("1989 (Taylor Swift album)", "2014"),  # title year + release year -> BOTH
]
_SWIFT_TOURS = [
    ("Fearless Tour", "2009–2010"), ("Speak Now World Tour", "2011–2012"),
    ("The Red Tour", "2013–2014"), ("The 1989 World Tour", "2015"),
]
_SWIFT_FILMS = [
    ("Valentine's Day (2010 film)", "2010"), ("The Lorax (film)", "2012"),
    ("The Giver (film)", "2014"),
]


def swift_spans():
    spans, off = [], 0

    def add(kind, text):
        nonlocal off
        spans.append((kind, text, "", off))
        off += 1

    add("section:0", "Discography")
    add("section:1", "Studio albums")
    for title, y in _SWIFT_ALBUMS:
        add("list_item:1", f"''{title}'' ({y})")
    add("section:0", "Concert tours")
    for title, y in _SWIFT_TOURS:
        # unparenthesized ranges: the (bug-compatible) period regex would
        # otherwise capture the closing paren into the end year — the clean
        # golden literals prove the 2017 items carried bare ranges
        add("list_item:1", f"''{title}'' {y}")
    add("section:0", "Filmography")
    for title, y in _SWIFT_FILMS:
        add("list_item:1", f"''{title}'' ({y})")
    return spans


def test_taylor_swift_triples_match_committed_golden():
    """Second full-file golden (MusicalArtist domain family: discography M3,
    concert tours M4 with activeYears period pairs, filmography M2 with
    starring/Film defaults), including the title-year quirk: '1989 (Taylor
    Swift album)' released 2014 gets BOTH releaseYears in the golden because
    month_year_mapper scans the whole element."""
    import tempfile

    from list_extractor_spark.engine.sinks import to_turtle

    got, _ = extract_document(
        "Taylor_Swift", "MusicalArtist", "en", swift_spans(), NULL_LINKER
    )
    # compare at the ARTIFACT level: the golden is post-rdflib-serialization
    # (it normalized the period regex's " 2009" start years to "2009-01-01");
    # our turtle sink applies the same normalization, so round-trip through it
    with tempfile.NamedTemporaryFile("w", suffix=".ttl", delete=False) as f:
        f.write(to_turtle(sorted(got)))
    got_norm = parse_turtle(f.name)
    want = parse_turtle(GOLDEN_SWIFT)
    assert got_norm == want, (sorted(got_norm - want)[:8], sorted(want - got_norm)[:8])


# -- NTU: representative-subset parity (EducationalInstitution family) -------
# Wiki-linked people appear in the golden with CLEAN minted IRIs (the {{...}}
# miss path strips the braces before minting and the profession tail is read
# from the brace-mutated element); plain-text people keep their whole tail in
# the IRI (general_mapper) — both forms below, including the double-space
# fossil in Dr_Khoo_Seow_Hwa__-_... .

GOLDEN_NTU = (
    "/root/reference/extracted/"
    "ListExtractor_Nanyang_Technological_University_en_2017_08_25.ttl"
)

_NTU_ALUMNI = [
    "{{Alan Tern}} - actor",
    "{{Azmoon Ahmad}}",
    "{{C Kunalan}}",
    "{{Calvin Kang Li Loong}} - National Sprinter",
    "{{Dipna Lim Prasad}} - National Hurdler",
    "Dr Khoo Seow Hwa  - Renowned calligrapher.",
]
_NTU_STAFF = [
    "{{Anthony Gordon Fane}}",
    "{{Balazs Gulyas}}",
    "{{Bertil Andersson}}",
    "{{Christopher G. Newhall}}",
    "{{Daniela Rhodes}}",
]


def ntu_spans():
    spans = [("section:0", "Notable alumni", "", 0)]
    off = 1
    for item in _NTU_ALUMNI:
        spans.append(("list_item:1", item, "", off))
        off += 1
    spans.append(("section:0", "Staff", "", off))
    off += 1
    for item in _NTU_STAFF:
        spans.append(("list_item:1", item, "", off))
        off += 1
    return spans


def test_ntu_subset_matches_committed_golden():
    got, _ = extract_document(
        "Nanyang_Technological_University",
        "EducationalInstitution",
        "en",
        ntu_spans(),
        NULL_LINKER,
    )
    golden = parse_turtle(GOLDEN_NTU)
    got_subjects = {s for (s, _p, _o, _dt) in got}
    golden_restricted = {t for t in golden if t[0] in got_subjects}
    assert got == golden_restricted, (
        sorted(got - golden_restricted)[:8],
        sorted(golden_restricted - got)[:8],
    )
    assert len(got_subjects) == len(_NTU_ALUMNI) + len(_NTU_STAFF)


# -- Elon Musk: honors-family subset (Person: M9 sticky status, for/from) ----

GOLDEN_MUSK = "/root/reference/extracted/ListExtractor_Elon_Musk_en_2017_06_23.ttl"

_MUSK_AWARD_ITEMS = [  # section "Awards" -> status Winner (sticky from item 1)
    "Won {{Royal Aeronautical Society}} gold medal 2012",
    "Won {{National Space Society}} Von Braun Trophy 2008 for Burt Rutan",
    "Won {{National Space Society}} Von Braun Trophy 2009 for Burt Rutan",
]
_MUSK_HONOUR_ITEMS = [  # section "Honours" -> status HonoraryDegree (sticky)
    "Honorary doctorate in {{Aerospace Engineering}} 2009",
    "Honorary doctorate in {{Aerospace Engineering}} 2015",
    "Honorary degree, from Art Center College of Design",
    "Honorary degree, from University of Surrey",
    "Honorary degree from {{Yale University}} 2015",
]


def musk_spans():
    spans, off = [("section:0", "Awards", "", 0)], 1
    for it in _MUSK_AWARD_ITEMS:
        spans.append(("list_item:1", it, "", off))
        off += 1
    spans.append(("section:0", "Honours", "", off))
    off += 1
    for it in _MUSK_HONOUR_ITEMS:
        spans.append(("list_item:1", it, "", off))
        off += 1
    return spans


def test_musk_honors_subset_matches_committed_golden():
    """Anchors M9 end-to-end against the published file: sticky award status
    per section (Winner vs HonoraryDegree), AwardedFor from the ' for ' tail,
    AwardedBy from the ' from ' tail (linked and plain), year merging across
    items on one award subject, and the comma-stop general fallback
    (dbr:Honorary_degree).  One documented drift: the 2017 run minted the
    AwardedBy SUBJECT in dbr:, today's reference mapper.py:583 uses dbo: —
    rewritten before comparing."""
    got, _ = extract_document(
        "Elon_Musk", "Person", "en", musk_spans(), NULL_LINKER
    )
    awarded_by = DBO + "AwardedBy"
    got = {
        ((DBR + s[len(DBO):]) if p == awarded_by and s.startswith(DBO) else s, p, o, dt)
        for (s, p, o, dt) in got
    }
    golden = parse_turtle(GOLDEN_MUSK)
    got_subjects = {s for (s, _p, _o, _dt) in got}
    golden_restricted = {t for t in golden if t[0] in got_subjects}
    assert got == golden_restricted, (
        sorted(got - golden_restricted)[:8],
        sorted(golden_restricted - got)[:8],
    )
    statuses = {o for (_s, p, o, _dt) in got if p == DBO + "awardStatus"}
    assert statuses == {DBO + "Winner", DBO + "HonoraryDegree"}


def test_golden_parser_roundtrip_counts():
    want = parse_turtle(GOLDEN_METALLICA)
    # 10 albums x 3 + 9 members x 1 + 4 award subjects x (status+awardedTo)
    # + 9 award years + 9 awardedFor
    assert len(want) == 10 * 3 + 9 + 4 * 2 + 9 + 9
