"""Deterministic synthetic span corpus + link snapshots (FIXTURES.md §4).

Seeded, network-free generator of documents in exactly the input_hint shape:

    (doc_id string, lang string, res_class string,
     spans array<struct<kind,text,media_ref,offset>>)

The composition exercises every mapper domain, every extractor branch, the
linking hit/miss matrix, excluded sections, nested lists (band-members crash
path), date edge cases, a skewed hub document, and non-en languages.

Scale knob ``n_docs`` repeats the per-class templates with varied entity
names; the schema and rule coverage are identical from 10^2 to 10^12 docs.
"""

from __future__ import annotations

import random

FIRST = ["Alice", "Robert", "Chen", "Maria", "Ivan", "Aiko", "Lena", "Omar", "Priya", "Jack"]
LAST = ["Stone", "Rivera", "Okafor", "Lindqvist", "Tanaka", "Moreau", "Kovacs", "Diaz", "Walsh", "Novak"]
WORDS = ["Silver", "Night", "Iron", "Echo", "Crystal", "Velvet", "Solar", "Hidden", "Broken", "Golden"]
NOUNS = ["Road", "Garden", "Mirror", "Empire", "Harbor", "Signal", "Letter", "Canyon", "Orbit", "Tide"]


def _person(rng):
    return f"{rng.choice(FIRST)} {rng.choice(LAST)}"


def _title(rng):
    return f"{rng.choice(WORDS)} {rng.choice(NOUNS)}"


class _Doc:
    def __init__(self, doc_id, lang, res_class):
        self.doc_id = doc_id
        self.lang = lang
        self.res_class = res_class
        self.spans = []
        self._off = 0

    def add(self, kind, text, media_ref=""):
        self.spans.append((kind, text, media_ref, self._off))
        self._off += 1

    def section(self, title, level=0):
        self.add(f"section:{level}", title)

    def item(self, text, level=1):
        self.add(f"list_item:{level}", text)

    def prose(self, text):
        self.add("text", text)

    def media(self, ref, caption=""):
        self.add("media", caption, ref)

    def row(self):
        return {
            "doc_id": self.doc_id,
            "lang": self.lang,
            "res_class": self.res_class,
            "spans": [
                {"kind": k, "text": t, "media_ref": m, "offset": o}
                for (k, t, m, o) in self.spans
            ],
        }


def _writer_doc(i, rng, mentions):
    d = _Doc(f"Writer_{i}", "en", "Writer")
    d.section("Overview")
    d.prose("An author biography paragraph.")
    d.media(f"File:Writer_{i}.jpg", "portrait")
    d.section("Bibliography")
    d.section("Novels", level=1)
    for _ in range(rng.randint(2, 5)):
        t, y = _title(rng), rng.randint(1950, 2015)
        d.item(f"''{t} ({i})'' ({y}) ISBN 0-553-{rng.randint(10000,99999)}-6")
    d.section("Short stories", level=1)
    for _ in range(rng.randint(2, 4)):
        t = _title(rng)
        mon = rng.choice(["January", "March", "November", ""])
        d.item(f"''{t}'' ({mon} {rng.randint(1960, 2010)})".replace("( ", "("))
    d.section("Novels and short stories", level=1)  # ambiguous genre -> suppressed
    d.item(f"''{_title(rng)}'' (1999)")
    d.section("Awards")
    status = rng.choice(["Won", "Nominated", ""])
    surface = rng.choice(mentions) if rng.random() < 0.5 else f"{_title(rng)} Prize"
    d.item(f"{status} {{{{{surface}}}}} for ''{_title(rng)}'' from the Guild {rng.randint(1970, 2012)}")
    d.item(f"\"{_title(rng)} Medal\" for {_person(rng)}")
    d.section("Family")
    d.item(f"{_person(rng)}, spouse")
    d.section("Career")  # only reachable via the extra Person rdf:type
    d.item(f"Columnist at the {_title(rng)} Gazette (1970–1975)")
    d.section("References")  # excluded verbatim
    d.item("some citation")
    return d


def _band_doc(i, rng, mentions):
    d = _Doc(f"Band_{i}", "en", "Band")
    d.section("History")
    d.prose("Formed long ago.")
    d.section("Discography")
    d.section("Studio albums", level=1)
    for _ in range(rng.randint(3, 6)):
        t, y = _title(rng), rng.randint(1970, 2016)
        d.item(f"''{t} ({i})'' ({y})")
    d.section("Singles", level=1)
    d.item(f"\"{_title(rng)}\" (b-side)")
    d.item(f"{{{{{rng.choice(mentions)}}}}} charting single")
    d.section("Concert tours")
    d.item(f"''{_title(rng)} Tour'' (1991–1994)")
    d.item(f"''{_title(rng)} World Tour'' (March 2002 – May 2004)")
    d.section("Band members")
    d.item(f"{_person(rng)} – guitar")
    d.item(f"{_person(rng)} – drums")
    if rng.random() < 0.5:
        # nested member list: reference crashes here (mapper.py:930), the rest
        # of the section is lost — fixture keeps items after it to prove that
        d.item(f"{_person(rng)} – touring", level=2)
        d.item(f"{_person(rng)} – bass")
    d.section("Awards")
    d.item(f"Nominated for {{{{{rng.choice(mentions)}}}}} from the Academy")
    d.section("External links")
    d.item("band website")
    return d


def _uni_doc(i, rng, mentions):
    d = _Doc(f"Uni_{i}", "en", "EducationalInstitution")
    d.section("About")
    d.prose("A university.")
    alum = [f"{_person(rng)} {j}" for j in range(rng.randint(2, 4))]
    d.section("Notable alumni")
    for a in alum:
        d.item(f"{a} – novelist")
    d.item(f"{{{{{rng.choice(mentions)}}}}} – laureate")
    d.section("Staff")
    # first staff item is also an alumni -> anti-join drops the staff edge
    d.item(f"{alum[0]} – novelist")
    d.item(f"{_person(rng)} faculty dean")
    d.section("Programs")
    d.item("Computer Science")
    d.item("''Applied Physics''")
    d.section("Academics")
    d.item("Mathematics, pure")
    return d


def _person_awards_doc(i, rng, mentions):
    d = _Doc(f"Person_awards_{i}", "en", "Person")
    d.section("Career")
    d.item(f"\"Chief Engineer\" at {_title(rng)} Corp (1999–2004)")
    d.item(f"Director of {_title(rng)} Labs")
    d.section("Awards and honours")
    d.item(f"Won {_title(rng)} Award for ''{_title(rng)}'' from the Society 1994")
    d.item(f"{_title(rng)} Medal for {{{{{rng.choice(mentions)}}}}}")
    d.item(f"honorary doctorate from {_title(rng)} University")  # sticky HonoraryDegree
    d.item(f"{_title(rng)} Fellowship")
    d.section("Family")
    d.item(f"{_person(rng)}, sibling")
    return d


def _actor_doc(i, rng, _mentions):
    d = _Doc(f"Actor_{i}", "en", "Actor")
    d.section("Filmography")
    d.section("Films", level=1)
    d.item(f"''{_title(rng)}'' (1987)")
    d.item(f"\"{_title(rng)}\" cameo")
    d.item(f"{_title(rng)}, supporting role (2001)")
    d.section("TV shows", level=1)
    d.item(f"''{_title(rng)}'' (1993–1999)")
    d.section("Filmography - Director", level=0)
    d.item(f"''{_title(rng)}'' (2005)")
    d.section("Discography")
    d.item(f"''{_title(rng)} ({i})'' (1990)")
    return d


def _magazine_doc(i, rng, mentions):
    d = _Doc(f"Magazine_{i}", "en", "Magazine")
    d.section("Contributors")
    d.item(f"{_person(rng)} (cartoonist)")
    d.item(f"{{{{{rng.choice(mentions)}}}}} essays 1988")
    d.section("Contributors")
    d.section("Editors", level=1)
    d.item(f"{_person(rng)}, 1970–1975")
    d.section("Editions")
    d.item(f"The {_title(rng)} edition (1955)")
    d.section("Supplements")
    d.item(f"''{_title(rng)} Weekly''")
    return d


def _custom_doc(i, rng, _mentions):
    d = _Doc(f"Custom_{i}", "en", "CUSTOM_WRITER")
    d.section("Bibliography")
    d.section("Novel series", level=1)
    d.item(f"''{_title(rng)}'' (1981)")
    d.item(f"\"{_title(rng)}\" unpublished")
    d.section("Bibliography")  # no ontology key matches, no default -> KeyError path
    d.item(f"''{_title(rng)}'' (1999)")
    d.section("Short Stories", level=1)
    d.item(f"''{_title(rng)}'' (May 1984)")
    return d


def _genre_doc(i, rng, _mentions):
    d = _Doc(f"MusicGenre_{i}", "en", "MusicGenre")
    d.section("Notable bands")
    d.item(f"''The {_title(rng)}s''")
    d.item(f"The {_title(rng)} Collective (1979)")
    d.section("Artists")
    d.item(f"{_person(rng)}")  # ontology falls to default -> notableArtist
    d.section("Festivals and artists")
    d.item(f"{_title(rng)} Fest")
    return d


def _excluded_doc(i, rng, _mentions):
    d = _Doc(f"Excluded_{i}", "en", "Writer")
    d.section("References")
    d.item("citation one")
    d.section("External links")
    d.item("a link")
    return d


def _redirect_doc(i, rng, _mentions):
    d = _Doc(f"Redirect_{i}", "en", "Writer")
    d.section("Works")
    d.item(f"''{_title(rng)}'' (1970)")
    return d


def _hub_doc(i, rng, mentions, n_items=400):
    d = _Doc(f"Hub_{i}", "en", "Person")
    d.section("Career")
    for j in range(n_items):
        d.item(f"Expedition {rng.choice(WORDS)} {j} leader")
    d.section("Awards")
    for _ in range(n_items // 4):
        d.item(f"Won {_title(rng)} Award {rng.randint(1950, 2015)}")
    return d


def _multilang_doc(i, rng, _mentions):
    lang = ["it", "de", "es"][i % 3]
    if lang == "it":
        d = _Doc(f"Scrittore_{i}", "it", "Writer")
        d.section("Opere")
        d.item(f"''{_title(rng)}'' (1964)")
        d.section("Romanzi")
        d.item(f"''{_title(rng)}'' (1971)")
    elif lang == "de":
        d = _Doc(f"Schriftsteller_{i}", "de", "Writer")
        d.section("Werke")
        d.item(f"''{_title(rng)}'' (1923)")
        d.section("Romane", level=1)
        d.item(f"''{_title(rng)}'' (1930)")
    else:
        d = _Doc(f"Escritor_{i}", "es", "Writer")
        d.section("Obras")
        d.item(f"''{_title(rng)}'' (1955)")
    return d


def _date_edge_doc(i, rng, _mentions):
    d = _Doc(f"DateEdge_{i}", "en", "Person")
    d.section("Career")
    d.item("Explorer May 1901 – June 1905 of the north")
    d.item("Scholar 1880-1884 then abroad")
    d.item("Aviator (March 1931) record")
    d.item("Captain {{1944 battle}} veteran")  # date-bearing reference -> dropped
    d.item("Navigator 1962 and again 1968")
    return d


_TEMPLATES = [
    _writer_doc,
    _band_doc,
    _uni_doc,
    _person_awards_doc,
    _actor_doc,
    _magazine_doc,
    _custom_doc,
    _genre_doc,
    _excluded_doc,
    _redirect_doc,
    _date_edge_doc,
    _multilang_doc,
]


def make_corpus(n_docs: int = 60, seed: int = 42, hub_every: int = 50, hub_items: int = 400):
    """Deterministic corpus of ``n_docs`` documents cycling over the templates,
    plus one skewed hub document per ``hub_every`` docs."""
    rng = random.Random(seed)
    mentions = [f"Ref {w} {n}" for w in WORDS for n in NOUNS][:40]
    docs = []
    for i in range(n_docs):
        tmpl = _TEMPLATES[i % len(_TEMPLATES)]
        docs.append(tmpl(i, rng, mentions).row())
        if hub_every and (i + 1) % hub_every == 0:
            docs.append(_hub_doc(i, rng, mentions, n_items=hub_items).row())
    return docs


def make_snapshots(seed: int = 42):
    """Link snapshot tables exercising every branch of the linking matrix:
    hit+sameAs-hit, hit+sameAs-miss, miss (fallback mint)."""
    rng = random.Random(seed + 1)
    mentions = [f"Ref {w} {n}" for w in WORDS for n in NOUNS][:40]
    mention_index = []  # (lang, surface, wikidata_uri, rank)
    sameas = []  # (wikidata_uri, dbpedia_uri)
    for j, m in enumerate(mentions):
        surface = "{{" + m + "}}"  # raw reference_mapper match, braces included
        bucket = j % 3
        if bucket == 0:
            continue  # miss -> fallback IRI mint
        wk = f"http://www.wikidata.org/entity/Q{1000 + j}"
        mention_index.append(("en", surface, wk, 1))
        if bucket == 1:
            sameas.append((wk, "http://dbpedia.org/resource/" + m.replace(" ", "_")))
        # bucket == 2: wikidata hit without sameAs -> subject stays wikidata URI
    redirects = [(f"Redirect_{i}", f"Writer_{i}") for i in range(0, 200, len(_TEMPLATES))]
    rng.shuffle(mention_index)
    return {
        "mention_index": mention_index,
        "sameas": sameas,
        "redirects": redirects,
    }


def make_page_types(docs):
    """page_types snapshot (resource, rdf_type) for a corpus: every doc gets
    its template class; Writer docs additionally get Person (multi-type
    dispatch — shared domain dedup across types, reference mapper.py:36,107)."""
    rows = []
    for d in docs:
        rows.append((d["doc_id"], d["res_class"]))
        if d["res_class"] == "Writer" and d["doc_id"].startswith("Writer_"):
            rows.append((d["doc_id"], "Person"))
    return rows


def corpus_to_rows(docs):
    """Flatten corpus dicts to (doc_id, lang, res_class, spans) tuples for
    spark.createDataFrame."""
    return [
        (
            d["doc_id"],
            d["lang"],
            d["res_class"],
            [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in d["spans"]],
        )
        for d in docs
    ]
