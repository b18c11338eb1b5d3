"""Scalar extractor primitives (E1-E12 in SURVEY.md §2.5).

Python 3 re-derivations of the reference's regex extractors
(/root/reference/mapper.py:1234-1509,1605-1727).  Observable quirks are kept
on purpose because the correctness gate is triple agreement with
reference semantics:

  * reference_mapper / quote_mapper discard the whole match when it contains a
    4-digit number (the reference's "recurse on the digit string" can never
    match again — mapper.py:1672-1676,1721-1725).
  * general_mapper's character class and the exact strip ordering.
  * litgenre_mapper returns None when two genres match (mapper.py:1389-1395).
  * filmpart/filmtype/award_status are last-match-wins over dict order.
"""

from __future__ import annotations

import re

# Compiled-pattern cache for data-driven patterns (rule-table keywords etc.).
# The stdlib re cache keys on (pattern, flags) per call — measurable overhead
# at millions of calls — and can evict under pressure; this cache cannot.
_RE_I: dict = {}


def search_i(pattern: str, s: str):
    """re.search(pattern, s, re.IGNORECASE) with a persistent compiled cache."""
    c = _RE_I.get(pattern)
    if c is None:
        c = _RE_I[pattern] = re.compile(pattern, re.IGNORECASE)
    return c.search(s)
from urllib.parse import quote as _urlquote

from ..rules import (
    AWARD_STATUS_TYPE,
    BIBLIO_GENRE,
    FILMOGRAPHY_PARTICIPATION,
    FILMOGRAPHY_TYPE,
    TRANSLATIONS,
)

# Namespaces (reference mapper.py:32-34).
DBO = "http://dbpedia.org/ontology/"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD = "http://www.w3.org/2001/XMLSchema#"
XSD_STRING = XSD + "string"
XSD_GYEAR = XSD + "gYear"
XSD_GYEARMONTH = XSD + "gYearMonth"


def dbr_ns(lang: str) -> str:
    """Per-language resource namespace (reference mapper.py:76-78).

    The reference mutates a module global; here it is derived per document so
    parallel execution cannot leak namespaces across documents.
    """
    if lang == "en":
        return "http://dbpedia.org/resource/"
    return "http://" + lang + ".dbpedia.org/resource/"


_QUOTE_SAFE_RE = re.compile(r"[A-Za-z0-9_.\-~/]*\Z")


def uri_quote(name: str) -> str:
    """urllib2.quote parity: percent-encode with safe='/' over UTF-8 bytes.

    Python 2 quote(utf-8 bytes) and Python 3 quote(str) agree byte-for-byte
    for safe='/' (golden files show %28 %27 %2C, reference mapper.py:210,285).
    Fast path: names made only of characters quote() never encodes (the
    unreserved set + '/') pass through untouched — the common case for minted
    entity names.
    """
    if _QUOTE_SAFE_RE.match(name):
        return name
    return _urlquote(name, safe="/")


# every character list_elem_clean can remove; when none occur, the whole
# replace ladder reduces to .strip() — one C-level scan instead of 12 string
# passes (list_elem_clean is the hottest cascade primitive: ~26k calls per
# 800 fixture docs, most on clean text)
_CLEAN_TRIGGER_RE = re.compile(r"[{}\[\]“”«»《'\"#]")


def list_elem_clean(list_elem: str) -> str:
    """Scrub URI-hostile characters (reference mapper.py:1605-1630)."""
    if not _CLEAN_TRIGGER_RE.search(list_elem):
        return list_elem.strip()
    list_elem = list_elem.lstrip()
    list_elem = list_elem.lstrip("'")
    list_elem = list_elem.rstrip("'")
    for ch in ("{", "}", "[", "]", "“", "”", "«", "»", "《"):
        list_elem = list_elem.replace(ch, "")
    list_elem = list_elem.replace("''", "")
    list_elem = list_elem.replace('"', "")
    list_elem = list_elem.replace("#", "")
    list_elem = list_elem.lstrip()
    list_elem = list_elem.rstrip()
    return list_elem


_ITALIC_RE = re.compile(r"\'{2,}(.*?)\'{2,}")
_REF_RE = re.compile(r"\{\{.*?\}\}")
_QUOTE_RE = re.compile(r"\"(.*?)\"")
_FOURDIGIT_RE = re.compile(r"[0-9]{4}")
_GENERAL_RE = re.compile(r"[^0-9][^,|:|：|–|(*|\[*|《*]+", re.IGNORECASE)
_ISBN_RE = re.compile(r"ISBN ([0-9]|-)*X?")
_BRACKET_RE = re.compile(r"\(.*\)", re.IGNORECASE)
_PROFESSION_RE = re.compile(r"(?:–|-)[^-|,]+$")


def italic_mapper(list_elem: str):
    """First ``''...''`` run, cleaned (reference mapper.py:1642-1658)."""
    m = _ITALIC_RE.search(list_elem)
    if m:
        return list_elem_clean(m.group(0))
    return None


def reference_mapper(list_elem: str):
    """First ``{{...}}`` reference; date-bearing references are dropped
    entirely (reference mapper.py:1661-1678: the retry is handed the bare
    digit string, which can never contain a reference, so the result is None).
    """
    m = _REF_RE.search(list_elem)
    if m:
        match_ref = m.group()
        if _FOURDIGIT_RE.search(match_ref):
            return None
        return match_ref
    return None


def quote_mapper(list_elem: str):
    """First double-quoted run *including the quotes* (group(0)); date-bearing
    matches dropped — same dead retry as reference_mapper
    (reference mapper.py:1710-1727).
    """
    m = _QUOTE_RE.search(list_elem)
    if m:
        match_ref = m.group(0)
        if _FOURDIGIT_RE.search(match_ref):
            return None
        return match_ref
    return None


def general_mapper(list_elem: str):
    """Fallback: leading non-digit then a run free of listed punctuation, with
    the reference's exact strip ladder (reference mapper.py:1681-1707)."""
    list_elem = list_elem_clean(list_elem)
    m = _GENERAL_RE.search(list_elem)
    if m is None:
        return None
    match_str = list_elem_clean(m.group())
    match_str = match_str.lstrip("'")
    match_str = match_str.lstrip("'")
    match_str = match_str.rstrip("'")
    match_str = match_str.lstrip(":")
    match_str = match_str.lstrip("-")
    match_str = match_str.lstrip("–")
    match_str = match_str.lstrip("(")
    match_str = match_str.lstrip(",")
    return match_str


def isbn_mapper(list_elem: str):
    """``ISBN ([0-9]|-)*X?`` with the prefix removed (reference mapper.py:1254-1273)."""
    m = _ISBN_RE.search(list_elem)
    if m is None:
        return None
    return m.group().replace("ISBN ", "")


def year_mapper(list_elem: str):
    """All 4-digit runs, or None (reference mapper.py:1275-1285)."""
    found = _FOURDIGIT_RE.findall(list_elem)
    return found or None


# month regex -> "<month number>^" code (reference mapper.py:1297-1303).
# Insertion order preserved: match/substitute passes run in this order.
_MONTH_LIST = {
    r"(january\s?)\d{4}": "1^",
    r"\W(jan\s?)\d{4}": "1^",
    r"(february\s?)\d{4}": "2^",
    r"\W(feb\s?)\d{4}": "2^",
    r"(march\s?)\d{4}": "3^",
    r"\W(mar\s?)\d{4}": "3^",
    r"(april\s?)\d{4}": "4^",
    r"\W(apr\s?)\d{4}": "4^",
    r"(may\s?)\d{4}": "5^",
    r"\W(may\s?)\d{4}": "5^",
    r"(june\s?)\d{4}": "6^",
    r"\W(jun\s?)\d{4}": "6^",
    r"(july\s?)\d{4}": "7^",
    r"\W(jul\s?)\d{4}": "7^",
    r"(august\s?)\d{4}": "8^",
    r"\W(aug\s?)\d{4}": "8^",
    r"(september\s?)\d{4}": "9^",
    r"\W(sep\s?)\d{4}": "9^",
    r"\W(sept\s?)\d{4}": "9^",
    r"(october\s?)\d{4}": "10^",
    r"\W(oct\s?)\d{4}": "10^",
    r"(november\s?)\d{4}": "11^",
    r"\W(nov\s?)\d{4}": "11^",
    r"(december\s?)\d{4}": "12^",
    r"\W(dec\s?)\d{4}": "12^",
}

# Time-period detector (reference mapper.py:1317).
_PERIOD_REGEX = r"(?:\(?\d{1,2}\^)?\s?\d{4}\s?(?:–|-)\s?(?:\d{1,2}\^)?\s?\d{4}(?:\))?"

_MONTH_COMPILED = [(re.compile(p, re.IGNORECASE), code) for p, code in _MONTH_LIST.items()]
# every month pattern requires a month-name prefix AND \d{4}; this prescan is
# a pure fast path (no semantic effect) that skips the 26-pattern loop
_MONTH_PRESCAN = re.compile(
    r"jan|feb|mar|apr|may|jun|jul|aug|sep|oct|nov|dec", re.IGNORECASE
)
_PERIOD_RE = re.compile(_PERIOD_REGEX, re.IGNORECASE)
_MONTHCODE_RE = re.compile(r"[0-9]{1,2}\^\s?[0-9]{4}")


def month_year_mapper(list_elem: str):
    """Date normalizer (reference mapper.py:1287-1374).

    Returns a list mixing "YYYY" strings, "YYYY^M" month-year codes and
    [start, end] period pairs, or None.  Month names are first substituted
    with "M^" codes; "^" is the reference's internal month separator.
    """
    # fast path: no 4-digit run anywhere -> no month codes, no periods, and
    # year_mapper returns None (all month patterns and the period regex
    # require \d{4}) — identical result without the pattern loop
    if not _FOURDIGIT_RE.search(list_elem):
        return None

    month_present = False
    period_dates = False

    if _MONTH_PRESCAN.search(list_elem):
        for mon_re, code in _MONTH_COMPILED:
            m = mon_re.search(list_elem)
            if m:
                rep = m.group(1)
                list_elem = re.sub(rep, code, list_elem, flags=re.I)
                month_present = True

    if _PERIOD_RE.search(list_elem):
        period_dates = True

    if not month_present and not period_dates:
        return year_mapper(list_elem)

    years = []

    if not month_present and period_dates:
        match_num = _PERIOD_RE.findall(list_elem)
        if len(match_num) == 0:
            return year_mapper(list_elem)
        for y in match_num:
            parts = re.split(r"\s?[–-]\s?", y)
            years.append([parts[0], parts[1]])
        for x in match_num:
            list_elem = list_elem.replace(x, "")
        single = year_mapper(list_elem)
        if single is not None:
            years.extend(single)
        return years

    if month_present and not period_dates:
        match_num = _MONTHCODE_RE.findall(list_elem)
        for x in match_num:
            list_elem = list_elem.replace(x, "")
            x = x.replace(" ", "")
            z = "^".join(x.split("^")[::-1])
            years.append(z)
        single = year_mapper(list_elem)
        if single is not None:
            years.extend(single)
        return years

    # both months and periods present
    match_num = re.findall(_PERIOD_REGEX, list_elem, flags=re.IGNORECASE)
    if len(match_num) == 0:
        return year_mapper(list_elem)
    for y in match_num:
        parts = re.split(r"\s?(–|-)\s?", y)
        list_elem = list_elem.replace(y, "")
        years.append(
            [
                "^".join(parts[0].replace(" ", "").split("^")[::-1]),
                "^".join(parts[2].replace(" ", "").split("^")[::-1]),
            ]
        )
    single = year_mapper(list_elem)
    if single is not None:
        years.extend(single)
    return years


def litgenre_mapper(sect_name: str, lang: str):
    """Section -> literary genre; ambiguous sections (two genres match) are
    suppressed (reference mapper.py:1376-1397)."""
    b_genres = BIBLIO_GENRE[lang]
    for bg in b_genres.keys():
        if search_i(bg, sect_name):
            for other_bg in b_genres.keys():
                if other_bg != bg and search_i(other_bg, sect_name):
                    return None
            return b_genres[bg]
    return None


def filmpart_mapper(sect_name: str, lang: str) -> str:
    """Participation property, default 'starring', last match wins
    (reference mapper.py:1399-1413)."""
    film_particip = "starring"
    for fp, val in FILMOGRAPHY_PARTICIPATION[lang].items():
        if search_i(fp, sect_name):
            film_particip = val
    return film_particip


def filmtype_mapper(sect_name: str, lang: str) -> str:
    """Filmography rdf:type, default 'Film', last match wins
    (reference mapper.py:1415-1430)."""
    filmtype = "Film"
    for ft, val in FILMOGRAPHY_TYPE[lang].items():
        if search_i(ft, sect_name):
            filmtype = val
    return filmtype


def award_status_mapper(sect_name: str, lang: str):
    """Award status or None, last match wins (reference mapper.py:1432-1446)."""
    status = None
    for st, val in AWARD_STATUS_TYPE[lang].items():
        if search_i(st, sect_name):
            status = val
    return status


def bracket_feature_mapper(elem: str):
    """Content of the first (...) group (reference mapper.py:1497-1509)."""
    m = _BRACKET_RE.search(elem)
    if m:
        return m.group().replace("(", "").replace(")", "").strip()
    return None


def alumni_profession_mapper(list_elem: str):
    """Trailing '- profession' tail (reference mapper.py:1234-1252).

    Raises IndexError on an empty tail exactly like the reference
    (``profession[0]`` on ''); the dispatcher swallows it per-section.
    """
    m = _PROFESSION_RE.search(list_elem)
    if m is None:
        return None
    profession = m.group()
    profession = (
        profession.replace("{{", "").replace("}}", "").replace("-", "").replace("–", "").strip()
    )
    if profession[0] == " ":
        profession = profession[1:]
    return profession


def sentence_splitter(elem: str, word: str, lang: str, linker) -> str | None:
    """Tail entity after a localized ' for '/' from ' split
    (reference mapper.py:1448-1495).

    ``linker`` is the snapshot-backed resolver (see links.py).  Reference
    quirk kept: when the tail holds a reference that *does* resolve, the raw
    tail (spaces and all) is returned, not the resolved URI.
    Raises KeyError when the word has no translation for ``lang``
    (TRANSLATIONS, mapping_rules.py:265-270) — swallowed by the dispatcher.
    """
    entity = None
    term = TRANSLATIONS[word][lang]
    val = re.split(term, elem)
    if len(val) > 1:
        entity = val[-1]
        ref = reference_mapper(entity)
        if ref:
            uri = linker.wikidata(ref, lang)
            if uri:
                pass  # resolved: reference returns the raw tail unchanged
            else:
                ref = list_elem_clean(ref)
                uri_name = ref.replace(" ", "_")
                entity = uri_quote(uri_name)
        else:
            entity = (
                entity.replace("{{", "").replace("}}", "").replace("''", "").strip().replace(" ", "_")
            )
            entity = uri_quote(entity)
    return entity
