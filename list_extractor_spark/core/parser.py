"""Per-document span-sequence parser (P1-P3 in SURVEY.md §2.2).

Input is one document's span sequence — the engine's input contract
(BASELINE.json input_hint):

    spans: array<struct<kind:string, text:string, media_ref:string, offset:int32>>

with kind in {"section:<level>", "list_item:<level>", "text", "media"}.

The fold re-creates the reference's section-title state machine
(/root/reference/wikiParser.py:64-114):

  * level 0 heading  -> title = heading; header = title
  * level > previous -> title = previous_title + " - " + heading;
                        header = previous_title
  * otherwise        -> title = header + " - " + heading

and the list-item flattening (wikiParser.py:100-113): level-1 items are plain
strings; each deeper item is wrapped in its own single-element sub-list (the
reference appends one ``nest_list`` per nested element).

The fold is sequential *within* a document (the state machine reads the
previous section's level/title) and embarrassingly parallel *across*
documents — the Spark layer therefore keeps the whole span array in one row
and never explodes before this fold.
"""

from __future__ import annotations

from ..rules import EXCLUDED_SECTIONS


def parse_spans(spans, lang: str = "en") -> dict:
    """Fold one document's spans into {section_title_path: [item | [item]]}.

    ``spans`` is an iterable of (kind, text, media_ref, offset) tuples or
    dicts; it is processed ordered by offset.  Returns the cleaned resDict
    (empty-value drop + excluded-section drop + '&nbsp;' scrub, reference
    utilities.py:156-188).
    """
    seq = _as_tuples(spans)
    seq.sort(key=lambda s: s[3])

    lists: dict = {}
    last_sec_title = ""
    header_title = ""
    last_sec_lev = 0

    title = None  # current section title path; None until first heading
    fresh = False  # new section instance: first item overwrites a same-title
    # entry, mirroring the reference's dict.update per section
    # (wikiParser.py:58: a repeated title's later section wins)
    for kind, text, _media, _off in seq:
        if kind.startswith("section:"):
            level = int(kind.split(":", 1)[1])
            if level == 0:
                title = text
                header_title = title
            elif level > last_sec_lev:
                title = last_sec_title + " - " + text
                header_title = last_sec_title
            else:
                title = header_title + " - " + text
            last_sec_title = title
            last_sec_lev = level
            fresh = True
        elif kind.startswith("list_item:"):
            if title is None:
                continue  # list item before any heading: no section to attach
            level = int(kind.split(":", 1)[1])
            if fresh:
                lists[title] = []
                fresh = False
            sect_list = lists[title]
            if level > 1:
                # one single-element wrapper per nested item
                # (reference wikiParser.py:105-109)
                sect_list.append([text])
            else:
                sect_list.append(text)
        # "text" and "media" spans carry no list content (FIXTURES.md §1.1)

    return clean_dictionary(lang, lists)


def clean_dictionary(language: str, list_dict: dict) -> dict:
    """Drop empty-string values and excluded sections; scrub '&nbsp;'
    (reference utilities.py:156-188).  Exclusion is an exact match on the
    full concatenated title, so 'References - Notes' survives while
    'References' is dropped."""
    excluded = EXCLUDED_SECTIONS.get(language, [])
    out = {}
    for key, value in list_dict.items():
        if value == "":
            continue
        if key in excluded:
            continue
        out[key] = _remove_symbols(value)
    return out


def _remove_symbols(items):
    cleaned = []
    for value in items:
        if isinstance(value, list):
            cleaned.append(_remove_symbols(value))
        else:
            cleaned.append(value.replace("&nbsp;", ""))
    return cleaned


def _as_tuples(spans):
    seq = []
    for s in spans:
        if isinstance(s, dict):
            seq.append((s["kind"], s["text"], s.get("media_ref", ""), s["offset"]))
        else:
            kind, text, media, off = s[0], s[1], s[2], s[3]
            seq.append((kind, text, media, off))
    return seq
