"""Entity-linking context backed by snapshot tables (L1-L3 in SURVEY.md §2.6).

The reference resolves each mention with two live HTTP calls per element
(wikidataAPI_call, /root/reference/mapper.py:1547-1577; find_DBpedia_uri,
mapper.py:1580-1602).  This engine replaces them with lookups against
pre-snapshotted tables:

    mention_index(lang, surface, wikidata_uri)   <- top-1 wbsearchentities
    sameas(wikidata_uri, dbpedia_uri)            <- owl:sameAs snapshot

Inside the pandas UDF the *decision* (does this mention link?) uses broadcast
dicts; the Spark pipeline additionally re-resolves mentions through a real
broadcast-hash join (engine/linking.py) so the scale path is a join, not a
driver-side dict.
"""

from __future__ import annotations


class Linker:
    """Deterministic resolver over snapshot dicts."""

    def __init__(self, mention_index=None, sameas=None):
        # (lang, surface) -> wikidata_uri ; surface is the raw '{{...}}' match.
        self.mention_index = mention_index or {}
        # wikidata_uri -> dbpedia_uri
        self.sameas = sameas or {}

    def wikidata(self, surface: str, lang: str):
        """Snapshot stand-in for wikidataAPI_call (mapper.py:1547-1577)."""
        return self.mention_index.get((lang, surface))

    def dbpedia(self, wikidata_uri: str, lang: str):
        """Snapshot stand-in for find_DBpedia_uri (mapper.py:1580-1602)."""
        return self.sameas.get(wikidata_uri)


NULL_LINKER = Linker()

MENTION_SENTINEL = "urn:mention:"


class DeferredLinker(Linker):
    """Linker used inside the Spark extract UDF: it *decides* link hits from a
    broadcast membership set but defers URI resolution to the pipeline's
    broadcast-hash join (engine/linking.py).

    A hit returns the sentinel ``urn:mention:<lang>:<surface>``; the join stage
    replaces it with coalesce(dbpedia_uri, wikidata_uri).  dbpedia() returns
    None so the sentinel survives the mapper's sameAs step intact.

    Scale rationale: executors only need the *key set* of the mention index
    (compact, broadcastable); the value-bearing index stays a distributed
    table joined once, instead of a driver-shipped dict of every URI.
    """

    def __init__(self, linkable_keys):
        super().__init__()
        self.linkable = linkable_keys  # set of (lang, surface)

    def wikidata(self, surface: str, lang: str):
        if (lang, surface) in self.linkable:
            return f"{MENTION_SENTINEL}{lang}:{surface}"
        return None

    def dbpedia(self, wikidata_uri: str, lang: str):
        return None


def split_sentinel(uri: str):
    """urn:mention:<lang>:<surface> -> (lang, surface) or None."""
    if not uri.startswith(MENTION_SENTINEL):
        return None
    rest = uri[len(MENTION_SENTINEL):]
    lang, _, surface = rest.partition(":")
    return lang, surface
