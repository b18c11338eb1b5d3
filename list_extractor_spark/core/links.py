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
