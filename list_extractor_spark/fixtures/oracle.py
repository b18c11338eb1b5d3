"""Pure-Python end-to-end oracle: the triple set the Spark pipeline must match.

Runs the same core semantics (parse -> dispatch -> mappers) serially with the
fully-resolved Linker, applies redirect resolution and canonicalization, and
returns the deduplicated (subj, pred, obj, obj_dt) set.  The pytest parity
gate compares the Spark pipeline's output against this, order-insensitively
(BASELINE.md §2: P/R >= 0.95; the engine targets exact agreement)."""

from __future__ import annotations

from ..core.canonical import apply_canonical, build_edges, canonical_map
from ..core.links import Linker
from ..core.mappers import extract_document


def snapshot_linker(snapshots: dict) -> Linker:
    mi = {(lang, surface): wk for (lang, surface, wk, rank) in snapshots["mention_index"] if rank == 1}
    sa = dict(snapshots["sameas"])
    return Linker(mi, sa)


def oracle_triples(docs, snapshots, canonicalize: bool = True, page_types=None):
    linker = snapshot_linker(snapshots)
    redirect_map = dict(snapshots.get("redirects", []))
    types_map: dict = {}
    if page_types:
        for resource, rdf_type in page_types:
            types_map.setdefault(resource, []).append(rdf_type)
        for v in types_map.values():
            v.sort()  # matches the engine's sort_array(collect_list(...))
    all_triples = set()
    for d in docs:
        res_target = redirect_map.get(d["doc_id"], d["doc_id"])
        classes = types_map.get(d["doc_id"], [d["res_class"]]) if page_types else d["res_class"]
        triples, _ = extract_document(res_target, classes, d["lang"], d["spans"], linker)
        all_triples |= triples
    if canonicalize:
        cmap = canonical_map(build_edges(snapshots.get("redirects", []), snapshots["sameas"]))
        all_triples = apply_canonical(all_triples, cmap)
    return all_triples
