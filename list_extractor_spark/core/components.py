"""Pure-Python connected components over an undirected pair list.

The semantics twin of tda/dedup.near_dup_resolve's distributed loop (and the
generator behind its contract oracle): every node of the pair graph maps to
the MINIMUM node id of its component.  Plain union-find with path compression
and union-by-min — deterministic for any input order.
"""

from __future__ import annotations


def components(pairs) -> dict:
    """pairs: iterable of (a, b) -> {node: min id of its component}.

    Nodes are compared with ``<`` (ids are strings in the dedup pipeline);
    singletons never appear in a pair list, so every key occurred in >=1
    pair.
    """
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        for n in (a, b):
            if n not in parent:
                parent[n] = n
        ra, rb = find(a), find(b)
        if ra == rb:
            continue
        if rb < ra:
            ra, rb = rb, ra
        parent[rb] = ra  # union-by-min: the smaller id becomes the root
    return {n: find(n) for n in parent}
