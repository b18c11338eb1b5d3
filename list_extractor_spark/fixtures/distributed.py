"""Distributed deterministic corpus generation.

make_corpus() is serial (driver-side) — fine for tests, too slow for
benchmark corpora of 10^5+ documents.  This generator produces the SAME
template mix with per-index seeding, as a mapInPandas over spark.range(n), so
corpus synthesis scales with the cluster exactly like the pipeline does (and
nothing big ever lives on the driver).
"""

from __future__ import annotations

import random
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..engine.schemas import DOCUMENTS_SCHEMA
from .corpus import _TEMPLATES, _hub_doc, NOUNS, WORDS


def doc_for_index(i: int, seed: int = 42, hub_every: int = 50, hub_items: int = 400):
    """One deterministic document for global index ``i`` (independent of any
    other index — per-doc RNG)."""
    rng = random.Random((seed << 32) ^ i)
    mentions = [f"Ref {w} {n}" for w in WORDS for n in NOUNS][:40]
    if hub_every and i % hub_every == hub_every - 1:
        return _hub_doc(i, rng, mentions, n_items=hub_items).row()
    return _TEMPLATES[i % len(_TEMPLATES)](i, rng, mentions).row()


def generate_documents(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    hub_every: int = 50,
    hub_items: int = 400,
    partitions: int | None = None,
) -> DataFrame:
    """documents DataFrame of ``n_docs`` synthetic docs, generated in
    executors (Arrow-batched), deterministic in (n_docs, seed)."""
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "lang": [], "res_class": [], "spans": []}
            for i in pdf["id"]:
                d = doc_for_index(int(i), seed, hub_every, hub_items)
                rows["doc_id"].append(d["doc_id"])
                rows["lang"].append(d["lang"])
                rows["res_class"].append(d["res_class"])
                rows["spans"].append(
                    [
                        {"kind": s["kind"], "text": s["text"],
                         "media_ref": s["media_ref"], "offset": s["offset"]}
                        for s in d["spans"]
                    ]
                )
            yield pd.DataFrame(rows)

    return spark.range(0, n_docs, numPartitions=parts).mapInPandas(
        gen, schema=DOCUMENTS_SCHEMA
    )
