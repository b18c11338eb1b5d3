"""End-to-end KG-construction pipeline with checkpointed, resumable stages.

    documents ──①redirect join──②extract (narrow mapInPandas)──③link join──
    ──④canonicalize──⑤dedup + materialize (partitioned parquet + lineage)

Stage outputs land under ``run_dir/<stage>/`` as parquet with Spark's
``_SUCCESS`` marker; a resumed run reuses any stage whose output committed,
so a kill between stages replays nothing and reproduces the identical triple
set (property-tested).  A ``_lineage`` table records per-stage row counts and
wall time — the scalable version of the reference's evaluation.csv
(utilities.py:319-346).

Shuffle budget at scale: ① and ③ are broadcast joins while their snapshot
sides fit spark.sql.autoBroadcastJoinThreshold and degrade to shuffle joins
past it (every snapshot join — redirects, page_types, mention index, sameAs,
canonical map — is size-gated via engine/stats.fits_broadcast, so a
10^7-10^8-row dump never forces a multi-GB driver broadcast; AQE splits
runtime skew on the demoted joins), ② is narrow, ④ touches only the small
identity-edge set plus one size-gated map application, ⑤ is the single
unavoidable shuffle (global (s,p,o,dt) dedup, the reference's rdflib set
semantics).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from .bloom import build_bloom
from .canonicalize import apply_canonical_df, canonical_map_df, identity_edges
from .extract import extract_candidates_arrow
from .linking import attach_page_types, resolve_links, resolve_redirects
from .schemas import (
    MENTION_INDEX_SCHEMA,
    PAGE_TYPES_SCHEMA,
    REDIRECTS_SCHEMA,
    SAMEAS_SCHEMA,
)


def _local_df(spark: SparkSession, rows, schema):
    """createDataFrame via a pandas frame: Spark plans it as a LocalRelation
    WITH size statistics (a python list becomes a LogicalRDD whose stats are
    Long.MaxValue), so downstream size-adaptive decisions (link-join regime,
    canonicalization path) read Catalyst stats instead of running count jobs
    — each skipped tiny job saves ~0.3-0.5 s of driver scheduling latency."""
    import pandas as pd

    pdf = pd.DataFrame(list(rows), columns=[f.name for f in schema.fields])
    return spark.createDataFrame(pdf, schema=schema)


def snapshots_to_dfs(spark: SparkSession, snapshots: dict):
    mention_index = _local_df(
        spark, snapshots.get("mention_index", []), MENTION_INDEX_SCHEMA
    )
    sameas = _local_df(spark, snapshots.get("sameas", []), SAMEAS_SCHEMA)
    redirects = _local_df(spark, snapshots.get("redirects", []), REDIRECTS_SCHEMA)
    return mention_index, sameas, redirects


def page_types_df(spark: SparkSession, snapshots: dict):
    rows = snapshots.get("page_types")
    if not rows:
        return None
    return _local_df(spark, rows, PAGE_TYPES_SCHEMA)


class Pipeline:
    def __init__(
        self,
        spark: SparkSession,
        run_dir: str | None = None,
        salt: int | None = None,  # None = size-adaptive link join
        skew_repartition: bool = False,
    ):
        self.spark = spark
        self.run_dir = run_dir
        self.salt = salt
        self.skew_repartition = skew_repartition
        self._lineage: list[dict] = []

    # -- checkpoint helpers ------------------------------------------------
    def _stage_path(self, name: str) -> str | None:
        return os.path.join(self.run_dir, name) if self.run_dir else None

    def _is_done(self, name: str) -> bool:
        p = self._stage_path(name)
        return bool(p) and os.path.exists(os.path.join(p, "_SUCCESS"))

    def _checkpoint(self, df: DataFrame, name: str) -> DataFrame:
        """Materialize a stage boundary when a run_dir is set (durable parquet
        commit = the resume point + lineage row counts).  Without a run_dir the
        pipeline stays fully LAZY: Catalyst fuses extract+link+canonical-apply+
        dedup into one pass over the documents (the downstream plan reads each
        stage exactly once — resolve_links is a single left join, so no branch
        recomputes the extract UDF), and no cached blocks linger in the block
        manager afterwards."""
        p = self._stage_path(name)
        if p is None:
            return df
        t0 = time.time()
        reused = self._is_done(name)  # BEFORE the write, or it's always True
        if not reused:
            df.write.mode("overwrite").parquet(p)
        out = self.spark.read.parquet(p)
        n = out.count()
        self._lineage.append(
            {"stage": name, "rows": n, "sec": round(time.time() - t0, 3),
             "reused": reused}
        )
        return out

    # -- the pipeline ------------------------------------------------------
    def run(
        self,
        documents: DataFrame,
        mention_index: DataFrame,
        sameas: DataFrame,
        redirects: DataFrame,
        linkable_keys=None,
        canonicalize: bool = True,
        page_types: DataFrame | None = None,
    ) -> DataFrame:
        if linkable_keys is None:
            # distributed Bloom build: the driver holds a fixed-size bitmap,
            # never the surface rows (collecting a real mention index — 10^8+
            # surfaces — is the one thing in this path that cannot scale)
            linkable_keys = build_bloom(mention_index.select("lang", "surface"))

        if self._is_done("candidates"):
            candidates = self.spark.read.parquet(self._stage_path("candidates"))
            self._lineage.append({"stage": "candidates", "rows": candidates.count(),
                                  "sec": 0.0, "reused": True})
        else:
            docs = resolve_redirects(documents, redirects)
            if page_types is not None:
                docs = attach_page_types(docs, page_types)
            candidates = self._checkpoint(
                extract_candidates_arrow(
                    docs, linkable_keys=linkable_keys,
                    skew_repartition=self.skew_repartition,
                ),
                "candidates",
            )

        if self._is_done("linked"):
            linked = self.spark.read.parquet(self._stage_path("linked"))
            self._lineage.append({"stage": "linked", "rows": linked.count(),
                                  "sec": 0.0, "reused": True})
        else:
            linked = self._checkpoint(
                resolve_links(candidates, mention_index, sameas, salt=self.salt), "linked"
            )

        if canonicalize:
            cmap = canonical_map_df(identity_edges(redirects, sameas))
            linked = apply_canonical_df(linked, cmap)

        # project BEFORE the dedup shuffle: doc_id must not ride through the
        # exchange (the only wide stage in the pipeline)
        triples = (
            linked.select("subj", "pred", "obj", "obj_dt")
            .dropDuplicates(["subj", "pred", "obj", "obj_dt"])
        )
        triples = self._checkpoint(triples, "triples")
        self._write_lineage()
        return triples

    def _write_lineage(self):
        if self.run_dir:
            os.makedirs(self.run_dir, exist_ok=True)
            with open(os.path.join(self.run_dir, "_lineage.json"), "w") as f:
                json.dump(self._lineage, f, indent=1)

    @property
    def lineage(self):
        return list(self._lineage)


def run_pipeline(
    spark: SparkSession,
    documents: DataFrame,
    snapshots: dict,
    run_dir: str | None = None,
    canonicalize: bool = True,
    salt: int | None = None,
    skew_repartition: bool = False,
    use_page_types: bool = False,
) -> DataFrame:
    """Convenience wrapper: snapshots dict -> DataFrames -> Pipeline.run."""
    mention_index, sameas, redirects = snapshots_to_dfs(spark, snapshots)
    pipe = Pipeline(spark, run_dir=run_dir, salt=salt, skew_repartition=skew_repartition)
    return pipe.run(
        documents,
        mention_index,
        sameas,
        redirects,
        canonicalize=canonicalize,
        page_types=page_types_df(spark, snapshots) if use_page_types else None,
    )
