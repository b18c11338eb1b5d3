"""Reference-compatible CLI (drop-in UX for dbpedia/list-extractor).

Mirrors the reference's argument contract (listExtractor.py:51-67):

    python scripts/list_extractor.py {s|a} SOURCE LANG [-c CLASSNAMES] \\
        --input <span-docs parquet> [--snapshots DIR] [--out-dir DIR]

    s  single resource (SOURCE = page id, e.g. William_Gibson); prints the
       parsed resDict (reference listExtractor.py:80-82) and the
       "Total elements extracted: X/Y" line (:102)
    a  whole class (SOURCE = ontology class from the MAPPING table, e.g.
       Writer), distributed over the full documents table

The one intentional difference: pages come from a SNAPSHOTTED span-document
parquet table (BASELINE.json input_hint shape) instead of live Wikipedia +
SPARQL calls — the whole point of the engine.  Output keeps the reference's
dated Turtle naming ``ListExtractor_<source>_<lang>_<YYYY_MM_DD>.ttl``
(listExtractor.py:151, utilities.py:92-99).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from list_extractor_spark.engine.pipeline import Pipeline, snapshots_to_dfs  # noqa: E402
from list_extractor_spark.engine.schemas import (  # noqa: E402
    DOCUMENTS_SCHEMA,
    MENTION_INDEX_SCHEMA,
    REDIRECTS_SCHEMA,
    SAMEAS_SCHEMA,
)
from list_extractor_spark.rules import MAPPING  # noqa: E402

# One Turtle FILE is inherently a driver-side artifact; past this many triples
# class mode keeps the distributed graph table and refuses the .ttl unless
# --force-ttl (a 5M-triple graph is ~500 MB of Turtle text on the driver).
TTL_ROW_BUDGET = 5_000_000


def _load_snapshots(spark, snapshots_dir):
    if snapshots_dir:
        def read(name, schema):
            # accept both layouts: <dir>/<name> (run_pipeline.py's) and
            # <dir>/<name>.parquet
            p = os.path.join(snapshots_dir, name)
            if not os.path.exists(p):
                p = p + ".parquet"
            return spark.read.schema(schema).parquet(p)

        return (
            read("mention_index", MENTION_INDEX_SCHEMA),
            read("sameas", SAMEAS_SCHEMA),
            read("redirects", REDIRECTS_SCHEMA),
        )
    from list_extractor_spark.fixtures import make_snapshots

    return snapshots_to_dfs(spark, make_snapshots())


def main():
    ap = argparse.ArgumentParser(
        description="Extract data from lists in snapshotted Wikipedia span "
        "documents and serialize it in RDF.\n"
        "Example: python scripts/list_extractor.py a Writer en --input docs/",
    )
    ap.add_argument("collect_mode", choices=["s", "a"],
                    help="'s' single page; 'a' all resources of a class")
    ap.add_argument("source", help="page id (s) or ontology class (a)")
    ap.add_argument("language", choices=["en", "it", "de", "es"])
    ap.add_argument("-c", "--classname",
                    help="comma-separated classnames overriding the rdf:type "
                         "lookup (single mode, reference listExtractor.py:88-91)")
    ap.add_argument("--input", required=True, help="span-documents parquet dir")
    ap.add_argument("--snapshots", default=None,
                    help="dir with mention_index/sameas/redirects parquet "
                         "(default: built-in demo snapshots)")
    ap.add_argument("--out-dir", default="extracted")
    ap.add_argument("--force-ttl", action="store_true",
                    help="class mode: serialize the Turtle file even past the "
                         f"{TTL_ROW_BUDGET:,}-triple driver budget")
    ap.add_argument("--ttl-budget", type=int, default=TTL_ROW_BUDGET,
                    help=argparse.SUPPRESS)  # test hook
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("list-extractor-compat")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    docs = spark.read.schema(DOCUMENTS_SCHEMA).parquet(args.input)
    docs = docs.filter(F.col("lang") == args.language)

    if args.collect_mode == "a":
        if args.source not in MAPPING:  # reference check_existing_class
            sys.exit(f"class '{args.source}' has no mapping (settings.json parity)")
        docs = docs.filter(F.col("res_class") == args.source)
    else:
        docs = docs.filter(F.col("doc_id") == args.source)
        if args.classname:
            classes = [c.strip() for c in args.classname.split(",")]
            docs = docs.withColumn(
                "res_classes", F.array(*[F.lit(c) for c in classes])
            )
        # reference single mode prints the parsed resDict (listExtractor.py:80-82)
        from list_extractor_spark.core.parser import parse_spans

        rows = docs.collect()
        if not rows:
            sys.exit(f"resource '{args.source}' not found in {args.input}")
        d = rows[0]
        res_dict = parse_spans(
            [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in d["spans"]],
            args.language,
        )
        for key, items in res_dict.items():
            print(f"{key} : {items}\n")

    mention_index, sameas, redirects = _load_snapshots(spark, args.snapshots)
    triples = Pipeline(spark).run(docs, mention_index, sameas, redirects)
    os.makedirs(args.out_dir, exist_ok=True)
    stamp = time.strftime("%Y_%m_%d")

    if args.collect_mode == "a":
        # class mode over a real corpus: the distributed, partitioned graph
        # table is the PRIMARY output (engine/sinks.py write_graph, with its
        # per-partition lineage); the single .ttl is a driver-bound courtesy
        # bounded by TTL_ROW_BUDGET.  Counting from the committed parquet is
        # metadata-cheap and never re-executes the pipeline.
        from list_extractor_spark.engine.sinks import write_graph

        graph_path = os.path.join(
            args.out_dir, f"graph_{args.source}_{args.language}_{stamp}"
        )
        write_graph(triples, graph_path)
        committed = spark.read.parquet(graph_path)
        n_triples = committed.count()
        print(f"{n_triples} triples -> {graph_path} (partitioned graph table)")
        if n_triples > args.ttl_budget and not args.force_ttl:
            print(
                f"refusing to serialize {n_triples:,} triples to one Turtle "
                f"file (budget {args.ttl_budget:,}; driver-side collect): the "
                f"graph table above is the scalable output — pass --force-ttl "
                "to override"
            )
            return
        rows = [
            (r["subj"], r["pred"], r["obj"], r["obj_dt"])
            for r in committed.select("subj", "pred", "obj", "obj_dt").collect()
        ]
    else:
        # single mode: one page's triples — collect ONCE (the turtle writer
        # materializes every row on the driver anyway, so counting separately
        # would execute the whole lazy pipeline twice)
        rows = [
            (r["subj"], r["pred"], r["obj"], r["obj_dt"])
            for r in triples.select("subj", "pred", "obj", "obj_dt").collect()
        ]
        n_triples = len(rows)
        # reference prints extracted/total list elements (listExtractor.py:102);
        # extract_metrics honors the -c res_classes override
        from list_extractor_spark.engine.extract import extract_metrics

        m = extract_metrics(docs).first()
        print(f"Total elements extracted: {m['n_extracted']}/{m['n_items']}")

    if n_triples:  # reference serializes only non-empty graphs (:149)
        from list_extractor_spark.engine.sinks import to_turtle

        out = os.path.join(
            args.out_dir, f"ListExtractor_{args.source}_{args.language}_{stamp}.ttl"
        )
        with open(out, "w") as f:
            f.write(to_turtle(rows))
        print(f"{n_triples} triples -> {out}")
    else:
        print("0 triples: nothing serialized (reference parity)")


if __name__ == "__main__":
    main()
