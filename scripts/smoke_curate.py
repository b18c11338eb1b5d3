"""Curation-pipeline smoke at corpus scale: quality filter -> line filter ->
minhash dedup -> decontamination -> split -> pack over a deterministic
synthetic text corpus with planted duplicate families and planted eval
contamination.

Usage: python scripts/smoke_curate.py [N_DOCS] [CPUS]
Emits one JSON line with per-stage accounting + wall time.

Corpus (deterministic per doc_id, partition-layout independent):
  - base docs: 6-12 prose-shaped sentences (stopwords, terminal periods),
    every sentence carrying a unique numeric entity so 5-gram shingles do
    NOT collide across unrelated documents;
  - 2% of ids are near-duplicates of base doc (id % 1000) with one
    sentence swapped per copy (minhash catches them at threshold 0.2;
    at N docs this forms 20 families of ~N/1000 members each — CC resolve
    gets real multi-member clusters, not just pairs);
  - ~0.25% of ids quote three sentences of an eval document verbatim
    (>= 3 shared 5-gram shingles -> decontamination drops them);
  - 1% are quality rejects (too short).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F, types as T  # noqa: E402

from list_extractor_spark.engine.session import get_spark  # noqa: E402
from list_extractor_spark.tda.curate import curate_corpus  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
CPUS = sys.argv[2] if len(sys.argv) > 2 else os.environ.get("SPARK_GRAFT_CPUS", "32")
STAGE = f"/tmp/sg_curate_corpus_{N}"

_NOUNS = ["heron", "fox", "miller", "scribe", "gardener", "pilot",
          "courier", "teacher", "fisher", "baker"]
_PLACES = ["river", "meadow", "valley", "harbor", "orchard", "airfield",
           "market", "yard", "shore", "square"]


def _sentence(rng) -> str:
    # a unique entity number lands in EVERY 5-token window (max clean run of
    # template tokens is 4, including across sentence boundaries), so no
    # 5-gram shingle collides between unrelated documents — a shared
    # template run of >= 5 tokens would make the decontamination stage see
    # every document as quoting every eval document
    n = lambda: rng.randrange(10**9)  # noqa: E731
    return (
        f"the {rng.choice(_NOUNS)} {n()} walks over bridge {n()} toward "
        f"the quiet {rng.choice(_PLACES)} {n()} before morning light {n()} "
        f"returns."
    )


def _eval_text(j: int) -> str:
    import random

    ev = random.Random(999_000 + j)
    return " ".join(_sentence(ev) for _ in range(3))
spark = get_spark(f"local[{CPUS}]")
out = {"n_docs": N, "cpus": int(CPUS)}

t0 = time.time()
if not os.path.exists(STAGE):
    schema = T.StructType([
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
    ])

    def gen(batches):
        import random

        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = i % 200
                if kind < 2:  # 1% quality rejects
                    rows.append((f"d{i}", "tiny."))
                    continue
                base_id = i
                if kind < 6 and i >= 1000:  # 2% near-dups: families share the
                    base_id = i % 1000  # TRUE base doc in [0, 1000)
                rng = random.Random(base_id)
                n_sent = rng.randint(6, 12)
                sents = [_sentence(rng) for _ in range(n_sent)]
                if base_id != i:  # perturb ONE sentence -> near, not exact
                    swap = random.Random(i)
                    sents[swap.randrange(n_sent)] = _sentence(swap)
                if kind == 6 and i % 400 == 6:  # ~0.25% eval contamination
                    sents[:1] = [_eval_text(i % 50)]
                rows.append((f"d{i}", " ".join(sents)))
            yield pd.DataFrame(rows, columns=["doc_id", "text"])

    tmp = STAGE + ".build"
    (spark.range(N).repartition(64).mapInPandas(gen, schema=schema)
     .write.mode("overwrite").parquet(tmp))
    os.rename(tmp, STAGE)
out["gen_sec"] = round(time.time() - t0, 1)

docs = spark.read.parquet(STAGE)
# eval set: 50 deterministic benchmark docs; the planted contamination block
# quotes these verbatim
eval_docs = spark.createDataFrame(
    pd.DataFrame(
        [(f"e{j}", _eval_text(j)) for j in range(50)], columns=["doc_id", "text"]
    )
)

t0 = time.time()
cap = os.environ.get("SPARK_GRAFT_CURATE_BUCKET_CAP")
out["bucket_cap"] = int(cap) if cap else 50
result = curate_corpus(
    docs, eval_docs, line_to_newline=True, bucket_cap=out["bucket_cap"]
)
agg = result.groupBy("split").agg(
    F.count("*").alias("n"), F.sum("n_tokens").alias("tokens"),
    F.count_distinct("pack_id").alias("packs"),
).collect()
out["curate_sec"] = round(time.time() - t0, 1)
out["survivors"] = int(sum(r["n"] for r in agg))
out["splits"] = {r["split"]: r["n"] for r in agg}
out["packs"] = int(sum(r["packs"] for r in agg))
out["docs_per_sec"] = round(N / out["curate_sec"], 1)
print(json.dumps(out))
