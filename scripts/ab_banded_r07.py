"""r7 A/B: minhash banded self-join strategy — planner default (broadcast)
vs hint('merge') (tmux only).  Identical outputs asserted."""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from list_extractor_spark.engine.session import get_spark  # noqa: E402
from list_extractor_spark.engine.stats import spread_scan  # noqa: E402
from list_extractor_spark.tda import dedup  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
spark = get_spark("ab_banded", master="local[32]", shuffle_partitions=32)
docs = spark.read.parquet(f"{SF}/documents.parquet").select(
    F.col("doc_id").cast("string").alias("doc_id"), "text"
)
docs.count()
K, BANDS, CAP, THRESH = 16, 4, 50, 0.2


def variant(hint):
    import pandas as pd

    stats = dedup.minhash_doc_stats(spread_scan(docs), k=K, bands=BANDS).localCheckpoint(eager=True)
    banded = stats.select(
        "doc_id",
        F.stack(F.lit(BANDS), *[x for b in range(BANDS) for x in (F.lit(b), F.col(f"bh_{b}"))]).alias("band_id", "bh"),
    )
    banded = dedup._cap_postings(banded, ["band_id", "bh"], CAP)
    rhs = banded.alias("y") if hint is None else banded.hint(hint).alias("y")
    cand = (
        banded.alias("x").join(rhs, ["band_id", "bh"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )

    @F.pandas_udf("int")
    def _common(ha: pd.Series, hb: pd.Series) -> pd.Series:
        import numpy as np
        return pd.Series([len(np.intersect1d(a, b, assume_unique=True)) for a, b in zip(ha, hb)], dtype="int32")
    _c = _common.asNondeterministic()
    side = lambda s: stats.select(F.col("doc_id").alias(f"doc_{s}"), F.col("sh_hash").alias(f"h_{s}"), F.col("n_sh").alias(f"n_{s}"))
    return (
        cand.join(side("a"), "doc_a").join(side("b"), "doc_b")
        .withColumn("common", _c("h_a", "h_b"))
        .withColumn("jaccard", F.round(F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")), 6))
        .filter(F.col("jaccard") >= THRESH)
        .select("doc_a", "doc_b", "jaccard")
    )


base = sorted(map(tuple, variant(None).collect()))
assert sorted(map(tuple, variant("merge").collect())) == base
print("identical", len(base))
out = {}
for rep in range(4):
    for m in (None, "merge"):
        t0 = time.time()
        variant(m).write.format("noop").mode("overwrite").save()
        out.setdefault(str(m), []).append(round(time.time() - t0, 3))
print(json.dumps({k: min(v) for k, v in out.items()}))
print(json.dumps(out))
