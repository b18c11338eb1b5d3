"""Round-7 optimization harness (bench.py is FROZEN; extra measurements live
here, per the driver contract).

For each named contract query: time REPS noop-sink runs (guide §1.4) and
optionally dump .explain("formatted") to plans/r07/<query>_<tag>.txt.

Usage:
  python bench_extra.py [--plans TAG] [--reps N] [query ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry  # noqa: E402
from list_extractor_spark.engine.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

DEFAULT_QUERIES = [
    "q_group_agg",
    "q_topk",
    "q_window_running",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_shingle_jaccard",
    "text_quality",
    "sim_topk",
    "media_features",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", default=None)
    ap.add_argument("--plans", default=None, help="dump explain() to plans/r07/<q>_<TAG>.txt")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    names = args.queries or DEFAULT_QUERIES

    spark = get_spark("bench_extra", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    queries = entry.queries()

    out = {}
    for name in names:
        if args.plans:
            os.makedirs("plans/r07", exist_ok=True)
            df = queries[name](spark, SF_DIR)
            with open(f"plans/r07/{name}_{args.plans}.txt", "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        samples = []
        for _ in range(max(1, args.reps)):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = queries[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        out[name] = {"best": min(samples), "samples": samples}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS,
                      "total_best": round(sum(v["best"] for v in out.values()), 3)}))


if __name__ == "__main__":
    main()
