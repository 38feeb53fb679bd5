"""Extra measurement harness for optimization work (guide §1) — NOT the
frozen driver bench.  Times each contract query exactly the way bench.py
does (``.collect()``), optionally with a noop-sink isolation run
(``df.write.format('noop')`` — times computation without driver-side row
materialization), and can dump ``explain('formatted')`` per query.

Usage:
  python bench_extra.py [--sf DIR] [--queries a,b,c] [--noop] [--plans OUT]
                        [--reps N]
Prints one JSON line: {"sf": ..., "queries": {...}, "queries_noop": {...}}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# module-level so the warmup pandas-UDF's PEP-563 string annotations
# resolve against this module's globals (same as bench.py)
import pandas as pd  # noqa: E402

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

DEFAULT_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_revenue",
    "topk_orders_per_customer",
    "lww_last_event_per_user",
    "dedup_exact_documents",
    "token_stats_documents",
    "quality_documents",
    "minhash_near_dups",
    "simhash_documents",
    "embedding_norms",
    "ann_cosine_topk",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default=None)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--plans", default=None,
                    help="directory to write <name>.txt explain output")
    ap.add_argument("--reps", type=int, default=1)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from emailcdc.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app="bench-extra", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    names = (args.queries.split(",") if args.queries else DEFAULT_QUERIES)
    qs = entrymod.queries()

    # same untimed Python-worker warmup as bench.py
    @F.pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s
    spark.range(10_000, numPartitions=cpus).select(
        F.sum(_warm(F.col("id")))).collect()

    timings: dict[str, float] = {}
    noop_timings: dict[str, float] = {}
    for name in names:
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            plan = qs[name](spark, args.sf)._sc is None  # noqa: unused
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} collect r{rep}")
            t0 = time.time()
            qs[name](spark, args.sf).collect()
            dt = round(time.time() - t0, 3)
            timings[name] = min(timings.get(name, 1e9), dt)
            if args.noop:
                spark.sparkContext.setJobDescription(f"{name} noop r{rep}")
                t0 = time.time()
                qs[name](spark, args.sf).write.format("noop") \
                    .mode("overwrite").save()
                dt = round(time.time() - t0, 3)
                noop_timings[name] = min(noop_timings.get(name, 1e9), dt)
        if args.plans:
            with open(os.path.join(args.plans, f"{name}.txt"), "w") as fh:
                fh.write(qs[name](spark, args.sf)
                         ._jdf.queryExecution().explainString(
                             spark._jvm.org.apache.spark.sql.execution
                             .ExplainMode.fromString("formatted")))
        spark.sparkContext.setJobDescription(None)
    out = {"sf": args.sf, "cpus": cpus, "reps": args.reps,
           "queries": timings}
    if args.noop:
        out["queries_noop"] = noop_timings
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
