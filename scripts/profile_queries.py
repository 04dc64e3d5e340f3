#!/usr/bin/env python3
"""Targeted per-query profiler for the optimization rounds: times a subset
of registry queries with the SAME methodology as bench.py (count() action,
min-of-N interleaved passes, sf0.001 warmup) so single-query experiments
don't need a full bench run.

Usage: python scripts/profile_queries.py [-n REPS] query1 query2 ...
       python scripts/profile_queries.py --explain query1   (plan only)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def build_spark():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile-queries")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.codegen.cache.maxEntries", "5000")
        .config("spark.sql.streaming.minBatchesToRetain", "2")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("-n", "--reps", type=int, default=3)
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    qs = dict(entrymod.queries())
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = args.sf_dir

    if args.explain:
        for name in args.queries:
            print(f"===== {name} =====")
            print(qs[name](spark, args.sf_dir)._jdf.queryExecution().explainString("formatted"))
        return 0

    spark.range(1000).selectExpr("sum(id)").collect()
    for name in args.queries:
        try:
            qs[name](spark, warm_dir).count()
        except Exception as ex:
            print(f"# warmup {name} failed: {ex}", file=sys.stderr)

    timings: dict[str, float] = {}
    counts: dict[str, int] = {}
    for rep in range(args.reps):
        for name in args.queries:
            fn = qs[name]
            if rep == 0:
                try:
                    fn(spark, warm_dir).count()
                except Exception:
                    pass
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            df = fn(spark, args.sf_dir)
            counts[name] = df.count()
            dt = time.time() - t0
            timings[name] = round(min(timings.get(name, dt), dt), 3)
            print(f"# rep{rep} {name}: {dt:.3f}s ({counts[name]} rows)", file=sys.stderr)
    print()
    for name in args.queries:
        print(f"{timings[name]:8.3f}  {name}  ({counts[name]} rows)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
