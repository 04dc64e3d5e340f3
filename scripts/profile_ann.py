#!/usr/bin/env python3
"""cProfile one registry query's build+count to locate fixed driver latency
(py4j chatter, driver-sequenced actions, plan analysis).

Usage: python scripts/profile_ann.py query [query2 ...]
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile-ann")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.codegen.cache.maxEntries", "5000")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    qs = dict(entrymod.queries())
    warm = "/root/testdata/sf0.001"
    spark.range(1000).selectExpr("sum(id)").collect()
    for name in sys.argv[1:]:
        qs[name](spark, warm).count()  # warm codegen
        # timed un-profiled run first (cProfile overhead skews wall)
        t0 = time.time()
        qs[name](spark, sf_dir).count()
        wall = time.time() - t0
        pr = cProfile.Profile()
        pr.enable()
        qs[name](spark, sf_dir).count()
        pr.disable()
        s = io.StringIO()
        ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
        ps.print_stats(40)
        txt = s.getvalue()
        print(f"##### {name}: wall={wall:.3f}s (unprofiled 2nd run)")
        for line in txt.splitlines():
            if any(k in line for k in (
                "similarity.py", "dedup.py", "text.py", "pipeline.py",
                "collect", "count", "first", "send_command", "ncalls",
                "awaitResult", "socket", "readinto", "localCheckpoint",
                "mapInPandas", "__spark_entry__",
            )):
                print(line)
        print()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
