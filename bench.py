#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession

HEADLINE = [
    "filter_projection",
    "group_agg",
    "window_time_batch",
    "window_sliding_length",
    "window_session",
    "join_time_time",
    "join_stream_table",
    "tpch_q1_pricing",
    "tpch_q3_shipping",
    "tpch_q5ish_revenue",
    "pattern_followed_by",
    "sequence_strict",
    "window_unique",
    "incremental_agg_day",
    "table_upsert_last",
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "text_quality",
    # round 2: training-data pipeline ops as first-class headline entries
    "dedup_clusters",
    "ann_ivf_topk",
    "pipeline_contamination",
    "pipeline_pack",
    "pipeline_chunk_dedup",
    # round 2b: corpus statistics + banding dedup additions
    "text_tfidf_top_terms",
    "text_lm_score",
    "dedup_simhash_hamming",
    "pipeline_chunk_overlap",
    "pipeline_novelty",
    "text_source_stats",
    "pipeline_curate",
    "dedup_containment",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("flink-siddhi-spark-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    # untimed JVM/codegen warmup: run every headline query once at the
    # smallest SF. Whole-stage-codegen classes are cached by generated
    # source (schema/operators, not data size), so this compiles the same
    # classes the timed runs need — first-run Janino compilation of the
    # hash-pipeline queries otherwise costs 5-10s of pure compile time and
    # makes min-of-2 numbers JIT-noise-dominated.
    spark.range(1000).selectExpr("sum(id)").collect()
    qs = entrymod.queries()
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in HEADLINE:
        try:
            qs[name](spark, warm_dir).count()
        except Exception as ex:  # warmup must never fail the bench
            print(f"# warmup {name} failed: {ex}", file=sys.stderr)
    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = qs[name]
        best, n = None, 0
        for _ in range(3):  # min of 3: steady-state, robust to one run being
            t0 = time.time()  # hit by transient background contention
            df = fn(spark, sf_dir)
            n = df.count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        total += timings[name]
        print(f"# {name}: {n} rows in {timings[name]:.2f}s", file=sys.stderr)
    out = {
        "metric": "headline_queries_wall_clock",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
