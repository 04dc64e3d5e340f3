#!/usr/bin/env python3
"""Round-11 LSH shuffle-bytes probe (VERDICT r10 item 7): run
minhash_lsh_pairs on the factor-amplified corpus (bench._amplified_dir)
with the Spark UI on, then sum per-stage shuffle write/read bytes via the
REST API — the before/after evidence for the signature narrowing
(hex-string sigs + md5 band buckets -> bigint sigs + value-struct
buckets). Bytes are deterministic, so host contention cannot skew them.

Usage: python scripts/probe_lsh_bytes_r11.py [factor]
Prints one JSON line: wall sec, pair-row count, total shuffle write/read
bytes over the job's stages.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 100
UI_PORT = 4049


def main():
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName(f"probe-lsh-bytes-{FACTOR}x")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import bench
    from flink_siddhi_spark.llm.dedup import minhash_lsh_pairs

    sdir = bench._amplified_dir(spark, "/root/testdata/sf0.1", FACTOR)
    docs = spark.read.parquet(f"{sdir}/documents.parquet")
    spark.sparkContext.setJobDescription(f"lsh pairs {FACTOR}x")
    t0 = time.time()
    pairs = minhash_lsh_pairs(docs)
    n = pairs.count()
    dt = time.time() - t0

    app_id = spark.sparkContext.applicationId
    url = f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}/stages"
    stages = json.loads(urllib.request.urlopen(url).read())
    write_b = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    read_b = sum(s.get("shuffleReadBytes", 0) for s in stages)
    print(json.dumps({
        "factor": FACTOR, "pairs": n, "sec": round(dt, 2),
        "shuffle_write_bytes": write_b, "shuffle_read_bytes": read_b,
        "n_stages": len(stages),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
