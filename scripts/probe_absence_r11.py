#!/usr/bin/env python3
"""Round-11 absence-path profile (VERDICT r10 item 2): drain the bench's
exact `cep_pattern_absence_10x` cell in a FRESH session and print the
per-batch progress breakdown (durationMs phases, state operator metrics)
so the 12.6s driver reading can be attributed to a phase, not guessed at.

Usage: python scripts/probe_absence_r11.py [pattern] [buckets]
  pattern: absence (default) | nfa   (nfa = the timer-less control cell)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

WHICH = sys.argv[1] if len(sys.argv) > 1 else "absence"
BUCKETS = int(sys.argv[2]) if len(sys.argv) > 2 else 0

CQL = {
    "absence": (
        "partition with (user_id of events) begin "
        "from every e = events[event_type == 'error'] "
        "  -> not events[event_type == 'purchase'] for 10 min "
        "select e.user_id as user_id, e.event_id as error_id "
        "insert into Out; end"
    ),
    "nfa": (
        "partition with (user_id of events) begin "
        "from every e = events[event_type == 'error'] "
        "  -> p = events[event_type == 'purchase'] within 1 hour "
        "select e.user_id as user_id, p.event_id as purchase_id "
        "insert into Out; end"
    ),
}[WHICH]


def main():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe-absence-r11")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.streaming.minBatchesToRetain", "2")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from flink_siddhi_spark import SiddhiCEP

    amp = "/tmp/spark_graft_scale_10x_v2"
    if not os.path.exists(os.path.join(amp, "_done")):
        print("amplified dir missing; run bench.py once first", file=sys.stderr)
        return 1
    amp_src = f"{amp}/events.parquet"
    n_amp = spark.read.parquet(amp_src).count()
    amp_schema = spark.read.parquet(amp_src).schema
    root = tempfile.mkdtemp(prefix="probe_absence_")
    stream = (
        spark.readStream.format("parquet").schema(amp_schema)
        .load(amp_src)
        .withColumn("ts_ms", F.unix_millis(F.col("ts").cast("timestamp")))
    )
    cep = SiddhiCEP(spark, pattern_key_buckets=BUCKETS or None)
    cep.register_stream(
        "events", stream, "event_id", "user_id", "event_type",
        "value", "ts_ms", ts_field="ts_ms",
    )
    plan = cep.from_("events").cql(CQL).returns("Out")
    t0 = time.time()
    q = (
        plan.writeStream.format("noop")
        .option("checkpointLocation", os.path.join(root, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(1200)
    dt = time.time() - t0
    print(json.dumps({
        "which": WHICH, "buckets": BUCKETS, "sec": round(dt, 2),
        "events_per_sec": int(n_amp / dt), "n_events": n_amp,
    }))
    for p in q.recentProgress:
        so = p["stateOperators"][0] if p.get("stateOperators") else {}
        print(json.dumps({
            "batchId": p.get("batchId"),
            "numInputRows": p.get("numInputRows"),
            "durationMs": p.get("durationMs"),
            "state": {
                k: so.get(k)
                for k in (
                    "numRowsTotal", "numRowsUpdated", "numRowsRemoved",
                    "allUpdatesTimeMs", "allRemovalsTimeMs",
                    "commitTimeMs", "memoryUsedBytes", "numShufflePartitions",
                )
            },
        }))
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
