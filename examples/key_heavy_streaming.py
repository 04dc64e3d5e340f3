#!/usr/bin/env python3
"""Key-heavy streaming walkthrough: the two throughput levers for streams
with many active keys (README "Streaming operating envelope").

    python examples/key_heavy_streaming.py

Plays 200k events over 20k users through the same 3-step funnel pattern
three ways and prints the drain times:

1. per-key grouping, 4 micro-batches  — pays the fixed per-key-visit cost
   4x per key (the floor on key-heavy streams)
2. per-key grouping, 1 micro-batch    — trigger sizing amortizes it
3. bucketed grouping (pattern_key_buckets=256), 4 micro-batches — the
   visit cost is paid per BUCKET, so even the badly-sized trigger runs at
   the 1-batch speed

Semantics are identical in all three (PARITY.md deviation 18); only the
physical grouping and the backlog slicing change.
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_EVENTS = 200_000
N_KEYS = 20_000

CQL = (
    "partition with (user_id of events) begin "
    "from every v = events[event_type == 'view'] "
    "  -> k = events[event_type == 'click'] "
    "  -> p = events[event_type == 'purchase'] within 1 hour "
    "select v.user_id as user_id, p.event_id as purchase_id "
    "insert into Out; end"
)


def main() -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from flink_siddhi_spark import SiddhiCEP

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="keyheavy_")
    src = os.path.join(root, "in")
    per = N_EVENTS // 4
    for b in range(4):  # 4 files = 4 potential micro-batches
        (
            spark.range(b * per, (b + 1) * per)
            .select(
                F.col("id").alias("event_id"),
                (F.col("id") % N_KEYS).alias("user_id"),
                F.when(F.col("id") % 3 == 0, F.lit("view"))
                .when(F.col("id") % 3 == 1, F.lit("click"))
                .otherwise(F.lit("purchase")).alias("event_type"),
                (F.lit(1_700_000_000_000) + F.col("id") * 10).alias("ts_ms"),
            )
            .coalesce(1)
            .write.mode("append").parquet(src)
        )
    schema = spark.read.parquet(src).schema

    def drain(tag, one_batch, buckets):
        reader = spark.readStream.format("parquet").schema(schema)
        if not one_batch:
            reader = reader.option("maxFilesPerTrigger", 1)
        cep = SiddhiCEP(spark, pattern_key_buckets=buckets)
        cep.register_stream(
            "events", reader.load(src), "event_id", "user_id",
            "event_type", "ts_ms", ts_field="ts_ms",
        )
        plan = cep.from_("events").cql(CQL).returns("Out")
        t0 = time.time()
        q = (
            plan.writeStream.format("noop")
            .option("checkpointLocation", os.path.join(root, f"ck_{tag}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        dt = time.time() - t0
        print(f"{tag:28s} {dt:6.1f}s  {int(N_EVENTS / dt):>8,} ev/s  "
              f"({len(q.recentProgress)} micro-batches)")

    try:
        print(f"{N_EVENTS:,} events / {N_KEYS:,} keys, 3-step funnel CQL:")
        drain("per-key, 4 batches", False, None)
        drain("per-key, 1 batch", True, None)
        drain("bucketed(256), 4 batches", False, 256)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
