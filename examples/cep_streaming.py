#!/usr/bin/env python3
"""Streaming CEP walkthrough: the reference's production shape
(stream in -> SiddhiQL plan -> stream out), on Structured Streaming.

    python examples/cep_streaming.py

Plays a deterministic event file through a micro-batched stream and runs
THREE plans over it — a partitioned followed-by pattern, a tumbling-window
aggregation, and a filter chain — exactly as they'd run in batch mode (one
engine definition, both modes).
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVENTS = [
    # (id, user, type, value, ts-ms) — user 1 errors then purchases (match);
    # user 2 errors with no purchase (no match)
    (1, 1, "error", 0.0, 1_000),
    (2, 2, "error", 0.0, 2_000),
    (3, 1, "view", 5.0, 3_000),
    (4, 1, "purchase", 99.0, 4_000),
    (5, 2, "view", 1.0, 5_000),
    (6, 1, "purchase", 150.0, 65_000),
]
SCHEMA = "event_id long, user_id long, event_type string, value double, ts long"


def main() -> int:
    from pyspark.sql import SparkSession

    from flink_siddhi_spark import SiddhiCEP
    from flink_siddhi_spark.sources.streams import to_memory

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("cep-streaming-example")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "events")
        # two files -> two micro-batches (the pattern spans the boundary)
        spark.createDataFrame(EVENTS[:3], SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(src)
        spark.createDataFrame(EVENTS[3:], SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        stream = (
            spark.readStream.format("parquet").schema(SCHEMA)
            .option("maxFilesPerTrigger", 1).load(src)
        )

        cep = SiddhiCEP(spark)
        cep.register_stream(
            "events", stream, "event_id", "user_id", "event_type", "value", "ts",
            ts_field="ts",
        )
        # cql() sees the streaming-registered source and compiles on the
        # StreamingPlanner automatically — same plan text as batch mode
        plans = {
            "pattern (error -> purchase per user, within 1 min)": (
                "partition with (user_id of events) begin "
                "from every e = events[event_type == 'error'] "
                "  -> p = events[event_type == 'purchase'] within 1 min "
                "select e.user_id as user_id, p.event_id as purchase_id "
                "insert into Out; end"
            ),
            "tumbling 30s revenue": (
                "from events#window.timeBatch(30 sec) "
                "select sum(value) as revenue, count() as n insert into Out"
            ),
            "filter chain": (
                "from events[event_type == 'purchase' and value > 100.0] "
                "select event_id, value insert into Out"
            ),
        }
        for i, (title, cql) in enumerate(plans.items()):
            df = cep.from_("events").cql(cql).returns("Out")
            name = f"out_{i}"
            sq = to_memory(df, name, checkpoint=os.path.join(tmp, f"ck_{name}"))
            sq.awaitTermination(60)
            rows = spark.sql(f"SELECT * FROM {name}").collect()
            print(f"\n== {title}")
            for r in rows:
                print("  ", tuple(r))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
