#!/usr/bin/env python3
"""Event-log analytics tour over the events table — the relational
companions of the CQL/CEP surface, composed from flink_siddhi_spark.analytics.
Each report is one DataFrame; the shapes are the ones that survive a
1000-executor deployment (single user-keyed exchanges, broadcast-back stats,
TakeOrdered tops — no global sorts, no self-joins).

    python examples/event_analytics.py [sf_dir]
"""

import os
import sys

from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_siddhi_spark.analytics import (  # noqa: E402
    cooccurrence_lift,
    funnel,
    last_touch_attribution,
    rfm_segments,
    sessionize,
    topk_paths,
)
from flink_siddhi_spark.sources.tables import load_table  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("event-analytics-tour")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    events = load_table(spark, sf_dir, "events")

    print("== sessions (30-min gap) ==")
    sessionize(events).orderBy("user_id", "session_id").show(5)

    print("== conversion funnel view -> click -> purchase ==")
    funnel(events, ["view", "click", "purchase"]).show()

    print("== top event paths (depth 3) ==")
    topk_paths(events).show(5, truncate=False)

    print("== RFM segments (best customers first) ==")
    rfm_segments(events).orderBy("segment", ascending=False).show(5)

    print("== event-type affinity (lift) ==")
    cooccurrence_lift(events).orderBy("lift", ascending=False).show(5)

    print("== last-touch attribution (first 5 conversions) ==")
    last_touch_attribution(events).orderBy("conversion_id").show(5)

    spark.stop()


if __name__ == "__main__":
    main()
