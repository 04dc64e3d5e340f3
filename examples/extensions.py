#!/usr/bin/env python3
"""All four Siddhi extension kinds on one stream — scalar function,
attribute aggregator, window processor, and stream processor — registered
with one call each and usable directly from SiddhiQL text.

    python examples/extensions.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from flink_siddhi_spark import SiddhiCEP

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("extensions-example")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    rows = [
        (1, "warn disk low", 4.0, 1_000),
        (2, "error io fail", 16.0, 7_000),
        (3, "warn net slow", 64.0, 13_000),
        (4, "ok all good", 256.0, 19_000),
    ]
    df = spark.createDataFrame(rows, "id int, msg string, value double, ts long")
    cep = SiddhiCEP(spark)
    cep.define("logs", df, "id", "msg", "value", "ts", ts_field="ts")

    # 1. scalar: custom:sq(x) = x*x (stays a JVM Column expression)
    cep.register_extension("custom:sq", lambda c: c * c)
    # 2. aggregator: custom:geomean(x) (usable wherever built-ins are)
    cep.register_extension(
        "custom:geomean",
        lambda c: F.exp(F.sum(F.log(c).cast("decimal(27,18)")).cast("double") / F.count(c)),
        aggregate=True,
    )
    # 3. window processor: custom:tenSec() tumbling bucket function
    cep.register_extension(
        "custom:tenSec", lambda ts: F.floor(ts / F.lit(10_000)), window=True
    )
    # 4. stream processor: str:tokenize(col) -> one row per word
    cep.register_extension(
        "str:tokenize",
        lambda d, col: d.withColumn("word", F.explode(F.split(F.col(col), " "))),
        stream_function=True,
    )

    print("scalar:", cep.from_("logs").cql(
        "from logs select id, custom:sq(value) as v2 insert into Out"
    ).returns("Out").collect())

    print("aggregator + window:", cep.from_("logs").cql(
        "from logs#window.custom:tenSec() "
        "select custom:geomean(value) as gm, count() as n insert into Out"
    ).returns("Out").collect())

    print("stream fn:", cep.from_("logs").cql(
        "from logs[value < 100.0]#str:tokenize(msg) "
        "select word, count() as n group by word having n > 1 insert into Out"
    ).returns("Out").collect())
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
