"""Streaming sources/sinks.

Parity targets (SURVEY.md §2.B sources/sinks):
- reference random generator sources (RandomEventSource.java:47-66) ->
  ``rate_events`` (rate source + column synthesis, F1 schema)
- in-memory/bounded test source (SiddhiCEPITCase.java:95-102) ->
  ``file_stream`` over a temp parquet dir with Trigger.AvailableNow
- text-file sink (writeAsText) -> ``to_files``; memory sink -> ``to_memory``
- Kafka source/sink (experimental/CEPPipeline.scala:50-77) -> thin wrappers
  (gated: no broker in this environment)
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


_RETAIN_CONF = "spark.sql.streaming.minBatchesToRetain"


def apply_state_retention_default(
    spark: SparkSession, min_batches_to_retain: Optional[int] = 2
) -> None:
    """Set ``spark.sql.streaming.minBatchesToRetain`` before a stateful query
    starts (round 10, VERDICT r9 ask #4).

    Spark's default of 100 keeps ~100 on-heap versions of EVERY state-store
    map; on long stateful drains that version pileup degrades throughput 4.4x
    (measured: a second 10M-event NFA drain runs 295.0k ev/s at ``=2`` vs
    67.0k at the default — SCALE.md §Round-9 "state-store retention"). 2 is
    the smallest value that still allows one-batch failure replay. The repo's
    sink entry points (``make_sink_fn``, ``to_memory``, ``to_files``,
    ``kafka_sink``) apply this automatically; pass
    ``min_batches_to_retain=None`` there to leave the session conf untouched
    (your own ``spark.conf.set`` then governs), or an int to pick another
    retention depth."""
    if min_batches_to_retain is None:
        return
    spark.conf.set(_RETAIN_CONF, str(min_batches_to_retain))


def rate_events(spark: SparkSession, rows_per_second: int = 100, id_mod: int = 50,
                name: str = "test_event") -> DataFrame:
    """Streaming F1-schema event source: (id, name, price, timestamp).

    Mirrors RandomEventSource (id = n % 50, constant name, random price,
    1-per-tick timestamps) on top of Spark's rate source."""
    rate = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    return rate.select(
        (F.col("value") % id_mod).cast("int").alias("id"),
        F.lit(name).alias("name"),
        F.rand(seed=42).alias("price"),
        F.unix_millis(F.col("timestamp")).alias("timestamp"),
        F.col("timestamp").alias("event_time"),
    )


def trigger_stream(spark: SparkSession, period_ms: int) -> DataFrame:
    """`define trigger T at every <t>` -> streaming tick source with schema
    ``(triggered_time long)`` (epoch ms). Rate source scaled to one row per
    period (sub-second periods emit rowsPerSecond > 1)."""
    rows_per_second = max(1, round(1000 / period_ms)) if period_ms < 1000 else 1
    rate = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    ticks = rate
    if period_ms > 1000:
        ticks = rate.filter((F.col("value") % (period_ms // 1000)) == 0)
    return ticks.select(F.unix_millis(F.col("timestamp")).alias("triggered_time"))


def file_stream(spark: SparkSession, path: str, schema: T.StructType,
                fmt: str = "parquet",
                max_files_per_trigger: Optional[int] = None,
                max_bytes_per_trigger: Optional[str] = None,
                path_glob: Optional[str] = None) -> DataFrame:
    """Bounded replayable test source: stream files from a directory.

    ``max_files_per_trigger`` / ``max_bytes_per_trigger`` are the
    micro-batch SIZING knobs (round 9, VERDICT r8 ask #1a): stateful
    operators pay a fixed per-key cost per micro-batch VISIT, so a backlog
    drained in many small batches multiplies that cost by the batch count —
    the measured 10M chain3 drain runs 1.9x faster in one batch than four.
    Leave both unset to let availableNow drain the whole backlog in ONE
    batch (the throughput-optimal default for bounded replays); set them to
    bound per-batch memory on unbounded or very large backlogs. See README
    "operating envelope" for the rate table."""
    r = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if max_bytes_per_trigger is not None:
        r = r.option("maxBytesPerTrigger", str(max_bytes_per_trigger))
    if path_glob is not None:
        r = r.option("pathGlobFilter", path_glob)
    return r.load(path)


def to_memory(df: DataFrame, name: str, checkpoint: Optional[str] = None,
              output_mode: str = "append",
              min_batches_to_retain: Optional[int] = 2):
    """Memory sink (test/experimental parity: StreamInMemOutputHandler)."""
    apply_state_retention_default(df.sparkSession, min_batches_to_retain)
    w = df.writeStream.format("memory").queryName(name).outputMode(output_mode)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    return w.trigger(availableNow=True).start()


def to_files(df: DataFrame, path: str, checkpoint: str, fmt: str = "json",
             output_mode: str = "append",
             min_batches_to_retain: Optional[int] = 2):
    """File sink (reference writeAsText parity -> json/csv/parquet)."""
    apply_state_retention_default(df.sparkSession, min_batches_to_retain)
    return (
        df.writeStream.format(fmt)
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )


def encode_kafka_value(df: DataFrame) -> DataFrame:
    """Sink-side serde: one JSON object per row in a ``value`` column —
    exactly what the Kafka writer ships. Factored out of ``kafka_sink`` so
    the serde round-trips in tests without a broker."""
    return df.select(F.to_json(F.struct(*df.columns)).alias("value"))


def decode_kafka_value(df: DataFrame, value_schema: Optional[str] = None) -> DataFrame:
    """Source-side serde: project a Kafka record batch (binary ``value`` plus
    topic/partition/offset metadata) to typed columns via ``from_json``.
    Works on any DataFrame with a ``value`` column, so tests can feed it
    constructed Kafka-shaped records."""
    value = F.col("value").cast("string")
    if value_schema is not None:
        return df.select(F.from_json(value, value_schema).alias("v")).select("v.*")
    return df.select(value.alias("value"))


def kafka_source(spark: SparkSession, brokers: str, topic: str,
                 value_schema: Optional[str] = None) -> DataFrame:
    """Kafka JSON source (CEPPipeline.scala:50-56 parity). Requires the
    spark-sql-kafka package on the cluster; not available in this container —
    the serde half (``decode_kafka_value``) is broker-independent and tested."""
    df = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .load()
    )
    return decode_kafka_value(df, value_schema)


def kafka_sink(df: DataFrame, brokers: str, topic: str, checkpoint: str,
               min_batches_to_retain: Optional[int] = 2):
    """Kafka sink (CEPPipeline.scala:58-77 parity)."""
    apply_state_retention_default(df.sparkSession, min_batches_to_retain)
    return (
        encode_kafka_value(df).writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )
