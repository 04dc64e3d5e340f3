"""Kafka serde round-trip without a broker.

The broker-bound halves of kafka_source/kafka_sink are thin writeStream
wiring; everything that can corrupt data — the JSON encode on the sink side
and the binary-value decode + schema projection on the source side — is
exercised here against constructed Kafka-record-shaped DataFrames
(value binary + topic/partition/offset/timestamp metadata), which is exactly
the shape the real Kafka reader produces."""

from pyspark.sql import functions as F

from flink_siddhi_spark.sources.streams import decode_kafka_value, encode_kafka_value

SCHEMA = "id INT, name STRING, price DOUBLE, timestamp BIGINT"


def _events(spark):
    return spark.createDataFrame(
        [(1, "a", 10.5, 1000), (2, "b", None, 2000), (3, "naïve ünïcode", -0.25, 3000)],
        SCHEMA.lower().replace(",", ","),
    )


def _as_kafka_records(encoded):
    """Dress an encoded value column as a full Kafka record batch."""
    return encoded.select(
        F.lit(None).cast("binary").alias("key"),
        F.encode(F.col("value"), "UTF-8").alias("value"),
        F.lit("events").alias("topic"),
        F.lit(0).alias("partition"),
        F.monotonically_increasing_id().alias("offset"),
        F.current_timestamp().alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )


def test_round_trip_preserves_rows_and_types(spark):
    df = _events(spark)
    records = _as_kafka_records(encode_kafka_value(df))
    decoded = decode_kafka_value(records, SCHEMA)
    assert [f.simpleString() for f in decoded.schema.fields] == [
        f.simpleString() for f in df.schema.fields
    ]
    assert sorted(map(tuple, decoded.collect())) == sorted(map(tuple, df.collect()))


def test_round_trip_null_and_unicode_values(spark):
    decoded = decode_kafka_value(_as_kafka_records(encode_kafka_value(_events(spark))), SCHEMA)
    rows = {r.id: r for r in decoded.collect()}
    assert rows[2].price is None  # null survives the JSON hop
    assert rows[3].name == "naïve ünïcode"  # utf-8 binary value decodes intact


def test_decode_without_schema_passes_raw_value(spark):
    records = _as_kafka_records(encode_kafka_value(_events(spark)))
    raw = decode_kafka_value(records)
    assert raw.columns == ["value"]
    assert all(v.value.startswith('{"id":') for v in raw.collect())


def test_malformed_value_yields_nulls_not_errors(spark):
    bad = spark.createDataFrame([("not json",), ('{"id": "x"}',)], "value string")
    out = decode_kafka_value(bad, SCHEMA).collect()
    assert len(out) == 2
    assert all(r.id is None for r in out)  # from_json PERMISSIVE, no crash
