"""Batch table sources for the driver's TPC-H-ish parquet testdata.

Spark 4 rejects parquet TIMESTAMP(NANOS) columns (events.ts) unless
``spark.sql.legacy.parquet.nanosAsLong`` is set; we set it and normalize the
nanos-long back to a proper TimestampType column so downstream plans use
native timestamp semantics (and pushdown still works — the conversion is a
projection on top of the scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def configure(spark: SparkSession) -> SparkSession:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # NTZ->timestamp casts (event-time normalization) use the session zone;
    # UTC keeps epoch-millis identical to DuckDB's epoch_ms on naive values.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


# Loaded-table memo: spark.read.parquet costs ~0.1s of driver time per call
# (file listing + footer schema read); a query suite touching 4 tables pays
# that 4x per query without this. DataFrames are immutable logical plans, so
# handing back the same object is safe. Keyed by the SparkSession OBJECT id —
# not applicationId, which newSession() shares, so two sessions of one app
# must not share plans (each plan binds its session's SQLConf). configure()
# runs before the lookup so session confs apply on cache hits too.
_TABLE_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    configure(spark)
    key = (id(spark), sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanos-since-epoch long -> TimestampType (micro precision). Integer
        # `div`, NOT `/1000`: epoch-nanos ≈ 1.7e18 exceeds double's 53-bit
        # mantissa, so float division is off by ±hundreds of ns and can flip
        # a millisecond at unix_millis truncation boundaries.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    _TABLE_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in TABLE_NAMES}
