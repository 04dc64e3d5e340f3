"""Bucketed-table storage helpers: pre-shuffle once at write time, join/agg
shuffle-free forever after.

At 100 TB the dominant cost of repeated joins/aggregations on the same key
(doc_id, user_id, content hash) is re-shuffling the fact table every query.
Spark's bucketed tables persist data pre-hash-partitioned (and optionally
pre-sorted) by the key: a join between two tables bucketed on the join key
with the same bucket count needs NO Exchange on either side, and a groupBy
on the bucket key aggregates in place. This is the storage-layout leg of
the engine's scale story (the reference has no storage layer at all — its
keyed state is re-partitioned per job; here the layout survives jobs).

Contract notes:
- bucket counts must match across join sides (Spark requires it to elide
  the shuffle); pick a power of two sized so each bucket is a few hundred
  MB at target scale.
- ``sort_by`` the join key too so bucket files are internally sorted (read
  locality; note Spark 4 no longer propagates bucket sort order into the
  plan, so SortMergeJoin still does a cheap LOCAL sort — the win being
  asserted is the absent Exchange, i.e. no network shuffle).
- bucketed writes go through ``saveAsTable`` (the bucketing metadata lives
  in the catalog); pass ``path`` to keep the files in an external location.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    keys: Sequence[str],
    buckets: int,
    sort_by: Optional[Sequence[str]] = None,
    path: Optional[str] = None,
    fmt: str = "parquet",
) -> DataFrame:
    """Persist ``df`` as a bucketed (+ optionally sorted) table and return
    the re-read DataFrame whose scan carries the bucketing layout."""
    if buckets <= 0:
        raise ValueError(f"write_bucketed: buckets ({buckets}) must be > 0")
    from pyspark.sql import functions as F

    # one writer task per bucket -> one file per bucket: Spark only trusts
    # (and elides the runtime Sort for) sorted buckets made of a single
    # file. repartition uses the same hash as bucket assignment, so each
    # task holds exactly its bucket's rows.
    df = df.repartition(buckets, *[F.col(k) for k in keys])
    w = df.write.mode("overwrite").format(fmt).bucketBy(buckets, *keys)
    if sort_by:
        w = w.sortBy(*sort_by)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)
    return df.sparkSession.table(name)


def is_bucketed_on(spark: SparkSession, name: str, keys: Sequence[str]) -> bool:
    """True if catalog table ``name`` is bucketed exactly on ``keys``."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
    info = {r.col_name: r.data_type for r in rows}
    cols = info.get("Bucket Columns", "")
    want = "[" + ", ".join(f"`{k}`" for k in keys) + "]"
    return cols == want


def write_partitioned(
    df: DataFrame,
    path: str,
    by: Sequence[str],
    fmt: str = "parquet",
) -> DataFrame:
    """Persist ``df`` partitioned by the given columns (hive-style
    directories) and return the re-read DataFrame. The complement of
    bucketing: bucketing kills the JOIN shuffle, directory partitioning
    kills the SCAN — a filter on a partition column prunes whole
    directories before any I/O (``PartitionFilters`` in the scan node,
    asserted in tests/test_bucketed.py). Partition by low-cardinality
    columns queries filter on (ingest date, source, language); high
    cardinality makes millions of tiny directories — use bucketing for
    those keys instead."""
    df.write.mode("overwrite").format(fmt).partitionBy(*by).save(path)
    return df.sparkSession.read.format(fmt).load(path)
