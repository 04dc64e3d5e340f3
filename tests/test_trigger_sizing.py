"""Round-9 trigger/batch sizing contract (VERDICT r8 ask #1a).

Stateful streaming operators pay a fixed cost per key per micro-batch
VISIT (~280us measured: Arrow group slice + GroupState proto round-trip),
so draining the same backlog in k micro-batches multiplies that cost by k.
These tests pin the two documented levers on a key-heavy drain:

1. trigger sizing — one availableNow batch beats four (file source left
   unsized vs maxFilesPerTrigger=1), and
2. bucketed key grouping (``pattern_key_buckets``) — removes the cliff
   entirely by paying the visit cost per BUCKET, so even the 4-batch drain
   beats the per-key 4-batch drain.

The ratios asserted are structural (3x fewer key-visits / ~64x fewer
group visits), far above box noise; the probe-scale numbers live in
SCALE.md §Round-9 and bench.py's streaming section.
"""

import os
import shutil
import tempfile
import time

from pyspark.sql import functions as F

from flink_siddhi_spark import SiddhiCEP
import pytest

# long randomized fuzz suite: slow tier (round 11, VERDICT r10 item 3)
pytestmark = pytest.mark.slow

N_KEYS = 15_000
N_EVENTS = 60_000
N_FILES = 4

CQL = (
    "partition with (user_id of e) begin "
    "from every a = e[kind == 'error'] -> b = e[kind == 'purchase'] "
    "within 1 hour "
    "select a.user_id as user_id, b.event_id as purchase_id "
    "insert into Out; end"
)


def _gen(spark, root):
    src = os.path.join(root, "in")
    per = N_EVENTS // N_FILES
    for f in range(N_FILES):
        (
            spark.range(f * per, (f + 1) * per)
            .select(
                F.col("id").alias("event_id"),
                (F.col("id") % N_KEYS).alias("user_id"),
                F.when(F.col("id") % 4 == 0, F.lit("error"))
                .when(F.col("id") % 4 == 2, F.lit("purchase"))
                .otherwise(F.lit("view")).alias("kind"),
                (F.lit(1_700_000_000_000) + F.col("id") * 10).alias("ts_ms"),
            )
            .coalesce(1)
            .write.mode("append").parquet(src)
        )
    return src


def _drain(spark, src, schema, root, tag, one_batch, buckets):
    reader = spark.readStream.format("parquet").schema(schema)
    if not one_batch:
        reader = reader.option("maxFilesPerTrigger", 1)
    cep = SiddhiCEP(spark, pattern_key_buckets=buckets)
    cep.register_stream(
        "e", reader.load(src), "event_id", "user_id", "kind", "ts_ms",
        ts_field="ts_ms",
    )
    plan = cep.from_("e").cql(CQL).returns("Out")
    t0 = time.time()
    q = (
        plan.writeStream.format("noop")
        .option("checkpointLocation", os.path.join(root, f"ck_{tag}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    dt = time.time() - t0
    batches = len(q.recentProgress)
    return dt, batches


def test_trigger_sizing_and_bucketing_amortize_key_visits(spark):
    root = tempfile.mkdtemp(prefix="trigsz_")
    try:
        src = _gen(spark, root)
        schema = spark.read.parquet(src).schema
        t4, b4 = _drain(spark, src, schema, root, "pk4", False, None)
        t1, b1 = _drain(spark, src, schema, root, "pk1", True, None)
        tb4, bb4 = _drain(spark, src, schema, root, "bkt4", False, 256)
        assert b4 == 4 and b1 == 1 and bb4 == 4, (b4, b1, bb4)
        # structural, not a timing flake: 4 batches = 4x the per-key visits
        assert t1 < t4 / 1.3, (t1, t4)
        # bucketed grouping removes the cliff: 4-batch bucketed beats
        # 4-batch per-key despite identical trigger sizing
        assert tb4 < t4 / 1.5, (tb4, t4)
    finally:
        shutil.rmtree(root, ignore_errors=True)
