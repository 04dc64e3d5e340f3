"""State-store retention default (round 10, VERDICT r9 ask #4).

Spark's ``spark.sql.streaming.minBatchesToRetain`` default of 100 keeps ~100
on-heap versions of every state map; SCALE.md §Round-9 measured a 4.4x
throughput loss on a second 10M stateful drain (295.0k vs 67.0k ev/s). The
public sink entry points therefore apply ``=2`` automatically, with ``None``
as the documented opt-out.
"""

import pyspark.sql.types as T

from flink_siddhi_spark.sources.streams import (
    _RETAIN_CONF,
    apply_state_retention_default,
    file_stream,
    to_memory,
)
from flink_siddhi_spark.streaming.query_manager import make_sink_fn


def test_apply_default_and_opt_out(spark):
    spark.conf.set(_RETAIN_CONF, "100")
    apply_state_retention_default(spark)
    assert spark.conf.get(_RETAIN_CONF) == "2"
    spark.conf.set(_RETAIN_CONF, "77")
    apply_state_retention_default(spark, None)  # opt-out: leave untouched
    assert spark.conf.get(_RETAIN_CONF) == "77"
    apply_state_retention_default(spark, 5)  # explicit depth
    assert spark.conf.get(_RETAIN_CONF) == "5"
    spark.conf.unset(_RETAIN_CONF)


def _feed(spark, tmp_path, name="feed"):
    pdf_dir = str(tmp_path / name)
    schema = T.StructType([T.StructField("v", T.LongType())])
    spark.createDataFrame([(1,), (2,)], schema).write.parquet(pdf_dir)
    return file_stream(spark, pdf_dir, schema)


def test_to_memory_sets_retention(spark, tmp_path):
    spark.conf.set(_RETAIN_CONF, "100")
    q = to_memory(_feed(spark, tmp_path), "m_retain",
                  checkpoint=str(tmp_path / "ck"))
    try:
        q.awaitTermination(60)
    finally:
        q.stop()
    assert spark.conf.get(_RETAIN_CONF) == "2"
    spark.conf.unset(_RETAIN_CONF)


def test_make_sink_fn_sets_retention(spark, tmp_path):
    spark.conf.set(_RETAIN_CONF, "100")
    sink = make_sink_fn("noop", checkpoint_root=str(tmp_path / "ckr"))
    q = sink("q1", _feed(spark, tmp_path))
    try:
        q.awaitTermination(60)
    finally:
        q.stop()
    assert spark.conf.get(_RETAIN_CONF) == "2"
    # opt-out variant leaves the session conf alone
    spark.conf.set(_RETAIN_CONF, "42")
    sink_keep = make_sink_fn(
        "noop", checkpoint_root=str(tmp_path / "ckr2"),
        min_batches_to_retain=None,
    )
    q2 = sink_keep("q2", _feed(spark, tmp_path, name="feed2"))
    try:
        q2.awaitTermination(60)
    finally:
        q2.stop()
    assert spark.conf.get(_RETAIN_CONF) == "42"
    spark.conf.unset(_RETAIN_CONF)
