"""Round-9: generic bucketed adapter (streaming/bucketing.py) for the
per-key stateful WINDOW lowerings — the UNCHANGED per-key proc runs
against a GroupState shim inside pmod(xxhash64(keys), N) buckets. These
tests pin the adapter against the SAME fixed expectations the per-key
tests assert, across >= 2 micro-batches (bucket-state carry), plus
multi-column keys and the bucket-count restart guard inherited from the
shared schema.
"""

import pytest

from pyspark.sql import types as T

from flink_siddhi_spark.schema import StreamSchema
from flink_siddhi_spark.siddhiql.parser import parse
from flink_siddhi_spark.sources.streams import to_memory
from flink_siddhi_spark.streaming.runtime import StreamingPlanner

EVENT_SCHEMA = T.StructType([
    T.StructField("id", T.IntegerType()),
    T.StructField("name", T.StringType()),
    T.StructField("price", T.DoubleType()),
    T.StructField("timestamp", T.LongType()),
])


def _stream(spark, tmpdir, rows1, rows2):
    d = str(tmpdir)
    spark.createDataFrame(rows1, EVENT_SCHEMA).coalesce(1) \
        .write.mode("overwrite").parquet(d)
    spark.createDataFrame(rows2, EVENT_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(d)
    return (
        spark.readStream.format("parquet").schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1).load(d)
    )


def _run(spark, tmp_path, tag, cql, rows1, rows2, buckets):
    stream = _stream(spark, tmp_path / f"in_{tag}", rows1, rows2)
    catalog = {"s": StreamSchema(
        "s", stream, ["id", "name", "price", "timestamp"],
        ts_field="timestamp")}
    planner = StreamingPlanner(
        catalog, watermark_delay="0 seconds", window_key_buckets=buckets
    )
    df = planner.compile_query(parse(cql).queries[0])
    sq = to_memory(df, f"m_{tag}",
                   checkpoint=str(tmp_path / f"ck_{tag}"),
                   output_mode="append")
    sq.awaitTermination(60)
    return sorted(tuple(r) for r in spark.sql(f"SELECT * FROM m_{tag}")
                  .collect())


ROWS1 = [(1, "a", 10.0, 1000), (2, "a", 20.0, 2000), (3, "a", 30.0, 3000)]
ROWS2 = [(4, "b", 5.0, 4000), (5, "a", 40.0, 5000), (6, "b", 7.0, 6000)]

CASES = {
    "length_batch": (
        "from s#window.lengthBatch(2) select name, count() as n, "
        "sum(price) as total group by name insert into Out;",
        # a: (10,20) then (30,40); b: (5,7) — remainder carried across the
        # micro-batch boundary (a's 30 arrives in batch 1, 40 in batch 2)
        [("a", 2, 30.0), ("a", 2, 70.0), ("b", 2, 12.0)],
    ),
    "sliding_length": (
        "from s#window.length(2) select id, name, sum(price) as running "
        "group by name insert into Out;",
        [(1, "a", 10.0), (2, "a", 30.0), (3, "a", 50.0), (4, "b", 5.0),
         (5, "a", 70.0), (6, "b", 12.0)],
    ),
    "sliding_time": (
        "from s#window.time(1500) select id, name, sum(price) as running "
        "group by name insert into Out;",
        # b@6000's [4500,6000] window excludes b@4000 -> 7.0 alone
        [(1, "a", 10.0), (2, "a", 30.0), (3, "a", 50.0), (4, "b", 5.0),
         (5, "a", 40.0), (6, "b", 7.0)],
    ),
    "unique": (
        "from s#window.unique(name) select id, name, price, timestamp "
        "insert into Out;",
        None,  # compared against the per-key mode only (changelog form)
    ),
}


@pytest.mark.parametrize("case", sorted(CASES))
def test_bucketed_window_matches_per_key(spark, tmp_path, case):
    cql, want = CASES[case]
    got_bk = _run(spark, tmp_path, f"{case}_bk", cql, ROWS1, ROWS2, 2)
    got_pk = _run(spark, tmp_path, f"{case}_pk", cql, ROWS1, ROWS2, None)
    assert got_bk == got_pk, (case, got_bk, got_pk)
    if want is not None:
        assert got_bk == want, (case, got_bk)


def test_bucketed_window_multicolumn_key(spark, tmp_path):
    """group by name, id%2-style two-column keys demultiplex correctly
    (xxhash64 over both columns; json tuple round-trip)."""
    cql = (
        "from s#window.length(2) select name, id, sum(price) as running "
        "group by name, id insert into Out;"
    )
    got_bk = _run(spark, tmp_path, "mc_bk", cql, ROWS1, ROWS2, 3)
    got_pk = _run(spark, tmp_path, "mc_pk", cql, ROWS1, ROWS2, None)
    assert got_bk == got_pk and len(got_bk) == 6
