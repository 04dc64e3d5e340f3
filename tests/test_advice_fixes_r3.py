"""Round-3 ADVICE fixes:

1. Snapshot-window state serialized losslessly (pickle, not to_json): floats
   with >10 significant digits and sub-ms timestamps survive the cross-batch
   state round trip, so streaming snapshots equal the batch result exactly.
2. streaming_exact_dedup batch fallback keeps the min-id doc per hash
   (deterministic) instead of an arbitrary partition-order survivor.
3. chunk_documents validates size/stride.
4. Table-load memo keyed by SparkSession object, not applicationId
   (newSession() shares the applicationId but not the SQLConf).
"""

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_siddhi_spark import SiddhiCEP
from flink_siddhi_spark.streaming.runtime import StreamingPlanner

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("name", T.StringType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("timestamp", T.LongType()),
    ]
)


def _two_batch_stream(spark, tmpdir, rows1, rows2):
    d = str(tmpdir)
    spark.createDataFrame(rows1, EVENT_SCHEMA).coalesce(1).write.mode("overwrite").parquet(d)
    spark.createDataFrame(rows2, EVENT_SCHEMA).coalesce(1).write.mode("append").parquet(d)
    return (
        spark.readStream.format("parquet").schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1).load(d)
    )


def test_snapshot_state_full_float_precision(spark, tmp_path):
    """ADVICE r2 (medium): a price needing >10 significant digits must come
    back from restored state bit-exact — under the old to_json state blob
    (double_precision=10) the restored row diverged and the final snapshot
    broke the 'equals batch result' contract."""
    from flink_siddhi_spark.sources.streams import to_memory
    from flink_siddhi_spark.siddhiql.parser import parse

    precise = 0.1234567890123456  # 16 significant digits
    rows1 = [(1, "a", precise, 1000)]
    rows2 = [(2, "b", 999.0, 2000)]  # second batch forces a state round trip
    cep = SiddhiCEP(spark)
    stream = _two_batch_stream(spark, tmp_path / "in_prec", rows1, rows2)
    cep.register_stream("s", stream, "id", "name", "price", "timestamp",
                        ts_field="timestamp")
    planner = StreamingPlanner(cep.catalog, cep.extensions)
    q = parse(
        "from s#window.sort(2, price) select id, price insert into Out;"
    ).queries[0]
    sq = to_memory(planner.compile_query(q), "m_prec",
                   checkpoint=str(tmp_path / "ck_prec"), output_mode="append")
    sq.awaitTermination(60)
    out = spark.sql("SELECT * FROM m_prec").collect()
    snaps = {}
    for r in out:
        snaps.setdefault(r["__snapshot"], set()).add((r.id, r.price))
    # row 1 in the final snapshot passed through pickled state; bit-exact
    assert snaps[max(snaps)] == {(1, precise), (2, 999.0)}


def test_streaming_exact_dedup_batch_mode_deterministic(spark):
    """ADVICE r2 (low): in batch mode the survivor per content hash is the
    min-doc_id row, independent of partitioning."""
    from flink_siddhi_spark.llm.dedup import streaming_exact_dedup

    rows = [(7, "same text"), (3, "same text"), (5, "same text"), (9, "other")]
    for nparts in (1, 8):
        df = spark.createDataFrame(rows, "doc_id long, text string").repartition(nparts)
        got = {(r.doc_id, r.text) for r in streaming_exact_dedup(df).collect()}
        assert got == {(3, "same text"), (9, "other")}


def test_chunk_documents_validates_args(spark):
    """ADVICE r2 (low): stride > size silently skips words; reject it."""
    from flink_siddhi_spark.llm.pipeline import chunk_documents

    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(df, size=4, stride=8)
    with pytest.raises(ValueError, match="must be > 0"):
        chunk_documents(df, size=0, stride=1)
    with pytest.raises(ValueError, match="must be > 0"):
        chunk_documents(df, size=4, stride=0)
    # valid args still work
    assert chunk_documents(df, size=4, stride=2).count() >= 1


def test_table_cache_not_shared_across_newsession(spark):
    """ADVICE r2 (low): newSession() shares applicationId; the memo must not
    hand a sibling session the other session's plan, and configure() must
    run on cache hits so session confs apply."""
    from flink_siddhi_spark.sources import tables

    sf = "/root/testdata/sf0.001"
    df1 = tables.load_table(spark, sf, "region")
    df1b = tables.load_table(spark, sf, "region")
    assert df1 is df1b  # memo hit within one session
    s2 = spark.newSession()
    s2.conf.set("spark.sql.session.timeZone", "America/New_York")
    df2 = tables.load_table(s2, sf, "region")
    assert df2 is not df1  # sibling session gets its own plan
    # configure() ran for s2 (cache path included): tz reset to UTC
    assert s2.conf.get("spark.sql.session.timeZone") == "UTC"
    assert df2.count() == df1.count()


def test_embedding_dup_pairs_quadratic_guard(spark):
    """VERDICT r2 #8: bare all-pairs mode warns, and refuses large inputs
    unless explicitly overridden."""
    import flink_siddhi_spark.llm.dedup as D

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(4)], "vec_id long, embedding array<double>"
    )
    with pytest.warns(RuntimeWarning, match="O\\(n\\^2\\)"):
        assert D.embedding_dup_pairs(df, threshold=0.99).count() >= 0
    # force the refusal path without materializing 100k rows
    old = D.QUADRATIC_VERIFY_LIMIT
    D.QUADRATIC_VERIFY_LIMIT = 2
    try:
        with pytest.warns(RuntimeWarning):
            with pytest.raises(ValueError, match="allow_quadratic"):
                D.embedding_dup_pairs(df)
        with pytest.warns(RuntimeWarning):
            assert D.embedding_dup_pairs(df, allow_quadratic=True).count() >= 0
    finally:
        D.QUADRATIC_VERIFY_LIMIT = old


def test_calendar_cron_windows(spark):
    """VERDICT r2 #9: quartz calendar schedules (daily / weekly / monthly)
    lower to bucket functions; unsupported calendars still reject."""
    from flink_siddhi_spark import SiddhiCEP
    from flink_siddhi_spark.errors import UnsupportedFeatureException

    # Mon 2024-01-01: fires Mondays 09:30 UTC. Events Mon 09:00, Mon 10:00,
    # Tue, next-Mon 09:45 -> windows split at Mon 09:30 and next Mon 09:30.
    base = 1704067200000  # 2024-01-01 00:00:00 UTC (a Monday)
    rows = [
        (1, "a", 1.0, base + 9 * 3600_000),            # Mon 09:00 (before fire)
        (2, "a", 1.0, base + 10 * 3600_000),           # Mon 10:00
        (3, "a", 1.0, base + 30 * 3600_000),           # Tue 06:00
        (4, "a", 1.0, base + 7 * 86400_000 + 9 * 3600_000 + 45 * 60_000),  # next Mon 09:45
    ]
    cep = SiddhiCEP(spark)
    df = spark.createDataFrame(rows, "id int, name string, price double, timestamp long")
    cep.define("s", df, "id", "name", "price", "timestamp", ts_field="timestamp")
    out = cep.from_("s").cql(
        "from s#window.cron('0 30 9 ? * MON') select count() as n "
        "group by name insert into Out"
    ).returns("Out")
    # windows: [..Mon 09:30): id 1 | [Mon 09:30, next Mon 09:30): ids 2,3 | id 4
    assert sorted(r.n for r in out.collect()) == [1, 1, 2]

    # daily at 12:00
    out = cep.from_("s").cql(
        "from s#window.cron('0 0 12 * * ?') select count() as n "
        "group by name insert into Out"
    ).returns("Out")
    # splits: [.., Mon 12:00): ids 1,2 | [Mon 12:00, Tue 12:00): id 3 | id 4 alone
    assert sorted(r.n for r in out.collect()) == [1, 1, 2]

    # monthly on the 15th at 00:00 — all four events are before Jan 15: one window
    out = cep.from_("s").cql(
        "from s#window.cron('0 0 0 15 * ?') select count() as n "
        "group by name insert into Out"
    ).returns("Out")
    assert [r.n for r in out.collect()] == [4]

    # day-of-week LISTS became supported in round 3b (MON,WED splits the
    # week at both days); quartz specials still reject loudly
    out = cep.from_("s").cql(
        "from s#window.cron('0 30 9 ? * MON,WED') select count() as n "
        "group by name insert into Out"
    ).returns("Out")
    # fires Mon 09:30 / Wed 09:30: [..Mon 09:30): id1 | [Mon, Wed): ids 2,3
    # | [next Mon 09:30, ..): id 4
    assert sorted(r.n for r in out.collect()) == [1, 1, 2]
    # round-4: nth-weekday specials now lower (all four events precede the
    # 2nd-Friday 09:30 fire of Jan 2024 -> one bucket); month-restricted
    # weekly schedules still reject loudly
    out = cep.from_("s").cql(
        "from s#window.cron('0 30 9 ? * 6#2') select count() as n "
        "group by name insert into Out"
    ).returns("Out")
    assert [r.n for r in out.collect()] == [4]
    with pytest.raises(UnsupportedFeatureException, match="cron"):
        cep.from_("s").cql(
            "from s#window.cron('0 30 9 ? 3 MON') select count() as n "
            "group by name insert into Out"
        ).returns("Out")
    # round-4: day-of-month 31 supported with Quartz SKIP semantics —
    # all four January events share the Dec-31 fire bucket
    out = cep.from_("s").cql(
        "from s#window.cron('0 0 0 31 * ?') select count() as n "
        "group by name insert into Out"
    ).returns("Out")
    assert [r.n for r in out.collect()] == [4]
    # 29-31 + restricted month field = unbounded fire gap -> still rejects
    with pytest.raises(UnsupportedFeatureException, match="29-31"):
        cep.from_("s").cql(
            "from s#window.cron('0 0 0 29 2 ?') select count() as n "
            "group by name insert into Out"
        ).returns("Out")
