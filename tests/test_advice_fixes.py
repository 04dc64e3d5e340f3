"""Regression tests for the round-1 advisor findings (ADVICE.md round 1):

1. 'A -> not B for t -> C' armed the absence deadline from epoch 0 instead of
   the last captured event's timestamp (pattern.py _LAST_TS bug).
2. Streaming patterns re-emitted matches after out-of-order inserts / buffer
   eviction (running-count dedup -> content-hash dedup).
3. Mid-pattern 'every' silently parsed as plain '->'.
4. lengthBatch(n) with `group by` chunked per key instead of globally.
5. externalTime join windows silently compared __ts when the declared
   attribute differed from ts_field.
"""

import pytest

from flink_siddhi_spark import SiddhiCEP
from flink_siddhi_spark.errors import UnsupportedFeatureException


def make_events(spark, rows):
    return spark.createDataFrame(rows, "id int, name string, price double, timestamp long")


@pytest.fixture()
def cep(spark):
    return SiddhiCEP(spark)


def _absence_query(cep):
    return cep.from_("s").cql(
        "from a = s[id == 1] -> not s[id == 2] for 1 sec -> c = s[id == 3] "
        "select a.name as an, c.name as cn insert into Out"
    ).returns("Out")


def test_absence_blocked_by_b_within_deadline(cep, spark):
    # B occurs 500ms after A (inside the 1s absence window) -> NO match,
    # even though C follows. The old bug armed the deadline at 0+1000ms, so
    # every event "exceeded" it and absence was confirmed immediately.
    rows = [(1, "a", 1.0, 1000), (2, "b", 1.0, 1500), (3, "c", 1.0, 2500)]
    cep.define("s", make_events(spark, rows), "id", "name", "price", "timestamp", ts_field="timestamp")
    assert _absence_query(cep).count() == 0


def test_absence_confirmed_when_b_never_comes(cep, spark):
    rows = [(1, "a", 1.0, 1000), (3, "c", 1.0, 2500)]
    cep.define("s", make_events(spark, rows), "id", "name", "price", "timestamp", ts_field="timestamp")
    out = _absence_query(cep)
    assert [(r.an, r.cn) for r in out.collect()] == [("a", "c")]


def test_absence_confirmed_when_b_arrives_late(cep, spark):
    # B at +1500ms is PAST the 1s absence window -> match completes on C
    rows = [(1, "a", 1.0, 1000), (2, "b", 1.0, 2500), (3, "c", 1.0, 3000)]
    cep.define("s", make_events(spark, rows), "id", "name", "price", "timestamp", ts_field="timestamp")
    out = _absence_query(cep)
    assert [(r.an, r.cn) for r in out.collect()] == [("a", "c")]


def test_streaming_trailing_absence(spark, tmp_path):
    # streaming 'every A -> not B for t': the first A is followed by a B
    # within t (blocked); the second A's absence is confirmed by a later
    # event past the deadline. Old bug: both As emitted immediately.
    from flink_siddhi_spark.sources.streams import file_stream
    from flink_siddhi_spark.streaming.runtime import StreamingPlanner
    from tests.test_streaming import EVENT_SCHEMA, run_stream, write_events

    rows = [
        (2, "a", 1.0, 1000), (9, "x", 1.0, 1500),
        (2, "c", 1.0, 3000), (5, "z", 1.0, 4500),
    ]
    path = write_events(spark, tmp_path / "in_abs", rows)
    cep = SiddhiCEP(spark)
    stream = file_stream(spark, path, EVENT_SCHEMA)
    cep.register_stream("s", stream, "id", "name", "price", "timestamp", ts_field="timestamp")
    planner = StreamingPlanner(cep.catalog, cep.extensions)
    out = run_stream(
        cep, planner,
        "from every a = s[id == 2] -> not s[id == 9] for 1 sec "
        "select a.name as an insert into Out",
        "Out", "m_abs", tmp_path,
    )
    assert sorted(r.an for r in out.collect()) == ["c"]


def test_mid_pattern_every_suffix_restart(cep, spark):
    # round-3: 'a -> every b' is now SUPPORTED (suffix restart): the first
    # a-match pairs with EVERY later b, not just the first.
    rows = [
        (1, "a", 1.0, 1000), (2, "b", 1.0, 2000), (3, "b", 1.0, 3000),
        (1, "a", 1.0, 4000), (2, "b", 1.0, 5000),
    ]
    cep.define("s", make_events(spark, rows), "id", "name", "price", "timestamp", ts_field="timestamp")
    out = cep.from_("s").cql(
        "from a = s[id == 1] -> every b = s[id == 2] "
        "select a.timestamp as at, b.timestamp as bt insert into Out"
    ).returns("Out")
    # first a (ts=1000) pairs with every id==2 event after it: 2000, 5000
    assert sorted((r.at, r.bt) for r in out.collect()) == [(1000, 2000), (1000, 5000)]


def test_mid_pattern_every_restrictions(cep, spark):
    rows = [(1, "a", 1.0, 1000), (2, "b", 1.0, 2000)]
    cep.define("s", make_events(spark, rows), "id", "name", "price", "timestamp", ts_field="timestamp")
    # strict ',' before 'every' contradicts suffix restart
    with pytest.raises(UnsupportedFeatureException, match="mid-pattern 'every'"):
        cep.from_("s").cql(
            "from a = s[id == 1] , every b = s[id == 2] "
            "select a.name as an insert into Out"
        )
    # 'every not' unsupported
    with pytest.raises(UnsupportedFeatureException, match="every not"):
        cep.from_("s").cql(
            "from a = s[id == 1] -> every not s[id == 9] for 1 sec "
            "select a.name as an insert into Out"
        )
    # quantified prefix step before the mark is ambiguous -> rejected
    with pytest.raises(UnsupportedFeatureException, match="plain single"):
        cep.from_("s").cql(
            "from a = s[id == 1]+ -> every b = s[id == 2] "
            "select b.name as bn insert into Out"
        ).returns("Out")


def test_length_batch_chunks_globally_with_group_by(cep, spark):
    # Siddhi buffers n events GLOBALLY; group-by aggregates per key WITHIN
    # each global chunk. 6 events, lengthBatch(2), users interleaved:
    # chunks {1,2} {3,4} {5,6} -> (u1,10),(u2,20),(u1,70),(u2,110).
    # The old per-key chunking gave (u1,40),(u1,40),(u2,70),(u2,60).
    rows = [
        (1, "u1", 10.0, 1000), (2, "u2", 20.0, 2000), (3, "u1", 30.0, 3000),
        (4, "u1", 40.0, 4000), (5, "u2", 50.0, 5000), (6, "u2", 60.0, 6000),
    ]
    cep.define("s", make_events(spark, rows), "id", "name", "price", "timestamp", ts_field="timestamp")
    out = cep.from_("s").cql(
        "from s#window.lengthBatch(2) select name, sum(price) as total "
        "group by name insert into Out"
    ).returns("Out")
    got = sorted((r.name, r.total) for r in out.collect())
    assert got == [("u1", 10.0), ("u1", 70.0), ("u2", 20.0), ("u2", 110.0)]


def test_external_time_join_attr_mismatch_rejected(cep, spark):
    rows = [(1, "a", 1.0, 1000)]
    cep.define("s1", make_events(spark, rows), "id", "name", "price", "timestamp", ts_field="timestamp")
    cep.register_stream("s2", make_events(spark, rows), "id", "name", "price", "timestamp", ts_field="timestamp")
    with pytest.raises(UnsupportedFeatureException, match="externalTime"):
        cep.from_("s1").cql(
            "from s1#window.time(1 sec) as a "
            "join s2#window.externalTime(price, 1 sec) as b on a.id == b.id "
            "select a.name as an insert into Out"
        ).returns("Out")


def test_global_order_warning(cep, spark):
    # verdict item 9: un-keyed global-order queries warn at compile time
    rows = [(1, "a", 1.0, 1000), (2, "b", 2.0, 2000)]
    cep.define("s", make_events(spark, rows), "id", "name", "price", "timestamp", ts_field="timestamp")
    with pytest.warns(RuntimeWarning, match="single-task global ordering"):
        cep.from_("s").cql(
            "from s#window.length(2) select id, sum(price) as t insert into Out"
        ).returns("Out")
    with pytest.warns(RuntimeWarning, match="single-task global ordering"):
        cep.from_("s").cql(
            "from a = s[id == 1] -> b = s[id == 2] select a.name as an insert into Out"
        ).returns("Out")
    # keyed variants stay silent
    import warnings as W

    with W.catch_warnings():
        W.simplefilter("error", RuntimeWarning)
        cep.from_("s").cql(
            "from s#window.length(2) select id, sum(price) as t group by name insert into Out"
        ).returns("Out")


def test_mid_pattern_every_with_trailing_absence(cep, spark):
    # composition: 'a -> every b -> not c for t' — each b-restart arms its
    # own absence deadline from ITS b event.
    rows = [
        (1, "a", 1.0, 1000),
        (2, "b", 1.0, 2000),   # b1: c at 2500 inside 1s deadline -> killed
        (9, "c", 1.0, 2500),
        (2, "b", 1.0, 4000),   # b2: no c within (4000, 5000] -> absence holds
        (9, "c", 1.0, 6000),
    ]
    cep.define("s", make_events(spark, rows), "id", "name", "price", "timestamp", ts_field="timestamp")
    out = cep.from_("s").cql(
        "from a = s[id == 1] -> every b = s[id == 2] -> not s[id == 9] for 1 sec "
        "select b.timestamp as bt insert into Out"
    ).returns("Out")
    assert sorted(r.bt for r in out.collect()) == [4000]
