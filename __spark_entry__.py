"""Driver contract for the spark-graft builder (PySpark target).

Every operator inventoried in SURVEY.md §2 that is implemented gets a
``queries()`` entry (running through the real engine API — ``SiddhiCEP`` +
SiddhiQL ``cql`` — or the llm/ operator library) and, where ANSI-SQL can
express the same semantics, a DuckDB ``oracle_sql()`` entry. Column names and
value determinism (decimal-summed float aggregates, total orderings, rounded
cosines) are aligned between both sides — see tests/ for the same checks run
in CI fashion.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ORD = "event_id, user_id, event_type, value, props"  # deterministic total order tail


def _cep(spark: SparkSession, sf_dir: str):
    from flink_siddhi_spark import SiddhiCEP
    from flink_siddhi_spark.sources.tables import load_table

    cep = SiddhiCEP(spark)
    events = load_table(spark, sf_dir, "events")
    cep.register_stream(
        "events", events, "event_id", "ts", "user_id", "event_type", "value", "props",
        ts_field="ts",
    )
    return cep


def _cep_tpch(spark: SparkSession, sf_dir: str):
    from flink_siddhi_spark import SiddhiCEP
    from flink_siddhi_spark.sources.tables import load_table

    cep = SiddhiCEP(spark)
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cep.register_stream(
        "lineitem", lineitem, "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate", ts_field="l_shipdate",
    )
    cep.register_stream(
        "orders", orders, "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority", ts_field="o_orderdate",
    )
    cep.register_table(
        "customer", load_table(spark, sf_dir, "customer"),
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment",
    )
    cep.register_table(
        "nation", load_table(spark, sf_dir, "nation"), "n_nationkey", "n_name", "n_regionkey",
    )
    return cep


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_siddhi_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "documents")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_siddhi_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "embeddings")


# --------------------------------------------------------------------------
# engine-path queries (SiddhiQL via SiddhiCEP)
# --------------------------------------------------------------------------

def q_filter_projection(spark, sf_dir):
    return _cep(spark, sf_dir).from_("events").cql(
        "from events[value > 90.0 and event_type == 'purchase'] "
        "select event_id, user_id, value insert into Out"
    ).returns("Out")


def q_projection_expressions(spark, sf_dir):
    return _cep(spark, sf_dir).from_("events").cql(
        "from events select event_id, value * 2.0 + 1.0 as v2, "
        "ifThenElse(value > 50.0, 'hi', 'lo') as band, "
        "str:concat(event_type, '_x') as tag insert into Out"
    ).returns("Out")


def q_group_agg(spark, sf_dir):
    return _cep(spark, sf_dir).from_("events").cql(
        "from events select event_type, count() as n, sum(value) as total, "
        "avg(value) as mean, min(value) as lo, max(value) as hi "
        "group by event_type insert into Out"
    ).returns("Out")


def q_having_filter(spark, sf_dir):
    return _cep(spark, sf_dir).from_("events").cql(
        "from events select user_id, count() as n, sum(value) as total "
        "group by user_id having n > 30 insert into Out"
    ).returns("Out")


def q_order_limit(spark, sf_dir):
    return _cep(spark, sf_dir).from_("events").cql(
        "from events select user_id, sum(value) as total group by user_id "
        "order by total desc, user_id limit 10 insert into Out"
    ).returns("Out")


def q_distinct_count(spark, sf_dir):
    return _cep(spark, sf_dir).from_("events").cql(
        "from events select event_type, distinctCount(user_id) as users "
        "group by event_type insert into Out"
    ).returns("Out")


def q_stddev_agg(spark, sf_dir):
    return _cep(spark, sf_dir).from_("events").cql(
        "from events select event_type, stddev(value) as sd group by event_type "
        "insert into Out"
    ).returns("Out")


def q_window_time_batch(spark, sf_dir):
    return _cep(spark, sf_dir).from_("events").cql(
        "from events#window.timeBatch(1 hour) "
        "select windowStart() as w, event_type, count() as n, sum(value) as total "
        "group by event_type insert into Out"
    ).returns("Out")


def q_window_length_batch(spark, sf_dir):
    return _cep(spark, sf_dir).from_("events").cql(
        "from events#window.lengthBatch(20) "
        "select user_id, count() as n, sum(value) as total group by user_id "
        "insert into Out"
    ).returns("Out")


def q_window_session(spark, sf_dir):
    return _cep(spark, sf_dir).from_("events").cql(
        "from events#window.session(30 min) "
        "select user_id, count() as n, sum(value) as total group by user_id "
        "insert into Out"
    ).returns("Out")


def q_window_sliding_length(spark, sf_dir):
    return _cep(spark, sf_dir).from_("events").cql(
        "from events#window.length(10) "
        "select event_id, sum(value) as running group by user_id insert into Out"
    ).returns("Out")


def q_window_sort(spark, sf_dir):
    return _cep(spark, sf_dir).from_("events").cql(
        "from events#window.sort(100, value, 'desc') "
        "select event_id, value insert into Out"
    ).returns("Out")


def q_window_frequent(spark, sf_dir):
    return _cep(spark, sf_dir).from_("events").cql(
        "from events#window.frequent(3, event_type) "
        "select event_type, count() as n group by event_type insert into Out"
    ).returns("Out")


def q_window_unique(spark, sf_dir):
    return _cep(spark, sf_dir).from_("events").cql(
        "from events#window.unique(user_id) "
        "select user_id, event_id, value insert into Out"
    ).returns("Out")


def q_window_delay(spark, sf_dir):
    return _cep(spark, sf_dir).from_("events").cql(
        "from events#window.delay(60000) "
        "select event_id, eventTimestamp() as ets insert into Out"
    ).returns("Out")


def q_window_cron(spark, sf_dir):
    return _cep(spark, sf_dir).from_("events").cql(
        "from events#window.cron('0 */10 * * * ?') "
        "select event_type, count() as n group by event_type insert into Out"
    ).returns("Out")


def q_window_cron_calendar(spark, sf_dir):
    # calendar (quartz) cron schedule — weekly fire at 9:30 every Monday;
    # closes PARITY.md deviation 11 (was: */N periods only)
    return _cep(spark, sf_dir).from_("events").cql(
        "from events#window.cron('0 30 9 ? * MON') "
        "select event_type, count() as n group by event_type insert into Out"
    ).returns("Out")


def q_window_cron_weekdays(spark, sf_dir):
    # quartz day-of-week RANGE (MON-FRI at midnight): multi-day weekly
    # schedules lower to a 7-candidate bucket function — closes the
    # list/range part of PARITY.md deviation 11
    return _cep(spark, sf_dir).from_("events").cql(
        "from events#window.cron('0 0 0 ? * MON-FRI') "
        "select event_type, count() as n group by event_type insert into Out"
    ).returns("Out")


def q_window_cron_monthend(spark, sf_dir):
    # round-4: day-of-month list including 31 — Quartz SKIP semantics for
    # short months (operators/windows.py monthly lowering, try_make_timestamp
    # null-safe candidates); fires the 15th and 31st at midnight UTC
    return _cep(spark, sf_dir).from_("events").cql(
        "from events#window.cron('0 0 0 15,31 * ?') "
        "select event_type, count() as n group by event_type insert into Out"
    ).returns("Out")


def q_window_cron_lastfriday(spark, sf_dir):
    # round-4: quartz day-of-week special DL — last Friday of each month at
    # midnight UTC (operators/windows.py last_dow resolver)
    return _cep(spark, sf_dir).from_("events").cql(
        "from events#window.cron('0 0 0 ? * 6L') "
        "select event_type, count() as n group by event_type insert into Out"
    ).returns("Out")


def q_window_time_length(spark, sf_dir):
    return _cep(spark, sf_dir).from_("events").cql(
        "from events#window.timeLength(10 min, 10) "
        "select event_id, sum(value) as running group by user_id insert into Out"
    ).returns("Out")


def q_window_lossy_frequent(spark, sf_dir):
    return _cep(spark, sf_dir).from_("events").cql(
        "from events#window.lossyFrequent(0.0013, 0.0001, user_id, event_type) "
        "select event_id, user_id, event_type insert into Out"
    ).returns("Out")


def q_topk_per_group(spark, sf_dir):
    return _cep(spark, sf_dir).from_("events").cql(
        "partition with (event_type of events) begin "
        "from events#window.sort(5, value, 'desc') "
        "select event_type, event_id, value insert into Out; end"
    ).returns("Out")


def q_window_sliding_time(spark, sf_dir):
    return _cep(spark, sf_dir).from_("events").cql(
        "from events#window.time(10 min) "
        "select event_id, count() as n group by user_id insert into Out"
    ).returns("Out")


def q_join_time_time(spark, sf_dir):
    return _cep(spark, sf_dir).from_("events").cql(
        "from events[event_type == 'error']#window.time(10 min) as e "
        "join events[event_type == 'purchase']#window.time(10 min) as p "
        "on e.user_id == p.user_id "
        "select e.event_id as error_id, p.event_id as purchase_id insert into Out"
    ).returns("Out")


def q_join_length_time(spark, sf_dir):
    return _cep(spark, sf_dir).from_("events").cql(
        "from events[event_type == 'error']#window.length(5) as e "
        "join events[event_type == 'purchase']#window.time(5 min) as p "
        "on e.user_id == p.user_id "
        "select e.event_id as error_id, p.event_id as purchase_id insert into Out"
    ).returns("Out")


def q_join_left_outer(spark, sf_dir):
    return _cep(spark, sf_dir).from_("events").cql(
        "from events[event_type == 'signup']#window.time(30 sec) as s "
        "left outer join events[event_type == 'purchase']#window.time(30 sec) as p "
        "on s.user_id == p.user_id "
        "select s.event_id as signup_id, p.event_id as purchase_id insert into Out"
    ).returns("Out")


def q_join_full_outer(spark, sf_dir):
    return _cep(spark, sf_dir).from_("events").cql(
        "from events[event_type == 'signup']#window.time(30 sec) as s "
        "full outer join events[event_type == 'error']#window.time(30 sec) as e "
        "on s.user_id == e.user_id "
        "select s.event_id as signup_id, e.event_id as error_id insert into Out"
    ).returns("Out")


def q_window_external_time_batch(spark, sf_dir):
    return _cep(spark, sf_dir).from_("events").cql(
        "from events#window.externalTimeBatch(event_id, 1000) "
        "select event_type, count() as n, max(value) as hi "
        "group by event_type insert into Out"
    ).returns("Out")


def q_json_functions(spark, sf_dir):
    return _cep(spark, sf_dir).from_("events").cql(
        "from events[json:isExists(props, 'k')] "
        "select event_id, json:getInt(props, 'k') as k insert into Out"
    ).returns("Out")


def q_join_right_outer(spark, sf_dir):
    return _cep(spark, sf_dir).from_("events").cql(
        "from events[event_type == 'purchase']#window.time(30 sec) as p "
        "right outer join events[event_type == 'signup']#window.time(30 sec) as s "
        "on p.user_id == s.user_id "
        "select s.event_id as signup_id, p.event_id as purchase_id insert into Out"
    ).returns("Out")


def q_window_bucketed_stream(spark, sf_dir):
    """`#window.time(t)` through the STREAMING planner with
    `window_key_buckets=32` (round 10, VERDICT r9 ask #6): the generic
    bucketed adapter (streaming/bucketing.py) runs the unchanged per-key
    time-window proc for ~users/32 users per Arrow group. The events table
    is staged to a temp dir, drained availableNow through the bucketed
    lowering into a memory sink, and the per-event trailing-window count is
    oracle-checked against DuckDB's RANGE frame — the driver-visible
    correctness artifact for the bucketed window lowering (every other
    window entry runs the BATCH planner). (user_id, ts) is unique at every
    SF, so the per-arrival emission is order-deterministic."""
    import tempfile
    import uuid

    from flink_siddhi_spark.schema import StreamSchema
    from flink_siddhi_spark.siddhiql.parser import parse as _parse
    from flink_siddhi_spark.sources.streams import to_memory
    from flink_siddhi_spark.streaming.runtime import StreamingPlanner

    feed = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            "event_id", "user_id",
            F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
        )
    )
    d = tempfile.mkdtemp(prefix="wb_feed_")
    feed.coalesce(1).write.mode("overwrite").parquet(d)
    stream = spark.readStream.format("parquet").schema(feed.schema).load(d)
    catalog = {
        "E": StreamSchema(
            "E", stream, ["event_id", "user_id", "ts_ms"], ts_field="ts_ms"
        )
    }
    planner = StreamingPlanner(
        catalog, watermark_delay="0 seconds", window_key_buckets=32
    )
    df = planner.compile_query(_parse(
        "from E#window.time(300000) select event_id, user_id, "
        "count() as n_win group by user_id insert into Out;"
    ).queries[0])
    name = f"m_wbucket_{uuid.uuid4().hex[:8]}"
    q = to_memory(df, name, checkpoint=tempfile.mkdtemp(prefix="ck_wb_"))
    q.awaitTermination(300)
    return spark.sql(f"SELECT * FROM {name}")


def q_window_cron_family(spark, sf_dir):
    """Tagged union of the five cron-window variants (round-7 consolidation,
    VERDICT r6 ask #2): every-10-min, weekly calendar (MON 09:30), weekday
    list (MON-FRI), day-of-month list with Quartz short-month SKIP (15,31),
    and the last-Friday special (6L). One registry entry, one combined
    oracle; each variant stays individually asserted through its tag column
    (same lowerings, operators/windows.py:450-640)."""
    parts = [
        ("every10min", q_window_cron),
        ("calendar", q_window_cron_calendar),
        ("weekdays", q_window_cron_weekdays),
        ("monthend", q_window_cron_monthend),
        ("lastfriday", q_window_cron_lastfriday),
    ]
    out = None
    for tag, fn in parts:
        d = fn(spark, sf_dir).select(
            F.lit(tag).alias("variant"), "event_type", "n"
        )
        out = d if out is None else out.unionByName(d)
    return out


def q_join_outer_family(spark, sf_dir):
    """Tagged union of the three outer-join variants (round-7 consolidation):
    left (signup->purchase), right (purchase->signup probe side), full
    (signup<->error). Ids normalized to (a_id, b_id) so the branches union;
    the variant tag keeps each join kind individually oracle-asserted."""
    parts = [
        ("left", q_join_left_outer, "signup_id", "purchase_id"),
        ("right", q_join_right_outer, "signup_id", "purchase_id"),
        ("full", q_join_full_outer, "signup_id", "error_id"),
    ]
    out = None
    for tag, fn, a, b in parts:
        d = fn(spark, sf_dir).select(
            F.lit(tag).alias("variant"),
            F.col(a).alias("a_id"),
            F.col(b).alias("b_id"),
        )
        out = d if out is None else out.unionByName(d)
    return out


def q_join_windowed_family(spark, sf_dir):
    """Tagged union of the two windowed stream-stream join variants (round-7
    consolidation): time(10min) x time(10min) and length(5) x time(5min) —
    both emit (error_id, purchase_id) pairs keyed by user."""
    parts = [("time_time", q_join_time_time), ("length_time", q_join_length_time)]
    out = None
    for tag, fn in parts:
        d = fn(spark, sf_dir).select(
            F.lit(tag).alias("variant"), "error_id", "purchase_id"
        )
        out = d if out is None else out.unionByName(d)
    return out


def q_window_external_time(spark, sf_dir):
    return _cep(spark, sf_dir).from_("events").cql(
        "from events#window.externalTime(event_id, 500) "
        "select event_id, count() as n, min(value) as lo group by user_id "
        "insert into Out"
    ).returns("Out")


def q_forever_aggregates(spark, sf_dir):
    return _cep(spark, sf_dir).from_("events").cql(
        "from events select event_type, minForever(value) as lo, "
        "maxForever(value) as hi group by event_type insert into Out"
    ).returns("Out")


def q_order_limit_offset(spark, sf_dir):
    return _cep(spark, sf_dir).from_("events").cql(
        "from events select user_id, sum(value) as total group by user_id "
        "order by total desc, user_id limit 10 offset 5 insert into Out"
    ).returns("Out")


def q_join_stream_table(spark, sf_dir):
    return _cep_tpch(spark, sf_dir).from_("orders").cql(
        "from orders join customer on o_custkey == c_custkey "
        "select o_orderkey, c_name, c_mktsegment, o_totalprice insert into Out"
    ).returns("Out")


def q_join_theta(spark, sf_dir):
    return _cep_tpch(spark, sf_dir).from_("orders").cql(
        "from orders join customer on o_custkey == c_custkey and o_totalprice > c_acctbal "
        "select o_orderkey, c_name, o_totalprice, c_acctbal insert into Out"
    ).returns("Out")


def q_output_rate_last(spark, sf_dir):
    return _cep(spark, sf_dir).from_("events").cql(
        "from events select event_id output last every 100 events insert into Out"
    ).returns("Out")


def q_scalar_functions(spark, sf_dir):
    return _cep(spark, sf_dir).from_("events").cql(
        "from events select event_id, str:upper(event_type) as ty, "
        "str:split(props, ':', 1) as ptail, math:sqrt(value) as rt, "
        "time:date(eventTimestamp()) as d insert into Out"
    ).returns("Out")


_AGG_DEF = (
    "define aggregation EventAgg "
    "from events "
    "select event_type, count() as n, sum(value) as total "
    "group by event_type "
    "aggregate every sec...year;"
)


def q_incremental_agg_day(spark, sf_dir):
    return _cep(spark, sf_dir).from_("events").cql(
        _AGG_DEF +
        "from EventAgg per 'days' "
        "select AGG_TIMESTAMP, event_type, n, total insert into Out;"
    ).returns("Out")


def q_incremental_agg_within(spark, sf_dir):
    return _cep(spark, sf_dir).from_("events").cql(
        _AGG_DEF +
        "from EventAgg within '2024-01-01', '2024-01-08' per 'hours' "
        "select AGG_TIMESTAMP, event_type, n insert into Out;"
    ).returns("Out")


def q_table_upsert_last(spark, sf_dir):
    return _cep(spark, sf_dir).from_("events").cql(
        "define table Last (user_id long, v double);"
        "from events select user_id, value as v "
        "update or insert into Last on Last.user_id == user_id;"
    ).returns("Last")


def q_table_dml_delete(spark, sf_dir):
    return _cep(spark, sf_dir).from_("events").cql(
        "define table Last (user_id long, v double);"
        "from events select user_id, value as v "
        "update or insert into Last on Last.user_id == user_id;"
        "from events[event_type == 'error' and value > 99.0] delete Last on Last.user_id == user_id;"
    ).returns("Last")


def q_union_fan_in(spark, sf_dir):
    return _cep(spark, sf_dir).from_("events").cql(
        "from events[event_type == 'click'] select event_id, user_id insert into Out;"
        "from events[event_type == 'view'] select event_id, user_id insert into Out;"
    ).returns("Out")


def q_chained_queries(spark, sf_dir):
    return _cep(spark, sf_dir).from_("events").cql(
        "from events[value > 50.0] select event_id, user_id, value insert into Mid;"
        "from Mid[value > 90.0] select event_id, user_id insert into Out;"
    ).returns("Out")


def q_pattern_followed_by(spark, sf_dir):
    return _cep(spark, sf_dir).from_("events").cql(
        "partition with (user_id of events) begin "
        "from every s1 = events[event_type == 'error'] -> s2 = events[event_type == 'purchase'] "
        "select s1.user_id as user_id, s1.event_id as error_id, s2.event_id as purchase_id "
        "insert into Out; end"
    ).returns("Out")


def q_pattern_first_match(spark, sf_dir):
    return _cep(spark, sf_dir).from_("events").cql(
        "partition with (user_id of events) begin "
        "from s1 = events[event_type == 'error'] -> s2 = events[event_type == 'purchase'] "
        "select s1.user_id as user_id, s1.event_id as error_id, s2.event_id as purchase_id "
        "insert into Out; end"
    ).returns("Out")


def q_pattern_within(spark, sf_dir):
    return _cep(spark, sf_dir).from_("events").cql(
        "partition with (user_id of events) begin "
        "from every s1 = events[event_type == 'error'] -> s2 = events[event_type == 'purchase'] "
        "within 1 hour "
        "select s1.user_id as user_id, s1.event_id as error_id, s2.event_id as purchase_id "
        "insert into Out; end"
    ).returns("Out")


def q_pattern_mid_every(spark, sf_dir):
    # mid-pattern 'every' (Siddhi suffix restart): the first error per user
    # pairs with EVERY later purchase inside the hour, not just the first.
    return _cep(spark, sf_dir).from_("events").cql(
        "partition with (user_id of events) begin "
        "from s1 = events[event_type == 'error'] -> every s2 = events[event_type == 'purchase'] "
        "within 7 days "
        "select s1.user_id as user_id, s1.event_id as error_id, s2.event_id as purchase_id "
        "insert into Out; end"
    ).returns("Out")


def q_pattern_absence(spark, sf_dir):
    return _cep(spark, sf_dir).from_("events").cql(
        "partition with (user_id of events) begin "
        "from every s1 = events[event_type == 'error'] -> not events[event_type == 'click'] for 5 min "
        "select s1.user_id as user_id, s1.event_id as error_id insert into Out; end"
    ).returns("Out")


def q_sequence_strict(spark, sf_dir):
    return _cep(spark, sf_dir).from_("events").cql(
        "partition with (user_id of events) begin "
        "from every a = events[value > 95.0] , b = events[value > 95.0] "
        "select a.user_id as user_id, a.event_id as first_id, b.event_id as second_id "
        "insert into Out; end"
    ).returns("Out")


def q_sequence_first_attempt(spark, sf_dir):
    """Non-every strict sequence: arms ONCE at the first value>95 event per
    user; a match exists only when that event's IMMEDIATE successor is also
    value>95 (PARITY.md first-attempt contract — the round-7 property fuzz
    found the old fast path emitting the first SUCCESSFUL pair instead;
    this entry puts the fixed shape under the driver gate, VERDICT r7 ask
    #3). At sf0.01, 79 of 150 armed users discriminate the two semantics."""
    return _cep(spark, sf_dir).from_("events").cql(
        "partition with (user_id of events) begin "
        "from a = events[value > 95.0] , b = events[value > 95.0] "
        "select a.user_id as user_id, a.event_id as first_id, b.event_id as second_id "
        "insert into Out; end"
    ).returns("Out")


def q_sequence_family(spark, sf_dir):
    """Tagged union of the strict-sequence variants (round-8 consolidation,
    VERDICT r7 ask #3): the every form (re-arms per row) and the arm-once
    first-attempt form whose oracle asserts first-attempt-only semantics."""
    parts = [
        ("every_strict", q_sequence_strict),
        ("first_attempt", q_sequence_first_attempt),
    ]
    out = None
    for tag, fn in parts:
        d = fn(spark, sf_dir).select(
            F.lit(tag).alias("variant"), "user_id", "first_id", "second_id"
        )
        out = d if out is None else out.unionByName(d)
    return out


def q_sequence_quantifier(spark, sf_dir):
    # greedy '+' runs + strict breaker = gaps-and-islands in the oracle
    return _cep(spark, sf_dir).from_("events").cql(
        "partition with (user_id of events) begin "
        "from every a = events[value > 90.0]+ , b = events[value <= 90.0] "
        "select a.user_id as user_id, a[0].event_id as first_high, b.event_id as breaker "
        "insert into Out; end"
    ).returns("Out")


def q_sequence_quant_chain(spark, sf_dir):
    # late round 10: quantified INTERIOR stage in a relaxed every-chain —
    # dispatches the run_kernel_chain_quant kernel (operators/pattern.py).
    # Greedy <1:2>: the first click after each view is always captured, the
    # second iff it precedes the completing purchase; the purchase that
    # completes is the first one after the FIRST click (min reached at 1).
    return _cep(spark, sf_dir).from_("events").cql(
        "partition with (user_id of events) begin "
        "from every a = events[event_type == 'view'] "
        "-> b = events[event_type == 'click']<1:2> "
        "-> c = events[event_type == 'purchase'] within 4 days "
        "select a.user_id as user_id, a.event_id as view_id, "
        "b[0].event_id as click1, b[1].event_id as click2, "
        "c.event_id as purchase_id "
        "insert into Out; end"
    ).returns("Out")


def q_tpch_q1_pricing(spark, sf_dir):
    return _cep_tpch(spark, sf_dir).from_("lineitem").cql(
        "from lineitem[l_shipdate <= '1998-09-02 00:00:00'] "
        "select l_returnflag, l_linestatus, sum(l_quantity) as sum_qty, "
        "sum(l_extendedprice) as sum_base_price, "
        "sum(l_extendedprice * (1.0 - l_discount)) as sum_disc_price, "
        "sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)) as sum_charge, "
        "avg(l_quantity) as avg_qty, avg(l_extendedprice) as avg_price, "
        "avg(l_discount) as avg_disc, count() as count_order "
        "group by l_returnflag, l_linestatus insert into Out"
    ).returns("Out")


def q_tpch_q3_shipping(spark, sf_dir):
    return _cep_tpch(spark, sf_dir).from_("orders").cql(
        "from orders[o_orderdate < '1997-06-01 00:00:00'] "
        "join customer[c_mktsegment == 'BUILDING'] on o_custkey == c_custkey "
        "select o_orderkey, o_orderpriority insert into CO;"
        "from lineitem[l_shipdate > '1997-06-01 00:00:00'] "
        "join CO on l_orderkey == o_orderkey "
        "select l_orderkey, sum(l_extendedprice * (1.0 - l_discount)) as revenue, "
        "o_orderpriority "
        "group by l_orderkey, o_orderpriority "
        "order by revenue desc, l_orderkey limit 10 insert into Out;"
    ).returns("Out")


def q_tpch_q6_forecast(spark, sf_dir):
    # TPC-H Q6 (forecasting revenue change): pure filter + ungrouped sum —
    # the pushdown showcase (every predicate reaches the parquet scan).
    return _cep_tpch(spark, sf_dir).from_("lineitem").cql(
        "from lineitem[l_shipdate >= '1997-01-01 00:00:00' "
        "and l_shipdate < '1998-01-01 00:00:00' "
        "and l_discount >= 0.05 and l_discount <= 0.07 and l_quantity < 24.0] "
        "select sum(l_extendedprice * l_discount) as revenue, count() as n "
        "insert into Out"
    ).returns("Out")


def q_tpch_q12ish_priority(spark, sf_dir):
    # TPC-H Q12 shape (shipping-mode priority split): join + conditional
    # aggregation via ifThenElse inside sum().
    return _cep_tpch(spark, sf_dir).from_("lineitem").cql(
        "from lineitem[l_shipdate >= '1997-01-01 00:00:00'] "
        "join orders on l_orderkey == o_orderkey "
        "select l_returnflag, "
        "sum(ifThenElse(o_orderpriority == '1-URGENT' or o_orderpriority == '2-HIGH', 1, 0)) "
        "as high_line_count, "
        "sum(ifThenElse(o_orderpriority != '1-URGENT' and o_orderpriority != '2-HIGH', 1, 0)) "
        "as low_line_count, count() as n "
        "group by l_returnflag insert into Out"
    ).returns("Out")


def q_tpch_q5ish_revenue(spark, sf_dir):
    return _cep_tpch(spark, sf_dir).from_("orders").cql(
        "from orders join customer on o_custkey == c_custkey "
        "select o_orderkey, c_nationkey insert into OC;"
        "from lineitem join OC on l_orderkey == o_orderkey "
        "select c_nationkey, l_extendedprice, l_discount insert into OL;"
        "from OL join nation on c_nationkey == n_nationkey "
        "select n_name, sum(l_extendedprice * (1.0 - l_discount)) as revenue "
        "group by n_name insert into Out;"
    ).returns("Out")


# --------------------------------------------------------------------------
# LLM-pipeline operators (llm/ library)
# --------------------------------------------------------------------------

def q_dedup_exact(spark, sf_dir):
    from flink_siddhi_spark.llm.dedup import exact_dedup_groups

    return exact_dedup_groups(_docs(spark, sf_dir))


def q_dedup_ngram_jaccard(spark, sf_dir):
    from flink_siddhi_spark.llm.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.8)


def q_dedup_minhash_sig(spark, sf_dir):
    from flink_siddhi_spark.llm.dedup import minhash_signatures

    return minhash_signatures(_docs(spark, sf_dir), num_hashes=8)


def q_dedup_minhash_lsh(spark, sf_dir):
    from flink_siddhi_spark.llm.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_docs(spark, sf_dir), num_hashes=8, bands=4, threshold=0.5)


def q_dedup_simhash(spark, sf_dir):
    from flink_siddhi_spark.llm.dedup import simhash

    return simhash(_docs(spark, sf_dir), bits=16)


def q_dedup_embedding(spark, sf_dir):
    from flink_siddhi_spark.llm.dedup import embedding_dup_pairs

    return embedding_dup_pairs(_embs(spark, sf_dir), threshold=0.4)


def q_dedup_fuzzy_keep(spark, sf_dir):
    # round-4: the one-call fuzzy corpus dedup users actually run —
    # LSH pairs -> connected components -> keep min-id representative
    from flink_siddhi_spark.llm.dedup import fuzzy_dedup_keep

    return fuzzy_dedup_keep(_docs(spark, sf_dir)).select("doc_id")


def q_pipeline_cdc_chunks(spark, sf_dir):
    # round-4: content-defined chunking (rolling-hash boundaries) — chunk
    # alignment survives word insertions, unlike fixed-stride chunking
    from flink_siddhi_spark.llm.pipeline import cdc_chunk_documents

    return cdc_chunk_documents(_docs(spark, sf_dir), window=4, avg_size=16)


def q_dedup_clusters(spark, sf_dir):
    from flink_siddhi_spark.llm.dedup import dedup_clusters, minhash_lsh_pairs

    return dedup_clusters(minhash_lsh_pairs(_docs(spark, sf_dir)))


def q_dedup_embedding_verified(spark, sf_dir):
    # the 100 TB shape: sign-LSH bucket candidates -> exact-cosine verify on
    # candidate pairs only (hash equi-joins, codegen'd unrolled dot — no
    # full-corpus BroadcastNestedLoopJoin)
    from flink_siddhi_spark.llm.dedup import embedding_candidates_sign, embedding_dup_pairs

    embs = _embs(spark, sf_dir)
    cand = embedding_candidates_sign(embs, planes=8)
    return embedding_dup_pairs(embs, threshold=0.4, candidates=cand, dim=64)


def q_custom_udaf(spark, sf_dir):
    # attribute-aggregator extension (reference: SiddhiCEP.java:201-206 +
    # CustomPlusFunctionExtension.java:38-116 prove the extension path; this
    # mirrors it with a custom AGGREGATE): geometric mean via decimal-summed
    # logs (deterministic across engines)
    cep = _cep(spark, sf_dir)
    cep.register_extension(
        "custom:geomean",
        lambda c: F.exp(
            F.sum(F.log(c).cast("decimal(27,18)")).cast("double") / F.count(c)
        ),
        aggregate=True,
    )
    return cep.from_("events").cql(
        "from events[value > 0.0] select event_type, custom:geomean(value) as gm "
        "group by event_type insert into Out"
    ).returns("Out")


def q_pipeline_sample(spark, sf_dir):
    from flink_siddhi_spark.llm.pipeline import sample_hash

    return sample_hash(
        _docs(spark, sf_dir), rate=0.75, strata={"en": 0.25}, stratum_col="lang"
    ).select("doc_id", "lang", "source")


def q_pipeline_split(spark, sf_dir):
    from flink_siddhi_spark.llm.pipeline import train_split

    return train_split(_docs(spark, sf_dir)).select("doc_id", "lang", "split")


def q_pipeline_domain_quota(spark, sf_dir):
    from flink_siddhi_spark.llm.pipeline import domain_quota

    return domain_quota(_docs(spark, sf_dir), quota=10).select("doc_id", "source", "qrank")


def q_pipeline_contamination(spark, sf_dir):
    from flink_siddhi_spark.llm.pipeline import contamination_ngram

    docs = _docs(spark, sf_dir)
    benchmark = docs.filter(F.col("source") == "src0")
    corpus = docs.filter(F.col("source") != "src0")
    return contamination_ngram(corpus, benchmark, n=3)


def q_pipeline_pack(spark, sf_dir):
    from flink_siddhi_spark.llm.pipeline import pack_sequences

    return pack_sequences(_docs(spark, sf_dir), budget=512)


def q_pipeline_chunk_dedup(spark, sf_dir):
    from flink_siddhi_spark.llm.pipeline import chunk_dedup

    return chunk_dedup(_docs(spark, sf_dir), k=8)


def q_pipeline_shuffle(spark, sf_dir):
    from flink_siddhi_spark.llm.pipeline import training_order

    return training_order(_docs(spark, sf_dir)).select("doc_id", "shuffle_key", "pos")


def q_text_repetition(spark, sf_dir):
    from flink_siddhi_spark.llm.text import repetition_ratio

    return repetition_ratio(_docs(spark, sf_dir)).select(
        "doc_id", "n_words", "dup_word_ratio", "dup_2gram_ratio"
    )


def q_text_boilerplate_ngrams(spark, sf_dir):
    from flink_siddhi_spark.llm.text import corpus_ngram_stats

    return corpus_ngram_stats(_docs(spark, sf_dir), n=3, top_k=50, min_docs=2)


def q_dedup_simhash_hamming(spark, sf_dir):
    from flink_siddhi_spark.llm.dedup import simhash_hamming_pairs

    return simhash_hamming_pairs(_docs(spark, sf_dir), bits=16, max_hamming=2)


def q_pipeline_weighted_sample(spark, sf_dir):
    from flink_siddhi_spark.llm.pipeline import weighted_sample

    docs = _docs(spark, sf_dir)
    w = F.least(F.lit(1.0), F.size(F.split(F.col("text"), " ")) / F.lit(100.0))
    return weighted_sample(docs.withColumn("w", w), "w", rate=0.8).select(
        "doc_id", F.round("w", 6).alias("w")
    )


def q_pipeline_chunk_overlap(spark, sf_dir):
    from flink_siddhi_spark.llm.pipeline import chunk_documents

    return chunk_documents(_docs(spark, sf_dir), size=16, stride=8)


def q_text_tfidf_top_terms(spark, sf_dir):
    from flink_siddhi_spark.llm.text import tfidf_top_terms

    return tfidf_top_terms(_docs(spark, sf_dir), k=5)


def q_text_lm_score(spark, sf_dir):
    from flink_siddhi_spark.llm.text import unigram_lm_score

    return unigram_lm_score(_docs(spark, sf_dir))


def q_pipeline_novelty(spark, sf_dir):
    from flink_siddhi_spark.llm.pipeline import novel_documents

    docs = _docs(spark, sf_dir)
    seen = docs.filter(F.col("source") == "src0")
    return novel_documents(docs.filter(F.col("source") != "src0"), seen).select(
        "doc_id", "source"
    )


def q_text_source_stats(spark, sf_dir):
    from flink_siddhi_spark.llm.text import corpus_source_stats

    return corpus_source_stats(_docs(spark, sf_dir))


def q_pipeline_curate(spark, sf_dir):
    from flink_siddhi_spark.llm.pipeline import curate

    return curate(_docs(spark, sf_dir), min_quality=0.4, sample_rate=0.5).select(
        "doc_id", "source", "quality"
    )


def q_dedup_containment(spark, sf_dir):
    from flink_siddhi_spark.llm.dedup import ngram_containment_pairs

    return ngram_containment_pairs(_docs(spark, sf_dir), threshold=0.6)


def q_text_pii_scrub(spark, sf_dir):
    from flink_siddhi_spark.llm.text import pii_scrub

    return pii_scrub(_docs(spark, sf_dir)).select("doc_id", "scrubbed", "n_redactions")


def q_ann_cosine_topk(spark, sf_dir):
    from flink_siddhi_spark.llm.similarity import cosine_topk

    embs = _embs(spark, sf_dir)
    queries = embs.filter(F.col("vec_id") < 10)
    return cosine_topk(embs, queries, k=5)


def q_ann_range_search(spark, sf_dir):
    # round-5: fixed-similarity radius search — one streamed corpus pass
    # against broadcast queries, no shuffle, threshold filter in the scan
    from flink_siddhi_spark.llm.similarity import range_search

    embs = _embs(spark, sf_dir)
    queries = embs.filter(F.col("vec_id") < 10)
    return range_search(embs, queries, threshold=0.35)


def q_text_entropy(spark, sf_dir):
    # round-5: per-doc word-distribution entropy (quality/repetition signal)
    from flink_siddhi_spark.llm.text import word_entropy

    return word_entropy(_docs(spark, sf_dir))


def q_ann_knn_graph(spark, sf_dir):
    # round-5: exact self-kNN graph — numpy bulk scorer (one mapInPandas
    # corpus pass against the broadcast query matrix, per-dimension fold
    # for bit parity with the JVM dot and the oracle); the IVF-bucketed
    # knn_graph mode is the beyond-broadcast-ceiling scale path
    from flink_siddhi_spark.llm.similarity import knn_graph

    return knn_graph(_embs(spark, sf_dir), k=3)


def q_text_readability(spark, sf_dir):
    # round-5: LIX readability — syllable-free, so exactly reproducible
    # across engines; pure codegen over one scan
    from flink_siddhi_spark.llm.text import readability

    return readability(_docs(spark, sf_dir))


def q_events_sessionize(spark, sf_dir):
    # round-5 late: relational gap sessionization (30 min) — one exchange on
    # the user key; the closing (user, session) groupBy reuses it
    from flink_siddhi_spark.analytics import sessionize
    from flink_siddhi_spark.sources.tables import load_table

    return sessionize(load_table(spark, sf_dir, "events"))


def q_events_retention(spark, sf_dir):
    # round-5 late: cohort-retention matrix — event log collapses to
    # distinct (user, day) first; everything after runs on user-day scale
    from flink_siddhi_spark.analytics import retention_cohorts
    from flink_siddhi_spark.sources.tables import load_table

    return retention_cohorts(load_table(spark, sf_dir, "events"))


def q_pipeline_mixture_weights(spark, sf_dir):
    # round-5 late: domain-mixture rebalancing weights (uniform token
    # target) — one source-key hash aggregate, arithmetic on |sources| rows
    from flink_siddhi_spark.llm.pipeline import mixture_weights

    return mixture_weights(_docs(spark, sf_dir))


def q_text_zipf(spark, sf_dir):
    # round-5 late: corpus rank-frequency (Zipf) table — word hash-agg +
    # TakeOrderedAndProject; only top_n rows leave the aggregation
    from flink_siddhi_spark.llm.text import zipf_table

    return zipf_table(_docs(spark, sf_dir))


def q_events_funnel(spark, sf_dir):
    # round-5 late: ordered conversion funnel (signup -> view -> click ->
    # purchase within 24h of signup) — filter-then-ONE-user-keyed-aggregate;
    # the sequential min-chain is codegen array algebra, nothing event-scale
    # leaves stage one
    from flink_siddhi_spark.analytics import funnel
    from flink_siddhi_spark.sources.tables import load_table

    return funnel(
        load_table(spark, sf_dir, "events"),
        ["signup", "view", "click", "purchase"],
        within_ms=86_400_000,
    )


def q_events_active_rolling(spark, sf_dir):
    # round-5 late: DAU + trailing-7-day active users — distinct (user, day)
    # first, then a bounded x7 day fan-out + hash count-distinct; avoids the
    # BNL range join Spark would plan for d BETWEEN d-6 AND d
    from flink_siddhi_spark.analytics import rolling_active_users
    from flink_siddhi_spark.sources.tables import load_table

    return rolling_active_users(load_table(spark, sf_dir, "events"))


def q_events_interval_join(spark, sf_dir):
    # round-5 late: bucketed interval join — error events land in their
    # containing session's [start_ms, end_ms] via a (user, time-bucket)
    # EQUI-join (each point has exactly one bucket, so no dedup stage);
    # the naive BETWEEN formulation would be a nested-loop product
    from flink_siddhi_spark.analytics import interval_join, sessionize
    from flink_siddhi_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    sessions = sessionize(events)
    errors = events.filter(F.col("event_type") == "error").select(
        "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ms"),
        F.col("event_id").alias("err_id"),
    )
    return (
        interval_join(
            sessions, errors, "start_ms", "end_ms", "ms", keys=["user_id"]
        )
        .groupBy("user_id", "session_id", "start_ms", "n_events")
        .agg(F.count(F.lit(1)).alias("n_errors"))
    )


def q_events_zscore(spark, sf_dir):
    # round-5 late: per-type z-score outliers — k-row decimal-summed stats
    # broadcast back onto the event scan; the event side never shuffles
    from flink_siddhi_spark.analytics import zscore_anomalies
    from flink_siddhi_spark.sources.tables import load_table

    return zscore_anomalies(load_table(spark, sf_dir, "events"), threshold=2.0)


def q_ann_pq_topk(spark, sf_dir):
    # round-5 wave 5: product-quantized ADC top-k — approximate but
    # DETERMINISTIC (seeded codebook, round-6 argmin, id tiebreaks) so the
    # DuckDB oracle replays codes, reconstructions, and ranks exactly
    from flink_siddhi_spark.llm.similarity import pq_topk

    embs = _embs(spark, sf_dir)
    queries = embs.filter(F.col("vec_id") < 10)
    return pq_topk(embs, queries, m=8, n_codes=16, k=5)


def q_ann_pq_trained_topk(spark, sf_dir):
    # round-6 (VERDICT r5 ask #4): PQ top-k on per-subspace k-means TRAINED
    # codebooks — the production recall path (seed16 capped recall at ~0.24
    # on the 4-cluster synthetic; trained-256 reaches 1.0). Training is
    # deterministic end-to-end (id-seeded init, round-6 argmin assignment,
    # exact DECIMAL(38,12) sums, HALF_UP integer-unit means, fixed
    # iterations) so the DuckDB oracle replays the ENTIRE training loop as
    # unrolled CTEs — the repo's second iterative oracle-gated operator
    # after text_textrank.
    from flink_siddhi_spark.llm.similarity import pq_topk

    embs = _embs(spark, sf_dir)
    queries = embs.filter(F.col("vec_id") < 10)
    return pq_topk(
        embs, queries, m=8, n_codes=32, k=5,
        codebook="trained", train_iters=2,
    )


def q_ann_kmeans_clusters(spark, sf_dir):
    # round-6: semantic clustering — textbook Lloyd k-means (squared-L2)
    # as the degenerate m=1 case of the PQ subspace trainer, so the SAME
    # deterministic contract and the SAME unrolled-CTE oracle replay the
    # full training + assignment. The pipeline op this feeds is
    # cluster-balanced sampling / per-cluster dedup at corpus scale:
    # (vec_id, centroid_id) with k=8, 3 fixed iterations.
    from flink_siddhi_spark.llm.similarity import pq_encode, pq_train_codebook

    embs = _embs(spark, sf_dir)
    cb = pq_train_codebook(embs, m=1, n_codes=8, n_iter=3)
    return pq_encode(embs, m=1, codebook=cb).select(
        "vec_id", F.col("codes")[0].alias("centroid_id")
    )


def q_ann_ivfsq_topk(spark, sf_dir):
    # round-6: IVF-SQ — the composed-index family is now IVF x {raw, PQ,
    # SQ}: coarse bucket pruning over int8 scalar-quantized reconstructions
    # (4x compression, higher fidelity than PQ's 32x). The DuckDB oracle
    # composes the SQ reconstruction chain under the SAME shared IVF
    # probing CTEs the IVF-PQ oracle uses.
    from flink_siddhi_spark.llm.similarity import ivfsq_topk

    embs = _embs(spark, sf_dir)
    queries = embs.filter(F.col("vec_id") < 10)
    return ivfsq_topk(embs, queries, k=5)


def q_ann_ivfpq_residual(spark, sf_dir):
    # round-6: residual IVF-PQ oracle-gated end-to-end — coarse m=1 Lloyd,
    # residual m=8 PQ (both trained under the determinism contract), the
    # double-add-narrow reconstruction, and seed-centroid IVF probing all
    # replayed by one composed DuckDB oracle. The recall winner at equal
    # code budget on clustered data (0.45 vs 0.31, tests).
    from flink_siddhi_spark.llm.similarity import ivfpq_topk

    embs = _embs(spark, sf_dir)
    queries = embs.filter(F.col("vec_id") < 10)
    return ivfpq_topk(
        embs, queries, n_centroids=8, n_probe=2, m=8, n_codes=32, k=5,
        residual=True, train_iters=2,
    )


def q_pipeline_cluster_balanced(spark, sf_dir):
    # round-6: cluster-balanced sampling — k-means the embedding space
    # (deterministic Lloyd trainer) and draw exactly per_cluster vectors
    # per cluster via the md5-permutation rule; the oracle replays
    # training, assignment, and the per-cluster draw
    from flink_siddhi_spark.llm.pipeline import cluster_balanced_sample

    return cluster_balanced_sample(
        _embs(spark, sf_dir), per_cluster=20, n_clusters=8, n_iter=3
    )


def q_pipeline_quality_budget(spark, sf_dir):
    # round-5 wave 7: best-docs-within-a-token-budget greedy selection —
    # distributed prefix sum, no single-task global-order window
    from flink_siddhi_spark.llm.pipeline import quality_budget_select

    return quality_budget_select(_docs(spark, sf_dir), 10_000)


def q_dedup_cluster_sizes(spark, sf_dir):
    # round-5 wave 7: near-dup cluster-size histogram (+ the singleton row)
    # — the report that decides caps/star thresholds and dedup shrinkage
    from flink_siddhi_spark.llm.dedup import cluster_size_profile

    return cluster_size_profile(_docs(spark, sf_dir))


def q_pipeline_exact_k_sample(spark, sf_dir):
    # round-5 wave 7: exactly-k uniform sample via hash-permutation
    # TakeOrdered — no global sort, engine-exact membership
    from flink_siddhi_spark.llm.pipeline import exact_k_sample

    return exact_k_sample(_docs(spark, sf_dir), 100).select(
        "doc_id", "lang", "source"
    )


def q_events_attribution(spark, sf_dir):
    # round-5 wave 6: last-touch attribution — one user-keyed ignore-nulls
    # carry-forward window; organic conversions keep NULL touch columns
    from flink_siddhi_spark.analytics import last_touch_attribution
    from flink_siddhi_spark.sources.tables import load_table

    return last_touch_attribution(load_table(spark, sf_dir, "events"))


def q_text_dataset_card(spark, sf_dir):
    # round-5 wave 6: the one-row corpus dataset card — totals, exact
    # dup-rate, cardinalities, dominant language, token percentiles
    from flink_siddhi_spark.llm.text import dataset_card

    return dataset_card(_docs(spark, sf_dir))


def q_ann_sq_topk(spark, sf_dir):
    # round-5 wave 6: int8 scalar-quantized top-k (SQ8) — per-dimension
    # affine codes against corpus min/max; floor(v+0.5) code rounding is a
    # pure binary op so the DuckDB oracle replays codes and ranks exactly
    from flink_siddhi_spark.llm.similarity import sq_topk

    embs = _embs(spark, sf_dir)
    queries = embs.filter(F.col("vec_id") < 10)
    return sq_topk(embs, queries, k=5)


def q_pipeline_dsir_resample(spark, sf_dir):
    # round-5 wave 6: DSIR's selection step — Gumbel-top-k importance
    # resampling over the hashed-unigram log-weights (hash-derived noise,
    # so the sample is deterministic and key-for-key oracle-replayable)
    from flink_siddhi_spark.llm.pipeline import dsir_resample

    return dsir_resample(_docs(spark, sf_dir), F.col("lang") == "en", n_out=100)


def q_ann_ivfpq_topk(spark, sf_dir):
    # round-5 wave 6: the full IVF-PQ index (coarse bucket pruning over
    # product-quantized reconstructions) — deterministic end-to-end, so
    # the oracle replays codes -> buckets -> probed ranks exactly
    from flink_siddhi_spark.llm.similarity import ivfpq_topk

    embs = _embs(spark, sf_dir)
    queries = embs.filter(F.col("vec_id") < 10)
    return ivfpq_topk(embs, queries, n_centroids=8, n_probe=2, k=5)


def q_multimodal_image_neardup(spark, sf_dir):
    # round-5 wave 5: REAL BMP round-trip (encode -> decode -> aHash) feeding
    # pigeonhole-banded Hamming dedup. The oracle replays the fingerprint
    # analytically from the text that seeded the pixels, so any codec or
    # banding bug breaks the value hash — the decode path is load-bearing.
    from flink_siddhi_spark.llm.multimodal import image_neardup_pairs, text_to_bmp

    return image_neardup_pairs(text_to_bmp(_docs(spark, sf_dir)), max_hamming=7)


def q_events_rfm(spark, sf_dir):
    # round-5 wave 5: RFM segmentation — one user-keyed agg, percentile
    # thresholds broadcast back; NO global sort / ntile single-partition
    from flink_siddhi_spark.analytics import rfm_segments
    from flink_siddhi_spark.sources.tables import load_table

    return rfm_segments(load_table(spark, sf_dir, "events"))


def q_events_cooccurrence(spark, sf_dir):
    # round-5 wave 5: market-basket lift over per-user type sets — pairs
    # generated map-side from sorted arrays, aggregate at |types|^2 scale
    from flink_siddhi_spark.analytics import cooccurrence_lift
    from flink_siddhi_spark.sources.tables import load_table

    return cooccurrence_lift(load_table(spark, sf_dir, "events"))


def q_pipeline_stratified_sample(spark, sf_dir):
    # round-5 late: exact-count stratified sample (20% per lang, integer-ppm
    # keep predicate) — one stratum-keyed exchange shared by count + rank
    from flink_siddhi_spark.llm.pipeline import stratified_sample_exact

    return stratified_sample_exact(_docs(spark, sf_dir), 0.2).select(
        "doc_id", "lang", "srank"
    )


def q_text_source_rollup(spark, sf_dir):
    # round-5 late: ROLLUP(source, lang) corpus totals — one expand +
    # hash-aggregate pass for leaf cells, subtotals, and the grand total
    from flink_siddhi_spark.llm.text import source_rollup

    return source_rollup(_docs(spark, sf_dir))


def q_events_transitions(spark, sf_dir):
    # round-5 late: first-order Markov transition matrix — one user-keyed
    # lag window, then hash-agg onto a |types|^2 count table; the
    # normalizing window runs on k^2 rows, not event scale
    from flink_siddhi_spark.analytics import event_transitions
    from flink_siddhi_spark.sources.tables import load_table

    return event_transitions(load_table(spark, sf_dir, "events"))


def q_text_bigram_pmi(spark, sf_dir):
    # round-5 late: top collocations by PMI — codegen transform+explode
    # bigrams (no word-scale self-join), vocab-bounded aggregates,
    # TakeOrderedAndProject cut
    from flink_siddhi_spark.llm.text import bigram_pmi

    return bigram_pmi(_docs(spark, sf_dir))


def q_text_textrank(spark, sf_dir):
    # round-5 late: TextRank keywords — 10 fixed PageRank iterations over
    # the bigram graph, 12-decimal decimal-summed contributions so the
    # ITERATIVE fixed point is engine-exact and fully oracle-checked
    from flink_siddhi_spark.llm.text import textrank_keywords

    return textrank_keywords(_docs(spark, sf_dir))


def q_events_hll_users(spark, sf_dir):
    # round-5 late: HyperLogLog distinct users per event type — md5-register
    # sketch so the SAME sketch is computable in DuckDB (the estimate is a
    # deterministic function of the input multiset, hence value-hashable).
    # Small groups exercise the linear-counting branch. Plan: one
    # (type, register) hash-agg (≤ k·m rows survive map-side combine), one
    # k·m-row final agg — nothing quadratic, nothing on the driver.
    from flink_siddhi_spark.sketch import hll_distinct
    from flink_siddhi_spark.sources.tables import load_table

    return hll_distinct(
        load_table(spark, sf_dir, "events"), "user_id", ["event_type"], prefix_hex=2
    )


def q_text_hll_shingles(spark, sf_dir):
    # round-5 late: corpus-wide distinct 3-gram shingle estimate — the raw
    # HLL branch (16k+ distinct at sf0.01 vs m=256 registers); n_exact rides
    # along so the output exposes the sketch's relative error
    from flink_siddhi_spark.llm.dedup import _spread, shingle_table
    from flink_siddhi_spark.sketch import hll_distinct

    # _spread BEFORE the shingle explode (round 10, guide §2.5 input skew):
    # the sf parquet is one split, so the corpus-scale explode + partial
    # distinct otherwise runs on a single task
    sh = shingle_table(_spread(_docs(spark, sf_dir))).withColumnRenamed(
        "shingle", "sh"
    )
    return hll_distinct(sh, "sh", [], prefix_hex=2)


def q_text_cms_heavyhitters(spark, sf_dir):
    # round-5 late: count-min-sketch frequency estimates for the top-50
    # 3-gram shingles (occurrences, not per-doc distinct). Pure-integer
    # sketch -> engine-exact; built from the aggregated (key, count) table
    # so the d-fold hashing is vocab-bounded, not corpus-bounded
    from flink_siddhi_spark.sketch import cms_heavy_hitters

    words = F.split(F.lower(F.col("text")), " ")
    grams = F.when(F.size(words) < 3, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(words) - 3),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, 3)),
        )
    )
    # _spread BEFORE the gram explode (round 10, guide §2.5 input skew):
    # one parquet split would otherwise run the corpus-scale explode +
    # partial count on a single task
    from flink_siddhi_spark.llm.dedup import _spread

    occ = _spread(_docs(spark, sf_dir)).select(F.explode(grams).alias("k"))
    return cms_heavy_hitters(occ, "k", top_n=50)


def q_dedup_substring_spans(spark, sf_dir):
    # round-5 late: exact substring dedup (Lee et al. 2022 shape, word
    # granularity) — maximal duplicated 8-gram spans per doc. One shuffle
    # for the gram-occurrence window count, one doc-keyed repartition
    # shared by the island merge and the span aggregate; linear in corpus
    # word count
    from flink_siddhi_spark.llm.dedup import repeated_ngram_spans

    return repeated_ngram_spans(_docs(spark, sf_dir), n=8)


def q_pipeline_bloom_contamination(spark, sf_dir):
    # round-5 late: Bloom-gate decontamination — the benchmark side ships
    # as an 8 KB literal bitmap (m=16^4 bits, k=4 md5 hashes) instead of a
    # broadcast shingle table; corpus probe is map-only + ONE per-doc agg.
    # No false negatives (superset of pipeline_contamination's doc set,
    # pinned in pytest); the oracle replays membership as a positions
    # semi-join with count(DISTINCT hash_i) = k
    from flink_siddhi_spark.llm.pipeline import bloom_contamination

    docs = _docs(spark, sf_dir)
    benchmark = docs.filter(F.col("source") == "src0")
    corpus = docs.filter(F.col("source") != "src0")
    return bloom_contamination(corpus, benchmark, n=3)


def q_text_gopher_rules(spark, sf_dir):
    # round-5 late: Gopher-style quality rules (Rae et al. 2021) with
    # per-rule audit booleans — pure codegen string expressions, no
    # shuffle, no UDF
    from flink_siddhi_spark.llm.text import gopher_rules

    return gopher_rules(_docs(spark, sf_dir)).select(
        "doc_id", "n_words", "mean_word_len", "symbol_ratio",
        "alpha_word_frac", "n_stopword_hits", "rule_word_count",
        "rule_mean_word_len", "rule_symbol_ratio", "rule_alpha_words",
        "rule_stopwords", "gopher_pass",
    )


def q_pipeline_dsir_weights(spark, sf_dir):
    # round-5 wave 4: DSIR importance weights (Xie et al. 2023) — hashed
    # unigram buckets, target = lang='en' exemplars; m-row log-ratio map
    # broadcasts back, only the doc-keyed sum shuffles at corpus scale
    from flink_siddhi_spark.llm.pipeline import dsir_weights

    return dsir_weights(_docs(spark, sf_dir), F.col("lang") == "en")


def q_events_topk_paths(spark, sf_dir):
    # round-5 wave 4: most frequent 3-step event-type paths — one
    # user-keyed lead() window, hash agg to |types|^3 rows, TakeOrdered
    from flink_siddhi_spark.analytics import topk_paths
    from flink_siddhi_spark.sources.tables import load_table

    return topk_paths(load_table(spark, sf_dir, "events"))


def q_text_inverted_index(spark, sf_dir):
    # round-5 wave 4: inverted index with capped posting lists — one
    # term-keyed exchange serves rank + df/tf, groupBy reuses it
    from flink_siddhi_spark.llm.text import inverted_index

    return inverted_index(_docs(spark, sf_dir))


def q_text_source_kl(spark, sf_dir):
    # round-5 wave 4: per-source KL vs corpus unigram distribution — one
    # corpus-scale (source, word) agg; KL math on vocab-scale rows
    from flink_siddhi_spark.llm.text import source_kl

    return source_kl(_docs(spark, sf_dir))


def q_ann_ivf_topk(spark, sf_dir):
    # approximate, but DETERMINISTIC (seeded centroids + rounded-cosine
    # tiebreaks) — so the DuckDB oracle replicates the same IVF exactly
    from flink_siddhi_spark.llm.similarity import ivf_topk

    embs = _embs(spark, sf_dir)
    queries = embs.filter(F.col("vec_id") < 10)
    return ivf_topk(embs, queries, n_centroids=8, n_probe=2, k=5)


def q_text_token_count(spark, sf_dir):
    from flink_siddhi_spark.llm.text import token_count

    return token_count(_docs(spark, sf_dir)).select(
        "doc_id", F.col("n_tokens").cast("bigint").alias("n_tokens"),
        "n_bpe_pieces", "n_subwords_est",
    )


def q_text_quality(spark, sf_dir):
    from flink_siddhi_spark.llm.text import quality_score

    return quality_score(_docs(spark, sf_dir)).select(
        "doc_id", "n_chars_m", "n_words", "mean_word_len", "stopword_ratio", "quality"
    )


def q_text_language_id(spark, sf_dir):
    from flink_siddhi_spark.llm.text import language_id

    return language_id(_docs(spark, sf_dir)).select(
        "doc_id", "en_hits", "es_hits", "lang_guess"
    )


def q_text_fingerprint(spark, sf_dir):
    from flink_siddhi_spark.llm.text import fingerprint

    return fingerprint(_docs(spark, sf_dir)).select("doc_id", "fp")


def q_multimodal_metadata(spark, sf_dir):
    from flink_siddhi_spark.llm.multimodal import media_metadata, with_binary_payload

    return media_metadata(with_binary_payload(_docs(spark, sf_dir))).select(
        "media_id", "mime",
        F.col("n_bytes").cast("bigint").alias("n_bytes"),
        F.col("width").cast("bigint").alias("width"),
        F.col("height").cast("bigint").alias("height"),
    )


def q_multimodal_features(spark, sf_dir):
    # Arrow-batched mapInPandas decode stub. The histogram array is projected
    # to a CSV string so the driver's pandas canonicalizer (which cannot sort
    # list cells) gets hashable values — full value-level check, not rows-only.
    from flink_siddhi_spark.llm.multimodal import extract_features, with_binary_payload

    feats = extract_features(with_binary_payload(_docs(spark, sf_dir)), fake=True)
    return feats.select(
        "media_id",
        "n_bytes",
        F.array_join(F.col("histogram").cast("array<string>"), ",").alias("histogram_csv"),
    )


# --------------------------------------------------------------------------
# driver contract
# --------------------------------------------------------------------------

def q_asof_join(spark, sf_dir):
    # point-in-time as-of join (union + ordered carry-forward, one shuffle):
    # each event picks up the latest order of the same customer at-or-before
    # the event time. DuckDB mirrors it with a native ASOF LEFT JOIN.
    from flink_siddhi_spark.operators.asof import asof_join
    from flink_siddhi_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.col("user_id").cast("bigint").alias("user_id"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ems"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").cast("bigint").alias("user_id"),
        F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("oms"),
        "o_orderkey",
    )
    out = asof_join(ev, orders, on="user_id", left_ts="ems", right_ts="oms",
                    payload=["o_orderkey"])
    return out.select(
        "event_id", "user_id", "ems", F.col("o_orderkey").alias("asof_order_key")
    )


def q_text_classifier(spark, sf_dir):
    # hashed bag-of-words linear classifier (derived-weight path: the whole
    # score is one aggregate fold in a single projection — zero shuffles)
    from flink_siddhi_spark.llm.text import classifier_score

    return classifier_score(_docs(spark, sf_dir), dim=1024)


def q_pipeline_interleave(spark, sf_dir):
    # deterministic mixture scheduling: stride-interleave three sources at
    # 2 : 1 : 0.5 — heavier sources recur proportionally more often in any
    # output prefix; global position via the distributed prefix sum.
    from flink_siddhi_spark.llm.pipeline import interleave_sources

    return interleave_sources(
        _docs(spark, sf_dir), {"src0": 2.0, "src1": 1.0, "src2": 0.5}
    )


def q_multimodal_resize(spark, sf_dir):
    # Arrow-batched mapInPandas resize stub. The binary thumb is projected to
    # its md5 hex digest (canonicalizer-safe; DuckDB md5() reproduces it).
    from flink_siddhi_spark.llm.multimodal import resize_images, with_binary_payload

    thumbs = resize_images(with_binary_payload(_docs(spark, sf_dir)), fake=True)
    return thumbs.select("media_id", "width", "height", F.md5("thumb").alias("thumb_md5"))


def q_multimodal_frame_sample(spark, sf_dir):
    # one-row-in / many-rows-out mapInPandas sampler stub; binary frames are
    # projected to md5 hex digests (canonicalizer-safe, DuckDB-reproducible).
    from flink_siddhi_spark.llm.multimodal import sample_frames, with_binary_payload

    frames = sample_frames(with_binary_payload(_docs(spark, sf_dir)), fake=True)
    return frames.select("media_id", "frame_no", F.md5("frame").alias("frame_md5"))


def q_dedup_semantic(spark, sf_dir):
    # SemDeDup-style semantic dedup: sign-LSH bucket as the cluster, min-id
    # member as representative, drop members with cosine >= 0.7 to the rep.
    # Linear shape: one tiny hash-agg + two broadcast joins, no self-join.
    from flink_siddhi_spark.llm.dedup import semantic_dedup

    return semantic_dedup(_embs(spark, sf_dir), threshold=0.7, planes=8, dim=64)


def q_pipeline_fuzzy_contamination(spark, sf_dir):
    # fuzzy benchmark decontamination: MinHash-LSH between the training
    # corpus and a held-out benchmark slice (doc_id % 10 == 7) — catches
    # paraphrased/truncated leaks that exact n-gram matching misses.
    from flink_siddhi_spark.llm.dedup import minhash_lsh_pairs_cross

    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 10 == 7)
    train = docs.filter(F.col("doc_id") % 10 != 7)
    return minhash_lsh_pairs_cross(train, bench, threshold=0.3)


def q_text_length_percentiles(spark, sf_dir):
    # exact per-source token-length percentiles (PERCENTILE_CONT semantics,
    # matches DuckDB quantile_cont bit-for-bit on integer inputs)
    from flink_siddhi_spark.llm.text import length_percentiles

    return length_percentiles(_docs(spark, sf_dir), by="source")


def q_pipeline_quality_topfrac(spark, sf_dir):
    # dynamic-threshold quality gate: keep the best 30% per language by the
    # quality score (fixed cutoffs keep wildly different fractions per lang)
    from flink_siddhi_spark.llm.pipeline import quality_top_fraction
    from flink_siddhi_spark.llm.text import quality_score

    scored = quality_score(_docs(spark, sf_dir)).select("doc_id", "lang", "quality")
    kept = quality_top_fraction(scored, frac=0.3, by="lang", score_col="quality")
    return kept.select(
        "doc_id", "lang", "quality", F.col("q_rank").cast("bigint").alias("q_rank")
    )


def q_tpch_q10ish_returns(spark, sf_dir):
    # TPC-H Q10 shape (returned-item reporting): who returned the most
    # revenue — 3-way join, grouped decimal-summed revenue, top 20.
    return _cep_tpch(spark, sf_dir).from_("lineitem").cql(
        "from lineitem[l_returnflag == 'R'] "
        "join orders on l_orderkey == o_orderkey "
        "select o_custkey, l_extendedprice, l_discount insert into LO;"
        "from LO join customer on o_custkey == c_custkey "
        "select c_custkey, c_name, "
        "sum(l_extendedprice * (1.0 - l_discount)) as revenue "
        "group by c_custkey, c_name "
        "order by revenue desc, c_custkey limit 20 insert into Out;"
    ).returns("Out")


def q_custom_stream_fn(spark, sf_dir):
    # STREAM-PROCESSOR extension (the fourth Siddhi extension kind): a
    # row-multiplying oversampler between the filter and the select
    cep = _cep(spark, sf_dir)
    cep.register_extension(
        "custom:repeat",
        lambda d, n: d.withColumn(
            "copy_idx", F.explode(F.sequence(F.lit(0), F.lit(int(n) - 1)))
        ),
        stream_function=True,
    )
    return cep.from_("events").cql(
        "from events[value > 95.0]#custom:repeat(3) "
        "select event_id, copy_idx insert into Out"
    ).returns("Out")


def q_custom_window(spark, sf_dir):
    # WINDOW-processor extension (the third Siddhi extension kind beside
    # scalar and aggregator): a custom half-hour tumbling bucket function
    cep = _cep(spark, sf_dir)
    cep.register_extension(
        "custom:halfHour", lambda ts: F.floor(ts / F.lit(1_800_000)), window=True
    )
    return cep.from_("events").cql(
        "from events#window.custom:halfHour() "
        "select event_type, count() as n group by event_type insert into Out"
    ).returns("Out")


def q_text_dedup_stats(spark, sf_dir):
    # per-source duplication health report: docs vs distinct contents
    from flink_siddhi_spark.llm.text import dedup_stats

    return dedup_stats(_docs(spark, sf_dir), by="source")


def q_pipeline_embed(spark, sf_dir):
    # embedding-generation stage (deterministic hash-feature stand-in for a
    # neural encoder — swap-in point documented in hash_embeddings); the
    # driver-safe projection exposes the first 4 components
    from flink_siddhi_spark.llm.pipeline import hash_embeddings

    out = hash_embeddings(_docs(spark, sf_dir), dim=16)
    return out.select(
        "doc_id",
        *[F.round(F.col("embedding")[i], 6).alias(f"e{i}") for i in range(4)],
    )


def q_pipeline_contamination_gate(spark, sf_dir):
    # stateless fuzzy-decontamination gate (per-row MinHash + banded
    # broadcast probes): batch mode of the streaming-capable definition
    from flink_siddhi_spark.llm.dedup import streaming_contamination_gate

    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 10 == 7).select("doc_id", "text")
    train = docs.filter(F.col("doc_id") % 10 != 7)
    out = streaming_contamination_gate(train, bench, keep_contaminated=True)
    return out.select("doc_id", "contaminated", "bench_id")


def q_tpch_q18ish_bigorders(spark, sf_dir):
    # TPC-H Q18 shape (large-volume customers): grouped HAVING feeding a
    # join — the aggregate-then-enrich chain.
    return _cep_tpch(spark, sf_dir).from_("lineitem").cql(
        "from lineitem select l_orderkey, sum(l_quantity) as total_qty "
        "group by l_orderkey having total_qty > 300.0 insert into BIG;"
        "from BIG join orders on l_orderkey == o_orderkey "
        "select o_custkey, l_orderkey, total_qty, o_totalprice "
        "order by total_qty desc, l_orderkey limit 10 insert into Out;"
    ).returns("Out")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: partitioned CEP pattern (error -> purchase per user) through
    the full parser/planner/NFA path on sf0.001."""
    return q_pattern_followed_by(spark, "/root/testdata/sf0.001")


# The driver's correctness gate evaluates queries() in dict order and records
# only the FIRST 50 entries, so the window is ROTATED each round. Round 11
# (VERDICT r10 'Next round' item 1 — it explicitly OVERRIDES the rotation
# plan frozen in ROUND10_NOTES.md §'Round-11 window leads'): positions 1-15
# are every entry the round-10 optimization pass numerically rewrote
# (textrank fused PageRank, HLL shared-distinct, CMS/bloom/neardup spread,
# SQ numpy stats, the fused PQ trainer family) plus the two entries
# registered in round 10 that have never been driver-gated
# (`window_bucketed_stream`, `sequence_quant_chain`); positions 16-50 are
# the first 35 of the 47 r8-stale entries in registration order (lead:
# `filter_projection`). The 12 r8-stale entries that do not fit
# (`dedup_embedding` .. `text_readability`) remain covered by the builder's
# full local mirror (scripts/verify_oracle.py) each round.
_R11_WINDOW = [
    # 1-13: round-10 optimization rewrites (VERDICT r10 item 1 list)
    "text_textrank",
    "text_hll_shingles",
    "events_hll_users",
    "text_cms_heavyhitters",
    "pipeline_bloom_contamination",
    "multimodal_image_neardup",
    "ann_sq_topk",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "ann_pq_trained_topk",
    "ann_ivfpq_residual",
    "dedup_cluster_sizes",
    "pipeline_dsir_resample",
    # 14-15: registered in round 10, never driver-gated
    "window_bucketed_stream",
    "sequence_quant_chain",
    # 16-50: r8-stale fill (registration order)
    "filter_projection",
    "window_time_batch",
    "window_length_batch",
    "window_session",
    "window_sliding_length",
    "window_sliding_time",
    "window_external_time",
    "window_external_time_batch",
    "window_sort",
    "window_frequent",
    "window_unique",
    "window_delay",
    "window_time_length",
    "window_lossy_frequent",
    "join_stream_table",
    "join_theta",
    "topk_per_group",
    "incremental_agg_day",
    "incremental_agg_within",
    "table_upsert_last",
    "table_dml_delete",
    "output_rate_last",
    "chained_queries",
    "multimodal_metadata",
    "multimodal_features",
    "multimodal_resize",
    "multimodal_frame_sample",
    "pattern_mid_every",
    "asof_join",
    "text_classifier",
    "pipeline_interleave",
    "tpch_q6_forecast",
    "sequence_family",
    "dedup_minhash_sig",
    "dedup_simhash",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q = {
        # --- core SiddhiQL: stateless relational surface ---
        "filter_projection": q_filter_projection,
        "projection_expressions": q_projection_expressions,
        "group_agg": q_group_agg,
        "having_filter": q_having_filter,
        "order_limit": q_order_limit,
        "order_limit_offset": q_order_limit_offset,
        "distinct_count": q_distinct_count,
        "stddev_agg": q_stddev_agg,
        "forever_aggregates": q_forever_aggregates,
        "scalar_functions": q_scalar_functions,
        "json_functions": q_json_functions,
        "union_fan_in": q_union_fan_in,
        # --- core SiddhiQL: windows ---
        "window_time_batch": q_window_time_batch,
        "window_length_batch": q_window_length_batch,
        "window_session": q_window_session,
        "window_sliding_length": q_window_sliding_length,
        "window_sliding_time": q_window_sliding_time,
        "window_external_time": q_window_external_time,
        "window_external_time_batch": q_window_external_time_batch,
        "window_sort": q_window_sort,
        "window_frequent": q_window_frequent,
        "window_unique": q_window_unique,
        "window_delay": q_window_delay,
        # cron variants consolidated into window_cron_family (round 7,
        # registered after the window — leads the round-8 rotation)
        "window_time_length": q_window_time_length,
        "window_lossy_frequent": q_window_lossy_frequent,
        # --- core SiddhiQL: joins (outer + windowed variants consolidated
        # into join_outer_family / join_windowed_family, round 7) ---
        "join_stream_table": q_join_stream_table,
        "join_theta": q_join_theta,
        # --- core SiddhiQL: aggregations / tables / rate limiting ---
        "topk_per_group": q_topk_per_group,
        "incremental_agg_day": q_incremental_agg_day,
        "incremental_agg_within": q_incremental_agg_within,
        "table_upsert_last": q_table_upsert_last,
        "table_dml_delete": q_table_dml_delete,
        "output_rate_last": q_output_rate_last,
        "chained_queries": q_chained_queries,
        # --- multimodal (canonicalizer-safe digests, new this round) ---
        "multimodal_metadata": q_multimodal_metadata,
        "multimodal_features": q_multimodal_features,
        "multimodal_resize": q_multimodal_resize,
        "multimodal_frame_sample": q_multimodal_frame_sample,
        # --- new round-3 operators (must be inside the window) ---
        "pattern_mid_every": q_pattern_mid_every,
        "asof_join": q_asof_join,
        "text_classifier": q_text_classifier,
        "pipeline_interleave": q_pipeline_interleave,
        "tpch_q6_forecast": q_tpch_q6_forecast,
        "tpch_q12ish_priority": q_tpch_q12ish_priority,
        # --- new round-3b operators (last in-window slot: the 39 core
        # SiddhiQL entries above now include window_cron_weekdays, so with
        # 4 multimodal + 6 r3 ops exactly ONE slot remains before 50) ---
        "dedup_semantic": q_dedup_semantic,
        # ---------------- window boundary (50) ----------------
        # --- tail: local-mirror-gated this round (scripts/verify_oracle.py
        # — same value-level DuckDB compare), to be rotated into the driver
        # window in round 4 ---
        "pipeline_fuzzy_contamination": q_pipeline_fuzzy_contamination,
        "text_length_percentiles": q_text_length_percentiles,
        "tpch_q10ish_returns": q_tpch_q10ish_returns,
        "pipeline_quality_topfrac": q_pipeline_quality_topfrac,
        "custom_stream_fn": q_custom_stream_fn,
        "custom_window": q_custom_window,
        "text_dedup_stats": q_text_dedup_stats,
        "pipeline_embed": q_pipeline_embed,
        "pipeline_contamination_gate": q_pipeline_contamination_gate,
        "tpch_q18ish_bigorders": q_tpch_q18ish_bigorders,
        "tpch_q1_pricing": q_tpch_q1_pricing,
        "pattern_followed_by": q_pattern_followed_by,
        "tpch_q3_shipping": q_tpch_q3_shipping,
        "tpch_q5ish_revenue": q_tpch_q5ish_revenue,
        # strict-sequence variants consolidated into sequence_family
        # (round 8, VERDICT r7 ask #3 — driver-gated green in r8)
        "sequence_family": q_sequence_family,
        "dedup_exact": q_dedup_exact,
        "custom_udaf": q_custom_udaf,
        "pattern_first_match": q_pattern_first_match,
        "pattern_within": q_pattern_within,
        "pattern_absence": q_pattern_absence,
        "sequence_quantifier": q_sequence_quantifier,
        "ann_cosine_topk": q_ann_cosine_topk,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_minhash_sig": q_dedup_minhash_sig,
        "dedup_simhash": q_dedup_simhash,
        "dedup_embedding": q_dedup_embedding,
        "dedup_embedding_verified": q_dedup_embedding_verified,
        "dedup_clusters": q_dedup_clusters,
        "dedup_fuzzy_keep": q_dedup_fuzzy_keep,  # new round 4
        "pipeline_cdc_chunks": q_pipeline_cdc_chunks,  # new round 4
        "dedup_containment": q_dedup_containment,
        "dedup_simhash_hamming": q_dedup_simhash_hamming,
        "text_pii_scrub": q_text_pii_scrub,
        "text_boilerplate_ngrams": q_text_boilerplate_ngrams,
        "text_tfidf_top_terms": q_text_tfidf_top_terms,
        "text_lm_score": q_text_lm_score,
        "text_source_stats": q_text_source_stats,
        "text_token_count": q_text_token_count,
        "text_quality": q_text_quality,
        "text_language_id": q_text_language_id,
        "text_fingerprint": q_text_fingerprint,
        "text_repetition": q_text_repetition,
        "pipeline_novelty": q_pipeline_novelty,
        "pipeline_curate": q_pipeline_curate,
        "pipeline_weighted_sample": q_pipeline_weighted_sample,
        "pipeline_chunk_overlap": q_pipeline_chunk_overlap,
        "pipeline_sample": q_pipeline_sample,
        "pipeline_split": q_pipeline_split,
        "pipeline_domain_quota": q_pipeline_domain_quota,
        "pipeline_contamination": q_pipeline_contamination,
        "pipeline_pack": q_pipeline_pack,
        "pipeline_chunk_dedup": q_pipeline_chunk_dedup,
        "pipeline_shuffle": q_pipeline_shuffle,
        "ann_ivf_topk": q_ann_ivf_topk,
        # --- new round 5 ---
        "ann_range_search": q_ann_range_search,
        "text_entropy": q_text_entropy,
        "ann_knn_graph": q_ann_knn_graph,
        "text_readability": q_text_readability,
        # --- round-5 late additions (outside the r5 window; these four
        # join the round-6 leads with the other never-in-r5 entries) ---
        "events_sessionize": q_events_sessionize,
        "events_retention": q_events_retention,
        "pipeline_mixture_weights": q_pipeline_mixture_weights,
        "text_zipf": q_text_zipf,
        "events_funnel": q_events_funnel,
        "events_active_rolling": q_events_active_rolling,
        "events_interval_join": q_events_interval_join,
        "events_zscore": q_events_zscore,
        "pipeline_stratified_sample": q_pipeline_stratified_sample,
        "text_source_rollup": q_text_source_rollup,
        "events_transitions": q_events_transitions,
        "text_bigram_pmi": q_text_bigram_pmi,
        "text_textrank": q_text_textrank,
        "events_hll_users": q_events_hll_users,
        "text_hll_shingles": q_text_hll_shingles,
        "text_cms_heavyhitters": q_text_cms_heavyhitters,
        "dedup_substring_spans": q_dedup_substring_spans,
        "pipeline_bloom_contamination": q_pipeline_bloom_contamination,
        "text_gopher_rules": q_text_gopher_rules,
        # --- round-5 waves 4-5 (registered after the frozen round-5 window;
        # gated in the round-6 window above) ---
        "pipeline_dsir_weights": q_pipeline_dsir_weights,
        "events_topk_paths": q_events_topk_paths,
        "text_inverted_index": q_text_inverted_index,
        "text_source_kl": q_text_source_kl,
        "events_rfm": q_events_rfm,
        "events_cooccurrence": q_events_cooccurrence,
        "multimodal_image_neardup": q_multimodal_image_neardup,
        "ann_pq_topk": q_ann_pq_topk,
        "ann_ivfpq_topk": q_ann_ivfpq_topk,
        "pipeline_dsir_resample": q_pipeline_dsir_resample,
        "ann_sq_topk": q_ann_sq_topk,
        "text_dataset_card": q_text_dataset_card,
        "events_attribution": q_events_attribution,
        "dedup_cluster_sizes": q_dedup_cluster_sizes,
        "pipeline_exact_k_sample": q_pipeline_exact_k_sample,
        "pipeline_quality_budget": q_pipeline_quality_budget,
        # --- round 6 (gated r7) ---
        "ann_pq_trained_topk": q_ann_pq_trained_topk,
        "ann_kmeans_clusters": q_ann_kmeans_clusters,
        "ann_ivfsq_topk": q_ann_ivfsq_topk,
        "ann_ivfpq_residual": q_ann_ivfpq_residual,
        "pipeline_cluster_balanced": q_pipeline_cluster_balanced,
        # --- round 7: variant-family consolidations (VERDICT r6 ask #2;
        # driver-gated green in r8 — they led the round-8
        # rotation). Each replaces its variants' individual registrations;
        # the tag column keeps every variant value-asserted in one oracle.
        "window_cron_family": q_window_cron_family,
        # round 10 (VERDICT r9 ask #6): the bucketed STREAMING window
        # lowering under the driver oracle (registered post-window; joins
        # the r11 rotation)
        "window_bucketed_stream": q_window_bucketed_stream,
        "join_outer_family": q_join_outer_family,
        "join_windowed_family": q_join_windowed_family,
        # late round 10: the one-quant chain kernel's driver gate
        # (registered post-window; joins the r11 rotation)
        "sequence_quant_chain": q_sequence_quant_chain,
    }
    # hard invariant (NOT a bare assert: python -O would strip it and a
    # malformed window list would silently mis-rotate the correctness gate)
    if len(_R11_WINDOW) != 50 or not set(_R11_WINDOW) <= set(q):
        raise RuntimeError(
            f"driver window invariant violated: {len(_R11_WINDOW)} entries, "
            f"unknown: {sorted(set(_R11_WINDOW) - set(q))}"
        )
    ordered = {k: q[k] for k in _R11_WINDOW}
    ordered.update({k: v for k, v in q.items() if k not in ordered})
    return ordered


# ---- oracle SQL builders -------------------------------------------------

_EMS = "epoch_ms(ts)"
_DECSUM = "CAST(SUM(CAST({x} AS DECIMAL(25,6))) AS DOUBLE)"


def _shingle_cte(alias: str = "sh", where: str = "") -> str:
    return (
        f"d{alias} AS (SELECT doc_id, string_split(lower(text), ' ') w FROM documents{where}), "
        f"{alias} AS (SELECT doc_id, CASE WHEN len(w) < 3 THEN CAST([] AS VARCHAR[]) "
        f"ELSE list_distinct(list_transform(range(1, len(w)-1), i -> array_to_string(w[i:i+2], ' '))) END sh FROM d{alias})"
    )


def _cos_sql(a: str, b: str) -> str:
    dot = (
        "list_reduce(list_transform(range(1, len({a})+1), "
        "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (x, y) -> x + y)"
    )
    return (
        f"({dot.format(a=a, b=b)} / "
        f"(sqrt({dot.format(a=a, b=a)}) * sqrt({dot.format(a=b, b=b)})))"
    )


def _textrank_sql(n_iter: int = 10, min_count: int = 5, top_n: int = 50) -> str:
    """Unrolled TextRank oracle: the same fixed-point iteration the Spark
    operator runs (llm/text.py textrank_keywords), one chained CTE per
    round — the 12-decimal per-edge rounding + DECIMAL(38,12) sums make
    every iteration engine-exact, which is what lets an ITERATIVE float
    algorithm be value-hash-compared at all."""
    dbl = "CAST(0.85 AS DOUBLE)"
    tele = f"(CAST(1.0 AS DOUBLE) - {dbl}) / nct.n"
    parts = [
        "WITH ws AS (SELECT string_split(lower(text), ' ') l FROM documents), "
        "bic AS (SELECT l[i] w1, l[i+1] w2, CAST(count(*) AS BIGINT) n_xy "
        "FROM (SELECT l, unnest(generate_series(1, len(l) - 1)) i FROM ws) "
        f"GROUP BY 1, 2 HAVING count(*) >= {min_count}), "
        "nodes AS (SELECT DISTINCT w FROM "
        "(SELECT w1 w FROM bic UNION ALL SELECT w2 FROM bic)), "
        "nct AS (SELECT CAST(count(*) AS BIGINT) n FROM nodes), "
        "outw AS (SELECT w1, CAST(sum(n_xy) AS BIGINT) wout "
        "FROM bic GROUP BY w1), "
        "pr0 AS (SELECT w, round(CAST(1.0 AS DOUBLE) / nct.n, 12) r "
        "FROM nodes, nct)"
    ]
    for k in range(1, n_iter + 1):
        parts.append(
            f", c{k} AS (SELECT e.w2 w, CAST(sum(CAST(round("
            "p.r * e.n_xy / o.wout, 12) AS DECIMAL(38,12))) AS DOUBLE) s "
            f"FROM pr{k-1} p JOIN bic e ON e.w1 = p.w "
            "JOIN outw o ON o.w1 = p.w GROUP BY e.w2)"
            f", pr{k} AS (SELECT nd.w, round({tele} + {dbl} * "
            f"coalesce(c.s, CAST(0.0 AS DOUBLE)), 12) r "
            f"FROM nodes nd LEFT JOIN c{k} c ON c.w = nd.w, nct)"
        )
    parts.append(
        f" SELECT w word, r score FROM pr{n_iter} "
        f"ORDER BY r DESC, w LIMIT {top_n}"
    )
    return "".join(parts)


def _hll_sql_local(value_expr, from_clause, group_cols, prefix_hex=2) -> str:
    """HLL oracle — the sketch module owns the (shared) SQL builder so the
    Spark operator and its oracle can never drift apart."""
    from flink_siddhi_spark.sketch import hll_sql

    return hll_sql(value_expr, from_clause, group_cols, prefix_hex=prefix_hex)


def _cms_sql_local(key_expr_cte, top_n=50) -> str:
    from flink_siddhi_spark.sketch import cms_sql

    return cms_sql(key_expr_cte, top_n=top_n)


def _lsh_cand_ctes() -> str:
    """Shared CTE chain: shingles -> minhash signatures -> LSH bands ->
    candidate pairs with signature-match counts (mirrors llm/dedup.py)."""
    return (
        _shingle_cte("s") + ", "
        "sig AS (SELECT doc_id, "
        + ", ".join(
            (
                f"list_min(list_transform(sh, x -> substring(md5(x), {(j % 4) * 8 + 1}, 8))) sig_{j}"
                if j < 4
                else f"list_min(list_transform(sh, x -> substring(md5('x:' || x), {(j % 4) * 8 + 1}, 8))) sig_{j}"
            )
            for j in range(8)
        )
        + " FROM s), banded AS ("
        + " UNION ALL ".join(
            f"SELECT doc_id, {b} band, md5(sig_{2*b} || '|' || sig_{2*b+1}) bucket, "
            + ", ".join(f"sig_{j}" for j in range(8))
            + " FROM sig"
            for b in range(4)
        )
        + "), cand AS (SELECT DISTINCT a.doc_id id_a, b.doc_id id_b, "
        + " + ".join(
            f"(CASE WHEN a.sig_{j} = b.sig_{j} THEN 1 ELSE 0 END)" for j in range(8)
        )
        + " m FROM banded a JOIN banded b ON a.band = b.band AND a.bucket = b.bucket "
        "AND a.doc_id < b.doc_id)"
    )


def _sig_select(src: str) -> str:
    return "SELECT doc_id, " + ", ".join(
        (
            f"list_min(list_transform(sh, x -> substring(md5(x), {(j % 4) * 8 + 1}, 8))) sig_{j}"
            if j < 4
            else f"list_min(list_transform(sh, x -> substring(md5('x:' || x), {(j % 4) * 8 + 1}, 8))) sig_{j}"
        )
        for j in range(8)
    ) + f" FROM {src}"


def _banded_select(src: str) -> str:
    return " UNION ALL ".join(
        f"SELECT doc_id, {b} band, md5(sig_{2*b} || '|' || sig_{2*b+1}) bucket, "
        + ", ".join(f"sig_{j}" for j in range(8))
        + f" FROM {src}"
        for b in range(4)
    )


def _lsh_cross_ctes(where_l: str, where_r: str) -> str:
    """Cross-corpus LSH candidates: two corpora (WHERE-sliced from documents)
    -> signatures -> bands -> (id_l, id_r, match-count) join across corpora
    (mirrors llm/dedup.py minhash_lsh_pairs_cross)."""
    return (
        _shingle_cte("sl", where_l) + ", "
        + _shingle_cte("sr", where_r) + ", "
        f"sigl AS ({_sig_select('sl')}), sigr AS ({_sig_select('sr')}), "
        f"bl AS ({_banded_select('sigl')}), br AS ({_banded_select('sigr')}), "
        "cand AS (SELECT DISTINCT a.doc_id id_l, b.doc_id id_r, "
        + " + ".join(
            f"(CASE WHEN a.sig_{j} = b.sig_{j} THEN 1 ELSE 0 END)" for j in range(8)
        )
        + " m FROM bl a JOIN br b ON a.band = b.band AND a.bucket = b.bucket)"
    )


def _simhash_sql() -> str:
    terms = []
    for i in range(16):
        vote = (
            f"list_sum(list_transform(w, x -> CASE WHEN substring(md5(x), {i + 1}, 1) "
            "IN ('1','3','5','7','9','b','d','f') THEN 1 ELSE -1 END))"
        )
        terms.append(f"(CASE WHEN {vote} > 0 THEN {2 ** i} ELSE 0 END)")
    expr = " + ".join(terms)
    return (
        "WITH d AS (SELECT doc_id, string_split(lower(text), ' ') w FROM documents) "
        f"SELECT doc_id, CAST({expr} AS BIGINT) simhash FROM d"
    )


def _simhash_hamming_sql(bits: int = 16, max_hamming: int = 2) -> str:
    """Pigeonhole-banded Hamming-distance pairs over the SimHash fingerprints;
    band layout mirrors llm.dedup.band_layout exactly."""
    from flink_siddhi_spark.llm.dedup import band_layout

    rows = ", ".join(
        f"({i}, {start}, {(1 << w) - 1})"
        for i, (start, w) in enumerate(band_layout(bits, max_hamming + 1))
    )
    return (
        f"WITH ex AS (SELECT doc_id, simhash, b.band, (simhash >> b.s) & b.m AS val "
        f"FROM ({_simhash_sql()}) fp, (VALUES {rows}) b(band, s, m)) "
        "SELECT id_a, id_b, hamming FROM ("
        "SELECT DISTINCT a.doc_id id_a, b.doc_id id_b, "
        "CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) hamming "
        "FROM ex a JOIN ex b ON a.band = b.band AND a.val = b.val "
        "AND a.doc_id < b.doc_id) "
        f"WHERE hamming <= {max_hamming}"
    )


def _dsir_weights_sql() -> str:
    """Analytic replay of llm.pipeline.dsir_weights: identical md5 bucket
    hashing + add-one smoothing + round-12 DECIMAL(38,12) sums (m = 256)."""
    return (
        "WITH w AS (SELECT doc_id, "
        "unnest(string_split(lower(text), ' ')) wd, lang = 'en' ist "
        "FROM documents), "
        "wb AS (SELECT doc_id, ist, "
        "substring(md5('dsir:' || wd), 1, 2) bk FROM w), "
        "b AS (SELECT bk, count(*) nr, "
        "sum(CASE WHEN ist THEN 1 ELSE 0 END) nt FROM wb GROUP BY bk), "
        "t AS (SELECT sum(nr) tr, sum(nt) tt FROM b), "
        "l AS (SELECT bk, CAST(round("
        "ln((nt + 1.0) / (tt + 256.0)) - ln((nr + 1.0) / (tr + 256.0)), 12) "
        "AS DECIMAL(38,12)) lam FROM b, t) "
        "SELECT doc_id, CAST(count(*) AS BIGINT) n_words, "
        "round(CAST(sum(lam) AS DOUBLE), 6) dsir_logw "
        "FROM wb JOIN l USING (bk) GROUP BY doc_id"
    )


def _pq_xh_ctes(m: int = 8, n_codes: int = 16, dim: int = 64) -> str:
    """Shared CTE chain replaying llm.similarity.pq_encode: seed codebook,
    per-subspace round-6 squared-L2 argmin (code-id tiebreak), and the
    quantized reconstruction table ``xh(vec_id, recon)``. The distance fold
    groups identically to the Spark expression (left fold from 0.0 over sub
    dims), so codes — and therefore reconstructions — are engine-exact."""
    sub = dim // m
    t = "(CAST(e.embedding[{i}] AS DOUBLE) - CAST(ce[{i}] AS DOUBLE))"
    d_expr = " + ".join(
        f"{t.format(i=f'j*{sub}+{d + 1}')} * {t.format(i=f'j*{sub}+{d + 1}')}"
        for d in range(sub)
    )
    return (
        "cent AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 c, "
        f"embedding ce FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT {n_codes})), "
        "enc AS (SELECT e.vec_id, t.j, cent.c code "
        f"FROM embeddings e, range({m}) t(j), cent "
        "QUALIFY row_number() OVER (PARTITION BY e.vec_id, t.j "
        f"ORDER BY round(0.0 + {d_expr}, 6) ASC, cent.c ASC) = 1), "
        "xh AS (SELECT vec_id, flatten(list(cs ORDER BY j)) recon FROM ("
        f"SELECT enc.vec_id, enc.j, ce[enc.j*{sub}+1 : enc.j*{sub}+{sub}] cs "
        "FROM enc JOIN cent ON cent.c = enc.code) GROUP BY vec_id)"
    )


def _pq_trained_ctes(
    m: int = 8, n_codes: int = 32, n_iter: int = 2, dim: int = 64,
    train_cap: int = 65_536, prefix: str = "", src: str = "embeddings",
    emb: str = "embedding",
) -> str:
    """CTE chain replaying llm.similarity.pq_train_codebook — per-subspace
    Lloyd k-means UNROLLED across ``n_iter`` fixed iterations (the textrank
    pattern), then the encode chain on the trained codebook, ending in
    ``xh(vec_id, recon)``.

    Engine-exactness hinges on the trainer's determinism contract:
    assignment is the same round-6 left-fold squared-L2 argmin the seed
    oracle uses; the update sums round-12 values in DECIMAL(38,12) (exact,
    order-free) and takes the HALF_UP mean in INTEGER 1e-12 units —
    sign * ((2*|S| + n) // (2*n)) — replayed here in HUGEINT, so there is
    no float division anywhere; the final units -> double is one
    correctly-rounded IEEE op in both engines (mean units always fit a
    double exactly). Codes that lose every member keep their previous
    centroid (LEFT JOIN + the NULL branch). Reconstructions narrow trained
    DOUBLE centroids to REAL exactly as the Spark encoder's float32 cast.

    Every CTE is MATERIALIZED: DuckDB 1.0 inlines multi-referenced CTEs,
    and each training level references the previous one twice (assignment
    + keep-old-centroid join) — inlining makes the unrolled chain
    EXPONENTIAL in n_iter, and the residual composition squares it
    (measured: the residual oracle ran >8 min inlined, seconds
    materialized)."""
    sub = dim // m
    t = "(CAST(e.embedding[{i}] AS DOUBLE) - CAST(ce[{i}] AS DOUBLE))"
    d_expr = " + ".join(
        f"{t.format(i=f'j*{sub}+{d + 1}')} * {t.format(i=f'j*{sub}+{d + 1}')}"
        for d in range(sub)
    )
    u = 10**12
    parts = [
        f"{prefix}samp AS MATERIALIZED (SELECT vec_id, {emb} AS embedding FROM {src} "
        f"ORDER BY vec_id LIMIT {train_cap})",
        f"{prefix}cb0 AS MATERIALIZED (SELECT row_number() OVER (ORDER BY vec_id) - 1 c, "
        "list_transform(embedding, v -> CAST(v AS DOUBLE)) ce "
        f"FROM (SELECT * FROM {prefix}samp ORDER BY vec_id LIMIT {n_codes}))",
    ]
    for i in range(1, n_iter + 1):
        prev = f"{prefix}cb{i - 1}"
        sums = ", ".join(
            f"sum(CAST(round(CAST(e.embedding[a.j*{sub}+{d + 1}] AS DOUBLE)"
            f", 12) AS DECIMAL(38,12))) s{d}"
            for d in range(sub)
        )
        mean_exprs = []
        for d in range(sub):
            s = f"s.s{d}"
            mean_exprs.append(
                f"CASE WHEN s.cnt IS NULL THEN p.ce[t.j*{sub}+{d + 1}] "
                f"ELSE CAST((CASE WHEN {s} < 0 THEN -1 ELSE 1 END) * "
                f"((2 * CAST(abs({s}) * {u} AS HUGEINT) + s.cnt) // "
                f"(2 * s.cnt)) AS DOUBLE) / {u}.0 END"
            )
        parts.append(
            f"{prefix}a{i} AS MATERIALIZED (SELECT e.vec_id, t.j, p.c code "
            f"FROM {prefix}samp e, range({m}) t(j), {prev} p "
            "QUALIFY row_number() OVER (PARTITION BY e.vec_id, t.j "
            f"ORDER BY round(0.0 + {d_expr}, 6) ASC, p.c ASC) = 1)"
        )
        parts.append(
            f"{prefix}s{i} AS MATERIALIZED (SELECT a.j, a.code c, count(*) cnt, {sums} "
            f"FROM {prefix}a{i} a JOIN {prefix}samp e USING (vec_id) GROUP BY a.j, a.code)"
        )
        parts.append(
            f"{prefix}cb{i} AS MATERIALIZED (SELECT c, flatten(list(sv ORDER BY j)) ce FROM ("
            f"SELECT p.c, t.j, [{', '.join(mean_exprs)}] sv "
            f"FROM {prev} p CROSS JOIN range({m}) t(j) "
            f"LEFT JOIN {prefix}s{i} s ON s.j = t.j AND s.c = p.c) GROUP BY c)"
        )
    cb = f"{prefix}cb{n_iter}"
    parts.append(
        f"{prefix}enc AS MATERIALIZED (SELECT e.vec_id, t.j, p.c code "
        f"FROM (SELECT vec_id, {emb} AS embedding FROM {src}) e, range({m}) t(j), {cb} p "
        "QUALIFY row_number() OVER (PARTITION BY e.vec_id, t.j "
        f"ORDER BY round(0.0 + {d_expr}, 6) ASC, p.c ASC) = 1)"
    )
    parts.append(
        f"{prefix}xh AS MATERIALIZED (SELECT vec_id, flatten(list(cs ORDER BY j)) recon FROM ("
        f"SELECT enc.vec_id, enc.j, "
        f"list_transform(ce[enc.j*{sub}+1 : enc.j*{sub}+{sub}], "
        "v -> CAST(v AS REAL)) cs "
        f"FROM {prefix}enc enc JOIN {cb} p ON p.c = enc.code) GROUP BY vec_id)"
    )
    return ", ".join(parts)


def _pq_trained_topk_sql(
    m: int = 8, n_codes: int = 32, n_iter: int = 2, k: int = 5,
    dim: int = 64,
) -> str:
    """Analytic replay of pq_topk(codebook="trained"): unrolled k-means
    training + PQ reconstruction + asymmetric cosine rank."""
    return (
        f"WITH {_pq_trained_ctes(m, n_codes, n_iter, dim)}, "
        "q AS (SELECT vec_id query_id, embedding qe FROM embeddings "
        "WHERE vec_id < 10), "
        "scored AS (SELECT query_id, x.vec_id neighbor_id, "
        "round(" + _cos_sql("qe", "x.recon") + ", 6) cos FROM q, xh x "
        "WHERE x.vec_id != query_id) "
        "SELECT query_id, neighbor_id, cos, rank FROM ("
        "SELECT *, CAST(row_number() OVER (PARTITION BY query_id "
        "ORDER BY cos DESC, neighbor_id) AS INT) rank FROM scored "
        "WHERE cos IS NOT NULL AND NOT isnan(cos)) "
        f"WHERE rank <= {k}"
    )


def _pq_topk_sql(m: int = 8, n_codes: int = 16, k: int = 5, dim: int = 64) -> str:
    """Analytic replay of llm.similarity.pq_topk: PQ reconstruction +
    asymmetric cosine rank."""
    return (
        f"WITH {_pq_xh_ctes(m, n_codes, dim)}, "
        "q AS (SELECT vec_id query_id, embedding qe FROM embeddings "
        "WHERE vec_id < 10), "
        "scored AS (SELECT query_id, x.vec_id neighbor_id, "
        "round(" + _cos_sql("qe", "x.recon") + ", 6) cos FROM q, xh x "
        "WHERE x.vec_id != query_id) "
        "SELECT query_id, neighbor_id, cos, rank FROM ("
        "SELECT *, CAST(row_number() OVER (PARTITION BY query_id "
        "ORDER BY cos DESC, neighbor_id) AS INT) rank FROM scored "
        "WHERE cos IS NOT NULL AND NOT isnan(cos)) "
        f"WHERE rank <= {k}"
    )


def _ivf_over_xh_sql(
    xh_ctes: str, n_centroids: int = 8, n_probe: int = 2, k: int = 5,
) -> str:
    """Shared IVF probing/scoring chain over any ``xh(vec_id, recon)``
    producer (PQ, trained-PQ, or SQ reconstructions): coarse centroids =
    the first n_centroids reconstructions by id, bucket assignment and
    probing by rounded cosine (id tiebreaks), asymmetric scoring of probed
    buckets only — ONE generator so the composed-index oracles cannot
    drift apart."""
    return (
        f"WITH {xh_ctes}, "
        "ccent AS (SELECT vec_id cid, recon cemb FROM "
        f"(SELECT * FROM xh ORDER BY vec_id LIMIT {n_centroids})), "
        "assigned AS (SELECT x.vec_id, x.recon, cid FROM xh x, ccent "
        "QUALIFY row_number() OVER (PARTITION BY x.vec_id ORDER BY "
        "round(" + _cos_sql("x.recon", "cemb") + ", 6) DESC, cid) = 1), "
        "probes AS (SELECT q.vec_id qid, q.embedding qemb, cid "
        "FROM embeddings q, ccent WHERE q.vec_id < 10 "
        "QUALIFY row_number() OVER (PARTITION BY q.vec_id ORDER BY "
        f"round({_cos_sql('q.embedding', 'cemb')}, 6) DESC, cid) <= {n_probe}), "
        "scored AS (SELECT p.qid query_id, a.vec_id neighbor_id, "
        "round(" + _cos_sql("p.qemb", "a.recon") + ", 6) cos "
        "FROM probes p JOIN assigned a USING (cid) WHERE a.vec_id != p.qid) "
        "SELECT query_id, neighbor_id, cos, rank FROM ("
        "SELECT *, CAST(row_number() OVER (PARTITION BY query_id "
        "ORDER BY cos DESC, neighbor_id) AS INT) rank FROM scored "
        "WHERE cos IS NOT NULL AND NOT isnan(cos)) "
        f"WHERE rank <= {k}"
    )


def _ivfpq_topk_sql(
    n_centroids: int = 8, n_probe: int = 2, m: int = 8, n_codes: int = 16,
    k: int = 5, dim: int = 64,
) -> str:
    """Analytic replay of llm.similarity.ivfpq_topk: the full IVF-PQ index
    (PQ reconstruction chain + the shared IVF probing chain)."""
    return _ivf_over_xh_sql(_pq_xh_ctes(m, n_codes, dim), n_centroids, n_probe, k)


def _ivfsq_topk_sql(
    n_centroids: int = 8, n_probe: int = 2, k: int = 5, dim: int = 64,
) -> str:
    """Analytic replay of llm.similarity.ivfsq_topk: SQ8 reconstructions
    under the same IVF probing chain (round 6 — completes IVF x {PQ, SQ})."""
    return _ivf_over_xh_sql(_sq_xh_ctes(dim), n_centroids, n_probe, k)



def _ivfpq_residual_sql(
    n_centroids: int = 8, n_probe: int = 2, m: int = 8, n_codes: int = 32,
    n_iter: int = 2, k: int = 5, dim: int = 64,
) -> str:
    """Analytic replay of ivfpq_topk(residual=True): BOTH trained quantizers
    (the m=1 coarse Lloyd and the m-subspace residual PQ) unroll through the
    prefixed `_pq_trained_ctes` chains; the residual table and the
    double-add-then-narrow reconstruction are plain expressions; probing is
    the shared IVF chain. The deepest composed oracle in the repo — five
    stages of trained index replayed end-to-end in SQL."""
    dims = f"range(1, {dim + 1})"
    chain = (
        _pq_trained_ctes(1, n_centroids, n_iter, dim, prefix="c_")
        + ", res AS MATERIALIZED (SELECT e.vec_id, "
        + f"list_transform({dims}, i -> CAST(e.embedding[i] AS DOUBLE) - "
        + "CAST(x.recon[i] AS DOUBLE)) r "
        + "FROM embeddings e JOIN c_xh x USING (vec_id)), "
        + _pq_trained_ctes(m, n_codes, n_iter, dim, prefix="r_",
                           src="res", emb="r")
        + ", xh AS MATERIALIZED (SELECT vec_id, "
        + f"list_transform({dims}, i -> CAST(CAST(a.recon[i] AS DOUBLE) + "
        + "CAST(b.recon[i] AS DOUBLE) AS REAL)) recon "
        + "FROM c_xh a JOIN r_xh b USING (vec_id))"
    )
    return _ivf_over_xh_sql(chain, n_centroids, n_probe, k)


def _sq_xh_ctes(dim: int = 64) -> str:
    """CTE chain replaying llm.similarity.sq_encode: per-dimension min/max,
    floor(v+0.5) int8 codes, float32 (REAL) reconstructions — ends in
    ``xh(vec_id, recon)``, the same interface as ``_pq_xh_ctes`` so the
    IVF probing chain composes over either (round 6: ``ivfsq_topk``)."""
    x = "CAST(e.embedding[st.d + 1] AS DOUBLE)"
    recon = (
        f"CASE WHEN mx - mn > 0 THEN CAST(mn + "
        f"(floor(({x} - mn) * 255.0 / (mx - mn) + 0.5) * (mx - mn)) / 255.0 "
        f"AS REAL) ELSE CAST(mn AS REAL) END"
    )
    return (
        "st AS (SELECT t.d, min(CAST(e.embedding[t.d + 1] AS DOUBLE)) mn, "
        "max(CAST(e.embedding[t.d + 1] AS DOUBLE)) mx "
        f"FROM embeddings e, range({dim}) t(d) GROUP BY t.d), "
        f"r AS (SELECT e.vec_id, st.d, {recon} rd FROM embeddings e, st), "
        "xh AS (SELECT vec_id, list(rd ORDER BY d) recon FROM r GROUP BY vec_id)"
    )


def _sq_topk_sql(k: int = 5, dim: int = 64) -> str:
    """Analytic replay of llm.similarity.sq_encode/sq_topk: the SQ
    reconstruction chain + the asymmetric cosine rank — expression grouping
    matches the Spark projection term for term."""
    return (
        f"WITH {_sq_xh_ctes(dim)}, "
        "q AS (SELECT vec_id query_id, embedding qe FROM embeddings "
        "WHERE vec_id < 10), "
        "scored AS (SELECT query_id, x.vec_id neighbor_id, "
        "round(" + _cos_sql("qe", "x.recon") + ", 6) cos FROM q, xh x "
        "WHERE x.vec_id != query_id) "
        "SELECT query_id, neighbor_id, cos, rank FROM ("
        "SELECT *, CAST(row_number() OVER (PARTITION BY query_id "
        "ORDER BY cos DESC, neighbor_id) AS INT) rank FROM scored "
        "WHERE cos IS NOT NULL AND NOT isnan(cos)) "
        f"WHERE rank <= {k}"
    )


def _image_neardup_sql(max_hamming: int = 7, side: int = 8, bands: int = 8) -> str:
    """Analytic replay of llm.multimodal's text->BMP->decode->aHash->banding
    pipeline: pixel channels are the first three md5 bytes of the (wrapped)
    word that seeded them, so the fingerprint computes from text alone —
    if Spark's real codec round-trip disturbs a single byte, the value hash
    diverges."""
    hv = "(instr('0123456789abcdef', substring(h, {o}, 1)) - 1)"

    def byte(o: int) -> str:
        return f"(16 * {hv.format(o=o)} + {hv.format(o=o + 1)})"

    n = side * side
    per = n // bands
    return (
        "WITH w AS (SELECT doc_id, string_split(lower(text), ' ') ws FROM documents), "
        f"px AS (SELECT doc_id, i, md5(ws[(i % len(ws)) + 1]) h FROM w, range({n}) t(i)), "
        f"g AS (SELECT doc_id, i, {byte(1)} + {byte(3)} + {byte(5)} gsum FROM px), "
        "tot AS (SELECT doc_id, sum(gsum) total FROM g GROUP BY doc_id), "
        f"bits AS (SELECT g.doc_id, i, CASE WHEN gsum * {n} > total THEN 1 ELSE 0 END bt "
        "FROM g JOIN tot USING (doc_id)), "
        f"bands AS (SELECT doc_id, i // {per} band, "
        f"CAST(sum(bt << (i % {per})) AS INT) val FROM bits GROUP BY doc_id, band), "
        "cand AS (SELECT DISTINCT a.doc_id id_a, b.doc_id id_b FROM bands a "
        "JOIN bands b ON a.band = b.band AND a.val = b.val AND a.doc_id < b.doc_id), "
        "ham AS (SELECT id_a, id_b, CAST(sum(bit_count(xor(x.val, y.val))) AS INT) hamming "
        "FROM cand JOIN bands x ON x.doc_id = id_a "
        "JOIN bands y ON y.doc_id = id_b AND y.band = x.band GROUP BY 1, 2) "
        f"SELECT id_a, id_b, hamming FROM ham WHERE hamming <= {max_hamming}"
    )


def _lastfriday_fire(j: int) -> str:
    # last-Friday candidate j months back: DuckDB dayofweek is 0=SUN..6=SAT
    # (Friday=5); step back (dow - 5) mod 7 days from the month's last day
    y = f"CAST((mi - {j}) // 12 AS BIGINT)"
    m = f"CAST((mi - {j}) % 12 + 1 AS BIGINT)"
    ld = f"last_day(make_date({y}, {m}, 1))"
    dfri = f"({ld} - INTERVAL ((dayofweek({ld}) - 5 + 7) % 7) DAY)"
    f_ = f"epoch_ms(CAST({dfri} AS TIMESTAMP))"
    return f"CASE WHEN {f_} <= ems THEN {f_} END"


def _monthend_fire(j: int, d: int) -> str:
    # last-fire candidate for day-of-month d, j months back: the day is
    # CLAMPED inside make_timestamp (DuckDB vectorized CASE evaluates both
    # branches, so Feb 31 must never be constructed) and the validity check
    # in the condition enforces the Quartz skip contract
    y = f"CAST((mi - {j}) // 12 AS BIGINT)"
    m = f"CAST((mi - {j}) % 12 + 1 AS BIGINT)"
    dim = f"datepart('day', last_day(make_date({y}, {m}, 1)))"
    f_ = f"epoch_ms(make_timestamp({y}, {m}, least({d}, {dim}), 0, 0, 0.0))"
    return f"CASE WHEN {d} <= {dim} AND {f_} <= ems THEN {f_} END"


def oracle_sql() -> dict[str, str]:
    en = "('the','a','and','of','to','in','is','on','for','with')"
    es = "('el','la','de','que','y','en','un','por','con','una')"
    sql = {
        "filter_projection": (
            "SELECT event_id, user_id, value FROM events "
            "WHERE value > 90.0 AND event_type = 'purchase'"
        ),
        "projection_expressions": (
            "SELECT event_id, value * 2.0 + 1.0 AS v2, "
            "CASE WHEN value > 50.0 THEN 'hi' ELSE 'lo' END AS band, "
            "event_type || '_x' AS tag FROM events"
        ),
        "group_agg": (
            "SELECT event_type, CAST(count(*) AS BIGINT) n, "
            + _DECSUM.format(x="value") + " total, "
            + _DECSUM.format(x="value") + " / COUNT(value) mean, "
            "min(value) lo, max(value) hi FROM events GROUP BY event_type"
        ),
        "having_filter": (
            "SELECT user_id, CAST(count(*) AS BIGINT) n, "
            + _DECSUM.format(x="value") + " total FROM events GROUP BY user_id "
            "HAVING count(*) > 30"
        ),
        "order_limit": (
            "SELECT user_id, " + _DECSUM.format(x="value") + " total FROM events "
            "GROUP BY user_id ORDER BY total DESC, user_id LIMIT 10"
        ),
        "distinct_count": (
            "SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) users "
            "FROM events GROUP BY event_type"
        ),
        "stddev_agg": (
            "SELECT event_type, sqrt(greatest(0.0, "
            "CAST(SUM(CAST(value AS DECIMAL(27,8))) * 0 + SUM(CAST(value*value AS DECIMAL(27,8))) AS DOUBLE) / count(value) "
            "- (CAST(SUM(CAST(value AS DECIMAL(27,8))) AS DOUBLE) / count(value)) "
            "* (CAST(SUM(CAST(value AS DECIMAL(27,8))) AS DOUBLE) / count(value)))) sd "
            "FROM events GROUP BY event_type"
        ),
        "window_time_batch": (
            f"SELECT CAST(FLOOR({_EMS} / 3600000) AS BIGINT) * 3600000 AS w, event_type, "
            "CAST(count(*) AS BIGINT) n, " + _DECSUM.format(x="value") + " total "
            "FROM events GROUP BY 1, 2"
        ),
        "window_length_batch": (
            f"WITH t AS (SELECT user_id, value, row_number() OVER "
            f"(ORDER BY {_EMS}, {ORD}) rn FROM events) "
            "SELECT user_id, CAST(count(*) AS BIGINT) n, "
            + _DECSUM.format(x="value") + " total FROM t "
            "GROUP BY user_id, CAST(FLOOR((rn - 1) / 20) AS BIGINT)"
        ),
        "window_session": (
            f"WITH t AS (SELECT user_id, value, CASE WHEN lag({_EMS}) OVER w IS NULL "
            f"OR {_EMS} - lag({_EMS}) OVER w > 1800000 THEN 1 ELSE 0 END ns FROM events "
            f"WINDOW w AS (PARTITION BY user_id ORDER BY {_EMS}, {ORD})), "
            "s AS (SELECT user_id, value, SUM(ns) OVER (PARTITION BY user_id "
            "ORDER BY rowid) sess FROM (SELECT *, row_number() OVER () rowid FROM t)) "
            "SELECT user_id, CAST(count(*) AS BIGINT) n, "
            + _DECSUM.format(x="value") + " total FROM s GROUP BY user_id, sess"
        ),
        "window_sliding_length": (
            "SELECT event_id, CAST(SUM(CAST(value AS DECIMAL(25,6))) OVER "
            f"(PARTITION BY user_id ORDER BY {_EMS}, {ORD} "
            "ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS DOUBLE) running FROM events"
        ),
        "window_sliding_time": (
            f"SELECT event_id, count(*) OVER (PARTITION BY user_id ORDER BY {_EMS} "
            "RANGE BETWEEN 600000 PRECEDING AND CURRENT ROW) n FROM events"
        ),
        "window_bucketed_stream": (
            f"SELECT event_id, user_id, count(*) OVER (PARTITION BY user_id "
            f"ORDER BY {_EMS} RANGE BETWEEN 300000 PRECEDING AND CURRENT ROW) "
            "AS n_win FROM events"
        ),
        "sequence_quant_chain": (
            # every view -> click<1:2> -> purchase within 1h. Greedy <1:2>
            # with disjoint stage masks: click1 = first click after the
            # view, the completing purchase = first purchase after click1
            # (min reached at count 1; a purchase between click1 and click2
            # would have completed first), click2 captured iff it precedes
            # that purchase in the engine's (ts, event_id) total order.
            "WITH a AS (SELECT user_id, event_id, ts FROM events "
            "WHERE event_type = 'view'), "
            "m AS (SELECT a.user_id, a.event_id AS view_id, a.ts AS a_ts, "
            "k1.event_id AS click1, k1.kts AS k1_ts "
            "FROM a, LATERAL (SELECT event_id, ts AS kts FROM events k "
            "WHERE k.user_id = a.user_id AND k.event_type = 'click' "
            "AND (k.ts > a.ts OR (k.ts = a.ts AND k.event_id > a.event_id)) "
            "ORDER BY k.ts, k.event_id LIMIT 1) k1), "
            "mc AS (SELECT m.*, c.event_id AS purchase_id, c.cts AS c_ts "
            "FROM m, LATERAL (SELECT event_id, ts AS cts FROM events c "
            "WHERE c.user_id = m.user_id AND c.event_type = 'purchase' "
            "AND (c.ts > m.k1_ts OR (c.ts = m.k1_ts AND c.event_id > m.click1)) "
            "ORDER BY c.ts, c.event_id LIMIT 1) c) "
            "SELECT user_id, view_id, click1, "
            "(SELECT k2.event_id FROM events k2 "
            "WHERE k2.user_id = mc.user_id AND k2.event_type = 'click' "
            "AND (k2.ts > mc.k1_ts OR (k2.ts = mc.k1_ts AND k2.event_id > mc.click1)) "
            "AND (k2.ts < mc.c_ts OR (k2.ts = mc.c_ts AND k2.event_id < mc.purchase_id)) "
            "ORDER BY k2.ts, k2.event_id LIMIT 1) AS click2, "
            "purchase_id FROM mc "
            "WHERE epoch_ms(c_ts) - epoch_ms(a_ts) <= 345600000"
        ),
        "window_sort": (
            "SELECT event_id, value FROM events "
            f"ORDER BY value DESC, {_EMS}, event_id LIMIT 100"
        ),
        "window_frequent": (
            "WITH top AS (SELECT event_type FROM events GROUP BY event_type "
            "ORDER BY count(*) DESC, event_type LIMIT 3) "
            "SELECT event_type, CAST(count(*) AS BIGINT) n FROM events "
            "WHERE event_type IN (SELECT event_type FROM top) GROUP BY event_type"
        ),
        "window_unique": (
            "SELECT user_id, event_id, value FROM events QUALIFY "
            f"row_number() OVER (PARTITION BY user_id ORDER BY {_EMS} DESC, event_id DESC) = 1"
        ),
        "window_delay": (
            f"SELECT event_id, {_EMS} + 60000 AS ets FROM events"
        ),
        "window_cron": (
            "SELECT event_type, CAST(count(*) AS BIGINT) n FROM "
            f"(SELECT event_type, {_EMS} // 600000 AS w FROM events) "
            "GROUP BY event_type, w"
        ),
        "window_cron_calendar": (
            # weekly fires Mondays 09:30 UTC; anchor = first epoch fire
            # (epoch day 0 = Thursday, +4 days to Monday, +9.5h) = 379800000
            "SELECT event_type, CAST(count(*) AS BIGINT) n FROM "
            f"(SELECT event_type, ({_EMS} - 379800000) // 604800000 AS w FROM events) "
            "GROUP BY event_type, w"
        ),
        "window_cron_weekdays": (
            # MON-FRI at 00:00 UTC -> epoch-day residues {0,1,4,5,6}
            # (epoch day 0 = Thursday); bucket = last schedule day <= event
            "SELECT event_type, CAST(count(*) AS BIGINT) n FROM "
            "(SELECT event_type, list_max(list_transform(range(0, 7), k -> "
            f"CASE WHEN (({_EMS} // 86400000 - k) % 7) IN (0, 1, 4, 5, 6) "
            f"THEN {_EMS} // 86400000 - k ELSE NULL END)) AS w FROM events) "
            "GROUP BY event_type, w"
        ),
        "window_cron_lastfriday": (
            "WITH base AS (SELECT event_type, epoch_ms(ts) AS ems, "
            "year(ts)*12 + month(ts) - 1 AS mi FROM events), "
            "b2 AS (SELECT event_type, greatest("
            + ", ".join(_lastfriday_fire(j) for j in (0, 1, 2))
            + ") AS w FROM base) "
            "SELECT event_type, CAST(count(*) AS BIGINT) n FROM b2 "
            "GROUP BY event_type, w"
        ),
        "window_cron_monthend": (
            "WITH base AS (SELECT event_type, epoch_ms(ts) AS ems, "
            "year(ts)*12 + month(ts) - 1 AS mi FROM events), "
            "b2 AS (SELECT event_type, greatest("
            + ", ".join(_monthend_fire(j, d) for j in (0, 1, 2) for d in (15, 31))
            + ") AS w FROM base) "
            "SELECT event_type, CAST(count(*) AS BIGINT) n FROM b2 "
            "GROUP BY event_type, w"
        ),
        "window_time_length": (
            f"WITH base AS (SELECT *, {_EMS} AS ems, row_number() OVER "
            f"(PARTITION BY user_id ORDER BY {_EMS}, {ORD}) AS rn FROM events), "
            "agg AS (SELECT a.user_id AS u, a.rn AS rn, "
            "CAST(SUM(CAST(c.value AS DECIMAL(25,6))) AS DOUBLE) AS running "
            "FROM base a JOIN base c ON c.user_id = a.user_id "
            "AND c.rn BETWEEN a.rn - 9 AND a.rn AND c.ems > a.ems - 600000 "
            "GROUP BY a.user_id, a.rn) "
            "SELECT b.event_id AS event_id, agg.running AS running "
            "FROM base b JOIN agg ON b.user_id = agg.u AND b.rn = agg.rn"
        ),
        "window_lossy_frequent": (
            "WITH c AS (SELECT user_id, event_type, count(*) AS n FROM events "
            "GROUP BY 1, 2), tot AS (SELECT count(*) AS total FROM events), "
            "kept AS (SELECT user_id, event_type FROM c, tot WHERE n >= 0.0012 * total) "
            "SELECT e.event_id AS event_id, e.user_id AS user_id, "
            "e.event_type AS event_type FROM events e JOIN kept k "
            "ON e.user_id = k.user_id AND e.event_type = k.event_type"
        ),
        "topk_per_group": (
            "SELECT event_type, event_id, value FROM events QUALIFY row_number() "
            f"OVER (PARTITION BY event_type ORDER BY value DESC, {_EMS}, event_id) <= 5"
        ),
        "join_time_time": (
            "SELECT e.event_id error_id, p.event_id purchase_id FROM events e "
            "JOIN events p ON e.user_id = p.user_id AND e.event_type = 'error' "
            "AND p.event_type = 'purchase' "
            "AND abs(epoch_ms(e.ts) - epoch_ms(p.ts)) <= 600000"
        ),
        "join_length_time": (
            "WITH e AS (SELECT *, epoch_ms(ts) ems, row_number() OVER "
            f"(ORDER BY epoch_ms(ts), {ORD}) rn FROM events WHERE event_type = 'error'), "
            "p AS (SELECT *, epoch_ms(ts) pms FROM events WHERE event_type = 'purchase'), "
            "pc AS (SELECT p.*, (SELECT count(*) FROM e WHERE e.ems <= p.pms) cnt FROM p) "
            "SELECT e.event_id error_id, pc.event_id purchase_id FROM e JOIN pc "
            "ON e.user_id = pc.user_id AND ((pc.pms <= e.ems AND e.ems - pc.pms <= 300000) "
            "OR (e.ems < pc.pms AND pc.cnt - e.rn < 5))"
        ),
        "join_left_outer": (
            "WITH s AS (SELECT * FROM events WHERE event_type = 'signup'), "
            "p AS (SELECT * FROM events WHERE event_type = 'purchase') "
            "SELECT s.event_id signup_id, p.event_id purchase_id FROM s "
            "LEFT JOIN p ON s.user_id = p.user_id "
            "AND abs(epoch_ms(s.ts) - epoch_ms(p.ts)) <= 30000"
        ),
        "join_full_outer": (
            "WITH s AS (SELECT * FROM events WHERE event_type = 'signup'), "
            "e AS (SELECT * FROM events WHERE event_type = 'error') "
            "SELECT s.event_id signup_id, e.event_id error_id FROM s "
            "FULL JOIN e ON s.user_id = e.user_id "
            "AND abs(epoch_ms(s.ts) - epoch_ms(e.ts)) <= 30000"
        ),
        "window_external_time_batch": (
            "SELECT event_type, CAST(count(*) AS BIGINT) n, max(value) hi FROM "
            "(SELECT event_type, value, event_id // 1000 AS w FROM events) "
            "GROUP BY event_type, w"
        ),
        "json_functions": (
            "SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) k "
            "FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL"
        ),
        "join_right_outer": (
            "WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'), "
            "s AS (SELECT * FROM events WHERE event_type = 'signup') "
            "SELECT s.event_id signup_id, p.event_id purchase_id FROM p "
            "RIGHT JOIN s ON p.user_id = s.user_id "
            "AND abs(epoch_ms(p.ts) - epoch_ms(s.ts)) <= 30000"
        ),
        "window_external_time": (
            "SELECT event_id, CAST(count(*) OVER w AS BIGINT) n, min(value) OVER w lo "
            "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id "
            "RANGE BETWEEN 500 PRECEDING AND CURRENT ROW)"
        ),
        "forever_aggregates": (
            "SELECT event_type, min(value) lo, max(value) hi FROM events "
            "GROUP BY event_type"
        ),
        "order_limit_offset": (
            "SELECT user_id, " + _DECSUM.format(x="value") + " total FROM events "
            "GROUP BY user_id ORDER BY total DESC, user_id LIMIT 10 OFFSET 5"
        ),
        "join_stream_table": (
            "SELECT o_orderkey, c_name, c_mktsegment, o_totalprice FROM orders "
            "JOIN customer ON o_custkey = c_custkey"
        ),
        "join_theta": (
            "SELECT o_orderkey, c_name, o_totalprice, c_acctbal FROM orders "
            "JOIN customer ON o_custkey = c_custkey AND o_totalprice > c_acctbal"
        ),
        "output_rate_last": (
            "SELECT event_id FROM (SELECT event_id, row_number() OVER "
            f"(ORDER BY {_EMS}, {ORD}) rn FROM events) WHERE rn % 100 = 0"
        ),
        "scalar_functions": (
            "SELECT event_id, upper(event_type) ty, "
            "str_split_regex(props, ':')[2] ptail, sqrt(value) rt, "
            f"strftime(to_timestamp({_EMS} // 1000), '%Y-%m-%d') d FROM events"
        ),
        "incremental_agg_day": (
            'SELECT epoch_ms(date_trunc(\'day\', ts)) "AGG_TIMESTAMP", event_type, '
            "CAST(count(*) AS BIGINT) n, "
            + _DECSUM.format(x="value") + " total FROM events GROUP BY 1, 2"
        ),
        "incremental_agg_within": (
            'SELECT epoch_ms(date_trunc(\'hour\', ts)) "AGG_TIMESTAMP", event_type, '
            "CAST(count(*) AS BIGINT) n FROM events GROUP BY 1, 2 "
            'HAVING "AGG_TIMESTAMP" >= 1704067200000 AND "AGG_TIMESTAMP" < 1704672000000'
        ),
        "table_upsert_last": (
            "SELECT user_id, value AS v FROM events QUALIFY "
            "row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, value DESC) = 1"
        ),
        "table_dml_delete": (
            "SELECT user_id, value AS v FROM events QUALIFY "
            "row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, value DESC) = 1 "
            "AND user_id NOT IN (SELECT user_id FROM events WHERE event_type = 'error' AND value > 99.0)"
        ),
        "union_fan_in": (
            "SELECT event_id, user_id FROM events WHERE event_type = 'click' "
            "UNION ALL SELECT event_id, user_id FROM events WHERE event_type = 'view'"
        ),
        "chained_queries": (
            "SELECT event_id, user_id FROM events WHERE value > 50.0 AND value > 90.0"
        ),
        "pattern_followed_by": (
            "SELECT e.user_id, e.event_id AS error_id, p.event_id AS purchase_id "
            "FROM events e, LATERAL (SELECT event_id FROM events p "
            "WHERE p.user_id = e.user_id AND p.event_type = 'purchase' "
            "AND (p.ts > e.ts OR (p.ts = e.ts AND p.event_id > e.event_id)) "
            "ORDER BY p.ts, p.event_id LIMIT 1) p WHERE e.event_type = 'error'"
        ),
        "pattern_first_match": (
            "WITH fe AS (SELECT user_id, event_id, ts FROM (SELECT user_id, event_id, ts, "
            "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) rn "
            "FROM events WHERE event_type = 'error') t WHERE rn = 1) "
            "SELECT fe.user_id, fe.event_id AS error_id, p.event_id AS purchase_id "
            "FROM fe, LATERAL (SELECT event_id FROM events p WHERE p.user_id = fe.user_id "
            "AND p.event_type = 'purchase' AND (p.ts > fe.ts OR (p.ts = fe.ts AND p.event_id > fe.event_id)) "
            "ORDER BY p.ts, p.event_id LIMIT 1) p"
        ),
        "pattern_within": (
            "SELECT user_id, error_id, purchase_id FROM ("
            "SELECT e.user_id, e.event_id AS error_id, p.event_id AS purchase_id, "
            "epoch_ms(p.pts) - epoch_ms(e.ts) AS delta "
            "FROM events e, LATERAL (SELECT event_id, ts AS pts FROM events p "
            "WHERE p.user_id = e.user_id AND p.event_type = 'purchase' "
            "AND (p.ts > e.ts OR (p.ts = e.ts AND p.event_id > e.event_id)) "
            "ORDER BY p.ts, p.event_id LIMIT 1) p WHERE e.event_type = 'error') t "
            "WHERE delta <= 3600000"
        ),
        "asof_join": (
            # DuckDB native ASOF LEFT JOIN; the right side is pre-deduped to
            # one row per (customer, order-date) — max o_orderkey, the same
            # struct-max tie-break the engine's carry-forward applies
            "WITH ev AS (SELECT event_id, user_id, epoch_ms(ts) ems FROM events), "
            "o AS (SELECT o_custkey AS user_id, epoch_ms(o_orderdate) oms, o_orderkey "
            "FROM orders QUALIFY row_number() OVER (PARTITION BY o_custkey, o_orderdate "
            "ORDER BY o_orderkey DESC) = 1) "
            "SELECT e.event_id, e.user_id, e.ems, o.o_orderkey AS asof_order_key "
            "FROM ev e ASOF LEFT JOIN o ON e.user_id = o.user_id AND e.ems >= o.oms"
        ),
        "text_classifier": (
            # same md5-derived hashed-bucket weights, same left-to-right fold
            "WITH t AS (SELECT doc_id, string_split(lower(text), ' ') w FROM documents) "
            "SELECT doc_id, CAST(len(w) AS BIGINT) n_words, "
            "round(1.0 / (1.0 + exp(-(list_reduce(list_transform(w, "
            "x -> CAST(concat('0x', substring(md5(concat('w:', CAST("
            "CAST(concat('0x', substring(md5(x), 1, 8)) AS BIGINT) % 1024 "
            "AS VARCHAR))), 1, 8)) AS BIGINT) / 4294967296.0 - 0.5), "
            "(a, b) -> a + b) / len(w)))), 6) score FROM t"
        ),
        "pipeline_interleave": (
            "WITH k AS (SELECT doc_id, source, "
            "round(CAST(row_number() OVER (PARTITION BY source "
            "ORDER BY md5(concat('mix:', CAST(doc_id AS VARCHAR))), doc_id) AS DOUBLE) "
            "/ (CASE source WHEN 'src0' THEN 2.0 WHEN 'src1' THEN 1.0 ELSE 0.5 END), 6) "
            "AS mix_key FROM documents WHERE source IN ('src0', 'src1', 'src2')) "
            "SELECT doc_id, source, mix_key, "
            "CAST(row_number() OVER (ORDER BY mix_key, source, doc_id) AS BIGINT) pos FROM k"
        ),
        "pattern_mid_every": (
            # first error per user (by the NFA total order ts, event_id),
            # joined to EVERY later purchase within the hour
            "WITH fe AS (SELECT user_id, event_id, ts FROM (SELECT user_id, event_id, ts, "
            "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) rn "
            "FROM events WHERE event_type = 'error') t WHERE rn = 1) "
            "SELECT fe.user_id, fe.event_id AS error_id, p.event_id AS purchase_id "
            "FROM fe JOIN events p ON p.user_id = fe.user_id "
            "AND p.event_type = 'purchase' "
            "AND (p.ts > fe.ts OR (p.ts = fe.ts AND p.event_id > fe.event_id)) "
            "AND epoch_ms(p.ts) - epoch_ms(fe.ts) <= 604800000"
        ),
        "pattern_absence": (
            "SELECT e.user_id, e.event_id AS error_id FROM events e "
            "WHERE e.event_type = 'error' AND NOT EXISTS ("
            "SELECT 1 FROM events c WHERE c.user_id = e.user_id AND c.event_type = 'click' "
            "AND (c.ts > e.ts OR (c.ts = e.ts AND c.event_id > e.event_id)) "
            "AND epoch_ms(c.ts) - epoch_ms(e.ts) <= 300000)"
        ),
        "sequence_strict": (
            "WITH t AS (SELECT user_id, event_id, value, "
            "lag(event_id) OVER w pid, lag(value) OVER w pv FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) "
            "SELECT user_id, pid AS first_id, event_id AS second_id FROM t "
            "WHERE value > 95.0 AND pv > 95.0"
        ),
        "sequence_quantifier": (
            # maximal runs of value>90 per user (gaps-and-islands), matched
            # strictly-consecutively by the first value<=90 breaker event
            f"WITH e AS (SELECT user_id, event_id, value, row_number() OVER "
            f"(PARTITION BY user_id ORDER BY {_EMS}, event_id) rn FROM events), "
            "flag AS (SELECT *, CASE WHEN value > 90.0 THEN 1 ELSE 0 END hi FROM e), "
            "grp AS (SELECT *, rn - row_number() OVER (PARTITION BY user_id, hi "
            "ORDER BY rn) g FROM flag), "
            "runs AS (SELECT user_id, g, max(rn) l_rn FROM grp "
            "WHERE hi = 1 GROUP BY user_id, g) "
            # `every` starts a new attempt at EVERY high event, so each high
            # event of a breaker-terminated run is a match's a[0]
            "SELECT h.user_id, h.event_id first_high, be.event_id breaker "
            "FROM grp h "
            "JOIN runs r ON h.user_id = r.user_id AND h.g = r.g AND h.hi = 1 "
            "JOIN grp be ON be.user_id = r.user_id AND be.rn = r.l_rn + 1 AND be.hi = 0"
        ),
        "tpch_q1_pricing": (
            "SELECT l_returnflag, l_linestatus, "
            + _DECSUM.format(x="l_quantity") + " sum_qty, "
            + _DECSUM.format(x="l_extendedprice") + " sum_base_price, "
            + _DECSUM.format(x="l_extendedprice * (1.0 - l_discount)") + " sum_disc_price, "
            + _DECSUM.format(x="l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)") + " sum_charge, "
            + _DECSUM.format(x="l_quantity") + " / COUNT(l_quantity) avg_qty, "
            + _DECSUM.format(x="l_extendedprice") + " / COUNT(l_extendedprice) avg_price, "
            + _DECSUM.format(x="l_discount") + " / COUNT(l_discount) avg_disc, "
            "CAST(count(*) AS BIGINT) count_order FROM lineitem "
            "WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' "
            "GROUP BY l_returnflag, l_linestatus"
        ),
        "tpch_q3_shipping": (
            "SELECT l_orderkey, "
            + _DECSUM.format(x="l_extendedprice * (1.0 - l_discount)") + " revenue, "
            "o_orderpriority FROM lineitem "
            "JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00' "
            "AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00' "
            "GROUP BY l_orderkey, o_orderpriority "
            "ORDER BY revenue DESC, l_orderkey LIMIT 10"
        ),
        "tpch_q6_forecast": (
            "SELECT " + _DECSUM.format(x="l_extendedprice * l_discount") + " revenue, "
            "CAST(count(*) AS BIGINT) n FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' "
            "AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00' "
            "AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24.0"
        ),
        "tpch_q12ish_priority": (
            "SELECT l_returnflag, "
            "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
            "THEN 1 ELSE 0 END) AS BIGINT) high_line_count, "
            "CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') "
            "THEN 1 ELSE 0 END) AS BIGINT) low_line_count, "
            "CAST(count(*) AS BIGINT) n FROM lineitem JOIN orders "
            "ON l_orderkey = o_orderkey "
            "WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' "
            "GROUP BY l_returnflag"
        ),
        "tpch_q5ish_revenue": (
            "SELECT n_name, "
            + _DECSUM.format(x="l_extendedprice * (1.0 - l_discount)") + " revenue "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"
        ),
        "dedup_exact": (
            "SELECT md5(text) content_hash, CAST(min(doc_id) AS BIGINT) canonical_id, "
            "CAST(count(*) AS BIGINT) n_copies FROM documents GROUP BY 1"
        ),
        "dedup_ngram_jaccard": (
            "WITH " + _shingle_cte("sh0") + ", "
            "sh AS (SELECT doc_id, unnest(sh) s FROM sh0), "
            "cnt AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1), "
            "pairs AS (SELECT a.doc_id id_a, b.doc_id id_b, count(*) common FROM sh a "
            "JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2) "
            "SELECT id_a, id_b, round(common / (ca.n + cb.n - common), 6) jaccard "
            "FROM pairs JOIN cnt ca ON ca.doc_id = id_a JOIN cnt cb ON cb.doc_id = id_b "
            "WHERE round(common / (ca.n + cb.n - common), 6) >= 0.8"
        ),
        "dedup_minhash_sig": (
            "WITH " + _shingle_cte("s") + " SELECT doc_id, "
            + ", ".join(
                (
                    f"list_min(list_transform(sh, x -> substring(md5(x), {(j % 4) * 8 + 1}, 8))) sig_{j}"
                    if j < 4
                    else f"list_min(list_transform(sh, x -> substring(md5('x:' || x), {(j % 4) * 8 + 1}, 8))) sig_{j}"
                )
                for j in range(8)
            )
            + " FROM s"
        ),
        "dedup_minhash_lsh": (
            "WITH " + _lsh_cand_ctes() + " "
            "SELECT id_a, id_b, round(m / 8.0, 6) est_jaccard FROM cand "
            "WHERE round(m / 8.0, 6) >= 0.5"
        ),
        "dedup_clusters": (
            # connected components over the LSH pair graph: min reachable id
            "WITH RECURSIVE " + _lsh_cand_ctes() + ", "
            "pairs AS (SELECT id_a, id_b FROM cand WHERE round(m / 8.0, 6) >= 0.5), "
            "edges AS (SELECT id_a src, id_b dst FROM pairs "
            "UNION ALL SELECT id_b, id_a FROM pairs), "
            "reach(node, r) AS (SELECT src, src FROM edges "
            "UNION SELECT e.src, t.r FROM edges e JOIN reach t ON e.dst = t.node) "
            "SELECT node doc_id, min(r) cluster_id FROM reach GROUP BY node"
        ),
        "dedup_fuzzy_keep": (
            "WITH RECURSIVE " + _lsh_cand_ctes() + ", "
            "pairs AS (SELECT id_a, id_b FROM cand WHERE round(m / 8.0, 6) >= 0.5), "
            "edges AS (SELECT id_a src, id_b dst FROM pairs "
            "UNION ALL SELECT id_b, id_a FROM pairs), "
            "reach(node, r) AS (SELECT src, src FROM edges "
            "UNION SELECT e.src, t.r FROM edges e JOIN reach t ON e.dst = t.node), "
            "lab AS (SELECT node, min(r) cid FROM reach GROUP BY node) "
            "SELECT d.doc_id FROM documents d LEFT JOIN lab ON d.doc_id = lab.node "
            "WHERE lab.node IS NULL OR lab.cid = d.doc_id"
        ),
        "pipeline_cdc_chunks": (
            # content-defined chunking mirror: boundary when the first 8 hex
            # digits of md5(trailing-4-word context) are divisible by 16
            "WITH d AS (SELECT doc_id, string_split(lower(text), ' ') w FROM documents), "
            "p AS (SELECT doc_id, CAST(i AS INT) pos, w[CAST(i AS INT)] word, "
            "array_to_string(w[CAST(greatest(1, i - 3) AS INT):CAST(i AS INT)], ' ') ctx "
            "FROM d, unnest(range(1, len(w) + 1)) t(i)), "
            "b AS (SELECT doc_id, pos, word, CASE WHEN "
            "CAST(concat('0x', substring(md5(ctx), 1, 8)) AS BIGINT) % 16 = 0 "
            "THEN 1 ELSE 0 END bnd FROM p), "
            "c AS (SELECT doc_id, pos, word, CAST(coalesce(SUM(bnd) OVER "
            "(PARTITION BY doc_id ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING "
            "AND 1 PRECEDING), 0) AS INT) chunk_idx FROM b) "
            "SELECT doc_id, chunk_idx, string_agg(word, ' ' ORDER BY pos) chunk_text, "
            "CAST(count(*) AS INT) n_words FROM c GROUP BY doc_id, chunk_idx"
        ),
        "dedup_simhash": _simhash_sql(),
        "dedup_embedding": (
            "WITH p AS (SELECT a.vec_id id_a, b.vec_id id_b, "
            "round(" + _cos_sql("a.embedding", "b.embedding") + ", 6) cos "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id) "
            "SELECT id_a, id_b, cos FROM p WHERE cos >= 0.4"
        ),
        "dedup_embedding_verified": (
            "WITH b AS (SELECT vec_id, embedding, "
            + " || ".join(
                f"(CASE WHEN embedding[{i + 1}] >= 0 THEN '1' ELSE '0' END)"
                for i in range(8)
            )
            + " bucket FROM embeddings), "
            "p AS (SELECT l.vec_id id_a, r.vec_id id_b, "
            "round(" + _cos_sql("l.embedding", "r.embedding") + ", 6) cos "
            "FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id < r.vec_id) "
            "SELECT id_a, id_b, cos FROM p WHERE cos >= 0.4"
        ),
        "custom_udaf": (
            "SELECT event_type, exp(CAST(SUM(CAST(ln(value) AS DECIMAL(27,18))) "
            "AS DOUBLE) / count(value)) AS gm FROM events WHERE value > 0 "
            "GROUP BY event_type"
        ),
        "pipeline_sample": (
            # strata {'en': 0.25}, default 0.75 -> hex thresholds 0x40 / 0xc0
            "SELECT doc_id, lang, source FROM documents WHERE CASE WHEN lang = 'en' "
            "THEN substring(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 2) < '40' "
            "ELSE substring(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'c0' END"
        ),
        "pipeline_split": (
            # weights (0.9, 0.05, 0.05) -> edges int(0.9*256)=230='e6', int(0.95*256)=243='f3'
            "SELECT doc_id, lang, CASE WHEN h < 'e6' THEN 'train' "
            "WHEN h < 'f3' THEN 'val' ELSE 'test' END split FROM "
            "(SELECT doc_id, lang, substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) h "
            "FROM documents)"
        ),
        "pipeline_domain_quota": (
            "SELECT doc_id, source, qrank FROM (SELECT doc_id, source, "
            "CAST(row_number() OVER (PARTITION BY source ORDER BY "
            "substring(md5('quota:' || CAST(doc_id AS VARCHAR)), 1, 8), doc_id) AS INT) qrank "
            "FROM documents) WHERE qrank <= 10"
        ),
        "pipeline_contamination": (
            "WITH " + _shingle_cte("csh0", " WHERE source != 'src0'") + ", "
            "csh AS (SELECT doc_id, unnest(sh) s FROM csh0), "
            + _shingle_cte("bsh0", " WHERE source = 'src0'") + ", "
            "bsh AS (SELECT doc_id bench_id, unnest(sh) s FROM bsh0) "
            "SELECT c.doc_id doc_id, CAST(count(DISTINCT c.s) AS BIGINT) n_hit_ngrams, "
            "CAST(count(DISTINCT b.bench_id) AS BIGINT) n_bench_docs "
            "FROM csh c JOIN bsh b ON c.s = b.s GROUP BY c.doc_id "
            "HAVING count(DISTINCT c.s) >= 1"
        ),
        "pipeline_bloom_contamination": (
            "WITH " + _shingle_cte("csh0", " WHERE source != 'src0'") + ", "
            + _shingle_cte("bsh0", " WHERE source = 'src0'") + ", "
            "bp AS (SELECT DISTINCT "
            "substring(md5(CAST(i AS VARCHAR) || ':' || s), 1, 4) p "
            "FROM (SELECT unnest(sh) s FROM bsh0), "
            "unnest(generate_series(0, 3)) t(i)), "
            "cp AS (SELECT doc_id, s, i, "
            "substring(md5(CAST(i AS VARCHAR) || ':' || s), 1, 4) p "
            "FROM (SELECT doc_id, unnest(sh) s FROM csh0), "
            "unnest(generate_series(0, 3)) t(i)), "
            "pass AS (SELECT doc_id, s FROM cp JOIN bp USING (p) "
            "GROUP BY doc_id, s HAVING count(DISTINCT i) = 4) "
            "SELECT doc_id, CAST(count(*) AS BIGINT) n_maybe_hits FROM pass "
            "GROUP BY doc_id"
        ),
        "pipeline_pack": (
            "WITH t AS (SELECT doc_id, "
            "substring(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 1) shard, "
            "CAST(len(string_split(text, ' ')) AS BIGINT) n_tokens FROM documents), "
            "c AS (SELECT doc_id, shard, n_tokens, CAST(SUM(n_tokens) OVER "
            "(PARTITION BY shard ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING "
            "AND CURRENT ROW) AS BIGINT) cum_tokens FROM t) "
            "SELECT doc_id, shard, n_tokens, cum_tokens, "
            "CAST(FLOOR((cum_tokens - n_tokens) / 512) AS BIGINT) bin_id FROM c"
        ),
        "pipeline_chunk_dedup": (
            "WITH d AS (SELECT doc_id, string_split(lower(text), ' ') w FROM documents), "
            "c AS (SELECT doc_id, unnest(list_transform(range(0, "
            "CAST(ceil(len(w) / 8.0) AS INT)), i -> array_to_string(w[i*8+1:i*8+8], ' '))) ch "
            "FROM d) "
            "SELECT md5(ch) chunk_hash, CAST(min(doc_id) AS BIGINT) canonical_id, "
            "CAST(count(*) AS BIGINT) n_occurrences FROM c GROUP BY 1"
        ),
        "text_boilerplate_ngrams": (
            "WITH " + _shingle_cte("hh") + ", "
            "ex AS (SELECT doc_id, unnest(sh) ngram FROM hh) "
            "SELECT ngram, CAST(count(*) AS BIGINT) n_docs FROM ex GROUP BY ngram "
            "HAVING count(*) >= 2 ORDER BY n_docs DESC, ngram LIMIT 50"
        ),
        "dedup_simhash_hamming": _simhash_hamming_sql(),
        "pipeline_novelty": (
            "SELECT doc_id, source FROM documents d WHERE source != 'src0' "
            "AND NOT EXISTS (SELECT 1 FROM documents s WHERE s.source = 'src0' "
            "AND md5(s.text) = md5(d.text))"
        ),
        "dedup_containment": (
            "WITH " + _shingle_cte("ct") + ", "
            "ex AS (SELECT doc_id, unnest(sh) shingle FROM ct), "
            "sz AS (SELECT doc_id, count(*) n_sh FROM ex GROUP BY 1), "
            "cm AS (SELECT a.doc_id id_a, b.doc_id id_b, count(*) common FROM ex a "
            "JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id GROUP BY 1, 2), "
            "bd AS (SELECT cm.*, sa.n_sh na, sb.n_sh nb FROM cm "
            "JOIN sz sa ON cm.id_a = sa.doc_id JOIN sz sb ON cm.id_b = sb.doc_id) "
            "SELECT contained_id, container_id, containment FROM ("
            "SELECT id_a contained_id, id_b container_id, round(common / na, 6) containment "
            "FROM bd UNION ALL "
            "SELECT id_b, id_a, round(common / nb, 6) FROM bd) "
            "WHERE containment >= 0.6"
        ),
        "pipeline_curate": (
            "WITH t AS (SELECT doc_id, source, text, length(text) nc, "
            "len(string_split(lower(text), ' ')) nw, "
            f"len(list_filter(string_split(lower(text), ' '), w -> w IN {en})) hits "
            "FROM documents), "
            "qd AS (SELECT doc_id, source, md5(text) h, "
            "round(CASE WHEN nw < 5 THEN 0.0 ELSE least(1.0, nw / 100.0) * 0.5 "
            "+ least(1.0, (hits / nw) * 5.0) * 0.5 END, 6) quality FROM t), "
            "c AS (SELECT *, min(doc_id) OVER (PARTITION BY h) cmin FROM qd "
            "WHERE quality >= 0.4) "
            "SELECT doc_id, source, quality FROM c WHERE doc_id = cmin AND "
            "substring(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 2) < '80'"
        ),
        "text_source_stats": (
            "WITH t AS (SELECT source, lang, len(string_split(text, ' ')) nt "
            "FROM documents), "
            "base AS (SELECT source, CAST(count(*) AS BIGINT) n_docs, "
            "round(CAST(sum(CAST(nt AS DECIMAL(25,6))) AS DOUBLE) / count(*), 6) avg_tokens "
            "FROM t GROUP BY source), "
            "lc AS (SELECT source, lang, count(*) c FROM t GROUP BY source, lang), "
            "tot AS (SELECT source, sum(c) n FROM lc GROUP BY source), "
            "ent AS (SELECT lc.source, round(CAST(sum(CAST(round(-(c / n) * log2(c / n), 6) "
            "AS DECIMAL(25,6))) AS DOUBLE), 6) lang_entropy "
            "FROM lc JOIN tot ON lc.source = tot.source GROUP BY lc.source) "
            "SELECT base.source, n_docs, avg_tokens, lang_entropy "
            "FROM base JOIN ent ON base.source = ent.source"
        ),
        "text_tfidf_top_terms": (
            "WITH w AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) term "
            "FROM documents), "
            "tf AS (SELECT doc_id, term, count(*) tf FROM w GROUP BY 1, 2), "
            "dfreq AS (SELECT term, count(*) dfreq FROM tf GROUP BY 1), "
            "n AS (SELECT count(*) nd FROM documents), "
            "s AS (SELECT doc_id, term, round(tf * ln((nd + 1.0) / (dfreq + 1.0)), 6) score "
            "FROM tf JOIN dfreq USING (term), n), "
            "r AS (SELECT doc_id, term, score, row_number() OVER "
            "(PARTITION BY doc_id ORDER BY score DESC, term) rn FROM s) "
            "SELECT doc_id, term, score FROM r WHERE rn <= 5"
        ),
        "text_lm_score": (
            "WITH w AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) term "
            "FROM documents), "
            "c AS (SELECT term, count(*) c FROM w GROUP BY 1), "
            "t AS (SELECT sum(c) tot FROM c) "
            "SELECT doc_id, CAST(count(*) AS BIGINT) n_words, "
            "CAST(sum(CAST(round(-log2(c / tot), 6) AS DECIMAL(25,6))) AS DOUBLE) "
            "sum_neg_log2p "
            "FROM w JOIN c USING (term), t GROUP BY doc_id"
        ),
        "pipeline_weighted_sample": (
            "WITH d AS (SELECT doc_id, least(CAST(1.0 AS DOUBLE), "
            "CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0) w FROM documents) "
            "SELECT doc_id, round(w, 6) w FROM d WHERE "
            "CAST(concat('0x', substring(md5('wsample:' || CAST(doc_id AS VARCHAR)), 1, 8)) "
            "AS BIGINT) / 4294967296.0 < w * 0.8"
        ),
        "pipeline_chunk_overlap": (
            "WITH d AS (SELECT doc_id, string_split(text, ' ') w FROM documents), "
            "c AS (SELECT doc_id, w, len(w) n, CASE WHEN len(w) <= 16 THEN 1 "
            "ELSE CAST(ceil((len(w) - 16) / 8.0) AS INT) + 1 END k FROM d), "
            "e AS (SELECT doc_id, n, w, unnest(range(0, k)) i FROM c) "
            "SELECT doc_id, CAST(i AS INT) chunk_idx, "
            "array_to_string(w[i*8+1:i*8+16], ' ') chunk_text, "
            "CAST(least(16, n - i*8) AS INT) n_words FROM e"
        ),
        "pipeline_shuffle": (
            "SELECT doc_id, md5('shuffle:' || CAST(doc_id AS VARCHAR)) shuffle_key, "
            "CAST(row_number() OVER (ORDER BY md5('shuffle:' || CAST(doc_id AS VARCHAR)), "
            "doc_id) AS BIGINT) pos FROM documents"
        ),
        "text_repetition": (
            "WITH t AS (SELECT doc_id, string_split(lower(text), ' ') w FROM documents), "
            "g AS (SELECT doc_id, w, len(w) n, list_transform(range(0, len(w) - 1), "
            "i -> w[i + 1] || ' ' || w[i + 2]) grams FROM t) "
            "SELECT doc_id, CAST(n AS BIGINT) n_words, "
            "CASE WHEN n >= 2 THEN round(1 - len(list_distinct(w)) / n, 6) ELSE 0.0 END "
            "dup_word_ratio, "
            "CASE WHEN n >= 3 THEN round(1 - len(list_distinct(grams)) / (n - 1), 6) "
            "ELSE 0.0 END dup_2gram_ratio FROM g"
        ),
        "multimodal_features": (
            # mirrors multimodal.decode_image_stub(fake=True): 16-bin histogram
            # of payload bytes; the testdata text is pure ASCII so codepoints
            # == UTF-8 bytes
            "WITH b AS (SELECT doc_id AS media_id, "
            "list_transform(string_split(text, ''), c -> ord(c)) AS bs FROM documents) "
            "SELECT media_id, CAST(len(bs) AS BIGINT) AS n_bytes, "
            "array_to_string(list_transform(range(16), "
            "k -> len(list_filter(bs, x -> x % 16 = k))), ',') AS histogram_csv FROM b"
        ),
        "multimodal_resize": (
            # mirrors multimodal.resize_stub(fake=True): payload[::stride][:64],
            # stride = max(1, len // 64)
            "WITH p AS (SELECT doc_id AS media_id, string_split(text, '') AS cs, "
            "length(text) AS n, greatest(1, length(text) // 64) AS stride FROM documents) "
            "SELECT media_id, CAST(8 AS INTEGER) width, CAST(8 AS INTEGER) height, "
            "md5(array_to_string(list_transform("
            "range(least(64, (n + stride - 1) // stride)), i -> cs[i*stride + 1]), '')) "
            "AS thumb_md5 FROM p"
        ),
        "multimodal_frame_sample": (
            # mirrors multimodal.sample_frames(fake=True): 64-byte frames,
            # every 4th, n_frames = max(1, len // 64)
            "SELECT media_id, CAST(fno AS INTEGER) AS frame_no, "
            "md5(substring(text, CAST(fno*64 + 1 AS BIGINT), 64)) AS frame_md5 "
            "FROM (SELECT doc_id AS media_id, text, "
            "unnest(range(0, greatest(1, length(text) // 64), 4)) AS fno FROM documents)"
        ),
        "ann_cosine_topk": (
            "WITH q AS (SELECT vec_id query_id, embedding q_emb FROM embeddings WHERE vec_id < 10), "
            "scored AS (SELECT q.query_id, c.vec_id neighbor_id, "
            "round(" + _cos_sql("q.q_emb", "c.embedding") + ", 6) cos "
            "FROM embeddings c, q WHERE c.vec_id != q.query_id), "
            "r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id "
            "ORDER BY cos DESC, neighbor_id) AS INT) rank FROM scored) "
            "SELECT query_id, neighbor_id, cos, rank FROM r WHERE rank <= 5"
        ),
        "ann_ivf_topk": (
            "WITH cent AS (SELECT vec_id cid, embedding cemb FROM embeddings "
            "ORDER BY vec_id LIMIT 8), "
            "assigned AS (SELECT e.vec_id, e.embedding, cid FROM embeddings e, cent "
            "QUALIFY row_number() OVER (PARTITION BY e.vec_id ORDER BY "
            "round(" + _cos_sql("e.embedding", "cemb") + ", 6) DESC, cid) = 1), "
            "probes AS (SELECT q.vec_id qid, q.embedding qemb, cid "
            "FROM embeddings q, cent WHERE q.vec_id < 10 "
            "QUALIFY row_number() OVER (PARTITION BY q.vec_id ORDER BY "
            "round(" + _cos_sql("q.embedding", "cemb") + ", 6) DESC, cid) <= 2), "
            "scored AS (SELECT p.qid query_id, a.vec_id neighbor_id, "
            "round(" + _cos_sql("p.qemb", "a.embedding") + ", 6) cos "
            "FROM probes p JOIN assigned a USING (cid) WHERE a.vec_id != p.qid) "
            "SELECT query_id, neighbor_id, cos, rank FROM "
            "(SELECT *, CAST(row_number() OVER (PARTITION BY query_id "
            "ORDER BY cos DESC, neighbor_id) AS INT) rank FROM scored) "
            "WHERE rank <= 5"
        ),
        "ann_range_search": (
            "WITH q AS (SELECT vec_id query_id, embedding q_emb FROM embeddings "
            "WHERE vec_id < 10), "
            "scored AS (SELECT q.query_id, c.vec_id neighbor_id, "
            "round(" + _cos_sql("q.q_emb", "c.embedding") + ", 6) cos "
            "FROM embeddings c, q WHERE c.vec_id != q.query_id) "
            "SELECT query_id, neighbor_id, cos FROM scored WHERE cos >= 0.35"
        ),
        "ann_knn_graph": (
            "WITH scored AS (SELECT q.vec_id query_id, c.vec_id neighbor_id, "
            "round(" + _cos_sql("q.embedding", "c.embedding") + ", 6) cos "
            "FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id) "
            "SELECT query_id, neighbor_id, cos, rank FROM "
            "(SELECT *, CAST(row_number() OVER (PARTITION BY query_id "
            "ORDER BY cos DESC, neighbor_id) AS INT) rank FROM scored "
            "WHERE cos IS NOT NULL AND NOT isnan(cos)) "
            "WHERE rank <= 3"
        ),
        "text_readability": (
            "WITH t AS (SELECT doc_id, "
            "CAST(len(string_split(text, ' ')) AS BIGINT) n_words, "
            "CAST(len(list_filter(string_split(text, ' '), "
            "w -> length(w) > 6)) AS BIGINT) n_long_words, "
            "greatest(CAST(1 AS BIGINT), CAST(len(regexp_extract_all(text, "
            "'[.!?]')) AS BIGINT)) n_sentences FROM documents) "
            "SELECT doc_id, n_words, n_long_words, n_sentences, "
            "round(n_words / n_sentences + "
            "100.0 * n_long_words / greatest(n_words, 1), 6) lix FROM t"
        ),
        "events_sessionize": (
            "WITH e AS (SELECT user_id, ts, event_id, value, epoch_ms(ts) ms "
            "FROM events), "
            "f AS (SELECT *, CASE WHEN lag(ms) OVER w IS NULL "
            "OR ms - lag(ms) OVER w > 1800000 THEN 1 ELSE 0 END nf "
            "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "s AS (SELECT *, sum(nf) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) sid FROM f) "
            "SELECT user_id, CAST(sid AS BIGINT) session_id, "
            "min(ms) start_ms, max(ms) end_ms, "
            "CAST(count(*) AS BIGINT) n_events, "
            "CAST(sum(CAST(round(value, 6) AS DECIMAL(25,6))) AS DOUBLE) "
            "total_value FROM s GROUP BY user_id, sid"
        ),
        "events_retention": (
            "WITH days AS (SELECT DISTINCT user_id u, CAST(ts AS DATE) d "
            "FROM events), "
            "c AS (SELECT u, d, min(d) OVER (PARTITION BY u) cd FROM days) "
            "SELECT strftime(cd, '%Y-%m-%d') cohort_day, "
            "CAST(date_diff('day', cd, d) AS INT) day_offset, "
            "CAST(count(DISTINCT u) AS BIGINT) n_users FROM c GROUP BY 1, 2"
        ),
        "pipeline_mixture_weights": (
            "WITH s AS (SELECT source, CAST(count(*) AS BIGINT) n_docs, "
            "CAST(sum(len(string_split(text, ' '))) AS BIGINT) n_tokens "
            "FROM documents GROUP BY source) "
            "SELECT source, n_docs, n_tokens, "
            "round(n_tokens / (sum(n_tokens) OVER ()), 6) token_share, "
            "round((1.0 / (count(*) OVER ())) / "
            "(n_tokens / (sum(n_tokens) OVER ())), 6) weight FROM s"
        ),
        "text_zipf": (
            "WITH c AS (SELECT unnest(string_split(lower(text), ' ')) term "
            "FROM documents), "
            "f AS (SELECT term, CAST(count(*) AS BIGINT) freq FROM c "
            "GROUP BY term ORDER BY freq DESC, term ASC LIMIT 200), "
            "r AS (SELECT row_number() OVER (ORDER BY freq DESC, term ASC) rk, "
            "term, freq FROM f) "
            "SELECT CAST(rk AS INT) rank, term, freq, "
            "round(log10(rk), 6) log_rank, round(log10(freq), 6) log_freq FROM r"
        ),
        "events_funnel": (
            "WITH f AS (SELECT user_id, "
            "list(epoch_ms(ts)) FILTER (WHERE event_type = 'signup') l0, "
            "list(epoch_ms(ts)) FILTER (WHERE event_type = 'view') l1, "
            "list(epoch_ms(ts)) FILTER (WHERE event_type = 'click') l2, "
            "list(epoch_ms(ts)) FILTER (WHERE event_type = 'purchase') l3 "
            "FROM events GROUP BY user_id), "
            "c0 AS (SELECT *, list_min(l0) t0 FROM f), "
            "c1 AS (SELECT *, list_min(list_filter(l1, "
            "x -> x > t0 AND x <= t0 + 86400000)) t1 FROM c0), "
            "c2 AS (SELECT *, list_min(list_filter(l2, "
            "x -> x > t1 AND x <= t0 + 86400000)) t2 FROM c1), "
            "c3 AS (SELECT *, list_min(list_filter(l3, "
            "x -> x > t2 AND x <= t0 + 86400000)) t3 FROM c2) "
            "SELECT CAST(0 AS INT) step_idx, 'signup' step, count(t0) n_users FROM c3 "
            "UNION ALL SELECT 1, 'view', count(t1) FROM c3 "
            "UNION ALL SELECT 2, 'click', count(t2) FROM c3 "
            "UNION ALL SELECT 3, 'purchase', count(t3) FROM c3"
        ),
        "events_active_rolling": (
            "WITH du AS (SELECT DISTINCT user_id u, CAST(ts AS DATE) d "
            "FROM events), "
            "cal AS (SELECT DISTINCT d FROM du), "
            "roll AS (SELECT c.d, CAST(count(DISTINCT du.u) AS BIGINT) "
            "rolling_users FROM cal c JOIN du "
            "ON du.d BETWEEN c.d - 6 AND c.d GROUP BY c.d), "
            "dau AS (SELECT d, CAST(count(DISTINCT u) AS BIGINT) dau "
            "FROM du GROUP BY d) "
            'SELECT strftime(dau.d, \'%Y-%m-%d\') AS "day", dau.dau, '
            "roll.rolling_users FROM dau JOIN roll ON dau.d = roll.d"
        ),
        "events_interval_join": (
            "WITH e AS (SELECT user_id, ts, event_id, value, epoch_ms(ts) ms "
            "FROM events), "
            "f AS (SELECT *, CASE WHEN lag(ms) OVER w IS NULL "
            "OR ms - lag(ms) OVER w > 1800000 THEN 1 ELSE 0 END nf "
            "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "s AS (SELECT *, sum(nf) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) sid FROM f), "
            "sess AS (SELECT user_id, CAST(sid AS BIGINT) session_id, "
            "min(ms) start_ms, max(ms) end_ms, "
            "CAST(count(*) AS BIGINT) n_events FROM s "
            "GROUP BY user_id, sid), "
            "err AS (SELECT user_id, epoch_ms(ts) ms FROM events "
            "WHERE event_type = 'error') "
            "SELECT sess.user_id, sess.session_id, sess.start_ms, "
            "sess.n_events, CAST(count(*) AS BIGINT) n_errors "
            "FROM sess JOIN err ON err.user_id = sess.user_id "
            "AND err.ms BETWEEN sess.start_ms AND sess.end_ms "
            "GROUP BY 1, 2, 3, 4"
        ),
        "events_zscore": (
            "WITH st AS (SELECT event_type, "
            "CAST(sum(CAST(round(value, 6) AS DECIMAL(25,6))) AS DOUBLE) "
            "/ count(*) m, "
            "CAST(sum(CAST(round(value * value, 6) AS DECIMAL(25,6))) "
            "AS DOUBLE) / count(*) m2 FROM events GROUP BY event_type), "
            "sd AS (SELECT event_type, m, sqrt(m2 - m * m) s FROM st), "
            "z AS (SELECT e.event_id, e.event_type, e.value, "
            "round((e.value - m) / (CASE WHEN s > 0 THEN s END), 6) z "
            "FROM events e JOIN sd USING (event_type)) "
            "SELECT event_id, event_type, value, z FROM z WHERE abs(z) > 2.0"
        ),
        "multimodal_image_neardup": _image_neardup_sql(),
        "ann_pq_topk": _pq_topk_sql(),
        "ann_ivfpq_topk": _ivfpq_topk_sql(),
        "ann_pq_trained_topk": _pq_trained_topk_sql(),
        "ann_ivfsq_topk": _ivfsq_topk_sql(),
        "ann_ivfpq_residual": _ivfpq_residual_sql(),
        "pipeline_cluster_balanced": (
            # trained k-means assignment (the m=1 chain) + per-cluster
            # exact-k by the md5 permutation with id tiebreaks
            f"WITH {_pq_trained_ctes(m=1, n_codes=8, n_iter=3)} "
            "SELECT vec_id, centroid_id FROM ("
            "SELECT vec_id, code centroid_id, row_number() OVER ("
            "PARTITION BY code ORDER BY "
            "md5('cbs:' || CAST(vec_id AS VARCHAR)) ASC, vec_id ASC) rk "
            "FROM enc) WHERE rk <= 20"
        ),
        "ann_kmeans_clusters": (
            # Lloyd k-means = the PQ trainer at m=1: reuse the unrolled
            # training CTEs verbatim and read the assignment off enc
            f"WITH {_pq_trained_ctes(m=1, n_codes=8, n_iter=3)} "
            "SELECT vec_id, code AS centroid_id FROM enc"
        ),
        "ann_sq_topk": _sq_topk_sql(),
        "pipeline_quality_budget": (
            "WITH t AS (SELECT doc_id, "
            "len(string_split(lower(text), ' ')) nw, "
            f"len(list_filter(string_split(lower(text), ' '), w -> w IN {en})) hits "
            "FROM documents), "
            "q AS (SELECT doc_id, CAST(nw AS BIGINT) n_words, "
            "round(CASE WHEN nw < 5 THEN 0.0 ELSE "
            "least(1.0, nw / 100.0) * 0.5 + least(1.0, (hits / nw) * 5.0) * 0.5 "
            "END, 6) quality FROM t), "
            "c AS (SELECT *, sum(n_words) OVER (ORDER BY quality DESC, doc_id "
            "ROWS UNBOUNDED PRECEDING) cum FROM q) "
            "SELECT doc_id, n_words, quality, CAST(cum AS BIGINT) cum_tokens "
            "FROM c WHERE cum <= 10000"
        ),
        "dedup_cluster_sizes": (
            "WITH RECURSIVE " + _lsh_cand_ctes() + ", "
            "pairs AS (SELECT id_a, id_b FROM cand WHERE round(m / 8.0, 6) >= 0.5), "
            "edges AS (SELECT id_a src, id_b dst FROM pairs "
            "UNION ALL SELECT id_b, id_a FROM pairs), "
            "reach(node, r) AS (SELECT src, src FROM edges "
            "UNION SELECT e.src, t.r FROM edges e JOIN reach t ON e.dst = t.node), "
            "lab AS (SELECT node, min(r) cid FROM reach GROUP BY node), "
            "sz AS (SELECT cid, CAST(count(*) AS BIGINT) s FROM lab GROUP BY cid), "
            "h AS (SELECT s cluster_size, CAST(count(*) AS BIGINT) n_clusters, "
            "CAST(sum(s) AS BIGINT) n_docs FROM sz GROUP BY s), "
            "single AS (SELECT CAST(1 AS BIGINT) cluster_size, "
            "CAST((SELECT count(*) FROM documents) - (SELECT count(*) FROM lab) "
            "AS BIGINT) n) "
            "SELECT * FROM h UNION ALL "
            "SELECT cluster_size, n n_clusters, n n_docs FROM single WHERE n > 0"
        ),
        "pipeline_exact_k_sample": (
            "SELECT doc_id, lang, source FROM documents "
            "ORDER BY md5('rsv:' || CAST(doc_id AS VARCHAR)) ASC, doc_id ASC "
            "LIMIT 100"
        ),
        "events_attribution": (
            "WITH e AS (SELECT *, CASE WHEN event_type IN ('click', 'view') "
            "THEN struct_pack(ts := ts, id := event_id, tp := event_type) "
            "END tch FROM events), "
            "c AS (SELECT event_id, user_id, ts, event_type, "
            "last_value(tch IGNORE NULLS) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND "
            "1 PRECEDING) lt FROM e), "
            "p AS (SELECT *, lt IS NOT NULL AND "
            "epoch_ms(ts) - epoch_ms(lt.ts) <= 3600000 ok FROM c "
            "WHERE event_type = 'purchase') "
            "SELECT event_id conversion_id, user_id, ts conversion_ts, "
            "CASE WHEN ok THEN lt.id END touch_id, "
            "CASE WHEN ok THEN lt.tp END touch_type, "
            "CASE WHEN ok THEN CAST(epoch_ms(ts) - epoch_ms(lt.ts) AS BIGINT) "
            "END ms_since_touch FROM p"
        ),
        "text_dataset_card": (
            "WITH b AS (SELECT lang, source, "
            "len(string_split(lower(text), ' ')) nw, "
            "length(text) nc, md5(text) h FROM documents), "
            "m AS (SELECT CAST(count(*) AS BIGINT) n_docs, "
            "CAST(sum(nw) AS BIGINT) n_tokens, "
            "CAST(sum(nc) AS BIGINT) n_chars, "
            "CAST(count(DISTINCT h) AS BIGINT) n_distinct_texts, "
            "CAST(count(DISTINCT source) AS BIGINT) n_sources, "
            "CAST(count(DISTINCT lang) AS BIGINT) n_langs, "
            "round(quantile_cont(CAST(nw AS DOUBLE), 0.5), 6) p50_tokens, "
            "round(quantile_cont(CAST(nw AS DOUBLE), 0.9), 6) p90_tokens "
            "FROM b), "
            "t AS (SELECT lang, CAST(count(*) AS BIGINT) n FROM b "
            "GROUP BY lang ORDER BY n DESC, lang LIMIT 1) "
            "SELECT n_docs, n_tokens, n_chars, n_distinct_texts, "
            "round(1.0 - n_distinct_texts / CAST(n_docs AS DOUBLE), 6) dup_rate, "
            "n_sources, n_langs, t.lang top_lang, "
            "round(t.n / CAST(n_docs AS DOUBLE), 6) top_lang_share, "
            "p50_tokens, p90_tokens FROM m, t"
        ),
        "events_rfm": (
            # same shapes as analytics.rfm_segments (n_bins=5): decimal-summed
            # monetary, interpolated percentile thresholds rounded to 6,
            # strict </> bucket comparisons
            "WITH pu AS (SELECT user_id, max(CAST(ts AS DATE)) ld, "
            "CAST(count(*) AS BIGINT) frequency, "
            "round(CAST(sum(CAST(round(value, 6) AS DECIMAL(25,6))) "
            "AS DOUBLE), 6) monetary FROM events GROUP BY user_id), "
            "r AS (SELECT user_id, CAST(date_diff('day', ld, "
            "(SELECT max(ld) FROM pu)) AS BIGINT) recency_days, "
            "frequency, monetary FROM pu), "
            "t AS (SELECT "
            + ", ".join(
                f"round(quantile_cont(CAST({c} AS DOUBLE), {i / 5}), 6) {c[0]}{i}"
                for c in ("recency_days", "frequency", "monetary")
                for i in range(1, 5)
            )
            + " FROM r) "
            "SELECT user_id, recency_days, frequency, monetary, "
            "r_score, f_score, m_score, "
            "CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) || "
            "CAST(m_score AS VARCHAR) segment FROM ("
            "SELECT r.*, "
            "CAST(1 + (recency_days < r1)::INT + (recency_days < r2)::INT + "
            "(recency_days < r3)::INT + (recency_days < r4)::INT AS INT) r_score, "
            "CAST(1 + (frequency > f1)::INT + (frequency > f2)::INT + "
            "(frequency > f3)::INT + (frequency > f4)::INT AS INT) f_score, "
            "CAST(1 + (monetary > m1)::INT + (monetary > m2)::INT + "
            "(monetary > m3)::INT + (monetary > m4)::INT AS INT) m_score "
            "FROM r, t)"
        ),
        "events_cooccurrence": (
            "WITH ut AS (SELECT DISTINCT user_id, event_type FROM events), "
            "n AS (SELECT count(DISTINCT user_id) n FROM ut), "
            "s AS (SELECT event_type t, count(*) n_t FROM ut GROUP BY t), "
            "p AS (SELECT a.event_type type_a, b.event_type type_b, "
            "count(*) n_ab FROM ut a JOIN ut b ON a.user_id = b.user_id "
            "AND a.event_type < b.event_type GROUP BY 1, 2) "
            "SELECT type_a, type_b, CAST(n_ab AS BIGINT) n_ab, "
            "CAST(sa.n_t AS BIGINT) n_a, CAST(sb.n_t AS BIGINT) n_b, "
            "round(CAST(n_ab * n.n AS DOUBLE) / (sa.n_t * sb.n_t), 6) lift, "
            "round(CAST(n_ab AS DOUBLE) / n.n, 6) support "
            "FROM p JOIN s sa ON sa.t = type_a JOIN s sb ON sb.t = type_b, n"
        ),
        "pipeline_stratified_sample": (
            # fraction 0.2 -> ppm 200000; keep iff (srank-1)*1e6 < n_s*ppm
            "SELECT doc_id, lang, srank FROM ("
            "SELECT doc_id, lang, CAST(row_number() OVER (PARTITION BY lang "
            "ORDER BY substring(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 8), "
            "doc_id) AS INT) srank, "
            "count(*) OVER (PARTITION BY lang) n FROM documents) "
            "WHERE (CAST(srank AS BIGINT) - 1) * 1000000 < n * 200000"
        ),
        "text_source_rollup": (
            "SELECT coalesce(source, '(all)') source, "
            "coalesce(lang, '(all)') lang, "
            "CAST(count(*) AS BIGINT) n_docs, "
            "CAST(sum(len(string_split(text, ' '))) AS BIGINT) n_tokens, "
            "CAST(grouping(source, lang) AS INT) lvl "
            "FROM documents GROUP BY ROLLUP(source, lang)"
        ),
        "events_transitions": (
            "WITH p AS (SELECT event_type to_type, "
            "lag(event_type) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) from_type FROM events), "
            "c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) n "
            "FROM p WHERE from_type IS NOT NULL GROUP BY 1, 2) "
            "SELECT from_type, to_type, n, "
            "round(CAST(n AS DOUBLE) / CAST(sum(n) OVER "
            "(PARTITION BY from_type) AS DOUBLE), 6) p FROM c"
        ),
        "text_bigram_pmi": (
            "WITH ws AS (SELECT string_split(lower(text), ' ') l "
            "FROM documents), "
            "bic AS (SELECT l[i] w1, l[i+1] w2, CAST(count(*) AS BIGINT) n_xy "
            "FROM (SELECT l, unnest(generate_series(1, len(l) - 1)) i FROM ws) "
            "GROUP BY 1, 2), "
            "uc AS (SELECT w, CAST(count(*) AS BIGINT) c FROM "
            "(SELECT unnest(l) w FROM ws) GROUP BY w), "
            "tot AS (SELECT sum(n_xy) nn FROM bic), "
            "s AS (SELECT w1, w2, n_xy, "
            "round(log2((CAST(n_xy AS DOUBLE) * CAST(nn AS DOUBLE)) / "
            "(CAST(x.c AS DOUBLE) * CAST(y.c AS DOUBLE))), 6) pmi "
            "FROM bic JOIN uc x ON bic.w1 = x.w "
            "JOIN uc y ON bic.w2 = y.w, tot WHERE n_xy >= 5) "
            "SELECT w1, w2, n_xy, pmi FROM s ORDER BY pmi DESC, w1, w2 "
            "LIMIT 100"
        ),
        "text_textrank": _textrank_sql(),
        "events_hll_users": _hll_sql_local(
            "user_id", "events", ["event_type"], prefix_hex=2
        ),
        "text_hll_shingles": _hll_sql_local(
            "sh",
            "(WITH dw AS (SELECT doc_id, string_split(lower(text), ' ') w "
            "FROM documents) "
            "SELECT unnest(CASE WHEN len(w) < 3 THEN CAST([] AS VARCHAR[]) "
            "ELSE list_distinct(list_transform(range(1, len(w)-1), "
            "i -> array_to_string(w[i:i+2], ' '))) END) sh FROM dw)",
            [],
            prefix_hex=2,
        ),
        "dedup_substring_spans": (
            "WITH dw AS (SELECT doc_id, string_split(lower(text), ' ') w "
            "FROM documents), "
            "gi AS (SELECT doc_id, i - 1 pos, "
            "md5(array_to_string(w[i:i+7], ' ')) gh "
            "FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 7)) i "
            "FROM dw WHERE len(w) >= 8)), "
            "hits AS (SELECT doc_id, pos FROM "
            "(SELECT doc_id, pos, count(*) OVER (PARTITION BY gh) cnt FROM gi) "
            "WHERE cnt >= 2), "
            "brk AS (SELECT doc_id, pos, CASE WHEN pos - lag(pos) OVER "
            "(PARTITION BY doc_id ORDER BY pos) > 8 THEN 1 ELSE 0 END b "
            "FROM hits), "
            "isl AS (SELECT doc_id, pos, sum(b) OVER "
            "(PARTITION BY doc_id ORDER BY pos) island FROM brk) "
            "SELECT doc_id, CAST(min(pos) AS BIGINT) start_word, "
            "CAST(max(pos) + 7 AS BIGINT) end_word, "
            "CAST(max(pos) + 7 - min(pos) + 1 AS BIGINT) n_words, "
            "CAST(count(*) AS BIGINT) n_grams "
            "FROM isl GROUP BY doc_id, island ORDER BY doc_id, start_word"
        ),
        "text_cms_heavyhitters": _cms_sql_local(
            "WITH dw AS (SELECT string_split(lower(text), ' ') w FROM documents) "
            "SELECT array_to_string(w[i:i+2], ' ') k "
            "FROM (SELECT w, unnest(range(1, len(w)-1)) i FROM dw WHERE len(w) >= 3)",
            top_n=50,
        ),
        "text_entropy": (
            "WITH w AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) wd "
            "FROM documents), "
            "tc AS (SELECT doc_id, wd, count(*) c FROM w GROUP BY 1, 2), "
            "t AS (SELECT doc_id, c, sum(c) OVER (PARTITION BY doc_id) n FROM tc) "
            "SELECT doc_id, CAST(max(n) AS BIGINT) n_words, "
            "CAST(count(*) AS BIGINT) n_distinct, "
            "CAST(sum(CAST(round(-(c / n) * log2(c / n), 6) AS DECIMAL(25,6))) "
            "AS DOUBLE) entropy_bits FROM t GROUP BY doc_id"
        ),
        "text_pii_scrub": (
            "SELECT doc_id, "
            "regexp_replace(regexp_replace(regexp_replace(regexp_replace(text, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), "
            "'\\+?\\d{1,2}[ .-]?\\(?\\d{3}\\)?[ .-]?\\d{3}[ .-]?\\d{4}', '<PHONE>', 'g'), "
            "'\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IPV4>', 'g'), "
            "'\\b\\d{3}-\\d{2}-\\d{4}\\b', '<SSN>', 'g') scrubbed, "
            "CAST(len(string_split(scrubbed, '<EMAIL>')) - 1 "
            "+ len(string_split(scrubbed, '<PHONE>')) - 1 "
            "+ len(string_split(scrubbed, '<IPV4>')) - 1 "
            "+ len(string_split(scrubbed, '<SSN>')) - 1 AS BIGINT) n_redactions "
            "FROM documents"
        ),
        "text_token_count": (
            "SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) n_tokens, "
            "CAST(len(regexp_extract_all(text, "
            "'''[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+')) AS BIGINT) "
            "n_bpe_pieces, "
            "CAST(ceil(length(text) / 4) AS BIGINT) n_subwords_est FROM documents"
        ),
        "text_quality": (
            "WITH t AS (SELECT doc_id, length(text) nc, "
            "len(string_split(lower(text), ' ')) nw, "
            f"len(list_filter(string_split(lower(text), ' '), w -> w IN {en})) hits "
            "FROM documents) "
            "SELECT doc_id, CAST(nc AS BIGINT) n_chars_m, CAST(nw AS BIGINT) n_words, "
            "round((nc - (nw - 1)) / nw, 6) mean_word_len, "
            "round(hits / nw, 6) stopword_ratio, "
            "round(CASE WHEN nw < 5 THEN 0.0 ELSE "
            "least(1.0, nw / 100.0) * 0.5 + least(1.0, (hits / nw) * 5.0) * 0.5 END, 6) quality "
            "FROM t"
        ),
        "text_gopher_rules": (
            "WITH t AS (SELECT doc_id, length(text) nc, "
            "string_split(lower(text), ' ') w, "
            "length(text) - length(replace(text, '#', '')) nh, "
            "(length(text) - length(replace(text, '...', ''))) / 3.0 ne "
            "FROM documents), "
            "u AS (SELECT doc_id, nc, nh, ne, len(w) nw, "
            "len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) alpha, "
            f"len(list_filter(w, x -> x IN {en})) hits FROM t), "
            "v AS (SELECT doc_id, nw, (nc - (nw - 1)) / nw mwl, "
            "(nh + ne) / nw sym, alpha / nw af, hits FROM u) "
            "SELECT doc_id, CAST(nw AS BIGINT) n_words, "
            "round(mwl, 6) mean_word_len, round(sym, 6) symbol_ratio, "
            "round(af, 6) alpha_word_frac, CAST(hits AS BIGINT) n_stopword_hits, "
            "nw >= 10 AND nw <= 100000 rule_word_count, "
            "mwl >= 3.0 AND mwl <= 10.0 rule_mean_word_len, "
            "sym <= 0.1 rule_symbol_ratio, "
            "af >= 0.8 rule_alpha_words, "
            "hits >= 2 rule_stopwords, "
            "(nw >= 10 AND nw <= 100000) AND (mwl >= 3.0 AND mwl <= 10.0) "
            "AND sym <= 0.1 AND af >= 0.8 AND hits >= 2 gopher_pass "
            "FROM v"
        ),
        "pipeline_dsir_weights": _dsir_weights_sql(),
        "pipeline_dsir_resample": (
            # Gumbel-top-k over the dsir weights: u from the first 8 md5 hex
            # digits, g = -ln(-ln u), key = round(logw + g, 6) — identical
            # noise + key math as llm.pipeline.dsir_resample
            f"WITH dw AS ({_dsir_weights_sql()}), "
            "k AS (SELECT doc_id, n_words, dsir_logw, round(dsir_logw + "
            "-ln(-ln((CAST(('0x' || substring(md5('dsir-g:' || "
            "CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 0.5) / 4294967296.0)), "
            "6) gumbel_key FROM dw) "
            "SELECT doc_id, n_words, dsir_logw, gumbel_key FROM k "
            "ORDER BY gumbel_key DESC, doc_id LIMIT 100"
        ),
        "events_topk_paths": (
            # NULL-propagating || matches the Spark side's F.concat: a NULL
            # event_type anywhere kills the whole path (never a truncated
            # one). The separator is escaped inside types (backslash first,
            # then '>') exactly as analytics.topk_paths does, so a type
            # containing '>' cannot alias two distinct paths.
            "WITH e AS (SELECT user_id, ts, event_id, "
            "replace(replace(event_type, '\\', '\\\\'), '>', '\\>') et "
            "FROM events), "
            "p AS (SELECT et || '>' || "
            "lead(et, 1) OVER w || '>' || "
            "lead(et, 2) OVER w path FROM e "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "c AS (SELECT path, CAST(count(*) AS BIGINT) n_paths FROM p "
            "WHERE path IS NOT NULL GROUP BY path "
            "ORDER BY n_paths DESC, path ASC LIMIT 20) "
            "SELECT CAST(row_number() OVER "
            "(ORDER BY n_paths DESC, path ASC) AS INT) rank, path, n_paths "
            "FROM c"
        ),
        "text_inverted_index": (
            "WITH w AS (SELECT doc_id, "
            "unnest(string_split(lower(text), ' ')) term FROM documents), "
            "tc AS (SELECT term, doc_id, count(*) tfd FROM w "
            "GROUP BY term, doc_id), "
            "r AS (SELECT term, doc_id, "
            "row_number() OVER (PARTITION BY term ORDER BY doc_id) rn, "
            "count(*) OVER (PARTITION BY term) df, "
            "sum(tfd) OVER (PARTITION BY term) tf FROM tc) "
            "SELECT term, CAST(max(df) AS BIGINT) df, "
            "CAST(max(tf) AS BIGINT) tf, "
            "array_to_string(list_sort(list(doc_id)), ',') postings "
            "FROM r WHERE rn <= 20 GROUP BY term"
        ),
        "text_source_kl": (
            "WITH sw AS (SELECT source, "
            "unnest(string_split(lower(text), ' ')) wd FROM documents), "
            "c AS (SELECT source, wd, count(*) c FROM sw GROUP BY source, wd), "
            "g AS (SELECT *, sum(c) OVER (PARTITION BY source) ng FROM c), "
            "cw AS (SELECT wd, sum(c) cw FROM c GROUP BY wd), "
            "t AS (SELECT sum(c) n FROM c), "
            "k AS (SELECT source, ng, CAST(round("
            "(c / ng) * (log2(c / ng) - log2(cw / n)), 12) "
            "AS DECIMAL(38,12)) kl FROM g JOIN cw USING (wd), t) "
            "SELECT source, CAST(max(ng) AS BIGINT) n_words, "
            "CAST(count(*) AS BIGINT) n_distinct, "
            "round(CAST(sum(kl) AS DOUBLE), 6) kl_bits FROM k GROUP BY source"
        ),
        "text_language_id": (
            "WITH t AS (SELECT doc_id, len(string_split(lower(text), ' ')) n, "
            f"len(list_filter(string_split(lower(text), ' '), w -> w IN {en})) en_h, "
            f"len(list_filter(string_split(lower(text), ' '), w -> w IN {es})) es_h "
            "FROM documents) "
            "SELECT doc_id, CAST(en_h AS BIGINT) en_hits, CAST(es_h AS BIGINT) es_hits, "
            "CASE WHEN en_h * 20 >= n AND en_h >= es_h THEN 'en' "
            "WHEN es_h * 20 > n THEN 'es' ELSE 'unknown' END lang_guess FROM t"
        ),
        "text_fingerprint": (
            "SELECT doc_id, md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) fp "
            "FROM documents"
        ),
        "multimodal_metadata": (
            "SELECT doc_id media_id, 'image/fake' mime, "
            "CAST(octet_length(encode(text)) AS BIGINT) n_bytes, "
            "CAST(octet_length(encode(text)) % 640 AS BIGINT) width, "
            "CAST(octet_length(encode(text)) % 480 AS BIGINT) height FROM documents"
        ),
        "dedup_semantic": (
            "WITH b AS (SELECT vec_id, embedding, "
            + " || ".join(
                f"(CASE WHEN embedding[{i + 1}] >= 0 THEN '1' ELSE '0' END)"
                for i in range(8)
            )
            + " bucket FROM embeddings), "
            "r AS (SELECT bucket, min(vec_id) rep_id FROM b GROUP BY bucket), "
            "re AS (SELECT r.bucket, r.rep_id, e.embedding rep_emb FROM r "
            "JOIN embeddings e ON e.vec_id = r.rep_id), "
            "s AS (SELECT b.vec_id, b.bucket, re.rep_id, "
            "round(" + _cos_sql("b.embedding", "re.rep_emb") + ", 6) cos_rep "
            "FROM b JOIN re ON b.bucket = re.bucket) "
            "SELECT vec_id, bucket, rep_id, cos_rep, "
            "(vec_id = rep_id OR cos_rep < 0.7) keep FROM s"
        ),
        "pipeline_fuzzy_contamination": (
            "WITH "
            + _lsh_cross_ctes(" WHERE doc_id % 10 <> 7", " WHERE doc_id % 10 = 7")
            + " SELECT id_l, id_r, round(m / 8.0, 6) est_jaccard FROM cand "
            "WHERE round(m / 8.0, 6) >= 0.3"
        ),
        "text_length_percentiles": (
            "WITH t AS (SELECT source, len(string_split(text, ' ')) n FROM documents) "
            "SELECT source, CAST(count(*) AS BIGINT) n_docs, "
            "round(quantile_cont(n, 0.25), 6) p25, round(quantile_cont(n, 0.5), 6) p50, "
            "round(quantile_cont(n, 0.9), 6) p90, round(quantile_cont(n, 0.99), 6) p99 "
            "FROM t GROUP BY source"
        ),
        "pipeline_quality_topfrac": (
            "WITH t AS (SELECT doc_id, lang, "
            "len(string_split(lower(text), ' ')) nw, "
            f"len(list_filter(string_split(lower(text), ' '), w -> w IN {en})) hits "
            "FROM documents), "
            "q AS (SELECT doc_id, lang, round(CASE WHEN nw < 5 THEN 0.0 ELSE "
            "least(1.0, nw / 100.0) * 0.5 + least(1.0, (hits / nw) * 5.0) * 0.5 END, 6) "
            "quality FROM t), "
            "r AS (SELECT doc_id, lang, quality, "
            "row_number() OVER (PARTITION BY lang ORDER BY quality DESC, doc_id) q_rank, "
            "count(*) OVER (PARTITION BY lang) n FROM q) "
            "SELECT doc_id, lang, quality, CAST(q_rank AS BIGINT) q_rank FROM r "
            "WHERE q_rank <= ceil(n * 0.3)"
        ),
        "tpch_q10ish_returns": (
            "SELECT c_custkey, c_name, "
            + _DECSUM.format(x="l_extendedprice * (1.0 - l_discount)") + " revenue "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "WHERE l_returnflag = 'R' GROUP BY c_custkey, c_name "
            "ORDER BY revenue DESC, c_custkey LIMIT 20"
        ),
        "custom_stream_fn": (
            "SELECT event_id, unnest([0, 1, 2]) copy_idx FROM events "
            "WHERE value > 95.0"
        ),
        "custom_window": (
            "SELECT event_type, CAST(count(*) AS BIGINT) n FROM "
            f"(SELECT event_type, {_EMS} // 1800000 AS w FROM events) "
            "GROUP BY event_type, w"
        ),
        "text_dedup_stats": (
            "SELECT source, CAST(count(*) AS BIGINT) n_docs, "
            "CAST(count(DISTINCT md5(text)) AS BIGINT) n_unique, "
            "round(1 - count(DISTINCT md5(text)) / count(*), 6) dup_rate "
            "FROM documents GROUP BY source"
        ),
        "pipeline_embed": (
            "SELECT doc_id, "
            + ", ".join(
                f"round(CAST('0x' || substring(md5('{i}:' || text), 1, 8) AS BIGINT) "
                f"/ 2147483648.0 - 1.0, 6) e{i}"
                for i in range(4)
            )
            + " FROM documents"
        ),
        "pipeline_contamination_gate": (
            "WITH " + _shingle_cte("sb", " WHERE doc_id % 10 = 7") + ", "
            + _shingle_cte("st", " WHERE doc_id % 10 <> 7") + ", "
            f"sigb AS ({_sig_select('sb')}), sigt AS ({_sig_select('st')}), "
            + ", ".join(
                f"bb{b} AS (SELECT md5(sig_{2*b} || '|' || sig_{2*b+1}) bk, "
                f"min(doc_id) bid FROM sigb WHERE sig_0 IS NOT NULL GROUP BY 1)"
                for b in range(4)
            )
            + ", t AS (SELECT doc_id, "
            + ", ".join(
                f"CASE WHEN sig_0 IS NOT NULL THEN md5(sig_{2*b} || '|' || sig_{2*b+1}) END bk{b}"
                for b in range(4)
            )
            + " FROM sigt) "
            "SELECT t.doc_id, COALESCE(bb0.bid, bb1.bid, bb2.bid, bb3.bid) "
            "IS NOT NULL contaminated, "
            "COALESCE(bb0.bid, bb1.bid, bb2.bid, bb3.bid) bench_id FROM t "
            "LEFT JOIN bb0 ON t.bk0 = bb0.bk LEFT JOIN bb1 ON t.bk1 = bb1.bk "
            "LEFT JOIN bb2 ON t.bk2 = bb2.bk LEFT JOIN bb3 ON t.bk3 = bb3.bk"
        ),
        "tpch_q18ish_bigorders": (
            "WITH big AS (SELECT l_orderkey, "
            + _DECSUM.format(x="l_quantity") + " total_qty "
            "FROM lineitem GROUP BY l_orderkey HAVING total_qty > 300.0) "
            "SELECT o_custkey, l_orderkey, total_qty, o_totalprice "
            "FROM big JOIN orders ON l_orderkey = o_orderkey "
            "ORDER BY total_qty DESC, l_orderkey LIMIT 10"
        ),
    }
    # --- round-7 family consolidations (VERDICT r6 ask #2): compose each
    # family's combined oracle from the variant oracles above, then drop the
    # per-variant keys — the registry shrinks but every variant's rows stay
    # value-asserted (distinguished by the tag column) inside ONE entry.
    sql["window_cron_family"] = " UNION ALL ".join(
        f"SELECT '{tag}' AS variant, event_type, n FROM ({sql[key]})"
        for tag, key in [
            ("every10min", "window_cron"),
            ("calendar", "window_cron_calendar"),
            ("weekdays", "window_cron_weekdays"),
            ("monthend", "window_cron_monthend"),
            ("lastfriday", "window_cron_lastfriday"),
        ]
    )
    sql["join_outer_family"] = " UNION ALL ".join(
        f"SELECT '{tag}' AS variant, signup_id AS a_id, {b} AS b_id "
        f"FROM ({sql[key]})"
        for tag, key, b in [
            ("left", "join_left_outer", "purchase_id"),
            ("right", "join_right_outer", "purchase_id"),
            ("full", "join_full_outer", "error_id"),
        ]
    )
    sql["join_windowed_family"] = " UNION ALL ".join(
        f"SELECT '{tag}' AS variant, error_id, purchase_id FROM ({sql[key]})"
        for tag, key in [
            ("time_time", "join_time_time"),
            ("length_time", "join_length_time"),
        ]
    )
    # --- round-8 consolidation (VERDICT r7 ask #3): the strict-sequence
    # family. The first_attempt branch asserts first-attempt-ONLY semantics
    # (PARITY.md): per user, the FIRST value>95 event (NFA total order: ts,
    # then event_id) matches iff its IMMEDIATE successor is also value>95 —
    # the old fast path's first-SUCCESSFUL-pair bug (found by the round-7
    # property fuzz) would emit rows for ~79 additional sf0.01 users here.
    _first_attempt_sql = (
        "WITH t AS (SELECT user_id, event_id, value, "
        "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) rn "
        "FROM events), "
        "fa AS (SELECT user_id, min(rn) arn FROM t WHERE value > 95.0 "
        "GROUP BY user_id) "
        "SELECT a.user_id, a.event_id AS first_id, b.event_id AS second_id "
        "FROM fa JOIN t a ON a.user_id = fa.user_id AND a.rn = fa.arn "
        "JOIN t b ON b.user_id = fa.user_id AND b.rn = fa.arn + 1 "
        "WHERE b.value > 95.0"
    )
    sql["sequence_family"] = " UNION ALL ".join(
        f"SELECT '{tag}' AS variant, user_id, first_id, second_id FROM ({s})"
        for tag, s in [
            ("every_strict", sql["sequence_strict"]),
            ("first_attempt", _first_attempt_sql),
        ]
    )
    for k in (
        "window_cron", "window_cron_calendar", "window_cron_weekdays",
        "window_cron_monthend", "window_cron_lastfriday",
        "join_left_outer", "join_right_outer", "join_full_outer",
        "join_time_time", "join_length_time",
        "sequence_strict",
    ):
        del sql[k]
    return sql
