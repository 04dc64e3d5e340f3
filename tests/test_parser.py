"""Parser unit tests — queries taken from the reference's IT cases
(/root/reference/core/src/test/java/.../SiddhiCEPITCase.java)."""

from flink_siddhi_spark.siddhiql import ast as A
from flink_siddhi_spark.siddhiql import parse, parse_query


def test_identity_insert():
    q = parse_query("from inputStream insert into  outputStream")
    assert isinstance(q.input, A.SingleInput)
    assert q.input.stream == "inputStream"
    assert q.select is None
    assert q.insert_into == "outputStream"


def test_projection_select():
    q = parse_query(
        "from inputStream select timestamp, id, name, price insert into outputStream"
    )
    assert [s.expr.name for s in q.select] == ["timestamp", "id", "name", "price"]


def test_filter_and_alias():
    q = parse_query(
        "from inputStream[id == 2 and price > 10.0] select id as x, price * 2 as y insert into Out"
    )
    f = q.input.filter
    assert isinstance(f, A.Binary) and f.op == "and"
    assert q.select[0].alias == "x"
    assert isinstance(q.select[1].expr, A.Binary)


def test_windowed_join():
    # SiddhiCEPITCase.java:314-319
    q = parse_query(
        "from inputStream1#window.length(5) as s1 "
        "join inputStream2#window.time(500) as s2 "
        "on s1.id == s2.id "
        "select s1.timestamp as t, s1.name as n, s1.price as p1, s2.price as p2 "
        "insert into JoinStream"
    )
    j = q.input
    assert isinstance(j, A.JoinInput)
    assert j.left.window.name == "length" and j.left.window.args[0].value == 5
    assert j.right.window.name == "time" and j.right.window.args[0].value == 500
    assert j.left.alias == "s1" and j.right.alias == "s2"
    assert isinstance(j.on, A.Binary)


def test_pattern_followed_by():
    # SiddhiCEPITCase.java:344-347
    q = parse_query(
        "from every s1 = inputStream1[id == 2] "
        " -> s2 = inputStream2[id == 3] "
        "select s1.id as id_1, s1.name as name_1, s2.id as id_2, s2.name as name_2 "
        "insert into outputStream"
    )
    p = q.input
    assert isinstance(p, A.PatternInput)
    assert p.every is True
    assert p.connectors == ["->"]
    assert [e.alias for e in p.elems] == ["s1", "s2"]
    assert p.elems[0].filter.op == "=="


def test_sequence_with_quantifiers():
    # SiddhiCEPITCase.java:369-374
    q = parse_query(
        "from every s1 = inputStream1[id == 2]+ , "
        "s2 = inputStream2[id == 3]? "
        "within 1000 second "
        "select s1[0].name as n1, s2.name as n2 "
        "insert into outputStream"
    )
    p = q.input
    assert p.connectors == [","]
    assert p.elems[0].min_count == 1 and p.elems[0].max_count is None
    assert p.elems[1].min_count == 0 and p.elems[1].max_count == 1
    assert p.within_ms == 1_000_000
    ref = q.select[0].expr
    assert ref.stream == "s1" and ref.index == 0 and ref.name == "name"


def test_group_by_having_order_limit():
    q = parse_query(
        "from events#window.timeBatch(1 min) select event_type, sum(value) as total "
        "group by event_type having total > 5 order by total desc limit 3 offset 1 "
        "insert into Out"
    )
    assert q.input.window.name == "timeBatch"
    assert q.input.window.args[0].value == 60_000
    assert len(q.group_by) == 1
    assert q.having is not None
    assert q.order_by[0].desc is True
    assert q.limit == 3 and q.offset == 1


def test_define_stream_and_plan():
    plan = parse(
        "define stream inputStream (id int, timestamp long, name string, price double);"
        "from inputStream select id insert into Out;"
    )
    assert plan.definitions[0].name == "inputStream"
    assert [a.dtype for a in plan.definitions[0].attrs] == ["int", "long", "string", "double"]
    assert len(plan.queries) == 1


def test_partition_block():
    plan = parse(
        "partition with (user_id of events) begin "
        "from every s1 = events[event_type == 'error'] -> s2 = events[event_type == 'purchase'] "
        "select s1.event_id as a, s2.event_id as b insert into Out; "
        "end"
    )
    q = plan.queries[0]
    assert q.partition_by == {"events": "user_id"}


def test_time_literals_and_functions():
    q = parse_query(
        "from e#window.time(1 min 30 sec) select math:round(v) as r, coalesce(a, b) as c, "
        "ifThenElse(v > 3, 'hi', 'lo') as flag insert into Out"
    )
    assert q.input.window.args[0].value == 90_000
    assert q.select[0].expr.ns == "math"
    assert q.select[2].expr.name == "ifThenElse"


def test_not_filter_and_arith_precedence():
    q = parse_query("from e[not (a < 2 + 3 * 4) and b != 'x'] select a insert into O")
    f = q.input.filter
    assert f.op == "and"


def test_absence_pattern():
    q = parse_query(
        "from s1 = events[event_type == 'error'] -> not events[event_type == 'click'] for 5 sec "
        "select s1.event_id as eid insert into Out"
    )
    p = q.input
    assert p.elems[1].negated and p.elems[1].for_ms == 5000


def test_define_trigger_and_aggregation():
    from flink_siddhi_spark.siddhiql.parser import parse

    p = parse(
        "define trigger FiveSec at every 5 sec;"
        "define aggregation A from s select k, sum(v) as t group by k "
        "aggregate by ts every sec...year;"
        "from A within 0, 100 per 'days' select k, t insert into Out;"
    )
    assert p.triggers[0].name == "FiveSec" and p.triggers[0].period_ms == 5000
    a = p.aggregations[0]
    assert a.name == "A" and a.ts_ref.name == "ts"
    assert a.granularities == ["sec", "min", "hour", "day", "month", "year"]
    q = p.queries[0]
    assert q.agg_per == "days" and q.agg_within[0].value == 0


def test_table_dml_parsing():
    from flink_siddhi_spark.siddhiql.parser import parse

    p = parse(
        "define table T (k string, v double);"
        "from s select sym as k, price as v update or insert into T "
        "set T.v = T.v + v on T.k == k;"
    )
    dml = p.queries[0].dml
    assert dml.kind == "upsert" and dml.table == "T"
    assert dml.set_items[0][0].name == "v"


def test_query_without_output_action_rejected():
    from flink_siddhi_spark.errors import SiddhiParserException
    from flink_siddhi_spark.siddhiql.parser import parse_query

    import pytest

    with pytest.raises(SiddhiParserException, match="output action"):
        parse_query("from s select id")
