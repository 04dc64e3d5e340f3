"""Remaining reference IT scenarios and long-tail language features:
3-way union + multi-query fan-in (SiddhiCEPITCase.java:282-299), quantifier
counts, 'in table' predicates, multi-output, UDF slow path."""

import pytest

from pyspark.sql import functions as F

from flink_siddhi_spark import SiddhiCEP


def make_events(spark, rows):
    return spark.createDataFrame(rows, "id int, name string, price double, timestamp long")


@pytest.fixture()
def cep(spark):
    return SiddhiCEP(spark)


def test_union_three_sources_multi_query(cep, spark):
    # SiddhiCEPITCase.java:282-299: 3 x 10-event sources, 3 queries into one
    # output stream -> 30 rows
    mk = lambda name: make_events(
        spark, [(i, name, float(i), 1000 * i) for i in range(10)]
    )
    out = (
        cep.define("stream1", mk("s1"), "id", "name", "price", "timestamp", ts_field="timestamp")
        .union("stream2", mk("s2"), "id", "name", "price", "timestamp", ts_field="timestamp")
        .union("stream3", mk("s3"), "id", "name", "price", "timestamp", ts_field="timestamp")
        .cql(
            "from stream1 select timestamp, id, name, price insert into outputStream;"
            "from stream2 select timestamp, id, name, price insert into outputStream;"
            "from stream3 select timestamp, id, name, price insert into outputStream;"
        )
        .returns("outputStream")
    )
    assert out.count() == 30
    assert out.columns == ["timestamp", "id", "name", "price"]


def test_quantifier_count_range(cep, spark):
    # <2:3>: exactly 2-3 consecutive matches then breaker
    rows = [(2, "a", 1.0, 1000), (2, "b", 1.0, 2000), (2, "c", 1.0, 3000),
            (2, "d", 1.0, 4000), (3, "e", 1.0, 5000)]
    cep.define("s", make_events(spark, rows), "id", "name", "price", "timestamp", ts_field="timestamp")
    out = cep.from_("s").cql(
        "from a = s[id == 2]<2:3> , b = s[id == 3] "
        "select a[0].name as a0, a[1].name as a1, b.name as bn insert into Out"
    ).returns("Out")
    rows_out = out.collect()
    # greedy: captures a,b,c (max 3) — then d cannot extend (max reached) and
    # does not match b -> strict seq kills... d matches elem a but max hit ->
    # tries advance to b: no -> dies. every NOT set -> single attempt dies -> 0
    assert len(rows_out) == 0
    out2 = cep.from_("s").cql(
        "from every a = s[id == 2]<2:3> , b = s[id == 3] "
        "select a[0].name as a0, b.name as bn insert into Out2"
    ).returns("Out2")
    got = sorted((r.a0, r.bn) for r in out2.collect())
    # partial starting at 'b': captures b,c,d then e matches breaker; partial
    # starting at 'c': captures c,d then e -> both complete
    assert got == [("b", "e"), ("c", "e")]


def test_star_quantifier(cep, spark):
    rows = [(1, "x", 1.0, 1000), (3, "y", 1.0, 2000)]
    cep.define("s", make_events(spark, rows), "id", "name", "price", "timestamp", ts_field="timestamp")
    out = cep.from_("s").cql(
        "from a = s[id == 1] , b = s[id == 2]* , c = s[id == 3] "
        "select a.name as an, c.name as cn insert into Out"
    ).returns("Out")
    assert [(r.an, r.cn) for r in out.collect()] == [("x", "y")]


def test_in_table_predicate(cep, spark, sf_dir):
    from flink_siddhi_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    vip = customer.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    cep.register_stream("orders", orders, "o_orderkey", "o_custkey", "o_orderstatus",
                        "o_totalprice", "o_orderdate", "o_orderpriority",
                        ts_field="o_orderdate")
    cep.register_table("vip", vip, "c_custkey")
    out = cep.from_("orders").cql(
        "from orders[o_custkey in vip and o_totalprice > 100.0] "
        "select o_orderkey, o_custkey insert into Out"
    ).returns("Out")
    expected = (
        orders.join(vip, orders.o_custkey == vip.c_custkey, "left_semi")
        .filter("o_totalprice > 100.0").count()
    )
    assert out.count() == expected
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_returns_many(cep, spark):
    rows = [(i, "e", float(i), 1000 * i) for i in range(10)]
    cep.define("s", make_events(spark, rows), "id", "name", "price", "timestamp", ts_field="timestamp")
    outs = cep.from_("s").cql(
        "from s[id < 5] select id insert into Low;"
        "from s[id >= 5] select id insert into High;"
    ).returns_many(["Low", "High"])
    assert outs["Low"].count() == 5 and outs["High"].count() == 5


def test_python_udf_extension(cep, spark):
    # slow-path extension: plain Python UDF (reference UDF parity:
    # CustomPlusFunctionExtension.java:38-116 via registerExtension)
    rows = [(1, "x", 2.5, 1000)]
    cep.define("s", make_events(spark, rows), "id", "name", "price", "timestamp", ts_field="timestamp")
    plus = F.udf(lambda a, b: float(a) + float(b), "double")
    cep.register_extension("custom:plus", lambda a, b: plus(a, b))
    out = cep.from_("s").cql(
        "from s select custom:plus(price, price) as doubled insert into Out"
    ).returns("Out")
    assert out.first().doubled == 5.0


def test_first_last_aggregates(cep, spark):
    rows = [(1, "a", 10.0, 1000), (1, "b", 20.0, 2000), (2, "c", 30.0, 3000)]
    cep.define("s", make_events(spark, rows), "id", "name", "price", "timestamp", ts_field="timestamp")
    out = cep.from_("s").cql(
        "from s select id, first(name) as fn, last(name) as ln group by id insert into Out"
    ).returns("Out")
    got = sorted(tuple(r) for r in out.collect())
    assert got == [(1, "a", "b"), (2, "c", "c")]


def test_environment_extension_and_join(spark):
    # testRegisterStreamAndExtensionWithSiddhiCEPEnvironment
    # (SiddhiCEPITCase.java:413-440): environment factory + extension
    # registration + registered streams + windowed join through the env.
    cep = SiddhiCEP.get_siddhi_environment(spark)
    cep.register_extension("custom:plus", lambda a, b: a + b)
    r1 = [(i, "e1", float(i), 1000 * i) for i in range(5)]
    r2 = [(i, "e2", float(i) * 2, 1000 * i + 100) for i in range(5)]
    cep.register_stream("inputStream1", make_events(spark, r1),
                        "id", "name", "price", "timestamp", ts_field="timestamp")
    cep.register_stream("inputStream2", make_events(spark, r2),
                        "id", "name", "price", "timestamp", ts_field="timestamp")
    out = cep.from_("inputStream1").union("inputStream2").cql(
        "from inputStream1#window.length(5) as s1 "
        "join inputStream2#window.time(500) as s2 "
        "on s1.id == s2.id "
        "select s1.timestamp as t, s1.name as n, custom:plus(s1.price, s2.price) as p "
        "insert into JoinStream"
    ).returns("JoinStream")
    rows = {r.t: r.p for r in out.collect()}
    assert len(rows) == 5
    assert rows[2000] == 2.0 + 4.0  # extension applied inside the join select


def test_bare_insert_and_return_as_row(cep, spark):
    # testSimplePojoStreamAndReturnPojo / testReturnsTransformRow
    # (SiddhiCEPITCase.java:85-140): identity query, row-shaped return
    rows = [(i, "n", float(i), 1000 * i) for i in range(1, 7)]
    cep.define("inputStream", make_events(spark, rows),
               "id", "name", "price", "timestamp", ts_field="timestamp")
    out = cep.from_("inputStream").cql(
        "from inputStream select * insert into outputStream"
    ).returnAsRow("outputStream")
    assert out.count() == 6
    assert set(out.columns) >= {"id", "name", "price", "timestamp"}


def test_returns_undefined_output_stream_raises(cep, spark):
    from flink_siddhi_spark.errors import UndefinedStreamException

    cep.define("s", make_events(spark, [(1, "a", 1.0, 0)]),
               "id", "name", "price", "timestamp", ts_field="timestamp")
    ex = cep.from_("s").cql("from s select id insert into Out")
    with pytest.raises(UndefinedStreamException):
        ex.returns("NotAStream")


def test_write_and_read_file_sink(spark, tmp_path):
    # testSimpleWriteAndRead (SiddhiCEPITCase.java:93-114): sink 6 events to
    # files, read them back, count 6
    import json as _json

    from flink_siddhi_spark.sources.streams import file_stream, to_files

    src = tmp_path / "in"
    out_dir = tmp_path / "out"
    ck = tmp_path / "ck"
    df = make_events(spark, [(i, "n", float(i), 1000 * i) for i in range(1, 7)])
    df.write.parquet(str(src))
    stream = file_stream(spark, str(src), df.schema)
    q = to_files(stream, str(out_dir), str(ck), fmt="json")
    q.awaitTermination(120)
    lines = []
    for p in out_dir.glob("*.json"):
        lines += [ln for ln in p.read_text().splitlines() if ln.strip()]
    assert len(lines) == 6
    assert {_json.loads(ln)["id"] for ln in lines} == set(range(1, 7))


def test_unknown_field_rejected(cep, spark):
    # mirror of StreamSchemaTest.testStreamSchemaWithPojoAndUnknownField:
    # declaring a field absent from the source schema must fail fast
    from flink_siddhi_spark.errors import SiddhiPlannerException

    df = spark.createDataFrame([(1, "a")], "id int, name string")
    with pytest.raises(SiddhiPlannerException, match="unknownfield"):
        cep.register_stream("s_unknown", df, "id", "unknownfield")
    with pytest.raises(SiddhiPlannerException, match="ts_field"):
        cep.register_stream("s_badts", df, "id", "name", ts_field="nope")


def test_duplicate_stream_rejected(cep, spark):
    # reference raises on re-registering a stream id (SiddhiCEP.registerStream)
    from flink_siddhi_spark.errors import DuplicatedStreamException

    df = spark.createDataFrame([(1,)], "id int")
    cep.register_stream("s_dup", df, "id")
    with pytest.raises(DuplicatedStreamException):
        cep.register_stream("s_dup", df, "id")
