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
