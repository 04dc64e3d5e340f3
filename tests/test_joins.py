"""Windowed stream-stream join and stream-table join tests
(reference scenario: SiddhiCEPITCase.java:306-327)."""

import duckdb
import pytest

from flink_siddhi_spark import SiddhiCEP


def make_events(spark, rows):
    return spark.createDataFrame(rows, "id int, name string, price double, timestamp long")


@pytest.fixture()
def cep(spark):
    return SiddhiCEP(spark)


def test_time_time_join_exact(cep, spark):
    # s1 events at t=0,1000,2000...; s2 at 500,1500; window.time(600) both sides
    r1 = [(1, "a", 1.0, 0), (1, "b", 2.0, 1000), (2, "c", 3.0, 2000)]
    r2 = [(1, "x", 9.0, 500), (1, "y", 8.0, 1500), (2, "z", 7.0, 2100)]
    cep.define("s1", make_events(spark, r1), "id", "name", "price", "timestamp", ts_field="timestamp")
    cep.register_stream("s2", make_events(spark, r2), "id", "name", "price", "timestamp", ts_field="timestamp")
    out = cep.from_("s1").cql(
        "from s1#window.time(600) as a join s2#window.time(600) as b on a.id == b.id "
        "select a.name as an, b.name as bn insert into Out"
    ).returns("Out")
    got = sorted((r.an, r.bn) for r in out.collect())
    # pairs within 600ms & same id: (a,x) 0/500, (b,x) 1000/500, (b,y) 1000/1500, (c,z) 2000/2100
    assert got == [("a", "x"), ("b", "x"), ("b", "y"), ("c", "z")]


def test_length_time_join_reference_shape(cep, spark):
    # reference query shape (SiddhiCEPITCase.java:314-319)
    r1 = [(i, "e1", float(i), 1000 * i) for i in range(10)]
    r2 = [(i, "e2", float(i) * 2, 1000 * i + 100) for i in range(10)]
    cep.define("inputStream1", make_events(spark, r1), "id", "name", "price", "timestamp", ts_field="timestamp")
    cep.register_stream("inputStream2", make_events(spark, r2), "id", "name", "price", "timestamp", ts_field="timestamp")
    out = cep.from_("inputStream1").cql(
        "from inputStream1#window.length(5) as s1 "
        "join inputStream2#window.time(500) as s2 "
        "on s1.id == s2.id "
        "select s1.timestamp as t, s1.name as n, s1.price as p1, s2.price as p2 "
        "insert into JoinStream"
    ).returns("JoinStream")
    # each s2[i] arrives 100ms after s1[i]: s1[i] is within last-5 when s2[i] arrives
    # -> 10 pairs; reverse direction (s2 earlier within 500ms of later s1 with same id)
    # never matches a *different* id, and same-id s2 arrives after s1. So 10 rows.
    assert out.count() == 10


def test_left_outer_join(cep, spark):
    r1 = [(1, "a", 1.0, 0), (5, "q", 2.0, 1000)]
    r2 = [(1, "x", 9.0, 100)]
    cep.define("s1", make_events(spark, r1), "id", "name", "price", "timestamp", ts_field="timestamp")
    cep.register_stream("s2", make_events(spark, r2), "id", "name", "price", "timestamp", ts_field="timestamp")
    out = cep.from_("s1").cql(
        "from s1#window.time(1 sec) as a left outer join s2#window.time(1 sec) as b "
        "on a.id == b.id select a.name as an, b.name as bn insert into Out"
    ).returns("Out")
    got = sorted(((r.an, r.bn) for r in out.collect()), key=lambda t: t[0])
    assert got == [("a", "x"), ("q", None)]


def test_stream_table_join(cep, spark, sf_dir):
    from flink_siddhi_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    cep.register_stream("orders", orders, "o_orderkey", "o_custkey", "o_orderstatus",
                        "o_totalprice", "o_orderdate", "o_orderpriority", ts_field="o_orderdate")
    cep.register_table("customer", customer, "c_custkey", "c_name", "c_nationkey",
                       "c_acctbal", "c_mktsegment")
    out = cep.from_("orders").cql(
        "from orders join customer on o_custkey == c_custkey "
        "select o_orderkey, c_name, o_totalprice insert into Out"
    ).returns("Out")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{sf_dir}/orders.parquet'")
    con.execute(f"CREATE VIEW customer AS SELECT * FROM '{sf_dir}/customer.parquet'")
    oracle = con.execute(
        "SELECT o_orderkey, c_name, o_totalprice FROM orders JOIN customer ON o_custkey = c_custkey"
    ).fetchall()
    assert sorted(tuple(r) for r in out.collect()) == sorted(tuple(r) for r in oracle)
    # scale check: the table side must be broadcast
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_join_with_agg(cep, spark, sf_dir):
    from flink_siddhi_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    cep.register_stream("orders", orders, "o_orderkey", "o_custkey", "o_orderstatus",
                        "o_totalprice", "o_orderdate", "o_orderpriority", ts_field="o_orderdate")
    cep.register_table("customer", customer, "c_custkey", "c_name", "c_nationkey",
                       "c_acctbal", "c_mktsegment")
    out = cep.from_("orders").cql(
        "from orders join customer on o_custkey == c_custkey "
        "select c_mktsegment, count() as n, sum(o_totalprice) as total "
        "group by c_mktsegment insert into Out"
    ).returns("Out")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{sf_dir}/orders.parquet'")
    con.execute(f"CREATE VIEW customer AS SELECT * FROM '{sf_dir}/customer.parquet'")
    oracle = con.execute(
        "SELECT c_mktsegment, CAST(count(*) AS BIGINT) n, "
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) total "
        "FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment"
    ).fetchall()
    assert sorted(tuple(r) for r in out.collect()) == sorted(tuple(r) for r in oracle)
