"""Event-table DML (`insert into T` / `update` / `delete` / `update or
insert`) — Siddhi event tables (reference README.md:26 "Event Tables",
declared surface). Batch contract in operators/tables.py docstring:
statements apply in plan order, last writer per key wins within a statement."""

import duckdb
import pytest

from flink_siddhi_spark import SiddhiCEP
from flink_siddhi_spark.errors import SiddhiPlannerException, UnsupportedFeatureException


@pytest.fixture()
def cep(spark):
    cep = SiddhiCEP(spark)
    df = spark.createDataFrame(
        [(1, "a", 10.0, 1000), (2, "b", 99.0, 2000), (3, "a", 50.0, 3000),
         (4, "c", 70.0, 4000)],
        "id int, sym string, price double, timestamp long")
    cep.define("s", df, "id", "sym", "price", "timestamp", ts_field="timestamp")
    return cep


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_upsert_last_writer_wins(cep):
    out = cep.from_("s").cql(
        "define table T (k string, v double);"
        "from s select sym as k, price as v update or insert into T on T.k == k;"
    ).returns("T")
    assert rows(out) == [("a", 50.0), ("b", 99.0), ("c", 70.0)]


def test_update_with_set_reads_old_row(cep):
    ex = cep.from_("s").cql(
        "define table T (k string, v double);"
        "from s select sym as k, price as v update or insert into T on T.k == k;"
        "from s[sym == 'a'] update T set T.v = T.v + price on T.k == sym;"
    )
    # upsert leaves a=50; `T.v = T.v + price` folds over BOTH a-events
    # (sequential replay: 50 + 10 + 50) -> 110
    assert rows(ex.returns("T")) == [("a", 110.0), ("b", 99.0), ("c", 70.0)]


def test_upsert_fold_accumulator(cep):
    # `T.hits = T.hits + 1` must count EVERY matching event (sequential
    # replay distributes as a per-key SUM), not just the last writer
    out = cep.from_("s").cql(
        "define table T (k string, v double, hits long);"
        "from s select sym as k, price as v, 1 as hits "
        "update or insert into T set T.v = v, T.hits = T.hits + 1 on T.k == k;"
    ).returns("T")
    assert rows(out) == [("a", 50.0, 2), ("b", 99.0, 1), ("c", 70.0, 1)]


def test_delete_by_condition(cep):
    ex = cep.from_("s").cql(
        "define table T (k string, v double);"
        "from s select sym as k, price as v update or insert into T on T.k == k;"
        "from s[price > 60.0] delete T on T.k == sym;"
    )
    assert rows(ex.returns("T")) == [("a", 50.0)]


def test_insert_into_table_appends(cep):
    ex = cep.from_("s").cql(
        "define table T (k string, v double);"
        "from s[sym == 'a'] select sym as k, price as v insert into T;"
    )
    assert rows(ex.returns("T")) == [("a", 10.0), ("a", 50.0)]


def test_table_state_persists_across_cql_calls(cep):
    cep.from_("s").cql(
        "define table T (k string, v double);"
        "from s select sym as k, price as v update or insert into T on T.k == k;"
    )
    out = cep.from_("s").cql(
        "from s[price > 60.0] delete T on T.k == sym;"
    ).returns("T")
    assert rows(out) == [("a", 50.0)]


def test_updated_table_joins_with_streams(cep):
    ex = cep.from_("s").cql(
        "define table T (k string, v double);"
        "from s select sym as k, price as v update or insert into T on T.k == k;"
        "from s join T on s.sym == T.k select s.id as id, T.v as last_v insert into Out;"
    )
    assert rows(ex.returns("Out")) == [
        (1, 50.0), (2, 99.0), (3, 50.0), (4, 70.0)]


def test_non_equi_on_rejected(cep):
    with pytest.raises(UnsupportedFeatureException):
        cep.from_("s").cql(
            "define table T (k string, v double);"
            "from s update T set T.v = price on T.v < price;"
        )


def test_upsert_against_sf_oracle(spark, sf_dir):
    from flink_siddhi_spark.sources.tables import load_table

    cep = SiddhiCEP(spark)
    ev = load_table(spark, sf_dir, "events")
    cep.register_stream("events", ev, *ev.columns, ts_field="ts")
    out = cep.from_("events").cql(
        "define table Last (user_id long, v double);"
        "from events select user_id, value as v "
        "update or insert into Last on Last.user_id == user_id;"
    ).returns("Last")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    oracle = sorted(tuple(r) for r in con.execute(
        "SELECT user_id, value FROM events QUALIFY "
        "row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, value DESC) = 1"
    ).fetchall())
    assert rows(out) == oracle
