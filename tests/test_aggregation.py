"""Incremental aggregation (`define aggregation ... aggregate every
sec...year` + `within`/`per` reads) — Siddhi incremental aggregation
(SURVEY.md §2.B "Aggregations", P2 row). Batch contract: each granularity is
the bucketed groupBy rollup of the source stream; `within [lo, hi)` filters
on bucket start; the read query runs over the materialized granularity."""

import duckdb
import pytest

from flink_siddhi_spark import SiddhiCEP
from flink_siddhi_spark.errors import SiddhiPlannerException


@pytest.fixture()
def cep(spark, sf_dir):
    from flink_siddhi_spark.sources.tables import load_table

    cep = SiddhiCEP(spark)
    events = load_table(spark, sf_dir, "events")
    cep.register_stream(
        "events", events, "event_id", "ts", "user_id", "event_type", "value", "props",
        ts_field="ts",
    )
    return cep


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    return con


AGG_DEF = (
    "define aggregation EventAgg "
    "from events "
    "select event_type, count() as n, sum(value) as total "
    "group by event_type "
    "aggregate every sec...year;"
)


def rows_set(df):
    return sorted(tuple(r) for r in df.collect())


def duck_set(duck, sql):
    return sorted(tuple(r) for r in duck.execute(sql).fetchall())


def test_day_granularity_rollup(cep, duck):
    out = cep.from_("events").cql(
        AGG_DEF +
        "from EventAgg per 'days' "
        "select AGG_TIMESTAMP, event_type, n, total insert into Out;"
    ).returns("Out")
    oracle = duck_set(
        duck,
        "SELECT epoch_ms(date_trunc('day', ts)) AGG_TIMESTAMP, event_type, "
        "CAST(count(*) AS BIGINT) n, "
        "CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) total "
        "FROM events GROUP BY 1, 2",
    )
    assert rows_set(out) == oracle


def test_within_filters_bucket_range(cep, duck):
    out = cep.from_("events").cql(
        AGG_DEF +
        "from EventAgg within '2024-01-01 06:00:00', '2024-01-01 12:00:00' per 'hours' "
        "select AGG_TIMESTAMP, event_type, n insert into Out;"
    ).returns("Out")
    oracle = duck_set(
        duck,
        "SELECT epoch_ms(date_trunc('hour', ts)) AGG_TIMESTAMP, event_type, "
        "CAST(count(*) AS BIGINT) n FROM events GROUP BY 1, 2 "
        "HAVING AGG_TIMESTAMP >= 1704088800000 AND AGG_TIMESTAMP < 1704110400000",
    )
    assert rows_set(out) == oracle


def test_reaggregation_over_read(cep, duck):
    # re-aggregate the day rollup: total per event_type across all days
    out = cep.from_("events").cql(
        AGG_DEF +
        "from EventAgg per 'days' select event_type, sum(n) as events "
        "group by event_type insert into Out;"
    ).returns("Out")
    oracle = duck_set(
        duck,
        "SELECT event_type, CAST(count(*) AS BIGINT) events FROM events GROUP BY 1",
    )
    assert rows_set(out) == oracle


def test_unknown_granularity_rejected(cep):
    with pytest.raises(SiddhiPlannerException):
        cep.from_("events").cql(
            "define aggregation A from events select count() as n aggregate every sec, min;"
            "from A per 'days' select n insert into Out;"
        )


def test_missing_per_rejected(cep):
    with pytest.raises(SiddhiPlannerException):
        cep.from_("events").cql(
            AGG_DEF + "from EventAgg select n insert into Out;"
        )
