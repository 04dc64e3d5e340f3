"""Property-based oracle testing: generate random SiddhiQL queries, run them
through the engine AND a mechanically-derived DuckDB translation, and require
identical result sets. Far stronger than the reference's line-count
assertions (SiddhiCEPITCase.java) — any filter/projection/aggregation
combination must match, not just hand-picked cases."""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flink_siddhi_spark import SiddhiCEP

NUM_COLS = ["value", "user_id", "event_id"]
CMP_OPS = ["<", "<=", ">", ">=", "==", "!="]
AGGS = ["sum", "count", "min", "max", "avg"]
EVENT_TYPES = ["click", "view", "purchase", "error", "signup"]


@pytest.fixture(scope="module")
def cep_and_duck(spark, sf_dir):
    from flink_siddhi_spark.sources.tables import load_table

    cep = SiddhiCEP(spark)
    events = load_table(spark, sf_dir, "events")
    cep.register_stream(
        "events", events, "event_id", "ts", "user_id", "event_type", "value", "props",
        ts_field="ts",
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    return cep, con


@st.composite
def predicates(draw):
    """(siddhi_pred, sql_pred) pairs over the events schema."""
    def leaf():
        kind = draw(st.integers(0, 2))
        if kind == 0:
            col = draw(st.sampled_from(NUM_COLS))
            op = draw(st.sampled_from(CMP_OPS))
            val = draw(st.integers(0, 100))
            sql_op = {"==": "=", "!=": "<>"}.get(op, op)
            return f"{col} {op} {val}", f"{col} {sql_op} {val}"
        if kind == 1:
            ty = draw(st.sampled_from(EVENT_TYPES))
            neg = draw(st.booleans())
            op, sop = ("!=", "<>") if neg else ("==", "=")
            return f"event_type {op} '{ty}'", f"event_type {sop} '{ty}'"
        col = draw(st.sampled_from(NUM_COLS))
        lo = draw(st.integers(0, 50))
        hi = lo + draw(st.integers(1, 50))
        return (
            f"{col} >= {lo} and {col} <= {hi}",
            f"{col} >= {lo} AND {col} <= {hi}",
        )

    s1, q1 = leaf()
    if draw(st.booleans()):
        conj = draw(st.sampled_from(["and", "or"]))
        s2, q2 = leaf()
        return f"({s1}) {conj} ({s2})", f"({q1}) {conj.upper()} ({q2})"
    return s1, q1


def rows_set(df):
    return sorted(
        tuple(round(v, 6) if isinstance(v, float) else v for v in r)
        for r in df.collect()
    )


def duck_set(con, sql):
    return sorted(
        tuple(round(v, 6) if isinstance(v, float) else v for v in r)
        for r in con.execute(sql).fetchall()
    )


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pred=predicates())
def test_random_filter_projection(cep_and_duck, pred):
    cep, con = cep_and_duck
    spred, qpred = pred
    out = cep.from_("events").cql(
        f"from events[{spred}] select event_id, user_id, value insert into Out"
    ).returns("Out")
    oracle = duck_set(
        con, f"SELECT event_id, user_id, value FROM events WHERE {qpred}"
    )
    assert rows_set(out) == oracle


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pred=predicates(), agg=st.sampled_from(AGGS),
       key=st.sampled_from(["event_type", "user_id"]))
def test_random_group_aggregate(cep_and_duck, pred, agg, key):
    cep, con = cep_and_duck
    spred, qpred = pred
    scall = f"{agg}(value)" if agg != "count" else "count()"
    out = cep.from_("events").cql(
        f"from events[{spred}] select {key}, {scall} as x "
        f"group by {key} insert into Out"
    ).returns("Out")
    if agg == "count":
        sqlagg = "CAST(count(*) AS BIGINT)"
    elif agg == "sum":
        sqlagg = "CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE)"
    elif agg == "avg":
        sqlagg = "CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) / COUNT(value)"
    else:
        sqlagg = f"{agg}(value)"
    oracle = duck_set(
        con,
        f"SELECT {key}, {sqlagg} x FROM events WHERE {qpred} GROUP BY {key}",
    )
    assert rows_set(out) == oracle
