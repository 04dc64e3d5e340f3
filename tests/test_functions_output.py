"""Scalar function library breadth (SURVEY.md §2.B "Scalar functions" — all
compile to JVM-side Catalyst exprs) and `output first|last every ...` rate
limiting (SURVEY.md §2.B "Aggregations", P2 rate-limit row)."""

import duckdb
import pytest

from flink_siddhi_spark import SiddhiCEP
from flink_siddhi_spark.errors import UnsupportedFeatureException


@pytest.fixture()
def cep(spark):
    cep = SiddhiCEP(spark)
    df = spark.createDataFrame(
        [(i, f"w{i} x{i}", float(i), 1000 * i) for i in range(1, 11)],
        "id int, name string, price double, timestamp long")
    cep.define("s", df, "id", "name", "price", "timestamp", ts_field="timestamp")
    return cep


def test_string_function_family(cep):
    out = cep.from_("s").cql(
        "from s[id == 3] select str:split(name, ' ', 1) as tok, "
        "str:charAt(name, 0) as c0, str:replaceFirst(name, 'w', 'W') as rep, "
        "str:regexp(name, 'w[0-9]+ .*') as m, str:strcmp(name, 'w5 x5') as cmp, "
        "str:ltrim(str:concat('  ', name)) as lt, str:hex(name) as hx "
        "insert into Out"
    ).returns("Out")
    r = out.collect()[0]
    assert (r.tok, r.c0, r.rep, r.m, r.cmp) == ("x3", "w", "W3 x3", True, -1)
    assert r.lt == "w3 x3" and r.hx == "7733207833"


def test_time_and_misc_functions(cep):
    out = cep.from_("s").cql(
        "from s[id == 1] select time:date(timestamp) as d, "
        "time:dayOfWeek(timestamp) as dow, time:dateAdd(timestamp, 1000) as plus, "
        "maximum(id, 5) as mx, minimum(id, 5) as mn, "
        "instanceOfLong(timestamp) as isl insert into Out"
    ).returns("Out")
    r = out.collect()[0]
    assert (r.d, r.dow, r.plus, r.mx, r.mn, r.isl) == (
        "1970-01-01", "Thursday", 2000, 5, 1, True)


def test_output_last_every_n_events(cep):
    out = cep.from_("s").cql(
        "from s select id output last every 3 events insert into Out"
    ).returns("Out")
    assert sorted(r.id for r in out.collect()) == [3, 6, 9]


def test_output_first_every_n_events(cep):
    out = cep.from_("s").cql(
        "from s select id output first every 4 events insert into Out"
    ).returns("Out")
    assert sorted(r.id for r in out.collect()) == [1, 5, 9]


def test_output_first_every_time_bucket(cep):
    out = cep.from_("s").cql(
        "from s select id output first every 4 sec insert into Out"
    ).returns("Out")
    assert sorted(r.id for r in out.collect()) == [1, 4, 8]


def test_output_all_is_batch_noop(cep):
    out = cep.from_("s").cql(
        "from s select id output all every 5 events insert into Out"
    ).returns("Out")
    assert out.count() == 10


def test_output_firstlast_with_agg_rejected(cep):
    with pytest.raises(UnsupportedFeatureException):
        cep.from_("s").cql(
            "from s select count() as n output last every 3 events insert into Out"
        )
