"""Long-tail window kinds (SURVEY.md §2.B "Windows", P2 row:
``#window.sort / frequent / cron / delay`` plus ``unique/firstUnique/batch``)
checked against DuckDB oracles on the sf0.001 events parquet.

Batch-mode contract (operators/windows.py module docstring): retention
windows evaluate queries over the window's FINAL retained contents."""

import duckdb
import pytest

from flink_siddhi_spark import SiddhiCEP


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


def rows_set(df):
    return sorted(tuple(r) for r in df.collect())


def duck_set(duck, sql):
    return sorted(tuple(r) for r in duck.execute(sql).fetchall())


def test_sort_window_top_n(cep, duck):
    out = cep.from_("events").cql(
        "from events#window.sort(10, value, 'desc') "
        "select event_id, value insert into Out"
    ).returns("Out")
    oracle = duck_set(
        duck,
        "SELECT event_id, value FROM events "
        "ORDER BY value DESC, ts, event_id LIMIT 10",
    )
    assert rows_set(out) == oracle


def test_sort_window_asc_with_agg(cep, duck):
    out = cep.from_("events").cql(
        "from events#window.sort(25, value) "
        "select count() as n, min(value) as lo, max(value) as hi insert into Out"
    ).returns("Out")
    oracle = duck_set(
        duck,
        "SELECT CAST(25 AS BIGINT) n, min(value) lo, max(value) hi FROM "
        "(SELECT value FROM events ORDER BY value, ts, event_id LIMIT 25)",
    )
    assert rows_set(out) == oracle


def test_frequent_window(cep, duck):
    out = cep.from_("events").cql(
        "from events#window.frequent(2, event_type) "
        "select event_type, count() as n group by event_type insert into Out"
    ).returns("Out")
    oracle = duck_set(
        duck,
        "WITH top AS (SELECT event_type FROM events GROUP BY event_type "
        "ORDER BY count(*) DESC, event_type LIMIT 2) "
        "SELECT event_type, CAST(count(*) AS BIGINT) n FROM events "
        "WHERE event_type IN (SELECT event_type FROM top) GROUP BY event_type",
    )
    assert rows_set(out) == oracle


def test_unique_window_latest_per_key(cep, duck):
    out = cep.from_("events").cql(
        "from events#window.unique(user_id) "
        "select user_id, event_id, value insert into Out"
    ).returns("Out")
    oracle = duck_set(
        duck,
        "SELECT user_id, event_id, value FROM events "
        "QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1",
    )
    assert rows_set(out) == oracle


def test_first_unique_window(cep, duck):
    out = cep.from_("events").cql(
        "from events#window.firstUnique(user_id) "
        "select user_id, event_id insert into Out"
    ).returns("Out")
    oracle = duck_set(
        duck,
        "SELECT user_id, event_id FROM events "
        "QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) = 1",
    )
    assert rows_set(out) == oracle


def test_batch_window_whole_stream(cep, duck):
    out = cep.from_("events").cql(
        "from events#window.batch() select count() as n insert into Out"
    ).returns("Out")
    assert rows_set(out) == duck_set(duck, "SELECT CAST(count(*) AS BIGINT) n FROM events")


def test_delay_window_shifts_event_time(cep, duck):
    out = cep.from_("events").cql(
        "from events#window.delay(60000) "
        "select event_id, eventTimestamp() as ets insert into Out"
    ).returns("Out")
    oracle = duck_set(
        duck,
        "SELECT event_id, epoch_ms(ts) + 60000 AS ets FROM events",
    )
    assert rows_set(out) == oracle


def test_cron_window_fixed_period(cep, duck):
    out = cep.from_("events").cql(
        "from events#window.cron('0 */10 * * * ?') "
        "select event_type, count() as n group by event_type insert into Out"
    ).returns("Out")
    oracle = duck_set(
        duck,
        "SELECT event_type, CAST(count(*) AS BIGINT) n FROM "
        "(SELECT event_type, epoch_ms(ts) // 600000 AS w FROM events) "
        "GROUP BY event_type, w",
    )
    assert rows_set(out) == oracle


def test_cron_rejects_calendar_exprs(cep):
    # round 3: daily/weekly/monthly calendars are SUPPORTED (bucket-function
    # lowering); round 3b added day lists/ranges; only quartz specials and
    # month-restricted schedules still reject.
    from flink_siddhi_spark.errors import UnsupportedFeatureException

    out = cep.from_("events").cql(
        "from events#window.cron('0 15 10 * * ?') select count() as n insert into Out"
    ).returns("Out")
    assert out.count() > 0
    out = cep.from_("events").cql(
        "from events#window.cron('0 15 10 ? * MON-FRI') select count() as n insert into Out"
    ).returns("Out")
    assert out.count() > 0
    # round-4: quartz specials (6L) and month-restricted monthly schedules
    # are SUPPORTED now; what still rejects is a schedule with an unbounded
    # fire gap (29-31 or a 5th weekday restricted to listed months) and
    # month-restricted daily/weekly forms
    out = cep.from_("events").cql(
        "from events#window.cron('0 15 10 ? * 6L') select count() as n insert into Out"
    ).returns("Out")
    assert out.count() > 0
    out = cep.from_("events").cql(
        "from events#window.cron('0 15 10 1 6 ?') select count() as n insert into Out"
    ).returns("Out")
    assert out.count() > 0
    with pytest.raises(UnsupportedFeatureException, match="29-31|5th"):
        cep.from_("events").cql(
            "from events#window.cron('0 15 10 31 6 ?') select count() as n insert into Out"
        ).returns("Out")
    with pytest.raises(UnsupportedFeatureException):
        cep.from_("events").cql(
            "from events#window.cron('0 15 10 * 6 ?') select count() as n insert into Out"
        ).returns("Out")


def test_partitioned_sort_window_topk_per_key(cep, duck):
    out = cep.from_("events").cql(
        "partition with (event_type of events) begin "
        "from events#window.sort(3, value, 'desc') "
        "select event_type, event_id, value insert into Out; end"
    ).returns("Out")
    oracle = duck_set(
        duck,
        "SELECT event_type, event_id, value FROM events QUALIFY row_number() "
        "OVER (PARTITION BY event_type ORDER BY value DESC, ts, event_id) <= 3",
    )
    assert rows_set(out) == oracle


def test_partitioned_aggregation_groups_by_key(cep, duck):
    out = cep.from_("events").cql(
        "partition with (user_id of events) begin "
        "from events select user_id, count() as n insert into Out; end"
    ).returns("Out")
    oracle = duck_set(
        duck,
        "SELECT user_id, CAST(count(*) AS BIGINT) n FROM events GROUP BY user_id",
    )
    assert rows_set(out) == oracle


def test_partitioned_frequent_window(cep, duck):
    out = cep.from_("events").cql(
        "partition with (event_type of events) begin "
        "from events#window.frequent(2, user_id) "
        "select event_type, user_id, count() as n "
        "group by event_type, user_id insert into Out; end"
    ).returns("Out")
    oracle = duck_set(
        duck,
        "WITH c AS (SELECT event_type, user_id, count(*) n FROM events "
        "GROUP BY 1, 2), top AS (SELECT event_type, user_id FROM c "
        "QUALIFY row_number() OVER (PARTITION BY event_type "
        "ORDER BY n DESC, user_id) <= 2) "
        "SELECT e.event_type, e.user_id, CAST(count(*) AS BIGINT) n FROM events e "
        "JOIN top t ON e.event_type = t.event_type AND e.user_id = t.user_id "
        "GROUP BY e.event_type, e.user_id",
    )
    assert rows_set(out) == oracle


def test_time_length_window_hybrid_frame(cep, duck):
    # last 5 events within 10 min, per user — the count cap and the time cap
    # must both bind (10-min range alone holds >5 events for active users)
    out = cep.from_("events").cql(
        "from events#window.timeLength(10 min, 5) "
        "select event_id, count() as n group by user_id insert into Out"
    ).returns("Out")
    oracle = duck_set(
        duck,
        "WITH base AS (SELECT *, epoch_ms(ts) ems, row_number() OVER "
        "(PARTITION BY user_id ORDER BY epoch_ms(ts), event_id, user_id, "
        "event_type, value, props) rn FROM events) "
        "SELECT b.event_id, agg.n FROM base b JOIN (SELECT a.user_id u, a.rn, "
        "count(*) n FROM base a JOIN base c ON c.user_id = a.user_id "
        "AND c.rn BETWEEN a.rn - 4 AND a.rn AND c.ems > a.ems - 600000 "
        "GROUP BY a.user_id, a.rn) agg ON b.user_id = agg.u AND b.rn = agg.rn",
    )
    assert rows_set(out) == oracle


def test_time_length_time_cap_binds(spark, cep):
    # deterministic micro-case: 4 events, count cap 3, time cap 1000 ms.
    # event at t=5000 only sees itself (others older than 1s); event at
    # t=2000 sees t=1500 and t=2000 (t=1000 is exactly at the boundary,
    # excluded: frame is (t-1000, t])
    df = spark.createDataFrame(
        [(1, 1000, 1.0), (2, 1500, 2.0), (3, 2000, 4.0), (4, 5000, 8.0)],
        "id int, ts long, v double",
    )
    c2 = SiddhiCEP(spark)
    c2.register_stream("s", df, "id", "ts", "v", ts_field="ts")
    out = c2.from_("s").cql(
        "from s#window.timeLength(1 sec, 3) "
        "select id, sum(v) as sv insert into Out"
    ).returns("Out")
    assert rows_set(out) == [(1, 1.0), (2, 3.0), (3, 6.0), (4, 8.0)]


def test_time_length_count_cap_binds(spark):
    # all events inside the time bound; count cap 2 trims the frame
    df = spark.createDataFrame(
        [(1, 100, 1.0), (2, 200, 2.0), (3, 300, 4.0)],
        "id int, ts long, v double",
    )
    c2 = SiddhiCEP(spark)
    c2.register_stream("s", df, "id", "ts", "v", ts_field="ts")
    out = c2.from_("s").cql(
        "from s#window.timeLength(1 min, 2) "
        "select id, sum(v) as sv insert into Out"
    ).returns("Out")
    assert rows_set(out) == [(1, 1.0), (2, 3.0), (3, 6.0)]


def test_lossy_frequent_window(cep, duck):
    out = cep.from_("events").cql(
        "from events#window.lossyFrequent(0.013, 0.001, user_id, event_type) "
        "select event_id, user_id, event_type insert into Out"
    ).returns("Out")
    oracle = duck_set(
        duck,
        "WITH c AS (SELECT user_id, event_type, count(*) n FROM events "
        "GROUP BY 1, 2), tot AS (SELECT count(*) total FROM events) "
        "SELECT e.event_id, e.user_id, e.event_type FROM events e JOIN "
        "(SELECT user_id, event_type FROM c, tot WHERE n >= 0.012 * total) k "
        "ON e.user_id = k.user_id AND e.event_type = k.event_type",
    )
    assert rows_set(out) == oracle


def test_lossy_frequent_filters_rare_combo(spark):
    df = spark.createDataFrame(
        [(i, "a" if i < 9 else "b") for i in range(10)], "id int, k string"
    )
    c2 = SiddhiCEP(spark)
    c2.register_stream("s", df, "id", "k")
    out = c2.from_("s").cql(
        "from s#window.lossyFrequent(0.5, 0.1, k) select id, k insert into Out"
    ).returns("Out")
    assert rows_set(out) == [(i, "a") for i in range(9)]


def test_cron_monthend_skip_and_month_restriction(spark):
    """round-4: day-of-month 29-31 with Quartz SKIP semantics (short months
    do not fire: Jan 31 -> Mar 31 with no February fire) and month-restricted
    schedules ('0 0 0 15 1,MAR ?' fires only in listed months)."""
    from flink_siddhi_spark import SiddhiCEP

    def run(cron, rows):
        cep = SiddhiCEP(spark)
        df = spark.createDataFrame(
            rows, "id int, name string, price double, timestamp long")
        cep.define("s", df, "id", "name", "price", "timestamp", ts_field="timestamp")
        out = cep.from_("s").cql(
            f"from s#window.cron('{cron}') select min(id) as lo, count() as n "
            "group by name insert into Out").returns("Out")
        return sorted((r.lo, r.n) for r in out.collect())

    day = 86_400_000
    jan1 = 1704067200000          # 2024-01-01 00:00 UTC
    feb15 = jan1 + 45 * day       # 2024-02-15
    mar15 = jan1 + 74 * day       # 2024-03-15
    apr2 = jan1 + 92 * day        # 2024-04-02
    rows = [(1, "a", 1.0, jan1 + day),   # after Dec 31 fire, before Jan 31
            (2, "a", 1.0, feb15),        # after Jan 31 fire (Feb 31 skipped)
            (3, "a", 1.0, mar15),        # still in the Jan-31 bucket
            (4, "a", 1.0, apr2)]         # after Mar 31 fire
    # monthend '0 0 0 31 * ?': buckets split at Dec 31, Jan 31, Mar 31 —
    # ids 2 and 3 share a bucket because February 31 does not exist
    assert run("0 0 0 31 * ?", rows) == [(1, 1), (2, 2), (4, 1)]

    # leap-year Feb 29 DOES fire: '0 0 0 29 * ?' splits 2 (Feb 15, in the
    # Jan-29 bucket) from 3 (Mar 15, after the Feb-29 2024 fire)
    assert run("0 0 0 29 * ?", rows) == [(1, 1), (2, 1), (3, 1), (4, 1)]

    # month-restricted: fires only Jan 15 / Mar 15 00:00 — Feb events stay
    # in the Jan bucket; names and numbers mix in the month list
    rows2 = [(1, "a", 1.0, jan1 + 2 * day),   # after Dec... before Jan 15
             (2, "a", 1.0, jan1 + 20 * day),  # after Jan 15 fire
             (3, "a", 1.0, feb15),            # February never fires -> same bucket
             (4, "a", 1.0, mar15 + day)]      # after Mar 15 fire
    assert run("0 0 0 15 1,MAR ?", rows2) == [(1, 1), (2, 2), (4, 1)]


def test_cron_quartz_specials(spark):
    """round-4: quartz L / L-n / LW / D#n / DL specials lower to the same
    greatest-over-candidates bucket function (make_date/last_day/dayofweek
    arithmetic, NULL-skip for months without the target day)."""
    from flink_siddhi_spark import SiddhiCEP

    def run(cron, rows):
        cep = SiddhiCEP(spark)
        df = spark.createDataFrame(
            rows, "id int, name string, price double, timestamp long")
        cep.define("s", df, "id", "name", "price", "timestamp", ts_field="timestamp")
        out = cep.from_("s").cql(
            f"from s#window.cron('{cron}') select min(id) as lo, count() as n "
            "group by name insert into Out").returns("Out")
        return sorted((r.lo, r.n) for r in out.collect())

    day = 86_400_000
    jan1 = 1704067200000  # Mon 2024-01-01 00:00 UTC
    rows = [(1, "a", 1.0, jan1 + 10 * day),   # Jan 11
            (2, "a", 1.0, jan1 + 30 * day),   # Jan 31
            (3, "a", 1.0, jan1 + 45 * day),   # Feb 15
            (4, "a", 1.0, jan1 + 59 * day)]   # Feb 29 (leap)
    # L: fires Dec 31 / Jan 31 / Feb 29 at 00:00 — Jan 31 (id 2) opens a
    # bucket; Feb 29 00:00 fire puts id 4 (Feb 29 00:00 event) in its own
    assert run("0 0 0 L * ?", rows) == [(1, 1), (2, 2), (4, 1)]
    # L-1: fires Dec 30 / Jan 30 / Feb 28 — ids 2 (Jan 31) and 3 (Feb 15)
    # share the Jan-30 bucket; id 4 (Feb 29) after the Feb-28 fire
    assert run("0 0 0 L-1 * ?", rows) == [(1, 1), (2, 2), (4, 1)]
    # LW: last weekday — Dec 29 2023 (Fri; 31st is Sun), Jan 31 (Wed),
    # Feb 29 (Thu): same splits as L here
    assert run("0 0 0 LW * ?", rows) == [(1, 1), (2, 2), (4, 1)]
    # 2nd Friday (6#2): Dec 8 / Jan 12 / Feb 9 — id 1 (Jan 11) before
    # Jan 12, ids 2,3 between Jan 12 and Feb 9... Feb 15 is AFTER Feb 9
    assert run("0 0 0 ? * 6#2", rows) == [(1, 1), (2, 1), (3, 2)]
    # last Friday (6L): Dec 29 / Jan 26 / Feb 23 — id 2 (Jan 31) and id 3
    # (Feb 15) share the Jan-26 bucket; id 4 after Feb 23
    assert run("0 0 0 ? * FRIL", rows) == [(1, 1), (2, 2), (4, 1)]


def test_cron_calendar_bucket_property(spark):
    """round-4 property test: for a spread of calendar schedules (fixed days
    incl. 29-31, lists, month restrictions, L/L-n/LW/D#n/DL), the Spark
    bucket for every probe timestamp equals a brute-force Python 'last fire
    at-or-before' computed by enumerating fires month by month. Guards the
    per-form lookback bounds in the monthly lowering."""
    import calendar
    import datetime as dt

    from flink_siddhi_spark import SiddhiCEP

    def fires(year, month, spec, tod_s):
        """All fire datetimes of one schedule day-spec in (year, month)."""
        kind = spec[0]
        dim = calendar.monthrange(year, month)[1]
        if kind == "num":
            days = [spec[1]] if spec[1] <= dim else []
        elif kind == "last":
            days = [dim - spec[1]] if dim - spec[1] >= 1 else []
        elif kind == "lastw":
            d = dt.date(year, month, dim)
            adj = {5: 1, 6: 2}.get(d.weekday(), 0)  # Sat->Fri, Sun->Fri
            days = [dim - adj]
        elif kind == "nth_dow":
            code, n = spec[1], spec[2]  # quartz 1=SUN..7=SAT
            pyw = (code + 5) % 7        # python Monday=0
            first = dt.date(year, month, 1).weekday()
            day = 1 + (pyw - first) % 7 + 7 * (n - 1)
            days = [day] if day <= dim else []
        elif kind == "near_w":
            d = spec[1]
            if d > dim:
                days = []
            else:
                wd = dt.date(year, month, d).weekday()  # Mon=0..Sun=6
                if wd == 5:      # Saturday
                    days = [d + 2 if d == 1 else d - 1]
                elif wd == 6:    # Sunday
                    days = [d - 2 if d == dim else d + 1]
                else:
                    days = [d]
        else:  # last_dow
            code = spec[1]
            pyw = (code + 5) % 7
            last = dt.date(year, month, dim).weekday()
            days = [dim - (last - pyw) % 7]
        return [
            dt.datetime(year, month, d, tzinfo=dt.timezone.utc)
            + dt.timedelta(seconds=tod_s)
            for d in days
        ]

    def brute_bucket(ts_ms, specs, months, tod_s):
        t = dt.datetime.fromtimestamp(ts_ms / 1000, dt.timezone.utc)
        best = None
        y, m = t.year, t.month
        for _ in range(40):  # walk back far enough for any supported form
            if months is None or m in months:
                for sp in specs:
                    for f in fires(y, m, sp, tod_s):
                        if f.timestamp() * 1000 <= ts_ms:
                            best = f if best is None else max(best, f)
            if best is not None:
                return int(best.timestamp() * 1000)
            m -= 1
            if m == 0:
                y, m = y - 1, 12
        return None

    cases = [
        ("0 0 0 31 * ?", [("num", 31)], None),
        ("0 30 6 29 * ?", [("num", 29)], None),
        ("0 0 12 15,30 * ?", [("num", 15), ("num", 30)], None),
        ("0 0 0 15 1,MAR,7 ?", [("num", 15)], {1, 3, 7}),
        ("0 0 0 28 NOV-FEB ?", [("num", 28)], {11, 12, 1, 2}),
        ("0 0 0 L * ?", [("last", 0)], None),
        ("0 0 0 L-3 * ?", [("last", 3)], None),
        ("0 0 0 LW * ?", [("lastw",)], None),
        ("0 0 9 ? * 6#2", [("nth_dow", 6, 2)], None),
        ("0 0 0 ? * 2#5", [("nth_dow", 2, 5)], None),  # 5th Monday: skips
        ("0 0 0 ? * SATL", [("last_dow", 7)], None),
        ("0 0 0 1W * ?", [("near_w", 1)], None),
        ("0 0 0 15W * ?", [("near_w", 15)], None),
        ("0 0 0 31W * ?", [("near_w", 31)], None),  # skip + boundary clamp
        ("0 0 0 10-13 * ?", [("num", d) for d in range(10, 14)], None),
        ("0 0 0 1/9 * ?", [("num", d) for d in (1, 10, 19, 28)], None),
        ("0 0 0 ? * L", [("last_dow", None)], "weekly-sat"),
    ]
    # probe timestamps: spread over 2023-2025 incl. month starts/ends and
    # leap February
    probes = []
    base = dt.datetime(2023, 1, 1, tzinfo=dt.timezone.utc)
    for k in range(60):
        probes.append(int((base + dt.timedelta(days=k * 17.37)).timestamp() * 1000))
    for ymd in [(2024, 2, 29), (2024, 3, 1), (2023, 2, 28), (2024, 12, 31),
                (2025, 1, 1), (2024, 1, 31), (2024, 4, 30)]:
        probes.append(int(dt.datetime(*ymd, 11, 30, tzinfo=dt.timezone.utc)
                          .timestamp() * 1000))

    rows = [(i, "a", 1.0, ts) for i, ts in enumerate(probes)]
    df = spark.createDataFrame(rows, "id int, name string, price double, ts long")
    for cron, specs, months in cases:
        parts = cron.split()
        tod_s = int(parts[2]) * 3600 + int(parts[1]) * 60 + int(parts[0])
        if months == "weekly-sat":
            # bare L in the day-of-week field = SAT: weekly period schedule;
            # brute force = last Saturday-midnight at-or-before each probe
            def brute_sat(ts_ms):
                t = dt.datetime.fromtimestamp(ts_ms / 1000, dt.timezone.utc)
                day0 = t.replace(hour=0, minute=0, second=0, microsecond=0)
                back = (day0.weekday() - 5) % 7
                cand = day0 - dt.timedelta(days=back)
                if cand.timestamp() * 1000 > ts_ms:
                    cand -= dt.timedelta(days=7)
                return int(cand.timestamp() * 1000)
            cep = SiddhiCEP(spark)
            cep.define("s", df, "id", "name", "price", "ts", ts_field="ts")
            out = cep.from_("s").cql(
                "from s#window.cron('" + cron + "') "
                "select min(id) as lo, count() as n group by name insert into Out"
            ).returns("Out")
            got = sorted((r.lo, r.n) for r in out.collect())
            wg = {}
            for i, ts in enumerate(probes):
                wg.setdefault(brute_sat(ts), []).append(i)
            want = sorted((min(v), len(v)) for v in wg.values())
            assert got == want, (cron, got, want)
            continue
        cep = SiddhiCEP(spark)
        cep.define("s", df, "id", "name", "price", "ts", ts_field="ts")
        out = cep.from_("s").cql(
            "from s#window.cron('" + cron + "') "
            "select min(id) as lo, count() as n group by name insert into Out"
        ).returns("Out")
        got = sorted((r.lo, r.n) for r in out.collect())
        want_groups = {}
        for i, ts in enumerate(probes):
            b = brute_bucket(ts, specs, months, tod_s)
            want_groups.setdefault(b, []).append(i)
        want = sorted((min(v), len(v)) for v in want_groups.values())
        assert got == want, (cron, got, want)
