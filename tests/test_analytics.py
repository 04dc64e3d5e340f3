"""Round-5 late additions: set-based event analytics (sessionize, cohort
retention) and the corpus mixture/zipf statistics."""

import datetime as dt

import pytest

from flink_siddhi_spark.analytics import retention_cohorts, sessionize
from flink_siddhi_spark.llm.pipeline import mixture_weights
from flink_siddhi_spark.llm.text import zipf_table


def _ts(s):
    return dt.datetime.fromisoformat(s)


EVENTS_SCHEMA = "event_id bigint, ts timestamp_ntz, user_id bigint, value double"


def test_sessionize_gap_split(spark):
    rows = [
        # user 1: two sessions split by a 31-min gap; order deliberately
        # scrambled (the op sorts on (ts, event_id) itself)
        (3, _ts("2026-01-01 10:40:00"), 1, 3.0),
        (1, _ts("2026-01-01 10:00:00"), 1, 1.0),
        (2, _ts("2026-01-01 10:09:00"), 1, 2.0),
        # user 2: one session, one event
        (4, _ts("2026-01-01 00:00:00"), 2, 7.5),
    ]
    df = spark.createDataFrame(rows, EVENTS_SCHEMA)
    got = {
        (r.user_id, r.session_id): (r.start_ms, r.end_ms, r.n_events, r.total_value)
        for r in sessionize(df).collect()
    }
    base = int(_ts("2026-01-01 10:00:00").replace(tzinfo=dt.timezone.utc).timestamp() * 1000)
    assert got[(1, 1)] == (base, base + 9 * 60_000, 2, 3.0)
    assert got[(1, 2)] == (base + 40 * 60_000, base + 40 * 60_000, 1, 3.0)
    assert got[(2, 1)][2:] == (1, 7.5)
    assert len(got) == 3


def test_sessionize_gap_boundary(spark):
    # a gap of EXACTLY gap_ms stays in-session (strict > splits)
    rows = [
        (1, _ts("2026-01-01 10:00:00"), 1, 1.0),
        (2, _ts("2026-01-01 10:30:00"), 1, 1.0),
    ]
    df = spark.createDataFrame(rows, EVENTS_SCHEMA)
    out = sessionize(df).collect()
    assert len(out) == 1 and out[0].n_events == 2


def test_retention_cohorts(spark):
    rows = [
        # u1 joins day 0, active day 0 and day 2; u2 joins day 0 only;
        # u3 joins day 1, active day 1 and day 2
        (1, _ts("2026-03-01 05:00:00"), 1, 0.0),
        (2, _ts("2026-03-01 06:00:00"), 1, 0.0),  # same (user, day): 1 cell
        (3, _ts("2026-03-03 05:00:00"), 1, 0.0),
        (4, _ts("2026-03-01 09:00:00"), 2, 0.0),
        (5, _ts("2026-03-02 09:00:00"), 3, 0.0),
        (6, _ts("2026-03-03 09:00:00"), 3, 0.0),
    ]
    df = spark.createDataFrame(rows, EVENTS_SCHEMA)
    got = {
        (r.cohort_day, r.day_offset): r.n_users
        for r in retention_cohorts(df).collect()
    }
    assert got == {
        ("2026-03-01", 0): 2,
        ("2026-03-01", 2): 1,
        ("2026-03-02", 0): 1,
        ("2026-03-02", 1): 1,
    }


def test_mixture_weights_uniform_and_targets(spark):
    rows = [
        (1, "a b c d", "web"),    # 4 tokens
        (2, "a b", "web"),        # 2 tokens
        (3, "x y z", "books"),    # 3 tokens
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    got = {r.source: r for r in mixture_weights(df).collect()}
    assert got["web"].n_docs == 2 and got["web"].n_tokens == 6
    assert got["books"].n_tokens == 3
    assert got["web"].token_share == round(6 / 9, 6)
    # uniform target: each source should carry 1/2 the tokens
    assert got["web"].weight == round(0.5 / (6 / 9), 6)
    assert got["books"].weight == round(0.5 / (3 / 9), 6)
    # explicit targets: 90% books — and an unlisted source weighs 0
    got2 = {
        r.source: r.weight
        for r in mixture_weights(df, targets={"books": 0.9}).collect()
    }
    assert got2["books"] == round(0.9 / (3 / 9), 6)
    assert got2["web"] == 0.0


def test_zipf_table_ranks_and_ties(spark):
    rows = [(1, "b b b a a c"), (2, "a d")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = zipf_table(df, top_n=3).collect()
    # a and b tie at 3 -> 'a' first (term asc); top_n cuts 'c'/'d'
    assert [(r.rank, r.term, r.freq) for r in out] == [
        (1, "a", 3), (2, "b", 3), (3, "c", 1)
    ]
    import math

    assert out[1].log_rank == round(math.log10(2), 6)
    assert out[0].log_freq == round(math.log10(3), 6)


def test_sessionize_single_exchange(spark):
    # scale contract from the docstring: the closing (user, session) groupBy
    # reuses the window's hash(user) exchange — exactly ONE shuffle
    df = spark.createDataFrame(
        [(1, _ts("2026-01-01 10:00:00"), 1, 1.0)], EVENTS_SCHEMA
    )
    plan = sessionize(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
