"""Round-5 late additions: set-based event analytics (sessionize, cohort
retention, funnel, rolling active users, interval join, z-score anomalies)
and the corpus mixture/zipf/rollup/stratified-sample statistics."""

import datetime as dt

import pytest

from flink_siddhi_spark.analytics import (
    funnel,
    interval_join,
    retention_cohorts,
    rolling_active_users,
    sessionize,
    zscore_anomalies,
)
from flink_siddhi_spark.llm.pipeline import mixture_weights, stratified_sample_exact
from flink_siddhi_spark.llm.text import source_rollup, zipf_table


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


FUNNEL_SCHEMA = "event_id bigint, ts timestamp_ntz, user_id bigint, event_type string"


def _fev(i, s, u, t):
    return (i, _ts(s), u, t)


def test_funnel_sequential_order(spark):
    rows = [
        # u1 converts in order; u2 has the purchase BEFORE the click (the
        # click->purchase edge must not count it); u3 only views
        _fev(1, "2026-01-01 10:00:00", 1, "view"),
        _fev(2, "2026-01-01 10:05:00", 1, "click"),
        _fev(3, "2026-01-01 10:10:00", 1, "purchase"),
        _fev(4, "2026-01-01 10:00:00", 2, "view"),
        _fev(5, "2026-01-01 09:00:00", 2, "purchase"),
        _fev(6, "2026-01-01 10:05:00", 2, "click"),
        _fev(7, "2026-01-01 10:00:00", 3, "view"),
    ]
    df = spark.createDataFrame(rows, FUNNEL_SCHEMA)
    got = {r.step: r.n_users for r in funnel(df, ["view", "click", "purchase"]).collect()}
    assert got == {"view": 3, "click": 2, "purchase": 1}


def test_funnel_earliest_completion_not_greedy(spark):
    # earliest-completion semantics: t1 is the FIRST click after t0 even if
    # a later click would enable a purchase — u1's purchase at 10:02 is
    # counted because it follows the first click (10:01), not the last
    rows = [
        _fev(1, "2026-01-01 10:00:00", 1, "view"),
        _fev(2, "2026-01-01 10:01:00", 1, "click"),
        _fev(3, "2026-01-01 10:02:00", 1, "purchase"),
        _fev(4, "2026-01-01 10:03:00", 1, "click"),
    ]
    df = spark.createDataFrame(rows, FUNNEL_SCHEMA)
    got = {r.step: r.n_users for r in funnel(df, ["view", "click", "purchase"]).collect()}
    assert got["purchase"] == 1


def test_funnel_within_horizon(spark):
    rows = [
        # u1: click 2h after view -> outside a 1h horizon
        _fev(1, "2026-01-01 10:00:00", 1, "view"),
        _fev(2, "2026-01-01 12:00:00", 1, "click"),
        # u2: click 30min after view -> inside
        _fev(3, "2026-01-01 10:00:00", 2, "view"),
        _fev(4, "2026-01-01 10:30:00", 2, "click"),
    ]
    df = spark.createDataFrame(rows, FUNNEL_SCHEMA)
    got = {
        r.step: r.n_users
        for r in funnel(df, ["view", "click"], within_ms=3_600_000).collect()
    }
    assert got == {"view": 2, "click": 1}


def test_funnel_strictly_after_and_empty(spark):
    # same-timestamp click does NOT satisfy "strictly after"; empty input
    # yields all-zero counts (not an empty frame)
    rows = [
        _fev(1, "2026-01-01 10:00:00", 1, "view"),
        _fev(2, "2026-01-01 10:00:00", 1, "click"),
    ]
    df = spark.createDataFrame(rows, FUNNEL_SCHEMA)
    got = {r.step: r.n_users for r in funnel(df, ["view", "click"]).collect()}
    assert got == {"view": 1, "click": 0}
    empty = spark.createDataFrame([], FUNNEL_SCHEMA)
    got0 = {r.step: r.n_users for r in funnel(empty, ["view", "click"]).collect()}
    assert got0 == {"view": 0, "click": 0}
    with pytest.raises(ValueError):
        funnel(df, ["view"])


def test_rolling_active_users(spark):
    rows = [
        # u1 active day1 + day3; u2 active day1; day2 has no events at all
        # (and must not appear); day3's trailing-7 window covers day1
        _fev(1, "2026-01-01 10:00:00", 1, "view"),
        _fev(2, "2026-01-01 11:00:00", 2, "view"),
        _fev(3, "2026-01-03 10:00:00", 1, "view"),
    ]
    df = spark.createDataFrame(rows, FUNNEL_SCHEMA)
    got = {r.day: (r.dau, r.rolling_users) for r in rolling_active_users(df).collect()}
    assert got == {"2026-01-01": (2, 2), "2026-01-03": (1, 2)}
    # a 1-day window degenerates to DAU
    got1 = {
        r.day: (r.dau, r.rolling_users)
        for r in rolling_active_users(df, window_days=1).collect()
    }
    assert got1 == {"2026-01-01": (2, 2), "2026-01-03": (1, 1)}


def test_interval_join_bucket_boundaries(spark):
    iv = spark.createDataFrame(
        [(1, 1000, 5000), (2, 7000, 7000)], "iv_id int, s bigint, e bigint"
    )
    pts = spark.createDataFrame(
        [(10, 1000), (11, 5000), (12, 5001), (13, 7000), (14, 6999)],
        "p_id int, p bigint",
    )
    # bucket smaller than the interval -> interval spans several buckets;
    # inclusive bounds on both ends; each matching pair appears EXACTLY once
    got = sorted(
        (r.iv_id, r.p_id)
        for r in interval_join(iv, pts, "s", "e", "p", bucket=1024).collect()
    )
    assert got == [(1, 10), (1, 11), (2, 13)]


def test_interval_join_keys(spark):
    iv = spark.createDataFrame([(1, 0, 10_000)], "k int, s bigint, e bigint")
    pts = spark.createDataFrame([(1, 500), (2, 500)], "k int, p bigint")
    got = interval_join(iv, pts, "s", "e", "p", keys=["k"]).collect()
    assert len(got) == 1 and got[0].k == 1


def test_zscore_anomalies(spark):
    # group 'a': nine 10.0s and one 110.0 -> mean 20, var 900, std 30,
    # z(110) = 3; the 10.0 rows sit at z = -1/3 and must not be flagged
    rows = [(i, "a", 10.0) for i in range(9)] + [(9, "a", 110.0)]
    df = spark.createDataFrame(rows, "event_id bigint, event_type string, value double")
    got = zscore_anomalies(df, threshold=2.0).collect()
    assert [(r.event_id, r.z) for r in got] == [(9, 3.0)]
    # constant group: std 0 -> no flags (and no division error)
    const = spark.createDataFrame(
        [(1, "c", 5.0), (2, "c", 5.0)], "event_id bigint, event_type string, value double"
    )
    assert zscore_anomalies(const).collect() == []


def test_stratified_sample_exact_counts(spark):
    rows = [(i, "en" if i < 10 else "de") for i in range(13)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    out = stratified_sample_exact(df, 0.2, stratum_col="lang").collect()
    by = {}
    for r in out:
        by.setdefault(r.lang, []).append(r.srank)
    # ceil(0.2*10)=2 en rows, ceil(0.2*3)=1 de row, ranks contiguous from 1
    assert sorted(by["en"]) == [1, 2] and by["de"] == [1]
    # determinism: same call returns the same doc_ids
    again = {r.doc_id for r in stratified_sample_exact(df, 0.2, stratum_col="lang").collect()}
    assert again == {r.doc_id for r in out}
    # fraction 1.0 keeps everything; bad fractions reject
    assert stratified_sample_exact(df, 1.0, stratum_col="lang").count() == 13
    with pytest.raises(ValueError):
        stratified_sample_exact(df, 0.0)


def test_stratified_sample_integer_ppm_boundary(spark):
    # 0.2 * 65 rows: double math gives 13.000000000000002 -> ceil 14 (wrong);
    # integer ppm keeps exactly 13
    df = spark.createDataFrame([(i, "x") for i in range(65)], "doc_id bigint, lang string")
    assert stratified_sample_exact(df, 0.2, stratum_col="lang").count() == 13


def test_source_rollup_levels(spark):
    rows = [
        (1, "a b", "s1", "en"),
        (2, "c", "s1", "de"),
        (3, "d e f", "s2", "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string, lang string")
    got = {
        (r.source, r.lang): (r.n_docs, r.n_tokens, r.lvl)
        for r in source_rollup(df).collect()
    }
    assert got[("s1", "en")] == (1, 2, 0)
    assert got[("s1", "de")] == (1, 1, 0)
    assert got[("s2", "en")] == (1, 3, 0)
    assert got[("s1", "(all)")] == (2, 3, 1)
    assert got[("s2", "(all)")] == (1, 3, 1)
    assert got[("(all)", "(all)")] == (3, 6, 3)
    assert len(got) == 6


def test_sessionize_single_exchange(spark):
    # scale contract from the docstring: the closing (user, session) groupBy
    # reuses the window's hash(user) exchange — exactly ONE shuffle
    df = spark.createDataFrame(
        [(1, _ts("2026-01-01 10:00:00"), 1, 1.0)], EVENTS_SCHEMA
    )
    plan = sessionize(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_event_transitions_counts_and_rows(spark):
    rows = [
        # u1: a -> b -> a ; u2: b (no transition; first event has no prev)
        _fev(1, "2026-01-01 10:00:00", 1, "a"),
        _fev(2, "2026-01-01 10:01:00", 1, "b"),
        _fev(3, "2026-01-01 10:02:00", 1, "a"),
        _fev(4, "2026-01-01 10:00:00", 2, "b"),
    ]
    from flink_siddhi_spark.analytics import event_transitions

    df = spark.createDataFrame(rows, FUNNEL_SCHEMA)
    got = {(r.from_type, r.to_type): (r.n, r.p) for r in event_transitions(df).collect()}
    # u2's lone event must NOT create a cross-user (a -> b) or (b -> ...) edge
    assert got == {("a", "b"): (1, 1.0), ("b", "a"): (1, 1.0)}


def test_event_transitions_normalization(spark):
    rows = [
        _fev(1, "2026-01-01 10:00:00", 1, "a"),
        _fev(2, "2026-01-01 10:01:00", 1, "b"),
        _fev(3, "2026-01-01 10:02:00", 1, "a"),
        _fev(4, "2026-01-01 10:03:00", 1, "c"),
        _fev(5, "2026-01-01 10:04:00", 1, "a"),
        _fev(6, "2026-01-01 10:05:00", 1, "b"),
    ]
    from flink_siddhi_spark.analytics import event_transitions

    df = spark.createDataFrame(rows, FUNNEL_SCHEMA)
    got = {(r.from_type, r.to_type): r.p for r in event_transitions(df).collect()}
    assert got[("a", "b")] == round(2 / 3, 6)
    assert got[("a", "c")] == round(1 / 3, 6)


def test_bigram_pmi_values(spark):
    from flink_siddhi_spark.llm.text import bigram_pmi
    import math

    # "x y" always adjacent (5 times); "x z" never adjacent; filler words
    rows = [(i, "x y p q r") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {(r.w1, r.w2): (r.n_xy, r.pmi) for r in bigram_pmi(df, min_count=5).collect()}
    # 20 bigrams total; x:5, y:5 -> pmi(x,y) = log2(5*20/(5*5)) = 2
    assert got[("x", "y")] == (5, round(math.log2(4.0), 6))
    # min_count filter: nothing below 5 appears
    assert all(n >= 5 for n, _ in got.values())
    # top_n cut with total-order tiebreak
    assert len(bigram_pmi(df, min_count=1, top_n=2).collect()) == 2


def test_textrank_deterministic_and_ranked(spark):
    from flink_siddhi_spark.llm.text import textrank_keywords

    # hub word "x" is followed by many distinct words; "y" only follows x
    rows = [(i, "x y x z x w q x") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = textrank_keywords(df, min_count=2, top_n=10).collect()
    scores = {r.word: r.score for r in out}
    # x receives from y/z/w (each sends 100% to x) -> highest rank
    assert out[0].word == "x"
    assert all(0.0 < s < 1.0 for s in scores.values())
    # deterministic across runs (fixed iterations + decimal sums)
    again = {r.word: r.score for r in textrank_keywords(df, min_count=2, top_n=10).collect()}
    assert again == scores
    # rank mass: every node's score >= teleport floor (1-d)/N
    n = len(scores)
    assert all(s >= round((1.0 - 0.85) / n, 6) for s in scores.values())


def test_textrank_empty_graph(spark):
    from flink_siddhi_spark.llm.text import textrank_keywords

    # min_count prunes every edge -> typed empty result, no div-by-zero
    df = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    out = textrank_keywords(df, min_count=99)
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == ["word", "score"]


def test_funnel_advance_fuzz_vs_bruteforce():
    """round 8: the bisect-bounded `_funnel_advance` must emit exactly what
    the pre-round-8 full-scan form did — same rows, same order, same
    surviving buffer — across randomized multi-round feeds (duplicated
    timestamps, out-of-order arrivals, several episodes closed by one
    watermark jump, anchorless tails). Pure-Python, no Spark session."""
    import random

    from flink_siddhi_spark.analytics import _funnel_advance

    def brute(key, buf, wm, steps, horizon):
        # the pre-round-8 reference: min + full comprehensions per episode
        def _finalize(window):
            t = [min(window[0])] if window[0] else [None]
            for i in range(1, len(steps)):
                prev = t[i - 1]
                if prev is None:
                    t.append(None)
                    continue
                elig = [x for x in window[i]
                        if x > prev and x <= t[0] + horizon]
                t.append(min(elig) if elig else None)
            return t

        rows = []
        while buf[0] and min(buf[0]) + horizon < wm:
            t0 = min(buf[0])
            window = [[x for x in b if t0 <= x <= t0 + horizon] for b in buf]
            t = _finalize(window)
            for i, ti in enumerate(t):
                if ti is None:
                    break
                rows.append((key[0], i, steps[i], int(ti)))
            buf = [[x for x in b if x > t0 + horizon] for b in buf]
        if not buf[0]:
            buf = [[x for x in b if x > wm] for b in buf]
        return rows, buf

    rng = random.Random(80800)
    for case in range(400):
        n_steps = rng.randint(2, 4)
        steps = [f"s{i}" for i in range(n_steps)]
        horizon = rng.choice([5, 20, 100])
        key = ("u",)
        buf_a = [[] for _ in steps]   # bisect engine (kept sorted)
        buf_b = [[] for _ in steps]   # brute engine (arrival order)
        wm = 0
        for _ in range(rng.randint(1, 5)):
            # a burst of out-of-order events, duplicates allowed
            for _ in range(rng.randint(0, 25)):
                i = rng.randrange(n_steps)
                ts = rng.randint(0, 300)
                buf_a[i].append(ts)
                buf_b[i].append(ts)
            for b in buf_a:
                b.sort()
            wm += rng.choice([0, 3, 30, 150])
            rows_a, buf_a = _funnel_advance(key, buf_a, wm, steps, horizon)
            rows_b, buf_b = brute(key, buf_b, wm, steps, horizon)
            assert rows_a == rows_b, (case, wm, rows_a, rows_b)
            assert [sorted(x) for x in buf_a] == [sorted(x) for x in buf_b], (
                case, wm, buf_a, buf_b)
