"""Round-5 wave 4: DSIR importance weights, top-k event paths, the capped
inverted index, and per-source KL divergence."""

import datetime as dt

import pytest

from flink_siddhi_spark.analytics import topk_paths
from flink_siddhi_spark.llm.pipeline import dsir_weights
from flink_siddhi_spark.llm.text import inverted_index, source_kl

from pyspark.sql import functions as F

DOCS_SCHEMA = "doc_id bigint, text string, lang string, source string"


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_dsir_weights_orders_target_like_docs_first(spark):
    # target exemplars use vocabulary {aa, bb}; the off-domain doc uses
    # {zz, yy} — its importance log-weight must be strictly lower
    rows = [
        (1, "aa bb aa bb", "en", "s"),
        (2, "aa bb bb aa", "en", "s"),
        (3, "aa bb aa zz", "de", "s"),
        (4, "zz yy zz yy", "de", "s"),
    ]
    df = spark.createDataFrame(rows, DOCS_SCHEMA)
    got = {
        r.doc_id: (r.n_words, r.dsir_logw)
        for r in dsir_weights(df, F.col("lang") == "en").collect()
    }
    assert got[1][0] == 4 and got[4][0] == 4
    # target-vocabulary docs score identically and highest
    assert got[1][1] == got[2][1]
    assert got[1][1] > got[3][1] > got[4][1]


def test_dsir_weights_prefix_hex_bounds(spark):
    df = spark.createDataFrame([(1, "a", "en", "s")], DOCS_SCHEMA)
    with pytest.raises(ValueError):
        dsir_weights(df, F.col("lang") == "en", prefix_hex=0)
    with pytest.raises(ValueError):
        dsir_weights(df, F.col("lang") == "en", prefix_hex=5)


def test_dsir_weights_empty_target_is_uniform(spark):
    # no exemplar rows: p_target is the uniform 1/m smoothing for every
    # bucket, so docs rank purely by (negative) raw-likelihood — it must
    # still run and produce finite weights
    rows = [(1, "aa aa aa", "de", "s"), (2, "aa bb cc", "de", "s")]
    df = spark.createDataFrame(rows, DOCS_SCHEMA)
    out = dsir_weights(df, F.col("lang") == "en").collect()
    assert len(out) == 2
    assert all(r.dsir_logw is not None for r in out)


EVENTS_SCHEMA = "event_id bigint, ts timestamp_ntz, user_id bigint, event_type string"


def test_topk_paths_counts_and_rank(spark):
    rows = [
        # user 1: a b c d  -> paths a>b>c, b>c>d
        (1, _ts("2026-01-01 10:00:00"), 1, "a"),
        (2, _ts("2026-01-01 10:01:00"), 1, "b"),
        (3, _ts("2026-01-01 10:02:00"), 1, "c"),
        (4, _ts("2026-01-01 10:03:00"), 1, "d"),
        # user 2: a b c -> a>b>c (paths never cross users)
        (5, _ts("2026-01-01 11:00:00"), 2, "a"),
        (6, _ts("2026-01-01 11:01:00"), 2, "b"),
        (7, _ts("2026-01-01 11:02:00"), 2, "c"),
        # user 3: too short for depth 3
        (8, _ts("2026-01-01 12:00:00"), 3, "a"),
        (9, _ts("2026-01-01 12:01:00"), 3, "b"),
    ]
    df = spark.createDataFrame(rows, EVENTS_SCHEMA)
    out = [(r.rank, r.path, r.n_paths) for r in topk_paths(df).collect()]
    assert out == [(1, "a>b>c", 2), (2, "b>c>d", 1)]


def test_topk_paths_ts_then_id_tiebreak(spark):
    # same timestamp: event_id orders the path deterministically
    t = _ts("2026-01-01 10:00:00")
    rows = [(2, t, 1, "b"), (1, t, 1, "a"), (3, t, 1, "c")]
    df = spark.createDataFrame(rows, EVENTS_SCHEMA)
    out = topk_paths(df).collect()
    assert [(r.path, r.n_paths) for r in out] == [("a>b>c", 1)]


def test_topk_paths_depth_validation(spark):
    df = spark.createDataFrame([], EVENTS_SCHEMA)
    with pytest.raises(ValueError):
        topk_paths(df, depth=1)


def test_inverted_index_postings_cap_keeps_df_tf(spark):
    rows = [(i, "tok common", "en", "s") for i in range(30)]
    df = spark.createDataFrame(rows, DOCS_SCHEMA)
    got = {r.term: r for r in inverted_index(df, postings_cap=5).collect()}
    # df/tf count ALL docs; postings list only the 5 lowest doc ids
    assert got["tok"].df == 30 and got["tok"].tf == 30
    assert got["tok"].postings == "0,1,2,3,4"


def test_inverted_index_tf_vs_df_and_max_df(spark):
    rows = [
        (1, "x x x y", "en", "s"),
        (2, "x y", "en", "s"),
        (3, "y", "en", "s"),
    ]
    df = spark.createDataFrame(rows, DOCS_SCHEMA)
    got = {r.term: r for r in inverted_index(df).collect()}
    assert (got["x"].df, got["x"].tf, got["x"].postings) == (2, 4, "1,2")
    assert (got["y"].df, got["y"].tf, got["y"].postings) == (3, 3, "1,2,3")
    capped = {r.term for r in inverted_index(df, max_df=2).collect()}
    assert capped == {"x"}  # y (df=3) dropped as a stopword-scale term


def test_source_kl_zero_for_identical_distributions(spark):
    rows = [
        (1, "a b c", "en", "s1"),
        (2, "a b c", "en", "s2"),
    ]
    df = spark.createDataFrame(rows, DOCS_SCHEMA)
    got = {r.source: r for r in source_kl(df).collect()}
    assert got["s1"].kl_bits == 0.0 and got["s2"].kl_bits == 0.0
    assert got["s1"].n_words == 3 and got["s1"].n_distinct == 3


def test_source_kl_positive_for_divergent_source(spark):
    rows = [
        (1, "a a a a", "en", "skew"),
        (2, "a b c d", "en", "flat"),
        (3, "a b c d", "en", "flat"),
    ]
    df = spark.createDataFrame(rows, DOCS_SCHEMA)
    got = {r.source: r for r in source_kl(df).collect()}
    assert got["skew"].kl_bits > got["flat"].kl_bits >= 0.0


def test_dsir_resample_prefers_target_like_docs(spark):
    # corpus: 30 target-vocab docs, 30 off-domain docs; a 20-doc resample
    # must be dominated by the target-like ones
    from flink_siddhi_spark.llm.pipeline import dsir_resample

    rows = [(i, "aa bb aa bb", "en" if i < 5 else "de", "s") for i in range(30)]
    rows += [(100 + i, "zz yy zz yy", "de", "s") for i in range(30)]
    df = spark.createDataFrame(rows, DOCS_SCHEMA)
    out = dsir_resample(df, F.col("lang") == "en", n_out=20).collect()
    assert len(out) == 20
    target_like = sum(1 for r in out if r.doc_id < 100)
    assert target_like >= 15, target_like


def test_dsir_resample_is_deterministic_and_ranked(spark):
    from flink_siddhi_spark.llm.pipeline import dsir_resample

    rows = [(i, f"w{i} aa bb", "en" if i % 2 else "de", "s") for i in range(40)]
    df = spark.createDataFrame(rows, DOCS_SCHEMA)
    a = [(r.doc_id, r.gumbel_key) for r in dsir_resample(df, F.col("lang") == "en", n_out=10).collect()]
    b = [(r.doc_id, r.gumbel_key) for r in dsir_resample(df, F.col("lang") == "en", n_out=10).collect()]
    assert a == b and len(a) == 10
    keys = [k for _i, k in a]
    assert keys == sorted(keys, reverse=True)


def test_dsir_resample_small_corpus_returns_all(spark):
    from flink_siddhi_spark.llm.pipeline import dsir_resample

    rows = [(i, "aa bb", "en", "s") for i in range(3)]
    df = spark.createDataFrame(rows, DOCS_SCHEMA)
    assert len(dsir_resample(df, F.col("lang") == "en", n_out=50).collect()) == 3
