"""Skew-salted join: result-identical to the plain join, with the hot key
spread across salt buckets instead of one monster partition."""

import pytest

from pyspark.sql import functions as F


def _skewed(spark):
    # 900 rows on one hot key + 100 spread rows
    hot = [(7, i) for i in range(900)]
    cold = [(k, k * 10) for k in range(100, 200)]
    left = spark.createDataFrame(hot + cold, "k long, payload long")
    right = spark.createDataFrame(
        [(7, "hot"), (150, "cold"), (999, "unmatched")], "k long, tag string"
    )
    return left, right


def test_salted_join_matches_plain_inner(spark):
    from flink_siddhi_spark.operators.skew import salted_join

    left, right = _skewed(spark)
    got = sorted(tuple(r) for r in salted_join(left, right, "k", salt=8).collect())
    want = sorted(tuple(r) for r in left.join(right, "k").collect())
    assert got == want and len(want) == 901


def test_salted_join_matches_plain_left_outer(spark):
    from flink_siddhi_spark.operators.skew import salted_join

    left, right = _skewed(spark)
    got = sorted(tuple(r) for r in salted_join(left, right, "k", salt=8, how="left").collect())
    want = sorted(tuple(r) for r in left.join(right, "k", "left").collect())
    assert got == want and len(want) == 1000


def test_salted_join_spreads_hot_key(spark):
    from flink_siddhi_spark.operators.skew import SALT_COL

    # the salt assignment itself: 900 hot-key rows land in >1 salt bucket
    left, _ = _skewed(spark)
    salted = left.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(8))
    )
    n = salted.filter("k = 7").select(SALT_COL).distinct().count()
    assert n == 8  # 900 rows spread across all 8 buckets


def test_salted_join_rejects_right_outer(spark):
    from flink_siddhi_spark.operators.skew import salted_join

    left, right = _skewed(spark)
    with pytest.raises(ValueError, match="outer"):
        salted_join(left, right, "k", how="right")
    with pytest.raises(ValueError, match="salt"):
        salted_join(left, right, "k", salt=0)


# ---- property: salted == plain for arbitrary key/row distributions -------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    lkeys=st.lists(st.integers(0, 5), min_size=0, max_size=30),
    rkeys=st.lists(st.integers(0, 5), min_size=0, max_size=10),
    salt=st.integers(1, 5),
    how=st.sampled_from(["inner", "left"]),
)
def test_salted_join_property(spark, lkeys, rkeys, salt, how):
    from flink_siddhi_spark.operators.skew import salted_join

    left = spark.createDataFrame(
        [(k, i) for i, k in enumerate(lkeys)] or [(None, None)], "k long, p long"
    ).filter("p IS NOT NULL")
    right = spark.createDataFrame(
        [(k, i * 100) for i, k in enumerate(rkeys)] or [(None, None)], "k long, v long"
    ).filter("v IS NOT NULL")
    got = sorted(tuple(r) for r in salted_join(left, right, "k", salt=salt, how=how).collect())
    want = sorted(tuple(r) for r in left.join(right, "k", how).collect())
    assert got == want
