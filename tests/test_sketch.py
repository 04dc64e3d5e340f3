"""HyperLogLog + count-min sketch: accuracy gates, estimator properties,
partitioning-determinism, and input validation."""

import pytest
from pyspark.sql import functions as F

from flink_siddhi_spark.sketch import cms_heavy_hitters, hll_distinct


def test_hll_raw_branch_accuracy(spark):
    # 5000 distinct >> 2.5*m (m=256) -> raw branch; std error 1.04/sqrt(m)
    # ~= 6.5%, gate at 3 sigma
    df = spark.range(5000).select(F.col("id").alias("v"))
    row = hll_distinct(df, "v", prefix_hex=2).collect()[0]
    assert row.n_exact == 5000
    assert abs(row.hll_estimate - 5000) / 5000 < 0.20
    assert row.hll_registers_used <= 256


def test_hll_linear_counting_branch(spark):
    # 50 distinct << 2.5*m -> linear-counting branch, tight at low load
    df = spark.range(50).select(F.col("id").alias("v"))
    row = hll_distinct(df, "v", prefix_hex=2).collect()[0]
    assert row.n_exact == 50
    assert abs(row.hll_estimate - 50) <= 10


def test_hll_multiset_invariance_and_nulls(spark):
    # duplicates and NULLs must not move the estimate (COUNT DISTINCT
    # semantics): the sketch is a function of the distinct value set
    base = spark.range(300).select(F.col("id").alias("v"))
    dups = base.union(base).union(base)
    with_nulls = dups.union(
        spark.range(5).select(F.lit(None).cast("long").alias("v"))
    )
    e1 = hll_distinct(base, "v").collect()[0]
    e2 = hll_distinct(with_nulls, "v").collect()[0]
    assert (e1.n_exact, e1.hll_estimate) == (e2.n_exact, e2.hll_estimate)


def test_hll_partitioning_determinism(spark):
    # decimal harmonic sum -> same estimate under any physical partitioning
    df = spark.range(2000).select((F.col("id") % 700).alias("v"))
    a = hll_distinct(df, "v").collect()[0]
    b = hll_distinct(df.repartition(7), "v").collect()[0]
    assert tuple(a) == tuple(b)


def test_hll_grouped(spark):
    df = spark.range(1000).select(
        (F.col("id") % 3).alias("g"), (F.col("id") % 120).alias("v")
    )
    rows = {r.g: r for r in hll_distinct(df, "v", ["g"]).collect()}
    assert set(rows) == {0, 1, 2}
    for r in rows.values():
        assert r.n_exact == 40
        assert abs(r.hll_estimate - 40) <= 8


def test_hll_prefix_validation(spark):
    df = spark.range(5).select(F.col("id").alias("v"))
    with pytest.raises(ValueError):
        hll_distinct(df, "v", prefix_hex=0)
    with pytest.raises(ValueError):
        hll_distinct(df, "v", prefix_hex=9)


def test_cms_overestimate_and_exact_isolated(spark):
    # 200 keys into 16 cells/row (width_hex=1): collisions guaranteed.
    # CMS is an overestimate-only sketch: est >= exact for EVERY key, and
    # more rows can only tighten the min (d=4 <= d=1 pointwise).
    occ = spark.range(3000).select(
        F.concat(F.lit("k"), (F.col("id") % 200)).alias("k")
    )
    d4 = {r.k: (r.n_exact, r.cms_estimate)
          for r in cms_heavy_hitters(occ, "k", depth=4, width_hex=1, top_n=200).collect()}
    d1 = {r.k: r.cms_estimate
          for r in cms_heavy_hitters(occ, "k", depth=1, width_hex=1, top_n=200).collect()}
    assert len(d4) == 200
    assert all(est >= exact for exact, est in d4.values())
    assert any(est > exact for exact, est in d4.values())  # collisions real
    assert all(d4[k][1] <= d1[k] for k in d4)


def test_cms_exact_when_wide(spark):
    # 10 keys into 4096 cells: collision probability ~0 -> est == exact
    occ = spark.range(500).select(F.concat(F.lit("w"), (F.col("id") % 10)).alias("k"))
    rows = cms_heavy_hitters(occ, "k", depth=4, width_hex=3, top_n=10).collect()
    assert len(rows) == 10
    assert all(r.cms_estimate == r.n_exact == 50 for r in rows)
    # ordered by exact desc then key
    assert [r.k for r in rows] == sorted(r.k for r in rows)


def test_cms_validation(spark):
    occ = spark.range(5).select(F.col("id").cast("string").alias("k"))
    with pytest.raises(ValueError):
        cms_heavy_hitters(occ, "k", depth=0)
    with pytest.raises(ValueError):
        cms_heavy_hitters(occ, "k", width_hex=0)


def test_hll_empty_and_all_null_input(spark):
    # ungrouped: SQL aggregate convention -> one all-zero row (pinned equal
    # to the DuckDB oracle's ungrouped shape); grouped: no rows
    empty = spark.range(0).select(F.col("id").alias("v"))
    assert [tuple(r) for r in hll_distinct(empty, "v").collect()] == [(0, 0, 0)]
    assert hll_distinct(empty, "v", ["v"]).collect() == []
    nulls = spark.range(3).select(F.lit(None).cast("string").alias("v"))
    assert [tuple(r) for r in hll_distinct(nulls, "v").collect()] == [(0, 0, 0)]
