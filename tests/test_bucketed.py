"""Bucketed-table layout: joins and aggregations on the bucket key must run
WITHOUT an Exchange (the pre-shuffled layout replaces the runtime shuffle).
This is the storage-layout leg of the 100 TB design — verified on the real
physical plans, not just claimed."""

import pytest


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    from flink_siddhi_spark.sources.bucketed import write_bucketed

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(100)], "doc_id long, text string"
    )
    scores = spark.createDataFrame(
        [(i, float(i) / 100) for i in range(100)], "doc_id long, quality double"
    )
    a = write_bucketed(docs, "b_docs", ["doc_id"], 4, sort_by=["doc_id"],
                       path=str(tmp_path / "b_docs"))
    b = write_bucketed(scores, "b_scores", ["doc_id"], 4, sort_by=["doc_id"],
                       path=str(tmp_path / "b_scores"))
    yield a, b
    spark.sql("DROP TABLE IF EXISTS b_docs")
    spark.sql("DROP TABLE IF EXISTS b_scores")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    a, b = bucketed_pair
    # force the sort-merge path (broadcast would hide the bucketing win)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "doc_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the point: NO network shuffle on either side — the layout replaced
        # it. (A local per-task Sort remains: Spark 4 dropped the bucketed
        # scan output-ordering propagation, and sorting co-partitioned data
        # is cheap local work, not a shuffle.)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert "Bucketed: true" in plan, plan
        assert joined.count() == 100
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    a, _ = bucketed_pair
    from pyspark.sql import functions as F

    agg = a.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert agg.count() == 100


def test_bucketed_metadata_check(spark, bucketed_pair):
    from flink_siddhi_spark.sources.bucketed import is_bucketed_on

    assert is_bucketed_on(spark, "b_docs", ["doc_id"])
    assert not is_bucketed_on(spark, "b_docs", ["text"])


def test_write_bucketed_rejects_bad_buckets(spark):
    from flink_siddhi_spark.sources.bucketed import write_bucketed

    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError, match="buckets"):
        write_bucketed(df, "b_bad", ["doc_id"], 0)


def test_partitioned_write_prunes_scan(spark, tmp_path):
    from pyspark.sql import functions as F

    from flink_siddhi_spark.sources.bucketed import write_partitioned

    df = spark.createDataFrame(
        [(i, f"d{i}", ["src0", "src1", "src2"][i % 3]) for i in range(90)],
        "doc_id long, text string, source string",
    )
    t = write_partitioned(df, str(tmp_path / "part_docs"), by=["source"])
    q = t.filter(F.col("source") == "src1").select("doc_id")
    plan = q._jdf.queryExecution().executedPlan().toString()
    # the filter must prune directories, not rows: it appears as a
    # PartitionFilter on the scan and nowhere as a post-scan Filter
    assert "PartitionFilters: [isnotnull(source" in plan, plan
    assert q.count() == 30
