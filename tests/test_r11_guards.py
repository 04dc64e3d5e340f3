"""Round-11 size guards (VERDICT r10 item 4): the single-task fusion
engines in dedup_clusters and textrank_keywords must auto-route to the
distributed loop above their documented row limits (the fused task aborts
with an __overflow sentinel instead of buffering the over-limit table),
and both engines must agree on the result either way."""

import pandas as pd
import pytest


def _cluster_pairs(spark):
    return spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (8, 9), (9, 10)],
        "id_a bigint, id_b bigint",
    )


EXPECTED_CLUSTERS = {
    (1, 1), (2, 1), (3, 1), (5, 5), (6, 5), (8, 8), (9, 8), (10, 8),
}


def test_cc_fused_fn_overflow_sentinel_unit():
    """The task-side guard: below the limit the generator emits labels
    with __overflow=False; past it, ONE sentinel row — and it must stop
    consuming the batch iterator (bounded read), which an unbounded
    batch generator proves."""
    from flink_siddhi_spark.llm.dedup import _cc_fused_fn

    batch = pd.DataFrame({"id_a": [1, 2], "id_b": [2, 3]})
    out = list(_cc_fused_fn(20, 100)(iter([batch])))
    assert len(out) == 1 and not out[0]["__overflow"].any()
    assert set(zip(out[0]["node"], out[0]["label"])) == {(1, 1), (2, 1), (3, 1)}

    def endless():
        while True:
            yield batch

    consumed = []

    def counting():
        for b in endless():
            consumed.append(1)
            yield b

    out = list(_cc_fused_fn(20, 5)(counting()))
    assert len(out) == 1 and len(out[0]) == 1
    assert bool(out[0]["__overflow"].iloc[0])
    # 2 rows/batch, limit 5: must stop at the 3rd batch, not run forever
    assert len(consumed) == 3


def test_textrank_fused_fn_overflow_sentinel_unit():
    from flink_siddhi_spark.llm.text import _textrank_fused_fn

    batch = pd.DataFrame({"w1": ["a", "b"], "w2": ["b", "a"], "n_xy": [5, 5]})
    out = list(_textrank_fused_fn(0.85, 2, 100)(iter([batch])))
    assert len(out) == 1 and not out[0]["__overflow"].any()
    assert set(out[0]["w"]) == {"a", "b"}

    def endless():
        while True:
            yield batch

    out = list(_textrank_fused_fn(0.85, 2, 3)(endless()))
    assert len(out) == 1 and len(out[0]) == 1
    assert bool(out[0]["__overflow"].iloc[0])


def test_dedup_clusters_size_guard_dispatch(spark, monkeypatch):
    from flink_siddhi_spark.llm import dedup as D

    # below the limit (default): fused engine result
    got_fused = {
        (r.doc_id, r.cluster_id)
        for r in D.dedup_clusters(_cluster_pairs(spark)).collect()
    }
    assert got_fused == EXPECTED_CLUSTERS
    # above the limit: the fused task emits only the sentinel, so correct
    # labels CAN only come from the distributed fallback
    monkeypatch.setattr(D, "FUSED_CC_PAIR_LIMIT", 0)
    got_dist = {
        (r.doc_id, r.cluster_id)
        for r in D.dedup_clusters(_cluster_pairs(spark)).collect()
    }
    assert got_dist == EXPECTED_CLUSTERS


def test_dedup_clusters_guard_preserves_nonconvergence_raise(spark, monkeypatch):
    from flink_siddhi_spark.llm import dedup as D

    # an 8-chain needs more than 2 rounds; both engines must raise — and
    # the fallback raise doubles as proof the DISTRIBUTED loop evaluated
    # (the fused sentinel path carries __exceeded=False)
    chain = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7), (7, 8)],
        "id_a bigint, id_b bigint",
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        D.dedup_clusters(chain, max_iterations=2)
    monkeypatch.setattr(D, "FUSED_CC_PAIR_LIMIT", 0)
    with pytest.raises(RuntimeError, match="did not converge"):
        D.dedup_clusters(chain, max_iterations=2)


def test_textrank_size_guard_dispatch(spark, monkeypatch):
    from flink_siddhi_spark.llm import text as TX

    docs = spark.createDataFrame(
        [(i, "the quick fox jumps over the quick dog") for i in range(8)],
        "doc_id bigint, text string",
    )
    got_fused = [
        (r.word, r.score)
        for r in TX.textrank_keywords(docs, min_count=5).collect()
    ]
    assert len(got_fused) > 0
    assert all(w is not None for w, _ in got_fused)
    # above the limit: the fused task emits only the sentinel, so real
    # ranks CAN only come from the distributed fallback — and they must
    # be bit-identical across the dispatch boundary
    monkeypatch.setattr(TX, "FUSED_TEXTRANK_EDGE_LIMIT", 0)
    got_dist = [
        (r.word, r.score)
        for r in TX.textrank_keywords(docs, min_count=5).collect()
    ]
    assert got_fused == got_dist
