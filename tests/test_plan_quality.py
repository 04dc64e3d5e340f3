"""Plan-quality regression gate for flagship queries: the scale properties
(exchange counts, join strategies, pushdown) asserted here are the ones a
100 TB deployment depends on. A refactor that passes the value oracle but
adds a shuffle or drops a broadcast regresses silently — this file makes
that a test failure. Complements scripts/explain_audit.py (the ad-hoc
audit tool) with hard bounds on the queries that matter most."""

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name):
    import __spark_entry__ as entry

    df = entry.queries()[name](spark, SF_DIR)
    # run through AQE so the FINAL plan is inspected (a pre-AQE plan can
    # show SortMergeJoin that AQE later demotes to broadcast)
    df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()


def test_tpch_q3_shape(spark):
    p = _plan(spark, "tpch_q3_shipping")
    assert p.count("Exchange hashpartitioning") <= 1, p
    assert "BroadcastHashJoin" in p and "NestedLoop" not in p, p
    assert "TakeOrderedAndProject" in p, p  # top-n, never a global sort


def test_tpch_q6_pushdown(spark):
    p = _plan(spark, "tpch_q6_forecast")
    # every predicate must reach the parquet scan
    assert "PushedFilters: [" in p and "IsNotNull(l_shipdate)" in p, p
    assert "Exchange hashpartitioning" not in p, p  # ungrouped agg: partial+final only


def test_dedup_exact_single_shuffle(spark):
    p = _plan(spark, "dedup_exact")
    assert p.count("Exchange hashpartitioning") == 1, p


def test_dedup_semantic_no_self_join(spark):
    p = _plan(spark, "dedup_semantic")
    assert "SortMergeJoin" not in p and "NestedLoop" not in p, p
    assert p.count("BroadcastHashJoin") == 2, p


def test_embedding_verified_no_nested_loop(spark):
    # the candidate-wired verifier must never fall back to the O(n^2) BNLJ
    p = _plan(spark, "dedup_embedding_verified")
    assert "NestedLoop" not in p, p


def test_asof_join_single_shuffle(spark):
    p = _plan(spark, "asof_join")
    assert p.count("Exchange hashpartitioning") == 1, p
    assert "NestedLoop" not in p, p


def test_stream_table_join_broadcasts(spark):
    p = _plan(spark, "join_stream_table")
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p, p


def test_quality_topfrac_single_shuffle(spark):
    p = _plan(spark, "pipeline_quality_topfrac")
    assert p.count("Exchange hashpartitioning") == 1, p


def test_curate_single_shuffle(spark):
    # the composed gate->dedup->sample slice must stay one shuffle
    p = _plan(spark, "pipeline_curate")
    assert p.count("Exchange hashpartitioning") == 1, p


def test_no_query_uses_python_row_udf(spark):
    """Hot-path contract: no row-at-a-time Python UDFs anywhere in the
    flagship set (Arrow-batched pandas ops appear as ArrowEvalPython /
    FlatMapGroupsInPandas — BatchEvalPython is the forbidden slow path)."""
    for name in ["tpch_q1_pricing", "dedup_minhash_lsh", "text_quality",
                 "pattern_followed_by", "multimodal_features"]:
        p = _plan(spark, name)
        assert "BatchEvalPython" not in p, (name, p)


def test_ann_two_phase_topk_shape(spark):
    """round-4: the ANN rankers must truncate to top-k BEFORE any exchange —
    phase 1 is a MapInPandas local top-k on the scan side, so the scored
    |corpus| x |queries| pair stream never shuffles; the merge rank runs as
    WindowGroupLimit over k * n_partitions survivors."""
    # whichever engine cost-based "auto" picks at this SF, the structural
    # two-phase markers must hold: a MapInPandas local top-k ahead of a
    # WindowGroupLimit merge
    p = _plan(spark, "ann_cosine_topk")
    assert "MapInPandas" in p, p
    assert "WindowGroupLimit" in p, p

    from pyspark.sql import functions as F

    from flink_siddhi_spark.llm.similarity import cosine_topk

    def plan_of(df):
        df.write.format("noop").mode("overwrite").save()
        return df._jdf.queryExecution().executedPlan().toString()

    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = embs.filter(F.col("vec_id") < 10)
    # round-5 numpy engine: scoring runs INSIDE the MapInPandas pass (the
    # interpreted JVM expression path costs ~3-15us/pair), so the corpus
    # reaches it straight from the scan — no join and no hash exchange
    # below the local top-k; the only exchange is the tiny merge
    pn = plan_of(cosine_topk(embs, q, k=5, engine="numpy"))
    pre, _, post = pn.partition("MapInPandas")
    assert "Exchange hashpartitioning" not in post, pn
    assert "Join" not in post, pn
    # the JVM join engine stays available as the cross-validation
    # reference, with its documented BroadcastNestedLoopJoin shape
    # (non-equi: query_id != neighbor_id)
    pj = plan_of(cosine_topk(embs, q, k=5, engine="join"))
    assert "BroadcastNestedLoopJoin" in pj, pj

    p = _plan(spark, "ann_ivf_topk")
    # ivf's pair stream also truncates locally before the merge. Exchanges
    # BELOW MapInPandas are the centroid-assignment aggregate (1 row per
    # vector), and its condition-less broadcast joins against the k-row
    # centroid table plan as BroadcastNestedLoopJoin by design — so only
    # the structural two-phase markers are asserted here.
    assert "MapInPandas" in p and "WindowGroupLimit" in p, p
    assert "SortMergeJoin" not in p, p


def test_fuzzy_dedup_keep_anti_join(spark):
    """round-4: the keep-list composition ends in ONE anti join on the drop
    set (broadcast at this scale) and never a nested loop."""
    p = _plan(spark, "dedup_fuzzy_keep")
    assert "NestedLoop" not in p, p
    assert "LeftAnti" in p, p


def test_cdc_chunks_single_doc_exchange(spark):
    """round-4: boundary running-count (Window) and chunk reassembly
    (groupBy) share the doc_id hash partitioning — exactly one exchange
    after the explode (plus the _spread round-robin on the tiny input)."""
    p = _plan(spark, "pipeline_cdc_chunks")
    assert p.count("Exchange hashpartitioning") == 1, p
    assert "NestedLoop" not in p and "BatchEvalPython" not in p, p


def test_funnel_single_user_exchange(spark):
    """round-5 late: the funnel is ONE user-keyed hash aggregate (array
    collect) + a tiny global rollup — no window, no join, no Python."""
    p = _plan(spark, "events_funnel")
    assert p.count("Exchange hashpartitioning") == 1, p
    assert "Join" not in p and "Window" not in p, p
    assert "BatchEvalPython" not in p, p


def test_interval_join_is_equi_join(spark):
    """round-5 late: the bucketed interval join must plan as an EQUI-join
    (hash or sort-merge) — never the nested-loop product the naive
    BETWEEN formulation degenerates to."""
    p = _plan(spark, "events_interval_join")
    assert "NestedLoop" not in p and "Cartesian" not in p, p


def test_zscore_broadcasts_stats(spark):
    """round-5 late: the k-row per-type stats broadcast back onto the event
    scan — the event-scale side contributes its single aggregation shuffle
    and nothing else."""
    p = _plan(spark, "events_zscore")
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p, p
    assert p.count("Exchange hashpartitioning") == 1, p


def test_stratified_sample_single_exchange(spark):
    """round-5 late: per-stratum count and rank share one stratum-keyed
    exchange (two Window ops, same partitioning)."""
    p = _plan(spark, "pipeline_stratified_sample")
    assert p.count("Exchange hashpartitioning") == 1, p


def test_source_rollup_one_expand(spark):
    """round-5 late: ROLLUP lowers to one Expand + one aggregation exchange,
    not a union of per-level scans."""
    p = _plan(spark, "text_source_rollup")
    assert "Expand" in p, p
    assert p.count("Exchange hashpartitioning") == 1, p
    assert "Union" not in p, p


def test_transitions_single_event_scale_exchange(spark):
    """round-5 late: one user-keyed exchange at event scale; the normalizing
    window and count aggregate run on the |types|^2 table."""
    p = _plan(spark, "events_transitions")
    assert "BatchEvalPython" not in p and "NestedLoop" not in p, p


def test_bigram_pmi_no_word_scale_join(spark):
    """round-5 late: bigrams come from transform+explode, the cut is
    TakeOrdered — never a global Sort before the limit. The single
    BroadcastNestedLoopJoin is the documented 1-row grand-total
    crossJoin (same pattern as text_tfidf/lm_score); anything beyond
    that one is a regression."""
    p = _plan(spark, "text_bigram_pmi")
    assert "TakeOrderedAndProject" in p, p
    assert p.count("BroadcastNestedLoopJoin") <= 1 and "Cartesian" not in p, p
    assert "BatchEvalPython" not in p, p
    # the min_count filter must run BEFORE the unigram joins
    assert p.index("n_xy") < p.index("BroadcastHashJoin"), p


def test_dsir_weights_broadcast_map(spark):
    """round-5 wave 4: the m-row log-ratio map must broadcast back onto the
    exploded words — the only corpus-scale shuffle is the doc-keyed sum;
    the bucket aggregate collapses to m keys via map-side partials."""
    p = _plan(spark, "pipeline_dsir_weights")
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p, p
    # the only NestedLoop allowed is the blessed 1-row Cross totals build
    assert p.count("BroadcastNestedLoopJoin") <= 1 and "Cross" in p, p
    assert "BatchEvalPython" not in p, p


def test_topk_paths_takeordered(spark):
    """round-5 wave 4: one user-keyed exchange for the lead window, then
    TakeOrderedAndProject — event-scale rows never enter a global sort."""
    p = _plan(spark, "events_topk_paths")
    assert "TakeOrderedAndProject" in p, p
    assert p.count("Exchange hashpartitioning") <= 2, p
    assert "Join" not in p and "BatchEvalPython" not in p, p


def test_inverted_index_reuses_term_clustering(spark):
    """round-5 wave 4: the term-keyed window (rank + df/tf) and the final
    per-term groupBy share one clustering — (term,doc) agg + term window =
    exactly two exchanges, and postings are capped BEFORE collect_list."""
    p = _plan(spark, "text_inverted_index")
    assert p.count("Exchange hashpartitioning") == 2, p
    assert "WindowGroupLimit" in p or "Window" in p, p
    assert "BatchEvalPython" not in p and "NestedLoop" not in p, p


def test_source_kl_single_corpus_exchange(spark):
    """round-5 wave 4: ONE corpus-scale exchange — the (source,word) agg;
    the word-marginal join and KL math run at vocab scale."""
    p = _plan(spark, "text_source_kl")
    assert "BatchEvalPython" not in p, p
    assert p.count("BroadcastNestedLoopJoin") <= 1, p  # 1-row totals build
    assert "SortMergeJoin" not in p, p
    # the corpus-scale (source,word) aggregate materializes ONCE: the
    # word-marginal branch re-aggregates the checkpointed vocab-scale table
    assert p.count("Generate explode") <= 1, p


def test_rfm_no_global_sort(spark):
    """round-5 wave 5: RFM must not plan a global sort / single-partition
    WINDOW (the ntile trap) — one user-keyed agg, thresholds broadcast.
    (SinglePartition exchanges for the 1-row ref-day/percentile FINAL
    aggregates are fine: they move k partial rows, not data.)"""
    p = _plan(spark, "events_rfm")
    assert "Exchange rangepartitioning" not in p, p
    assert "Window" not in p, p  # no global-order window anywhere
    assert "BatchEvalPython" not in p, p
    # 1-row broadcasts only (ref day twice — once per consumer of the
    # user-scale frame — plus thresholds); all build sides are single rows
    assert p.count("BroadcastNestedLoopJoin") <= 3, p
    # the event-scale user aggregate materializes ONCE (checkpoint): the
    # final plan reads it back, it does not re-run per consumer
    assert p.count("Exchange hashpartitioning") <= 1, p


def test_cooccurrence_pairs_generated_map_side(spark):
    """round-5 wave 5: pairs come from per-user sorted arrays (no self-join
    of the (user,type) table); the pair aggregate runs at |types|^2 scale."""
    p = _plan(spark, "events_cooccurrence")
    assert "SortMergeJoin" not in p, p
    assert "BatchEvalPython" not in p, p
    # checkpointed user-set table feeds pair + 2 single-type aggregates
    assert p.count("Exchange hashpartitioning") <= 3, p


def test_image_neardup_joins_fingerprints_not_payloads(spark):
    """round-5 wave 5: the banded self-join runs on the checkpointed
    8-int fingerprint table — payload bytes never enter a shuffle, and the
    encode/decode mapInPandas pass materializes once, not per join arm."""
    p = _plan(spark, "multimodal_image_neardup")
    assert "NestedLoop" not in p, p
    # fingerprints materialize once: both join arms scan the checkpoint RDD,
    # and no MapInPandas (so no second decode pass) appears above it
    assert "Scan ExistingRDD" in p and "MapInPandas" not in p, p
    # the join is an EQUI-join on (band, val) and payloads are long gone
    assert "Join [band" in p and "payload" not in p, p
    # the hamming budget prunes INSIDE the join, before any downstream op
    assert "<= 7" in p.split("Join")[1], p


def test_pq_topk_zero_shuffle_until_merge(spark):
    """round-5 wave 5: PQ = one mapInPandas encode pass feeding the
    two-phase scorer (numpy or, below the cost crossover, the broadcast
    join) — the corpus never hash-shuffles; the only hash exchange is the
    tiny k*n_partitions merge above the local top-k."""
    p = _plan(spark, "ann_pq_topk")
    assert "MapInPandas" in p and "WindowGroupLimit" in p, p
    assert "SortMergeJoin" not in p and "BatchEvalPython" not in p, p
    assert p.count("Exchange hashpartitioning") <= 1, p


def test_ivfpq_composition_shape(spark):
    """round-5 wave 6: IVF-PQ = checkpointed PQ reconstruction feeding the
    IVF probe/score path — no sort-merge join, no Python row UDFs; the
    probed-bucket scoring truncates locally before the merge."""
    p = _plan(spark, "ann_ivfpq_topk")
    assert "SortMergeJoin" not in p and "BatchEvalPython" not in p, p
    assert "WindowGroupLimit" in p, p
    # the encode pass is checkpointed: the visible plan reads ExistingRDD
    assert "Scan ExistingRDD" in p, p


def test_dsir_resample_takeordered(spark):
    """round-5 wave 6: Gumbel-top-k ends in TakeOrderedAndProject — the
    corpus never enters a global sort; the broadcast log-ratio map shape
    is inherited from dsir_weights."""
    p = _plan(spark, "pipeline_dsir_resample")
    assert "TakeOrderedAndProject" in p, p
    assert "Exchange rangepartitioning" not in p, p
    assert "BatchEvalPython" not in p, p


def test_sq_topk_map_only_encode(spark):
    """round-5 wave 6: SQ8 encode is a map-only projection over the scan
    (1-row stats broadcast back) — the corpus never hash-shuffles; the
    only hash exchange is the top-k merge."""
    p = _plan(spark, "ann_sq_topk")
    assert "SortMergeJoin" not in p and "BatchEvalPython" not in p, p
    assert p.count("Exchange hashpartitioning") <= 1, p
    assert "WindowGroupLimit" in p, p


def test_attribution_single_user_exchange(spark):
    """round-5 wave 6: last-touch attribution is ONE user-keyed window
    exchange — no self-join, no range join, no Python."""
    p = _plan(spark, "events_attribution")
    assert p.count("Exchange hashpartitioning") == 1, p
    assert "Join" not in p and "BatchEvalPython" not in p, p


def test_exact_k_sample_takeordered(spark):
    """round-5 wave 7: exactly-k sampling is TakeOrderedAndProject on the
    hash key — the corpus never globally sorts."""
    p = _plan(spark, "pipeline_exact_k_sample")
    assert "TakeOrderedAndProject" in p, p
    assert "Exchange rangepartitioning" not in p, p


def test_quality_budget_distributed_prefix_sum(spark):
    """round-5 wave 7: the token cumsum must use the distributed prefix sum
    — range repartition + per-shard windows; the only single-partition
    piece is the n_partitions-row offset table."""
    p = _plan(spark, "pipeline_quality_budget")
    assert "Exchange rangepartitioning" in p, p
    assert "BatchEvalPython" not in p, p
    # no global-order Window over the data: every Window partitions by
    # the shard id (the offsets window runs on partition counts only)
    assert "SortMergeJoin" not in p, p


def test_pq_trained_topk_bounded_training(spark):
    """round-6: trained-PQ = n_iter bounded-sample assignment passes (skinny
    n*m rows into a <= m*n_codes hash agg) + the zero-shuffle encode + the
    two-phase scorer. Training must stay TakeOrdered-sampled (never a
    global sort of the corpus) and free of Python row UDFs; the final
    query plan keeps the PQ shape (local top-k before one merge)."""
    p = _plan(spark, "ann_pq_trained_topk")
    assert "MapInPandas" in p and "WindowGroupLimit" in p, p
    assert "SortMergeJoin" not in p and "BatchEvalPython" not in p, p
    assert p.count("Exchange hashpartitioning") <= 1, p
