"""Training-data pipeline operator regressions (sampling, splits, quotas,
contamination, packing, chunk dedup) on tiny inline fixtures — the sf0.01
DuckDB oracle gate covers full parity; these guard determinism and edges."""

import pytest
from pyspark.sql import functions as F

from flink_siddhi_spark.llm import pipeline as P


@pytest.fixture()
def docs(spark):
    rows = [
        (i, " ".join(f"w{(i * 7 + j) % 13}" for j in range(12)),
         "en" if i % 3 == 0 else "es", f"src{i % 4}")
        for i in range(40)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


def test_sample_hash_deterministic_and_stratified(docs):
    a = sorted(r.doc_id for r in P.sample_hash(docs, rate=0.75, strata={"en": 0.0}).collect())
    b = sorted(r.doc_id for r in P.sample_hash(docs, rate=0.75, strata={"en": 0.0}).collect())
    assert a == b  # pure function of id hash
    kept = docs.filter(F.col("doc_id").isin(a))
    assert kept.filter(F.col("lang") == "en").count() == 0  # stratum rate 0 drops all
    assert 0 < len(a) < 40


def test_sample_hash_rate_edges(docs):
    assert P.sample_hash(docs, rate=1.0).count() == 40
    assert P.sample_hash(docs, rate=0.0).count() == 0


def test_train_split_partitions_everything(docs):
    out = P.train_split(docs).collect()
    assert len(out) == 40
    labels = {r.split for r in out}
    assert labels <= {"train", "val", "test"}
    assert sum(r.split == "train" for r in out) > 20  # 90% weight dominates


def test_domain_quota_caps_each_domain(docs):
    out = P.domain_quota(docs, quota=3).collect()
    per = {}
    for r in out:
        per[r.source] = per.get(r.source, 0) + 1
        assert r.qrank <= 3
    assert all(v == 3 for v in per.values())  # 10 docs/source, capped at 3
    again = {(r.doc_id, r.qrank) for r in P.domain_quota(docs, quota=3).collect()}
    assert again == {(r.doc_id, r.qrank) for r in out}  # deterministic ranks


def test_contamination_flags_planted_overlap(spark):
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "zz yy xx ww vv")],
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, "beta gamma delta epsilon")], "doc_id long, text string")
    out = {r.doc_id: (r.n_hit_ngrams, r.n_bench_docs)
           for r in P.contamination_ngram(corpus, bench, n=3).collect()}
    # doc 1 shingles {alpha beta gamma, beta gamma delta}; bench doc 100 has
    # {beta gamma delta, gamma delta epsilon} -> exactly 1 shared shingle
    assert out == {1: (1, 1)}


def test_contamination_hit_counts_exact(spark):
    corpus = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    bench = spark.createDataFrame([(9, "a b c d"), (8, "c d e f")], "doc_id long, text string")
    (row,) = P.contamination_ngram(corpus, bench, n=3).collect()
    # corpus shingles {abc, bcd, cde}; bench doc 9 has {abc, bcd}, doc 8 has {cde, def}
    assert (row.n_hit_ngrams, row.n_bench_docs) == (3, 2)


def test_pack_sequences_bins_and_cumsum(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(["t"] * 10)) for i in range(32)], "doc_id long, text string")
    out = P.pack_sequences(docs, budget=25).collect()
    assert len(out) == 32
    by_shard = {}
    for r in sorted(out, key=lambda r: (r.shard, r.doc_id)):
        by_shard.setdefault(r.shard, []).append(r)
    for rows in by_shard.values():
        cum = 0
        for r in rows:
            assert r.bin_id == cum // 25  # exclusive-cumsum binning
            cum += r.n_tokens
            assert r.cum_tokens == cum


def test_chunk_dedup_collapses_shared_chunks(spark):
    eight = "c1 c2 c3 c4 c5 c6 c7 c8"
    docs = spark.createDataFrame(
        [(1, eight + " " + "u1 u2 u3 u4 u5 u6 u7 u8"),
         (2, eight + " tail"),
         (3, "totally different words here")],
        "doc_id long, text string")
    out = {r.chunk_hash: (r.canonical_id, r.n_occurrences)
           for r in P.chunk_dedup(docs, k=8).collect()}
    assert (1, 2) in out.values()  # the shared 8-word chunk, canonical doc 1
    assert sum(n for _, n in out.values()) == 2 + 2 + 1  # doc1: 2 chunks, doc2: 2, doc3: 1


def test_training_order_is_deterministic_permutation(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(50)], "doc_id long, text string")
    out = P.training_order(docs).select("doc_id", "shuffle_key", "pos").collect()
    assert sorted(r.pos for r in out) == list(range(1, 51))
    # positions follow md5 hash order — a real permutation, not id order
    by_key = sorted(out, key=lambda r: (r.shuffle_key, r.doc_id))
    assert [r.pos for r in by_key] == list(range(1, 51))
    assert [r.doc_id for r in by_key] != list(range(50))
    # re-running yields the identical order (no RNG state)
    again = P.training_order(docs).select("doc_id", "pos").collect()
    assert {r.doc_id: r.pos for r in again} == {r.doc_id: r.pos for r in out}


def test_training_order_salt_changes_epoch(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(50)], "doc_id long, text string")
    e0 = {r.doc_id: r.pos for r in P.training_order(docs, salt="epoch0").collect()}
    e1 = {r.doc_id: r.pos for r in P.training_order(docs, salt="epoch1").collect()}
    assert e0 != e1
    assert sorted(e0.values()) == sorted(e1.values())


def test_curate_composes_gate_dedup_sample(spark):
    from flink_siddhi_spark.llm.pipeline import curate
    good = "the quick brown fox jumps on the lazy dog with a friend of mine"
    df = spark.createDataFrame(
        [(1, good), (2, good), (3, "shrt txt"), (4, good + " extra")],
        "doc_id int, text string")
    # no sampling: quality gate drops doc 3 (under 5 words scores 0 -- here
    # low stopword/short), dedup keeps min-id of the duplicate pair (1, 2)
    out = {r.doc_id for r in curate(df, min_quality=0.4, sample_rate=1.0).collect()}
    assert 2 not in out          # duplicate of doc 1 (non-canonical) dropped
    assert 1 in out and 4 in out
    assert 3 not in out          # failed the quality gate
    # rate=0 empties the slice deterministically
    assert curate(df, min_quality=0.4, sample_rate=0.0).count() == 0


def test_cdc_chunk_documents_shift_robust(spark):
    """round-4: content-defined chunk boundaries depend on local content, so
    a prepended word realigns after ~one window and the shared tail chunks
    hash-match — fixed-stride chunking shares nothing after a 1-word shift."""
    from flink_siddhi_spark.llm.pipeline import cdc_chunk_documents, chunk_dedup

    base = ("the quick brown fox jumps over the lazy dog and runs far away "
            "home now then sleeps deeply until dawn breaks over the hills")
    df = spark.createDataFrame(
        [(1, base), (2, "shifted " + base)], "doc_id long, text string")
    chunks = cdc_chunk_documents(df, window=3, avg_size=4)
    by_doc = {}
    for r in chunks.collect():
        by_doc.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk_text, r.n_words))
    for d in by_doc.values():
        d.sort()
    # reassembly is lossless and ordered
    assert " ".join(t for _, t, _ in by_doc[1]) == base
    assert " ".join(t for _, t, _ in by_doc[2]) == "shifted " + base
    # the two docs share most chunks despite the shift (content-defined!)
    c1 = {t for _, t, _ in by_doc[1]}
    c2 = {t for _, t, _ in by_doc[2]}
    shared = c1 & c2
    assert len(shared) >= max(1, len(c1) - 2), (c1, c2)
    # degenerate params rejected
    import pytest as _pytest
    with _pytest.raises(ValueError, match="avg_size"):
        cdc_chunk_documents(df, window=3, avg_size=1)


def test_fuzzy_dedup_keep_representatives(spark):
    """round-4: one-call fuzzy dedup keeps each near-dup cluster's min-id
    representative and every unclustered doc, with all columns intact."""
    from flink_siddhi_spark.llm.dedup import fuzzy_dedup_keep

    near = "the quick brown fox jumps over the lazy dog again and again today"
    df = spark.createDataFrame(
        [(1, near, "s1"), (2, near + " x", "s2"), (3, near + " y", "s3"),
         (9, "completely different text about catalyst query planners", "s4")],
        "doc_id long, text string, source string")
    kept = fuzzy_dedup_keep(df, threshold=0.5).collect()
    assert sorted(r.doc_id for r in kept) == [1, 9]
    assert {r.source for r in kept} == {"s1", "s4"}  # full rows survive


def test_cdc_chunk_documents_edge_cases(spark):
    """round-4: short/empty docs produce one chunk; reassembly stays
    lossless; avg_size controls expected boundary density."""
    from flink_siddhi_spark.llm.pipeline import cdc_chunk_documents

    df = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "two words")], "doc_id long, text string")
    rows = {r.doc_id: (r.chunk_idx, r.chunk_text, r.n_words)
            for r in cdc_chunk_documents(df, window=3, avg_size=4).collect()}
    # every doc yields at least chunk 0 and round-trips its text
    assert rows[1][1] == "" and rows[2][1] == "one"
    assert rows[3] == (0, "two words", 2) or rows[3][0] == 0
    got = cdc_chunk_documents(df, window=3, avg_size=4)
    assert got.count() >= 3


def test_fuzzy_dedup_keep_no_duplicates_is_identity(spark):
    from flink_siddhi_spark.llm.dedup import fuzzy_dedup_keep

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "one two three four five six seven"),
         (3, "red orange yellow green blue indigo")],
        "doc_id long, text string")
    assert sorted(r.doc_id for r in fuzzy_dedup_keep(df).collect()) == [1, 2, 3]


def test_bloom_contamination_no_false_negatives(docs):
    # Bloom gate must flag a SUPERSET of the exact contamination docs
    bench = docs.filter(F.col("source") == "src0")
    corpus = docs.filter(F.col("source") != "src0")
    exact = {r.doc_id: r.n_hit_ngrams
             for r in P.contamination_ngram(corpus, bench, n=3).collect()}
    bloom = {r.doc_id: r.n_maybe_hits
             for r in P.bloom_contamination(corpus, bench, n=3).collect()}
    assert set(exact) <= set(bloom)
    # a flagged doc's maybe-hits can only exceed its true hits
    assert all(bloom[d] >= exact[d] for d in exact)


def test_bloom_contamination_false_positives_at_tiny_m(docs):
    # m = 16 bits with 4 hashes saturates the bitmap -> everything passes;
    # demonstrates the false-positive side is REAL and bounded by design
    bench = docs.filter(F.col("source") == "src0")
    corpus = docs.filter(F.col("source") != "src0")
    tiny = P.bloom_contamination(corpus, bench, n=3, m_hex=1, k=2)
    wide = P.bloom_contamination(corpus, bench, n=3, m_hex=4, k=4)
    assert tiny.count() >= wide.count()


def test_bloom_contamination_empty_benchmark_and_validation(spark, docs):
    empty = docs.limit(0)
    out = P.bloom_contamination(docs, empty, n=3)
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == ["doc_id", "n_maybe_hits"]
    with pytest.raises(ValueError):
        P.bloom_contamination(docs, docs, m_hex=0)
    with pytest.raises(ValueError):
        P.bloom_contamination(docs, docs, k=0)
