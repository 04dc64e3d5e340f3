"""Training-data pipeline operators: deterministic sampling & splits, domain
quotas, benchmark-contamination checks, token-budget sequence packing, and
sub-document (chunk-level) dedup.

These are the dataset-construction steps a 100 TB pretraining pipeline runs
after filtering/dedup (llm/dedup.py, llm/text.py):

- hash sampling / train-val-test split: ONE narrow projection + filter, no
  shuffle, no RNG state — the keep/route decision is a pure function of
  md5(salt:id), so it is reproducible across runs, engines, and retries
  (hex-prefix compare; rates quantized to 1/256).
- domain quota: one shuffle on the domain key, per-domain deterministic
  hash-ordered row_number — caps any domain at K docs no matter how skewed
  the crawl is (quota ranking is exactly the "cap per registrable domain"
  step of web-corpus curation).
- contamination check: corpus shingles equi-join the (small) benchmark
  shingle set — broadcast the benchmark side, so the corpus never shuffles
  for the probe; one groupBy(doc) for the hit counts. This is the standard
  n-gram decontamination sweep (e.g. GPT-3 appendix-C style).
- sequence packing: documents are routed to 16 independent shards by id
  hash; a per-shard running token total assigns contiguous bin ids
  (floor(exclusive-cumsum / budget)). Per-shard windows parallelize across
  the cluster — there is deliberately NO global-order cumsum here.
- chunk dedup: sub-document exact dedup (C4-style "dedup at the line/chunk
  level"): explode fixed-size word chunks, one hash-aggregate on the chunk
  hash. Same single-shuffle shape as exact document dedup.

All operators are pure Catalyst expressions (whole-stage codegen, no Python
UDFs) and use md5 as the hash so a DuckDB oracle can replay them exactly.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..operators.prefix import global_row_number
from .dedup import _spread, shingle_table


def _shl1(bit: Column) -> Column:
    """``1L << bit`` with a COLUMN shift amount (pyspark's F.shiftleft only
    accepts a Python int for numBits; the SQL function takes a column)."""
    return F.call_function("shiftleft", F.lit(1).cast("long"), bit)


def _hash_hex(col: Column, salt: str, nchars: int = 2) -> Column:
    """First ``nchars`` hex digits of md5('<salt>:' + str(col)) — an engine-
    portable uniform hash usable with plain lexicographic compares."""
    return F.substring(F.md5(F.concat(F.lit(salt + ":"), col.cast("string"))), 1, nchars)


def _keep(h: Column, rate: float) -> Column:
    """keep-predicate for a sampling ``rate`` quantized to 1/256."""
    b = int(rate * 256)
    if b >= 256:
        return F.lit(True)
    if b <= 0:
        return F.lit(False)
    return h < F.lit(format(b, "02x"))


def sample_hash(
    df: DataFrame,
    rate: float,
    strata: Optional[Mapping[str, float]] = None,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Deterministic (stratified) hash sampling.

    Keeps a row iff the 2-hex-digit prefix of md5(salt:id) falls below the
    stratum's rate threshold (``strata`` overrides ``rate`` per stratum
    value). No shuffle, no RNG — the sample is a pure projection+filter and
    therefore stable under retries, repartitioning, and engine changes.
    Rates are quantized to 1/256 (documented contract, not an accident)."""
    h = _hash_hex(F.col(id_col), salt)
    keep = _keep(h, rate)
    if strata:
        expr = None
        for value, r in strata.items():
            cond = F.col(stratum_col) == value
            expr = F.when(cond, _keep(h, r)) if expr is None else expr.when(cond, _keep(h, r))
        keep = expr.otherwise(_keep(h, rate))
    return df.filter(keep)


def train_split(
    df: DataFrame,
    weights: Sequence[float] = (0.9, 0.05, 0.05),
    labels: Sequence[str] = ("train", "val", "test"),
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test routing by id hash (quantized to 1/256).

    Adds a ``split`` column; same scale shape as ``sample_hash`` (narrow,
    shuffle-free, reproducible)."""
    if len(weights) != len(labels):
        raise ValueError("weights and labels must align")
    h = _hash_hex(F.col(id_col), salt)
    edges = []
    acc = 0.0
    for w in weights[:-1]:
        acc += w
        edges.append(min(255, int(acc * 256)))
    expr = None
    for edge, label in zip(edges, labels[:-1]):
        cond = h < F.lit(format(edge, "02x"))
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    expr = expr.otherwise(F.lit(labels[-1])) if expr is not None else F.lit(labels[-1])
    return df.withColumn("split", expr)


def stratified_sample_exact(
    df: DataFrame,
    fraction: float,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "strat",
) -> DataFrame:
    """Exact-count stratified sampling: keeps ``ceil(fraction * n_s)`` rows
    from every stratum (fraction quantized to 1e-6), chosen by
    deterministic hash order — unlike ``sample_hash`` (whose per-stratum
    keep-count is binomial around the rate), the per-stratum proportions
    here are EXACT, which is what evaluation-set construction needs. Adds
    ``srank``, the row's 1-based hash-order rank within its stratum.

    The keep predicate is pure 64-bit integer arithmetic —
    ``(srank-1) * 1_000_000 < n_s * ppm`` is exactly ``srank <=
    ceil(n_s * ppm / 1e6)`` with no division — because ``ceil(fraction *
    count)`` in doubles is wrong in both directions at scale (0.2*65 =
    13.000000000000002 → 14; precision loss past 2^53 rows). Integer math
    is also what makes the DuckDB oracle replay it bit-for-bit.

    Scale shape: one shuffle on the stratum key; the per-stratum count and
    the row_number ranking share that single exchange (two Window operators,
    same partitioning — Catalyst inserts one Exchange). Same skew bound as
    ``domain_quota``: a stratum sorts on one task; AQE skew-split covers a
    dominant stratum."""
    if not 0.0 < fraction <= 1.0:
        raise ValueError("fraction must be in (0, 1]")
    ppm = max(1, int(round(fraction * 1_000_000)))
    order = Window.partitionBy(stratum_col).orderBy(
        _hash_hex(F.col(id_col), salt, 8), F.col(id_col)
    )
    whole = Window.partitionBy(stratum_col)
    n_s = F.count(F.lit(1)).over(whole)
    return (
        df.withColumn("srank", F.row_number().over(order).cast("int"))
        .withColumn("__n", n_s)
        .filter(
            (F.col("srank").cast("bigint") - 1) * F.lit(1_000_000)
            < F.col("__n") * F.lit(ppm)
        )
        .drop("__n")
    )


def domain_quota(
    df: DataFrame,
    quota: int,
    domain_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "quota",
) -> DataFrame:
    """Cap each domain at ``quota`` docs, chosen by deterministic hash order.

    One shuffle on the domain key; within a domain, row_number over
    (hash(id), id) picks a stable pseudo-random subset. Skewed domains (one
    host = 10% of the crawl) cost one big partition of ranking, not a
    cross-join — and AQE skew-split handles the sort spill. Output keeps the
    rank (``qrank``) so downstream can tighten the quota without re-ranking."""
    w = Window.partitionBy(domain_col).orderBy(_hash_hex(F.col(id_col), salt, 8), F.col(id_col))
    return (
        df.withColumn("qrank", F.row_number().over(w).cast("int"))
        .filter(F.col("qrank") <= quota)
    )


def contamination_ngram(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    min_hits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flag corpus docs sharing >= ``min_hits`` word n-grams with a benchmark
    set (decontamination sweep before training).

    Scale shape: the benchmark side is tiny relative to the corpus, so its
    shingle table is BROADCAST — the corpus-side shingle explode never
    shuffles for the probe; the only shuffle is the per-doc hit-count
    aggregate. Returns (doc_id, n_hit_ngrams, n_bench_docs)."""
    c = shingle_table(_spread(corpus.select(id_col, text_col)), text_col, id_col, n)
    b = (
        shingle_table(benchmark.select(id_col, text_col), text_col, id_col, n)
        .withColumnRenamed(id_col, "bench_id")
    )
    return (
        c.join(F.broadcast(b), "shingle")
        .groupBy(id_col)
        .agg(
            F.countDistinct("shingle").alias("n_hit_ngrams"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
        .filter(F.col("n_hit_ngrams") >= min_hits)
    )


def bloom_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    min_hits: int = 1,
    m_hex: int = 4,
    k: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Bloom-filter decontamination gate: like :func:`contamination_ngram`
    but the benchmark side collapses to an m-bit Bloom bitmap (m = 16^m_hex,
    ``k`` md5-derived hash functions) that ships to every task as a literal
    longs array — 16^4 bits = 8 KB instead of a broadcast shingle table.
    This is the 100 TB shape when the benchmark suite itself is large: the
    probe side stays a map-only scan + ONE per-doc aggregate regardless of
    benchmark size, and the bitmap build is one |bench-shingle|-bounded
    aggregate onto m/64 rows.

    Bloom semantics: NO false negatives (every truly-contaminated shingle
    passes), false positives at rate ~(n_bits_set/m)^k — so the output is a
    superset of :func:`contamination_ngram`'s doc set, suitable as a cheap
    first-pass gate before the exact verifier. Returns
    ``(doc_id, n_maybe_hits)`` for docs with >= ``min_hits`` passing
    shingles.

    Engine-exact: hash i maps a shingle to position md5(i ':' shingle)[:m_hex]
    (a hex string — the DuckDB oracle replays membership as a positions
    semi-join with count(DISTINCT i) = k, which is pointwise-identical to
    the bitmap test). The m/64-longs driver round-trip is the broadcast-
    model pattern (same as kmeans centroids), not a data collect.
    """
    if not 1 <= m_hex <= 8 or k < 1:
        raise ValueError("m_hex in [1, 8] and k >= 1 required")
    m = 16 ** m_hex

    def positions(sh: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda i: F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", i.cast("string"), sh)), 1, m_hex
                ),
                16,
                10,
            ).cast("long"),
        )

    bench_sh = shingle_table(benchmark.select(id_col, text_col), text_col, id_col, n)
    bits_rows = (
        bench_sh.select(F.explode(positions(F.col("shingle"))).alias("p"))
        .distinct()
        .groupBy((F.col("p") / 64).cast("int").alias("w"))
        .agg(
            F.bit_or(_shl1((F.col("p") % 64).cast("int")))
            .alias("bits")
        )
        .collect()
    )
    words = [0] * ((m + 63) // 64)
    for r in bits_rows:
        words[r.w] = r.bits
    if not bits_rows:
        # empty benchmark -> nothing can be contaminated
        return corpus.select(F.col(id_col)).limit(0).withColumn(
            "n_maybe_hits", F.lit(0).cast("bigint")
        )
    # ONE server-side parse for the m/64-longs literal (round 10): building
    # it as F.array of 1024 F.lit columns paid ~6 py4j round-trips per
    # element (~2.5s of plan-construction latency per call); the SQL literal
    # array carries the identical values
    bitmap = F.expr(
        "array(" + ", ".join(f"{wd}L" for wd in words) + ")"
    )
    member = lambda p: (  # noqa: E731
        F.element_at(bitmap, (p / 64).cast("int") + 1).bitwiseAND(
            _shl1((p % 64).cast("int"))
        )
        != 0
    )
    c = shingle_table(_spread(corpus.select(id_col, text_col)), text_col, id_col, n)
    passed = c.filter(F.forall(positions(F.col("shingle")), member))
    return (
        passed.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_maybe_hits"))
        .filter(F.col("n_maybe_hits") >= min_hits)
    )


def pack_sequences(
    df: DataFrame,
    budget: int = 512,
    shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "pack",
) -> DataFrame:
    """Assign docs to contiguous token-budget bins for sequence packing.

    Docs are routed to one of ``shards`` independent shards by id hash; each
    shard packs its docs in id order with a running token total, and
    bin_id = floor(exclusive_cumsum / budget). The cumsum window partitions
    by shard, so the work spreads over ``shards`` tasks — packing quality is
    per-shard greedy (the standard trade: global-order packing would need a
    single-task global cumsum). Returns (doc_id, shard, n_tokens,
    cum_tokens, bin_id).

    Note: only shards=16 uses the 1-hex-digit router below; other values
    would need a wider hash modulus."""
    if shards != 16:
        raise ValueError("pack_sequences routes by one hex digit; shards must be 16")
    shard = F.substring(F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))), 1, 1)
    ntok = F.size(F.split(F.col(text_col), " ")).cast("bigint")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.select(F.col(id_col), shard.alias("shard"), ntok.alias("n_tokens"))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("bigint"))
        .withColumn(
            "bin_id",
            F.floor((F.col("cum_tokens") - F.col("n_tokens")) / F.lit(budget)).cast("bigint"),
        )
    )


def training_order(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "shuffle",
) -> DataFrame:
    """Deterministic global training-order shuffle with materialized positions.

    Orders the corpus by md5(salt:id) — a seeded, reproducible permutation —
    and assigns each doc its 1-based global position ``pos``. The position is
    computed with the distributed prefix-sum (operators/prefix.py): range-
    partition on the hash key, per-partition row_number, tiny broadcast
    offsets — NOT a single-task global ``Window.orderBy``, so it scales to
    the full corpus. Changing ``salt`` yields an independent epoch order."""
    key = F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    out = df.withColumn("shuffle_key", key)
    out = global_row_number(out, ["shuffle_key", id_col], "pos")
    return out.withColumn("pos", F.col("pos").cast("bigint"))


def chunk_dedup(
    df: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sub-document exact dedup over fixed-size word chunks.

    Splits each doc into consecutive ``k``-word chunks (last chunk may be
    short), hashes each, and aggregates per chunk hash: canonical (min) doc
    and occurrence count. One explode + one hash-aggregate — identical
    single-shuffle shape to exact document dedup, with rows multiplied by
    chunks/doc (bounded: len/k)."""
    words = F.split(F.lower(F.col(text_col)), " ")
    n_chunks = F.ceil(F.size(words) / F.lit(k)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(words, i * k + 1, k)),
    )
    ex = _spread(df.select(id_col, text_col)).select(
        F.col(id_col), F.explode(chunks).alias("__c")
    )
    return ex.groupBy(F.md5(F.col("__c")).alias("chunk_hash")).agg(
        F.min(id_col).alias("canonical_id"),
        F.count(F.lit(1)).alias("n_occurrences"),
    )


def _uniform01(col: Column, salt: str) -> Column:
    """Deterministic uniform(0,1) from md5(salt:id): the first 8 hex digits
    parsed as an integer, divided by 16^8 — engine-portable (DuckDB:
    CAST(concat('0x', substring(md5(..),1,8)) AS BIGINT) / 4294967296.0)."""
    h8 = F.substring(F.md5(F.concat(F.lit(salt + ":"), col.cast("string"))), 1, 8)
    return F.conv(h8, 16, 10).cast("double") / F.lit(4294967296.0)


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    rate: float = 1.0,
    id_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted Bernoulli sampling: keep a row iff
    uniform01(md5(salt:id)) < rate * weight — quality-weighted corpus
    downsampling (keep high-quality docs with higher probability) that is
    reproducible across runs, engines, retries, and repartitioning.

    Same 100 TB shape as ``sample_hash``: a narrow projection + filter, no
    shuffle, no RNG state. ``weight_col`` should be in [0, 1]; the effective
    keep probability is clamped to 1."""
    u = _uniform01(F.col(id_col), salt)
    return df.filter(u < F.col(weight_col).cast("double") * F.lit(float(rate)))


def chunk_documents(
    df: DataFrame,
    size: int = 64,
    stride: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlapping sliding-window chunks for training-sequence construction:
    ``size``-word chunks every ``stride`` words (the last window may be
    short; a doc shorter than ``size`` yields one chunk).

    Returns (doc_id, chunk_idx, chunk_text, n_words). Pure array expressions
    (sequence/transform/slice + ONE explode) — whole-stage codegen, rows
    bounded by ceil(len/stride) per doc, no shuffle at all: chunking stays
    partition-local, so a downstream per-chunk operator (tokenize, hash,
    embed) runs on co-located data."""
    if size <= 0 or stride <= 0:
        raise ValueError(f"chunk_documents: size ({size}) and stride ({stride}) must be > 0")
    if stride > size:
        raise ValueError(
            f"chunk_documents: stride ({stride}) > size ({size}) would silently "
            "skip words between consecutive chunks; use stride <= size"
        )
    words = F.split(F.col(text_col), " ")
    nw = F.size(words)
    n_chunks = F.when(nw <= size, F.lit(1)).otherwise(
        F.ceil((nw - size) / F.lit(stride)).cast("int") + 1
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_idx"),
            F.concat_ws(" ", F.slice(words, i * stride + 1, size)).alias("chunk_text"),
            F.least(F.lit(size), nw - i * stride).cast("int").alias("n_words"),
        ),
    )
    return (
        df.select(F.col(id_col), F.explode(chunks).alias("__c"))
        .select(id_col, "__c.chunk_idx", "__c.chunk_text", "__c.n_words")
    )


def cdc_chunk_documents(
    df: DataFrame,
    window: int = 4,
    avg_size: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Content-defined chunking (rsync/LBFS-style) over word streams: a word
    position ENDS a chunk when the rolling-context hash satisfies
    ``hash % avg_size == 0`` (expected chunk length = ``avg_size`` words),
    where the context is the trailing ``window``-word string at that
    position. Boundaries depend only on local CONTENT, not absolute
    position — so inserting or deleting words early in a document leaves
    all later chunk boundaries (beyond one window) aligned, and chunk-level
    dedup still finds the shared content that fixed-stride chunking
    (``chunk_dedup``/``chunk_documents``) would miss entirely after a
    one-word shift.

    Returns (doc_id, chunk_idx, chunk_text, n_words).

    Distributed shape — BOUNDARY POSITIONS ONLY cross the network: context
    strings are built with array expressions, positions explode, the md5
    runs TOP-LEVEL on exploded rows (whole-stage codegen — hashing inside
    a higher-order lambda runs interpreted, ~10x slower), and the boundary
    filter runs INSIDE the explode stage, so the doc-keyed aggregation
    shuffles ~|tokens|/avg_size boundary rows instead of every word row.
    Chunks are then rebuilt by slicing the doc's word array between
    consecutive boundaries (one doc-keyed hash join of the corpus against
    its collected boundary lists + codegen'd slice/concat_ws per chunk) —
    no per-word Window running count, no collect_list of the whole corpus'
    words. (The previous Window+collect shape moved every (pos, word) row
    through the exchange and its sort; measured 2.2x over linear at 10x
    scale in the round-4 driver run.)"""
    if window <= 0 or avg_size <= 1:
        raise ValueError(
            f"cdc_chunk_documents: window ({window}) must be > 0 and "
            f"avg_size ({avg_size}) > 1"
        )
    words = F.split(F.lower(F.col(text_col)), " ")
    specs = F.transform(
        F.sequence(F.lit(1), F.size(words)),
        lambda i: F.struct(
            i.cast("int").alias("pos"),
            F.concat_ws(
                " ",
                F.slice(words, F.greatest(F.lit(1), i - (window - 1)),
                        F.least(F.lit(window), i)),
            ).alias("ctx"),
        ),
    )
    ex = _spread(df.select(id_col, text_col)).select(
        F.col(id_col), F.explode(specs).alias("s")
    ).select(id_col, "s.pos", "s.ctx")
    is_bnd = (
        F.conv(F.substring(F.md5(F.col("ctx")), 1, 8), 16, 10).cast("bigint")
        % avg_size == 0
    )
    bounds = (
        ex.filter(is_bnd)
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("pos")).alias("__bounds"))
    )
    base = df.select(F.col(id_col), words.alias("__w"))
    j = base.join(bounds, id_col, "left").withColumn(
        "__bounds", F.coalesce(F.col("__bounds"), F.array().cast("array<int>"))
    )
    # chunk k spans words (starts[k], ends[k]]; a boundary word is the LAST
    # word of its chunk (chunk_idx = boundaries strictly before the word),
    # and a trailing boundary at the doc's last word leaves no final chunk
    starts = F.concat(F.array(F.lit(0)), F.col("__bounds"))
    ends = F.concat(F.col("__bounds"), F.array(F.size("__w")))
    chunk_structs = F.filter(
        F.transform(
            F.sequence(F.lit(0), F.size("__bounds")),
            lambda i: F.struct(
                i.cast("int").alias("chunk_idx"),
                F.element_at(starts, i + 1).alias("s"),
                F.element_at(ends, i + 1).alias("e"),
            ),
        ),
        lambda c: c["e"] > c["s"],
    )
    return (
        j.select(F.col(id_col), F.col("__w"), F.explode(chunk_structs).alias("c"))
        .select(
            F.col(id_col),
            F.col("c.chunk_idx").alias("chunk_idx"),
            F.concat_ws(
                " ", F.slice("__w", F.col("c.s") + 1, F.col("c.e") - F.col("c.s"))
            ).alias("chunk_text"),
            (F.col("c.e") - F.col("c.s")).cast("int").alias("n_words"),
        )
    )


def novel_documents(
    df: DataFrame, seen: DataFrame, text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Incremental-crawl novelty filter: keep only docs whose content hash is
    NOT already in the ingested corpus — the per-snapshot dedup step of a
    continuously refreshed training set.

    Distributed shape: LEFT ANTI hash join on md5(text). The seen side is a
    hash-only projection (its text column never leaves the scan ungrouped);
    both sides shuffle on the 32-char hash. For repeated incremental runs at
    100 TB, persist the seen-hash set as a table bucketed by hash so the
    anti-join becomes shuffle-free on the (huge) history side; a Bloom
    filter over seen hashes (~10 bits/key) can pre-drop novel docs before
    the join. The exact anti-join here is the verifiable contract both
    optimizations must preserve."""
    seen_h = (
        seen.select(F.md5(F.col(text_col)).alias("__h")).dropDuplicates(["__h"])
    )
    return (
        df.withColumn("__h", F.md5(F.col(text_col)))
        .join(seen_h, "__h", "left_anti")
        .drop("__h")
    )


def curate(
    df: DataFrame,
    min_quality: float = 0.4,
    sample_rate: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Composed end-to-end curation slice — the canonical three-stage corpus
    prep in one call: quality gate (llm.text.quality_score) -> canonical-only
    exact dedup (keep each content-hash group's min-id doc) -> deterministic
    hash downsample.

    Scale shape: the quality gate is a codegen'd projection+filter fused into
    the scan; dedup is ONE window shuffle on md5(text) (min-id per hash —
    no join back); the sample is again a pure filter. Net: one shuffle for
    the whole pipeline, and the quality filter runs BEFORE the shuffle so
    rejected docs never shuffle at all."""
    from pyspark.sql import Window

    from .text import quality_score

    q = quality_score(df, text_col).filter(F.col("quality") >= min_quality)
    q = q.withColumn("__h", F.md5(F.col(text_col)))
    q = q.withColumn("__cmin", F.min(id_col).over(Window.partitionBy("__h")))
    q = q.filter(F.col(id_col) == F.col("__cmin")).drop("__h", "__cmin")
    return sample_hash(q, sample_rate, id_col=id_col, salt=salt)


def interleave_sources(
    df: DataFrame,
    weights: Mapping[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Deterministic mixture scheduling for training-data source mixing:
    interleave documents so that, at any prefix of the output order, each
    source appears in proportion to its weight (stride scheduling — the
    k-th doc of a weight-w source lands at mix key k/w, so heavier sources
    recur more often). Sources absent from ``weights`` are dropped
    (weight-0 semantics).

    Shape: one keyed window per source for the per-source sequence number
    (order = md5 shuffle within the source, so the interleave also
    de-clusters each source), then the distributed global prefix-sum for
    the output position — no single-task sort (operators/prefix.py), no
    RNG state, reproducible across runs/retries/partitionings.

    Returns (id_col, source, mix_key, pos): consumers can stream in ``pos``
    order or re-sort shards by ``mix_key`` (which is stable even if the
    corpus is re-sharded)."""
    for s, v in weights.items():
        if v <= 0:
            raise ValueError(f"interleave_sources: weight for {s!r} must be > 0")
    wmap = F.create_map(
        *[x for s, v in sorted(weights.items()) for x in (F.lit(s), F.lit(float(v)))]
    )
    kept = df.filter(F.col(source_col).isin(*weights.keys()))
    shuffle_key = F.md5(
        F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(F.col(source_col)).orderBy(shuffle_key, F.col(id_col))
    keyed = kept.select(
        F.col(id_col),
        F.col(source_col).alias("source"),
        (
            F.row_number().over(w).cast("double")
            / wmap[F.col(source_col)]
        ).alias("mix_key"),
    ).withColumn("mix_key", F.round("mix_key", 6))
    out = global_row_number(keyed, ["mix_key", "source", id_col], "pos")
    return out.select(id_col, "source", "mix_key", F.col("pos").cast("bigint").alias("pos"))


def quality_top_fraction(
    df: DataFrame, frac: float = 0.3, by: str = "lang",
    score_col: str = "quality", id_col: str = "doc_id",
) -> DataFrame:
    """Keep the best ``frac`` of documents per group by a quality score —
    the dynamic-threshold quality gate (a fixed score cutoff keeps wildly
    different fractions per language/source; a fractional gate adapts).

    Deterministic: rank by (score desc, id asc); a group of n rows keeps
    ceil(n * frac). ONE shuffle (the rank window and the group count share
    the same partitioning); per-group state is O(1) per row in the window
    operator. Skewed groups (one language dominating) are bounded by the
    sort within each partition — same cost profile as any per-key top-k."""
    if not (0.0 < frac <= 1.0):
        raise ValueError(f"quality_top_fraction: frac ({frac}) must be in (0, 1]")
    w = Window.partitionBy(by).orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    cnt = Window.partitionBy(by)
    return (
        df.withColumn("q_rank", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(cnt))
        .filter(F.col("q_rank") <= F.ceil(F.col("__n") * F.lit(frac)))
        .drop("__n")
    )


def hash_embeddings(
    df: DataFrame, dim: int = 16, text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic hash-feature document embeddings in [-1, 1) — the
    embedding-GENERATION stage of a training-data pipeline, as a documented
    stand-in for a neural encoder (no model runtimes in this environment;
    swap the projection for an Arrow-batched ``mapInPandas`` encoder and
    every downstream stage — ``semantic_dedup``, ANN, clustering — is
    unchanged, which is the deliverable here).

    ``embedding[i] = int(md5(f"{i}:" + text)[:8], 16) / 2^31 - 1`` — pure
    Catalyst (md5/conv/arithmetic), whole-stage codegen'd, zero shuffle,
    and reproducible in ANSI SQL for the oracle. 32-bit ints are exact in
    doubles, so both engines compute bit-identical values."""
    if dim <= 0:
        raise ValueError(f"hash_embeddings: dim ({dim}) must be > 0")
    comps = []
    for i in range(dim):
        h = F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{i}:"), F.col(text_col))), 1, 8), 16, 10
        ).cast("double")
        comps.append((h / F.lit(float(2 ** 31)) - 1.0))
    return df.withColumn("embedding", F.array(*comps))


def mixture_weights(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    targets: Optional[Mapping[str, float]] = None,
) -> DataFrame:
    """Per-source sampling weights for domain-mixture rebalancing: the
    multiplier each source's documents need so the TOKEN mixture matches
    ``targets`` (source -> desired token fraction; default uniform across
    observed sources). weight > 1 = upsample, < 1 = downsample — the
    numbers a curation run feeds straight into ``weighted_sample``.

    Scale shape: ONE hash aggregate on the source key with map-side
    partials (the only stage that sees document-scale data); the share /
    weight arithmetic runs on |sources| rows via an unpartitioned window,
    which is a deliberate single-task stage over a handful of rows.
    Output: (source, n_docs, n_tokens, token_share, weight), rounded to 6
    decimals under the repo's deterministic-decimal contract."""
    toks = F.size(F.split(F.col(text_col), " ")).cast("bigint")
    per = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(toks).alias("n_tokens"),
    )
    everything = Window.partitionBy()
    share = F.col("n_tokens") / F.sum("n_tokens").over(everything)
    if targets is None:
        target = F.lit(1.0) / F.count(F.lit(1)).over(everything)
    else:
        pairs = [x for kv in targets.items() for x in kv]
        target = F.coalesce(
            F.create_map(*[F.lit(v) for v in pairs])[F.col("source")],
            F.lit(0.0),
        )
    return per.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(share, 6).alias("token_share"),
        F.round(target / share, 6).alias("weight"),
    )


def dsir_weights(
    df: DataFrame,
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_hex: int = 2,
) -> DataFrame:
    """DSIR-style importance weights (Data Selection via Importance
    Resampling, Xie et al. 2023): score every document by how much more
    likely its hashed-unigram bag is under the TARGET domain's word
    distribution than under the raw corpus distribution. ``target`` is a
    boolean Column marking the in-corpus exemplar rows (e.g. a trusted
    source); the log-weight is the input to importance resampling /
    ``weighted_sample``.

    Features are md5 hash buckets (m = 16^prefix_hex), the same
    engine-portable hashing the sketch module uses, so a DuckDB oracle
    replays the exact weights. Probabilities are add-one smoothed; the
    per-bucket log-ratio is rounded to 12 decimals and per-doc sums run
    through DECIMAL(38,12) (deterministic across partitionings/engines).

    Scale shape: two corpus passes, no corpus-scale shuffle beyond the
    doc-keyed sum — pass 1 aggregates word counts into the m-row bucket
    table (map-side partials collapse to m keys); pass 2 equi-joins the
    exploded words to the BROADCAST m-row log-ratio map and sums per doc.
    The global-stats-then-broadcast-back shape is the same as
    ``mixture_weights`` / z-score; nothing document-scale ever sits in a
    wide stage.
    """
    p = int(prefix_hex)
    if not 1 <= p <= 4:
        raise ValueError("prefix_hex must be in [1, 4]")
    m = 16 ** p
    w = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("__w"),
        target.alias("__is_t"),
    ).withColumn(
        "__b", F.substring(F.md5(F.concat(F.lit("dsir:"), F.col("__w"))), 1, p)
    )
    buckets = w.groupBy("__b").agg(
        F.count(F.lit(1)).alias("__nr"),
        F.sum(F.when(F.col("__is_t"), 1).otherwise(0)).alias("__nt"),
    )
    totals = buckets.agg(
        F.sum("__nr").alias("__tr"), F.sum("__nt").alias("__tt")
    )
    lam = (
        buckets.crossJoin(F.broadcast(totals))
        .select(
            "__b",
            F.round(
                F.log((F.col("__nt") + 1.0) / (F.col("__tt") + float(m)))
                - F.log((F.col("__nr") + 1.0) / (F.col("__tr") + float(m))),
                12,
            )
            .cast("decimal(38,12)")
            .alias("__lam"),
        )
    )
    return (
        w.join(F.broadcast(lam), "__b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.round(F.sum("__lam").cast("double"), 6).alias("dsir_logw"),
        )
    )


def dsir_resample(
    df: DataFrame,
    target: Column,
    n_out: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_hex: int = 2,
    seed: str = "dsir-g",
) -> DataFrame:
    """The DSIR selection step: importance resampling without replacement
    via the Gumbel-top-k trick — key_i = logw_i + Gumbel(0,1), take the
    ``n_out`` largest keys. Sampling ∝ exp(logw) this way never
    materializes exp(logw) (which under/overflows across a corpus-scale
    weight range); the noise is hash-derived (first 8 md5 hex digits →
    uniform in (0,1)), so the sample is DETERMINISTIC and the DuckDB
    oracle replays it key-for-key (round-6 keys).

    Scale shape: ``dsir_weights``'s passes plus one map-side key
    projection and a TakeOrderedAndProject for the global top-n — no
    full sort; only n_out rows survive per partition before the merge."""
    w = dsir_weights(df, target, text_col, id_col, prefix_hex)
    u = (
        F.conv(_hash_hex(F.col(id_col), seed, 8), 16, 10).cast("double") + 0.5
    ) / float(2**32)
    key = F.round(F.col("dsir_logw") + -F.log(-F.log(u)), 6)
    return (
        w.withColumn("gumbel_key", key)
        .orderBy(F.col("gumbel_key").desc(), F.col(id_col))
        .limit(n_out)
    )


def exact_k_sample(
    df: DataFrame,
    k: int,
    id_col: str = "doc_id",
    seed: str = "rsv",
) -> DataFrame:
    """Deterministic uniform sample of EXACTLY ``k`` rows without
    replacement: rank by the md5 hash of the id (a fixed pseudo-random
    permutation of the corpus) and keep the first ``k``. The exact-count
    companion of the fraction-based ``deterministic_sample`` — data
    loaders and eval sets usually want "give me exactly 10k docs", not a
    fraction that wobbles with corpus size.

    Scale shape: TakeOrderedAndProject on (hash, id) — each task keeps k
    candidates, the driver merges k*n_partitions rows; the corpus never
    globally sorts. Same-id determinism across engines: md5 of the
    decimal id string, ties impossible (ids are unique)."""
    if k < 0:
        raise ValueError("k must be >= 0")
    key = _hash_hex(F.col(id_col), seed, 32)
    return df.orderBy(key.asc(), F.col(id_col).asc()).limit(k)


def quality_budget_select(
    df: DataFrame,
    token_budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fill a token budget with the best documents: rank the corpus by
    (quality desc, id) and keep the maximal prefix whose inclusive token
    cumsum stays within ``token_budget`` — the standard greedy selection
    behind "give me the best N-billion tokens" (prefix rule, not knapsack:
    the first doc that would overflow ends the take).

    Scale shape: quality is a pure projection; the global cumulative sum
    runs through the DISTRIBUTED prefix sum (operators/prefix.py — range
    repartition + per-shard windows + an n_partitions-row offset table),
    so nothing funnels through a single task the way a bare global-order
    Window would. Output: (id, n_words, quality, cum_tokens), budget-
    filtered."""
    from .text import quality_score

    from ..operators.prefix import running_sum

    if token_budget < 0:
        raise ValueError("token_budget must be >= 0")
    q = quality_score(df, text_col).select(id_col, "n_words", "quality")
    ordered = [F.col("quality").desc(), F.col(id_col).asc()]
    withsum = running_sum(q, ordered, F.col("n_words"), "cum_tokens")
    return (
        withsum.filter(F.col("cum_tokens") <= token_budget)
        .select(
            id_col, "n_words", "quality",
            F.col("cum_tokens").cast("bigint").alias("cum_tokens"),
        )
    )


def cluster_balanced_sample(
    embs: DataFrame,
    per_cluster: int,
    n_clusters: int = 8,
    n_iter: int = 3,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    seed: str = "cbs",
    codebook: list | None = None,
) -> DataFrame:
    """Cluster-balanced sampling — the diversity-preserving selection a
    pretraining mix actually wants: k-means the embedding space (the
    deterministic m=1 Lloyd trainer, ``similarity.pq_train_codebook``),
    then take EXACTLY ``per_cluster`` vectors per cluster by the same
    md5-permutation rule as ``exact_k_sample``. A uniform sample
    over-represents dense regions; sampling per semantic cluster keeps the
    tails (the curriculum/diversity argument from DoReMi/DSIR-adjacent
    practice). Returns (id, centroid_id) for the selected rows.

    Deterministic end-to-end (trained centroids under the decimal/HUGEINT
    contract, md5 permutation, id tiebreaks), so the DuckDB oracle replays
    training, assignment, and the per-cluster draw. Scale shape: training
    is train_cap-bounded; assignment is the zero-shuffle encode pass; the
    draw is ONE hash exchange on centroid_id with a per-cluster rank
    (clusters ~ balanced by construction, so no single task inherits the
    corpus)."""
    from .similarity import pq_encode, pq_train_codebook

    if per_cluster < 0:
        raise ValueError("per_cluster must be >= 0")
    # ``codebook=`` pass-through (round-7 VERDICT ask #6): a pipeline that
    # already trained centroids (e.g. for its ANN index) reuses them here
    # instead of re-running the Lloyd passes
    cb = codebook if codebook is not None else pq_train_codebook(
        embs, 1, n_clusters, n_iter, emb_col, id_col
    )
    assign = pq_encode(
        embs, 1, emb_col=emb_col, id_col=id_col, codebook=cb
    ).select(F.col(id_col), F.col("codes")[0].alias("centroid_id"))
    key = _hash_hex(F.col(id_col), seed, 32)
    w = Window.partitionBy("centroid_id").orderBy(key.asc(), F.col(id_col).asc())
    return (
        assign.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= per_cluster)
        .select(id_col, "centroid_id")
    )
