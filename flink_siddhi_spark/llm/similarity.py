"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — broadcast the (small) query set
  against the corpus, rank per query. The corpus side streams; this is the
  exact baseline and scales to any corpus size (one pass, no shuffle of the
  corpus beyond the final per-query top-k aggregation).
- ``ivf_topk``: IVF-style approximate search — corpus is bucketed by nearest
  centroid (k-means-free: deterministic seed vectors as centroids), queries
  probe only ``n_probe`` nearest buckets. At 100 TB this turns a full scan
  into a partition-pruned scan (bucket = partition key).
"""

from __future__ import annotations

import re as _re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import _spread, cosine, dot, norm, safe_div


def _dim_of(df: DataFrame, emb_col: str):
    """Embedding width, probed once at plan time (one tiny driver action) so
    dot products unroll into codegen'd arithmetic instead of interpreted
    array folds. None when the table is empty (falls back to the fold)."""
    row = df.select(F.size(F.col(emb_col)).alias("d")).first()
    return int(row.d) if row is not None else None


def _two_phase_topk(scored: DataFrame, k: int, id_cols=("query_id", "neighbor_id")) -> DataFrame:
    """Rank (cos desc, neighbor_id asc) per query WITHOUT shuffling the pair
    stream.

    Phase 1 — local top-k: an Arrow-batched ``mapInPandas`` pass keeps, per
    input partition, only the best ``k`` candidates per query (running
    concat-sort-head over batches, bounded memory: <= k rows per query per
    partition). The scored pairs themselves never cross the network: each
    scan task emits <= k * n_queries rows. This is the piece Catalyst cannot
    express — every built-in formulation (Window, groupBy+collect_list)
    shuffles the full |corpus| x |queries| pair stream and lands each
    query's candidates on ONE task, which serializes at a 100 TB corpus.

    Phase 2 — merge: a per-query Window rank over the k * n_partitions
    survivors (tiny). Phase 1 truncates with the SAME total order the merge
    uses, so the result is bit-identical to the single-phase rank; ``cos``
    is rounded before Arrow transfer and round-trips exactly (IEEE double).
    """
    qcol, ncol = id_cols
    # NaN cosines (zero-norm embeddings: 0.0/0.0 is NaN, not null) order
    # differently in the two phases — Spark's Window desc puts NaN FIRST,
    # pandas sort_values puts it LAST — so phase 1 would discard rows the
    # merge rank would keep. Dropping them makes the ranking well-defined
    # and the two-phase result identical to a single-phase rank over the
    # same (NaN-free) domain; a zero-norm vector has no meaningful cosine
    # to anything, so exclusion is the right semantics, not a loss.
    slim = scored.select(qcol, ncol, "cos").filter(
        F.col("cos").isNotNull() & ~F.isnan("cos")
    )
    schema = slim.schema

    def part_topk(batches):
        import pandas as pd

        # chunked accumulation: compress to per-query top-k only every
        # ~256k buffered rows, not per Arrow batch — the sort+groupby is
        # the per-row cost driver, and amortizing it over 25x bigger
        # chunks keeps memory bounded (chunk + k rows/query) while cutting
        # Python time ~an order of magnitude on large partitions
        cap = 262_144
        best, acc, acc_rows = None, [], 0

        def compress():
            nonlocal best, acc, acc_rows
            frames = ([best] if best is not None else []) + acc
            cand = frames[0] if len(frames) == 1 else pd.concat(frames, ignore_index=True)
            cand = cand.sort_values(
                [qcol, "cos", ncol], ascending=[True, False, True], kind="mergesort"
            )
            best = cand.groupby(qcol, sort=False).head(k)
            acc, acc_rows = [], 0

        for pdf in batches:
            acc.append(pdf)
            acc_rows += len(pdf)
            if acc_rows >= cap:
                compress()
        if acc:
            compress()
        if best is not None and len(best):
            yield best

    local = slim.mapInPandas(part_topk, schema)
    w = Window.partitionBy(qcol).orderBy(F.col("cos").desc(), F.col(ncol).asc())
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qcol, ncol, "cos", "rank")
    )


def _auto_engine(nc, nq) -> str:
    """Cost-based scorer pick shared by ``cosine_topk``/``pq_topk``: below
    ~200k estimated pairs the Python-worker roundtrip costs more than the
    interpreted join evaluates (measured crossover: 20k pairs join 0.29s vs
    numpy 0.63s; 200k pairs join ~1.5s vs numpy ~0.9s); unknown sizes choose
    numpy, the scale-safe side."""
    return (
        "join"
        if nc is not None and nq is not None and nc * nq < 200_000
        else "numpy"
    )


def _resolve_auto_engine(corpus, queries, id_col: str) -> str:
    """Resolve engine="auto" from the free row-count probes (parquet footer
    / memoized count) — the ONE place the cost model reads its inputs, so
    cosine_topk/pq_topk/ivfpq_topk cannot drift apart."""
    from .dedup import _corpus_rowcount

    return _auto_engine(
        _corpus_rowcount(corpus.select(id_col)),
        _corpus_rowcount(queries.select(id_col)),
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    engine: str = "auto",
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k neighbors per query (excluding self-matches by id).

    Deterministic ranking: (rounded cosine desc, neighbor id asc).

    ``engine="numpy"`` scores each corpus Arrow batch against the
    collected query matrix inside ``mapInPandas`` with per-dimension
    fold accumulation — bit-identical to the JVM fold at ~10-50x the
    throughput (the unrolled JVM dot evaluates per PAIR on the
    interpreted expression path, ~3-15 us/pair measured; invisible with
    10 queries, dominant at self-kNN pair counts). ``engine="join"``
    keeps the broadcast-join formulation — an independent implementation
    retained as the cross-validation reference (pytest pins the two
    engines' outputs equal). ``engine="auto"`` (default) is cost-based,
    not semantic — identical output either way: below ~200k estimated
    pairs the Python-worker roundtrip costs more than the interpreted
    join evaluates (measured crossover: 20k pairs join 0.29s vs numpy
    0.63s; 200k pairs join ~1.5s vs numpy ~0.9s), so small workloads
    keep the join; the pair estimate uses the free row-count probe
    (parquet footer / memoized count) and unknown sizes choose numpy
    (the scale-safe side)."""
    if engine != "join" and not (
        _integral_ids(corpus, id_col) and _integral_ids(queries, id_col)
    ):
        engine = "join"  # numpy ships ids as int64; join is type-agnostic
    if engine == "auto":
        engine = _resolve_auto_engine(corpus, queries, id_col)
    if engine == "numpy":
        return _matmul_topk(corpus, queries, k, emb_col, id_col)
    if dim is None:
        dim = _dim_of(corpus, emb_col)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(emb_col).alias("q_emb"),
        norm(emb_col, dim).alias("q_norm"),
    )
    corpus = _spread(corpus)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(emb_col).alias("c_emb"),
        norm(emb_col, dim).alias("c_norm"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            F.round(safe_div(dot("q_emb", "c_emb", dim),
                             F.col("q_norm") * F.col("c_norm")), 6),
        )
    )
    return _two_phase_topk(scored, k)


def range_search(
    corpus: DataFrame,
    queries: DataFrame,
    threshold: float = 0.5,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Radius search: ALL corpus neighbors with cosine >= ``threshold`` per
    query (excluding self-matches by id) — the fixed-similarity companion
    to ``cosine_topk``'s fixed-count contract (dedup sweeps and recall
    audits want "everything above t", not "the best k").

    100 TB shape: ONE streamed pass over the corpus against the broadcast
    query set — the corpus never shuffles at all (no rank, no aggregation;
    the threshold filter runs inside the scan's codegen stage), so output
    cost is exactly |matches|. Norms are precomputed per side and the dot
    product unrolls into codegen'd arithmetic."""
    dim = _dim_of(corpus, emb_col)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(emb_col).alias("q_emb"),
        norm(emb_col, dim).alias("q_norm"),
    )
    c = _spread(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(emb_col).alias("c_emb"),
        norm(emb_col, dim).alias("c_norm"),
    )
    return (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            F.round(safe_div(dot("q_emb", "c_emb", dim),
                             F.col("q_norm") * F.col("c_norm")), 6),
        )
        .filter(F.col("cos") >= threshold)
        .select("query_id", "neighbor_id", "cos")
    )


def assign_centroids(
    corpus: DataFrame,
    centroids: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    dim=None,
) -> DataFrame:
    """Assign each vector to its nearest centroid (broadcast centroids).

    Norms are computed ONCE per side before the pair join. The nearest
    centroid is picked with a map-side-combining ``max_by`` hash aggregate
    rather than a per-vector Window rank: the partial aggregate collapses
    each vector's k candidate rows to ONE before the exchange, so the
    shuffle moves one row per vector (not k rows with the embedding
    payload) and there is no sort at all. Ties break to the smallest
    centroid_id via the (cos, -centroid_id) struct order — identical to
    the previous rank order.

    (A zero-shuffle literal-coefficient ``greatest``-over-structs variant
    was measured but the k*dim-term expression exceeds Janino's 64 KB
    method limit inside whole-stage codegen after a columnar scan, forcing
    a whole-stage interpreted fallback that is slower than this shuffle.)"""
    c = centroids.select(
        F.col(id_col).alias("centroid_id"), F.col(emb_col).alias("cent_emb"),
        norm(emb_col, dim).alias("cent_norm"),
    )
    corpus = corpus.withColumn("__nrm", norm(emb_col, dim))
    scored = corpus.join(F.broadcast(c)).withColumn(
        "cos_c",
        F.round(safe_div(dot(emb_col, "cent_emb", dim),
                         F.col("__nrm") * F.col("cent_norm")), 6),
    )
    return scored.groupBy(id_col).agg(
        F.first(emb_col).alias(emb_col),
        F.first("__nrm").alias("__nrm"),
        F.max_by(
            "centroid_id",
            F.struct(F.col("cos_c").alias("c"), (-F.col("centroid_id")).alias("nid")),
        ).alias("centroid_id"),
    ).select(F.col(id_col), F.col(emb_col), F.col("__nrm"), F.col("centroid_id"))


def kmeans_centroids(
    corpus: DataFrame,
    n_centroids: int = 8,
    n_iter: int = 5,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    dim=None,
) -> DataFrame:
    """Spherical k-means (Lloyd) centroids over an embedding column.

    Deterministic: initialized from the first ``n_centroids`` vectors by id
    (no RNG), assignment ties broken by centroid id. Each iteration is one
    broadcast-join assignment pass over the corpus plus one per-dimension
    ``avg`` aggregation; only the k x dim centroid table (tiny) round-trips
    through the driver — the corpus never does, so this scales to any corpus
    size. Clusters that lose all members are dropped (k may shrink).

    Returns (centroid_id, cent_emb array<float>)."""
    if dim is None:
        dim = _dim_of(corpus, emb_col)
    spark = corpus.sparkSession
    cents = corpus.orderBy(id_col).limit(n_centroids).select(
        F.col(id_col).alias("centroid_id"), F.col(emb_col).alias("cent_emb")
    )
    base = corpus.select(id_col, emb_col)
    for _ in range(n_iter):
        cent_as_corpus = cents.select(
            F.col("centroid_id").alias(id_col), F.col("cent_emb").alias(emb_col)
        )
        assigned = assign_centroids(base, cent_as_corpus, emb_col, id_col, dim)
        means = assigned.groupBy("centroid_id").agg(
            *[F.avg(F.col(emb_col)[i]).alias(f"m{i}") for i in range(dim)]
        )
        rows = means.collect()  # k rows — the broadcast-model pattern
        data = [
            (int(r["centroid_id"]), [float(r[f"m{i}"]) for i in range(dim)])
            for r in rows
        ]
        cents = spark.createDataFrame(
            data, "centroid_id bigint, cent_emb array<float>"
        )
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_centroids: int = 8,
    n_probe: int = 2,
    k: int = 5,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: str = "seed",
    kmeans_iters: int = 5,
    engine: str = "numpy",
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: probe only the n_probe closest centroid buckets.

    ``centroids="seed"`` (default): the first ``n_centroids`` corpus vectors
    by id — deterministic without iteration, kept as the oracle-checkable
    mode. ``centroids="kmeans"``: spherical k-means via ``kmeans_centroids``
    — the production-recall path (see tests/test_llm_ops.py recall gate).

    ``engine="numpy"`` (default) scores each bucket's members against that
    bucket's probing queries in numpy (see ``_bucketed_matmul_topk`` — the
    JVM per-pair expression path costs ~3-15 us/pair); ``engine="join"``
    keeps the broadcast-join formulation as the cross-validation
    reference (pytest pins the two engines' outputs equal)."""
    if dim is None:
        dim = _dim_of(corpus, emb_col)
    if centroids == "kmeans":
        centroids = kmeans_centroids(
            corpus, n_centroids, kmeans_iters, emb_col, id_col, dim
        ).select(F.col("centroid_id").alias(id_col), F.col("cent_emb").alias(emb_col))
    else:
        centroids = corpus.orderBy(id_col).limit(n_centroids)
    # centroid assignment/probing touch few pairs (n x n_centroids) — the
    # interpreted fold avoids paying codegen compile for 3 more big exprs;
    # the unrolled dot goes to the final scoring stage (the big fan-out)
    assigned = assign_centroids(corpus, centroids, emb_col, id_col, None)
    # probe lists per query
    c = centroids.select(F.col(id_col).alias("centroid_id"), F.col(emb_col).alias("cent_emb"))
    c = c.withColumn("cent_norm", norm("cent_emb"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(emb_col).alias("q_emb"),
                       norm(emb_col, dim).alias("q_norm"))
    qprobe = q.join(F.broadcast(c)).withColumn(
        "cos_c",
        F.round(safe_div(dot("q_emb", "cent_emb"),
                         F.col("q_norm") * F.col("cent_norm")), 6),
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("cos_c").desc(), F.col("centroid_id").asc())
    probes = (
        qprobe.withColumn("__r", F.row_number().over(wq))
        .filter(F.col("__r") <= n_probe)
        .select("query_id", "q_emb", "q_norm", "centroid_id")
    )
    if engine == "numpy" and not (
        _integral_ids(corpus, id_col) and _integral_ids(queries, id_col)
    ):
        engine = "join"  # numpy ships ids as int64; join is type-agnostic
    if engine == "numpy":
        return _bucketed_matmul_topk(assigned, probes, k, emb_col, id_col)
    scored = (
        assigned.join(F.broadcast(probes), "centroid_id")
        .filter(F.col("query_id") != F.col(id_col))
        .withColumn("cos", F.round(safe_div(dot("q_emb", emb_col, dim),
                                            F.col("q_norm") * F.col("__nrm")), 6))
        .withColumn("neighbor_id", F.col(id_col))
    )
    return _two_phase_topk(scored, k)


def _merge_rank(local: DataFrame, k: int) -> DataFrame:
    """Shared phase-2 merge for the numpy scorers: rank the per-partition
    local top-k survivors with the SAME (cos desc, neighbor asc) total
    order phase 1 truncated with — one tiny exchange of <= k * n_partitions
    rows per query. Kept as ONE helper so the three engines cannot drift
    out of the engine-parity contract."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def _integral_ids(df: DataFrame, col: str) -> bool:
    """True when ``col`` is an integral type an int64 can hold — the numpy
    engines ship ids through Arrow as int64 (and widen output ids to
    bigint); any other id type falls back to the type-agnostic join
    engines."""
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    return isinstance(
        df.schema[col].dataType, (ByteType, ShortType, IntegerType, LongType)
    )


def _np_round6(arr):
    """Round to 6 decimals with Spark's ``F.round`` semantics. Spark rounds
    the double's SHORTEST-DECIMAL representation HALF_UP (BigDecimal.valueOf
    = Double.toString), while ``np.round`` rounds the binary-scaled value
    half-to-even — they disagree exactly on values whose shortest repr ends
    in a 7th-decimal 5 (e.g. 0.5000005: Spark -> 0.500001, numpy -> 0.5).
    Vectorized fast path everywhere; only cells within ~1e-8 of the scaled
    halfway point (measure-zero in practice) take the exact decimal path."""
    import numpy as np

    y = np.round(arr, 6)
    with np.errstate(invalid="ignore"):
        scaled = arr * 1e6
        frac = np.abs(scaled - np.floor(scaled) - 0.5)
        mask = frac < 1e-8
    if mask.any():
        from decimal import ROUND_HALF_UP, Decimal

        q6 = Decimal("1e-6")
        y[mask] = [
            float(Decimal(repr(float(v))).quantize(q6, ROUND_HALF_UP))
            for v in arr[mask]
        ]
    return y


def _np_units12(arr):
    """Exact 1e-12-unit integers of HALF_UP round-12, replicating Spark's
    ``sum(round(v,12)::decimal(38,12))`` input units (and the DuckDB
    oracle's HUGEINT replay) — the ``_np_round6`` pattern at scale 12:
    ``rint(v*1e12)`` is the correct nearest integer whenever v is not
    within float error of a halfway point (ulp at 1e12 scale is ~2e-4
    units); the rare near-halfway cells take the exact decimal path.
    Valid for |v| < ~1e6 (int64 units); embedding magnitudes are O(1)."""
    import numpy as np

    with np.errstate(invalid="ignore"):
        scaled = arr * 1e12
        units = np.rint(scaled)
        frac = np.abs(scaled - np.floor(scaled) - 0.5)
        mask = frac < 1e-3
    if mask.any():
        from decimal import ROUND_HALF_UP, Decimal

        q12 = Decimal("1e-12")
        units[mask] = [
            float(
                Decimal(repr(float(v))).quantize(q12, ROUND_HALF_UP).scaleb(12)
            )
            for v in arr[mask]
        ]
    return units.astype(np.int64)


def _np_chunked_topk(qids, Q, qn, cids_all, C_all, cn_all, k):
    """Shared numpy block scorer for the three bulk ANN paths (flat,
    bucketed, cogrouped): yields per-chunk local top-k DataFrames.

    Determinism contract (the reason this is hand-rolled rather than one
    ``Q @ C.T``): the cosine numerator accumulates DIMENSION-BY-DIMENSION
    in float64 — the exact IEEE operation sequence of the codegen'd fold
    ``0.0 + x0*y0 + x1*y1 + ...`` — so scores round-trip bit-identically
    against the JVM join formulation and the DuckDB oracle (BLAS
    pairwise/SIMD summation would differ in the last ulp and could flip a
    6-decimal rounding). Chunking bounds the score matrix at ~32M float64
    (~256 MB); ties rank (cos desc, neighbor asc) via a stable argsort
    over neighbor-ascending inputs; NaN (zero-norm or self) sorts last
    and is dropped on emit."""
    import numpy as np
    import pandas as pd

    nq, dim = Q.shape
    chunk = max(1, 32_000_000 // max(nq, 1))
    for s in range(0, len(cids_all), chunk):
        cids = cids_all[s:s + chunk]
        C = C_all[s:s + chunk]
        cn = cn_all[s:s + chunk]
        nc = len(cids)
        if nc == 0:
            continue
        acc = np.zeros((nq, nc))
        tmp = np.empty((nq, nc))
        for j in range(dim):
            np.multiply(Q[:, j][:, None], C[:, j][None, :], out=tmp)
            acc += tmp
        den = qn[:, None] * cn[None, :]
        with np.errstate(invalid="ignore", divide="ignore"):
            cos = np.where(den != 0, acc / den, np.nan)
        cos = _np_round6(cos)
        cos[qids[:, None] == cids[None, :]] = np.nan  # self-matches
        idx = np.argsort(-cos, axis=1, kind="stable")[:, :k]
        top = np.take_along_axis(cos, idx, axis=1)
        out = pd.DataFrame({
            "query_id": np.repeat(qids, idx.shape[1]),
            "neighbor_id": cids[idx].ravel(),
            "cos": top.ravel(),
        })
        out = out[~out["cos"].isna()]
        if len(out):
            yield out


def _np_fold_norms(M):
    """Per-row L2 norms with the same per-dimension fold as ``norm()``."""
    import numpy as np

    acc = np.zeros(M.shape[0])
    for j in range(M.shape[1]):
        acc += M[:, j] * M[:, j]
    return np.sqrt(acc)


def _np_emb_matrix(values, dim):
    """float32 -> float64 embedding matrix from an Arrow/pandas column."""
    import numpy as np

    if not len(values):
        return np.zeros((0, dim))
    return np.asarray(
        [np.asarray(v, dtype=np.float32) for v in values], dtype=np.float32
    ).astype(np.float64)


def _matmul_topk(
    corpus: DataFrame, queries: DataFrame, k: int, emb_col: str, id_col: str
) -> DataFrame:
    """Bulk numpy top-k scorer behind ``cosine_topk`` / exact
    ``knn_graph`` (see their docstrings for the design rationale). The
    query side is collected to the driver (the broadcast-model contract —
    identical ceiling to the broadcast join it replaces, just explicit).
    Determinism contract: the cosine is accumulated dimension-by-dimension
    in float64 from the float32 inputs — the exact IEEE operation sequence
    of the codegen'd fold ``0.0 + x0*y0 + x1*y1 + ...`` — and rounded to 6
    decimals before ranking, so scores and rankings are bit-identical to
    the JVM join formulation and the DuckDB oracle."""
    import numpy as np

    spark = corpus.sparkSession
    schema = "query_id bigint, neighbor_id bigint, cos double"
    rows = queries.select(id_col, emb_col).collect()  # broadcast-model
    if not rows:
        # empty query set: a (0,)-shaped Q would crash the fold on the
        # executors; the join engine returns an empty frame here too
        return spark.createDataFrame([], schema + ", rank int")
    qids = np.asarray([r[0] for r in rows], dtype=np.int64)
    Q = np.asarray([r[1] for r in rows], dtype=np.float32).astype(np.float64)
    bq = spark.sparkContext.broadcast((qids, Q))

    def score(batches):
        import numpy as np

        qids, Q = bq.value
        qn = _np_fold_norms(Q)
        for pdf in batches:
            # neighbor-id ascending INSIDE the batch so the stable sort in
            # the block scorer breaks ties exactly like (cos desc,
            # neighbor asc)
            pdf = pdf.sort_values(id_col, ignore_index=True)
            cids_all = pdf[id_col].to_numpy(dtype=np.int64)
            C_all = _np_emb_matrix(pdf[emb_col], Q.shape[1])
            cn_all = _np_fold_norms(C_all)
            yield from _np_chunked_topk(qids, Q, qn, cids_all, C_all, cn_all, k)

    local = _spread(corpus.select(id_col, emb_col)).mapInPandas(score, schema)
    return _merge_rank(local, k)


def _bucketed_matmul_topk(
    assigned: DataFrame, probes: DataFrame, k: int, emb_col: str, id_col: str
) -> DataFrame:
    """Bulk numpy scorer for the IVF shapes: corpus rows meet only the
    queries probing their bucket. The probe list (query embedding + norm
    per probed bucket) is collected to the driver and broadcast as
    per-bucket matrices — the same small-query-side contract as the
    broadcast join it replaces; the corpus streams through one
    ``mapInPandas`` pass grouped by bucket id per Arrow batch. Same
    bit-parity determinism contract as ``_matmul_topk``."""
    import numpy as np

    spark = assigned.sparkSession
    prows = probes.select("query_id", "q_emb", "q_norm", "centroid_id").collect()
    buckets: dict = {}
    for r in sorted(prows, key=lambda r: (r[3], r[0])):
        buckets.setdefault(r[3], []).append(r)
    bmats = {
        cid: (
            np.asarray([r[0] for r in rs], dtype=np.int64),
            np.asarray([r[1] for r in rs], dtype=np.float32).astype(np.float64),
            np.asarray([r[2] for r in rs], dtype=np.float64),
        )
        for cid, rs in buckets.items()
    }
    bb = spark.sparkContext.broadcast(bmats)
    schema = "query_id bigint, neighbor_id bigint, cos double"

    def score(batches):
        import numpy as np

        bmats = bb.value
        for pdf in batches:
            pdf = pdf.sort_values(id_col, ignore_index=True)
            for cid, sub in pdf.groupby("centroid_id", sort=False):
                got = bmats.get(cid)
                if got is None or not len(sub):
                    continue
                qids, Q, qn = got
                cids_all = sub[id_col].to_numpy(dtype=np.int64)
                C_all = _np_emb_matrix(sub[emb_col], Q.shape[1])
                cn_all = sub["__nrm"].to_numpy(dtype=np.float64)
                yield from _np_chunked_topk(
                    qids, Q, qn, cids_all, C_all, cn_all, k
                )

    local = assigned.select(id_col, emb_col, "__nrm", "centroid_id").mapInPandas(
        score, schema
    )
    return _merge_rank(local, k)


def _cogroup_bucket_topk(
    probes: DataFrame, assigned: DataFrame, k: int, emb_col: str, id_col: str
) -> DataFrame:
    """Fully-distributed bucket scorer for self-kNN IVF: NOTHING touches
    the driver — probes (query side) and assigned (member side) cogroup
    on the bucket id (one exchange each), and each bucket's probers x
    members block is scored in numpy inside ``applyInPandas``. This is
    the shape for query sets too large to collect (self-kNN: the query
    set IS the corpus). Same bit-parity determinism contract as
    ``_matmul_topk``."""
    import pandas as pd

    schema = "query_id bigint, neighbor_id bigint, cos double"

    def score(left, right):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame({"query_id": [], "neighbor_id": [], "cos": []})
        if not len(left) or not len(right):
            return empty
        left = left.sort_values("query_id", ignore_index=True)
        right = right.sort_values(id_col, ignore_index=True)
        qids = left["query_id"].to_numpy(dtype=np.int64)
        Q = _np_emb_matrix(left["q_emb"], 0)
        qn = left["q_norm"].to_numpy(dtype=np.float64)
        cids_all = right[id_col].to_numpy(dtype=np.int64)
        C_all = _np_emb_matrix(right[emb_col], Q.shape[1])
        cn_all = right["__nrm"].to_numpy(dtype=np.float64)
        outs = list(_np_chunked_topk(qids, Q, qn, cids_all, C_all, cn_all, k))
        return pd.concat(outs, ignore_index=True) if outs else empty

    local = (
        probes.groupby("centroid_id")
        .cogroup(assigned.select(id_col, emb_col, "__nrm", "centroid_id")
                 .groupby("centroid_id"))
        .applyInPandas(score, schema)
    )
    return _merge_rank(local, k)


def knn_graph(
    corpus: DataFrame,
    k: int = 5,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int | None = None,
    n_probe: int = 1,
) -> DataFrame:
    """k-NN graph: every vector's ``k`` nearest corpus neighbors by cosine
    (excluding self) — the building block graph for semantic-dedup sweeps,
    graph clustering, and embedding-space diagnostics. Returns
    (query_id, neighbor_id, cos, rank), deterministic ranking
    (rounded cosine desc, neighbor id asc).

    ``n_centroids=None`` — exact: every (query, corpus) pair is scored.
    Expressing the N x N pair stream as a join evaluates the unrolled dot
    per pair on the JVM expression path (~3-15 us/pair measured — column
    extraction per element, no vectorization), which at self-kNN pair
    counts dominates everything. Instead the corpus streams through ONE
    Arrow-batched ``mapInPandas`` pass that scores each batch against the
    full query matrix (held as a broadcast variable; collecting the query
    side to the driver is the same broadcast-model ceiling the join
    formulation had, just explicit) with numpy per-DIMENSION accumulation
    — bit-identical to the codegen'd left fold and the DuckDB oracle's
    ``list_reduce``, at BLAS-class throughput (measured ~50x over the
    join: 4M pairs 31.7s -> 0.7s). Local per-batch top-k uses the same
    (cos desc, neighbor asc) total order as the final merge Window, so
    the result is bit-identical to the single-phase rank. The corpus
    never shuffles; only <= k * n_queries rows per partition do.

    ``n_centroids=N`` — IVF approximation, the 100 TB shape: vectors meet
    only inside shared centroid buckets. Unlike ``ivf_topk`` (few
    queries, driver-held probe matrices), self-kNN's "query set" IS the
    corpus, so nothing touches the driver: probers and members COGROUP on
    the bucket id (one exchange per side) and each bucket's block is
    scored in numpy inside ``applyInPandas`` (``_cogroup_bucket_topk``).
    Each vector probes its ``n_probe`` nearest buckets via a
    map-side-combined ``collect_list`` top-N — one row per (vector,
    probe) enters the cogroup, no Window sort over embedding payloads."""
    if not _integral_ids(corpus, id_col):
        # the numpy scorers ship ids as int64; exact mode has a
        # type-agnostic join fallback, the cogroup IVF mode does not
        if n_centroids is None:
            return cosine_topk(corpus, corpus, k, emb_col, id_col,
                               engine="join")
        raise ValueError(
            f"knn_graph IVF mode requires an integral {id_col!r} column "
            "(ids travel through Arrow as int64); map non-integral ids to "
            "a surrogate key first"
        )
    dim = _dim_of(corpus, emb_col)
    if n_centroids is None:
        return _matmul_topk(corpus, corpus, k, emb_col, id_col)
    centroids = corpus.orderBy(id_col).limit(n_centroids)
    assigned = assign_centroids(corpus, centroids, emb_col, id_col, None)
    c = centroids.select(
        F.col(id_col).alias("centroid_id"), F.col(emb_col).alias("cent_emb")
    ).withColumn("cent_norm", norm("cent_emb"))
    q = corpus.select(
        F.col(id_col).alias("query_id"), F.col(emb_col).alias("q_emb"),
        norm(emb_col, dim).alias("q_norm"),
    )
    qprobe = q.join(F.broadcast(c)).withColumn(
        "cos_c",
        F.round(safe_div(dot("q_emb", "cent_emb"),
                         F.col("q_norm") * F.col("cent_norm")), 6),
    )
    # top-n_probe buckets per vector as ONE hash aggregate: the struct sort
    # (-cos, centroid_id) ascending == (cos desc, centroid_id asc), the
    # ivf_topk probe order. Partial aggregation collapses the n_centroids
    # candidate rows per vector map-side, so the exchange moves one row per
    # vector — no Window sort with the embedding payload attached.
    probes = (
        qprobe.groupBy("query_id")
        .agg(
            F.first("q_emb").alias("q_emb"),
            F.first("q_norm").alias("q_norm"),
            F.slice(
                F.sort_array(F.collect_list(F.struct(
                    # NULL cos_c (zero-norm centroid) must sort LAST like
                    # ivf_topk's cos_c.desc() (nulls-last) probe order —
                    # a bare negation would sort the NULL struct field
                    # FIRST and hand every probe slot to a degenerate
                    # centroid
                    F.coalesce(-F.col("cos_c"), F.lit(float("inf"))).alias("nc"),
                    F.col("centroid_id").alias("cid"),
                ))),
                1, n_probe,
            ).alias("__top"),
        )
        .select(
            "query_id", "q_emb", "q_norm",
            F.explode(F.col("__top.cid")).alias("centroid_id"),
        )
    )
    return _cogroup_bucket_topk(probes, assigned, k, emb_col, id_col)


# ----------------------------------------------------- product quantization
def _pq_codebook(corpus: DataFrame, n_codes: int, emb_col: str, id_col: str):
    """Deterministic seed codebook: the first ``n_codes`` corpus vectors by
    id (the same iteration-free seeding ``ivf_topk`` uses). Only the
    n_codes x dim table round-trips through the driver — the broadcast-model
    pattern (``kmeans_centroids`` has the rationale)."""
    rows = corpus.orderBy(id_col).limit(n_codes).select(emb_col).collect()
    cb = [[float(v) for v in r[emb_col]] for r in rows]
    if not cb:
        raise ValueError("pq: empty corpus — no codebook vectors")
    return cb


def _pq_assign_partials(X, U, cb64m, m: int, sub: int) -> list:
    """One Lloyd assignment pass over a row block: per (subspace, code)
    member counts + exact int64 1e-12-unit sums. Row-independent — the
    same float64 dimension-order accumulation per (row, code) cell no
    matter how rows are blocked, so per-Arrow-batch and whole-sample
    invocations produce identical partials. Shared verbatim by the
    ``jobs`` and ``fused`` training engines (bit-identity by construction).

    Integer sums are chunked at 8,192 rows and merged as unbounded python
    ints — exactly the driver-reduce arithmetic of the ``jobs`` engine.
    int64 safety: a chunk sum is <= 8,192 * |v| * 1e12 units, so the safe
    bound is |v| < ~1e3 per coordinate (int64 max ~9.2e18) — ample for
    O(1)-normalized embeddings, and the same bound the pre-chunking
    whole-batch numpy sum carried."""
    import numpy as np

    n = X.shape[0]
    n_cb = cb64m.shape[0]
    rows = []
    for j in range(m):
        acc = np.zeros((n, n_cb))
        for d in range(sub):
            i = j * sub + d
            t = X[:, i:i + 1] - cb64m[:, i][None, :]
            acc += t * t
        # argmin takes the FIRST minimum == smaller-code-id ties
        best_c = np.argmin(_np_round6(acc), axis=1)
        Uj = U[:, j * sub:(j + 1) * sub]
        for c in np.unique(best_c):
            sel = best_c == c
            Us = Uj[sel]
            sums = [0] * sub
            for s in range(0, Us.shape[0], 8_192):
                part = Us[s:s + 8_192].sum(axis=0)
                for d in range(sub):
                    sums[d] += int(part[d])
            rows.append([j, int(c), int(sel.sum())] + sums)
    return rows


def _pq_reduce_means(partials, cb: list, m: int, sub: int) -> list:
    """Merge assignment partials (python-int exact) and emit the next
    codebook under the HALF_UP integer-unit mean contract; codes that lose
    every member keep their previous centroid. Shared by both engines."""
    from decimal import Decimal

    agg: dict = {}
    for r in partials:
        key = (r[0], r[1])
        cur = agg.get(key)
        if cur is None:
            agg[key] = [int(v) for v in r[2:]]
        else:
            for d in range(sub + 1):
                cur[d] += int(r[d + 2])
    new_cb = [list(c) for c in cb]  # empty codes keep previous centroid
    for (j, c), vals in agg.items():
        cnt = vals[0]
        for d in range(sub):
            s_units = vals[d + 1]
            sign = -1 if s_units < 0 else 1
            mean_units = sign * ((2 * abs(s_units) + cnt) // (2 * cnt))
            new_cb[c][j * sub + d] = float(
                Decimal(mean_units).scaleb(-12)
            )
    return new_cb


def pq_train_codebook(
    corpus: DataFrame,
    m: int = 8,
    n_codes: int = 256,
    n_iter: int = 3,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    train_cap: int = 65_536,
    engine: str = "fused",
    dim: int | None = None,
) -> list:
    """Per-subspace Lloyd k-means codebook training for product
    quantization (round-6 VERDICT ask #4: the seeded 16-entry codebooks
    cap IVF-PQ recall — the codebook, not the composition, was the
    limiter; real PQ trains >=256 entries per subspace, Jegou et al. 2011).

    Returns the stacked-full-vector format ``pq_encode`` consumes: entry
    ``c``'s slice ``[j*sub:(j+1)*sub]`` is subspace ``j``'s centroid ``c``
    (the m subspace codebooks are independent; stacking composes them
    losslessly because encode argmins each subspace on its own slice).

    DETERMINISM CONTRACT (the textrank pattern, partition-independent and
    engine-replayable):
      - training sample: first ``train_cap`` vectors by id
        (TakeOrderedAndProject — a bounded heap scan, never a global sort;
        FAISS trains on a bounded sample for the same reason);
      - init: the first ``n_codes`` sample vectors by id (no RNG);
      - assignment: the SAME round-6 squared-L2 argmin with first-minimum
        code-id tiebreak that ``pq_encode`` uses (numpy fold, bit-identical
        to the JVM expression fold — pytest pins the engines equal);
      - update: per-(subspace, code, dimension) means via exact
        DECIMAL(38,12) sums of round-12 inputs (order-independent — a
        float sum would drift with partitioning); the mean is HALF_UP to
        12 decimals computed in EXACT integer units —
        sign * ((2*|S| + n) // (2*n)) on the 1e-12-scaled sum — so a
        SQL oracle replays it with HUGEINT arithmetic, no float division
        (the mean's units fit a double exactly, so the final
        units / 1e12 is ONE correctly-rounded IEEE op in both engines);
      - a code that loses every member keeps its previous centroid (k
        never shrinks — PQ needs the full code space);
      - fixed ``n_iter`` (no data-dependent stopping).

    Scale shape (round 8, VERDICT r7 ask #6): each iteration is ONE fused
    Arrow-batched pass over the (bounded) sample that assigns AND emits
    per-batch partial sums — <= partitions * m * n_codes skinny rows of
    exact int64 1e-12 units (``_np_units12``) — reduced to the codebook in
    the driver with unbounded python ints. The previous shape (assignment
    pass emitting n*m rows + a Spark decimal aggregate) paid n*dim
    BigDecimal round/cast/add ops per iteration (~4M at train_cap) in the
    unvectorized decimal aggregate; the fused pass is pure numpy and cut
    the kmeans 100x floor 33.2s -> ~11s. Partial sums in exact integer
    units are associative, so the result is bit-identical to the old
    decimal aggregate (pinned by test_llm_ops' oracle gates at both SFs).
    The full corpus is only read by the later encode pass.

    Engines (round 10, guide §1.2 — the fixed-latency cut): the bounded
    sample is a TakeOrdered result, i.e. ONE partition no matter the corpus
    size, so the per-iteration Spark jobs were already serial single-task
    passes paying ~0.15s of driver round-trip each (init collect +
    n_iter mapInPandas collects, cProfile). ``engine="fused"`` (default)
    runs init + every Lloyd iteration inside ONE mapInPandas task over
    that partition and emits the final codebook (n_codes skinny rows, one
    job total); ``engine="jobs"`` keeps the per-iteration-job loop as the
    cross-validation reference (pytest pins the engines bit-equal). Both
    engines share `_pq_assign_partials` / `_pq_reduce_means` verbatim, so
    the arithmetic is identical by construction."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    if engine not in ("fused", "jobs"):
        raise ValueError(f"pq: unknown training engine {engine!r} "
                         "(expected 'fused' or 'jobs')")
    if dim is None:
        dim = _dim_of(corpus, emb_col)
    if dim is None:
        raise ValueError("pq: empty corpus — no codebook vectors")
    if dim % m:
        raise ValueError(f"pq: dim {dim} not divisible by m={m}")
    sub = dim // m
    sample = (
        corpus.select(id_col, emb_col)
        .orderBy(id_col)
        .limit(train_cap)
    )
    if engine == "fused":
        cb_schema = T.StructType(
            [
                T.StructField("c", T.IntegerType()),
                T.StructField("v", T.ArrayType(T.DoubleType())),
            ]
        )

        def train_all(batches):
            embs = []
            ids = []
            for pdf in batches:
                if len(pdf):
                    embs.extend(list(pdf[emb_col]))
                    ids.extend(pdf[id_col].tolist())
            if not embs:
                return
            order = np.argsort(np.asarray(ids), kind="stable")
            X = _np_emb_matrix([embs[i] for i in order], dim)
            # init: first n_codes sample vectors by id, from the RAW
            # collected values — matching the jobs engine's exact-double
            # collect. Building from X would narrow array<double> inputs
            # through float32, and a code that stays empty through the
            # last iteration emits its init centroid verbatim.
            cb = [
                [float(v) for v in embs[order[i]]]
                for i in range(min(n_codes, X.shape[0]))
            ]
            U = _np_units12(X)  # exact round-12 units, int64
            for _ in range(n_iter):
                cb64m = np.asarray(
                    [np.asarray(c, dtype=np.float64) for c in cb]
                )
                partials = _pq_assign_partials(X, U, cb64m, m, sub)
                cb = _pq_reduce_means(partials, cb, m, sub)
            yield pd.DataFrame(
                {"c": list(range(len(cb))), "v": cb}
            )

        rows = sample.coalesce(1).mapInPandas(train_all, cb_schema).collect()
        if not rows:
            raise ValueError("pq: empty corpus — no codebook vectors")
        return [list(r["v"]) for r in sorted(rows, key=lambda r: r["c"])]

    sample = sample.localCheckpoint(eager=False)
    cb = [
        [float(v) for v in r[emb_col]]
        for r in sample.orderBy(id_col).limit(n_codes).select(emb_col).collect()
    ]
    if not cb:
        raise ValueError("pq: empty corpus — no codebook vectors")
    part_schema = T.StructType(
        [
            T.StructField("j", T.IntegerType()),
            T.StructField("c", T.IntegerType()),
            T.StructField("n", T.LongType()),
        ]
        + [T.StructField(f"s{d}", T.LongType()) for d in range(sub)]
    )
    for _ in range(n_iter):
        cb64m = np.asarray([np.asarray(c, dtype=np.float64) for c in cb])

        def assign_stats(batches, cb64m=cb64m):
            for pdf in batches:
                X = _np_emb_matrix(pdf[emb_col], dim)
                if not X.shape[0]:
                    continue
                U = _np_units12(X)  # exact round-12 units, int64
                rows = _pq_assign_partials(X, U, cb64m, m, sub)
                if rows:
                    yield pd.DataFrame(
                        rows, columns=[f.name for f in part_schema.fields]
                    )

        parts = sample.mapInPandas(assign_stats, part_schema).collect()
        # driver reduce over <= partitions * m * n_codes partial rows with
        # unbounded python ints (no float division anywhere)
        cb = _pq_reduce_means(
            [[r["j"], r["c"], r["n"]] + [r[f"s{d}"] for d in range(sub)]
             for r in parts],
            cb, m, sub,
        )
    return cb


def _pq_sqdist_sql(emb_col: str, cent: list, j: int, sub: int) -> str:
    """round-6 squared L2 between subvector j of ``emb_col`` and a literal
    centroid subvector, as a left-fold SQL string (one server-side parse,
    same grouping as the DuckDB oracle's list_reduce)."""
    terms = []
    for d in range(sub):
        i = j * sub + d
        t = f"(CAST({emb_col}[{i}] AS DOUBLE) - {float(cent[i])!r}D)"
        terms.append(f"{t} * {t}")
    return f"round(0.0D + {' + '.join(terms)}, 6)"


def pq_encode(
    corpus: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    codebook: list | None = None,
    engine: str = "auto",
    keep: tuple | list | None = None,
    dim: int | None = None,
) -> DataFrame:
    """Product-quantize an embedding column: split each vector into ``m``
    subvectors, snap each to its nearest codebook entry (round-6 squared-L2
    argmin, code-id tiebreak), and return (id, codes array<int>, recon
    array<float>) where ``recon`` is the quantized reconstruction.

    ``keep``: extra input columns passed through the encode pass verbatim
    (round 8). Encode stays a zero-shuffle map — carrying a column through
    it is FREE, while re-attaching the same column afterwards costs a
    corpus-scale shuffle join on ``id_col``; the residual IVF-PQ path uses
    this to stay join-free end-to-end.

    This is the memory story for ANN at 100 TB: ``codes`` is m small ints
    (m bytes with n_codes<=256) versus dim floats — a 32x compression at
    m=8/dim=64 — only codes need to be STORED; reconstruction is a
    codebook gather. Encoding is one zero-shuffle pass either way; the
    codebook is deterministic seed vectors, so a DuckDB oracle replays
    codes and reconstruction exactly.

    ``engine="numpy"`` (default for integral ids) computes the argmin in
    one Arrow-batched mapInPandas pass with per-dimension fold accumulation
    — bit-identical to the JVM fold (the literal-expression form parses
    and evaluates interpreted at ~100 KB of SQL; measured 12s plan build +
    7s eval vs ~1s total for numpy at sf0.01). ``engine="expr"`` keeps the
    pure-Catalyst literal projection as the cross-validation reference
    (pytest pins the two engines' outputs equal)."""
    if dim is None:
        dim = _dim_of(corpus, emb_col)
    if dim is None:
        raise ValueError("pq: empty corpus — no codebook vectors")
    if dim % m:
        raise ValueError(f"pq: dim {dim} not divisible by m={m}")
    sub = dim // m
    cb = codebook if codebook is not None else _pq_codebook(
        corpus, n_codes, emb_col, id_col
    )
    kept = [c for c in (keep or ()) if c != id_col]
    bad = [
        c for c in kept
        if c in ("codes", "recon") or _re.fullmatch(r"__c\d+", c)
    ]
    if bad:
        raise ValueError(
            f"pq_encode: keep column(s) {bad} collide with the output "
            "columns 'codes'/'recon' or the internal __c<j> temporaries"
        )
    if engine == "auto":
        engine = "numpy" if _integral_ids(corpus, id_col) else "expr"
    if engine == "numpy":
        return _pq_encode_numpy(corpus, cb, m, sub, emb_col, id_col, kept)
    code_exprs = []
    recon_exprs = []
    for j in range(m):
        structs = ", ".join(
            f"named_struct('d', {_pq_sqdist_sql(emb_col, cb[c], j, sub)}, 'c', {c})"
            for c in range(len(cb))
        )
        code_exprs.append(f"array_min(array({structs})).c AS __c{j}")
        arrays = ", ".join(
            "array("
            + ", ".join(
                f"CAST({float(cb[c][j * sub + d])!r}D AS FLOAT)"
                for d in range(sub)
            )
            + ")"
            for c in range(len(cb))
        )
        recon_exprs.append(f"element_at(array({arrays}), __c{j} + 1)")
    in_cols = [id_col, emb_col] + [c for c in kept if c != emb_col]
    coded = corpus.selectExpr(*in_cols, *code_exprs)
    return coded.selectExpr(
        id_col,
        f"array({', '.join(f'__c{j}' for j in range(m))}) AS codes",
        f"flatten(array({', '.join(recon_exprs)})) AS recon",
        *kept,
    )


def _pq_encode_numpy(
    corpus: DataFrame, cb: list, m: int, sub: int, emb_col: str, id_col: str,
    kept: list | None = None,
) -> DataFrame:
    """Arrow-batched PQ encoder: per (j, c) squared distance accumulates
    DIMENSION-BY-DIMENSION in float64 (the codegen fold's exact IEEE
    sequence — see ``_np_chunked_topk``), rounds via ``_np_round6``, and
    takes the first strict minimum in code order (== the struct-order
    argmin's code-id tiebreak)."""
    import numpy as np

    from pyspark.sql import types as T

    cb64m = np.asarray([np.asarray(c, dtype=np.float64) for c in cb])
    cb32 = np.asarray(
        [np.asarray(c, dtype=np.float32) for c in cb], dtype=np.float32
    )
    dim = m * sub

    def run(batches):
        import pandas as pd

        for pdf in batches:
            X = _np_emb_matrix(pdf[emb_col], dim)
            n = X.shape[0]
            codes = np.zeros((n, m), dtype=np.int32)
            for j in range(m):
                # broadcast over codes, accumulate DIMENSION-BY-DIMENSION:
                # acc[r, c] sees the exact same float64 add sequence as the
                # old per-code loop (bit-identical), ~n_codes x fewer numpy
                # dispatches (round-7: cut the trained-family bench block)
                acc = np.zeros((n, len(cb)))
                for d in range(sub):
                    i = j * sub + d
                    t = X[:, i:i + 1] - cb64m[:, i][None, :]
                    acc += t * t
                # first occurrence of the minimum == the strict '<' fold's
                # smaller-code-id tiebreak
                codes[:, j] = np.argmin(
                    _np_round6(acc), axis=1
                ).astype(np.int32)
            recon = np.concatenate(
                [
                    cb32[codes[:, j]][:, j * sub : (j + 1) * sub]
                    for j in range(m)
                ],
                axis=1,
            )
            out = {
                id_col: pdf[id_col],
                "codes": list(codes),
                "recon": list(recon),
            }
            for c in kept or ():
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    in_schema = {f.name: f.dataType for f in corpus.schema.fields}
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
            T.StructField("recon", T.ArrayType(T.FloatType())),
        ]
        + [T.StructField(c, in_schema[c]) for c in kept or ()]
    )
    in_cols = [id_col, emb_col] + [c for c in kept or () if c != emb_col]
    return corpus.select(*in_cols).mapInPandas(run, schema)


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    k: int = 5,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    engine: str = "auto",
    codebook="seed",
    train_iters: int = 3,
) -> DataFrame:
    """Approximate top-k via product quantization with asymmetric distance:
    full-precision queries score against the corpus's quantized
    reconstructions (ADC), ranked (rounded cosine desc, neighbor id asc).

    Approximate but DETERMINISTIC — seeded codebook, round-6 argmin with
    code-id tiebreaks — so the DuckDB oracle replays the identical result.
    Scale shape: encode is a zero-shuffle projection; scoring reuses
    ``cosine_topk`` unchanged (two-phase local top-k, numpy or join
    engine), reading the reconstruction instead of the raw embedding —
    the raw float column is DEAD after encode, which is the point: a
    1000-executor deployment scans m-byte codes, not dim-float vectors.

    ``codebook="seed"`` (default): first-``n_codes``-by-id vectors — the
    iteration-free oracle-checkable mode. ``codebook="trained"``: per-
    subspace Lloyd k-means via ``pq_train_codebook`` — the production
    recall path (deterministic, see its contract; recall gate in pytest).
    A list passes through as an explicit stacked codebook."""
    if engine == "auto":
        # the RAW corpus probe is free (parquet footer); recon has the same
        # row count, but probing the encoded frame would execute the whole
        # encode pass once just to count it
        engine = _resolve_auto_engine(corpus, queries, id_col)
    dim = _dim_of(corpus, emb_col)
    if codebook == "trained":
        codebook = pq_train_codebook(
            corpus, m, n_codes, train_iters, emb_col, id_col, dim=dim
        )
    enc = pq_encode(
        corpus, m, n_codes, emb_col, id_col,
        codebook=None if codebook == "seed" else codebook, dim=dim,
    )
    recon = enc.select(F.col(id_col), F.col("recon").alias(emb_col))
    return cosine_topk(recon, queries, k, emb_col, id_col, engine, dim=dim)


def _residual_base(
    corpus: DataFrame, coarse_cb: list, emb_col: str, id_col: str
) -> DataFrame:
    """(id, emb, __c coarse reconstruction, __res residual) — the frame the
    residual PQ trainer and encoder both read, checkpointed once.

    Round 8: the coarse reconstruction rides THROUGH the encode pass
    (``pq_encode(keep=...)``) instead of being joined back on id — the old
    corpus⋈coarse equi-join was a full corpus-scale shuffle that existed
    only to re-attach a column the map pass already had in hand. Values
    are identical (the join was 1:1 on a unique id)."""
    enc = pq_encode(corpus, 1, emb_col=emb_col, id_col=id_col,
                    codebook=coarse_cb, keep=(emb_col,),
                    dim=len(coarse_cb[0]))
    return (
        enc.select(id_col, emb_col, F.col("recon").alias("__c"))
        .withColumn(
            "__res",
            # one server-side parse (round 10) — same lambda expression
            F.expr(
                f"zip_with(`{emb_col}`, __c, "
                "(a, b) -> CAST(a AS DOUBLE) - CAST(b AS DOUBLE))"
            ),
        )
        .localCheckpoint(eager=False)
    )


def ivfpq_train(
    corpus: DataFrame,
    n_centroids: int = 8,
    m: int = 8,
    n_codes: int = 16,
    train_iters: int = 3,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    coarse_codebook: list | None = None,
) -> dict:
    """Train the residual IVF-PQ artifact pair ONCE for reuse (round-7
    VERDICT ask #6): the coarse m=1 Lloyd centroids and the m-subspace
    residual codebook. A production pipeline trains these once and shares
    them across every composed stage that needs the same quantizer —
    clustering (``pq_encode`` m=1), balanced sampling
    (``cluster_balanced_sample(codebook=...)``), and search
    (``ivfpq_topk(coarse_codebook=..., residual_codebook=...)``) — instead
    of re-running the Lloyd passes per stage. Pass ``coarse_codebook`` to
    reuse already-trained centroids and train only the residual book."""
    coarse = coarse_codebook if coarse_codebook is not None else (
        pq_train_codebook(corpus, 1, n_centroids, train_iters, emb_col, id_col)
    )
    base = _residual_base(corpus, coarse, emb_col, id_col)
    rcb = pq_train_codebook(base, m, n_codes, train_iters, "__res", id_col,
                            dim=len(coarse[0]))
    return {"coarse": coarse, "residual": rcb}


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_centroids: int = 8,
    n_probe: int = 2,
    m: int = 8,
    n_codes: int = 16,
    k: int = 5,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    engine: str = "auto",
    codebook="seed",
    train_iters: int = 3,
    residual: bool = False,
    coarse_codebook: list | None = None,
    residual_codebook: list | None = None,
) -> DataFrame:
    """IVF-PQ: the standard production ANN architecture — a coarse
    inverted-file index prunes the scan to ``n_probe`` buckets, and
    product-quantized reconstructions stand in for the raw vectors inside
    them (asymmetric distance). Composes ``pq_encode`` + ``ivf_topk``
    directly: bucket assignment AND scoring both run on the reconstruction,
    which is exactly what a codes-only store (m bytes/vector) can compute
    at 100 TB — raw floats never need to exist after encode.

    Deterministic end-to-end (seeded codebook + seeded coarse centroids +
    round-6 argmins with id tiebreaks), so the DuckDB oracle replays the
    full index: codes -> reconstructions -> bucket lists -> probed ranks.

    ``residual=True`` (round 6): the textbook refinement — PQ encodes
    ``x - c(x)`` (the residual against the vector's L2-nearest coarse
    centroid, both trained with the deterministic m=1 / m-subspace Lloyd
    trainer) and the stored reconstruction is ``c(x) + recon_residual``.
    Round 5 measured this WITHOUT trained codebooks and shipped the
    negative result (0.16 vs 0.24 — seeded books were the limiter);
    with trained books the residual distribution is tight around 0 and
    the same code budget buys more precision (round-6 probe, recall@10 on
    the 4-cluster synthetic: 0.31 trained-direct vs 0.45 trained-residual
    at n_codes=32, 0.23 vs 0.37 at 16; statistically tied on clusterless
    embeddings, 0.35 vs 0.36 — residual pays exactly when the coarse
    quantizer captures real structure). Implies ``codebook="trained"``."""
    if engine == "auto":
        # resolve here: ivf_topk branches only on "numpy" — passing "auto"
        # through would silently fall into the join scorer at every scale
        engine = _resolve_auto_engine(corpus, queries, id_col)
    if residual:
        # coarse quantizer: full-dim Lloyd (the m=1 subspace trainer) +
        # its encode pass = c(x) as a float32 reconstruction column.
        # ``coarse_codebook=``/``residual_codebook=`` pass-throughs (round-7
        # VERDICT ask #6): reuse artifacts another index/clustering stage —
        # or one ``ivfpq_train`` call — already trained
        coarse_cb = coarse_codebook if coarse_codebook is not None else (
            pq_train_codebook(
                corpus, 1, n_centroids, train_iters, emb_col, id_col
            )
        )
        base = _residual_base(corpus, coarse_cb, emb_col, id_col)
        rcb = residual_codebook if residual_codebook is not None else (
            pq_train_codebook(base, m, n_codes, train_iters, "__res", id_col,
                              dim=len(coarse_cb[0]))
        )
        # round 8: ``__c`` rides through the residual encode (keep=) — the
        # old base⋈renc re-attach join was the second corpus-scale shuffle
        # in this path; both are gone (values identical, 1:1 unique-id join)
        renc = pq_encode(base, m, emb_col="__res", id_col=id_col,
                         codebook=rcb, keep=("__c",), dim=len(rcb[0]))
        recon = (
            renc.select(
                F.col(id_col),
                # double-add then narrow: float32 + float32 in single
                # precision can double-round differently across engines;
                # widen-add-narrow is ONE correctly-rounded sequence both
                # Spark and DuckDB compute identically (oracle-replayable)
                F.expr(
                    "zip_with(__c, recon, (a, b) -> "
                    "CAST(CAST(a AS DOUBLE) + CAST(b AS DOUBLE) AS FLOAT))"
                ).alias(emb_col),
            )
            .localCheckpoint(eager=False)
        )
        return ivf_topk(
            recon, queries, n_centroids, n_probe, k, emb_col, id_col,
            engine=engine, dim=len(coarse_cb[0]),
        )
    dim = _dim_of(corpus, emb_col)
    if codebook == "trained":
        codebook = pq_train_codebook(
            corpus, m, n_codes, train_iters, emb_col, id_col, dim=dim
        )
    enc = pq_encode(
        corpus, m, n_codes, emb_col, id_col,
        codebook=None if codebook == "seed" else codebook, dim=dim,
    )
    # ivf_topk reads its corpus several times (coarse centroids, bucket
    # assignment, scoring) — materialize the encode pass ONCE
    recon = enc.select(F.col(id_col), F.col("recon").alias(emb_col)).localCheckpoint(
        eager=False
    )
    return ivf_topk(
        recon, queries, n_centroids, n_probe, k, emb_col, id_col,
        engine=engine, dim=dim,
    )


def _sq_stats_numpy(corpus: DataFrame, dim, emb_col: str):
    """Per-dimension corpus (min, max) via ONE Arrow-batched partial-stats
    pass merged on the driver — value-identical to the 2*dim-expression
    Catalyst aggregate (min/max only SELECT an existing float32-widened
    value, no arithmetic), but skips analyzing + compiling a 128-wide
    aggregate, a fixed ~1.3s of driver latency at any scale (round 10,
    guide §1.2/§4.2). NaN replays Spark's ordering (NaN sorts greatest):
    max is NaN when any value is, min ignores NaN unless all are.

    ``dim`` may be None (round 11, VERDICT r10 item 9): the width falls
    out of the collected stats row (len(mn)), so callers no longer need
    the separate one-row ``_dim_of`` probe job before this pass."""
    import numpy as np

    from pyspark.sql import types as T

    def part_stats(batches):
        import pandas as pd

        mn = mx = has_nan = None
        for pdf in batches:
            X = _np_emb_matrix(pdf[emb_col], dim or 0)
            if not X.shape[0]:
                continue
            bn = np.isnan(X).any(axis=0)
            bmn = np.fmin.reduce(X, axis=0)
            bmx = np.fmax.reduce(X, axis=0)
            if mn is None:
                mn, mx, has_nan = bmn, bmx, bn
            else:
                mn, mx, has_nan = np.fmin(mn, bmn), np.fmax(mx, bmx), has_nan | bn
        if mn is not None:
            yield pd.DataFrame(
                {"mn": [list(mn)], "mx": [list(mx)],
                 "nan": [list(bool(v) for v in has_nan)]}
            )

    sch = T.StructType(
        [
            T.StructField("mn", T.ArrayType(T.DoubleType())),
            T.StructField("mx", T.ArrayType(T.DoubleType())),
            T.StructField("nan", T.ArrayType(T.BooleanType())),
        ]
    )
    parts = (
        corpus.filter(F.col(emb_col).isNotNull())
        .select(emb_col)
        .mapInPandas(part_stats, sch)
        .collect()
    )
    if not parts:
        raise ValueError("sq: empty corpus — no quantization range")
    mn = np.fmin.reduce(np.asarray([p.mn for p in parts], dtype=np.float64), axis=0)
    mx = np.fmax.reduce(np.asarray([p.mx for p in parts], dtype=np.float64), axis=0)
    any_nan = np.asarray([p.nan for p in parts], dtype=bool).any(axis=0)
    mx = np.where(any_nan, np.nan, mx)
    return [float(v) for v in mn], [float(v) for v in mx]


def sq_encode(
    corpus: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    engine: str = "auto",
    dim: int | None = None,
) -> DataFrame:
    """int8 scalar quantization (SQ8): per-DIMENSION affine quantization to
    0..255 against corpus min/max — the other standard ANN compression
    next to PQ (4x at float32, higher fidelity than PQ's 32x; FAISS's
    SQ8 shape). Returns (id, codes array<int>, recon array<float>).

    Deterministic: code_d = floor((x_d - min_d) * 255 / (max_d - min_d)
    + 0.5) — floor(v + 0.5), NOT round(v, 0): Spark rounds the double's
    shortest-decimal repr HALF_UP while DuckDB rounds the binary value,
    and they disagree exactly on .5-boundary reprs; floor(+0.5) is a pure
    binary op both engines compute identically — and
    recon_d = float32(min_d + (code_d * (max_d - min_d)) / 255), with the
    exact same expression grouping replayed by the DuckDB oracle; a
    constant dimension (max == min) codes to 0 and reconstructs to min.
    The float32 narrowing is part of the contract: every scoring engine
    (numpy Arrow path, JVM fold, DuckDB REAL) then sees identical bits.

    Scale shape: ONE 1-row min/max aggregate (2 x dim values, map-side
    partials); encode + reconstruction are a map-only pass — the corpus
    never shuffles. ``engine="numpy"`` (default for integral ids) does
    the pass in Arrow batches against the driver-collected stats row
    (elementwise float64 numpy is the identical IEEE op sequence);
    ``engine="expr"`` keeps the pure-Catalyst projection as the
    cross-validation reference (pytest pins them equal) — at dim=64 its
    64-wide when/floor expression tree runs interpreted at ~1.8 ms/row,
    the same lesson as the PQ encode."""
    if dim is None:
        dim = _dim_of(corpus, emb_col)
    if dim is None:
        raise ValueError("sq: empty corpus — no quantization range")
    if engine == "auto":
        engine = "numpy" if _integral_ids(corpus, id_col) else "expr"
    if engine == "numpy":
        # one partial-stats Arrow pass (value-identical to the Catalyst
        # aggregate below; see _sq_stats_numpy) — the 2*dim-expression agg
        # is kept as the expr engine's cross-validation reference
        mns, mxs = _sq_stats_numpy(corpus, dim, emb_col)
        return _sq_encode_numpy(corpus, mns, mxs, dim, emb_col, id_col)
    stats = corpus.agg(
        *[
            f(F.col(emb_col)[d].cast("double")).alias(f"__{nm}{d}")
            for d in range(dim)
            for nm, f in (("mn", F.min), ("mx", F.max))
        ]
    )
    enc = corpus.select(id_col, emb_col).crossJoin(F.broadcast(stats))
    codes, recon = [], []
    for d in range(dim):
        x = F.col(emb_col)[d].cast("double")
        mn, mx = F.col(f"__mn{d}"), F.col(f"__mx{d}")
        rng = mx - mn
        code = F.when(rng > 0, F.floor((x - mn) * 255.0 / rng + 0.5)).otherwise(
            F.lit(0)
        ).cast("int")
        codes.append(code)
        recon.append((mn + (code.cast("double") * rng) / 255.0).cast("float"))
    return enc.select(
        F.col(id_col),
        F.array(*codes).alias("codes"),
        F.array(*recon).alias("recon"),
    )


def _sq_encode_numpy(
    corpus: DataFrame, mns: list, mxs: list, dim: int, emb_col: str, id_col: str
) -> DataFrame:
    """Arrow-batched SQ8 encoder: elementwise float64 numpy replays the
    exact IEEE sequence of the Catalyst projection — (x - mn) * 255 / rng,
    floor(+0.5), mn + (code * rng) / 255, float32 narrowing — so codes and
    reconstructions are bit-identical to the expression engine."""
    import numpy as np

    from pyspark.sql import types as T

    mn = np.asarray(mns, dtype=np.float64)
    rng = np.asarray(mxs, dtype=np.float64) - mn
    safe = np.where(rng > 0, rng, 1.0)

    def run(batches):
        import pandas as pd

        for pdf in batches:
            X = _np_emb_matrix(pdf[emb_col], dim)
            code = np.where(
                rng[None, :] > 0,
                np.floor((X - mn[None, :]) * 255.0 / safe[None, :] + 0.5),
                0.0,
            ).astype(np.int32)
            recon = (
                mn[None, :] + (code.astype(np.float64) * rng[None, :]) / 255.0
            ).astype(np.float32)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "codes": list(code),
                    "recon": list(recon),
                }
            )

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
            T.StructField("recon", T.ArrayType(T.FloatType())),
        ]
    )
    return corpus.select(id_col, emb_col).mapInPandas(run, schema)


def _sq_encode_with_dim(corpus: DataFrame, emb_col: str, id_col: str):
    """``sq_encode`` plus the encoded width in ONE stats job (round 11,
    VERDICT r10 item 9 — job-count cut on the composed chains): on the
    numpy engine the width falls out of the stats row itself, so the
    separate one-row ``_dim_of`` probe job disappears; the expr engine
    (non-integral ids) keeps the probe, which its Catalyst aggregate
    needs up front anyway."""
    if _integral_ids(corpus, id_col):
        mns, mxs = _sq_stats_numpy(corpus, None, emb_col)
        dim = len(mns)
        return _sq_encode_numpy(corpus, mns, mxs, dim, emb_col, id_col), dim
    dim = _dim_of(corpus, emb_col)
    return sq_encode(corpus, emb_col, id_col, engine="expr", dim=dim), dim


def sq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    engine: str = "auto",
) -> DataFrame:
    """Approximate top-k over SQ8 reconstructions (asymmetric: full-precision
    queries vs dequantized corpus), ranked (rounded cosine desc, id asc).
    Same composition shape as ``pq_topk``; scoring reuses ``cosine_topk``."""
    if engine == "auto":
        engine = _resolve_auto_engine(corpus, queries, id_col)
    # ONE stats job yields the encoder AND the width (round 11) — probing
    # dim separately cost a driver job, and probing the encoded frame
    # would materialize the lazy checkpoint just to read one row's width
    enc, dim = _sq_encode_with_dim(corpus, emb_col, id_col)
    # materialize the reconstruction: without the barrier Catalyst collapses
    # the 64-wide recon projection INTO the scorer, and the unrolled dot
    # then re-expands every array element's when/floor expression per term
    # (64x64 sub-expressions — measured 5.0s vs 1.3s at sf0.1)
    recon = enc.select(
        F.col(id_col), F.col("recon").alias(emb_col)
    ).localCheckpoint(eager=False)
    return cosine_topk(recon, queries, k, emb_col, id_col, engine, dim=dim)


def ivfsq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_centroids: int = 8,
    n_probe: int = 2,
    k: int = 5,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    engine: str = "auto",
) -> DataFrame:
    """IVF-SQ: coarse inverted-file pruning over SQ8 reconstructions —
    completes the composed-index family (IVF x {raw, PQ, SQ}). Identical
    composition point to ``ivfpq_topk``: bucket assignment AND scoring run
    on the reconstruction, exactly what an int8-codes-only store (4x
    compression, higher fidelity than PQ's 32x) computes at 100 TB.
    Deterministic end-to-end (binary-exact floor(v+0.5) codes + seeded
    coarse centroids + round-6 ranks with id tiebreaks), so the DuckDB
    oracle replays the full index."""
    if engine == "auto":
        engine = _resolve_auto_engine(corpus, queries, id_col)
    enc, dim = _sq_encode_with_dim(corpus, emb_col, id_col)
    recon = enc.select(
        F.col(id_col), F.col("recon").alias(emb_col)
    ).localCheckpoint(eager=False)
    return ivf_topk(
        recon, queries, n_centroids, n_probe, k, emb_col, id_col,
        engine=engine, dim=dim,
    )
