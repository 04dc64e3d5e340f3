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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import _spread, cosine, dot, norm


def _dim_of(df: DataFrame, emb_col: str):
    """Embedding width, probed once at plan time (one tiny driver action) so
    dot products unroll into codegen'd arithmetic instead of interpreted
    array folds. None when the table is empty (falls back to the fold)."""
    row = df.select(F.size(F.col(emb_col)).alias("d")).first()
    return int(row.d) if row is not None else None


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k neighbors per query (excluding self-matches by id).

    Deterministic ranking: (rounded cosine desc, neighbor id asc)."""
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
            F.round(dot("q_emb", "c_emb", dim)
                    / (F.col("q_norm") * F.col("c_norm")), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def assign_centroids(
    corpus: DataFrame,
    centroids: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    dim=None,
) -> DataFrame:
    """Assign each vector to its nearest centroid (broadcast centroids).

    Norms are computed ONCE per side before the pair join — the naive
    inline cosine recomputes both norms per pair (3x the FLOPs and 3x the
    generated code)."""
    c = centroids.select(
        F.col(id_col).alias("centroid_id"), F.col(emb_col).alias("cent_emb"),
        norm(emb_col, dim).alias("cent_norm"),
    )
    corpus = corpus.withColumn("__nrm", norm(emb_col, dim))
    scored = corpus.join(F.broadcast(c)).withColumn(
        "cos_c",
        F.round(dot(emb_col, "cent_emb", dim)
                / (F.col("__nrm") * F.col("cent_norm")), 6),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("cos_c").desc(), F.col("centroid_id").asc())
    return (
        scored.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .select(F.col(id_col), F.col(emb_col), F.col("__nrm"), F.col("centroid_id"))
    )


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
) -> DataFrame:
    """Approximate top-k: probe only the n_probe closest centroid buckets.

    ``centroids="seed"`` (default): the first ``n_centroids`` corpus vectors
    by id — deterministic without iteration, kept as the oracle-checkable
    mode. ``centroids="kmeans"``: spherical k-means via ``kmeans_centroids``
    — the production-recall path (see tests/test_llm_ops.py recall gate)."""
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
    c = c.withColumn("cent_norm", norm(F.col("cent_emb")))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(emb_col).alias("q_emb"),
                       norm(emb_col, dim).alias("q_norm"))
    qprobe = q.join(F.broadcast(c)).withColumn(
        "cos_c",
        F.round(dot(F.col("q_emb"), F.col("cent_emb"))
                / (F.col("q_norm") * F.col("cent_norm")), 6),
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("cos_c").desc(), F.col("centroid_id").asc())
    probes = (
        qprobe.withColumn("__r", F.row_number().over(wq))
        .filter(F.col("__r") <= n_probe)
        .select("query_id", "q_emb", "q_norm", "centroid_id")
    )
    scored = (
        assigned.join(F.broadcast(probes), "centroid_id")
        .filter(F.col("query_id") != F.col(id_col))
        .withColumn("cos", F.round(dot("q_emb", emb_col, dim)
                                   / (F.col("q_norm") * F.col("__nrm")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "cos", "rank")
    )
