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


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k neighbors per query (excluding self-matches by id).

    Deterministic ranking: (rounded cosine desc, neighbor id asc)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(emb_col).alias("q_emb"),
        norm(F.col(emb_col)).alias("q_norm"),
    )
    corpus = _spread(corpus)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(emb_col).alias("c_emb"),
        norm(F.col(emb_col)).alias("c_norm"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            F.round(dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_norm") * F.col("c_norm")), 6),
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
) -> DataFrame:
    """Assign each vector to its nearest centroid (broadcast centroids)."""
    c = centroids.select(
        F.col(id_col).alias("centroid_id"), F.col(emb_col).alias("cent_emb")
    )
    scored = corpus.join(F.broadcast(c)).withColumn(
        "cos_c", F.round(cosine(F.col(emb_col), F.col("cent_emb")), 6)
    )
    w = Window.partitionBy(id_col).orderBy(F.col("cos_c").desc(), F.col("centroid_id").asc())
    return (
        scored.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .select(F.col(id_col), F.col(emb_col), F.col("centroid_id"))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_centroids: int = 8,
    n_probe: int = 2,
    k: int = 5,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: probe only the n_probe closest centroid buckets.

    Centroids are the first ``n_centroids`` corpus vectors by id —
    deterministic without an iterative k-means (swap in real centroids for
    production quality; the pruning topology is what matters for scale)."""
    centroids = corpus.orderBy(id_col).limit(n_centroids)
    assigned = assign_centroids(corpus, centroids, emb_col, id_col)
    # probe lists per query
    c = centroids.select(F.col(id_col).alias("centroid_id"), F.col(emb_col).alias("cent_emb"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(emb_col).alias("q_emb"))
    qprobe = q.join(F.broadcast(c)).withColumn(
        "cos_c", F.round(cosine(F.col("q_emb"), F.col("cent_emb")), 6)
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("cos_c").desc(), F.col("centroid_id").asc())
    probes = (
        qprobe.withColumn("__r", F.row_number().over(wq))
        .filter(F.col("__r") <= n_probe)
        .select("query_id", "q_emb", "centroid_id")
    )
    scored = (
        assigned.join(F.broadcast(probes), "centroid_id")
        .filter(F.col("query_id") != F.col(id_col))
        .withColumn("cos", F.round(cosine(F.col("q_emb"), F.col(emb_col)), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "cos", "rank")
    )
