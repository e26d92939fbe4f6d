"""Approximate-nearest-neighbor search over an embedding column.

Training-pipeline addition (build brief): brute-force cosine top-k as
the correctness baseline, plus an IVF (inverted-file) variant as the
100 TB scale path — corpus bucketed by nearest coarse centroid, queries
probe only the ``n_probe`` closest buckets, cutting the join fan-out by
|centroids| / n_probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_expr


def brute_force_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rank) exact top-k by cosine.

    Ties broken by neighbor id ascending (total order — deterministic).
    Self-pairs are excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        F.broadcast(q).crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            F.round(cosine_expr("qv", "cv"), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def ivf_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 10,
    n_centroids: int = 16, n_probe: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: centroids = deterministic corpus sample (lowest ids);
    corpus rows live in their nearest-centroid bucket; a query probes its
    ``n_probe`` nearest buckets.  Same output schema as brute force;
    recall < 1 by construction (approximate — the scale path)."""
    cents = (
        corpus.orderBy(F.col(id_col).asc()).limit(n_centroids)
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
    )
    cents = F.broadcast(cents)

    def nearest_buckets(df: DataFrame, idc: str, vc: str, n: int) -> DataFrame:
        scored = df.crossJoin(cents).select(
            F.col(idc), F.col(vc),
            F.col("cid"), cosine_expr(vc, "cvec").alias("csim"),
        )
        w = Window.partitionBy(idc).orderBy(F.col("csim").desc(), F.col("cid").asc())
        return scored.withColumn("crank", F.row_number().over(w)).where(
            F.col("crank") <= n
        )

    c_assigned = nearest_buckets(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")),
        "neighbor_id", "cv", 1,
    ).select("neighbor_id", "cv", F.col("cid").alias("bucket"))
    q_assigned = nearest_buckets(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")),
        "query_id", "qv", n_probe,
    ).select("query_id", "qv", F.col("cid").alias("bucket"))

    scored = (
        q_assigned.join(c_assigned, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            F.round(cosine_expr("qv", "cv"), 6).alias("cosine"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
