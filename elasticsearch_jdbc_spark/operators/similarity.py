"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, plus an LSH-bucketed
(random hyperplane) approximate variant as the scale path. Dot products run
JVM-side via F.zip_with/F.aggregate (codegen) — Python appears nowhere in
the scoring loop.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "qvec",
    k: int = 5,
    include_self: bool = False,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    queries is broadcast (queries are few; corpus is huge) -> the crossJoin
    is a broadcast nested loop, embarrassingly parallel over corpus
    partitions; per-query top-k via window row_number. Ties broken by
    ascending corpus id.
    """
    q = F.broadcast(queries.select(qid_col, qvec_col))
    joined = corpus.select(id_col, vec_col).crossJoin(q)
    if not include_self:
        joined = joined.filter(F.col(id_col) != F.col(qid_col))
    scored = joined.select(
        F.col(qid_col),
        F.col(id_col).alias("neighbor_id"),
        cosine(
            F.transform(vec_col, lambda x: x.cast("double")),
            F.transform(qvec_col, lambda x: x.cast("double")),
        ).alias("cos_sim"),
    )
    w = W.partitionBy(qid_col).orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, "rank", "neighbor_id", "cos_sim")
    )


def hyperplane_lsh_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 12,
    seed: int = 42,
) -> DataFrame:
    """Random-hyperplane LSH: bucket = sign bits of <v, r_i> packed into a
    long. Near vectors (cosine) collide w.h.p.; at scale the ANN query joins
    on bucket (optionally multi-probe over neighboring buckets) instead of
    scanning the corpus. Hyperplanes are a broadcast literal array."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    bucket = F.lit(0).cast("long")
    for i in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                F.transform(vec_col, lambda x: x.cast("double")),
                F.array(*[F.lit(float(v)) for v in planes[i]]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return df.withColumn("lsh_bucket", bucket)


def knn_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "qvec",
    k: int = 5,
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """ANN: score only corpus vectors in the query's LSH bucket. Recall
    depends on n_planes; this is the 100TB path (bucket join, no full scan).
    """
    cb = hyperplane_lsh_buckets(corpus.select(id_col, vec_col), vec_col, dim, n_planes, seed)
    qb = hyperplane_lsh_buckets(
        queries.select(qid_col, F.col(qvec_col).alias(vec_col)), vec_col, dim, n_planes, seed
    ).select(qid_col, F.col(vec_col).alias(qvec_col), "lsh_bucket")
    joined = cb.join(F.broadcast(qb), "lsh_bucket").filter(F.col(id_col) != F.col(qid_col))
    scored = joined.select(
        F.col(qid_col),
        F.col(id_col).alias("neighbor_id"),
        cosine(
            F.transform(vec_col, lambda x: x.cast("double")),
            F.transform(qvec_col, lambda x: x.cast("double")),
        ).alias("cos_sim"),
    )
    w = W.partitionBy(qid_col).orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, "rank", "neighbor_id", "cos_sim")
    )
