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
    """NULL (never a crash, never rank-1) for zero-norm vectors: under
    the project's ANSI runtime 0/0 raises mid-job, and with ANSI off it
    is NaN — which sorts FIRST under desc, making a zero-filled missing
    embedding everyone's top neighbor. NULL scores drop out of every
    threshold filter and sort last in the top-k cuts."""
    denom = _norm(a) * _norm(b)
    return F.when(denom > 0, _dot(a, b) / denom)


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "qvec",
    k: int = 5,
    include_self: bool = False,
    filter_sql: str | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    queries is broadcast (queries are few; corpus is huge) -> the crossJoin
    is a broadcast nested loop, embarrassingly parallel over corpus
    partitions; per-query top-k via window row_number. Ties broken by
    ascending corpus id.

    filter_sql is the ES `knn.filter` clause with PRE-filter semantics:
    the predicate restricts the corpus BEFORE the top-k cut, so the
    result is the k nearest among matching vectors (never fewer than k
    because near ones were filtered away). A plain Spark SQL expression
    over the corpus columns — Catalyst pushes it into the scan.
    """
    if filter_sql:
        corpus = corpus.filter(filter_sql)
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
    return df.withColumn("lsh_bucket", _table_bucket_expr(vec_col, planes))


def kmeans_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 16,
    iters: int = 5,
    sample: int = 4096,
    seed: int = 42,
    id_col: str = "vec_id",
) -> np.ndarray:
    """Deterministic mini k-means for IVF coarse quantization: Lloyd
    iterations over a fixed-size sample on the driver (the sample is tiny
    versus the corpus; the expensive part — assignment of every corpus
    vector — happens distributed in `ivf_assign`). Seeds are the first k
    sample vectors after a deterministic sort, so centroids are reproducible
    across runs/cluster sizes."""
    rows = (
        df.select(id_col, vec_col)
        .orderBy(id_col)  # limit alone is layout-dependent; sort pins it
        .limit(sample)
        .collect()
    )
    if not rows:
        raise ValueError(
            "no vectors to cluster: the corpus is empty (or a filter "
            "matched nothing)"
        )
    x = np.array([r[1] for r in rows], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    order = np.lexsort(x.T[::-1])
    c = x[order[:k]].copy()
    for _ in range(iters):
        sims = x @ c.T
        assign = sims.argmax(axis=1)
        for j in range(k):
            m = assign == j
            if m.any():
                v = x[m].mean(axis=0)
                c[j] = v / max(np.linalg.norm(v), 1e-12)
    return c


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest (cosine) centroid — one vectorized
    Arrow pass (numpy matmul per batch), no shuffle. At scale the output is
    written partitioned by `centroid` so a probe reads only its lists."""
    import pandas as pd
    from pyspark.sql import types as T

    c = centroids.astype(np.float64)
    out_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("centroid", T.IntegerType(), False),
            T.StructField(vec_col, T.ArrayType(T.FloatType()), False),
        ]
    )

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
            a = (xn @ c.T).argmax(axis=1).astype(np.int32)
            yield pd.DataFrame(
                {"vec_id": pdf[id_col].to_numpy(), "centroid": a, vec_col: pdf[vec_col]}
            )

    return df.select(id_col, vec_col).mapInPandas(assign, out_schema)


def knn_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "qvec",
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    filter_sql: str | None = None,
) -> DataFrame:
    """IVF approximate nearest neighbors: score only the corpus vectors in
    each query's `n_probe` nearest centroid lists (the FAISS IVF-flat
    shape). Recall rises with n_probe; n_probe = n_centroids degenerates to
    exact search. The probe join is an equi-join on centroid id — at scale
    this prunes partitions instead of scanning the corpus.

    filter_sql = ES `knn.filter` PRE-filter: restricts the corpus before
    centroid training AND assignment, so probing spends its n_probe
    budget inside the filtered sub-space (filtering after assignment
    would silently lower recall when the filter is selective)."""
    if filter_sql:
        corpus = corpus.filter(filter_sql)
    cents = kmeans_centroids(corpus, vec_col, k=n_centroids, seed=seed, id_col=id_col)
    assigned = ivf_assign(corpus, cents, id_col, vec_col)

    # driver-side probe list per query (queries are few by contract)
    qrows = queries.select(qid_col, qvec_col).collect()
    probes = []
    for r in qrows:
        v = np.array(r[1], dtype=np.float64)
        v /= max(np.linalg.norm(v), 1e-12)
        top = np.argsort(-(cents @ v))[:n_probe]
        for cid in top:
            probes.append((r[0], int(cid), r[1]))
    probe_df = F.broadcast(
        corpus.sparkSession.createDataFrame(
            probes, f"{qid_col} long, centroid int, {qvec_col} array<float>"
        )
    )
    joined = assigned.join(probe_df, "centroid").filter(F.col("vec_id") != F.col(qid_col))
    scored = joined.select(
        F.col(qid_col),
        F.col("vec_id").alias("neighbor_id"),
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


def _table_bucket_expr(vec_col: str, planes: np.ndarray) -> Column:
    """Sign-bit bucket of one hyperplane table as a long (JVM expression)."""
    bucket = F.lit(0).cast("long")
    for i in range(planes.shape[0]):
        proj = F.aggregate(
            F.zip_with(
                F.transform(vec_col, lambda x: x.cast("double")),
                F.array(*[F.lit(float(v)) for v in planes[i]]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(
            proj > 0, F.lit(1 << i).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return bucket


def multitable_lsh_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 1,
    seed: int = 42,
) -> DataFrame:
    """(input columns..., table, lsh_bucket), one row per (vector, table).
    Multiple independent tables are the standard recall lever: a near pair
    only has to collide in ANY table.

    ONE Arrow pass computes every table's sign-bit bucket as a single
    (batch x dim) @ (dim x n_tables*n_planes) matmul — n_tables*n_planes
    per-plane JVM expressions would bloat codegen quadratically (measured
    7x slower end-to-end at 24x6 planes), and the matmul is exactly how a
    GPU/BLAS-backed pipeline would bucket at 100 TB."""
    import pandas as pd
    from pyspark.sql import types as T

    # (dim, n_tables*n_planes), per-table RNG so any prefix of tables is
    # stable as n_tables grows
    planes = np.concatenate(
        [
            np.random.default_rng(seed + t).standard_normal((n_planes, dim)).T
            for t in range(n_tables)
        ],
        axis=1,
    )
    weights = (1 << np.arange(n_planes, dtype=np.int64))
    in_fields = df.schema.fields
    out_schema = T.StructType(
        [*in_fields,
         T.StructField("table", T.IntegerType(), False),
         T.StructField("lsh_bucket", T.LongType(), False)]
    )
    cols = [f.name for f in in_fields]

    def bucketize(batches):
        for pdf in batches:
            if not len(pdf):
                continue  # np.stack raises on an empty batch (ADVICE r03)
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            bits = (x @ planes) > 0  # (n, n_tables*n_planes)
            b = bits.reshape(len(pdf), n_tables, n_planes) @ weights
            out = pdf.loc[pdf.index.repeat(n_tables), cols].reset_index(drop=True)
            out["table"] = np.tile(np.arange(n_tables, dtype=np.int32), len(pdf))
            out["lsh_bucket"] = b.reshape(-1)
            yield out

    return df.mapInPandas(bucketize, out_schema)


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
    n_tables: int = 1,
    probe_hamming: int = 0,
    seed: int = 42,
    filter_sql: str | None = None,
) -> DataFrame:
    """ANN: score only corpus vectors sharing an LSH bucket with the query
    in ANY of `n_tables` hyperplane tables; with probe_hamming=1 the query
    additionally probes every bucket one sign-bit away (multiprobe LSH) —
    the recall lever that costs probe rows on the (tiny, broadcast) query
    side instead of more corpus-side tables. Candidates are a (table,
    bucket) equi-join + pair dedup; the corpus is scanned ONCE and never
    cross-joined — the 100TB path. Recall rises with n_tables/probing;
    on the benchmark fixture (near-orthogonal vectors, worst case for LSH)
    6 planes x 24 tables x hamming-1 probing reproduces exact top-5.

    filter_sql = ES `knn.filter` PRE-filter: the corpus restricts before
    bucketing, so candidate generation never pays for vectors the filter
    would discard and the bucket join returns k matching neighbors."""
    if filter_sql:
        corpus = corpus.filter(filter_sql)
    cb = multitable_lsh_buckets(
        corpus.select(id_col, vec_col), vec_col, dim, n_planes, n_tables, seed
    )
    qb = multitable_lsh_buckets(
        queries.select(qid_col, F.col(qvec_col).alias(vec_col)),
        vec_col, dim, n_planes, n_tables, seed,
    ).select(qid_col, F.col(vec_col).alias(qvec_col), "table", "lsh_bucket")
    if probe_hamming > 2:
        raise ValueError(
            "probe_hamming supports 0 (exact bucket), 1 or 2 "
            "(engine-native cap: the probe set grows O(n_planes^d))"
        )
    if probe_hamming >= 1:
        masks = [1 << i for i in range(n_planes)]
        if probe_hamming >= 2:
            # distance-2 probes were previously silently DROPPED (any
            # requested radius >= 2 behaved as 1)
            masks += [
                (1 << i) | (1 << j)
                for i in range(n_planes)
                for j in range(i + 1, n_planes)
            ]
        probes = F.array(
            F.col("lsh_bucket"),
            *[F.col("lsh_bucket").bitwiseXOR(F.lit(m)) for m in masks],
        )
        qb = qb.select(
            qid_col, qvec_col, "table", F.explode(probes).alias("lsh_bucket")
        )
    joined = (
        cb.join(F.broadcast(qb), ["table", "lsh_bucket"])
        .filter(F.col(id_col) != F.col(qid_col))
        # a pair can collide in several tables/probes; score it once
        .dropDuplicates([qid_col, id_col])
    )
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


def rrf_fuse(
    ranked: list[DataFrame],
    id_cols: list[str],
    k: int = 10,
    rank_k: int = 60,
    rank_col: str = "rank",
    weights: list[float] | None = None,
    per: list[str] | None = None,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack/Clarke/Buettcher 2009; the ES 8.x
    `rrf` retriever): fuse N rankers' top-k lists without score
    calibration — rrf(d) = sum_i w_i / (rank_k + rank_i(d)). The standard
    hybrid-retrieval combine (BM25 lexical x kNN dense), and the one that
    needs no per-ranker score normalization because only RANKS enter.

    Each input carries (*id_cols, rank_col) — any extra columns are
    ignored. Plan: per-ranker reciprocal contributions project JVM-side,
    union, ONE map-side-combinable groupBy on the identity, one
    TakeOrdered cut per... the whole fusion is two narrow stages over
    N x k rows per query — nothing scales with corpus size, exactly why
    RRF is the production hybrid combine at 10^12 docs. Also returns
    n_rankers (how many lists the doc appeared in).

    `per` names id_cols that partition the fusion (e.g. query_id for a
    batch of hybrid queries): the top-k cut is taken per partition via
    one window over the tiny fused relation. Without `per` the cut is
    global. Output adds fused_rank.

    Ties (symmetric rank patterns across rankers) break on the non-
    partition id_cols ascending — deterministic because reciprocal sums
    over identical rank integers are bitwise-identical doubles."""
    if not ranked:
        raise ValueError("rrf_fuse needs at least one ranked input")
    if weights is not None and len(weights) != len(ranked):
        raise ValueError(f"{len(weights)} weights for {len(ranked)} rankers")
    if rank_k < 1:
        raise ValueError(f"rank_k must be >= 1, got {rank_k}")
    per = list(per or ())
    if any(c not in id_cols for c in per):
        raise ValueError(f"per={per} must be a subset of id_cols={id_cols}")
    parts = []
    for i, df in enumerate(ranked):
        w = float(weights[i]) if weights else 1.0
        parts.append(
            df.select(
                *id_cols,
                (F.lit(w) / (F.lit(float(rank_k)) + F.col(rank_col)))
                .alias("_rrf"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    agg = out.groupBy(*id_cols).agg(
        F.sum("_rrf").alias("rrf_score"), F.count("*").alias("n_rankers")
    )
    tie = [F.asc(c) for c in id_cols if c not in per]
    w_ = W.partitionBy(*per).orderBy(F.desc("rrf_score"), *tie)
    return (
        agg.withColumn("fused_rank", F.row_number().over(w_))
        .filter(F.col("fused_rank") <= k)
    )


_LINEAR_NORMALIZERS = ("none", "minmax", "l2_norm")


def linear_fuse(
    ranked: list[tuple],
    id_cols: list[str],
    k: int = 10,
    score_col: str = "score",
) -> DataFrame:
    """Weighted normalized-score fusion (the ES 8.18 `linear` retriever):
    fuse N rankers' windows by SCORE — linear(d) = sum_i w_i *
    norm_i(score_i(d)) — where each ranker's scores normalize within its
    own window: `minmax` -> (s - min) / (max - min) (degenerate
    max == min windows map every present doc to 1.0 — equally best),
    `l2_norm` -> s / ||window scores||_2, `none` -> raw. Docs missing
    from a ranker's window contribute 0 from it (the ES contract).

    `ranked`: [(df, weight, normalizer), ...] — each df carries
    (*id_cols, score_col) and is ALREADY window-cut (the caller owns the
    rank_window_size TakeOrdered, like rrf_fuse). Plan: per-ranker
    normalization constants are one tiny aggregate broadcast-joined back
    onto the <=window rows (never a shuffle of raw rows), weighted
    contributions union, ONE map-side-combinable groupBy on the
    identity, one window-rank cut over the fused <=N x window relation —
    nothing scales with corpus size. Also returns n_rankers; ties break
    on id_cols ascending."""
    if not ranked:
        raise ValueError("linear_fuse needs at least one ranked input")
    parts = []
    for df, weight, norm in ranked:
        if norm not in _LINEAR_NORMALIZERS:
            raise ValueError(
                f"unknown normalizer {norm!r}; supported: "
                f"{_LINEAR_NORMALIZERS}"
            )
        s = F.col(score_col)
        if norm == "minmax":
            stats = df.agg(
                F.min(s).alias("_mn"), F.max(s).alias("_mx")
            )
            df = df.crossJoin(F.broadcast(stats))
            normed = F.when(
                F.col("_mx") == F.col("_mn"), F.lit(1.0)
            ).otherwise((s - F.col("_mn")) / (F.col("_mx") - F.col("_mn")))
        elif norm == "l2_norm":
            stats = df.agg(F.sqrt(F.sum(s * s)).alias("_l2"))
            df = df.crossJoin(F.broadcast(stats))
            normed = F.when(F.col("_l2") == 0, F.lit(0.0)).otherwise(
                s / F.col("_l2")
            )
        else:
            normed = s
        parts.append(
            df.select(
                *id_cols,
                (F.lit(float(weight)) * normed).alias("_lin"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    agg = out.groupBy(*id_cols).agg(
        F.sum("_lin").alias("linear_score"), F.count("*").alias("n_rankers")
    )
    w_ = W.orderBy(F.desc("linear_score"), *[F.asc(c) for c in id_cols])
    return (
        agg.withColumn("fused_rank", F.row_number().over(w_))
        .filter(F.col("fused_rank") <= k)
    )


def quantize_embeddings(
    df: DataFrame, vec_col: str, prefix: str = "q"
) -> DataFrame:
    """Per-vector symmetric int8 quantization — the embedding-compression
    step a 100 TB vector corpus needs before ANN serving (4x smaller than
    float32, dot products stay rank-faithful to ~1e-2 relative error):
    scale = max|x| / 127, code_i = round(x_i / scale) in [-127, 127].

    Pure Catalyst (one codegen projection, no UDF, no shuffle): appends
    `{prefix}_scale` (double) and `{prefix}_codes` (array<int>). The
    math runs in double on both this engine and the DuckDB oracle, so
    codes are bit-reproducible. All-zero vectors quantize to zero codes
    with scale 0 (dequantize restores exact zeros)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scale = F.array_max(F.transform(v, F.abs)) / F.lit(127.0)
    codes = F.when(
        F.col(f"{prefix}_scale") == 0.0,
        F.transform(v, lambda x: F.lit(0)),
    ).otherwise(
        F.transform(
            v,
            lambda x: F.greatest(
                F.lit(-127),
                F.least(
                    F.lit(127),
                    F.round(x / F.col(f"{prefix}_scale")).cast("int"),
                ),
            ),
        )
    )
    return df.withColumn(f"{prefix}_scale", scale).withColumn(
        f"{prefix}_codes", codes
    )


def dequantize_embeddings(
    df: DataFrame, prefix: str = "q", out_col: str = "deq"
) -> DataFrame:
    """Inverse of quantize_embeddings: x̂_i = code_i * scale (double).
    Reconstruction error per component is bounded by scale/2."""
    return df.withColumn(
        out_col,
        F.transform(
            F.col(f"{prefix}_codes"),
            lambda c: c.cast("double") * F.col(f"{prefix}_scale"),
        ),
    )
