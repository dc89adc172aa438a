"""Source-code corpus sources.

The engine's contracted input shape (BASELINE.json input_hint) is an
Iceberg-style table of source-code repositories:

    repo:string, path:string, commit:string, lang:string, content:string

`synthetic_corpus` generates that table deterministically and *distributedly*
(spark.range -> per-row seeded generation inside mapInPandas, no driver-side
materialization), so the same generator scales from 1k files in tests to any
size: row i always produces the same file regardless of partitioning.

Reference behavior mirrored: the JDBC source streams rows without
materializing a table (StandardSource.java:791-815 merge loop); here the
generator is a lazily-evaluated DataFrame the same way.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("content", T.StringType(), False),
    ]
)

_LANGS = ["java", "python", "go", "rust", "js"]
_EXT = {"java": "java", "python": "py", "go": "go", "rust": "rs", "js": "js"}

# Vocabulary pools used to synthesize identifier-rich code-like content.
_NOUNS = [
    "index", "buffer", "query", "token", "stream", "batch", "shard", "merge",
    "segment", "posting", "score", "field", "value", "writer", "reader",
    "client", "request", "response", "config", "handler", "context", "state",
    "metric", "counter", "worker", "queue", "node", "cluster", "document",
    "term", "cache", "lock", "pool", "task", "job", "row", "column", "cursor",
]
_VERBS = [
    "get", "set", "build", "parse", "flush", "merge", "fetch", "read", "write",
    "open", "close", "init", "run", "submit", "encode", "decode", "split",
    "filter", "map", "reduce", "sort", "scan", "seek", "advance", "commit",
]
_KEYWORDS = {
    "java": ["public", "void", "static", "final", "class", "return", "new", "int", "long", "String"],
    "python": ["def", "return", "class", "self", "import", "for", "in", "if", "None", "lambda"],
    "go": ["func", "return", "struct", "interface", "var", "range", "defer", "go", "chan", "error"],
    "rust": ["fn", "let", "mut", "impl", "struct", "match", "pub", "use", "Vec", "Option"],
    "js": ["function", "const", "let", "return", "class", "async", "await", "export", "this", "new"],
}


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Counter-based hash (splitmix64 finalizer): vectorized, stateless —
    randomness derives from (seed, id, position) only, so generation is
    deterministic regardless of batching/partitioning."""
    x = x.astype(np.uint64, copy=True)
    x += np.uint64(0x9E3779B97F4A7C15)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


# precomputed word-form pools (verb x noun cross products), so token choice
# is one vectorized gather instead of per-token string building
_POOL_CAMEL = np.array([v + n.capitalize() for v in _VERBS for n in _NOUNS])
_POOL_SNAKE = np.array([f"{v}_{n}" for v in _VERBS for n in _NOUNS])
_POOL_NOUN = np.array(_NOUNS)
_POOL_NUM = np.array([f"{n}{i}" for n in _NOUNS for i in range(100)])
_POOL_KW = {L: np.array(ws) for L, ws in _KEYWORDS.items()}


def _gen_rows(ids: np.ndarray, seed: int, avg_tokens: int) -> pd.DataFrame:
    """Generate one corpus row per id. Deterministic in (id, seed) only.
    Fully vectorized: ~1M tokens/sec/core."""
    ids = ids.astype(np.int64)
    n_rows = len(ids)
    base = _splitmix64(ids.astype(np.uint64) ^ np.uint64(seed * 0x9E3779B9))
    lang_idx = (base % np.uint64(len(_LANGS))).astype(np.int64)
    n_tok = (avg_tokens // 2 + (_splitmix64(base) % np.uint64(avg_tokens))).astype(np.int64)

    # flat token stream: row r contributes n_tok[r] tokens
    total = int(n_tok.sum())
    row_of = np.repeat(np.arange(n_rows), n_tok)
    offs = np.concatenate(([0], np.cumsum(n_tok)[:-1]))
    pos = np.arange(total) - offs[row_of]
    h = _splitmix64(base[row_of] + np.uint64(0x517CC1B7) * (pos.astype(np.uint64) + np.uint64(1)))
    kind = (h % np.uint64(100)).astype(np.int64)
    pick = _splitmix64(h)

    toks = np.empty(total, dtype=object)
    kw_mask = kind < 25
    # keyword pools differ per language: gather per lang
    for li, lang in enumerate(_LANGS):
        m = kw_mask & (lang_idx[row_of] == li)
        pool = _POOL_KW[lang]
        toks[m] = pool[(pick[m] % np.uint64(len(pool))).astype(np.int64)]
    m = (kind >= 25) & (kind < 50)
    toks[m] = _POOL_CAMEL[(pick[m] % np.uint64(len(_POOL_CAMEL))).astype(np.int64)]
    m = (kind >= 50) & (kind < 70)
    toks[m] = _POOL_SNAKE[(pick[m] % np.uint64(len(_POOL_SNAKE))).astype(np.int64)]
    m = (kind >= 70) & (kind < 85)
    toks[m] = _POOL_NOUN[(pick[m] % np.uint64(len(_POOL_NOUN))).astype(np.int64)]
    m = kind >= 85
    toks[m] = _POOL_NUM[(pick[m] % np.uint64(len(_POOL_NUM))).astype(np.int64)]

    contents = pd.Series(toks).groupby(row_of, sort=True).agg(" ".join).to_numpy()

    repo_id = ids // 50  # 50 files per repo; depends on id only (stable across batching)
    langs = np.array(_LANGS)[lang_idx]
    exts = np.array([_EXT[L] for L in _LANGS])[lang_idx]
    out = pd.DataFrame(
        {
            "repo": [f"org{r % 17}/repo{r}" for r in repo_id.tolist()],
            "path": [
                f"src/{_NOUNS[i % len(_NOUNS)]}/{_VERBS[i % len(_VERBS)]}_{i}.{e}"
                for i, e in zip(ids.tolist(), exts.tolist())
            ],
            "commit": [
                hashlib.sha1(f"c{seed}:{i}".encode()).hexdigest()[:12] for i in ids.tolist()
            ],
            "lang": langs,
            "content": contents,
        }
    )
    return out


def synthetic_corpus(
    spark: SparkSession,
    n_files: int = 2000,
    seed: int = 42,
    avg_tokens: int = 120,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic synthetic corpus of `n_files` code files.

    Generated with mapInPandas over spark.range so generation is distributed
    and row-deterministic (independent of partition count/order).
    """
    if avg_tokens < 2:
        # n_tok = avg//2 + h%avg: avg_tokens < 2 yields zero-token rows
        # whose contents vanish from the generator's groupby, crashing
        # the mapInPandas task with a length-mismatch mid-job
        raise ValueError("avg_tokens must be >= 2")
    parts = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_files, 1, parts)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _gen_rows(pdf["id"].to_numpy(), seed, avg_tokens)

    return base.mapInPandas(gen, CORPUS_SCHEMA)


def corpus_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the driver's `documents` test table to the corpus shape.

    doc_id/source/lang map onto path/repo/lang; content = text. Lets every
    index-engine query run against the shared /root/testdata tables.

    lat/lon: deterministic planted coordinates (pure doc_id arithmetic,
    reproducible in any SQL engine) — the geo-query substrate (ES
    geo_distance/geo_bounding_box over indexed geo_point fields; the
    reference indexes WKT cells as geo fields for exactly these queries).

    tags: deterministic planted array<string> metadata (doc_id modular
    arithmetic) — the ES array/nested-field substrate: multi-valued doc
    fields the reference's row->document fold produces from repeated
    column labels (multi-value fold cells), queried with terms/exists
    filter context over the array.

    emb: the driver's embeddings table joined on (vec_id == doc_id) — the
    ES dense_vector substrate for the `knn` DSL leaf and hybrid
    retrieval. Left join: docs past the embeddings table's cardinality
    carry NULL and are skipped by vector queries, like unmapped ES docs.

    rfeat: deterministic planted map<string,double> (doc_id modular
    arithmetic, re-derivable in any SQL engine) — the ES
    rank_features/sparse_vector substrate (ELSER-style weighted-token
    scoring).

    stored_query: deterministic planted two-term saved-query text — the
    ES percolator substrate (docs register queries; the `percolate` DSL
    leaf reverse-matches them against a supplied document).
    """
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("doc_id"), F.col("embedding").alias("emb")
    )
    d = d.join(e, "doc_id", "left")
    return d.select(
        F.col("source").alias("repo"),
        F.concat(F.lit("doc/"), F.col("doc_id").cast("string"), F.lit(".txt")).alias("path"),
        F.sha1(F.col("doc_id").cast("string")).substr(1, 12).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
        ((F.col("doc_id") * 7919) % 160 - 80 + F.lit(0.25)).cast("double").alias("lat"),
        ((F.col("doc_id") * 104729) % 360 - 180 + F.lit(0.25)).cast("double").alias("lon"),
        F.array(
            F.concat(F.lit("t"), (F.col("doc_id") % 5).cast("string")),
            F.concat(F.lit("t"), (F.col("doc_id") % 7).cast("string")),
        ).alias("tags"),
        # parent ref (ES join-field substrate): every 10th doc is a parent
        # (NULL ref), the rest point at their decade's parent by path —
        # pure doc_id arithmetic, re-derivable in any SQL engine
        F.when(
            F.col("doc_id") % 10 != 0,
            F.concat(
                F.lit("doc/"),
                (F.col("doc_id") - F.col("doc_id") % 10).cast("string"),
                F.lit(".txt"),
            ),
        ).alias("parent"),
        F.col("emb"),
        F.map_from_arrays(
            F.array(
                F.concat(F.lit("t"), (F.col("doc_id") % 5).cast("string")),
                F.concat(F.lit("q"), (F.col("doc_id") % 3).cast("string")),
            ),
            F.array(
                (F.lit(0.1) + (F.col("doc_id") % 13) / F.lit(13.0)).cast("double"),
                (F.lit(0.05) + (F.col("doc_id") % 7) / F.lit(7.0)).cast("double"),
            ),
        ).alias("rfeat"),
        # stored_query: deterministic planted two-term query text (pure
        # doc_id modular arithmetic over two disjoint vocabularies,
        # re-derivable in any SQL engine) — the ES percolator substrate:
        # each doc REGISTERS a saved query, and the `percolate` DSL leaf
        # matches the registered queries a supplied document satisfies.
        F.concat(
            F.element_at(
                F.array(
                    F.lit("spark"), F.lit("batch"), F.lit("merge"),
                    F.lit("filter"), F.lit("window"),
                ),
                (F.col("doc_id") % 5 + 1).cast("int"),
            ),
            F.lit(" "),
            F.element_at(
                F.array(
                    F.lit("join"), F.lit("scan"), F.lit("hash"), F.lit("sort")
                ),
                (F.col("doc_id") % 4 + 1).cast("int"),
            ),
        ).alias("stored_query"),
    )
