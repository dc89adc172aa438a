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


def _gen_rows(ids: np.ndarray, seed: int, avg_tokens: int) -> pd.DataFrame:
    """Generate one corpus row per id. Deterministic in (id, seed) only."""
    out = {k: [] for k in ("repo", "path", "commit", "lang", "content")}
    for i in ids.tolist():
        rng = np.random.default_rng(seed * 1_000_003 + i)
        repo_id = i % max(1, len(ids) // 50 + 20)
        lang = _LANGS[int(rng.integers(len(_LANGS)))]
        n_tok = int(avg_tokens // 2 + rng.integers(avg_tokens))
        kw = _KEYWORDS[lang]
        words = []
        for _ in range(n_tok):
            r = rng.random()
            v = _VERBS[int(rng.integers(len(_VERBS)))]
            n = _NOUNS[int(rng.integers(len(_NOUNS)))]
            if r < 0.25:
                words.append(kw[int(rng.integers(len(kw)))])
            elif r < 0.50:  # camelCase identifier
                words.append(v + n.capitalize())
            elif r < 0.70:  # snake_case identifier
                words.append(f"{v}_{n}")
            elif r < 0.85:
                words.append(n)
            else:
                words.append(f"{n}{int(rng.integers(100))}")
        content = " ".join(words)
        commit = hashlib.sha1(f"c{seed}:{i}".encode()).hexdigest()[:12]
        out["repo"].append(f"org{repo_id % 17}/repo{repo_id}")
        out["path"].append(f"src/{_NOUNS[i % len(_NOUNS)]}/{_VERBS[i % len(_VERBS)]}_{i}.{_EXT[lang]}")
        out["commit"].append(commit)
        out["lang"].append(lang)
        out["content"].append(content)
    return pd.DataFrame(out)


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
    """
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        F.col("source").alias("repo"),
        F.concat(F.lit("doc/"), F.col("doc_id").cast("string"), F.lit(".txt")).alias("path"),
        F.sha1(F.col("doc_id").cast("string")).substr(1, 12).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )
