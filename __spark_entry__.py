"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship: build the inverted index over the sf0.001
                  documents corpus and run a BM25 search distributed.
queries()       — one entry per implemented operator (SURVEY.md §2),
                  implemented in elasticsearch_jdbc_spark.plans.registry.
oracle_sql()    — DuckDB-equivalent SQL for each (omitted only for
                  genuinely non-SQL-expressible ops: LSH banding, simhash
                  bit tricks, xxhash fingerprints -> rows-only check).
"""

from __future__ import annotations

import os
import sys
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from elasticsearch_jdbc_spark.plans.registry import ORACLE_SQL, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: corpus -> inverted index (resumable phased build) ->
    distributed BM25 top-k."""
    from elasticsearch_jdbc_spark.index import IndexBuilder, IndexReader
    from elasticsearch_jdbc_spark.sources import corpus_from_documents

    sf_dir = os.environ.get("SPARK_GRAFT_ENTRY_SF_DIR", "/root/testdata/sf0.001")
    corpus = corpus_from_documents(spark, sf_dir)
    idx_dir = os.path.join(tempfile.gettempdir(), "entry_idx")
    builder = IndexBuilder(spark, idx_dir, partitions=8)
    builder.reset()
    builder.build(corpus)
    reader = IndexReader(spark, idx_dir)
    return reader.search_df("fast key merge sort", k=10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
