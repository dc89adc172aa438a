"""Hot-term skew evidence (the north rule's 'partitioning/shuffle/skew
handled explicitly'): a term present in EVERY document must not collapse
onto a single reducer/file — the merge phase re-clusters encoded blocks by
(term, block_id) ranges, so a hot term's blocks spread across partitions at
block granularity."""

from __future__ import annotations

import os

import pyarrow.dataset as ds
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.index import IndexBuilder, IndexReader


@pytest.fixture(scope="module")
def skewed_idx(spark, tmp_path_factory):
    """2048 docs, every one containing the hot term 'ubiquitous'; filler
    terms are doc-specific."""
    idx = str(tmp_path_factory.mktemp("skew") / "idx")
    df = spark.range(0, 2048, 1, 8).select(
        F.lit("r").alias("repo"),
        F.concat(F.lit("f"), F.col("id")).alias("path"),
        F.lit("c0").alias("commit"),
        F.lit("py").alias("lang"),
        F.concat(
            F.lit("ubiquitous common shared "),
            F.concat_ws(" ", *[
                F.concat(F.lit(f"w{j}_"), (F.col("id") % (17 + j)).cast("string"))
                for j in range(8)
            ]),
        ).alias("content"),
    )
    b = IndexBuilder(spark, idx, partitions=16, block_size=64)
    b.reset()
    b.build(df, resume=False)
    return idx


def test_hot_term_blocks_spread_across_files(spark, skewed_idx):
    postings = os.path.join(skewed_idx, "postings")
    files = [f for f in os.listdir(postings) if f.endswith(".parquet")]
    # which files contain rows of the hot term?
    holding = []
    total_rows = 0
    for fn in files:
        t = pq.read_table(
            os.path.join(postings, fn), columns=["term", "n"],
            filters=[("term", "=", "ubiquitous")],
        )
        if t.num_rows:
            holding.append(fn)
            total_rows += t.num_rows
    # 2048 docs / 64-doc blocks (+ alignment padding) => >= 32 block rows
    assert total_rows >= 32
    assert len(holding) >= 2, (
        "hot term's blocks must span multiple range partitions "
        f"(found all {total_rows} rows in {holding})"
    )


def test_hot_term_no_single_reducer_row_explosion(spark, skewed_idx):
    """Every partition's share of the hot term is bounded by block
    granularity — no file holds more than ~half the hot blocks."""
    postings = os.path.join(skewed_idx, "postings")
    counts = []
    for fn in os.listdir(postings):
        if not fn.endswith(".parquet"):
            continue
        t = pq.read_table(
            os.path.join(postings, fn), columns=["term"],
            filters=[("term", "=", "ubiquitous")],
        )
        counts.append(t.num_rows)
    total = sum(counts)
    assert max(counts) < total, "one file holds every hot-term block"


def test_hot_term_query_correct(spark, skewed_idx):
    r = IndexReader(spark, skewed_idx)
    hits = r.search("ubiquitous", k=5)
    assert len(hits) == 5
    # df == n_docs for the hot term -> idf is the minimum positive value
    t = (
        ds.dataset(os.path.join(skewed_idx, "terms"), format="parquet")
        .to_table(filter=ds.field("term") == "ubiquitous")
    )
    assert t.column("df").to_pylist() == [2048]
