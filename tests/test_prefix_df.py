"""Distributed prefix query (search_prefix_df): rank-identical to the
driver-side search_prefix on both readers, cursor + filter context wired."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.index import (
    IncrementalIndexReader,
    IndexBuilder,
    IndexReader,
    apply_incremental,
)
from elasticsearch_jdbc_spark.sources import synthetic_corpus


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pfx") / "idx")
    corpus = synthetic_corpus(spark, n_files=220, seed=91).cache()
    IndexBuilder(spark, d, partitions=4).build(corpus, resume=False)
    extra = (
        synthetic_corpus(spark, n_files=40, seed=92)
        .withColumn("path", F.concat(F.lit("extra/"), F.col("path")))
        .withColumn("_optype", F.lit("create"))
    )
    apply_incremental(spark, d, extra)
    return d


def test_base_rank_identity(spark, idx):
    r = IndexReader(spark, idx)
    driver = r.search_prefix("mer seg", k=8, min_should_match=2)
    dist = [
        (row["doc_id"], row["score"])
        for row in r.search_prefix_df("mer seg", k=8, min_should_match=2).collect()
    ]
    assert [d for d, _s in dist] == [d for d, _s in driver]
    for (dd, ds), (gd, gs) in zip(driver, dist):
        assert gs == pytest.approx(ds, rel=1e-9)


def test_base_empty_and_filter(spark, idx):
    r = IndexReader(spark, idx)
    assert r.search_prefix_df("zzzzqqq", k=5).count() == 0
    got = r.search_prefix_df("mer", k=None, filter_sql="lang = 'java'").collect()
    keep = {row["doc_id"] for row in r._filter_doc_ids("lang = 'java'").collect()}
    assert got and all(row["doc_id"] in keep for row in got)


def test_base_fuzzy_rank_identity(spark, idx):
    r = IndexReader(spark, idx)
    driver = r.search_fuzzy("emrge bufer", k=8, fuzziness=2)
    dist = [
        (row["doc_id"], row["score"])
        for row in r.search_fuzzy_df("emrge bufer", k=8, fuzziness=2).collect()
    ]
    assert [d for d, _s in dist] == [d for d, _s in driver] and dist
    for (dd, ds), (gd, gs) in zip(driver, dist):
        assert gs == pytest.approx(ds, rel=1e-9)
    assert r.search_fuzzy_df("qqqqqqqqqq", k=5, fuzziness=1).count() == 0


def test_incremental_fuzzy_rank_identity(spark, idx):
    ri = IncrementalIndexReader(spark, idx)
    driver = ri.search_fuzzy("emrge", k=9, fuzziness=2)
    dist = [
        (row["segment"], row["doc_id"], row["score"])
        for row in ri.search_fuzzy_df("emrge", k=9, fuzziness=2).collect()
    ]
    assert [(s, d) for s, d, _ in dist] == [(s, d) for s, d, _ in driver] and dist
    for (_, _, ds), (_, _, gs) in zip(driver, dist):
        assert gs == pytest.approx(ds, rel=1e-9)


def test_incremental_rank_identity(spark, idx):
    ri = IncrementalIndexReader(spark, idx)
    driver = ri.search_prefix("mer", k=9)
    dist = [
        (row["segment"], row["doc_id"], row["score"])
        for row in ri.search_prefix_df("mer", k=9).collect()
    ]
    assert [(s, d) for s, d, _ in dist] == [(s, d) for s, d, _ in driver]
    for (_, _, ds), (_, _, gs) in zip(driver, dist):
        assert gs == pytest.approx(ds, rel=1e-9)
    assert any(s for s, _d, _s in dist)  # delta docs reachable
