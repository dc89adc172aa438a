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


def test_expand_wildcard_matches_fnmatch(spark, idx):
    import fnmatch
    import os

    import pyarrow.dataset as ds

    r = IndexReader(spark, idx)
    vocab = (
        ds.dataset(os.path.join(idx, "terms"), format="parquet")
        .to_table(columns=["term"])
        .column("term")
        .to_pylist()
    )
    for pat in ("mer*", "*ge", "s?g*", "zz*", "m?rge"):
        got = r.expand_wildcard(pat, limit=1000)
        want = sorted(t for t in vocab if fnmatch.fnmatch(t, pat))
        assert got == want, pat


def test_wildcard_df_both_readers(spark, idx):
    r = IndexReader(spark, idx)
    hits = r.search_wildcard_df("mer*", k=None).collect()
    # every doc matching 'merge...' terms must be a hit of the terms union
    exp = set(r.expand_wildcard("mer*", 1000))
    manual = {row["doc_id"] for row in r.search_terms_df(sorted(exp), k=None).collect()}
    assert {row["doc_id"] for row in hits} == manual and hits
    assert r.search_wildcard_df("zzq*", k=5).count() == 0
    ri = IncrementalIndexReader(spark, idx)
    live = ri.search_wildcard_df("mer*", k=12).collect()
    assert live and any(row["segment"] for row in live)
    # two patterns + min_should_match=2: both groups must match
    both = ri.search_wildcard_df("mer* seg*", k=None, min_should_match=2)
    one = ri.search_wildcard_df("mer* seg*", k=None, min_should_match=1)
    assert 0 < both.count() <= one.count()


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

def test_expand_regexp_matches_fullmatch(spark, idx):
    import os
    import re

    import pyarrow.dataset as ds

    r = IndexReader(spark, idx)
    vocab = (
        ds.dataset(os.path.join(idx, "terms"), format="parquet")
        .to_table(columns=["term"])
        .column("term")
        .to_pylist()
    )
    # quantifier cases exercise the prefix cut dropping the bound literal
    for pat in ("mer.*", ".*ge", "s[ei]g.*", "m[ae]rge", "merges?", "zzq.*"):
        got = r.expand_regexp(pat, limit=100000)
        want = sorted(t for t in vocab if re.fullmatch(pat, t))
        assert got == want, pat


def test_regexp_df_both_readers(spark, idx):
    r = IndexReader(spark, idx)
    hits = r.search_regexp_df("mer.*", k=None).collect()
    exp = set(r.expand_regexp("mer.*", 1000))
    manual = {row["doc_id"] for row in r.search_terms_df(sorted(exp), k=None).collect()}
    assert {row["doc_id"] for row in hits} == manual and hits
    # anchored: "erg" alone must NOT match "merge"
    assert r.expand_regexp("erg", limit=100) == []
    assert r.search_regexp_df("zzq.*", k=5).count() == 0
    ri = IncrementalIndexReader(spark, idx)
    live = ri.search_regexp_df("mer.*", k=12).collect()
    assert live and any(row["segment"] for row in live)
    # regexp expansion must agree with the wildcard twin on the same shape
    assert set(r.expand_regexp("mer.*", 1000)) == set(r.expand_wildcard("mer*", 1000))
