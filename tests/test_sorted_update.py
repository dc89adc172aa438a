"""ES sort-by-field search (`sort` clause) + _update_by_query analogue.

Sorted search must rank the match set by docs metadata with doc_id /
segment-recency tie-breaks and leave BM25 scores untouched; update_by_query
must rewrite exactly the matched source rows and reindex them atomically
(old versions tombstoned, new content searchable)."""

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

Q = "merge segment buffer"


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sortupd") / "idx")
    corpus = synthetic_corpus(spark, n_files=250, seed=61).cache()
    b = IndexBuilder(spark, d, partitions=4)
    b.reset()
    b.build(corpus, resume=False)
    extra = (
        synthetic_corpus(spark, n_files=40, seed=62)
        .withColumn("path", F.concat(F.lit("extra/"), F.col("path")))
        .withColumn("_optype", F.lit("create"))
    )
    apply_incremental(spark, d, extra)
    return d


def test_base_sorted_matches_manual_order(spark, idx):
    r = IndexReader(spark, idx)
    match = {row["doc_id"]: row["score"] for row in r.search_df(Q, k=None).collect()}
    docs = {
        row["doc_id"]: row["dl"]
        for row in spark.read.parquet(f"{idx}/docs").select("doc_id", "dl").collect()
    }
    expected = sorted(match, key=lambda d: (-docs[d], d))[:7]
    got = r.search_sorted_df(Q, sort=[("dl", "desc")], k=7).collect()
    assert [row["doc_id"] for row in got] == expected
    # scores ride along unchanged (ES track_scores)
    for row in got:
        assert row["score"] == pytest.approx(match[row["doc_id"]], rel=1e-12)
    assert [row["dl"] for row in got] == [docs[d] for d in expected]


def test_base_sorted_asc_and_filter(spark, idx):
    r = IndexReader(spark, idx)
    got = r.search_sorted_df(
        Q, sort=[("lang", "asc"), ("dl", "asc")], k=5, filter_sql="dl >= 40"
    ).collect()
    assert len(got) == 5
    keys = [(row["lang"], row["dl"], row["doc_id"]) for row in got]
    assert keys == sorted(keys)
    assert all(row["dl"] >= 40 for row in got)
    with pytest.raises(ValueError):
        r.search_sorted_df(Q, sort=[("nope", "desc")])


def test_incremental_sorted_spans_segments(spark, idx):
    ri = IncrementalIndexReader(spark, idx)
    match = {
        (row["segment"], row["doc_id"])
        for row in ri.search_df(Q, k=None).collect()
    }
    dls = {
        (row["segment"], row["doc_id"]): row["dl"]
        for row in ri.live_docs().select("segment", "doc_id", "dl").collect()
    }
    rank = {s: i for i, s in enumerate(ri.segments)}  # base=0, newest highest
    expected = sorted(match, key=lambda sd: (-dls[sd], -rank[sd[0]], sd[1]))[:9]
    got = [
        (row["segment"], row["doc_id"])
        for row in ri.search_sorted_df(Q, sort=[("dl", "desc")], k=9).collect()
    ]
    assert got == expected
    assert any(seg for seg, _d in got if seg) or any(
        seg for seg, _d in expected if seg
    )  # sanity: delta docs participate in the pool


def test_update_by_query_rewrites_matches(spark, idx, tmp_path):
    import shutil

    d = str(tmp_path / "upd_idx")
    shutil.copytree(idx, d)
    spark.catalog.clearCache()
    corpus = synthetic_corpus(spark, n_files=250, seed=61).cache()
    ri = IncrementalIndexReader(spark, d)
    uq = "buffer"
    before_live = ri.n_docs
    matched = ri.count(uq)
    assert matched > 0
    res = ri.update_by_query(
        uq, corpus, {"content": "concat(content, ' zqupdated')"}
    )
    # only base-segment keys exist in `corpus`; delta (extra/) matches have
    # no source row and are untouched — updated rows == matched base keys
    assert 0 < res["upserts"] <= matched
    assert res["tombstones"] == res["upserts"]
    ri2 = IncrementalIndexReader(spark, d)
    assert ri2.n_docs == before_live  # update replaces, never grows
    assert ri2.count("zqupdated") == res["upserts"]
    # updated docs still match the original query (content was appended)
    assert ri2.count(uq) == matched


def test_update_by_query_set_metadata_only(spark, idx, tmp_path):
    import shutil

    d = str(tmp_path / "upd_meta")
    shutil.copytree(idx, d)
    corpus = synthetic_corpus(spark, n_files=250, seed=61)
    ri = IncrementalIndexReader(spark, d)
    res = ri.update_by_query("buffer", corpus, {"lang": "'zz'"})
    ri2 = IncrementalIndexReader(spark, d)
    langs = {
        row["lang"]
        for row in ri2.search_sorted_df(
            "buffer", sort=[("lang", "asc")], k=None
        )
        .select("lang")
        .distinct()
        .collect()
    }
    assert "zz" in langs
    n_zz = ri2.live_docs().filter("lang = 'zz'").count()
    assert n_zz == res["upserts"]
