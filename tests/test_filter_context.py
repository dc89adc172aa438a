"""ES filter context (the bool-query `filter` clause: non-scoring,
prune-only) + search_after on the bool/phrase surfaces — both readers.
The filtered result must equal the unfiltered result intersected with the
predicate's doc set, with SCORES UNCHANGED (filter context never scores)."""

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
    d = str(tmp_path_factory.mktemp("fctx") / "idx")
    corpus = synthetic_corpus(spark, n_files=250, seed=51).cache()
    b = IndexBuilder(spark, d, partitions=4, with_positions=True)
    b.reset()
    b.build(corpus, resume=False)
    extra = (
        synthetic_corpus(spark, n_files=50, seed=52)
        .withColumn("path", F.concat(F.lit("extra/"), F.col("path")))
        .withColumn("_optype", F.lit("create"))
    )
    apply_incremental(spark, d, extra)
    return d


def test_base_filter_prunes_without_rescoring(spark, idx):
    r = IndexReader(spark, idx)
    full = {row["doc_id"]: row["score"] for row in r.search_df(Q, k=None).collect()}
    java_ids = {
        row["doc_id"] for row in r._filter_doc_ids("lang = 'java'").collect()
    }
    got = {
        row["doc_id"]: row["score"]
        for row in r.search_df(Q, k=None, filter_sql="lang = 'java'").collect()
    }
    assert set(got) == set(full) & java_ids and got
    for d, s in got.items():
        assert s == pytest.approx(full[d], rel=1e-12)
    # count + facet agree with the pruned set
    assert r.count(Q, filter_sql="lang = 'java'") == len(got)
    fac = r.facet_df(Q, by="lang", filter_sql="lang = 'java'").collect()
    assert [row["lang"] for row in fac] == ["java"]
    assert fac[0]["n_docs"] == len(got)


def test_incremental_filter_spans_segments(spark, idx):
    r = IncrementalIndexReader(spark, idx)
    full = {
        (row["segment"], row["doc_id"]): row["score"]
        for row in r.search_df(Q, k=None).collect()
    }
    pred = "dl >= 60"
    keep = {
        (row["segment"], row["doc_id"])
        for row in r._filter_docs(pred).collect()
    }
    got = {
        (row["segment"], row["doc_id"]): row["score"]
        for row in r.search_df(Q, k=None, filter_sql=pred).collect()
    }
    assert set(got) == set(full) & keep
    assert any(seg for (seg, _d) in got if seg)  # delta docs filtered too
    assert r.count(Q, filter_sql=pred) == len(got)
    assert r.delete_by_query.__defaults__  # filter_sql plumbed (signature)


def test_bool_search_after_pagination(spark, idx):
    r = IndexReader(spark, idx)
    kw = dict(must="merge", should="buffer stream")
    full = [tuple(x) for x in r.search_bool_df(**kw, k=9).collect()]
    pages, cursor = [], None
    while len(pages) < len(full):
        page = [
            tuple(x)
            for x in r.search_bool_df(**kw, k=3, search_after=cursor).collect()
        ]
        if not page:
            break
        pages += page
        cursor = (page[-1][1], page[-1][0])  # (score, doc_id)
    assert pages == full

    ri = IncrementalIndexReader(spark, idx)
    ifull = [tuple(x) for x in ri.search_bool_df(**kw, k=9).collect()]
    page1 = [tuple(x) for x in ri.search_bool_df(**kw, k=4).collect()]
    last = page1[-1]
    page2 = [
        tuple(x)
        for x in ri.search_bool_df(
            **kw, k=5, search_after=(last[2], last[0], last[1])
        ).collect()
    ]
    assert page1 + page2 == ifull


def test_phrase_search_after_and_filter(spark, idx):
    ri = IncrementalIndexReader(spark, idx)
    full = [tuple(x) for x in ri.search_phrase_df("merge segment", k=8).collect()]
    if len(full) >= 2:
        last = full[1]
        rest = [
            tuple(x)
            for x in ri.search_phrase_df(
                "merge segment", k=8, search_after=(last[2], last[0], last[1])
            ).collect()
        ]
        # rest refills to k=8 past the cursor, so it extends BEYOND the
        # unpaginated k=8 horizon — compare on the overlapping prefix
        assert rest[: len(full) - 2] == full[2:]
    filtered = [
        tuple(x)
        for x in ri.search_phrase_df(
            "merge segment", k=8, filter_sql="lang = 'java'"
        ).collect()
    ]
    keep = {
        (row["segment"], row["doc_id"])
        for row in ri._filter_docs("lang = 'java'").collect()
    }
    assert all((seg, d) in keep for seg, d, _s in filtered)
    # the filtered ranking's head must agree with the unfiltered ranking
    # restricted to the predicate (deeper filtered hits may lie past the
    # unfiltered k=8 horizon, so compare on the common prefix)
    expected_prefix = [t for t in full if (t[0], t[1]) in keep]
    assert filtered[: len(expected_prefix)] == expected_prefix


def test_base_stats(spark, idx):
    r = IndexReader(spark, idx)
    st = r.stats()
    assert st["n_segments"] == 1 and st["n_docs"] == r.n_docs
    assert st["with_positions"] is True and st["n_terms"] > 0


def test_term_and_terms_on_array_metadata(spark, tmp_path):
    """ES keyword-array semantics through the term/terms leaves: a
    multi-valued metadata field matches when ANY element equals the term
    (term -> array_contains, terms -> arrays_overlap) — previously a
    Catalyst type-mismatch error."""
    from elasticsearch_jdbc_spark.index import IndexBuilder, IndexReader

    d = str(tmp_path / "arr")
    docs = [
        ("r", "0", "c", "t", "pad", ["red", "blue"]),
        ("r", "1", "c", "t", "pad", ["green"]),
        ("r", "2", "c", "t", "pad", []),
        ("r", "3", "c", "t", "pad", None),
        ("r", "4", "c", "t", "pad", ["blue", "black"]),
    ]
    IndexBuilder(spark, d, partitions=2).build(
        spark.createDataFrame(
            docs,
            "repo string, path string, commit string, lang string,"
            " content string, tags array<string>",
        ),
        resume=False,
    )
    r = IndexReader(spark, d)
    m = {
        x["doc_id"]: x["path"]
        for x in spark.read.parquet(f"{d}/docs").collect()
    }

    def paths(body):
        return sorted(
            m[x["doc_id"]]
            for x in r.search_dsl_df(body, k=None).collect()
        )

    assert paths({"term": {"tags": "blue"}}) == ["0", "4"]
    assert paths({"term": {"tags": "nope"}}) == []
    assert paths({"terms": {"tags": ["green", "black"]}}) == ["1", "4"]
    # composes in filter context (the flat-bool fast path included)
    assert paths({"bool": {
        "must": [{"match": {"content": "pad"}}],
        "filter": [{"term": {"tags": "blue"}}],
    }}) == ["0", "4"]
