"""Moderate-scale (20k-doc) equivalence properties for the round-4
scoring surfaces: on a SINGLE-field fields index, both combined_fields
(any df_mode — one field makes max-field and exact dfs coincide) and
best_fields (any tie_breaker — max over one field IS that field) must be
score-identical to plain BM25 search_df over a plain index of the same
corpus. Catches scale-dependent drift (block boundaries, partial-agg
ordering, idf provenance) that 5-doc fixtures cannot."""

from __future__ import annotations

import pytest

from elasticsearch_jdbc_spark.index import IndexBuilder, IndexReader
from elasticsearch_jdbc_spark.sources import synthetic_corpus

N_DOCS = 20_000
Q = "merge segment buffer index"


@pytest.fixture(scope="module")
def pair(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("sceq")
    corpus = synthetic_corpus(spark, n_files=N_DOCS, seed=7).cache()
    plain = str(root / "plain")
    IndexBuilder(spark, plain, partitions=8).build(corpus, resume=False)
    fidx = str(root / "fields")
    IndexBuilder(spark, fidx, partitions=8, fields=["content"]).build(
        corpus, resume=False
    )
    corpus.unpersist()
    return IndexReader(spark, plain), IndexReader(spark, fidx)


def _scores(rows):
    return {r["doc_id"]: r["score"] for r in rows}


def test_combined_fields_degenerates_to_bm25(spark, pair):
    plain, fields = pair
    want = _scores(plain.search_df(Q, k=None).collect())
    for mode in ("max_field", "exact"):
        got = _scores(fields.search_combined_df(Q, k=None, df_mode=mode).collect())
        assert len(got) == len(want) and len(got) > 100
        for d, s in want.items():
            assert got[d] == pytest.approx(s, rel=1e-9), (mode, d)


def test_best_fields_degenerates_to_bm25(spark, pair):
    plain, fields = pair
    want = _scores(plain.search_df(Q, k=None).collect())
    got = _scores(
        fields.search_best_fields_df(Q, k=None, tie_breaker=0.7).collect()
    )
    assert len(got) == len(want)
    for d, s in want.items():
        assert got[d] == pytest.approx(s, rel=1e-9)


def test_msm_consistent_across_surfaces(spark, pair):
    plain, fields = pair
    for msm in (2, 4):
        a = {r["doc_id"] for r in plain.search_df(Q, k=None, min_should_match=msm).collect()}
        b = {r["doc_id"] for r in fields.search_combined_df(Q, k=None, min_should_match=msm).collect()}
        c = {r["doc_id"] for r in fields.search_best_fields_df(Q, k=None, min_should_match=msm).collect()}
        assert a == b == c and a
