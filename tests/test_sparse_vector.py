"""ES `sparse_vector` / `weighted_tokens` DSL leaf (index/dsl.py
_leaf_sparse_vector): weighted-token dot product over a
map<string,double> rank-features metadata column, brute-force model,
bool composition, live twin, validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.index import (
    IncrementalIndexReader,
    IndexBuilder,
    IndexReader,
)
from elasticsearch_jdbc_spark.sources import synthetic_corpus

QV = {"alpha": 2.0, "beta": 0.5, "missing": 3.0}


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sv") / "idx")
    corpus = synthetic_corpus(spark, n_files=120, seed=9).withColumn(
        "rfeat",
        F.map_from_arrays(
            F.array(
                F.when(F.crc32("path") % 2 == 0, F.lit("alpha")).otherwise(
                    F.lit("gamma")
                ),
                F.lit("beta"),
            ),
            F.array(
                ((F.crc32("path") % 100) / F.lit(50.0)).cast("double"),
                ((F.crc32("path") % 7) / F.lit(7.0)).cast("double"),
            ),
        ),
    )
    IndexBuilder(spark, d, partitions=4).build(corpus, resume=False)
    r = IndexReader(spark, d)
    docs = spark.read.parquet(f"{d}/docs").collect()
    return d, r, docs


def _brute(docs, qv):
    out = {}
    for x in docs:
        m = x["rfeat"] or {}
        s = sum(w * m.get(t, 0.0) for t, w in qv.items())
        if s > 0:
            out[x["doc_id"]] = s
    return out


def test_sparse_vector_brute_parity(spark, setup):
    d, r, docs = setup
    got = {
        x["doc_id"]: x["score"]
        for x in r.search_dsl_df(
            {"sparse_vector": {"field": "rfeat", "query_vector": QV}}, k=None
        ).collect()
    }
    want = _brute(docs, QV)
    assert set(got) == set(want) and want
    for i, s in want.items():
        assert got[i] == pytest.approx(s, rel=1e-12)
    # zero-overlap docs (gamma-only with beta weight 0) must be excluded
    assert len(want) < len(docs)


def test_weighted_tokens_alias_and_boost(spark, setup):
    d, r, docs = setup
    a = r.search_dsl_df(
        {"weighted_tokens": {"field": "rfeat", "query_vector": QV, "boost": 2.0}},
        k=5,
    ).collect()
    b = r.search_dsl_df(
        {"sparse_vector": {"field": "rfeat", "query_vector": QV}}, k=5
    ).collect()
    assert [x["doc_id"] for x in a] == [x["doc_id"] for x in b]
    for x, y in zip(a, b):
        assert x["score"] == pytest.approx(2.0 * y["score"], rel=1e-12)


def test_sparse_vector_in_bool_and_live_twin(spark, setup):
    """hybrid: BM25 must + sparse_vector should — scores add for docs in
    the rank-features match set."""
    d, r, docs = setup
    body = {
        "bool": {
            "must": [{"match": {"content": "merge"}}],
            "should": [{"sparse_vector": {"field": "rfeat", "query_vector": QV}}],
        }
    }
    hybrid = {
        x["doc_id"]: x["score"]
        for x in r.search_dsl_df(body, k=None).collect()
    }
    bm25 = {x["doc_id"]: x["score"] for x in r.match_df("merge").collect()}
    sv = _brute(docs, QV)
    assert set(hybrid) == set(bm25)
    for i in hybrid:
        assert hybrid[i] == pytest.approx(bm25[i] + sv.get(i, 0.0), rel=1e-9)
    ri = IncrementalIndexReader(spark, d)
    live = ri.search_dsl_df(body, k=7).collect()
    base = r.search_dsl_df(body, k=7).collect()
    assert [(x["doc_id"], round(x["score"], 9)) for x in live] == [
        (x["doc_id"], round(x["score"], 9)) for x in base
    ]


def test_sparse_vector_validation(spark, setup):
    d, r, _ = setup
    with pytest.raises(ValueError, match="unknown rank-features column"):
        r.search_dsl_df(
            {"sparse_vector": {"field": "nope", "query_vector": QV}}
        )
    with pytest.raises(ValueError, match="non-empty query_vector"):
        r.search_dsl_df({"sparse_vector": {"field": "rfeat"}})
