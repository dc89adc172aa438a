"""_rank_eval analogue: IR metrics (precision/recall/MRR/DCG/NDCG @k)
against brute-force Python re-computation from the same ranked runs."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.index import (
    IncrementalIndexReader,
    IndexBuilder,
    IndexReader,
    apply_incremental,
    rank_eval_df,
    rank_eval_metrics,
)
from elasticsearch_jdbc_spark.sources import synthetic_corpus

QUERIES = ["merge segment buffer", "hash join stream", "zzznohit qqq"]


@pytest.fixture()
def idx(spark, tmp_path):
    d = str(tmp_path / "idx")
    IndexBuilder(spark, d, partitions=4).build(
        synthetic_corpus(spark, n_files=140, seed=77), resume=False
    )
    return d


def _ratings(spark, n_docs, id_cols=("doc_id",)):
    rows = []
    for qid in range(len(QUERIES)):
        for d in range(n_docs):
            r = 2 if d % 5 == qid else (1 if d % 7 == qid else 0)
            if r:
                rows.append((qid, d, r))
    schema = f"query_id int, {id_cols[-1]} long, rating int"
    return spark.createDataFrame(rows, schema), {
        (q, d): r for q, d, r in rows
    }


def _brute(run_rows, rate_map, qid, k=10, thr=1):
    hits = sorted(
        [r for r in run_rows if r["query_id"] == qid],
        key=lambda r: (-r["score"], r["doc_id"]),
    )[:k]
    rated = [rate_map.get((qid, r["doc_id"]), 0) for r in hits]
    retrieved = len(hits)
    rel = sum(1 for x in rated if x >= thr)
    precision = rel / retrieved if retrieved else 0.0
    total_rel = sum(1 for (q, _d), x in rate_map.items() if q == qid and x >= thr)
    recall = rel / total_rel if total_rel else 0.0
    mrr = 0.0
    for i, x in enumerate(rated):
        if x >= thr:
            mrr = 1.0 / (i + 1)
            break
    dcg = sum(
        (2**x - 1) / math.log2(i + 2) for i, x in enumerate(rated)
    )
    ideal = sorted(
        [x for (q, _d), x in rate_map.items() if q == qid], reverse=True
    )[:k]
    idcg = sum((2**x - 1) / math.log2(i + 2) for i, x in enumerate(ideal))
    ndcg = dcg / idcg if idcg else 0.0
    return precision, recall, mrr, dcg, ndcg


def test_rank_eval_brute_parity(spark, idx):
    r = IndexReader(spark, idx)
    ratings, rate_map = _ratings(spark, r.n_docs)
    got = {
        x["query_id"]: x
        for x in rank_eval_df(r, QUERIES, ratings, k=10).collect()
    }
    assert set(got) == {0, 1, 2}
    run = r.msearch_df(QUERIES, k=10).collect()
    for qid in range(len(QUERIES)):
        p, rc, mrr, dcg, ndcg = _brute(run, rate_map, qid)
        g = got[qid]
        assert g["precision"] == pytest.approx(p, abs=1e-12)
        assert g["recall"] == pytest.approx(rc, abs=1e-12)
        assert g["mrr"] == pytest.approx(mrr, abs=1e-12)
        assert g["dcg"] == pytest.approx(dcg, rel=1e-9)
        assert g["ndcg"] == pytest.approx(ndcg, rel=1e-9)
    # the no-hit query reports a row of zeros
    z = got[2]
    assert (z["precision"], z["recall"], z["mrr"], z["dcg"], z["ndcg"]) == (
        0.0, 0.0, 0.0, 0.0, 0.0,
    ) or z["recall"] == 0.0


def test_rank_eval_incremental_identity(spark, idx):
    ri = IncrementalIndexReader(spark, idx)
    upd = (
        synthetic_corpus(spark, n_files=140, seed=77).limit(8)
        .withColumn("content", F.concat("content", F.lit(" merge buffer")))
        .withColumn("_optype", F.lit("update"))
    )
    apply_incremental(spark, idx, upd)
    ri = IncrementalIndexReader(spark, idx)
    run = ri.msearch_df(QUERIES[:2], k=10)
    id_cols = [c for c in run.columns if c not in ("query_id", "score")]
    assert "segment" in id_cols
    # rate the actual top hits so metrics are non-trivial
    top = run.collect()
    rows = [
        (t["query_id"], t["segment"], t["doc_id"], 1 + (t["doc_id"] % 2))
        for t in top[:6]
    ]
    ratings = spark.createDataFrame(
        rows, "query_id int, segment string, doc_id long, rating int"
    )
    out = rank_eval_metrics(run, ratings, k=10, query_ids=[0, 1]).collect()
    assert {x["query_id"] for x in out} == {0, 1}
    assert any(x["ndcg"] > 0 for x in out)
    for x in out:
        assert 0.0 <= x["ndcg"] <= 1.0 + 1e-12
        assert 0.0 <= x["precision"] <= 1.0


def test_rank_eval_validation(spark, idx):
    r = IndexReader(spark, idx)
    ratings, _ = _ratings(spark, 10)
    bad = r.msearch_df(QUERIES[:1], k=5).select("query_id", "score")
    with pytest.raises(ValueError, match="identity"):
        rank_eval_metrics(bad, ratings)
