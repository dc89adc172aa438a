"""Reciprocal Rank Fusion (hybrid retrieval combine): brute-force model
parity, weights, per-query partitioned cuts, tie determinism, validation.
"""

from __future__ import annotations

import pytest

from elasticsearch_jdbc_spark.operators.similarity import rrf_fuse


def _brute(lists: list[dict], rank_k=60, weights=None) -> dict:
    out: dict = {}
    for i, lst in enumerate(lists):
        w = weights[i] if weights else 1.0
        for key, rank in lst.items():
            s, n = out.get(key, (0.0, 0))
            out[key] = (s + w / (rank_k + rank), n + 1)
    return out


def test_rrf_brute_parity_and_ties(spark):
    # doc 30: rank 2 in A only; doc 40: rank 2 in B only -> exact tie,
    # broken by doc_id
    a = {10: 1, 30: 2, 50: 3}
    b = {10: 1, 40: 2, 60: 3}
    dfa = spark.createDataFrame([(d, r) for d, r in a.items()], "doc_id long, rank int")
    dfb = spark.createDataFrame([(d, r) for d, r in b.items()], "doc_id long, rank int")
    got = rrf_fuse([dfa, dfb], ["doc_id"], k=10).collect()
    want = _brute([a, b])
    assert {r["doc_id"]: (r["rrf_score"], r["n_rankers"]) for r in got} == {
        d: (pytest.approx(s, rel=1e-12), n) for d, (s, n) in want.items()
    }
    order = [r["doc_id"] for r in sorted(got, key=lambda r: r["fused_rank"])]
    # 10 first (both lists), then the 30/40 tie breaks on doc_id
    assert order[0] == 10 and order.index(30) < order.index(40)


def test_rrf_weights_and_rank_k(spark):
    a = {1: 1, 2: 2}
    b = {2: 1, 3: 2}
    dfa = spark.createDataFrame(list(a.items()), "doc_id long, rank int")
    dfb = spark.createDataFrame(list(b.items()), "doc_id long, rank int")
    got = {
        r["doc_id"]: r["rrf_score"]
        for r in rrf_fuse(
            [dfa, dfb], ["doc_id"], k=10, rank_k=10, weights=[2.0, 0.5]
        ).collect()
    }
    want = _brute([a, b], rank_k=10, weights=[2.0, 0.5])
    assert got == {d: pytest.approx(s, rel=1e-12) for d, (s, _) in want.items()}


def test_rrf_per_query_cut(spark):
    rows = [(q, d, r) for q in (0, 1) for r, d in enumerate([10 + q, 20 + q, 30 + q], 1)]
    df = spark.createDataFrame(rows, "query_id long, doc_id long, rank int")
    got = rrf_fuse([df], ["query_id", "doc_id"], k=2, per=["query_id"]).collect()
    by_q: dict = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["fused_rank"], r["doc_id"]))
    assert by_q == {
        0: [(1, 10), (2, 20)],
        1: [(1, 11), (2, 21)],
    }


def test_rrf_validation(spark):
    df = spark.createDataFrame([(1, 1)], "doc_id long, rank int")
    with pytest.raises(ValueError):
        rrf_fuse([], ["doc_id"])
    with pytest.raises(ValueError):
        rrf_fuse([df], ["doc_id"], weights=[1.0, 2.0])
    with pytest.raises(ValueError):
        rrf_fuse([df], ["doc_id"], rank_k=0)
    with pytest.raises(ValueError):
        rrf_fuse([df], ["doc_id"], per=["query_id"])
