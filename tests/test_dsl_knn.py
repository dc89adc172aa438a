"""ES `knn` DSL leaf (index/dsl.py:_leaf_knn): exact top-k cosine over an
embedding metadata column, scored (1+cos)/2 like ES's cosine similarity,
with pre-filter semantics and hybrid bool composition. Brute-force model
computed in plain Python from the docs parquet."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.index import (
    IncrementalIndexReader,
    IndexBuilder,
    IndexReader,
)
from elasticsearch_jdbc_spark.sources import synthetic_corpus

DIMS = 4
QV = [0.25, -0.5, 0.75, 0.1]


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dslknn") / "idx")
    corpus = synthetic_corpus(spark, n_files=120, seed=77).withColumn(
        "emb",
        F.array(
            *[
                ((F.xxhash64("path", F.lit(i)) % 1000) / F.lit(1000.0)).cast(
                    "double"
                )
                for i in range(DIMS)
            ]
        ),
    )
    IndexBuilder(spark, d, partitions=4).build(corpus, resume=False)
    r = IndexReader(spark, d)
    docs = spark.read.parquet(f"{d}/docs").collect()
    return d, r, docs


def _knn_score(emb, qv):
    dot = sum(a * b for a, b in zip(emb, qv))
    na = math.sqrt(sum(a * a for a in emb))
    nb = math.sqrt(sum(b * b for b in qv))
    return (1.0 + dot / (na * nb)) / 2.0


def _brute(docs, qv, k, pred=None):
    scored = [
        (_knn_score(x["emb"], qv), x["doc_id"])
        for x in docs
        if x["emb"] is not None and (pred is None or pred(x))
    ]
    scored.sort(key=lambda t: (-t[0], t[1]))
    return scored[:k]


def test_knn_brute_parity(spark, setup):
    d, r, docs = setup
    got = r.search_dsl_df(
        {"knn": {"field": "emb", "query_vector": QV, "k": 7}}, k=7
    ).collect()
    want = _brute(docs, QV, 7)
    assert [x["doc_id"] for x in got] == [i for _, i in want]
    for row, (s, _) in zip(got, want):
        assert row["score"] == pytest.approx(s, rel=1e-9)


def test_knn_prefilter_semantics(spark, setup):
    """filter restricts the corpus BEFORE the k-cut (ES knn.filter): every
    hit matches the filter and the ranking equals brute force over the
    filtered subset — not a post-filter of the unfiltered top-k."""
    d, r, docs = setup
    term = "merge"
    body = {
        "knn": {
            "field": "emb",
            "query_vector": QV,
            "k": 5,
            "filter": {"match": {"content": term}},
        }
    }
    got = r.search_dsl_df(body, k=5).collect()
    match_ids = {
        x["doc_id"] for x in r.match_df(term).collect()
    }
    want = _brute(docs, QV, 5, pred=lambda x: x["doc_id"] in match_ids)
    assert [x["doc_id"] for x in got] == [i for _, i in want]
    # pre-filter must differ from the unfiltered cut for the test to bite
    assert [i for _, i in want] != [i for _, i in _brute(docs, QV, 5)]


def test_knn_hybrid_bool_should(spark, setup):
    """bool.should [bm25, knn] sums scores for docs in both match sets —
    the ES hybrid-retrieval composition."""
    d, r, docs = setup
    knn_body = {"knn": {"field": "emb", "query_vector": QV, "k": 30}}
    body = {
        "bool": {
            "should": [{"match": {"content": "merge"}}, knn_body],
        }
    }
    hybrid = {x["doc_id"]: x["score"] for x in r.search_dsl_df(body, k=None).collect()}
    bm25 = {x["doc_id"]: x["score"] for x in r.match_df("merge").collect()}
    knn = {i: s for s, i in _brute(docs, QV, 30)}
    want: dict = {}
    for i, s in bm25.items():
        want[i] = want.get(i, 0.0) + s
    for i, s in knn.items():
        want[i] = want.get(i, 0.0) + s
    assert set(hybrid) == set(want)
    both = [i for i in hybrid if i in bm25 and i in knn]
    assert both, "fixture must produce overlap for the sum check to bite"
    for i in hybrid:
        assert hybrid[i] == pytest.approx(want[i], rel=1e-9)


def test_knn_boost_and_live_twin(spark, setup):
    d, r, docs = setup
    body = {"knn": {"field": "emb", "query_vector": QV, "k": 6, "boost": 2.5}}
    base = r.search_dsl_df(body, k=6).collect()
    want = _brute(docs, QV, 6)
    for row, (s, _) in zip(base, want):
        assert row["score"] == pytest.approx(2.5 * s, rel=1e-9)
    ri = IncrementalIndexReader(spark, d)
    live = ri.search_dsl_df(body, k=6).collect()
    assert [(x["doc_id"], round(x["score"], 9)) for x in live] == [
        (x["doc_id"], round(x["score"], 9)) for x in base
    ]


def test_knn_unknown_field_raises(spark, setup):
    d, r, _ = setup
    with pytest.raises(ValueError, match="unknown embedding column"):
        r.search_dsl_df(
            {"knn": {"field": "nope", "query_vector": QV, "k": 3}}, k=3
        )


def _ranks(scores: dict, window: int) -> dict:
    order = sorted(scores, key=lambda i: (-scores[i], i))[:window]
    return {i: r for r, i in enumerate(order, 1)}


def test_rrf_retriever_parity(spark, setup):
    """ES 8 `retriever.rrf` body: BM25 standard + knn fused with RRF —
    hand model sums 1/(rank_constant + rank) over the two window-deep
    rankings."""
    d, r, docs = setup
    window, const = 25, 60
    body = {
        "retriever": {
            "rrf": {
                "retrievers": [
                    {"standard": {"query": {"match": {"content": "merge"}}}},
                    {"knn": {"field": "emb", "query_vector": QV, "k": window}},
                ],
                "rank_window_size": window,
                "rank_constant": const,
            }
        }
    }
    got = r.search_dsl_df(body, k=10).collect()
    bm25 = _ranks(
        {x["doc_id"]: x["score"] for x in r.match_df("merge").collect()}, window
    )
    knn = _ranks({i: s for s, i in _brute(docs, QV, window)}, window)
    want: dict = {}
    for lst in (bm25, knn):
        for i, rank in lst.items():
            want[i] = want.get(i, 0.0) + 1.0 / (const + rank)
    top = sorted(want, key=lambda i: (-want[i], i))[:10]
    assert [x["doc_id"] for x in got] == top
    for row in got:
        assert row["score"] == pytest.approx(want[row["doc_id"]], rel=1e-12)


def test_rrf_retriever_weights_and_live_twin(spark, setup):
    d, r, docs = setup
    body = {
        "retriever": {
            "rrf": {
                "retrievers": [
                    {"standard": {"query": {"match": {"content": "merge"}}}},
                    {"knn": {"field": "emb", "query_vector": QV, "k": 15}},
                ],
                "rank_window_size": 15,
                "rank_constant": 10,
                "weights": [2.0, 0.5],
            }
        }
    }
    base = r.search_dsl_df(body, k=8).collect()
    bm25 = _ranks(
        {x["doc_id"]: x["score"] for x in r.match_df("merge").collect()}, 15
    )
    knn = _ranks({i: s for s, i in _brute(docs, QV, 15)}, 15)
    want: dict = {}
    for w, lst in ((2.0, bm25), (0.5, knn)):
        for i, rank in lst.items():
            want[i] = want.get(i, 0.0) + w / (10 + rank)
    top = sorted(want, key=lambda i: (-want[i], i))[:8]
    assert [x["doc_id"] for x in base] == top
    ri = IncrementalIndexReader(spark, d)
    live = ri.search_dsl_df(body, k=8).collect()
    assert [(x["doc_id"], round(x["score"], 12)) for x in live] == [
        (x["doc_id"], round(x["score"], 12)) for x in base
    ]


def _window(scores: dict, window: int) -> dict:
    keep = sorted(scores, key=lambda i: (-scores[i], i))[:window]
    return {i: scores[i] for i in keep}


def test_linear_retriever_parity(spark, setup):
    """ES 8.18 `retriever.linear` body: weighted NORMALIZED-score fusion
    — minmax on the BM25 window, l2_norm on the knn window, weights 2 /
    0.5, absent docs contribute 0; hand model end-to-end."""
    d, r, docs = setup
    window = 20
    body = {
        "retriever": {
            "linear": {
                "retrievers": [
                    {"retriever": {"standard": {"query":
                                   {"match": {"content": "merge"}}}},
                     "weight": 2.0, "normalizer": "minmax"},
                    {"retriever": {"knn": {"field": "emb",
                                           "query_vector": QV, "k": window}},
                     "weight": 0.5, "normalizer": "l2_norm"},
                ],
                "rank_window_size": window,
            }
        }
    }
    got = r.search_dsl_df(body, k=10).collect()
    bm = _window(
        {x["doc_id"]: x["score"] for x in r.match_df("merge").collect()},
        window,
    )
    kn = _window({i: s for s, i in _brute(docs, QV, window)}, window)
    mn, mx = min(bm.values()), max(bm.values())
    l2 = sum(s * s for s in kn.values()) ** 0.5
    want: dict = {}
    for i, s in bm.items():
        want[i] = want.get(i, 0.0) + 2.0 * (
            1.0 if mx == mn else (s - mn) / (mx - mn)
        )
    for i, s in kn.items():
        want[i] = want.get(i, 0.0) + 0.5 * (s / l2)
    top = sorted(want, key=lambda i: (-want[i], i))[:10]
    assert [x["doc_id"] for x in got] == top
    for row in got:
        assert row["score"] == pytest.approx(want[row["doc_id"]], rel=1e-9)
    # live twin
    ri = IncrementalIndexReader(spark, d)
    live = ri.search_dsl_df(body, k=10).collect()
    assert [(x["doc_id"], round(x["score"], 9)) for x in live] == [
        (x["doc_id"], round(x["score"], 9)) for x in got
    ]
    # degenerate minmax window (single-score) maps to 1.0, not NaN
    one = r.search_dsl_df(
        {"retriever": {"linear": {"retrievers": [
            {"retriever": {"standard": {"query":
                           {"match": {"content": "merge"}}}},
             "weight": 1.0, "normalizer": "minmax"},
            {"retriever": {"standard": {"query":
                           {"match": {"content": "merge"}}}},
             "weight": 1.0, "normalizer": "minmax"},
        ], "rank_window_size": 1}}},
        k=1,
    ).collect()
    assert one[0]["score"] == pytest.approx(2.0)
    # validation
    with pytest.raises(ValueError, match="at least 2"):
        r.search_dsl_df(
            {"retriever": {"linear": {"retrievers": [
                {"retriever": {"standard": {"query":
                               {"match": {"content": "merge"}}}}}]}}},
            k=3,
        )
    with pytest.raises(ValueError, match="unknown normalizer"):
        r.search_dsl_df(
            {"retriever": {"linear": {"retrievers": [
                {"retriever": {"standard": {"query":
                               {"match": {"content": "merge"}}}},
                 "normalizer": "zscore"},
                {"retriever": {"knn": {"field": "emb",
                                       "query_vector": QV, "k": 5}}},
            ]}}},
            k=3,
        )


def test_standard_retriever_equals_plain_query(spark, setup):
    d, r, _ = setup
    q = {"match": {"content": "merge buffer"}}
    a = r.search_dsl_df({"retriever": {"standard": {"query": q}}}, k=10).collect()
    b = r.search_dsl_df(q, k=10).collect()
    assert [(x["doc_id"], x["score"]) for x in a] == [
        (x["doc_id"], x["score"]) for x in b
    ]


def test_rrf_retriever_validation(spark, setup):
    d, r, _ = setup
    with pytest.raises(ValueError, match="at least 2"):
        r.search_dsl_df(
            {"retriever": {"rrf": {"retrievers": [
                {"standard": {"query": {"match": {"content": "x"}}}}]}}}
        )
    with pytest.raises(ValueError, match="unsupported retriever kind"):
        r.search_dsl_df({"retriever": {"banana": {}}})


def test_enable_ann_and_knn_df_exact(spark, setup):
    """knn_df without num_candidates == brute force; enable_ann is
    idempotent and its meta records the trained shape."""
    d, r, docs = setup
    meta = r.enable_ann("emb", n_centroids=8)
    assert meta["n_centroids"] == 8 and meta["n_vecs"] == len(docs)
    assert meta["dim"] == DIMS and len(meta["centroids"]) == 8
    meta2 = r.enable_ann("emb", n_centroids=8)
    assert meta2 == meta  # second call: cached, no rebuild
    got = {x["doc_id"]: x["score"] for x in r.knn_df("emb", QV).collect()}
    for s, i in _brute(docs, QV, len(docs)):
        assert got[i] == pytest.approx(s, rel=1e-9)


def _probe_model(meta, docs, qv, num_candidates):
    """Re-derive the IVF candidate set in plain Python from the sidecar
    meta: assignment by nearest centroid, probes by centroid similarity."""
    import numpy as np

    c = np.array(meta["centroids"])
    v = np.array(qv, dtype=float)
    v /= np.linalg.norm(v)
    n_probe = max(1, min(len(c), -(-num_candidates * len(c) // meta["n_vecs"])))
    probes = set(int(i) for i in np.argsort(-(c @ v))[:n_probe])
    cand = set()
    for x in docs:
        e = np.array(x["emb"], dtype=float)
        e /= max(np.linalg.norm(e), 1e-12)
        if int(np.argmax(c @ e)) in probes:
            cand.add(x["doc_id"])
    return cand


def test_knn_df_num_candidates_prunes(spark, setup):
    """num_candidates probes only the nearest centroid lists: the result
    equals brute force restricted to the re-derived candidate set."""
    d, r, docs = setup
    meta = r.enable_ann("emb", n_centroids=8)
    nc = 30
    cand = _probe_model(meta, docs, QV, nc)
    assert 0 < len(cand) < len(docs), "probe must actually prune"
    got = {
        x["doc_id"]: x["score"]
        for x in r.knn_df("emb", QV, num_candidates=nc).collect()
    }
    assert set(got) == cand
    want = dict()
    for s, i in _brute(docs, QV, len(docs), pred=lambda x: x["doc_id"] in cand):
        want[i] = s
    for i, s in want.items():
        assert got[i] == pytest.approx(s, rel=1e-9)


def test_knn_leaf_num_candidates_and_filter(spark, setup):
    """The DSL leaf routes num_candidates through the sidecar, with the
    pre-filter applied BEFORE candidate generation."""
    d, r, docs = setup
    meta = r.enable_ann("emb", n_centroids=8)
    nc = 30
    cand = _probe_model(meta, docs, QV, nc)
    body = {
        "knn": {"field": "emb", "query_vector": QV, "k": 5, "num_candidates": nc}
    }
    got = r.search_dsl_df(body, k=5).collect()
    want = _brute(docs, QV, 5, pred=lambda x: x["doc_id"] in cand)
    assert [x["doc_id"] for x in got] == [i for _, i in want]
    # with filter: every hit satisfies the filter
    match_ids = {x["doc_id"] for x in r.match_df("merge").collect()}
    body["knn"]["filter"] = {"match": {"content": "merge"}}
    got2 = r.search_dsl_df(body, k=5).collect()
    assert got2 and all(x["doc_id"] in match_ids for x in got2)


def test_knn_df_requires_sidecar(spark, tmp_path):
    from elasticsearch_jdbc_spark.sources import synthetic_corpus as _sc

    idx = str(tmp_path / "idx")
    corpus = _sc(spark, n_files=20, seed=3).withColumn(
        "emb", F.array(*[F.lit(float(i)) for i in range(3)])
    )
    IndexBuilder(spark, idx, partitions=2).build(corpus, resume=False)
    rr = IndexReader(spark, idx)
    with pytest.raises(ValueError, match="requires enable_ann"):
        rr.knn_df("emb", [1.0, 0.0, 0.0], num_candidates=5).collect()


def test_top_level_knn_hybrid(spark, setup):
    """ES 8 top-level `knn` alongside `query`: both sides run, a doc's
    final score is the SUM of its BM25 score and its knn score; docs
    found by only one side keep that side's score."""
    d, r, docs = setup
    KK = 7
    match = {"match": {"content": "merge buffer"}}
    qscores = {
        x["doc_id"]: x["score"]
        for x in r.search_dsl_df({"query": match}, k=None).collect()
    }
    kscores = dict(
        (did, s) for s, did in [(s, i) for s, i in _brute(docs, QV, KK)]
    )
    want = {
        did: qscores.get(did, 0.0) + kscores.get(did, 0.0)
        for did in set(qscores) | set(kscores)
    }
    got = {
        x["doc_id"]: x["score"]
        for x in r.search_dsl_df(
            {"query": match,
             "knn": {"field": "emb", "query_vector": QV, "k": KK}},
            k=None,
        ).collect()
    }
    assert set(got) == set(want)
    for did, s in want.items():
        assert got[did] == pytest.approx(s, rel=1e-9)
    # knn-only body (no query) stays the DSL leaf — same scores as knn side
    leaf = {
        x["doc_id"]: x["score"]
        for x in r.search_dsl_df(
            {"knn": {"field": "emb", "query_vector": QV, "k": KK}}
        ).collect()
    }
    assert leaf == {k: pytest.approx(v, rel=1e-9) for k, v in kscores.items()}


def test_top_level_knn_profile_parity(spark, setup):
    """profile_dsl on a hybrid body: the query tree shows the fusion
    node with both children, and the hits match search_dsl_df."""
    d, r, docs = setup
    body = {"query": {"match": {"content": "merge buffer"}},
            "knn": {"field": "emb", "query_vector": QV, "k": 5}}
    p = r.profile_dsl(body, k=8)
    assert p["query_tree"]["type"] == "knn_hybrid"
    kinds = [c["type"] for c in p["query_tree"]["children"]]
    assert "knn" in kinds and len(kinds) == 2
    direct = r.search_dsl_df(body, k=8).collect()
    via = p["hits"].collect()
    assert [(x["doc_id"], x["score"]) for x in via] == [
        (x["doc_id"], x["score"]) for x in direct
    ]
    assert "TakeOrderedAndProject" in p["physical_plan"] or "Sort" in p["physical_plan"]


def test_knn_similarity_threshold(spark, setup):
    """ES knn.similarity: a raw-cosine floor applied before the k cut —
    brute threshold parity, and the cut still fills from survivors."""
    d, r, docs = setup
    sims = sorted(
        (_knn_score(x["emb"], QV) * 2.0 - 1.0 for x in docs
         if x["emb"] is not None),
        reverse=True,
    )
    thr = (sims[4] + sims[5]) / 2.0  # exactly 5 docs above
    out = r.search_dsl_df(
        {"knn": {"field": "emb", "query_vector": QV, "k": 20,
                 "similarity": thr}}
    ).collect()
    assert len(out) == 5
    assert all(x["score"] >= (1.0 + thr) / 2.0 - 1e-12 for x in out)
