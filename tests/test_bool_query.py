"""Boolean-query semantics (ES bool must/should/must_not) vs a pure-Python
model over a small hand-made corpus."""

from __future__ import annotations

import pytest

from elasticsearch_jdbc_spark.functions.tokenizer import tokenize_py
from elasticsearch_jdbc_spark.index import IndexBuilder, IndexReader
from elasticsearch_jdbc_spark.index.codec import bm25_idf, bm25_weight

import numpy as np

DOCS = [
    ("r", "0", "c", "t", "apple banana cherry"),
    ("r", "1", "c", "t", "apple banana"),
    ("r", "2", "c", "t", "apple cherry date"),
    ("r", "3", "c", "t", "banana cherry date"),
    ("r", "4", "c", "t", "apple apple banana date"),
]


@pytest.fixture(scope="module")
def bool_idx(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("bq") / "idx")
    df = spark.createDataFrame(
        DOCS, "repo string, path string, commit string, lang string, content string"
    )
    IndexBuilder(spark, idx, partitions=2).build(df, resume=False)
    reader = IndexReader(spark, idx)
    docs = spark.read.parquet(f"{idx}/docs").collect()
    return reader, {r["path"]: r["doc_id"] for r in docs}


def _model(reader, must, should, must_not, k=10):
    texts = {p: tokenize_py(c) for _, p, _, _, c in DOCS}
    n = len(DOCS)
    avgdl = sum(len(t) for t in texts.values()) / n
    dfs: dict[str, int] = {}
    for toks in texts.values():
        for t in set(toks):
            dfs[t] = dfs.get(t, 0) + 1
    out = []
    for p, toks in texts.items():
        if any(m not in toks for m in must):
            continue
        if any(mn in toks for mn in must_not):
            continue
        s = 0.0
        for t in dict.fromkeys(must + should):
            tf = toks.count(t)
            if tf == 0 or t not in dfs:
                continue
            idf = float(bm25_idf(np.array([dfs[t]]), n)[0])
            w = float(bm25_weight(np.array([tf]), np.array([len(toks)]), avgdl, 1.2, 0.75)[0])
            s += idf * 2.2 * w
        if s > 0:
            out.append((p, s))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


@pytest.mark.parametrize("must,should,must_not", [
    (["apple"], [], []),
    (["apple", "banana"], [], []),
    (["apple"], ["date"], []),
    (["apple"], [], ["date"]),
    ([], ["banana", "date"], ["cherry"]),
    (["apple", "banana"], ["cherry"], ["date"]),
])
def test_bool_vs_model(bool_idx, must, should, must_not):
    reader, key2id = bool_idx
    got = reader.search_bool(must=must, should=should, must_not=must_not, k=10)
    want = _model(reader, must, should, must_not)
    want_ids = sorted(
        (key2id[p], s) for p, s in want
    )
    got_sorted = sorted(got)
    assert [d for d, _ in got_sorted] == [d for d, _ in want_ids], (must, should, must_not)
    for (_, gs), (_, ws) in zip(got_sorted, want_ids):
        assert gs == pytest.approx(ws, rel=1e-12)


def test_bool_edge_cases(bool_idx):
    reader, _ = bool_idx
    assert reader.search_bool() == []
    assert reader.search_bool(must="nosuchterm") == []
    assert reader.search_bool(must="apple nosuchterm") == []
    # string args tokenize like query strings
    assert reader.search_bool(must="apple banana") == reader.search_bool(
        must=["apple", "banana"]
    )


@pytest.mark.parametrize("must,should,must_not", [
    (["apple"], [], []),
    (["apple", "banana"], [], []),
    (["apple"], ["date"], []),
    (["apple"], [], ["date"]),
    ([], ["banana", "date"], ["cherry"]),
    (["apple", "banana"], ["cherry"], ["date"]),
])
def test_bool_cursor_path_rank_identical(bool_idx, must, should, must_not):
    """Above DENSE_LIMIT search_bool switches to cursor evaluation; forcing
    the switch must not change a single score."""
    reader, _ = bool_idx
    dense = reader.search_bool(must=must, should=should, must_not=must_not, k=10)
    reader.DENSE_LIMIT = 0  # instance attr shadows class attr
    try:
        cur = reader.search_bool(must=must, should=should, must_not=must_not, k=10)
    finally:
        del reader.DENSE_LIMIT
    assert cur == dense, (must, should, must_not)


def test_bool_df_rank_identical_to_driver(bool_idx):
    """search_bool_df (distributed: one scan, conjunction/exclusion as
    aggregation predicates) equals the driver path on every clause shape."""
    reader, key2id = bool_idx
    cases = [
        {"must": "apple banana"},
        {"must": "apple", "should": "date"},
        {"should": "apple banana cherry"},
        {"must": "apple", "must_not": "date"},
        {"should": "banana", "must_not": "apple"},
        {"must": "apple banana cherry date"},       # impossible conjunction
        {"must": "apple zzznope"},                  # unindexed must token
        {"must_not": "apple"},                      # nothing to score
    ]
    for case in cases:
        want = reader.search_bool(**case, k=10)
        got = [
            (r["doc_id"], r["score"])
            for r in reader.search_bool_df(**case, k=10).collect()
        ]
        assert [d for d, _ in got] == [d for d, _ in want], case
        for (_, gs), (_, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-9, case


def test_bool_df_fields_boosted(spark, tmp_path):
    """Distributed bool over a fields index: per-token ANY-field groups,
    boosted scoring, exclusion in any field."""
    df = spark.createDataFrame(
        [("r", "0", "c", "t", "spark engine", "other body"),
         ("r", "1", "c", "t", "plain title", "spark in body"),
         ("r", "2", "c", "t", "engine title", "spark body too")],
        "repo string, path string, commit string, lang string, "
        "title string, body string",
    )
    idx = str(tmp_path / "bf")
    IndexBuilder(spark, idx, partitions=1, fields=["title", "body"]).build(
        df, resume=False
    )
    reader = IndexReader(spark, idx)
    for case in (
        {"must": "spark", "boosts": {"title": 5.0, "body": 1.0}},
        {"must": "spark engine"},
        {"must": "spark", "must_not": "engine"},
    ):
        want = reader.search_bool(**case, k=10)
        got = [
            (r["doc_id"], r["score"])
            for r in reader.search_bool_df(**case, k=10).collect()
        ]
        assert [d for d, _ in got] == [d for d, _ in want], case
        for (_, gs), (_, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-9, case
