"""ES `nested` query (query-dsl-nested-query.html): per-element scoped
predicates over array-of-structs docs metadata. The defining semantics —
all inner predicates must match the SAME array element — compiles to
Spark's `exists(path, e -> ...)` higher-order function (one docs-scan
projection, no explode). The fold layer builds these arrays from bracket
labels (reference PlainKeyValueStreamListener.java:291-321,
README.md:553-605); this is the query side over them.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.index import (
    IncrementalIndexReader,
    IndexBuilder,
    IndexReader,
    apply_incremental,
)

# doc 0: alice's comment has 5 stars -> same-element (alice, >=4) HIT
# doc 1: alice commented (1 star) AND a 5-star comment exists (bob) but
#        never on the SAME element -> must NOT match the nested bool
# doc 2: carol only
# doc 3: no comments
DOCS = [
    ("r", "0", "c", "t", "alpha beta",
     [("alice", 5), ("bob", 1)]),
    ("r", "1", "c", "t", "alpha gamma",
     [("alice", 1), ("bob", 5)]),
    ("r", "2", "c", "t", "beta gamma",
     [("carol", 3)]),
    ("r", "3", "c", "t", "alpha beta gamma", []),
]
SCHEMA = (
    "repo string, path string, commit string, lang string, content string,"
    " comments array<struct<author string, stars bigint>>"
)

NESTED_SAME_ELEM = {
    "nested": {
        "path": "comments",
        "query": {
            "bool": {
                "must": [
                    {"term": {"comments.author": "alice"}},
                    {"range": {"comments.stars": {"gte": 4}}},
                ]
            }
        },
    }
}


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("nstq") / "idx")
    IndexBuilder(spark, d, partitions=2).build(
        spark.createDataFrame(DOCS, SCHEMA), resume=False
    )
    return d


def _paths(spark, d, df):
    docs = spark.read.parquet(f"{d}/docs").select("doc_id", "path")
    return sorted(
        x["path"] for x in df.join(docs, "doc_id").select("path").collect()
    )


def test_same_element_conjunction(spark, idx):
    """The ES nested contract: both predicates on ONE element. Doc 1
    satisfies each predicate on different elements and must not match."""
    r = IndexReader(spark, idx)
    out = r.search_dsl_df(NESTED_SAME_ELEM, k=None)
    assert _paths(spark, idx, out) == ["0"]
    # sanity: element-INDEPENDENT predicates (two sibling nested leaves)
    # DO match doc 1 — the difference is exactly the same-element scope
    loose = r.search_dsl_df(
        {"bool": {"filter": [
            {"nested": {"path": "comments",
                        "query": {"term": {"comments.author": "alice"}}}},
            {"nested": {"path": "comments",
                        "query": {"range": {"comments.stars": {"gte": 4}}}}},
        ]}},
        k=None,
    )
    assert _paths(spark, idx, loose) == ["0", "1"]


def test_inner_grammar(spark, idx):
    r = IndexReader(spark, idx)

    def ids(body):
        return _paths(spark, idx, r.search_dsl_df({"nested": {
            "path": "comments", "query": body}}, k=None))

    assert ids({"match_all": {}}) == ["0", "1", "2"]  # doc 3: empty array
    assert ids({"terms": {"comments.author": ["bob", "carol"]}}) == ["0", "1", "2"]
    assert ids({"exists": {"field": "comments.stars"}}) == ["0", "1", "2"]
    assert ids({"bool": {"must_not": [
        {"term": {"comments.author": "alice"}}],
        "filter": [{"range": {"comments.stars": {"lte": 3}}}]}}) == ["0", "2"]
    # should with minimum_should_match=1 (default, no must sibling)
    assert ids({"bool": {"should": [
        {"term": {"comments.author": "carol"}},
        {"range": {"comments.stars": {"gte": 5}}}]}}) == ["0", "1", "2"]


def test_score_modes(spark, idx):
    """Constant child scores: none/avg/max/min -> boost; sum -> boost ×
    matching-element count (the ES combination rules degenerate)."""
    r = IndexReader(spark, idx)
    q = {"range": {"comments.stars": {"gte": 1}}}
    for mode in ("none", "avg", "max", "min"):
        got = {
            x["doc_id"]: x["score"]
            for x in r.nested_df("comments", q, score_mode=mode,
                                 boost=2.0).collect()
        }
        assert set(got.values()) == {2.0}
    sums = r.nested_df("comments", q, score_mode="sum").collect()
    bypath = {
        p: s for p, s in zip(_score_paths(spark, idx, sums), _scores(sums))
    }
    assert bypath == {"0": 2.0, "1": 2.0, "2": 1.0}


def _score_paths(spark, d, rows):
    docs = {
        x["doc_id"]: x["path"]
        for x in spark.read.parquet(f"{d}/docs").select(
            "doc_id", "path").collect()
    }
    return [docs[x["doc_id"]] for x in rows]


def _scores(rows):
    return [x["score"] for x in rows]


def test_validation(spark, idx):
    r = IndexReader(spark, idx)
    with pytest.raises(ValueError, match="qualified under"):
        r.nested_df("comments", {"term": {"author": "alice"}})
    with pytest.raises(ValueError, match="array<struct"):
        r.nested_df("lang", {"term": {"lang.x": "t"}})
    with pytest.raises(ValueError, match="no field"):
        r.nested_df("comments", {"term": {"comments.nope": "x"}})
    with pytest.raises(ValueError, match="score_mode"):
        r.nested_df("comments", {"match_all": {}}, score_mode="prod")
    with pytest.raises(ValueError, match="unsupported query kind"):
        r.nested_df("comments", {"wildcard": {"comments.author": "a*"}})


def test_live_tier_upsert(spark, idx, tmp_path):
    """Same body on the incremental reader; an upsert changing which
    element carries the stars moves the doc in/out of the match set."""
    import shutil

    d = str(tmp_path / "live")
    shutil.copytree(idx, d)
    r0 = IncrementalIndexReader(spark, d)
    assert _paths(spark, d, r0.search_dsl_df(NESTED_SAME_ELEM, k=None)) == ["0"]
    # upsert doc 1: alice's comment now has 5 stars -> enters the set
    ops = spark.createDataFrame(
        [("r", "1", "c2", "t", "alpha gamma", [("alice", 5)], "index")],
        SCHEMA + ", _optype string",
    )
    apply_incremental(spark, d, ops)
    r1 = IncrementalIndexReader(spark, d)
    got = r1.search_dsl_df(NESTED_SAME_ELEM, k=None)
    assert sorted(
        x["path"]
        for x in got.join(
            r1.live_docs().select("segment", "doc_id", "path"),
            ["segment", "doc_id"],
        ).select("path").collect()
    ) == ["0", "1"]


def test_inner_hits(spark, idx):
    """inner_hits returns the MATCHING elements per hit (size-capped)
    plus the full matching count; the DSL leaf rejects inner_hits."""
    r = IndexReader(spark, idx)
    q = {"range": {"comments.stars": {"gte": 1}}}
    rows = r.nested_df("comments", q, inner_hits_size=1).collect()
    docs = {
        x["path"]: x["comments"]
        for x in spark.read.parquet(f"{idx}/docs").collect()
    }
    paths = {
        x["doc_id"]: x["path"]
        for x in spark.read.parquet(f"{idx}/docs").collect()
    }
    for row in rows:
        want = [c for c in docs[paths[row["doc_id"]]] if c["stars"] >= 1]
        assert row["inner_hits_total"] == len(want)
        assert len(row["inner_hits"]) == 1
        got = row["inner_hits"][0]
        assert (got["author"], got["stars"]) == (
            want[0]["author"], want[0]["stars"])
    assert {p for p, c in docs.items()
            if any(e["stars"] >= 1 for e in c)} == {
        paths[x["doc_id"]] for x in rows}
    with pytest.raises(ValueError, match="typed surface"):
        r.search_dsl_df({"nested": {"path": "comments", "query": q,
                                    "inner_hits": {}}})
    with pytest.raises(ValueError, match=">= 1"):
        r.nested_df("comments", q, inner_hits_size=0)


def test_nested_sort_modes(spark, idx):
    """ES nested sorting: order docs by an aggregate of an array-of-
    structs field — desc defaults to mode max, asc to min; sum/avg via
    the aggregate fold."""
    r = IndexReader(spark, idx)
    docs = {
        x["path"]: [e["stars"] for e in x["comments"]]
        for x in spark.read.parquet(f"{idx}/docs").collect()
    }
    base = {"query": {"match_all": {}}}

    def order_of(entry):
        out = r.search_dsl_df({**base, "sort": [entry], "size": 10})
        return _paths_ordered(spark, idx, out)

    nonempty = {p: v for p, v in docs.items() if v}
    # desc -> max per doc; empty arrays (null aggregate) sort last
    want = sorted(nonempty, key=lambda p: (-max(nonempty[p]), p))
    got = order_of({"comments.stars": {"order": "desc"}})
    assert got[: len(want)] == want
    # asc -> min
    want = sorted(nonempty, key=lambda p: (min(nonempty[p]), p))
    got = order_of({"comments.stars": {"order": "asc",
                                       "missing": "_last"}})
    assert got[: len(want)] == want
    # explicit sum mode
    want = sorted(nonempty, key=lambda p: (-sum(nonempty[p]), p))
    got = order_of({"comments.stars": {"order": "desc", "mode": "sum"}})
    assert got[: len(want)] == want
    with pytest.raises(ValueError, match="nested sort mode"):
        order_of({"comments.stars": {"order": "desc", "mode": "median"}})
    # the {'field': 'desc'} dict SHORTHAND must also default to mode max
    # (regression: it used to stay at min, inverting tie groups)
    want = sorted(nonempty, key=lambda p: (-max(nonempty[p]), p))
    got = order_of({"comments.stars": "desc"})
    assert got[: len(want)] == want


def _paths_ordered(spark, d, df):
    docs = {
        x["doc_id"]: x["path"]
        for x in spark.read.parquet(f"{d}/docs").collect()
    }
    return [docs[x["doc_id"]] for x in df.collect()]
