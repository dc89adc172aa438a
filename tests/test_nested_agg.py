"""ES `nested` aggregation + `reverse_nested`: context switch from
parent docs to array<struct> elements through the request-body aggs
compiler — element doc_counts, '<path>.<field>' addressing, parent-doc
recovery, brute parity, and the engine-native restrictions."""

from __future__ import annotations

import pytest

from elasticsearch_jdbc_spark.index import IndexBuilder, IndexReader

SCHEMA = (
    "repo string, path string, commit string, lang string, content string"
)
DOCS = [
    ("r", "0", "c", "t", "alpha"),
    ("r", "1", "c", "t", "beta"),
    ("r", "2", "c", "t", "alpha gamma"),
    ("r", "3", "c", "t", "delta"),
    ("r", "4", "c", "t", "alpha"),
    ("r", "5", "c", "t", "epsilon"),
]
# comments per doc: (author, stars)
COMMENTS = {
    "0": [("ann", 5), ("bob", 1)],
    "1": [("ann", 3)],
    "2": [],
    "3": [("bob", 2), ("bob", 4), ("cat", 0)],
    "4": [("cat", 5)],
    "5": [("ann", 1), ("cat", 2)],
}


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    import pyspark.sql.functions as F

    d = str(tmp_path_factory.mktemp("nagg") / "idx")
    rows = [
        r + ([{"author": a, "stars": s} for a, s in COMMENTS[r[1]]],)
        for r in DOCS
    ]
    df = spark.createDataFrame(
        rows, SCHEMA + ", comments array<struct<author string, stars bigint>>"
    )
    IndexBuilder(spark, d, partitions=2).build(df, resume=False)
    return d


def test_nested_doc_count_only(spark, idx):
    """nested with no sub-aggs: one bucket, doc_count = TOTAL elements
    (docs with empty arrays contribute nothing)."""
    r = IndexReader(spark, idx)
    out = r.aggs_dsl_df({"cn": {"nested": {"path": "comments"}}}).collect()
    assert len(out) == 1
    assert out[0]["cn"] == "comments"
    assert out[0]["cn_doc_count"] == sum(len(v) for v in COMMENTS.values())


def test_nested_terms_reverse_nested(spark, idx):
    """nested > terms(author) > {reverse_nested, avg(stars)}: per-author
    element counts, distinct-parent counts, element-level means — all
    brute-checked."""
    r = IndexReader(spark, idx)
    out = {
        x["by_author"]: x
        for x in r.aggs_dsl_df(
            {"cn": {"nested": {"path": "comments"}, "aggs": {
                "by_author": {
                    "terms": {"field": "comments.author", "size": 10},
                    "aggs": {
                        "parents": {"reverse_nested": {}},
                        "avg_stars": {"avg": {"field": "comments.stars"}},
                    },
                },
            }}}
        ).collect()
    }
    elems = [
        (p, a, s) for p, cs in COMMENTS.items() for a, s in cs
    ]
    authors = {a for _, a, _ in elems}
    assert set(out) == authors
    total = len(elems)
    for a in authors:
        mine = [(p, s) for p, aa, s in elems if aa == a]
        row = out[a]
        assert row["by_author_doc_count"] == len(mine)
        assert row["parents_doc_count"] == len({p for p, _ in mine})
        assert row["avg_stars"] == pytest.approx(
            sum(s for _, s in mine) / len(mine)
        )
        # the nested level's own count is the global element total
        assert row["cn_doc_count"] == total
        assert row["cn"] == "comments"
    # bob commented twice on doc 3: element count 3, parent count 2
    assert out["bob"]["by_author_doc_count"] == 3
    assert out["bob"]["parents_doc_count"] == 2


def test_nested_under_query_scope(spark, idx):
    """The aggs run over the QUERY match set: only matching docs'
    elements are counted."""
    r = IndexReader(spark, idx)
    out = r.aggs_dsl_df(
        {"cn": {"nested": {"path": "comments"}}},
        query={"match": {"content": "alpha"}},
    ).collect()
    # docs 0, 2, 4 match 'alpha' -> elements 2 + 0 + 1
    assert out[0]["cn_doc_count"] == 3


def test_nested_range_bucket_below(spark, idx):
    """A multi-bucket kind below nested keys ELEMENT rows."""
    r = IndexReader(spark, idx)
    out = {
        x["by_stars"]: x["by_stars_doc_count"]
        for x in r.aggs_dsl_df(
            {"cn": {"nested": {"path": "comments"}, "aggs": {
                "by_stars": {"range": {
                    "field": "comments.stars",
                    "ranges": [{"to": 3}, {"from": 3}],
                }},
            }}}
        ).collect()
    }
    stars = [s for cs in COMMENTS.values() for _, s in cs]
    assert out["-3"] == sum(1 for s in stars if s < 3)
    assert out["3-"] == sum(1 for s in stars if s >= 3)


def test_validation(spark, idx):
    r = IndexReader(spark, idx)
    with pytest.raises(ValueError, match="top-level"):
        r.aggs_dsl_df(
            {"t": {"terms": {"field": "lang"}, "aggs": {
                "cn": {"nested": {"path": "comments"}}}}}
        )
    with pytest.raises(ValueError, match="array<struct"):
        r.aggs_dsl_df({"cn": {"nested": {"path": "lang"}}})
    with pytest.raises(ValueError, match="array<struct"):
        r.aggs_dsl_df({"cn": {"nested": {"path": "nope"}}})
    with pytest.raises(ValueError, match="differ from its path"):
        r.aggs_dsl_df({"comments": {"nested": {"path": "comments"}}})
    with pytest.raises(ValueError, match="inside a nested"):
        r.aggs_dsl_df({"parents": {"reverse_nested": {}}})
    with pytest.raises(ValueError, match="partial path"):
        r.aggs_dsl_df(
            {"cn": {"nested": {"path": "comments"}, "aggs": {
                "p": {"reverse_nested": {"path": "comments"}}}}}
        )
    with pytest.raises(ValueError, match="under reverse_nested"):
        r.aggs_dsl_df(
            {"cn": {"nested": {"path": "comments"}, "aggs": {
                "p": {"reverse_nested": {},
                      "aggs": {"m": {"avg": {"field": "comments.stars"}}}}}}}
        )
