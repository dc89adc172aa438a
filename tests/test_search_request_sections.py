"""Request-body `highlight` / `suggest` / top-level `knn` sections wired
through search_request (VERDICT r4 #3): the full ES _search response
shape {hits, aggregations, suggest} with snippet-decorated hits, checked
against the typed surfaces they dispatch to (highlight_df / suggest_df).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.index import (
    IncrementalIndexReader,
    IndexBuilder,
    IndexReader,
)
from elasticsearch_jdbc_spark.sources import synthetic_corpus


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sreq") / "idx")
    corpus = synthetic_corpus(spark, n_files=150, seed=66).cache()
    IndexBuilder(spark, d, partitions=4).build(corpus, resume=False)
    return d, IndexReader(spark, d), corpus


def test_highlight_section(spark, setup):
    """search_request body highlight == the typed highlight_df: same
    hits, same snippets, query terms tag-wrapped."""
    d, r, corpus = setup
    q = "merge segment stream"
    res = r.search_request(
        {"query": {"match": {"content": q}},
         "size": 6,
         "highlight": {"fields": {"content": {}},
                       "pre_tags": ["<b>"], "post_tags": ["</b>"]}},
        source=corpus,
    )
    hits = res["hits"].collect()
    assert len(hits) == 6
    typed = r.highlight_df(
        q, corpus, k=6, pre_tag="<b>", post_tag="</b>"
    ).collect()
    assert [(x["doc_id"], x["snippet"], x["n_hits"]) for x in hits] == [
        (x["doc_id"], x["snippet"], x["n_hits"]) for x in typed
    ]
    for x in hits:
        assert x["n_hits"] >= 1 and "<b>" in x["snippet"]
    assert res["aggregations"] is None and res["suggest"] is None


def test_highlight_multi_field(spark, setup):
    """Several highlight fields in one body: ONE kernel pass returns
    {col}_snippet / {col}_n_hits per field (the ES per-field highlight
    object, flattened); per-field tag overrides honored; the content
    fragments match the single-field run exactly."""
    d, r, corpus = setup
    q = "merge segment stream"
    res = r.search_request(
        {"query": {"match": {"content": q}},
         "size": 6,
         "highlight": {"fields": {"content": {"pre_tags": ["<b>"],
                                              "post_tags": ["</b>"]},
                                  "path": {}}}},
        source=corpus,
    )
    hits = res["hits"].collect()
    assert len(hits) == 6
    cols = set(hits[0].asDict())
    assert {"content_snippet", "content_n_hits",
            "path_snippet", "path_n_hits"} <= cols
    single = r.search_request(
        {"query": {"match": {"content": q}},
         "size": 6,
         "highlight": {"fields": {"content": {}},
                       "pre_tags": ["<b>"], "post_tags": ["</b>"]}},
        source=corpus,
    )["hits"].collect()
    assert [(x["doc_id"], x["content_snippet"], x["content_n_hits"])
            for x in hits] == [
        (x["doc_id"], x["snippet"], x["n_hits"]) for x in single
    ]
    for x in hits:
        assert "<b>" in x["content_snippet"]
        # query terms never appear in file paths: 0-hit field is graceful
        assert x["path_n_hits"] == 0 and "<em>" not in (x["path_snippet"] or "")


def test_highlight_bool_terms_and_validation(spark, setup):
    """Highlight terms come from every scoring clause of a compound
    query (must_not never highlights); missing source is a clear error."""
    d, r, corpus = setup
    body = {
        "query": {"bool": {
            "must": [{"match": {"content": "merge"}}],
            "should": [{"match": {"content": "stream"}}],
            "must_not": [{"match": {"content": "xyzzy"}}],
        }},
        "size": 5,
        "highlight": {"fields": {"content": {}}},
    }
    hits = r.search_request(body, source=corpus)["hits"].collect()
    joined = " ".join(x["snippet"] for x in hits)
    assert "<em>merge</em>" in joined
    with pytest.raises(ValueError, match="source"):
        r.search_request(body)
    with pytest.raises(ValueError, match="highlight"):
        r.search_request(
            {"query": {"match": {"content": "merge"}},
             "highlight": {}}, source=corpus)
    with pytest.raises(ValueError, match="not a source column"):
        r.search_request(
            {"query": {"match": {"content": "merge"}},
             "highlight": {"fields": {"nope": {}}}}, source=corpus)


def test_suggest_section(spark, setup):
    """A named term suggester in the body == the typed suggest_df."""
    d, r, corpus = setup
    res = r.search_request({
        "size": 0,
        "suggest": {"fix-me": {"text": "merje",
                               "term": {"size": 3, "max_edits": 2}}},
    })
    assert set(res["suggest"]) == {"fix-me"}
    got = res["suggest"]["fix-me"].collect()
    typed = r.suggest_df("merje", size=3, max_edits=2).collect()
    assert [tuple(x) for x in got] == [tuple(x) for x in typed]
    assert any(x["suggestion"] == "merge" for x in got)
    # hits still present (size 0 -> empty page, stable schema)
    assert res["hits"].count() == 0
    with pytest.raises(ValueError, match="exactly one of"):
        r.search_request({"suggest": {"s": {"text": "x"}}})
    with pytest.raises(ValueError, match="needs 'text'"):
        r.search_request({"suggest": {"s": {"term": {}}}})


def test_sections_on_live_tier(spark, setup, tmp_path):
    """Same body shape on the incremental reader."""
    import shutil

    d, _r, corpus = setup
    live = str(tmp_path / "live")
    shutil.copytree(d, live)
    ri = IncrementalIndexReader(spark, live)
    res = ri.search_request(
        {"query": {"match": {"content": "merge stream"}},
         "size": 4,
         "highlight": {"fields": {"content": {}}},
         "suggest": {"s": {"text": "strean", "term": {"size": 2}}}},
        source=corpus,
    )
    hits = res["hits"].collect()
    assert len(hits) == 4 and all(x["snippet"] for x in hits)
    assert any(
        x["suggestion"] == "stream" for x in res["suggest"]["s"].collect()
    )


def test_track_total_hits(spark, setup):
    """track_total_hits: exact count of the query match set, unmoved by
    the page cut, narrowed by post_filter; integer caps clamp with
    'gte' (the ES hits.total contract)."""
    d, r, corpus = setup
    full = r.search_dsl_df(
        {"match": {"content": "merge"}}, k=None).count()
    res = r.search_request({
        "query": {"match": {"content": "merge"}},
        "size": 3, "track_total_hits": True,
    })
    assert res["total"] == {"value": full, "relation": "eq"}
    assert res["hits"].count() == 3  # the page cut never moves total

    res = r.search_request({
        "query": {"match": {"content": "merge"}},
        "track_total_hits": 5,
    })
    assert res["total"] == {"value": 5, "relation": "gte"} and full > 5

    res = r.search_request({
        "query": {"match": {"content": "merge"}},
        "track_total_hits": full + 10,
    })
    assert res["total"] == {"value": full, "relation": "eq"}

    pf = r.search_request({
        "query": {"match": {"content": "merge"}},
        "post_filter": {"term": {"lang": "rust"}},
        "track_total_hits": True,
    })
    assert 0 < pf["total"]["value"] < full

    off = r.search_request({"query": {"match": {"content": "merge"}}})
    assert off["total"] is None


def test_highlight_preserves_body_sort_order(spark, setup):
    """A body with BOTH `sort` and `highlight`: the returned hits keep
    the requested sort order (regression: highlighting used to re-rank
    the page by score desc, discarding the sort section)."""
    d, r, corpus = setup
    res = r.search_request(
        {"query": {"match": {"content": "merge"}},
         "sort": [{"dl": "asc"}],
         "size": 8,
         "highlight": {"fields": {"content": {}}}},
        source=corpus,
    )
    rows = res["hits"].collect()
    assert len(rows) == 8
    dls = [x["dl"] for x in rows]
    assert dls == sorted(dls), "hits must come back in the body's sort order"
    # and the page IS the sorted page (same doc set as the no-highlight run)
    plain = r.search_dsl_df(
        {"query": {"match": {"content": "merge"}},
         "sort": [{"dl": "asc"}], "size": 8},
    ).collect()
    assert [x["doc_id"] for x in rows] == [x["doc_id"] for x in plain]
