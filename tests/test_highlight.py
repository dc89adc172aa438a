"""ES highlight: best-fragment snippets with tagged query terms.

build_snippet is golden-tested (span math, camel-hump sub-token tagging,
window selection); highlight_df on both readers must return the ranked
top-k with snippets whose tagged tokens are exactly the query terms."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.functions.tokenizer import (
    tokenize_py,
    tokenize_spans_py,
)
from elasticsearch_jdbc_spark.index import (
    IncrementalIndexReader,
    IndexBuilder,
    IndexReader,
    apply_incremental,
)
from elasticsearch_jdbc_spark.index.query import build_snippet
from elasticsearch_jdbc_spark.sources import synthetic_corpus

Q = "merge segment"


def test_spans_golden():
    t = "getValue of HTTPServer and snake_case plus x9y"
    spans = tokenize_spans_py(t)
    assert [tok for tok, _s, _e in spans] == tokenize_py(t)
    for tok, s, e in spans:
        assert t[s:e].lower() == tok


def test_snippet_camel_subtoken():
    sn, nh = build_snippet("call MergeSegmentBuffer now", {"segment"})
    assert nh == 1
    assert "<em>Segment</em>" in sn
    # surrounding source text is untouched
    assert sn.replace("<em>", "").replace("</em>", "") == "call MergeSegmentBuffer now"


def test_snippet_window_picks_densest():
    text = "merge " + "x " * 40 + "merge segment merge " + "y " * 40
    sn, nh = build_snippet(text, {"merge", "segment"}, window=8)
    assert nh == 3  # the dense cluster, not the lone leading hit
    assert sn.count("<em>") == 3
    assert "y y" in sn or "segment" in sn


def test_snippet_no_hit_and_empty():
    assert build_snippet("nothing relevant here", {"zz"}) == ("", 0)
    assert build_snippet("", {"zz"}) == ("", 0)
    assert build_snippet(None, {"zz"}) == ("", 0)


def test_highlight_df_base(spark, tmp_path):
    d = str(tmp_path / "hl_idx")
    corpus = synthetic_corpus(spark, n_files=200, seed=81).cache()
    IndexBuilder(spark, d, partitions=4).build(corpus, resume=False)
    r = IndexReader(spark, d)
    top = r.search_df(Q, k=5).collect()
    got = r.highlight_df(Q, corpus, k=5).collect()
    assert [(x["doc_id"], x["score"]) for x in got] == [
        (x["doc_id"], x["score"]) for x in top
    ]
    qt = set(tokenize_py(Q))
    for row in got:
        assert row["n_hits"] >= 1
        assert row["snippet"].count("<em>") == row["n_hits"]
        # every tagged token is a query term
        import re

        for tag in re.findall(r"<em>(.*?)</em>", row["snippet"]):
            assert set(tokenize_py(tag)) <= qt
        # keys rode along for the consumer
        assert row["path"] and row["repo"]


def test_highlight_df_incremental_live_only(spark, tmp_path):
    d = str(tmp_path / "hl_inc")
    corpus = synthetic_corpus(spark, n_files=150, seed=82).cache()
    IndexBuilder(spark, d, partitions=4).build(corpus, resume=False)
    extra = (
        synthetic_corpus(spark, n_files=30, seed=83)
        .withColumn("path", F.concat(F.lit("extra/"), F.col("path")))
        .withColumn("_optype", F.lit("create"))
        .cache()
    )
    apply_incremental(spark, d, extra)
    ri = IncrementalIndexReader(spark, d)
    full_src = corpus.unionByName(extra.drop("_optype"))
    top = ri.search_df(Q, k=6).collect()
    got = ri.highlight_df(Q, full_src, k=6).collect()
    assert [(x["segment"], x["doc_id"]) for x in got] == [
        (x["segment"], x["doc_id"]) for x in top
    ]
    assert all(row["snippet"] for row in got)
    # custom tags
    tagged = ri.highlight_df(
        Q, full_src, k=2, pre_tag="[", post_tag="]"
    ).collect()
    assert all("[" in row["snippet"] for row in tagged)
