"""ES constant_score / script_score / rank_feature / match_bool_prefix
queries: scoring formulas checked against hand computation over the
match set, prefix semantics against an analyzer walk, both reader tiers
rank-identical, live semantics across a delete."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.index import (
    IncrementalIndexReader,
    IndexBuilder,
    IndexReader,
    apply_incremental,
)
from elasticsearch_jdbc_spark.sources import synthetic_corpus

Q = "merge buffer"


@pytest.fixture()
def setup(spark, tmp_path):
    d = str(tmp_path / "idx")
    corpus = synthetic_corpus(spark, n_files=150, seed=66).cache()
    IndexBuilder(spark, d, partitions=4).build(corpus, resume=False)
    return d, corpus


def test_constant_score_is_match_set_at_boost(spark, setup):
    d, _ = setup
    r = IndexReader(spark, d)
    got = r.constant_score_df(Q, boost=2.5, k=None).collect()
    assert got
    assert {x["score"] for x in got} == {2.5}
    assert {x["doc_id"] for x in got} == {
        x["doc_id"] for x in r.match_df(Q).collect()
    }
    # k cut is doc_id-ordered among the all-equal scores
    top = r.constant_score_df(Q, boost=2.5, k=5).collect()
    assert [x["doc_id"] for x in top] == sorted(x["doc_id"] for x in top)


def test_script_score_replaces_score(spark, setup):
    d, _ = setup
    r = IndexReader(spark, d)
    base = {x["doc_id"]: x["score"] for x in r.match_df(Q).collect()}
    dls = {
        x["doc_id"]: x["dl"]
        for x in spark.read.parquet(f"{d}/docs").select("doc_id", "dl").collect()
    }
    got = r.script_score_df(Q, "_score * 2 + dl / 1000.0", k=None).collect()
    assert got
    for x in got:
        want = base[x["doc_id"]] * 2 + dls[x["doc_id"]] / 1000.0
        assert x["score"] == pytest.approx(want, rel=1e-12)
    # min_score floors the rewritten score
    floor = sorted(x["score"] for x in got)[len(got) // 2]
    kept = r.script_score_df(
        Q, "_score * 2 + dl / 1000.0", k=None, min_score=floor
    ).collect()
    assert kept and all(x["score"] >= floor for x in kept)
    assert len(kept) < len(got)


@pytest.mark.parametrize(
    "function,kw,fn",
    [
        ("saturation", {"pivot": 120.0}, lambda x: x / (x + 120.0)),
        ("log", {"scale": 0.5}, lambda x: math.log(0.5 * x + 1.0)),
        (
            "sigmoid",
            {"pivot": 120.0, "exponent": 2.0},
            lambda x: x**2 / (x**2 + 120.0**2),
        ),
    ],
)
def test_rank_feature_functions(spark, setup, function, kw, fn):
    d, _ = setup
    r = IndexReader(spark, d)
    dls = {
        x["doc_id"]: x["dl"]
        for x in spark.read.parquet(f"{d}/docs").select("doc_id", "dl").collect()
    }
    # standalone: every doc, score = boost * fn(dl)
    got = r.rank_feature_df("dl", function=function, boost=3.0, k=None, **kw).collect()
    assert len(got) == len(dls)
    for x in got:
        assert x["score"] == pytest.approx(3.0 * fn(dls[x["doc_id"]]), rel=1e-12)
    # with query: BM25 + boost * fn(dl) on the match set
    base = {x["doc_id"]: x["score"] for x in r.match_df(Q).collect()}
    got_q = r.rank_feature_df(
        "dl", function=function, boost=3.0, query=Q, k=None, **kw
    ).collect()
    assert {x["doc_id"] for x in got_q} == set(base)
    for x in got_q:
        want = base[x["doc_id"]] + 3.0 * fn(dls[x["doc_id"]])
        assert x["score"] == pytest.approx(want, rel=1e-12)


def test_rank_feature_validation(spark, setup):
    d, _ = setup
    r = IndexReader(spark, d)
    with pytest.raises(ValueError, match="pivot"):
        r.rank_feature_df("dl", function="saturation")
    with pytest.raises(ValueError, match="unknown rank_feature"):
        r.rank_feature_df("dl", function="banana", pivot=1.0)
    with pytest.raises(ValueError, match="unknown feature column"):
        r.rank_feature_df("nope", pivot=1.0)


def test_match_bool_prefix_matches_analyzer_walk(spark, setup):
    d, corpus = setup
    r = IndexReader(spark, d)
    # 'buf' prefixes buffer/... ; 'merge' is a full term clause
    got_or = {x["doc_id"] for x in r.match_bool_prefix_df("merge buf", k=None).collect()}
    got_and = {
        x["doc_id"]
        for x in r.match_bool_prefix_df("merge buf", k=None, operator="and").collect()
    }
    keymap = {
        (x["repo"], x["path"], x["commit"]): x["doc_id"]
        for x in spark.read.parquet(f"{d}/docs").collect()
    }
    want_or, want_and = set(), set()
    for row in corpus.collect():
        toks = {t["token"] for t in r.analyze(row["content"], lang=row["lang"])}
        has_full = "merge" in toks
        has_pre = any(t.startswith("buf") for t in toks)
        doc = keymap[(row["repo"], row["path"], row["commit"])]
        if has_full or has_pre:
            want_or.add(doc)
        if has_full and has_pre:
            want_and.add(doc)
    assert got_or == want_or
    assert got_and == want_and
    assert want_and and want_and < want_or


def test_convenience_incremental_twins(spark, setup):
    d, _ = setup
    r = IndexReader(spark, d)
    ri = IncrementalIndexReader(spark, d)
    pairs = [
        (
            r.constant_score_df(Q, boost=2.0, k=8),
            ri.constant_score_df(Q, boost=2.0, k=8),
        ),
        (
            r.script_score_df(Q, "_score + dl / 100.0", k=8),
            ri.script_score_df(Q, "_score + dl / 100.0", k=8),
        ),
        (
            r.rank_feature_df("dl", pivot=120.0, query=Q, k=8),
            ri.rank_feature_df("dl", pivot=120.0, query=Q, k=8),
        ),
        (
            r.match_bool_prefix_df("merge buf", k=8),
            ri.match_bool_prefix_df("merge buf", k=8),
        ),
    ]
    for base_df, live_df in pairs:
        base = base_df.collect()
        live = live_df.collect()
        assert [(x["doc_id"], round(x["score"], 9)) for x in live] == [
            (x["doc_id"], round(x["score"], 9)) for x in base
        ]


def test_rank_feature_live_after_delete(spark, setup):
    d, _ = setup
    ri = IncrementalIndexReader(spark, d)
    live = ri.rank_feature_df("dl", pivot=120.0, k=5).collect()
    top = live[0]
    key = (
        ri.live_docs()
        .filter(
            (F.col("segment") == top["segment"]) & (F.col("doc_id") == top["doc_id"])
        )
        .select("repo", "path", "commit")
        .withColumn("_optype", F.lit("delete"))
    )
    apply_incremental(spark, d, key)
    after = IncrementalIndexReader(spark, d).rank_feature_df(
        "dl", pivot=120.0, k=5
    ).collect()
    assert (top["segment"], top["doc_id"]) not in {
        (x["segment"], x["doc_id"]) for x in after
    }
