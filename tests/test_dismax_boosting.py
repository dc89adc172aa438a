"""ES dis_max (tie-breaker max-scoring disjunction) + boosting query
(negative-boost demotion) on both readers: combine math checked against
per-subquery search_df/match_df brute force (which are themselves
oracle-checked), plus the live readers' upsert/delete behavior.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.index import (
    IncrementalIndexReader,
    IndexBuilder,
    IndexReader,
    apply_incremental,
)
from elasticsearch_jdbc_spark.sources import synthetic_corpus

QS = ["merge segment", "read lock", "encode stream"]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dmb") / "idx")
    corpus = synthetic_corpus(spark, n_files=180, seed=53).cache()
    IndexBuilder(spark, d, partitions=4).build(corpus, resume=False)
    return d, corpus


def _combine(per_query: list[dict], tb: float) -> dict:
    out: dict = {}
    for scores in per_query:
        for key, s in scores.items():
            out.setdefault(key, []).append(s)
    return {
        key: max(ss) + tb * (sum(ss) - max(ss)) for key, ss in out.items()
    }


def test_dis_max_base_combine_and_rank(spark, idx):
    d, _ = idx
    r = IndexReader(spark, d)
    per = [
        {row["doc_id"]: row["score"] for row in r.search_df(q, k=None).collect()}
        for q in QS
    ]
    for tb in (0.0, 0.3, 1.0):
        got = {
            row["doc_id"]: row["score"]
            for row in r.dis_max_df(QS, k=None, tie_breaker=tb).collect()
        }
        want = _combine(per, tb)
        assert set(got) == set(want)
        for did, s in got.items():
            assert s == pytest.approx(want[did], rel=1e-9)
    # tie_breaker=1.0 is the bool-should sum
    got1 = {
        row["doc_id"]: row["score"]
        for row in r.dis_max_df(QS, k=None, tie_breaker=1.0).collect()
    }
    for did, s in got1.items():
        assert s == pytest.approx(
            sum(p[did] for p in per if did in p), rel=1e-9
        )
    # ranked cut respects the combined order
    want = _combine(per, 0.3)
    top = r.dis_max_df(QS, k=5, tie_breaker=0.3).collect()
    exp = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(row["doc_id"], pytest.approx(row["score"], rel=1e-9)) for row in top] == [
        (did, s) for did, s in exp
    ]
    with pytest.raises(ValueError):
        r.dis_max_df(QS, tie_breaker=1.5)


def test_boosting_base(spark, idx):
    d, _ = idx
    r = IndexReader(spark, d)
    pos = {row["doc_id"]: row["score"] for row in r.match_df(QS[0]).collect()}
    neg = {row["doc_id"] for row in r.match_df(QS[1]).collect()}
    got = {
        row["doc_id"]: row["score"]
        for row in r.boosting_df(QS[0], QS[1], negative_boost=0.25, k=None).collect()
    }
    assert set(got) == set(pos)  # demotion, never exclusion
    assert pos.keys() & neg, "fixture must have overlap to be meaningful"
    for did, s in got.items():
        exp = pos[did] * 0.25 if did in neg else pos[did]
        assert s == pytest.approx(exp, rel=1e-9)
    with pytest.raises(ValueError):
        r.boosting_df(QS[0], QS[1], negative_boost=2.0)


def test_live_readers_upsert_delete(spark, idx, tmp_path):
    d0, corpus = idx
    d = str(tmp_path / "live")
    shutil.copytree(d0, d)
    first = (
        spark.read.parquet(f"{d}/docs").orderBy("doc_id").select("repo", "path").first()
    )
    upd = (
        corpus.filter(
            (F.col("repo") == first["repo"]) & (F.col("path") == first["path"])
        )
        .withColumn("content", F.concat(F.col("content"), F.lit(" zzz")))
        .withColumn("_optype", F.lit("update"))
    )
    apply_incremental(spark, d, upd)
    # delete a doc that matches QS[0] so tombstone masking is exercised
    # (picked from the base segment, distinct from the upserted key)
    ri0 = IncrementalIndexReader(spark, d)
    base_hit_ids = sorted(
        row["doc_id"]
        for row in ri0.search_df(QS[0], k=None).collect()
        if row["segment"] == ""
    )
    vrow = (
        spark.read.parquet(f"{d}/docs")
        .filter(F.col("doc_id").isin(base_hit_ids))
        .filter(
            (F.col("repo") != first["repo"]) | (F.col("path") != first["path"])
        )
        .orderBy("doc_id")
        .select("repo", "path", "doc_id")
        .first()
    )
    dele = corpus.filter(
        (F.col("repo") == vrow["repo"]) & (F.col("path") == vrow["path"])
    ).withColumn("_optype", F.lit("delete"))
    apply_incremental(spark, d, dele)
    ri = IncrementalIndexReader(spark, d)
    per = [
        {
            (row["segment"], row["doc_id"]): row["score"]
            for row in ri.search_df(q, k=None).collect()
        }
        for q in QS
    ]
    got = {
        (row["segment"], row["doc_id"]): row["score"]
        for row in ri.dis_max_df(QS, k=None, tie_breaker=0.3).collect()
    }
    want = _combine(per, 0.3)
    assert set(got) == set(want)
    for key, s in got.items():
        assert s == pytest.approx(want[key], rel=1e-9)
    # the upserted doc contributes only its newest (delta) version
    segs = {seg for seg, _ in got}
    assert any(s.startswith("delta") for s in segs)
    # the tombstoned doc is gone from every surface (it matched QS[0])
    assert ("", vrow["doc_id"]) not in got
    assert ("", vrow["doc_id"]) not in {
        (row["segment"], row["doc_id"])
        for row in ri.boosting_df(QS[0], QS[1], k=None).collect()
    }
    # boosting on the live index
    pos = {
        (row["segment"], row["doc_id"]): row["score"]
        for row in ri.match_df(QS[0]).collect()
    }
    neg = {
        (row["segment"], row["doc_id"]) for row in ri.match_df(QS[1]).collect()
    }
    gotb = {
        (row["segment"], row["doc_id"]): row["score"]
        for row in ri.boosting_df(QS[0], QS[1], negative_boost=0.5, k=None).collect()
    }
    assert set(gotb) == set(pos)
    for key, s in gotb.items():
        exp = pos[key] * 0.5 if key in neg else pos[key]
        assert s == pytest.approx(exp, rel=1e-9)
