"""ES function_score (metadata score modifiers) + _mget (batch point
reads). function_score is oracle-checked in the registry
(fscore_index_search); here the combine math, boost modes, and the live
readers' newest-version/tombstone semantics for _mget."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.index import (
    IncrementalIndexReader,
    IndexBuilder,
    IndexReader,
    apply_incremental,
)
from elasticsearch_jdbc_spark.sources import synthetic_corpus

Q = "merge segment"


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fsm") / "idx")
    corpus = synthetic_corpus(spark, n_files=180, seed=101).cache()
    IndexBuilder(spark, d, partitions=4).build(corpus, resume=False)
    return d, corpus


def test_function_score_multiply_and_sum(spark, idx):
    d, _ = idx
    r = IndexReader(spark, d)
    base = {row["doc_id"]: row["score"] for row in r.search_df(Q, k=None).collect()}
    dls = {
        row["doc_id"]: row["dl"]
        for row in spark.read.parquet(f"{d}/docs").select("doc_id", "dl").collect()
    }
    mul = {
        row["doc_id"]: row["score"]
        for row in r.function_score_df(Q, "1.0 + dl / 1000.0", k=None).collect()
    }
    assert set(mul) == set(base)
    for did, s in mul.items():
        assert s == pytest.approx(base[did] * (1.0 + dls[did] / 1000.0), rel=1e-12)
    add = {
        row["doc_id"]: row["score"]
        for row in r.function_score_df(
            Q, "dl / 100.0", k=None, boost_mode="sum"
        ).collect()
    }
    for did, s in add.items():
        assert s == pytest.approx(base[did] + dls[did] / 100.0, rel=1e-12)
    # ranking respects the combined score
    top = r.function_score_df(Q, "1.0 + dl / 1000.0", k=5).collect()
    want = sorted(mul.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(row["doc_id"], row["score"]) for row in top] == [
        (did, pytest.approx(s)) for did, s in want
    ]
    with pytest.raises(ValueError):
        r.function_score_df(Q, "dl", boost_mode="max")


def test_mget_base(spark, idx):
    d, _ = idx
    r = IndexReader(spark, d)
    rows = (
        spark.read.parquet(f"{d}/docs")
        .orderBy("doc_id")
        .select("repo", "path", "doc_id")
        .take(2)
    )
    likes = [{"repo": x["repo"], "path": x["path"]} for x in rows] + [
        {"path": "no/such.txt"}
    ]
    got = r.mget(likes)
    assert [g["found"] for g in got] == [True, True, False]
    assert got[0]["doc_id"] == rows[0]["doc_id"]
    assert got[1]["doc_id"] == rows[1]["doc_id"]
    assert r.mget([]) == []
    with pytest.raises(ValueError):
        r.mget([{"bogus": 1}])


def test_mget_incremental_upsert_and_delete(spark, idx, tmp_path):
    import shutil

    d0, corpus = idx
    d = str(tmp_path / "mget_live")
    shutil.copytree(d0, d)
    target = (
        spark.read.parquet(f"{d}/docs").orderBy("doc_id").select("repo", "path").first()
    )
    like = {"repo": target["repo"], "path": target["path"]}
    # upsert the doc with new content, delete a second doc
    upd = (
        corpus.filter(
            (F.col("repo") == like["repo"]) & (F.col("path") == like["path"])
        )
        .withColumn("content", F.concat(F.col("content"), F.lit(" zzz")))
        .withColumn("_optype", F.lit("update"))
    )
    apply_incremental(spark, d, upd)
    victim = (
        spark.read.parquet(f"{d}/docs")
        .orderBy(F.desc("doc_id"))
        .select("repo", "path")
        .first()
    )
    vlike = {"repo": victim["repo"], "path": victim["path"]}
    # direct delete batch (simplest deterministic path)
    dele = (
        corpus.filter(
            (F.col("repo") == vlike["repo"]) & (F.col("path") == vlike["path"])
        ).withColumn("_optype", F.lit("delete"))
    )
    apply_incremental(spark, d, dele)
    ri = IncrementalIndexReader(spark, d)
    got = ri.mget([like, vlike, {"path": "nope.txt"}])
    assert got[0]["found"] is True
    assert got[0]["segment"].startswith("delta")  # newest version won
    assert got[1]["found"] is False  # deleted
    assert got[2]["found"] is False  # never existed
