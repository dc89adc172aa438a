"""Snapshot/restore — committed-view backup with manifest-last
visibility; a restored index answers queries identically (content
hashes equal), and uncommitted garbage never rides along."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.index import (
    IncrementalIndexReader,
    IndexBuilder,
    IndexReader,
    apply_incremental,
    create_snapshot,
    delete_snapshot,
    list_snapshots,
    restore_snapshot,
)
from elasticsearch_jdbc_spark.sources import synthetic_corpus

Q = "merge segment buffer"


@pytest.fixture()
def idx(spark, tmp_path):
    d = str(tmp_path / "idx")
    corpus = synthetic_corpus(spark, n_files=130, seed=44)
    IndexBuilder(spark, d, partitions=4).build(corpus, resume=False)
    extra = (
        synthetic_corpus(spark, n_files=20, seed=45)
        .withColumn("path", F.concat(F.lit("d/"), F.col("path")))
        .withColumn("_optype", F.lit("create"))
    )
    apply_incremental(spark, d, extra)
    kill = (
        corpus.orderBy("path").limit(4)
        .select("repo", "path", "commit")
        .withColumn("_optype", F.lit("delete"))
    )
    apply_incremental(spark, d, kill)
    return d


def test_snapshot_restore_roundtrip(spark, idx, tmp_path):
    repo = str(tmp_path / "repo")
    m = create_snapshot(idx, repo, "s1")
    assert m["n_files"] > 0 and m["total_bytes"] > 0
    assert list_snapshots(repo) == ["s1"]
    dest = str(tmp_path / "restored")
    rm = restore_snapshot(repo, "s1", dest)
    assert rm["name"] == "s1"
    src_r = IncrementalIndexReader(spark, idx)
    dst_r = IncrementalIndexReader(spark, dest)
    assert dst_r.n_docs == src_r.n_docs
    assert dst_r.segments == src_r.segments
    a = src_r.search_df(Q, k=15).collect()
    b = dst_r.search_df(Q, k=15).collect()
    assert [(x["segment"], x["doc_id"], round(x["score"], 9)) for x in a] == [
        (x["segment"], x["doc_id"], round(x["score"], 9)) for x in b
    ]


def test_snapshot_is_committed_view_and_guards(spark, idx, tmp_path):
    repo = str(tmp_path / "repo")
    # uncommitted garbage (a fake in-flight delta without a manifest)
    os.makedirs(os.path.join(idx, "delta=99"))
    with open(os.path.join(idx, "delta=99", "junk.parquet"), "w") as f:
        f.write("partial")
    m = create_snapshot(idx, repo, "s1")
    assert not any(f["path"].startswith("delta=99") for f in m["files"])
    with pytest.raises(FileExistsError):
        create_snapshot(idx, repo, "s1")
    dest = str(tmp_path / "r2")
    restore_snapshot(repo, "s1", dest)
    with pytest.raises(FileExistsError):
        restore_snapshot(repo, "s1", dest)
    with pytest.raises(FileNotFoundError):
        restore_snapshot(repo, "nope", str(tmp_path / "r3"))
    delete_snapshot(repo, "s1")
    assert list_snapshots(repo) == []


def test_snapshot_survives_source_mutation(spark, idx, tmp_path):
    repo = str(tmp_path / "repo")
    create_snapshot(idx, repo, "before")
    before = IncrementalIndexReader(spark, idx).search_df(Q, k=10).collect()
    # mutate the source after the snapshot
    kill = (
        IncrementalIndexReader(spark, idx).live_docs()
        .orderBy("doc_id").limit(10)
        .select("repo", "path", "commit")
        .withColumn("_optype", F.lit("delete"))
    )
    apply_incremental(spark, idx, kill)
    dest = str(tmp_path / "asof")
    restore_snapshot(repo, "before", dest)
    got = IncrementalIndexReader(spark, dest).search_df(Q, k=10).collect()
    assert [(x["segment"], x["doc_id"]) for x in got] == [
        (x["segment"], x["doc_id"]) for x in before
    ]
