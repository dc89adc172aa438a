"""ES top_hits sub-aggregation on both readers: bucket selection and
per-bucket hit ranking vs a brute model from match_df + docs metadata;
live upsert/delete behavior on the incremental reader.
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

Q = "merge segment stream"


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("th") / "idx")
    corpus = synthetic_corpus(spark, n_files=180, seed=101).cache()
    IndexBuilder(spark, d, partitions=4).build(corpus, resume=False)
    return d, corpus


def _brute(spark, d, r):
    matches = {row["doc_id"]: row["score"] for row in r.match_df(Q).collect()}
    meta = {
        row["doc_id"]: row["lang"]
        for row in spark.read.parquet(f"{d}/docs").select("doc_id", "lang").collect()
    }
    buckets: dict = {}
    for did, s in matches.items():
        buckets.setdefault(meta[did], []).append((did, s))
    for v in buckets.values():
        v.sort(key=lambda t: (-t[1], t[0]))
    return buckets


def test_top_hits_base(spark, idx):
    d, _ = idx
    r = IndexReader(spark, d)
    buckets = _brute(spark, d, r)
    order = sorted(buckets, key=lambda g: (-len(buckets[g]), g))
    n_buckets, size = 3, 2
    got = r.top_hits_df(Q, "lang", n_buckets=n_buckets, size=size).collect()
    want = []
    for g in order[:n_buckets]:
        for rank, (did, s) in enumerate(buckets[g][:size], start=1):
            want.append((g, len(buckets[g]), rank, did, s))
    assert [
        (row["lang"], row["bucket_count"], row["hit_rank"], row["doc_id"])
        for row in got
    ] == [(g, n, rk, did) for g, n, rk, did, _ in want]
    for row, (_, _, _, _, s) in zip(got, want):
        assert row["score"] == pytest.approx(s, rel=1e-9)
    with pytest.raises(ValueError):
        r.top_hits_df(Q, "nope")


def test_top_hits_live(spark, idx, tmp_path):
    d0, corpus = idx
    d = str(tmp_path / "live")
    shutil.copytree(d0, d)
    ri0 = IncrementalIndexReader(spark, d)
    # delete the top hit of the biggest bucket: the runner-up inherits
    # and the bucket count drops by one
    first = ri0.top_hits_df(Q, "lang", n_buckets=1, size=2).collect()
    g, n0 = first[0]["lang"], first[0]["bucket_count"]
    head = (first[0]["segment"], first[0]["doc_id"])
    runner = (first[1]["segment"], first[1]["doc_id"])
    vdoc = (
        ri0.live_docs()
        .filter((F.col("segment") == head[0]) & (F.col("doc_id") == head[1]))
        .first()
    )
    dele = corpus.filter(
        (F.col("repo") == vdoc["repo"]) & (F.col("path") == vdoc["path"])
    ).withColumn("_optype", F.lit("delete"))
    apply_incremental(spark, d, dele)
    ri = IncrementalIndexReader(spark, d)
    after = ri.top_hits_df(Q, "lang", n_buckets=10, size=1).collect()
    by_g = {
        row["lang"]: (row["bucket_count"], (row["segment"], row["doc_id"]))
        for row in after
    }
    assert by_g[g][0] == n0 - 1
    assert by_g[g][1] == runner
