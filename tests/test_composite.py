"""ES composite aggregation (multi-source buckets + after-key pagination)
on both readers: bucket relation and page-walk checked against a brute
model from match_df + docs metadata; upserts re-bucket as their newest
version on the live reader.
"""

from __future__ import annotations

import math
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
SOURCES = [("lang", "lang"), ("dl_bucket", ("dl", 20))]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cmp") / "idx")
    corpus = synthetic_corpus(spark, n_files=200, seed=77).cache()
    IndexBuilder(spark, d, partitions=4).build(corpus, resume=False)
    return d, corpus


def _brute_buckets(spark, d, reader):
    matches = {row["doc_id"] for row in reader.match_df(Q).collect()}
    meta = {
        row["doc_id"]: (row["lang"], row["dl"])
        for row in spark.read.parquet(f"{d}/docs")
        .select("doc_id", "lang", "dl")
        .collect()
    }
    buckets: dict = {}
    for did in matches:
        lang, dl = meta[did]
        key = (lang, math.floor(dl / 20) * 20.0)
        buckets.setdefault(key, []).append(dl)
    return buckets


def test_composite_full_relation_and_metrics(spark, idx):
    d, _ = idx
    r = IndexReader(spark, d)
    buckets = _brute_buckets(spark, d, r)
    got = r.composite_df(
        Q, SOURCES, size=10_000, metrics={"avg_dl": ("avg", "dl")}
    ).collect()
    assert [(row["lang"], row["dl_bucket"]) for row in got] == sorted(buckets)
    for row in got:
        key = (row["lang"], row["dl_bucket"])
        assert row["n_docs"] == len(buckets[key])
        assert row["avg_dl"] == pytest.approx(
            sum(buckets[key]) / len(buckets[key]), rel=1e-9
        )


def test_composite_page_walk(spark, idx):
    """Walking pages with after reconstructs the full ordered bucket list
    with no gaps or duplicates — the ES pagination contract."""
    d, _ = idx
    r = IndexReader(spark, d)
    want = sorted(_brute_buckets(spark, d, r))
    seen, after, pages = [], None, 0
    while True:
        page = r.composite_df(Q, SOURCES, size=4, after=after).collect()
        if not page:
            break
        seen += [(row["lang"], row["dl_bucket"]) for row in page]
        after = (page[-1]["lang"], page[-1]["dl_bucket"])
        pages += 1
        assert pages < 100
    assert seen == want
    assert pages == math.ceil(len(want) / 4)


def test_composite_validation(spark, idx):
    d, _ = idx
    r = IndexReader(spark, d)
    with pytest.raises(ValueError):
        r.composite_df(Q, [])
    with pytest.raises(ValueError):
        r.composite_df(Q, [("a", "lang"), ("a", "repo")])
    with pytest.raises(ValueError):
        r.composite_df(Q, [("h", ("dl", 0))])
    with pytest.raises(ValueError):
        r.composite_df(Q, SOURCES, after=("en",))
    with pytest.raises(ValueError):
        r.composite_df(Q, SOURCES, metrics={"m": ("avg", "nope")})


def test_composite_live_upsert_rebuckets(spark, idx, tmp_path):
    d0, corpus = idx
    d = str(tmp_path / "live")
    shutil.copytree(d0, d)
    ri0 = IncrementalIndexReader(spark, d)
    full0 = {
        (row["lang"], row["dl_bucket"]): row["n_docs"]
        for row in ri0.composite_df(Q, SOURCES, size=10_000).collect()
    }
    # upsert one matching doc with much longer content -> its dl bucket moves
    hit = ri0.search_df(Q, k=1).collect()[0]
    vdoc = (
        ri0.live_docs()
        .filter(
            (F.col("segment") == hit["segment"])
            & (F.col("doc_id") == hit["doc_id"])
        )
        .first()
    )
    upd = (
        corpus.filter(
            (F.col("repo") == vdoc["repo"]) & (F.col("path") == vdoc["path"])
        )
        .withColumn(
            "content",
            F.concat(F.col("content"), F.lit(" pad" * 600 + " merge")),
        )
        .withColumn("_optype", F.lit("update"))
    )
    apply_incremental(spark, d, upd)
    ri = IncrementalIndexReader(spark, d)
    # brute from the live reader itself
    matches = {
        (row["segment"], row["doc_id"]) for row in ri.match_df(Q).collect()
    }
    meta = {
        (row["segment"], row["doc_id"]): (row["lang"], row["dl"])
        for row in ri.live_docs().select("segment", "doc_id", "lang", "dl").collect()
    }
    want: dict = {}
    for ident in matches:
        lang, dl = meta[ident]
        key = (lang, math.floor(dl / 20) * 20.0)
        want[key] = want.get(key, 0) + 1
    got = {
        (row["lang"], row["dl_bucket"]): row["n_docs"]
        for row in ri.composite_df(Q, SOURCES, size=10_000).collect()
    }
    assert got == want
    assert got != full0, "the moved doc must change the bucket relation"
