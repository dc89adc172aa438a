"""Point-in-time reader + scroll pagination: the ES PIT contract (frozen
view while writers keep landing batches) and the scroll contract (pages
partition the one-shot top-k, no duplicates, no gaps)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.index import (
    IncrementalIndexReader,
    IndexBuilder,
    IndexReader,
    PointInTimeReader,
    apply_incremental,
)
from elasticsearch_jdbc_spark.sources import synthetic_corpus


@pytest.fixture()
def idx(spark, tmp_path):
    d = str(tmp_path / "idx")
    corpus = synthetic_corpus(spark, n_files=150, seed=131)
    IndexBuilder(spark, d, partitions=4).build(corpus, resume=False)
    extra = (
        synthetic_corpus(spark, n_files=30, seed=132)
        .withColumn("path", F.concat(F.lit("extra/"), F.col("path")))
        .withColumn("_optype", F.lit("create"))
    )
    apply_incremental(spark, d, extra)
    return d


def _page_walk(reader, query, page_size, **kw):
    pages = list(reader.scroll(query, page_size=page_size, **kw))
    flat = [r for p in pages for r in p]
    return pages, flat


def test_scroll_base_reader_partitions_topk(spark, idx):
    r = IndexReader(spark, idx)
    want = r.search_df("merge segment buffer", k=40).collect()
    pages, flat = _page_walk(r, "merge segment buffer", page_size=7)
    got = flat[: len(want)]
    assert [x["doc_id"] for x in got] == [x["doc_id"] for x in want]
    for g, w in zip(got, want):
        assert g["score"] == pytest.approx(w["score"], rel=1e-9)
    # no duplicates across the whole walk
    assert len({x["doc_id"] for x in flat}) == len(flat)
    assert all(len(p) <= 7 for p in pages)


def test_scroll_incremental_reader(spark, idx):
    ri = IncrementalIndexReader(spark, idx)
    want = ri.search_df("merge segment buffer", k=40).collect()
    _pages, flat = _page_walk(ri, "merge segment buffer", page_size=9)
    got = flat[: len(want)]
    assert [(x["segment"], x["doc_id"]) for x in got] == [
        (x["segment"], x["doc_id"]) for x in want
    ]
    assert len({(x["segment"], x["doc_id"]) for x in flat}) == len(flat)


def test_scroll_no_hits_and_tiny_page(spark, idx):
    r = IndexReader(spark, idx)
    assert list(r.scroll("zzzznohit", page_size=5)) == []
    one = [row for p in r.scroll("merge", page_size=1) for row in p]
    topk = r.search_df("merge", k=len(one)).collect()
    assert [x["doc_id"] for x in one] == [x["doc_id"] for x in topk]


def test_sliced_scroll_partitions_match_set(spark, idx):
    """ES sliced scroll: slices are disjoint, their union is exactly the
    unsliced walk, ordering inside each slice is the global order
    restricted to it; composes with filter_sql; both reader tiers."""
    r = IndexReader(spark, idx)
    _p, full = _page_walk(r, "merge segment", page_size=11)
    full_ids = [x["doc_id"] for x in full]
    seen = []
    for i in range(3):
        _p, part = _page_walk(
            r, "merge segment", page_size=11, slice_spec=(i, 3)
        )
        ids = [x["doc_id"] for x in part]
        # slice order = global order restricted to the slice
        assert ids == [d for d in full_ids if d in set(ids)]
        seen.extend(ids)
    assert sorted(seen) == sorted(full_ids)  # disjoint + complete
    # composes with a caller filter
    _p, filt = _page_walk(
        r, "merge segment", page_size=11, slice_spec=(0, 3),
        filter_sql="lang = 'java'",
    )
    assert all(x["doc_id"] in set(full_ids) for x in filt)
    with pytest.raises(ValueError, match="slice_spec"):
        list(r.scroll("merge", slice_spec=(3, 3)))
    # live tier: same partition contract on (segment, doc_id) identity
    ri = IncrementalIndexReader(spark, idx)
    _p, lfull = _page_walk(ri, "merge segment", page_size=13)
    lkeys = [(x["segment"], x["doc_id"]) for x in lfull]
    lseen = []
    for i in range(2):
        _p, part = _page_walk(
            ri, "merge segment", page_size=13, slice_spec=(i, 2)
        )
        lseen.extend((x["segment"], x["doc_id"]) for x in part)
    assert sorted(lseen) == sorted(lkeys)


def test_pit_frozen_while_deletes_land(spark, idx):
    pit = PointInTimeReader(spark, idx)
    before_stats = (pit.n_docs, pit.avgdl)
    before = pit.search_df("merge segment", k=15).collect()
    assert before
    # a writer deletes some of those very docs AFTER the PIT opened
    victim_keys = (
        pit.live_docs()
        .join(
            pit.search_df("merge segment", k=5).select("segment", "doc_id"),
            ["segment", "doc_id"],
            "left_semi",
        )
        .select("repo", "path", "commit")
        .withColumn("_optype", F.lit("delete"))
    )
    res = apply_incremental(spark, idx, victim_keys)
    assert res["tombstones"] > 0
    # the PIT still serves the open-time view, scores identical
    after = pit.search_df("merge segment", k=15).collect()
    assert [(x["segment"], x["doc_id"]) for x in after] == [
        (x["segment"], x["doc_id"]) for x in before
    ]
    for a, b in zip(after, before):
        assert a["score"] == pytest.approx(b["score"], rel=1e-12)
    assert (pit.n_docs, pit.avgdl) == before_stats
    # a FRESH default reader sees the deletes (ES default visibility)
    fresh = IncrementalIndexReader(spark, idx)
    assert fresh.n_docs < pit.n_docs
    fresh_ids = {
        (x["segment"], x["doc_id"])
        for x in fresh.search_df("merge segment", k=15).collect()
    }
    deleted = {(x["segment"], x["doc_id"]) for x in before[:5]}
    assert not (fresh_ids & deleted)


def test_pit_scroll_spans_mutation(spark, idx):
    pit = PointInTimeReader(spark, idx)
    want = pit.search_df("merge segment buffer", k=30).collect()
    gen = pit.scroll("merge segment buffer", page_size=6)
    first = next(gen)
    # mutation lands mid-scroll
    kill = (
        pit.live_docs()
        .join(
            pit.search_df("merge segment buffer", k=10).select(
                "segment", "doc_id"
            ),
            ["segment", "doc_id"],
            "left_semi",
        )
        .select("repo", "path", "commit")
        .withColumn("_optype", F.lit("delete"))
    )
    apply_incremental(spark, idx, kill)
    rest = [r for p in gen for r in p]
    flat = (first + rest)[: len(want)]
    assert [(x["segment"], x["doc_id"]) for x in flat] == [
        (x["segment"], x["doc_id"]) for x in want
    ]


def test_pit_point_lookup_pinned(spark, idx):
    pit = PointInTimeReader(spark, idx)
    top = pit.search_df("merge", k=1).collect()[0]
    seg, did = top["segment"], top["doc_id"]
    assert not pit._is_tombstoned(seg, did)
    key = (
        pit.live_docs()
        .filter((F.col("segment") == seg) & (F.col("doc_id") == did))
        .select("repo", "path", "commit")
        .withColumn("_optype", F.lit("delete"))
    )
    apply_incremental(spark, idx, key)
    assert not pit._is_tombstoned(seg, did)  # pinned view
    assert IncrementalIndexReader(spark, idx)._is_tombstoned(seg, did)
