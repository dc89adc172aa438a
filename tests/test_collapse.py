"""ES field collapsing (`collapse` + `inner_hits`) on both readers:
group heads and inner hits checked against a brute-force model built from
match_df (itself oracle-checked) joined to the docs metadata, plus live
upsert/delete behavior on the incremental reader.
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
    d = str(tmp_path_factory.mktemp("clp") / "idx")
    corpus = synthetic_corpus(spark, n_files=180, seed=61).cache()
    IndexBuilder(spark, d, partitions=4).build(corpus, resume=False)
    return d, corpus


def _brute_groups(matches: dict, meta: dict) -> dict:
    """group value -> [(doc ident, score), ...] sorted by the collapse
    tie-break (score desc, ident asc). `matches` maps doc ident -> score,
    `meta` maps doc ident -> group value."""
    groups: dict = {}
    for ident, s in matches.items():
        groups.setdefault(meta[ident], []).append((ident, s))
    for g in groups.values():
        g.sort(key=lambda t: (-t[1], t[0]))
    return groups


def test_collapse_base_heads(spark, idx):
    d, _ = idx
    r = IndexReader(spark, d)
    matches = {row["doc_id"]: row["score"] for row in r.match_df(Q).collect()}
    meta = {
        row["doc_id"]: row["repo"]
        for row in spark.read.parquet(f"{d}/docs").select("doc_id", "repo").collect()
    }
    groups = _brute_groups(matches, {k: meta[k] for k in matches})
    heads = sorted(
        ((g, lst[0][0], lst[0][1]) for g, lst in groups.items()),
        key=lambda t: (-t[2], t[1]),
    )
    k = min(5, len(heads))
    got = r.collapse_df(Q, "repo", k=k).collect()
    assert [(row["repo"], row["doc_id"]) for row in got] == [
        (g, did) for g, did, _ in heads[:k]
    ]
    for row, (_, _, s) in zip(got, heads[:k]):
        assert row["score"] == pytest.approx(s, rel=1e-9)
        assert row["hit_rank"] == 1
    # one hit per group, always
    assert len({row["repo"] for row in got}) == len(got)


def test_collapse_base_inner_hits(spark, idx):
    d, _ = idx
    r = IndexReader(spark, d)
    matches = {row["doc_id"]: row["score"] for row in r.match_df(Q).collect()}
    meta = {
        row["doc_id"]: row["repo"]
        for row in spark.read.parquet(f"{d}/docs").select("doc_id", "repo").collect()
    }
    groups = _brute_groups(matches, {k: meta[k] for k in matches})
    heads = sorted(
        ((g, lst[0][1]) for g, lst in groups.items()), key=lambda t: (-t[1], t[0])
    )
    k, n_inner = 3, 3
    got = r.collapse_df(Q, "repo", k=k, inner_hits=n_inner).collect()
    want = []
    for g, _ in heads[:k]:
        for rank, (did, s) in enumerate(groups[g][:n_inner], start=1):
            want.append((g, did, s, rank))
    assert [(row["repo"], row["doc_id"], row["hit_rank"]) for row in got] == [
        (g, did, rank) for g, did, _, rank in want
    ]
    for row, (_, _, s, _) in zip(got, want):
        assert row["score"] == pytest.approx(s, rel=1e-9)


def test_collapse_validation(spark, idx):
    d, _ = idx
    r = IndexReader(spark, d)
    with pytest.raises(ValueError):
        r.collapse_df(Q, "no_such_col")
    with pytest.raises(ValueError):
        r.collapse_df(Q, "repo", inner_hits=0)


def test_collapse_live_upsert_delete(spark, idx, tmp_path):
    """Upserted docs collapse as their newest version; a deleted group
    head hands its group to the runner-up."""
    d0, corpus = idx
    d = str(tmp_path / "live")
    shutil.copytree(d0, d)
    r0 = IncrementalIndexReader(spark, d)
    base_heads = r0.collapse_df(Q, "repo", k=3).collect()
    head = base_heads[0]
    docs = spark.read.parquet(f"{d}/docs")
    hrow = docs.filter(F.col("doc_id") == head["doc_id"]).first()

    # upsert the head doc with content that still matches Q
    upd = (
        corpus.filter(
            (F.col("repo") == hrow["repo"]) & (F.col("path") == hrow["path"])
        )
        .withColumn("content", F.concat(F.col("content"), F.lit(" merge merge")))
        .withColumn("_optype", F.lit("update"))
    )
    apply_incremental(spark, d, upd)
    ri = IncrementalIndexReader(spark, d)
    got = ri.collapse_df(Q, "repo", k=10, inner_hits=5).collect()
    # the old base version of the upserted doc must be absent; the delta
    # version must be present in its group
    idents = {(row["segment"], row["doc_id"]) for row in got}
    assert ("", head["doc_id"]) not in idents or head["doc_id"] != hrow["doc_id"]
    assert any(seg.startswith("delta") for seg, _ in idents)

    # brute-force the live heads and compare
    matches = {
        (row["segment"], row["doc_id"]): row["score"]
        for row in ri.match_df(Q).collect()
    }
    meta = {
        (row["segment"], row["doc_id"]): row["repo"]
        for row in ri.live_docs().select("segment", "doc_id", "repo").collect()
    }
    rank = {s: ri._seg_rank(s) for s in ri.segments}
    groups: dict = {}
    for ident, s in matches.items():
        groups.setdefault(meta[ident], []).append((ident, s))
    for g in groups.values():
        # score desc, segment recency desc, doc_id asc
        g.sort(key=lambda t: (-t[1], -rank[t[0][0]], t[0][1]))
    heads = sorted(
        ((g, lst[0][0], lst[0][1]) for g, lst in groups.items()),
        key=lambda t: (-t[2], -rank[t[1][0]], t[1][1]),
    )
    live_heads = ri.collapse_df(Q, "repo", k=len(heads)).collect()
    assert [(row["repo"], (row["segment"], row["doc_id"])) for row in live_heads] == [
        (g, ident) for g, ident, _ in heads
    ]

    # delete the current head of the top group: the runner-up inherits
    top_group = heads[0][0]
    top_ident = heads[0][1]
    vdoc = (
        ri.live_docs()
        .filter((F.col("segment") == top_ident[0]) & (F.col("doc_id") == top_ident[1]))
        .first()
    )
    dele = corpus.filter(
        (F.col("repo") == vdoc["repo"]) & (F.col("path") == vdoc["path"])
    ).withColumn("_optype", F.lit("delete"))
    apply_incremental(spark, d, dele)
    ri2 = IncrementalIndexReader(spark, d)
    after = ri2.collapse_df(Q, "repo", k=len(heads)).collect()
    by_group = {row["repo"]: (row["segment"], row["doc_id"]) for row in after}
    if len(groups[top_group]) > 1:
        assert by_group[top_group] == groups[top_group][1][0]
    else:
        assert top_group not in by_group
