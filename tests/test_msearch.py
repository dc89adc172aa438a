"""ES _msearch analogue: the whole query batch in ONE postings scan.

Contract: per query, msearch_df is rank- and score-identical to
search_df(query) on both readers (base and live incremental), for ranked
(k), unranked (k=None), min_should_match, boosted-fields and
filter-context variants. The reference delegates multi-search to ES
(_msearch bulk endpoint); here the batch amortizes the scan + shuffle,
which is the 10^12-file way to run a query set.
"""

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

QUERIES = [
    "merge segment buffer",
    "hash join filter",
    "stream window batch row",
    "zzzznotaterm",  # fully OOV: contributes no rows, must not break others
]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("msearch") / "idx")
    corpus = synthetic_corpus(spark, n_files=300, seed=77).cache()
    b = IndexBuilder(spark, d, partitions=4)
    b.reset()
    b.build(corpus, resume=False)
    extra = (
        synthetic_corpus(spark, n_files=60, seed=78)
        .withColumn("path", F.concat(F.lit("extra/"), F.col("path")))
        .withColumn("_optype", F.lit("create"))
    )
    apply_incremental(spark, d, extra)
    # tombstone a handful of base docs so the anti-join is exercised
    dels = (
        synthetic_corpus(spark, n_files=10, seed=77)
        .select("repo", "path", "commit")
        .withColumn("lang", F.lit(""))
        .withColumn("content", F.lit(""))
        .withColumn("_optype", F.lit("delete"))
    )
    apply_incremental(spark, d, dels)
    return d


def _ranked(rows, id_cols):
    return [tuple(r[c] for c in id_cols) for r in rows], [r["score"] for r in rows]


def test_base_msearch_rank_identical_per_query(spark, idx):
    r = IndexReader(spark, idx)
    got = r.msearch_df(QUERIES, k=7).orderBy("query_id", F.desc("score"), "doc_id").collect()
    by_q = {}
    for row in got:
        by_q.setdefault(row["query_id"], []).append(row)
    any_hits = False
    for qid, q in enumerate(QUERIES):
        want = r.search_df(q, k=7).collect()
        got_ids, got_scores = _ranked(by_q.get(qid, []), ["doc_id"])
        want_ids, want_scores = _ranked(want, ["doc_id"])
        assert got_ids == want_ids
        assert got_scores == pytest.approx(want_scores, rel=1e-9)
        any_hits = any_hits or bool(want_ids)
    assert any_hits
    assert 3 not in by_q  # OOV query: no rows


def test_base_msearch_unranked_and_msm(spark, idx):
    r = IndexReader(spark, idx)
    full = r.msearch_df(QUERIES[:3], k=None, min_should_match=2).collect()
    by_q = {}
    for row in full:
        by_q.setdefault(row["query_id"], {})[row["doc_id"]] = row["score"]
    hits = 0
    for qid, q in enumerate(QUERIES[:3]):
        want = {
            row["doc_id"]: row["score"]
            for row in r.search_df(q, k=None, min_should_match=2).collect()
        }
        got = by_q.get(qid, {})
        assert set(got) == set(want)
        hits += len(want)
        for d, s in got.items():
            assert s == pytest.approx(want[d], rel=1e-9)
    assert hits  # at least one query has multi-term matches


def test_base_msearch_filter_context(spark, idx):
    r = IndexReader(spark, idx)
    flt = "lang = 'java'"
    got = r.msearch_df(QUERIES[:2], k=5, filter_sql=flt).collect()
    by_q = {}
    for row in got:
        by_q.setdefault(row["query_id"], []).append(row)
    for qid, q in enumerate(QUERIES[:2]):
        want = r.search_df(q, k=5, filter_sql=flt).collect()
        assert _ranked(by_q.get(qid, []), ["doc_id"]) == (
            _ranked(want, ["doc_id"])[0],
            pytest.approx(_ranked(want, ["doc_id"])[1], rel=1e-9),
        )


def test_incremental_msearch_spans_segments(spark, idx):
    r = IncrementalIndexReader(spark, idx)
    assert len(r.segments) >= 2
    got = r.msearch_df(QUERIES, k=6).collect()
    by_q = {}
    for row in got:
        by_q.setdefault(row["query_id"], []).append(row)
    segs_seen = set()
    for qid, q in enumerate(QUERIES):
        want = r.search_df(q, k=6).collect()
        got_rows = sorted(
            by_q.get(qid, []), key=lambda x: (-x["score"], x["doc_id"])
        )
        got_ids, got_scores = _ranked(got_rows, ["segment", "doc_id"])
        want_ids, want_scores = _ranked(want, ["segment", "doc_id"])
        assert got_ids == want_ids
        assert got_scores == pytest.approx(want_scores, rel=1e-9)
        segs_seen |= {s for s, _ in got_ids}
    assert len(segs_seen) >= 2  # hits really span base + delta


def test_incremental_msearch_excludes_tombstones(spark, idx):
    r = IncrementalIndexReader(spark, idx)
    got = r.msearch_df(QUERIES[:3], k=None).collect()
    for row in got:
        assert not r._is_tombstoned(row["segment"], row["doc_id"])


def test_fields_msearch_with_boosts(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("msearch_mf") / "idx")
    docs = spark.createDataFrame(
        [
            ("r", "0", "c", "t", "spark engine", "a body about other things"),
            ("r", "1", "c", "t", "unrelated title", "spark spark spark body"),
            ("r", "2", "c", "t", "engine room", "machinery and boilers"),
            ("r", "3", "c", "t", "join order", "hash join body text"),
        ],
        "repo string, path string, commit string, lang string, "
        "title string, body string",
    )
    IndexBuilder(spark, d, partitions=2, fields=["title", "body"]).build(
        docs, resume=False
    )
    r = IndexReader(spark, d)
    boosts = {"title": 3.0, "body": 1.0}
    qs = ["spark engine", "hash join"]
    got = r.msearch_df(qs, k=4, boosts=boosts).collect()
    by_q = {}
    for row in got:
        by_q.setdefault(row["query_id"], []).append(row)
    for qid, q in enumerate(qs):
        want = r.search_fields_df(q, boosts=boosts, k=4).collect()
        got_rows = sorted(
            by_q.get(qid, []), key=lambda x: (-x["score"], x["doc_id"])
        )
        assert [x["doc_id"] for x in got_rows] == [x["doc_id"] for x in want]
        assert [x["score"] for x in got_rows] == pytest.approx(
            [x["score"] for x in want], rel=1e-9
        )


def test_msearch_empty_and_errors(spark, idx):
    r = IndexReader(spark, idx)
    assert r.msearch_df([]).count() == 0
    assert r.msearch_df(["zzzznotaterm"]).count() == 0
    with pytest.raises(ValueError):
        r.msearch_df(["x"], boosts={"title": 2.0})  # not a fields corpus
