"""ES percolator (reverse search): registered queries matched against
docs — distributed percolate_df (one pruned postings scan + broadcast
query-map join) and the driver-tier single-doc percolate, on both reader
tiers. Oracle-checked in the registry (percolate_index_search); here
brute-force parity with the tokenizer, msm forms, fields-index
namespacing, filter context, and live upsert/delete behavior.

Spec: the ES 2.x .percolator surface (reference README.md) — the
alerting/routing primitive for reference-fed indexes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.functions.tokenizer import tokenize_py
from elasticsearch_jdbc_spark.index import (
    IncrementalIndexReader,
    IndexBuilder,
    IndexReader,
    apply_incremental,
)
from elasticsearch_jdbc_spark.sources import synthetic_corpus

QUERIES = [
    (0, "merge segment buffer"),          # default msm=1 disjunction
    (1, "merge buffer", 2),               # conjunction via msm
    (2, "cluster config", "50%"),         # percentage msm
    (3, "zzzz absent term", 3),           # no hits
]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("perc") / "idx")
    corpus = synthetic_corpus(spark, n_files=150, seed=57).cache()
    IndexBuilder(spark, d, partitions=4).build(corpus, resume=False)
    return d, corpus


def _brute(r, corpus_rows):
    exp = {}
    for row in corpus_rows:
        have = set(tokenize_py(row["content"]))
        for q in QUERIES:
            qid, text, msm = (*q, 1)[:3]
            terms = r.query_terms(text)
            m = r._mlt_min_match(msm, len(terms))
            n = sum(1 for t in terms if t in have)
            if n >= m:
                exp[(qid, row["repo"], row["path"])] = n
    return exp


def test_percolate_df_matches_bruteforce(spark, idx):
    d, corpus = idx
    r = IndexReader(spark, d)
    docs = spark.read.parquet(f"{d}/docs").select("doc_id", "repo", "path")
    got = {
        (row["query_id"], row["repo"], row["path"]): row["matched"]
        for row in r.percolate_df(QUERIES).join(docs, "doc_id").collect()
    }
    exp = _brute(r, corpus.collect())
    assert got == exp
    assert not any(qid == 3 for qid, _, _ in got)
    assert any(qid == 1 for qid, _, _ in got)  # conjunction does hit


def test_percolate_driver_tier_agrees(spark, idx):
    d, _ = idx
    r = IndexReader(spark, d)
    row = (
        spark.read.parquet(f"{d}/docs").orderBy("doc_id").collect()[9]
    )
    like = {"repo": row["repo"], "path": row["path"]}
    drv = {(h["query_id"], h["matched"]) for h in r.percolate(like, QUERIES)}
    dist = {
        (h["query_id"], h["matched"])
        for h in r.percolate_df(QUERIES).filter(
            F.col("doc_id") == row["doc_id"]
        ).collect()
    }
    assert drv == dist
    # raw-text percolation needs no indexed doc
    hits = r.percolate("merge merge buffer seek", QUERIES)
    assert {h["query_id"] for h in hits} == {0, 1}


def test_percolate_filter_context(spark, idx):
    d, _ = idx
    r = IndexReader(spark, d)
    allowed = {
        row["doc_id"]
        for row in spark.read.parquet(f"{d}/docs").filter("dl > 120").collect()
    }
    out = r.percolate_df(QUERIES, filter_sql="dl > 120").collect()
    assert out and all(row["doc_id"] in allowed for row in out)


def test_percolate_fields_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("percf") / "idx")
    docs = spark.createDataFrame(
        [
            ("r", "0", "c", "t", "alpha beta", "gamma delta"),
            ("r", "1", "c", "t", "alpha only", "no match here"),
        ],
        "repo string, path string, commit string, lang string, "
        "title string, body string",
    )
    IndexBuilder(spark, d, partitions=2, fields=["title", "body"]).build(
        docs, resume=False
    )
    r = IndexReader(spark, d)
    qs = [(0, "alpha gamma", 2), (1, "beta", 1)]
    ids = {row["path"]: row["doc_id"] for row in spark.read.parquet(f"{d}/docs").collect()}
    # field=None: match across ALL fields -> doc 0 has alpha (title) AND
    # gamma (body); doc 1 has only alpha
    got = {(row["query_id"], row["doc_id"]) for row in r.percolate_df(qs).collect()}
    assert got == {(0, ids["0"]), (1, ids["0"])}
    # field='title': gamma no longer visible -> query 0 drops out
    got_t = {
        (row["query_id"], row["doc_id"])
        for row in r.percolate_df(qs, field="title").collect()
    }
    assert got_t == {(1, ids["0"])}
    with pytest.raises(ValueError):
        r.percolate_df(qs, field="nope")


def test_percolate_incremental_upsert_delete(spark, idx, tmp_path_factory):
    d, corpus = idx
    import shutil

    live = str(tmp_path_factory.mktemp("percl")) + "/idx"
    shutil.copytree(d, live)
    rows = corpus.orderBy("repo", "path").collect()
    up, dele = rows[2], rows[5]
    ops = spark.createDataFrame(
        [
            (up["repo"], up["path"], up["commit"], up["lang"],
             "merge merge merge", "update"),
            (dele["repo"], dele["path"], dele["commit"], dele["lang"],
             "", "delete"),
        ],
        "repo string, path string, commit string, lang string, "
        "content string, _optype string",
    )
    apply_incremental(spark, live, ops)
    r = IncrementalIndexReader(spark, live)
    docs = None
    for s in r.segments:
        p = (
            spark.read.parquet(f"{live}/{s}/docs" if s else f"{live}/docs")
            .select("doc_id", "repo", "path")
            .withColumn("segment", F.lit(s))
        )
        docs = p if docs is None else docs.unionByName(p)
    out = r.percolate_df(QUERIES).join(docs, ["segment", "doc_id"]).collect()
    by_key = {}
    for row in out:
        by_key.setdefault((row["repo"], row["path"]), []).append(row)
    # deleted doc percolates nothing
    assert (dele["repo"], dele["path"]) not in by_key
    # upserted doc percolates as its NEW content: only query 0 (merge), matched=1
    got_up = {(r2["query_id"], r2["matched"]) for r2 in by_key[(up["repo"], up["path"])]}
    assert got_up == {(0, 1)}
    # and only from the delta segment
    assert all(
        r2["segment"].startswith("delta=")
        for r2 in by_key[(up["repo"], up["path"])]
    )
    # driver tier: live resolution + deleted -> KeyError
    assert r.percolate({"repo": up["repo"], "path": up["path"]}, QUERIES) == [
        {"query_id": 0, "matched": 1}
    ]
    with pytest.raises(KeyError):
        r.percolate({"repo": dele["repo"], "path": dele["path"]}, QUERIES)
