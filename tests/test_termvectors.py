"""ES _termvectors / _mtermvectors analogues: per-doc term statistics
(term_freq, in-doc positions, global doc_freq/ttf) on both reader tiers —
the driver point-read path and the distributed mtermvectors_df scan.
Oracle-checked in the registry (termvectors_index_search); here brute-force
parity with the tokenizer, fields-index semantics, and live-index
(upsert/delete) behavior.

Spec: the ES Term Vectors API served by reference-built indexes
(reference README.md documents the ES 2.x surface the river feeds).
"""

from __future__ import annotations

from collections import Counter

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


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tv") / "idx")
    corpus = synthetic_corpus(spark, n_files=150, seed=33).cache()
    IndexBuilder(spark, d, partitions=4).build(corpus, resume=False)
    return d, corpus


def _doc(spark, idx_dir, corpus, nth=0):
    row = (
        spark.read.parquet(f"{idx_dir}/docs")
        .orderBy("doc_id")
        .collect()[nth]
    )
    like = {"repo": row["repo"], "path": row["path"]}
    content = (
        corpus.filter(
            (F.col("repo") == like["repo"]) & (F.col("path") == like["path"])
        )
        .collect()[0]["content"]
    )
    return like, row["doc_id"], tokenize_py(content)


def test_termvectors_matches_tokenizer(spark, idx):
    d, corpus = idx
    r = IndexReader(spark, d)
    like, doc_id, toks = _doc(spark, d, corpus, nth=3)
    tv = r.termvectors(like)
    assert tv["found"] and tv["doc_id"] == doc_id
    tf = Counter(toks)
    assert set(tv["terms"]) == set(tf)
    for t, c in tf.items():
        e = tv["terms"][t]
        assert e["term_freq"] == c
        assert e["positions"] == [i for i, x in enumerate(toks) if x == t]
        assert e["doc_freq"] >= 1
        assert e["ttf"] >= e["term_freq"]
    fs = tv["field_statistics"]
    assert fs["doc_count"] == r.n_docs
    assert fs["sum_ttf"] == int(round(r.avgdl * r.n_docs))


def test_mtermvectors_df_matches_driver(spark, idx):
    d, corpus = idx
    r = IndexReader(spark, d)
    like_a, id_a, toks_a = _doc(spark, d, corpus, nth=1)
    like_b, id_b, toks_b = _doc(spark, d, corpus, nth=5)
    rows = r.mtermvectors_df(likes=[like_a, like_b]).collect()
    by_doc: dict[int, dict[str, dict]] = {}
    for row in rows:
        by_doc.setdefault(row["doc_id"], {})[row["term"]] = row
    assert set(by_doc) == {id_a, id_b}
    for doc_id, toks, like in ((id_a, toks_a, like_a), (id_b, toks_b, like_b)):
        tv = r.termvectors(like)
        got = by_doc[doc_id]
        assert set(got) == set(tv["terms"])
        for t, e in tv["terms"].items():
            g = got[t]
            assert g["term_freq"] == e["term_freq"]
            assert list(g["positions"]) == e["positions"]
            assert g["doc_freq"] == e["doc_freq"]
            assert g["ttf"] == e["ttf"]


def test_mtermvectors_filter_and_flags(spark, idx):
    d, _ = idx
    r = IndexReader(spark, d)
    out = r.mtermvectors_df(
        filter_sql="dl > 100", term_statistics=False, positions=False
    )
    assert set(out.columns) == {"doc_id", "term", "term_freq"}
    docs = spark.read.parquet(f"{d}/docs").filter("dl > 100")
    assert (
        out.select("doc_id").distinct().count() == docs.count()
    )
    # sum of term_freq per doc == dl (every token accounted for once)
    chk = (
        out.groupBy("doc_id").agg(F.sum("term_freq").alias("s"))
        .join(docs.select("doc_id", "dl"), "doc_id")
        .filter("s <> dl")
        .count()
    )
    assert chk == 0


def test_termvectors_fields_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tvf") / "idx")
    docs = spark.createDataFrame(
        [
            ("r", "0", "c", "t", "spark engine spark", "body words here"),
            ("r", "1", "c", "t", "other title", "spark in body twice spark"),
        ],
        "repo string, path string, commit string, lang string, "
        "title string, body string",
    )
    IndexBuilder(spark, d, partitions=2, fields=["title", "body"]).build(
        docs, resume=False
    )
    r = IndexReader(spark, d)
    tv = r.termvectors({"path": "0"}, field="title")
    # field-local positions: 'spark engine spark' -> spark@[0,2]
    assert tv["terms"]["spark"]["positions"] == [0, 2]
    assert tv["terms"]["spark"]["term_freq"] == 2
    assert tv["terms"]["spark"]["doc_freq"] == 1  # title-namespace df
    assert "body" not in tv["terms"] and "words" not in tv["terms"]
    # distributed twin agrees, including the namespace-scoped stats
    rows = {
        row["term"]: row
        for row in r.mtermvectors_df(
            likes=[{"path": "0"}], field="title"
        ).collect()
    }
    assert list(rows["spark"]["positions"]) == [0, 2]
    assert rows["spark"]["doc_freq"] == 1
    # body field of doc 1: spark df is per-namespace too
    tv1 = r.termvectors({"path": "1"}, field="body")
    assert tv1["terms"]["spark"]["term_freq"] == 2
    # no field on a fields index / field on a plain index -> errors
    with pytest.raises(ValueError):
        r.termvectors({"path": "0"})
    # field=None distributed: every field surfaced with a field column
    allf = r.mtermvectors_df(likes=[{"path": "0"}])
    assert "field" in allf.columns
    assert set(row["field"] for row in allf.collect()) == {"title", "body"}


def test_termvectors_plain_index_rejects_field(spark, idx):
    d, _ = idx
    r = IndexReader(spark, d)
    with pytest.raises(ValueError):
        r.termvectors({"path": "whatever"}, field="title")


@pytest.fixture(scope="module")
def live_idx(spark, tmp_path_factory, idx):
    """base + one delta that UPSERTS one doc (content doubled) and DELETES
    another."""
    d, corpus = idx
    root = str(tmp_path_factory.mktemp("tvlive"))
    import shutil

    live = f"{root}/idx"
    shutil.copytree(d, live)
    up_like, up_id, up_toks = _doc(spark, d, corpus, nth=2)
    del_like, del_id, _ = _doc(spark, d, corpus, nth=7)
    base_row = corpus.filter(
        (F.col("repo") == up_like["repo"]) & (F.col("path") == up_like["path"])
    ).collect()[0]
    del_row = corpus.filter(
        (F.col("repo") == del_like["repo"]) & (F.col("path") == del_like["path"])
    ).collect()[0]
    ops = spark.createDataFrame(
        [
            (
                base_row["repo"], base_row["path"], base_row["commit"],
                base_row["lang"],
                base_row["content"] + " " + base_row["content"],
                "update",
            ),
            (
                del_row["repo"], del_row["path"], del_row["commit"],
                del_row["lang"], "", "delete",
            ),
        ],
        "repo string, path string, commit string, lang string, "
        "content string, _optype string",
    )
    apply_incremental(spark, live, ops)
    return live, up_like, up_toks, del_like


def test_incremental_termvectors_upsert_and_delete(spark, live_idx):
    live, up_like, up_toks, del_like = live_idx
    r = IncrementalIndexReader(spark, live)
    tv = r.termvectors(up_like)
    assert tv["found"] and tv["segment"].startswith("delta=")
    # newest version wins: doubled content -> term_freq doubled
    tf = Counter(up_toks)
    for t, c in tf.items():
        assert tv["terms"][t]["term_freq"] == 2 * c
    # global stats count masked docs (Lucene deleted-docs rule): the old
    # version still counts, so df >= 2 for the upserted doc's terms
    assert all(e["doc_freq"] >= 2 for e in tv["terms"].values())
    # deleted doc: found=False like mget
    assert r.termvectors(del_like) == {"found": False, **del_like}


def test_incremental_mtermvectors_masks_tombstones(spark, live_idx):
    live, up_like, up_toks, del_like = live_idx
    r = IncrementalIndexReader(spark, live)
    out = r.mtermvectors_df(likes=[up_like, del_like], positions=False)
    rows = out.collect()
    # only the delta's upserted version survives; the deleted doc and the
    # tombstoned old version are gone
    segs = {row["segment"] for row in rows}
    assert segs == {r.segments[-1]}
    got = {row["term"]: row["term_freq"] for row in rows}
    tf = Counter(up_toks)
    assert got == {t: 2 * c for t, c in tf.items()}
    # driver and distributed global stats agree
    tv = r.termvectors(up_like)
    by_term = {row["term"]: row for row in rows}
    for t, e in tv["terms"].items():
        assert by_term[t]["doc_freq"] == e["doc_freq"]
        assert by_term[t]["ttf"] == e["ttf"]
