"""ES more_like_this: tf*idf interesting-term selection + 30%-mSM
disjunction. Oracle-checked in the registry (mlt_index_search); here the
self-similarity property, doc resolution, and live-index behavior."""

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


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mlt") / "idx")
    corpus = synthetic_corpus(spark, n_files=200, seed=95).cache()
    IndexBuilder(spark, d, partitions=4).build(corpus, resume=False)
    return d, corpus


def _a_key(spark, idx_dir):
    row = (
        spark.read.parquet(f"{idx_dir}/docs")
        .orderBy("doc_id")
        .select("repo", "path", "doc_id")
        .first()
    )
    return {"repo": row["repo"], "path": row["path"]}, row["doc_id"]


def test_base_mlt_doc_and_text(spark, idx):
    d, _corpus = idx
    r = IndexReader(spark, d)
    like, src_id = _a_key(spark, d)
    got = r.more_like_this_df(like, k=8).collect()
    assert got and all(row["doc_id"] != src_id for row in got)
    # a doc is most like itself: with exclusion off it ranks first
    incl = r.more_like_this_df(like, k=3, exclude_self=False).collect()
    assert incl[0]["doc_id"] == src_id
    # free-text likeness
    txt = r.more_like_this_df(
        "merge merge segment segment buffer buffer stream stream", k=5
    ).collect()
    assert txt


def test_base_mlt_errors(spark, idx):
    d, _ = idx
    r = IndexReader(spark, d)
    with pytest.raises(KeyError):
        r.more_like_this_df({"path": "no/such/doc.txt"}, k=3)
    with pytest.raises(ValueError):
        r.more_like_this_df({"bogus_col": "x"}, k=3)
    # all-rare text -> no selectable terms -> empty frame, not an error
    assert r.more_like_this_df("zzq yyx wwv", k=3).count() == 0


def test_incremental_matches_base_without_deltas(spark, idx):
    d, _ = idx
    like, _src = _a_key(spark, d)
    base = [
        (row["doc_id"], round(row["score"], 9))
        for row in IndexReader(spark, d).more_like_this_df(like, k=9).collect()
    ]
    live = [
        (row["doc_id"], round(row["score"], 9))
        for row in IncrementalIndexReader(spark, d)
        .more_like_this_df(like, k=9)
        .collect()
    ]
    assert [(d_, s) for d_, s in live] == base


def test_incremental_resolves_newest_live(spark, idx, tmp_path):
    import shutil

    d0, corpus = idx
    d = str(tmp_path / "mlt_live")
    shutil.copytree(d0, d)
    like, _src = _a_key(spark, d)
    # upsert the source doc with rewritten content (marker tokens x3 so
    # they pass min_term_freq)
    newrow = (
        corpus.filter(
            (F.col("repo") == like["repo"]) & (F.col("path") == like["path"])
        )
        .withColumn(
            "content",
            F.concat(F.col("content"), F.lit(" zzmark zzmark zzmark")),
        )
        .withColumn("_optype", F.lit("update"))
    )
    apply_incremental(spark, d, newrow)
    ri = IncrementalIndexReader(spark, d)
    got = ri.more_like_this_df(like, k=6, exclude_self=False).collect()
    assert got
    # the NEWEST (delta) version is the self-hit at rank 1
    top = got[0]
    assert top["segment"] != "" and top["segment"].startswith("delta")
    # with exclusion on, that live version disappears
    excl = ri.more_like_this_df(like, k=6).collect()
    assert all(
        (row["segment"], row["doc_id"]) != (top["segment"], top["doc_id"])
        for row in excl
    )


def test_mlt_fields_restriction_on_doc_reference(spark, tmp_path):
    """ES MLT `fields` with a DOC-REFERENCE like on a fields corpus:
    term selection must draw only from the requested fields' namespaces
    (regression: the restriction was validated, then silently ignored).
    Both tiers."""
    d = str(tmp_path / "fidx")
    docs = [
        ("r", f"{i}", "c", "t",
         "merge merge segment segment buffer buffer",
         "zebra zebra yonder yonder quill quill")
        for i in range(30)
    ]
    IndexBuilder(spark, d, partitions=2, fields=["content", "extra"]).build(
        spark.createDataFrame(
            docs,
            "repo string, path string, commit string, lang string,"
            " content string, extra string",
        ),
        resume=False,
    )
    like = {"repo": "r", "path": "0"}
    for r in (IndexReader(spark, d), IncrementalIndexReader(spark, d)):
        hits = r.more_like_this_df(
            like, k=5, min_term_freq=1, min_doc_freq=1,
            min_should_match=1, fields=["extra"],
        )
        assert hits.count() > 0
        # restricting to a namespace with NO overlap vs content terms:
        # selection from 'extra' only — the same like restricted to
        # 'content' must select a disjoint term set; prove it via the
        # base reader's selection hook
        r0 = r.readers[r.segments[0]] if hasattr(r, "segments") else r
        sel_extra, _ = r0._mlt_select_terms(
            like, 25, 1, 1, fields=["extra"])
        sel_content, _ = r0._mlt_select_terms(
            like, 25, 1, 1, fields=["content"])
        assert sel_extra and all(t.startswith("extra\x1f") for t in sel_extra)
        assert sel_content and all(
            t.startswith("content\x1f") for t in sel_content)
        # a typo'd field on a DOC REFERENCE errors (it used to silently
        # select zero terms on the live tier)
        with pytest.raises(ValueError, match="unknown MLT fields"):
            r.more_like_this_df(like, fields=["titel"])
