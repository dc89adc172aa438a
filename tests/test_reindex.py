"""reindex_to — the ES `_reindex` analogue: copy the live docs matching a
query (and/or a metadata filter) into a fresh index, one tokenized-
checkpoint scan + one pretokenized build, never re-tokenizing."""

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

Q = "merge segment buffer"


@pytest.fixture()
def idx(spark, tmp_path):
    d = str(tmp_path / "src")
    corpus = synthetic_corpus(spark, n_files=160, seed=57)
    IndexBuilder(spark, d, partitions=4).build(corpus, resume=False)
    # live mutations: a delta of upserts + a few deletes, so reindex must
    # resolve newest versions and skip tombstoned docs
    upd = (
        corpus.limit(12)
        .withColumn("content", F.concat(F.col("content"), F.lit(" reindexed marker")))
        .withColumn("_optype", F.lit("update"))
    )
    apply_incremental(spark, d, upd)
    kill = (
        corpus.orderBy("path").limit(5)
        .select("repo", "path", "commit")
        .withColumn("_optype", F.lit("delete"))
    )
    apply_incremental(spark, d, kill)
    return d


def test_reindex_by_query(spark, idx, tmp_path):
    src = IncrementalIndexReader(spark, idx)
    dest = str(tmp_path / "dest_q")
    matched = src.match_df(Q).count()
    manifest = src.reindex_to(dest, query=Q)
    assert manifest["n_docs"] == matched
    # the copy serves searches, and every copied doc matches the query in
    # the source (identity via keys)
    r = IndexReader(spark, dest)
    assert r.search(Q, k=5)
    copied_keys = {
        (x["repo"], x["path"], x["commit"])
        for x in spark.read.parquet(f"{dest}/docs").collect()
    }
    src_match_keys = {
        (x["repo"], x["path"], x["commit"])
        for x in src.live_docs()
        .join(src.match_df(Q).select("segment", "doc_id"),
              ["segment", "doc_id"], "left_semi")
        .collect()
    }
    assert copied_keys == src_match_keys


def test_reindex_filter_only_and_full(spark, idx, tmp_path):
    src = IncrementalIndexReader(spark, idx)
    langs = [r["lang"] for r in src.live_docs().select("lang").distinct().collect()]
    pick = sorted(langs)[0]
    dest = str(tmp_path / "dest_f")
    manifest = src.reindex_to(dest, filter_sql=f"lang = '{pick}'")
    want = src.live_docs().filter(F.col("lang") == pick).count()
    assert manifest["n_docs"] == want
    assert set(
        x["lang"] for x in spark.read.parquet(f"{dest}/docs").select("lang").collect()
    ) == {pick}
    # no query/filter = full copy (compact_to equivalence on doc count)
    dest_all = str(tmp_path / "dest_all")
    assert src.reindex_to(dest_all)["n_docs"] == src.n_docs


def test_reindex_script_and_guards(spark, idx, tmp_path):
    src = IncrementalIndexReader(spark, idx)
    dest = str(tmp_path / "dest_s")
    src.reindex_to(dest, query=Q, set_exprs={"lang": "'go'"})
    assert set(
        x["lang"] for x in spark.read.parquet(f"{dest}/docs").select("lang").collect()
    ) == {"go"}
    with pytest.raises(ValueError, match="tokens"):
        src.reindex_to(str(tmp_path / "x"), set_exprs={"tokens": "array()"})


def test_reindex_copies_newest_versions(spark, idx, tmp_path):
    src = IncrementalIndexReader(spark, idx)
    dest = str(tmp_path / "dest_v")
    src.reindex_to(dest, query="reindexed marker")
    r = IndexReader(spark, dest)
    # only the upserted versions carry the marker; all 12 minus any deleted
    live_marked = src.match_df("reindexed marker").count()
    assert r.n_docs == live_marked
    assert live_marked > 0
