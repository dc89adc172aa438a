"""MultiIndexReader — ES multi-index (`GET /a,b/_search`) over sealed
member indexes: scores must be IDENTICAL to one merged index (exact
global stats — stricter than ES's default per-index idf)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.index import (
    IndexBuilder,
    IndexReader,
    MultiIndexReader,
    apply_incremental,
)
from elasticsearch_jdbc_spark.sources import synthetic_corpus

Q = "merge segment buffer"


@pytest.fixture()
def setup(spark, tmp_path):
    corpus = synthetic_corpus(spark, n_files=160, seed=99).cache()
    merged = str(tmp_path / "merged")
    IndexBuilder(spark, merged, partitions=4).build(corpus, resume=False)
    root = str(tmp_path / "root")
    half_a = corpus.filter(F.crc32(F.col("path")) % 2 == 0)
    half_b = corpus.filter(F.crc32(F.col("path")) % 2 == 1)
    IndexBuilder(spark, f"{root}/gen=a", partitions=4).build(half_a, resume=False)
    IndexBuilder(spark, f"{root}/gen=b", partitions=4).build(half_b, resume=False)
    return merged, root


def _keyed(spark, rows, docs_path, seg=False):
    docs = spark.read.parquet(docs_path)
    keymap = {
        r["doc_id"]: (r["repo"], r["path"], r["commit"]) for r in docs.collect()
    }
    return sorted(
        ((keymap[r["doc_id"]], round(r["score"], 9)) for r in rows),
        key=lambda t: (-t[1], t[0]),
    )


def test_scores_identical_to_merged(spark, setup):
    merged, root = setup
    rm = IndexReader(spark, merged)
    mr = MultiIndexReader(spark, root)
    assert mr.n_docs == rm.n_docs
    assert mr.avgdl == pytest.approx(rm.avgdl, rel=1e-12)
    want = rm.search_df(Q, k=25).collect()
    got = mr.search_df(Q, k=25).collect()
    want_keys = _keyed(spark, want, f"{merged}/docs")
    got_keyed = []
    for seg in mr.segments:
        seg_rows = [r for r in got if r["segment"] == seg]
        got_keyed += _keyed(spark, seg_rows, f"{root}/{seg}/docs")
    assert sorted(got_keyed, key=lambda t: (-t[1], t[0])) == want_keys
    # count / facet agree too
    assert mr.count(Q) == rm.count(Q)


def test_msearch_and_synonyms_over_members(spark, setup):
    merged, root = setup
    rm = IndexReader(spark, merged)
    mr = MultiIndexReader(spark, root)
    queries = [Q, "hash join"]
    wm = rm.msearch_df(queries, k=None).groupBy("query_id").count().collect()
    gm = mr.msearch_df(queries, k=None).groupBy("query_id").count().collect()
    assert {(r["query_id"], r["count"]) for r in gm} == {
        (r["query_id"], r["count"]) for r in wm
    }
    syn = {"merge": ["sort"]}
    assert mr.search_synonyms_df(Q, syn, k=None).count() == rm.search_synonyms_df(
        Q, syn, k=None
    ).count()


def test_indices_boost(spark, setup):
    merged, root = setup
    mr = MultiIndexReader(spark, root)
    base = {(r["segment"], r["doc_id"]): r["score"]
            for r in mr.search_df(Q, k=None).collect()}
    boosted = mr.search_df_boosted(Q, {"gen=a": 2.0}, k=None).collect()
    # every gen=a score exactly doubled, gen=b untouched
    for r in boosted:
        key = (r["segment"], r["doc_id"])
        mult = 2.0 if r["segment"] == "gen=a" else 1.0
        assert r["score"] == pytest.approx(base[key] * mult, rel=1e-12)
    # ranked cut reflects the boost: top-k recomputed from boosted scores
    topk = mr.search_df_boosted(Q, {"gen=a": 2.0}, k=5).collect()
    want = sorted(
        ((s, d, sc * (2.0 if s == "gen=a" else 1.0)) for (s, d), sc in base.items()),
        key=lambda t: (-t[2], t[0], t[1]),
    )[:5]
    assert [(r["segment"], r["doc_id"]) for r in topk] == [(s, d) for s, d, _ in want]
    with pytest.raises(ValueError, match="unknown member"):
        mr.search_df_boosted(Q, {"gen=zzz": 2.0})


def test_guards(spark, setup, tmp_path):
    merged, root = setup
    mr = MultiIndexReader(spark, root)
    with pytest.raises(ValueError, match="read-only"):
        mr.delete_by_query(Q)
    with pytest.raises(ValueError, match="read-only"):
        mr.update_by_query(Q, None)
    with pytest.raises(FileNotFoundError):
        MultiIndexReader(spark, root, pattern="nope*")
    # a member with live mutations is refused
    extra = (
        synthetic_corpus(spark, n_files=10, seed=3)
        .withColumn("path", F.concat(F.lit("x/"), F.col("path")))
        .withColumn("_optype", F.lit("create"))
    )
    apply_incremental(spark, f"{root}/gen=b", extra)
    with pytest.raises(ValueError, match="sealed"):
        MultiIndexReader(spark, root)
