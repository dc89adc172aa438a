"""ES terms-lookup query: a document's field values become the terms
set, resolved via one mget point read into a filter_sql fragment that
composes with every search surface; live tier resolves the newest
version."""

from __future__ import annotations

from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.index import (
    IncrementalIndexReader,
    IndexBuilder,
    IndexReader,
    apply_incremental,
)

DOCS = [
    ("r", "0", "c", "py", "merge segment", ["py", "go"]),
    ("r", "1", "c", "go", "merge segment", ["py"]),
    ("r", "2", "c", "rs", "merge segment", []),
    ("r", "3", "c", "py", "merge segment", ["rs"]),
]
SCHEMA = (
    "repo string, path string, commit string, lang string, content string,"
    " wants array<string>"
)


def _paths(r, df):
    rows = df.collect()
    docs = {x["doc_id"]: x["path"] for x in
            r.spark.read.parquet(f"{r.index_dir}/docs").collect()}
    return sorted(docs[x["doc_id"]] for x in rows)


def test_terms_lookup_base(spark, tmp_path):
    idx = str(tmp_path / "tl")
    IndexBuilder(spark, idx, partitions=2).build(
        spark.createDataFrame(DOCS, SCHEMA), resume=False
    )
    r = IndexReader(spark, idx)
    # doc 0's wants = [py, go] -> docs whose lang is in that set
    frag = r.terms_lookup({"path": "0"}, "wants", "lang")
    assert frag == "lang IN ('py', 'go')"
    assert _paths(r, r.search_df("merge", k=None, filter_sql=frag)) == ["0", "1", "3"]
    # array target: docs whose wants overlap doc 0's wants
    frag2 = r.terms_lookup({"path": "0"}, "wants", "wants", array_target=True)
    assert _paths(r, r.search_df("merge", k=None, filter_sql=frag2)) == ["0", "1"]
    # empty source array / missing doc -> match nothing
    assert r.terms_lookup({"path": "2"}, "wants", "lang") == "1 = 0"
    assert r.terms_lookup({"path": "zz"}, "wants", "lang") == "1 = 0"
    assert r.search_df("merge", k=None, filter_sql="1 = 0").count() == 0
    # scalar source field works too
    assert r.terms_lookup({"path": "1"}, "lang", "lang") == "lang IN ('go')"


def test_terms_lookup_live_newest_version(spark, tmp_path):
    idx = str(tmp_path / "tli")
    IndexBuilder(spark, idx, partitions=2).build(
        spark.createDataFrame(DOCS, SCHEMA), resume=False
    )
    ops = spark.createDataFrame(
        [("r", "0", "c", "py", "merge segment", ["rs"])], SCHEMA
    ).withColumn("_optype", F.lit("index"))
    apply_incremental(spark, idx, ops)
    r = IncrementalIndexReader(spark, idx)
    # lookup resolves the upserted (newest) version: wants = [rs]
    assert r.terms_lookup({"path": "0"}, "wants", "lang") == "lang IN ('rs')"


def test_terms_lookup_dsl_leaf(spark, tmp_path):
    """The ES lookup shape through the `terms` DSL leaf: the referenced
    doc's `path` field values become the terms set; filter-context
    constant score; missing doc matches nothing."""
    idx = str(tmp_path / "dslidx")
    docs = spark.createDataFrame(
        [
            ("r", "0", "c", "py", "merge segment", ["py", "go"]),
            ("r", "1", "c", "go", "buffer stream", ["py"]),
            ("r", "2", "c", "rs", "quick scan", []),
        ],
        SCHEMA,
    )
    IndexBuilder(spark, idx, partitions=2).build(docs, resume=False)
    r = IndexReader(spark, idx)
    paths = {
        x["doc_id"]: x["path"]
        for x in spark.read.parquet(f"{idx}/docs").collect()
    }
    out = r.search_dsl_df(
        {"terms": {"lang": {"id": "0", "path": "wants"}}}, k=None
    ).collect()
    assert {paths[x["doc_id"]] for x in out} == {"0", "1"}  # lang in py/go
    assert {x["score"] for x in out} == {1.0}
    # boost scales the constant score; missing lookup doc -> empty
    out = r.search_dsl_df(
        {"terms": {"lang": {"id": "0", "path": "wants"}, "boost": 2.5}},
        k=None,
    ).collect()
    assert {x["score"] for x in out} == {2.5}
    assert (
        r.search_dsl_df(
            {"terms": {"lang": {"id": "nope", "path": "wants"}}}, k=None
        ).count()
        == 0
    )
