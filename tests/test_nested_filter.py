"""Array (multi-valued / ES nested-ish) metadata fields: builder
passthrough of array<string> columns into the docs table, terms/exists
filter context over them on both reader tiers, and newest-version-wins
on the live index."""

from __future__ import annotations

from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.index import (
    IncrementalIndexReader,
    IndexBuilder,
    IndexReader,
    apply_incremental,
)

DOCS = [
    ("r", "0", "c", "t", "alpha beta gamma", ["red", "blue"]),
    ("r", "1", "c", "t", "alpha beta", ["green"]),
    ("r", "2", "c", "t", "alpha gamma", ["blue", "green"]),
    ("r", "3", "c", "t", "beta gamma", []),
]
SCHEMA = (
    "repo string, path string, commit string, lang string, content string,"
    " tags array<string>"
)


def _paths(reader, hits):
    import pyarrow.dataset as ds
    import os

    t = ds.dataset(
        os.path.join(reader.index_dir, "docs"), format="parquet"
    ).to_table(columns=["doc_id", "path"])
    m = dict(zip(t.column("doc_id").to_pylist(), t.column("path").to_pylist()))
    return sorted(m[d] for d, _ in hits)


def test_array_passthrough_and_filter(spark, tmp_path):
    idx = str(tmp_path / "arr")
    IndexBuilder(spark, idx, partitions=2).build(
        spark.createDataFrame(DOCS, SCHEMA), resume=False
    )
    r = IndexReader(spark, idx)
    # ES array semantics: a multi-valued field reports its element type
    assert r.field_caps()["tags"]["type"] == "keyword"

    def hits(q, pred):
        rows = r.search_df(q, k=10, filter_sql=pred).collect()
        return _paths(r, [(x["doc_id"], 0) for x in rows])

    # terms filter: docs tagged blue
    assert hits("alpha", "array_contains(tags, 'blue')") == ["0", "2"]
    # exists-lambda form, same result
    assert hits("alpha", "exists(tags, x -> x = 'blue')") == ["0", "2"]
    # empty-array doc never matches a terms filter; matches size(tags)=0
    assert hits("gamma", "size(tags) = 0") == ["3"]
    assert hits("alpha", "array_contains(tags, 'green')") == ["1", "2"]


def test_array_filter_live_index(spark, tmp_path):
    idx = str(tmp_path / "arrinc")
    IndexBuilder(spark, idx, partitions=2).build(
        spark.createDataFrame(DOCS, SCHEMA), resume=False
    )
    # upsert doc 1: retagged blue; delete doc 0
    ops = spark.createDataFrame(
        [
            ("r", "1", "c", "t", "alpha beta", ["blue"], "index"),
            ("r", "0", "c", "t", "", [], "delete"),
        ],
        SCHEMA + ", _optype string",
    )
    apply_incremental(spark, idx, ops)
    r = IncrementalIndexReader(spark, idx)
    hits = r.search_df(
        "alpha", k=10, filter_sql="array_contains(tags, 'blue')"
    )
    # doc 0 deleted, doc 1 now blue (newest version), doc 2 still blue
    paths = sorted(
        row["path"]
        for row in hits.join(
            r.live_docs().select("segment", "doc_id", "path"),
            ["segment", "doc_id"],
        ).collect()
    )
    assert paths == ["1", "2"]


def test_exists_array_semantics(spark, tmp_path):
    """ES exists = "has at least one indexed value": an empty array (or
    one holding only nulls) must NOT match (round-5 fix; IS NOT NULL
    alone would match the empty array)."""
    from elasticsearch_jdbc_spark.index import IndexBuilder, IndexReader

    idx = str(tmp_path / "exarr")
    docs = [
        ("r", "0", "c", "t", "alpha", ["x"]),
        ("r", "1", "c", "t", "alpha", []),
        ("r", "2", "c", "t", "alpha", None),
        ("r", "3", "c", "t", "alpha", [None]),
    ]
    IndexBuilder(spark, idx, partitions=1).build(
        spark.createDataFrame(
            docs,
            "repo string, path string, commit string, lang string,"
            " content string, tags array<string>",
        ),
        resume=False,
    )
    r = IndexReader(spark, idx)
    hits = r.search_dsl_df({"exists": {"field": "tags"}}, k=None)
    paths = {
        x["path"]
        for x in hits.join(
            spark.read.parquet(f"{idx}/docs").select("doc_id", "path"),
            "doc_id",
        ).collect()
    }
    assert paths == {"0"}
