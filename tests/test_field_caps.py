"""`_field_caps` / `_mapping` introspection: text vs metadata fields,
type mapping, completion-dictionary surfacing, fields-indexed corpora,
and the incremental cross-segment merge."""

from __future__ import annotations

from elasticsearch_jdbc_spark.index import (
    IncrementalIndexReader,
    IndexBuilder,
    IndexReader,
    apply_incremental,
)
from pyspark.sql import functions as F

DOCS = [
    ("r", "0", "c", "py", "alpha beta", "t one", 3, 1.5),
    ("r", "1", "c", "go", "beta gamma", "t two", 4, 2.5),
]
SCHEMA = (
    "repo string, path string, commit string, lang string, content string,"
    " title string, stars int, score double"
)


def test_field_caps_plain(spark, tmp_path):
    idx = str(tmp_path / "fc")
    IndexBuilder(spark, idx, partitions=2).build(
        spark.createDataFrame(DOCS, SCHEMA), resume=False
    )
    r = IndexReader(spark, idx)
    caps = r.field_caps()
    assert caps["content"] == {
        "type": "text", "searchable": True, "aggregatable": False
    }
    for k in ("repo", "path", "commit", "lang", "title"):
        assert caps[k] == {
            "type": "keyword", "searchable": False, "aggregatable": True
        }, k
    # caps report the STORED parquet type (int metadata -> int32)
    assert caps["stars"]["type"] == "integer"
    assert caps["score"]["type"] == "double"
    assert caps["dl"]["type"] == "integer"
    assert "sha256" not in caps and "doc_id" not in caps

    m = r.mapping()
    assert m["mappings"]["properties"]["content"] == {"type": "text"}
    assert m["settings"]["key_cols"] == ["repo", "path", "commit"]
    assert m["settings"]["k1"] == 1.2

    # completion dictionaries surface as completion fields
    r.build_completions("title")
    assert r.field_caps()["title.completion"]["type"] == "completion"


def test_field_caps_fields_index(spark, tmp_path):
    idx = str(tmp_path / "fcf")
    IndexBuilder(
        spark, idx, partitions=2, fields=("content", "title")
    ).build(spark.createDataFrame(DOCS, SCHEMA), resume=False)
    caps = IndexReader(spark, idx).field_caps()
    assert caps["content"]["type"] == "text"
    assert caps["title"]["type"] == "text"
    assert caps["title"]["searchable"] is True


def test_field_caps_incremental_merge(spark, tmp_path):
    idx = str(tmp_path / "fci")
    IndexBuilder(spark, idx, partitions=2).build(
        spark.createDataFrame(DOCS, SCHEMA), resume=False
    )
    # delta batch where 'stars' arrives as a string -> cross-segment
    # type conflict reported as the sorted type list
    ops = spark.createDataFrame(
        [("r", "2", "c", "py", "delta epsilon", "t three", "9", 3.5)],
        "repo string, path string, commit string, lang string,"
        " content string, title string, stars string, score double",
    ).withColumn("_optype", F.lit("index"))
    apply_incremental(spark, idx, ops)
    r = IncrementalIndexReader(spark, idx)
    caps = r.field_caps()
    assert caps["content"]["type"] == "text"
    assert caps["stars"]["type"] == ["integer", "keyword"]
    assert caps["title"]["aggregatable"] is True
    assert r.mapping()["settings"]["key_cols"] == ["repo", "path", "commit"]
