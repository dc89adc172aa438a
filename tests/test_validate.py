"""`_validate/query?explain` analogue: parse + compile a query_string
without executing — per-clause rewrites with dictionary expansion counts,
rejection reasons (unknown field, pure negation), both reader tiers."""

from __future__ import annotations

from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.index import (
    IncrementalIndexReader,
    IndexBuilder,
    IndexReader,
    apply_incremental,
)

DOCS = [
    ("r", "0", "c", "t", "merge segment buffer"),
    ("r", "1", "c", "t", "merge merged stream"),
    ("r", "2", "c", "t", "query scan"),
]
SCHEMA = "repo string, path string, commit string, lang string, content string"


def _mk(spark, tmp_path, **kw):
    idx = str(tmp_path / "v")
    IndexBuilder(spark, idx, partitions=2, **kw).build(
        spark.createDataFrame(DOCS, SCHEMA), resume=False
    )
    return IndexReader(spark, idx)


def test_valid_query_with_expansions(spark, tmp_path):
    r = _mk(spark, tmp_path)
    v = r.validate_query('+merge mer* -scan "query scan"~1 marge~1')
    assert v["valid"] is True and v["error"] is None
    kinds = [(c["occur"], c["kind"]) for c in v["clauses"]]
    assert kinds == [
        ("must", "term"), ("should", "wildcard"), ("must_not", "term"),
        ("should", "phrase"), ("should", "fuzzy"),
    ]
    wc = v["clauses"][1]
    assert wc["expansions"] == 2  # merge, merged
    fz = v["clauses"][4]
    assert fz["expansions"] >= 1  # marge~1 -> merge
    assert '+merge' in v["explanation"] and 'mer*(2 terms)' in v["explanation"]


def test_rejections(spark, tmp_path):
    r = _mk(spark, tmp_path)
    v = r.validate_query("-scan")
    assert v["valid"] is False and "positive clause" in v["error"]
    v = r.validate_query("title:merge")
    assert v["valid"] is False and "unknown field" in v["error"]
    v = r.validate_query("merge", default_operator="xor")
    assert v["valid"] is False and "default_operator" in v["error"]


def test_fielded_valid_on_fields_index(spark, tmp_path):
    docs = [("r", "0", "c", "t", "merge segment", "alpha")]
    idx = str(tmp_path / "vf")
    IndexBuilder(spark, idx, partitions=1, fields=("content", "title")).build(
        spark.createDataFrame(docs, SCHEMA + ", title string"), resume=False
    )
    v = IndexReader(spark, idx).validate_query("title:alpha +content:merge")
    assert v["valid"] is True
    assert v["explanation"] == "title:alpha +content:merge"


def test_incremental_tier(spark, tmp_path):
    idx = str(tmp_path / "vi")
    IndexBuilder(spark, idx, partitions=2).build(
        spark.createDataFrame(DOCS, SCHEMA), resume=False
    )
    # delta adds 'mergeable' -> live wildcard expansion sees 3 terms
    ops = spark.createDataFrame(
        [("r", "9", "c", "t", "mergeable stuff")], SCHEMA
    ).withColumn("_optype", F.lit("index"))
    apply_incremental(spark, idx, ops)
    v = IncrementalIndexReader(spark, idx).validate_query("mer*")
    assert v["valid"] is True
    assert v["clauses"][0]["expansions"] == 3
