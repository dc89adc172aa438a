"""ES `pinned` query: promoted ids rank first in the given order
(PinnedQueryBuilder's MAX_ORGANIC_SCORE - rank contract), organic matches
follow deduplicated; live tier pins the newest version and never a
deleted doc."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.index import (
    IncrementalIndexReader,
    IndexBuilder,
    IndexReader,
    apply_incremental,
)

SCHEMA = "repo string, path string, commit string, lang string, content string"
DOCS = [
    ("r", "0", "c", "t", "merge sort quick"),
    ("r", "1", "c", "t", "merge merge merge"),
    ("r", "2", "c", "t", "sort of a merge"),
    ("r", "3", "c", "t", "nothing relevant"),
    ("r", "4", "c", "t", "quick quick quick"),
]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pin") / "idx")
    IndexBuilder(spark, d, partitions=2).build(
        spark.createDataFrame(DOCS, SCHEMA), resume=False
    )
    return d


def _paths(spark, idx_dir, rows):
    m = {
        r["doc_id"]: r["path"]
        for r in spark.read.parquet(f"{idx_dir}/docs").select("doc_id", "path").collect()
    }
    return [m[r["doc_id"]] for r in rows]


def test_pinned_order_and_organic_tail(spark, idx):
    r = IndexReader(spark, idx)
    out = r.search_pinned_df("merge", ["3", "1"], k=10).collect()
    got = _paths(spark, idx, out)
    # 3 (non-matching!) and 1 pinned in the GIVEN order, then organic
    assert got[:2] == ["3", "1"]
    organic = set(_paths(spark, idx, r.search_df("merge", k=10).collect()))
    assert set(got[2:]) == organic - {"1", "3"}
    # organic scores untouched; pinned scores use the ES base constant
    assert out[0]["score"] > out[1]["score"] > 1e11
    base = {x["doc_id"]: x["score"] for x in r.search_df("merge", k=None).collect()}
    for row in out[2:]:
        assert row["score"] == base[row["doc_id"]]


def test_pinned_validation(spark, idx):
    r = IndexReader(spark, idx)
    with pytest.raises(ValueError):
        r.search_pinned_df("merge", [])
    with pytest.raises(ValueError):
        r.search_pinned_df("merge", ["1", "1"])
    with pytest.raises(ValueError):
        r.search_pinned_df("merge", ["1"], id_field="nope")


def test_pinned_live_tier(spark, tmp_path):
    d = str(tmp_path / "live")
    IndexBuilder(spark, d, partitions=2).build(
        spark.createDataFrame(DOCS, SCHEMA), resume=False
    )
    ops = spark.createDataFrame(
        [
            ("r", "3", "c", "t", "", "delete"),
            ("r", "5", "c", "t", "fresh merge doc", "create"),
        ],
        SCHEMA + ", _optype string",
    )
    apply_incremental(spark, d, ops)
    r = IncrementalIndexReader(spark, d)
    out = r.search_pinned_df("merge", ["3", "5", "0"], k=10).collect()
    m = {
        (x["segment"], x["doc_id"]): x["path"]
        for x in r.live_docs().select("segment", "doc_id", "path").collect()
    }
    got = [m[(x["segment"], x["doc_id"])] for x in out]
    # 3 is deleted -> never pins; 5 (delta segment) and 0 pin in order
    assert got[:2] == ["5", "0"]
    assert "3" not in got
