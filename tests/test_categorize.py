"""ES categorize_text aggregation — the deterministic exact-pattern variant
(category key = analyzed tokens with number-bearing tokens dropped, ES's
category-defining-token rule; ES's own streaming clusterer is documented
order-dependent). Standalone DataFrame agg + both reader tiers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.index import (
    IncrementalIndexReader,
    IndexBuilder,
    IndexReader,
    apply_incremental,
)
from elasticsearch_jdbc_spark.index.aggs import categorize_text

SCHEMA = "repo string, path string, commit string, lang string, content string"

LOGS = [
    "2024-01-07 user 1001 logged in from 10.0.0.4",
    "2024-02-09 user 2002 logged in from 10.0.0.9",
    "2024-03-11 user 3003 logged in from 10.9.1.2",
    "disk sda1 at 87% capacity",
    "disk sdb2 at 91% capacity",
    "connection timeout after 300 ms",
    "12345 67890",  # no category-defining token -> no bucket
    "",
]


def test_categorize_standalone(spark):
    df = spark.createDataFrame([(m,) for m in LOGS], "msg string")
    got = [tuple(r) for r in categorize_text(df, "msg", size=10).collect()]
    assert got == [
        (
            "user logged in from",
            3,
            max(len(m) for m in LOGS[:3]),
            ".*?user.+?logged.+?in.+?from.*?",
        ),
        ("disk at capacity", 2, len(LOGS[3]), ".*?disk.+?at.+?capacity.*?"),
        (
            "connection timeout after ms",
            1,
            len(LOGS[5]),
            ".*?connection.+?timeout.+?after.+?ms.*?",
        ),
    ]
    # min_doc_count prunes singleton categories; size cuts after ordering
    assert len(categorize_text(df, "msg", min_doc_count=2).collect()) == 2
    assert [r["key"] for r in categorize_text(df, "msg", size=1).collect()] == [
        "user logged in from"
    ]
    with pytest.raises(ValueError, match="size"):
        categorize_text(df, "msg", size=0)
    # NULL messages form no bucket
    df2 = spark.createDataFrame([("disk full",), (None,)], "msg string")
    assert categorize_text(df2, "msg").count() == 1


def test_categorize_reader_tiers(spark, tmp_path):
    rows = [("r", f"l/{i}", "c", "t", m) for i, m in enumerate(LOGS) if m]
    d = str(tmp_path / "cat_idx")
    IndexBuilder(spark, d, partitions=2).build(
        spark.createDataFrame(rows, SCHEMA), resume=False
    )
    r = IndexReader(spark, d)
    got = [
        (x["key"], x["doc_count"], x["regex"])
        for x in r.categorize_text_df(size=10).collect()
    ]
    assert got[0] == ("user logged in from", 3, ".*?user.+?logged.+?in.+?from.*?")
    assert ("disk at capacity", 2, ".*?disk.+?at.+?capacity.*?") in got
    # query scoping: only matching docs feed the buckets
    scoped = [
        (x["key"], x["doc_count"])
        for x in r.categorize_text_df(query="disk", size=10).collect()
    ]
    assert scoped == [("disk at capacity", 2)]
    # filter_sql-only scoping
    flt = r.categorize_text_df(filter_sql="path = 'l/5'", size=10).collect()
    assert [(x["key"], x["doc_count"]) for x in flt] == [
        ("connection timeout after ms", 1)
    ]

    # live tier: a delete leaves its category immediately
    extra = spark.createDataFrame(
        [("r", "l/new", "c", "t", "disk sdc9 at 99% capacity", "create")],
        SCHEMA + ", _optype string",
    )
    apply_incremental(spark, d, extra)
    ri = IncrementalIndexReader(spark, d)
    live = {x["key"]: x["doc_count"] for x in ri.categorize_text_df(size=10).collect()}
    assert live["disk at capacity"] == 3
    ri.delete_by_query("user")
    ri = IncrementalIndexReader(spark, d)
    live2 = {
        x["key"]: x["doc_count"] for x in ri.categorize_text_df(size=10).collect()
    }
    assert "user logged in from" not in live2
    assert live2["disk at capacity"] == 3


def test_categorize_fields(spark, tmp_path):
    schema = (
        "repo string, path string, commit string, lang string, "
        "title string, body string"
    )
    rows = [
        ("r", "0", "c", "t", "error code 500 on login", "stack trace line 14"),
        ("r", "1", "c", "t", "error code 404 on login", "stack trace line 99"),
    ]
    d = str(tmp_path / "catf_idx")
    IndexBuilder(spark, d, partitions=2, fields=["title", "body"]).build(
        spark.createDataFrame(rows, schema), resume=False
    )
    r = IndexReader(spark, d)
    with pytest.raises(ValueError, match="pass field="):
        r.categorize_text_df()
    t = [(x["key"], x["doc_count"]) for x in r.categorize_text_df(field="title").collect()]
    b = [(x["key"], x["doc_count"]) for x in r.categorize_text_df(field="body").collect()]
    assert t == [("error code on login", 2)]
    assert b == [("stack trace line", 2)]
