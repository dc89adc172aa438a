"""Within-document line dedup (keep-first, order-preserving) and the
zlib compression-ratio quality proxy."""

from __future__ import annotations

import zlib

import pytest

from elasticsearch_jdbc_spark.functions.text import (
    compression_ratio_col,
    dedup_lines_cols,
)


def _run(spark, docs, **kw):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "id long, text string"
    )
    return {
        r["id"]: r.asDict()
        for r in df.select("id", *dedup_lines_cols("text", **kw)).collect()
    }


def test_keep_first_preserve_order(spark):
    doc = "alpha\nbeta\nalpha\ngamma\nbeta\ndelta"
    r = _run(spark, [doc])[0]
    assert r["text"] == "alpha\nbeta\ngamma\ndelta"
    assert (r["n_lines"], r["n_kept"]) == (6, 4)


def test_normalized_vs_raw(spark):
    doc = "Alpha\n  alpha  \nALPHA"
    assert _run(spark, [doc])[0]["text"] == "Alpha"
    raw = _run(spark, [doc], normalize=False)[0]
    assert raw["text"] == doc  # raw-exact: all three differ
    assert raw["n_kept"] == 3


def test_blank_lines_always_survive(spark):
    doc = "a\n\na\n\nb"
    r = _run(spark, [doc])[0]
    assert r["text"] == "a\n\n\nb"
    assert r["n_kept"] == 4


def test_empty_doc(spark):
    r = _run(spark, [""])[0]
    assert r["text"] == "" and r["n_kept"] == 1  # the single empty line


def test_compression_ratio(spark):
    docs = [("low", "spam " * 400), ("high", "the quick brown fox jumps over it")]
    df = spark.createDataFrame(docs, "id string, text string")
    map_fn, schema_of = compression_ratio_col("text")
    out = {
        r["id"]: r["compression_ratio"]
        for r in df.mapInPandas(map_fn, schema_of(df)).collect()
    }
    for key, text in docs:
        raw = text.encode()
        assert out[key] == pytest.approx(len(zlib.compress(raw, 6)) / len(raw))
    assert out["low"] < 0.05 < out["high"]
    # NULL/empty -> NULL
    df2 = spark.createDataFrame([("x", None), ("y", "")], "id string, text string")
    out2 = {
        r["id"]: r["compression_ratio"]
        for r in df2.mapInPandas(map_fn, schema_of(df2)).collect()
    }
    assert out2 == {"x": None, "y": None}
