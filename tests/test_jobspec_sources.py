"""Jobspec source-list (A19), CSV source (A20), and metrics vocabulary
(A16) tests."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.plans.jobspec import build_metrics, run_import


def test_multi_source_union_and_csv(spark, sf_dir, tmp_path):
    """Two source blocks (parquet + csv) union into one index build —
    the reference's multi-statement `sql` list (SQLCommand.java:49-57)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "source", F.col("doc_id").cast("string").alias("docno"), "lang",
        F.col("text"),
    )
    pq_dir = str(tmp_path / "p1")
    csv_dir = str(tmp_path / "c2")
    d.limit(40).write.parquet(pq_dir)
    # csv needs newline-free text for a robust roundtrip
    d.limit(70).withColumn("text", F.regexp_replace("text", r"[\r\n,\"]", " ")).write.option(
        "header", "true"
    ).csv(csv_dir)

    spec = {
        "source": [
            {"format": "parquet", "path": pq_dir},
            {
                "format": "csv",
                "path": csv_dir,
                "schema": "source string, docno string, lang string, text string",
            },
        ],
        "key_cols": ["source", "docno"],
        "text_col": "text",
        "index_dir": str(tmp_path / "idx"),
        "partitions": 4,
    }
    manifest = run_import(spark, json.dumps(spec), resume=False)
    assert manifest["n_docs"] == 110

    m = build_metrics(manifest)
    assert m["n_docs"] == 110
    assert m["dps"] and m["dps"] > 0
    assert m["bytes_written"] > 0
    assert set(m["phases"]) == {"ingest", "stats", "postings"}
    assert m["phases"]["ingest"]["bytes_written"] > 0


def test_rename_applied_before_build(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30).select(
        "source", "doc_id", "lang", "text"
    ).write.parquet(src)
    spec = {
        "source": {"format": "parquet", "path": src},
        "rename": {"doc_id": "docno"},
        "key_cols": ["source", "docno"],
        "text_col": "text",
        "index_dir": str(tmp_path / "idx"),
        "partitions": 2,
    }
    manifest = run_import(spark, spec, resume=False)
    assert manifest["n_docs"] == 30
    docs = spark.read.parquet(os.path.join(spec["index_dir"], "docs"))
    assert "docno" in docs.columns and "doc_id" in docs.columns
