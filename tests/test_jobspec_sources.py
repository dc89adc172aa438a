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


class _FakeReader:
    """Records the spark.read call chain (format/option/schema/load/csv) so
    the jdbc/iceberg dispatch is testable without driver jars."""

    def __init__(self, calls):
        self.calls = calls

    def option(self, k, v):
        self.calls.append(("option", k, v))
        return self

    def format(self, fmt):
        self.calls.append(("format", fmt))
        return self

    def schema(self, s):
        self.calls.append(("schema", s))
        return self

    def load(self, path=None):
        self.calls.append(("load", path))
        return "DF"

    def csv(self, path):
        self.calls.append(("csv", path))
        return "DF"


class _FakeSpark:
    def __init__(self):
        self.calls = []

    @property
    def read(self):
        return _FakeReader(self.calls)


def test_jdbc_dispatch_passes_options_no_path():
    from elasticsearch_jdbc_spark.plans.jobspec import read_source

    fake = _FakeSpark()
    out = read_source(fake, {"source": {
        "format": "jdbc",
        "options": {"url": "jdbc:postgresql://db/x", "dbtable": "t", "fetchsize": "1000"},
    }})
    assert out == "DF"
    assert ("format", "jdbc") in fake.calls
    assert ("option", "url", "jdbc:postgresql://db/x") in fake.calls
    assert ("option", "dbtable", "t") in fake.calls
    assert ("option", "fetchsize", "1000") in fake.calls
    assert ("load", None) in fake.calls  # jdbc loads from options, not path


def test_iceberg_dispatch_formats_and_loads_table():
    from elasticsearch_jdbc_spark.plans.jobspec import read_source

    fake = _FakeSpark()
    out = read_source(fake, {"source": {
        "format": "iceberg",
        "path": "catalog.db.repos",
        "options": {"snapshot-id": "123"},
    }})
    assert out == "DF"
    assert ("format", "iceberg") in fake.calls
    assert ("option", "snapshot-id", "123") in fake.calls
    assert ("load", "catalog.db.repos") in fake.calls


def test_csv_dispatch_header_and_schema():
    from elasticsearch_jdbc_spark.plans.jobspec import read_source

    fake = _FakeSpark()
    read_source(fake, {"source": {
        "format": "csv", "path": "/x.csv", "header": "false",
        "schema": "a string, b int",
    }})
    assert ("option", "header", "false") in fake.calls
    assert ("schema", "a string, b int") in fake.calls
    assert ("csv", "/x.csv") in fake.calls


def test_parquet_dispatch_default():
    from elasticsearch_jdbc_spark.plans.jobspec import read_source

    fake = _FakeSpark()
    read_source(fake, {"source": {"path": "/corpus"}})
    assert ("format", "parquet") in fake.calls
    assert ("load", "/corpus") in fake.calls


def test_ack_writeback(spark, sf_dir, tmp_path):
    """A17 write-back: each completed run appends one ack row (metrics +
    lineage digest) — two runs, two rows, fingerprints equal for identical
    input."""
    from elasticsearch_jdbc_spark.plans.jobspec import run_import

    src = str(tmp_path / "src")
    spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40).selectExpr(
        "source AS repo", "CAST(doc_id AS STRING) AS path",
        "'c1' AS commit", "lang", "text AS content",
    ).write.parquet(src)
    ack = str(tmp_path / "acks")
    spec = {
        "source": {"format": "parquet", "path": src},
        "index_dir": str(tmp_path / "idx"),
        "partitions": 2,
        "ack_dir": ack,
    }
    run_import(spark, spec, resume=False)
    run_import(spark, spec, resume=False)
    rows = spark.read.parquet(ack).collect()
    assert len(rows) == 2
    assert all(r["n_docs"] == 40 and r["bytes_written"] > 0 for r in rows)
    assert rows[0]["source_fingerprint"] == rows[1]["source_fingerprint"]


def test_spec_builds_fields_index(spark, sf_dir, tmp_path):
    """`fields`/`lang_filter` spec keys reach the builder (VERDICT r02
    missing #2): a spec-built multi-field index answers boosted
    multi_match."""
    from elasticsearch_jdbc_spark.index import IndexReader

    src = str(tmp_path / "src")
    spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30).selectExpr(
        "source AS repo", "CAST(doc_id AS STRING) AS path", "'c' AS commit",
        "lang", "substr(text, 1, 40) AS title", "text AS body",
    ).write.parquet(src)
    spec = {
        "source": {"format": "parquet", "path": src},
        "index_dir": str(tmp_path / "idx"),
        "partitions": 2,
        "fields": ["title", "body"],
        "lang_filter": True,
    }
    manifest = run_import(spark, spec, resume=False)
    assert manifest["fields"] == ["title", "body"]
    assert manifest["lang_filter"] is True
    reader = IndexReader(spark, str(tmp_path / "idx"))
    hits = reader.search_fields("the data value", boosts={"title": 2.0, "body": 1.0}, k=5)
    assert hits  # multi-field search over a spec-built index answers


def test_ingest_pipeline_in_spec(spark, sf_dir, tmp_path):
    """The spec's ingest_pipeline block (ES ingest processors) rewrites
    rows BEFORE the fold/build — uppercased content must be what the
    index tokenizes, and dropped rows must not index at all."""
    from elasticsearch_jdbc_spark.index import IndexReader
    from elasticsearch_jdbc_spark.plans.jobspec import run_import

    src = str(tmp_path / "src")
    spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30).selectExpr(
        "source AS repo", "CAST(doc_id AS STRING) AS path",
        "'c1' AS commit", "lang", "text AS content",
    ).write.parquet(src)
    idx = str(tmp_path / "idx")
    manifest = run_import(
        spark,
        {
            "source": {"format": "parquet", "path": src},
            "index_dir": idx,
            "partitions": 2,
            "ingest_pipeline": [
                {"set": {"field": "content", "value": "zzmarker only token",
                         "if": "path = '3'"}},
                {"drop": {"if": "CAST(path AS INT) >= 20"}},
            ],
        },
        resume=False,
    )
    assert manifest["n_docs"] == 20  # drop ran pre-build
    r = IndexReader(spark, idx)
    hits = r.search("zzmarker", k=5)
    assert len(hits) == 1  # the rewritten doc tokenized the NEW content
