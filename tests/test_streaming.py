"""Structured Streaming ingest tests — the idiomatic equivalent of the
reference's cron + incremental loop (JDBCImporter.java:214-240,
ColumnContext.java:57-64). Uses Trigger.AvailableNow so each start()
processes exactly the files present, checkpointed by the engine."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.streaming.incremental import (
    incremental_index_stream,
    watermarked_event_counts,
)


def test_watermarked_counts_batch_semantics(spark, sf_dir):
    """The windowed-agg plan runs identically on a batch frame (Catalyst
    treats withWatermark as a no-op in batch mode) — sanity of the shape."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = watermarked_event_counts(ev, ts_col="ts", window="1 hour")
    rows = out.collect()
    assert rows, "expected windowed counts"
    total = sum(r["n"] for r in rows)
    assert total == ev.count()
    cols = set(out.columns)
    assert cols == {"window_start", "event_type", "n", "total_value"}


def test_watermarked_counts_streaming_availablenow(spark, sf_dir, tmp_path):
    """Same aggregation as a real stream: file source -> windowed counts ->
    memory sink, Trigger.AvailableNow + watermark. Totals must equal batch."""
    import shutil

    src_dir = str(tmp_path / "events")
    os.makedirs(src_dir, exist_ok=True)
    shutil.copy(f"{sf_dir}/events.parquet", src_dir)  # file source wants a dir
    src = spark.read.parquet(src_dir)
    stream = spark.readStream.schema(src.schema).parquet(src_dir)
    agg = watermarked_event_counts(stream, ts_col="ts", window="1 hour",
                                   lateness="10 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("win_counts").agg(F.sum("n").alias("s")).collect()[0]["s"]
    assert got == src.count()


def test_incremental_index_stream_builds_deltas(spark, tmp_path):
    """Drop two parquet batches into a watched dir; one AvailableNow run
    indexes them as delta indexes; a second run after a new drop indexes
    ONLY the new files (engine checkpoint = the statefile role)."""
    from elasticsearch_jdbc_spark.sources import synthetic_corpus

    src_dir = str(tmp_path / "drops")
    idx_dir = str(tmp_path / "idx")
    ck_dir = str(tmp_path / "ck")
    os.makedirs(src_dir, exist_ok=True)

    synthetic_corpus(spark, n_files=60, seed=1, partitions=2).write.mode(
        "append"
    ).parquet(src_dir)
    q = incremental_index_stream(spark, src_dir, idx_dir, ck_dir)
    q.awaitTermination(300)
    deltas = sorted(d for d in os.listdir(idx_dir) if d.startswith("delta="))
    assert deltas, "first run must produce at least one delta index"
    n_docs_1 = sum(
        json.load(open(os.path.join(idx_dir, d, "manifest.json")))["n_docs"]
        for d in deltas
    )
    assert n_docs_1 == 60

    # second drop -> only the new files processed
    synthetic_corpus(spark, n_files=40, seed=2, partitions=2).write.mode(
        "append"
    ).parquet(src_dir)
    q2 = incremental_index_stream(spark, src_dir, idx_dir, ck_dir)
    q2.awaitTermination(300)
    deltas2 = sorted(d for d in os.listdir(idx_dir) if d.startswith("delta="))
    assert len(deltas2) > len(deltas)
    n_docs_2 = sum(
        json.load(open(os.path.join(idx_dir, d, "manifest.json")))["n_docs"]
        for d in deltas2
    )
    # 60 + 40 docs total; the first 60 were NOT re-indexed (delta manifests
    # of run 1 unchanged, new deltas carry exactly the new docs)
    assert n_docs_2 == 100


def test_stream_exact_dedup_bounded_state(spark, tmp_path):
    """Streaming exact dedup: duplicates within the watermark window are
    dropped (first arrival wins), state key is the 32-byte sha — run
    end-to-end through a real streaming query on a file source."""
    import json
    import os

    from elasticsearch_jdbc_spark.streaming import stream_exact_dedup

    src_dir = str(tmp_path / "src")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    rows = [
        (1, "same text body", "2026-01-01 10:00:00"),
        (2, "same text body", "2026-01-01 10:05:00"),   # dup within window
        (3, "other text body", "2026-01-01 10:06:00"),
        (4, "same text body", "2026-01-01 10:07:00"),   # dup within window
    ]
    df = spark.createDataFrame(rows, "id long, content string, ts string")
    df.coalesce(1).write.parquet(src_dir)
    stream = spark.readStream.schema(df.schema).parquet(src_dir)
    deduped = stream_exact_dedup(stream, text_col="content", ts_col="ts")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {r["id"] for r in spark.read.parquet(out_dir).collect()}
    assert got == {1, 3}
    # batch fallback: same operator, same result, no watermark needed
    batch = stream_exact_dedup(df, text_col="content", ts_col="ts")
    assert {r["id"] for r in batch.collect()} == {1, 3} or len(batch.collect()) == 2


def test_stream_key_dedup(spark):
    from elasticsearch_jdbc_spark.streaming import stream_key_dedup

    df = spark.createDataFrame(
        [
            ("r", "a.txt", "c1", "x", "2026-01-01 10:00:00"),
            ("r", "a.txt", "c1", "y", "2026-01-01 10:01:00"),  # same key
            ("r", "a.txt", "c2", "z", "2026-01-01 10:02:00"),  # new commit
        ],
        "repo string, path string, commit string, content string, ts string",
    )
    out = stream_key_dedup(df, ("repo", "path", "commit"), "ts").collect()
    assert len(out) == 2
    assert {r["commit"] for r in out} == {"c1", "c2"}


def test_stream_latest_version_stateful(spark, tmp_path):
    """applyInPandasWithState upsert compactor: across two AvailableNow
    runs sharing a checkpoint, a key emits only when its newest version
    ADVANCES — re-emitted old versions are suppressed by the persisted
    per-key state."""
    import datetime as dt

    from elasticsearch_jdbc_spark.streaming.dedup import stream_latest_version

    SCHEMA = "repo string, path string, commit string, content string, updated_at timestamp"
    t1, t2 = dt.datetime(2026, 1, 1), dt.datetime(2026, 1, 2)
    src_dir, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    os.makedirs(src_dir, exist_ok=True)

    out_dir = str(tmp_path / "out")

    def run_batch(rows):
        # parquet sink (memory sink cannot recover from a checkpoint, and
        # cross-run state recovery is exactly what this test exercises)
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(src_dir)
        stream = spark.readStream.schema(SCHEMA).parquet(src_dir)
        out = stream_latest_version(stream, ("repo", "path", "commit"),
                                    ts_col="updated_at")
        q = (
            out.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return [
            (r["path"], r["content"])
            for r in spark.read.parquet(out_dir).collect()
        ]

    # batch 1: A v1 twice (dup in-batch), B v1 -> one emit per key
    got1 = run_batch([
        ("r", "A", "c", "A-v1", t1),
        ("r", "A", "c", "A-v1-dup", t1),
        ("r", "B", "c", "B-v1", t1),
    ])
    assert sorted(p for p, _ in got1) == ["A", "B"]
    # batch 2: A advances to v2 (emit), B re-emits v1 (suppressed by state)
    got2 = run_batch([
        ("r", "A", "c", "A-v2", t2),
        ("r", "B", "c", "B-v1-again", t1),
    ])
    new = [x for x in got2 if x not in got1]
    assert new == [("A", "A-v2")]
    assert len(got2) == 3  # cumulative memory table: 2 from run 1 + 1 new
    # batch semantics: latest per key, state-free projection
    b = spark.createDataFrame(
        [("r", "A", "c", "A-v1", t1), ("r", "A", "c", "A-v2", t2)], SCHEMA
    )
    rows = stream_latest_version(b, ("repo", "path", "commit"), "updated_at").collect()
    assert [(r["path"], r["content"]) for r in rows] == [("A", "A-v2")]


def test_stream_percolate_matches_percolate_df(spark, tmp_path):
    """Streaming percolation: (a) parity — on the same rows, the
    stateless stream operator's (doc, query_id, matched) alerts equal
    IndexReader.percolate_df over an index of those rows; (b) a real
    AvailableNow run over a file source emits the same alerts."""
    from elasticsearch_jdbc_spark.index import IndexBuilder, IndexReader
    from elasticsearch_jdbc_spark.streaming import stream_percolate
    from elasticsearch_jdbc_spark.sources import synthetic_corpus

    QUERIES = [
        (0, "merge segment buffer"),          # default msm=1 disjunction
        (1, "merge buffer", 2),               # conjunction
        (2, "cluster config", "50%"),         # percentage
        (3, "zzzz absent term", 3),           # never hits
    ]
    corpus = synthetic_corpus(spark, n_files=80, seed=91).cache()

    # (a) batch parity vs the index-tier percolator
    d = str(tmp_path / "idx")
    IndexBuilder(spark, d, partitions=2).build(corpus, resume=False)
    r = IndexReader(spark, d)
    keys = spark.read.parquet(f"{d}/docs").select("doc_id", "repo", "path")
    want = {
        (x["query_id"], x["repo"], x["path"]): x["matched"]
        for x in r.percolate_df(QUERIES).join(keys, "doc_id").collect()
    }
    got = {
        (x["query_id"], x["repo"], x["path"]): x["matched"]
        for x in stream_percolate(corpus, QUERIES).collect()
    }
    assert got == want and want

    # (b) the same operator through a real streaming query
    src, out, ck = (str(tmp_path / n) for n in ("src", "out", "ck"))
    corpus.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(corpus.schema).parquet(src)
    q = (
        stream_percolate(stream, QUERIES)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    streamed = {
        (x["query_id"], x["repo"], x["path"]): x["matched"]
        for x in spark.read.parquet(out).collect()
    }
    assert streamed == want


def test_stream_percolate_edge_shapes(spark):
    from elasticsearch_jdbc_spark.streaming import stream_percolate

    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, ""), (3, None)], "id long, content string"
    )
    # empty/None documents never alert; dict query shape accepted
    got = stream_percolate(df, {7: "beta"}).collect()
    assert [(x["id"], x["query_id"], x["matched"]) for x in got] == [(1, 7, 1)]
    # a query set with no tokenizable text -> empty result, schema kept
    none = stream_percolate(df, [(0, "!!!")])
    assert none.count() == 0
    assert {"query_id", "matched"} <= set(none.columns)


def test_stream_percolate_empty_queries_on_stream(spark, tmp_path):
    """The empty-query fallback must plan on a STREAMING DataFrame
    (limit(0) would throw at plan time; filter(False) does not)."""
    from elasticsearch_jdbc_spark.streaming import stream_percolate

    src = str(tmp_path / "src")
    df = spark.createDataFrame([(1, "alpha")], "id long, content string")
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    out = stream_percolate(stream, [(0, "!!!")])   # tokenizes to nothing
    assert out.isStreaming
    assert {"query_id", "matched"} <= set(out.columns)


def test_stream_percolate_negative_msm_matches_dsl_leaf(spark):
    """Negative msm forms resolve n-minus (the percolate DSL grammar):
    '-1' on a 3-term query requires 2 matched terms, not 1."""
    from elasticsearch_jdbc_spark.streaming import stream_percolate

    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha"), (3, "alpha beta gamma")],
        "id long, content string",
    )
    got = {
        x["id"]: x["matched"]
        for x in stream_percolate(
            df, [(0, "alpha beta gamma", -1)]).collect()
    }
    assert got == {1: 2, 3: 3}   # doc 2 matches only 1 of required 2
    pct = {
        x["id"]: x["matched"]
        for x in stream_percolate(
            df, [(0, "alpha beta gamma", "-50%")]).collect()
    }
    assert pct == {1: 2, 3: 3}   # required = 3 - floor(1.5) = 2
