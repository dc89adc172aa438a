"""Streaming deduplication — the continuous-ingest counterpart of the
batch dedup operators (operators/dedup.py).

A training-data pipeline that ingests continuously (the reference's cron
re-import loop, JDBCImporter.java:214-240, re-imagined as Structured
Streaming) needs dedup ON THE STREAM, before documents reach the index:

  * exact content dedup   — sha256 key + dropDuplicatesWithinWatermark:
    state is bounded by the watermark delay (Spark evicts keys older than
    the watermark), so state size is O(ingest-rate x delay), not O(corpus).
  * key dedup             — the reference's `_id` idempotency
    (StandardSink.java:191-228): same doc key within the window collapses
    to its first occurrence.

Both operate identically on batch DataFrames (Catalyst handles either),
which is how the tests spec them; streaming semantics add watermark-bounded
state eviction on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_exact_dedup(
    df: DataFrame,
    text_col: str = "content",
    ts_col: str = "ts",
    delay: str = "1 hour",
) -> DataFrame:
    """Drop rows whose exact content was already seen within the watermark
    window. The dedup key is sha256(content) — 32 bytes of state per
    distinct document instead of the document itself; keys older than
    `delay` are evicted, so state never grows with corpus size.

    On a streaming DataFrame this uses dropDuplicatesWithinWatermark
    (emits the FIRST arrival, late duplicates within `delay` are dropped);
    on a batch DataFrame it falls back to plain dropDuplicates over the
    same key (watermarks are meaningless in batch).
    """
    keyed = df.withColumn("_sha", F.sha2(F.col(text_col), 256)).withColumn(
        ts_col, F.col(ts_col).cast("timestamp")
    )
    if df.isStreaming:
        out = keyed.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
            ["_sha"]
        )
    else:
        out = keyed.dropDuplicates(["_sha"])
    return out.drop("_sha")


def stream_key_dedup(
    df: DataFrame,
    key_cols: tuple = ("repo", "path", "commit"),
    ts_col: str = "ts",
    delay: str = "1 hour",
) -> DataFrame:
    """Doc-key idempotency on the stream: the reference re-indexing the
    same `_id` is a no-op upsert; here repeated (key_cols) rows within the
    watermark window collapse to the first arrival (later VERSIONS arrive
    outside the window and flow through to the incremental upsert path)."""
    keyed = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if df.isStreaming:
        return keyed.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
            list(key_cols)
        )
    return keyed.dropDuplicates(list(key_cols))
