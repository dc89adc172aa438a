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


def stream_latest_version(
    df: DataFrame,
    key_cols: tuple = ("repo", "path", "commit"),
    ts_col: str = "updated_at",
    delay: str = "1 hour",
) -> DataFrame:
    """CUSTOM STATEFUL OPERATOR (applyInPandasWithState): per doc key, emit
    a row only when a micro-batch advances the key's newest version — the
    upsert-stream compactor that sits in front of apply_incremental, so a
    chatty source that re-emits every version of a document ships exactly
    one index op per actual advancement.

    State per key is a single epoch-micros long (the newest version seen) —
    fixed width, no document content. Event-time timeout evicts a key's
    state once no new version arrives within `delay` past its newest
    version (a later re-emit of the same old version would then slip
    through — same contract as every watermark-bounded dedup, and harmless:
    the downstream upsert is idempotent).

    On a batch DataFrame this degrades to "latest version per key" (a
    window row_number), which is the state-free projection of the same
    semantics."""
    import pandas as pd

    keyed = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if not df.isStreaming:
        from pyspark.sql import Window as W

        w = W.partitionBy(*key_cols).orderBy(F.desc(ts_col))
        return (
            keyed.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = keyed.schema
    cols = [f.name for f in out_schema.fields]
    delay_ms = _duration_ms(delay)

    def latest(key, pdfs, state):
        if state.hasTimedOut:
            state.remove()
            return
        best_row: pd.DataFrame | None = None
        best_us = state.get[0] if state.exists else None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            i = pdf[ts_col].idxmax()
            ts_us = int(pd.Timestamp(pdf[ts_col][i]).value // 1_000)
            if best_us is None or ts_us > best_us:
                best_us = ts_us
                best_row = pdf.loc[[i], cols]
        if best_row is not None:
            state.update((best_us,))
            state.setTimeoutTimestamp(best_us // 1_000 + delay_ms)
            yield best_row

    return (
        keyed.withWatermark(ts_col, delay)
        .groupBy(*[F.col(k) for k in key_cols])
        .applyInPandasWithState(
            latest,
            out_schema,
            "ts_us long",
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def _duration_ms(s: str) -> int:
    """'1 hour' / '10 minutes' / '30 seconds' -> milliseconds."""
    n, unit = s.split()
    mult = {"second": 1_000, "minute": 60_000, "hour": 3_600_000,
            "day": 86_400_000}[unit.rstrip("s")]
    return int(n) * mult


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
