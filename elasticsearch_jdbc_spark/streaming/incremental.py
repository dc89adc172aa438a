"""Structured Streaming ingest — the idiomatic equivalent of the
reference's scheduler loop + incremental predicates.

The reference has no stream operators: its "streaming" is a Quartz cron
re-running the import with `$metrics.lastexecutionstart` bound into the SQL
(JDBCImporter.java:214-240; README.md:680-727) plus an overlap window for
late rows (ColumnContext.java:57-64). In Spark that maps onto:

  * Trigger.AvailableNow  — each firing processes exactly the new data,
    checkpointed by the engine (replaces statefile + cron);
  * withWatermark         — the principled version of the overlap window
    (bounded lateness instead of re-reading a fixed overlap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def watermarked_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    lateness: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window counts with allowed lateness (works on both batch
    and streaming DataFrames — same plan, Catalyst handles either).

    Event-time watermarks require TIMESTAMP (ltz); parquet sources often
    deliver TIMESTAMP_NTZ, so the column is cast up front."""
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, lateness)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def incremental_index_stream(
    spark: SparkSession,
    source_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    key_cols: tuple = ("repo", "path", "commit"),
    text_col: str = "content",
):
    """Continuous corpus ingest: watch a directory of parquet drops, fold
    each micro-batch into delta posting segments via the batch builder.

    foreachBatch bridges to the (deterministic, resumable) IndexBuilder —
    each micro-batch writes a delta index under index_dir/delta=<batch_id>;
    a compaction/merge pass can later fold deltas into the base (the
    column-strategy incremental model, ColumnSource.java:116-190, with the
    streaming checkpoint playing the statefile role).

    Returns the StreamingQuery (caller awaits/stops it).
    """
    from ..index.build import IndexBuilder

    src = spark.read.parquet(source_dir)  # schema template
    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 16)
        .parquet(source_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        delta_dir = f"{index_dir}/delta={batch_id}"
        IndexBuilder(
            batch_df.sparkSession,
            delta_dir,
            key_cols=key_cols,
            text_col=text_col,
        ).build(batch_df, resume=False)

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
