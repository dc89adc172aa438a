"""Incremental sync operators (reference "column strategy").

The reference rewrites user SQL three ways against created_at/updated_at/
deleted_at vs `last_run_time - overlap` and stamps each result set with an
optype (ColumnSource.java:116-190); `$metrics.lastexecutionstart` binding
gives the as-of watermark (README.md:680-727). Spark-native: the same
predicates as filters over a timestamped DataFrame — Catalyst pushes them
into the scan, so an incremental run reads only fresh partitions/row-groups.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def watermark_filter(
    df: DataFrame, ts_col: str, last_run: dt.datetime | str, overlap_seconds: int = 0
) -> DataFrame:
    """Rows at/after `last_run - overlap` (ColumnContext.java:57-64:
    last_run_timestamp_overlap — a poor-man's allowed-lateness window).
    Re-processing the overlap is idempotent because doc identity is stable."""
    t = F.lit(last_run).cast("timestamp") - F.expr(f"INTERVAL {overlap_seconds} SECONDS")
    return df.filter(F.col(ts_col) >= t)


def classify_ops(
    df: DataFrame,
    created_col: str,
    updated_col: str,
    deleted_col: str | None,
    last_run: dt.datetime | str,
) -> DataFrame:
    """Three-way optype classification (ColumnSource.java:131-167):
    create  — created_at >= T
    index   — updated_at >= T AND created_at < T   (update -> reindex)
    delete  — deleted_at >= T
    Rows older than T on all axes are dropped (already synced)."""
    t = F.lit(last_run).cast("timestamp")
    alive = F.col(deleted_col).isNull() if deleted_col else F.lit(True)
    created = (F.col(created_col) >= t) & alive
    updated = (F.col(updated_col) >= t) & (F.col(created_col) < t) & alive
    # any row with a deletion stamp in the window deletes — even if it was
    # also updated after T (delete wins; a dead row must never reindex)
    deleted = F.col(deleted_col) >= t if deleted_col else F.lit(False)
    return (
        df.withColumn(
            "_optype",
            F.when(deleted, "delete").when(created, "create").when(updated, "index"),
        )
        .filter(F.col("_optype").isNotNull())
    )
