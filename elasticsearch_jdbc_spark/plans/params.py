"""Bind variables / dynamic parameters (reference A2).

The reference binds positional statement parameters, including dynamic
pseudo-variables resolved from job state and metrics
(StandardSource.bind, StandardSource.java:1275-1352; README.md:208-222):

    $now                        current timestamp
    $state                      job state name
    $metrics.counter            run counter
    $lastrowcount               rows fetched by the previous statement
    $lastexception              last exception text
    $metrics.lastexecutionstart previous run's start (the incremental
                                watermark, README.md:693-697)
    $metrics.lastexecutionend   previous run's end
    $metrics.totalrows          cumulative row count
    $metrics.totalbytes         cumulative byte count
    $job                        job identifier

Spark-native: the checkpoint/manifest plays the statefile's role, and the
resolved values feed either DataFrame builders (F.lit) or Spark's
parameterized SQL (spark.sql(sql, args={...}) — constant-folded by
Catalyst, so a `ts > :watermark` predicate still pushes down to parquet).
"""

from __future__ import annotations

import re

import datetime as dt
from typing import Any

from pyspark.sql import DataFrame, SparkSession


def capture_last_row(df: DataFrame, order_col: str) -> dict[str, Any]:
    """Capture the LAST row's column values as '$row.<col>' bind keys —
    the reference stores every processed row into lastRow and the FINAL one
    survives for the next statement's binds (StandardSource.java:1100-1110,
    consumed by bind(), :1330-1336). JDBC fetch order is the implicit
    "last" there; a distributed scan has no such order, so the caller names
    an order column and "last" = max(order_col). One 1-row collect — a
    scalar, like the watermark reads."""
    from pyspark.sql import functions as F

    rows = df.orderBy(F.desc(order_col)).limit(1).collect()
    if not rows:
        return {}
    return {f"$row.{k}": v for k, v in rows[0].asDict().items()}


def resolve_params(
    params: list[Any],
    state: dict | None = None,
    now: dt.datetime | None = None,
    last_row: dict[str, Any] | None = None,
    meta: dict[str, Any] | None = None,
) -> list[Any]:
    """Resolve a positional parameter list, mapping `$`-pseudo-variables to
    values from the job-state dict (the reference merges the statefile over
    settings the same way, JDBCImporter.java:82-120). Non-`$` entries pass
    through as literals.

    `last_row` is a '$row.<col>' -> value mapping from capture_last_row
    (the previous statement's last processed row, StandardSource.java:1107);
    `meta` is a '$meta.*' -> value mapping (the DatabaseMetaData capture,
    :1190-1230). Like the reference's bind(), an unresolved $row./$meta.
    reference falls back to the literal string (:1330-1336)."""
    state = state or {}
    metrics = state.get("metrics", {})
    now = now or dt.datetime.now(dt.timezone.utc)

    def one(p: Any) -> Any:
        if not (isinstance(p, str) and p.startswith("$")):
            return p
        key = p[1:]
        if key == "now":
            return now
        if key == "state":
            return state.get("state", "IDLE")
        if key == "job":
            return state.get("job")
        if key == "lastrowcount":
            return state.get("lastrowcount", 0)
        if key == "lastexception":
            return state.get("lastexception", "")
        if key == "lastexceptiondate":
            return state.get("lastexceptiondate")
        if key.startswith("metrics."):
            return metrics.get(key[len("metrics."):])
        if key.startswith("row."):
            return (last_row or {}).get(p, p)
        if key.startswith("meta."):
            return (meta or {}).get(p, p)
        if re.fullmatch(r"\$[a-z][a-z0-9_.]*", p):
            # identifier-shaped: almost certainly a typo'd pseudo-var —
            # binding it silently would hide the mistake
            raise KeyError(f"unknown pseudo-variable {p!r}")
        # otherwise a LITERAL that merely starts with '$' (a price,
        # '$5.99') passes through — the reference's bind() fallback;
        # raising here crashed the job on any dollar-prefixed literal
        return p

    return [one(p) for p in params]


def sql_with_params(
    spark: SparkSession,
    sql: str,
    params: dict[str, Any],
    state: dict | None = None,
    last_row: dict[str, Any] | None = None,
    meta: dict[str, Any] | None = None,
) -> DataFrame:
    """Named-parameter SQL with pseudo-variable resolution: values that look
    like `$var` are resolved from `state`/`last_row`/`meta` first, then the
    whole dict goes to Spark's parameterized `spark.sql` (safe binding, no
    string splicing — the modern form of the reference's PreparedStatement
    path, StandardSource.java:713-737)."""
    resolved = dict(
        zip(
            params.keys(),
            resolve_params(list(params.values()), state, last_row=last_row, meta=meta),
        )
    )
    return spark.sql(sql, args=resolved)
