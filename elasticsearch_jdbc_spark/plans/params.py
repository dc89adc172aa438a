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

import datetime as dt
from typing import Any

from pyspark.sql import DataFrame, SparkSession


def resolve_params(
    params: list[Any],
    state: dict | None = None,
    now: dt.datetime | None = None,
) -> list[Any]:
    """Resolve a positional parameter list, mapping `$`-pseudo-variables to
    values from the job-state dict (the reference merges the statefile over
    settings the same way, JDBCImporter.java:82-120). Non-`$` entries pass
    through as literals."""
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
        if key.startswith("metrics."):
            return metrics.get(key[len("metrics."):])
        if key.startswith("row.") or key.startswith("meta."):
            # per-row back-references ($row.*, StandardSource.java:1107) are
            # column references in Spark, resolved by the caller's plan
            return p
        raise KeyError(f"unknown pseudo-variable {p!r}")

    return [one(p) for p in params]


def sql_with_params(
    spark: SparkSession,
    sql: str,
    params: dict[str, Any],
    state: dict | None = None,
) -> DataFrame:
    """Named-parameter SQL with pseudo-variable resolution: values that look
    like `$var` are resolved from `state` first, then the whole dict goes to
    Spark's parameterized `spark.sql` (safe binding, no string splicing —
    the modern form of the reference's PreparedStatement path,
    StandardSource.java:713-737)."""
    resolved = dict(zip(params.keys(), resolve_params(list(params.values()), state)))
    return spark.sql(sql, args=resolved)
