"""Pipeline aggregations (ES `derivative` / `cumulative_sum` /
`moving_avg` (moving_fn) / `bucket_script`): second-pass computations
over the buckets another aggregation produced.

In ES these are parent pipeline aggs nested under a (date_)histogram;
here they operate on ANY bucketed DataFrame — typically `facet_df(...,
interval=...)` output — as one window pass:

  derivative       value - lag(value) over the bucket order (first
                   bucket NULL, the ES shape)
  cumulative_sum   running sum, unbounded-preceding window
  moving_avg       mean of the trailing `window` buckets including the
                   current one (ES moving_fn with a trailing window)
  bucket_script    any SQL expression over the bucket row's metric
                   columns (ES params.* script — here the expression
                   names columns directly; evaluated by Catalyst, never
                   Python)

`partition_cols` scopes the walk: with a composite terms x histogram
bucketing, each terms group gets its own derivative chain (the ES
nesting structure, where the pipeline agg lives inside the parent terms
agg). Bucket counts are aggregation output — small by construction — so
the per-partition window never sees raw rows; with no partition_cols the
single WindowExec partition holds only the bucket list itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def pipeline_aggs(
    buckets: DataFrame,
    order_col: str,
    specs: dict[str, tuple],
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Append pipeline-agg columns to a bucketed DataFrame.

    specs: output column -> one of
      ("derivative", metric_col)
      ("cumulative_sum", metric_col)
      ("moving_avg", metric_col, window_buckets)
      ("bucket_script", sql_expression)
    """
    parts = [F.col(c) for c in (partition_cols or [])]
    w = Window.partitionBy(*parts).orderBy(F.col(order_col))
    out = buckets
    for name, spec in specs.items():
        kind = spec[0]
        if kind == "derivative":
            out = out.withColumn(
                name,
                F.col(spec[1]).cast("double")
                - F.lag(F.col(spec[1]).cast("double"), 1).over(w),
            )
        elif kind == "cumulative_sum":
            out = out.withColumn(
                name,
                F.sum(F.col(spec[1]).cast("double")).over(
                    w.rowsBetween(Window.unboundedPreceding, 0)
                ),
            )
        elif kind == "moving_avg":
            n = int(spec[2])
            if n < 1:
                raise ValueError(f"moving_avg window must be >= 1, got {n}")
            out = out.withColumn(
                name,
                F.avg(F.col(spec[1]).cast("double")).over(
                    w.rowsBetween(-(n - 1), 0)
                ),
            )
        elif kind == "bucket_script":
            out = out.withColumn(name, F.expr(spec[1]))
        else:
            raise ValueError(
                f"unknown pipeline agg {kind!r} (supported: derivative, "
                "cumulative_sum, moving_avg, bucket_script)"
            )
    return out
