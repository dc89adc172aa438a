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

import functools
import itertools

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
      ("moving_avg" | "moving_max" | "moving_min" | "moving_sum"
         | "moving_stddev", metric_col, window_buckets)   # ES moving_fn set
      ("serial_diff", metric_col[, lag=1])
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
        elif kind in ("moving_avg", "moving_max", "moving_min", "moving_sum",
                      "moving_stddev"):
            # the ES moving_fn built-in function set (MovingFunctions.*:
            # unweightedAvg/max/min/sum/stdDev) over a trailing window —
            # each one Spark window aggregate, still a single WindowExec
            n = int(spec[2])
            if n < 1:
                raise ValueError(f"{kind} window must be >= 1, got {n}")
            fn = {
                "moving_avg": F.avg, "moving_max": F.max, "moving_min": F.min,
                "moving_sum": F.sum, "moving_stddev": F.stddev_pop,
            }[kind]
            out = out.withColumn(
                name,
                fn(F.col(spec[1]).cast("double")).over(
                    w.rowsBetween(-(n - 1), 0)
                ),
            )
        elif kind == "serial_diff":
            lag = int(spec[2]) if len(spec) > 2 else 1
            if lag < 1:
                raise ValueError(f"serial_diff lag must be >= 1, got {lag}")
            out = out.withColumn(
                name,
                F.col(spec[1]).cast("double")
                - F.lag(F.col(spec[1]).cast("double"), lag).over(w),
            )
        elif kind == "moving_percentile":
            n, pct = int(spec[2]), float(spec[3])
            if n < 1:
                raise ValueError(f"moving_percentile window must be >= 1, got {n}")
            if not (0.0 <= pct <= 100.0):
                raise ValueError("percent must be in [0, 100]")
            out = out.withColumn(
                name,
                F.expr(
                    f"percentile(cast({spec[1]} as double), {pct / 100.0})"
                ).over(w.rowsBetween(-(n - 1), 0)),
            )
        elif kind == "rate":
            # ES `rate` inside a date_histogram: the bucket metric
            # re-expressed per `unit` — factor = unit_seconds /
            # bucket_interval_seconds, computed by the caller
            out = out.withColumn(
                name, F.col(spec[1]).cast("double") * F.lit(float(spec[2]))
            )
        elif kind == "bucket_script":
            out = out.withColumn(name, F.expr(spec[1]))
        else:
            raise ValueError(
                f"unknown pipeline agg {kind!r} (supported: derivative, "
                "cumulative_sum, moving_avg/max/min/sum/stddev, serial_diff, "
                "moving_percentile, rate, bucket_script)"
            )
    return out


_NORM_METHODS = (
    "rescale_0_1", "rescale_0_100", "percent_of_sum", "mean", "z-score",
    "softmax",
)


def normalize(
    buckets: DataFrame,
    col: str,
    method: str = "percent_of_sum",
    partition_cols: list[str] | None = None,
    out: str = "normalized",
) -> DataFrame:
    """ES `normalize` pipeline aggregation: rescale a bucket metric
    within its bucket list (per partition_cols group when the pipeline
    nests inside a parent terms agg). Methods per
    NormalizePipelineAggregationBuilder:
      rescale_0_1 / rescale_0_100  (x-min)/(max-min) [*100]
      percent_of_sum               x / sum
      mean                         (x-mean)/(max-min)
      z-score                      (x-mean)/stddev_pop
      softmax                      exp(x)/sum(exp(x))
    Bucket relations are aggregation output (small by construction), so
    the whole-partition window frames never see raw rows; degenerate
    windows (max==min, stddev 0, sum 0) yield NULL like ES skips."""
    if method not in _NORM_METHODS:
        raise ValueError(f"unknown method {method!r}; one of {_NORM_METHODS}")
    parts = [F.col(c) for c in (partition_cols or [])]
    w = (
        Window.partitionBy(*parts)
        .orderBy(F.lit(1))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    x = F.col(col).cast("double")
    mn, mx = F.min(x).over(w), F.max(x).over(w)
    mean, sd = F.avg(x).over(w), F.stddev_pop(x).over(w)
    total = F.sum(x).over(w)
    if method == "rescale_0_1":
        expr = F.when(mx != mn, (x - mn) / (mx - mn))
    elif method == "rescale_0_100":
        expr = F.when(mx != mn, 100.0 * (x - mn) / (mx - mn))
    elif method == "percent_of_sum":
        expr = F.when(total != 0, x / total)
    elif method == "mean":
        expr = F.when(mx != mn, (x - mean) / (mx - mn))
    elif method == "z-score":
        expr = F.when(sd != 0, (x - mean) / sd)
    else:  # softmax
        sexp = F.sum(F.exp(x)).over(w)
        expr = F.exp(x) / sexp
    return buckets.withColumn(out, expr)


def adjacency_matrix(
    df: DataFrame, filters: dict[str, str], separator: str = "&"
) -> DataFrame:
    """ES `adjacency_matrix` aggregation: doc counts for every named
    filter and every pairwise intersection.

    Each named filter is a SQL predicate; output rows are
    (key, doc_count) where key is a filter name or "a&b" (names joined
    by `separator`, pair keys in sorted-name order — the ES response
    shape). Zero-count buckets are omitted (ES behavior).

    Scale shape: ONE pass — every filter becomes a boolean column and
    all k + k(k-1)/2 counts compute in a single partial-aggregable
    agg(); no shuffle of the data, no per-filter scan. ES caps filter
    count for the same quadratic reason; callers should keep k modest."""
    if not filters:
        raise ValueError("adjacency_matrix needs at least one named filter")
    names = sorted(filters)
    flagged = df.select(
        *[F.expr(filters[n]).cast("boolean").alias(f"_f_{i}")
          for i, n in enumerate(names)]
    )
    aggs = []
    keys = []
    for i, n in enumerate(names):
        aggs.append(
            F.sum(F.when(F.col(f"_f_{i}"), 1).otherwise(0)).alias(f"_c_{len(keys)}")
        )
        keys.append(n)
    for (i, a), (j, b) in itertools.combinations(enumerate(names), 2):
        aggs.append(
            F.sum(
                F.when(F.col(f"_f_{i}") & F.col(f"_f_{j}"), 1).otherwise(0)
            ).alias(f"_c_{len(keys)}")
        )
        keys.append(f"{a}{separator}{b}")
    row = flagged.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(k).alias("key"),
                F.col(f"_c_{i}").cast("long").alias("doc_count"),
            )
            for i, k in enumerate(keys)
        ]
    )
    return (
        row.select(F.explode(pairs).alias("b"))
        .select("b.key", "b.doc_count")
        .filter(F.col("doc_count") > 0)
        .orderBy("key")
    )


def geotile_key(lat_col: str, lon_col: str, precision: int):
    """The web-mercator "z/x/y" tile-key Column (shared by the typed
    geotile_grid surface and the request-body bucket kind)."""
    if not 0 <= precision <= 29:
        raise ValueError(f"precision must be 0..29, got {precision}")
    n = float(2 ** precision)
    lat = F.greatest(
        F.lit(-85.05112878), F.least(F.lit(85.05112878), F.col(lat_col))
    )
    rad = F.radians(lat)
    x = F.floor((F.col(lon_col) + F.lit(180.0)) / F.lit(360.0) * F.lit(n))
    y = F.floor(
        (
            F.lit(1.0)
            - F.log(F.tan(rad) + F.lit(1.0) / F.cos(rad)) / F.lit(3.141592653589793)
        )
        / F.lit(2.0)
        * F.lit(n)
    )
    # the x floor lands exactly at 2^z for lon = +180; clamp into range
    x = F.least(x, F.lit(int(n) - 1)).cast("long")
    y = F.least(F.greatest(y, F.lit(0)), F.lit(int(n) - 1)).cast("long")
    return F.concat_ws("/", F.lit(precision), x, y)


def geotile_grid(
    df: DataFrame,
    lat_col: str = "lat",
    lon_col: str = "lon",
    precision: int = 7,
) -> DataFrame:
    """ES `geotile_grid` aggregation: bucket points into web-mercator
    map tiles at `precision` (zoom 0..29), key "z/x/y" — the ES tile-key
    format. Pure closed-form math (no geohash bit interleave), so the
    whole bucketing is one whole-stage-codegen projection + one groupBy,
    and the identical formula runs in any SQL engine:

      x = floor((lon + 180) / 360 * 2^z)
      y = floor((1 - ln(tan(lat') + 1/cos(lat')) / pi) / 2 * 2^z)

    with latitude clamped to the web-mercator domain (|lat| <= 85.0511…,
    the ES/OSM convention). Returns (key, doc_count) ordered by count
    desc then key (the ES bucket order)."""
    key = geotile_key(lat_col, lon_col, precision)
    return (
        df.filter(F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull())
        .groupBy(key.alias("key"))
        .agg(F.count("*").alias("doc_count"))
        .orderBy(F.desc("doc_count"), F.asc("key"))
    )


def matrix_stats(df: DataFrame, cols: list[str]) -> DataFrame:
    """ES `matrix_stats` aggregation: per-field-pair covariance and
    Pearson correlation plus per-field count/mean/variance — one
    partial-aggregable agg() pass (Spark's covar_pop/corr/var_pop
    built-ins), no shuffle of the data. Returns one row per (field_a,
    field_b) ordered pair with a <= b; the diagonal carries the field's
    own stats (correlation 1.0)."""
    if len(cols) < 2:
        raise ValueError("matrix_stats needs at least two columns")
    names = sorted(cols)
    aggs = []
    for c in names:
        aggs += [
            F.count(F.col(c)).alias(f"n_{c}"),
            F.avg(F.col(c)).alias(f"mean_{c}"),
            F.var_pop(F.col(c)).alias(f"var_{c}"),
        ]
    for a, b in itertools.combinations(names, 2):
        aggs += [
            F.covar_pop(F.col(a), F.col(b)).alias(f"cov_{a}_{b}"),
            F.corr(F.col(a), F.col(b)).alias(f"corr_{a}_{b}"),
            # the n the covariance/correlation were computed over:
            # COMPLETE pairs, not least(n_a, n_b) — with disjoint null
            # patterns least() fabricates a sample size
            F.count(
                F.when(F.col(a).isNotNull() & F.col(b).isNotNull(), 1)
            ).alias(f"nn_{a}_{b}"),
        ]
    row = df.agg(*aggs)
    cells = []
    for a in names:
        cells.append(
            F.struct(
                F.lit(a).alias("field_a"), F.lit(a).alias("field_b"),
                F.col(f"n_{a}").cast("long").alias("count"),
                F.round(F.col(f"mean_{a}"), 6).alias("mean_a"),
                F.round(F.col(f"var_{a}"), 6).alias("variance_a"),
                F.round(F.col(f"var_{a}"), 6).alias("covariance"),
                F.lit(1.0).alias("correlation"),
            )
        )
    for a, b in itertools.combinations(names, 2):
        cells.append(
            F.struct(
                F.lit(a).alias("field_a"), F.lit(b).alias("field_b"),
                F.col(f"nn_{a}_{b}").cast("long").alias("count"),
                F.round(F.col(f"mean_{a}"), 6).alias("mean_a"),
                F.round(F.col(f"var_{a}"), 6).alias("variance_a"),
                F.round(F.col(f"cov_{a}_{b}"), 6).alias("covariance"),
                F.round(F.col(f"corr_{a}_{b}"), 6).alias("correlation"),
            )
        )
    return (
        row.select(F.explode(F.array(*cells)).alias("c"))
        .select("c.*")
        .orderBy("field_a", "field_b")
    )


def bucket_metrics(
    buckets: DataFrame, metric_col: str, partition_cols: list[str] | None = None
) -> DataFrame:
    """ES sibling pipeline aggregations (`avg_bucket` / `sum_bucket` /
    `min_bucket` / `max_bucket` / `stats_bucket`) in one pass: aggregate
    a metric ACROSS a parent aggregation's buckets, one output row per
    partition group (or one row total). Bucket lists are aggregation
    output, so this is an agg over already-tiny data."""
    m = F.col(metric_col).cast("double")
    aggs = [
        F.count(m).alias("n_buckets"),
        F.avg(m).alias("avg"),
        F.sum(m).alias("sum"),
        F.min(m).alias("min"),
        F.max(m).alias("max"),
    ]
    if partition_cols:
        return buckets.groupBy(*partition_cols).agg(*aggs).orderBy(*partition_cols)
    return buckets.agg(*aggs)


def percentile_ranks(
    df: DataFrame, col: str, values: list[float]
) -> DataFrame:
    """ES `percentile_ranks` aggregation: for each probe value, the
    percentage of observations <= value — the inverse of the percentiles
    agg. One partial-aggregable agg pass (a conditional mean per probe),
    exact (no sketch), deterministic."""
    if not values:
        raise ValueError("percentile_ranks needs at least one probe value")
    c = F.col(col).cast("double")
    aggs = [
        F.round(
            F.avg(F.when(c <= F.lit(float(v)), 1.0).otherwise(0.0)) * 100.0, 6
        ).alias(f"_r{i}")
        for i, v in enumerate(values)
    ]
    row = df.filter(c.isNotNull()).agg(*aggs)
    cells = F.array(
        *[
            F.struct(
                F.lit(float(v)).alias("value"),
                F.col(f"_r{i}").alias("rank_pct"),
            )
            for i, v in enumerate(values)
        ]
    )
    return (
        row.select(F.explode(cells).alias("c"))
        .select("c.value", "c.rank_pct")
        .orderBy("value")
    )


def weighted_avg(value_col: str, weight_col: str):
    """ES `weighted_avg` aggregation as a reusable Column expression:
    sum(value*weight)/sum(weight) over non-null pairs (the ES contract —
    a row missing either side contributes nothing). Use inside any agg."""
    v = F.col(value_col).cast("double")
    w = F.col(weight_col).cast("double")
    both = v.isNotNull() & w.isNotNull()
    num = F.sum(F.when(both, v * w).otherwise(0.0))
    den = F.sum(F.when(both, w).otherwise(0.0))
    return num / den


def bucket_sort(
    buckets: DataFrame,
    sort: list[tuple[str, str]],
    size: int | None = None,
    from_: int = 0,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """ES `bucket_sort` pipeline aggregation: re-order the parent's
    buckets by metric columns and truncate with from/size — ES's
    "top N buckets by metric" idiom (the reference feeds ES dashboards
    that lean on it for every "top sources" panel).

    sort: [(column, "asc"|"desc"), ...]. With `partition_cols` the
    from/size window applies per group (the nested-agg shape); buckets
    are aggregation output, so the row_number window only ever sees the
    bucket list, never raw rows."""
    if not sort:
        raise ValueError("bucket_sort needs at least one (col, dir) sort spec")
    cols = []
    for c, d in sort:
        if d not in ("asc", "desc"):
            raise ValueError(f"sort direction must be asc|desc, got {d!r}")
        cols.append(F.col(c).asc() if d == "asc" else F.col(c).desc())
    parts = [F.col(c) for c in (partition_cols or [])]
    w = Window.partitionBy(*parts).orderBy(*cols)
    out = buckets.withColumn("_rn", F.row_number().over(w))
    if from_:
        out = out.filter(F.col("_rn") > from_)
    if size is not None:
        out = out.filter(F.col("_rn") <= from_ + size)
    return out.drop("_rn").orderBy(*parts, *cols)


def bucket_selector(buckets: DataFrame, predicate_sql: str) -> DataFrame:
    """ES `bucket_selector` pipeline aggregation: keep only buckets whose
    metrics satisfy a predicate (ES params.* script → a SQL expression
    over the bucket row's columns, evaluated by Catalyst)."""
    return buckets.filter(F.expr(predicate_sql))


def multi_terms(
    df: DataFrame,
    cols: list[str],
    size: int = 10,
    separator: str = "|",
) -> DataFrame:
    """ES `multi_terms` aggregation: buckets on the COMBINATION of
    several fields — one groupBy on the composite key (a single shuffle
    keyed on all fields, not a nested per-field cascade), doc_count
    ordered desc with the joined key string as the deterministic
    tie-break (the ES key_as_string shape). Null in any key drops the
    row (ES missing-bucket-off default)."""
    if len(cols) < 2:
        raise ValueError("multi_terms needs at least two key fields")
    alive = df
    for c in cols:
        alive = alive.filter(F.col(c).isNotNull())
    key = F.concat_ws(separator, *[F.col(c).cast("string") for c in cols])
    return (
        alive.groupBy(*cols)
        .agg(F.count("*").alias("doc_count"))
        .withColumn("key_as_string", key)
        .orderBy(F.desc("doc_count"), F.asc("key_as_string"))
        .limit(size)
        .select(*cols, "key_as_string", "doc_count")
    )


def diversified_sampler(
    df: DataFrame,
    dedup_col: str,
    order: list[tuple[str, str]],
    max_docs_per_value: int = 1,
    shard_size: int | None = None,
) -> DataFrame:
    """ES `diversified_sampler` aggregation: cap how many rows any one
    value of `dedup_col` contributes before downstream aggs run —
    de-biasing dominated samples (ES's guard against one author/source
    swamping significant-terms). `order` ([(col, asc|desc), ...]) must
    be a deterministic total order (include a unique id as the last
    key) — ES samples by score; a caller without scores passes any
    priority.

    Scale shape: one row_number window partitioned by the dedup value —
    a single shuffle on dedup_col, no global sort; the optional
    shard_size global cut is a second small ordered limit over the
    already-capped survivors."""
    if max_docs_per_value < 1:
        raise ValueError("max_docs_per_value must be >= 1")
    if not order:
        raise ValueError("diversified_sampler needs a deterministic order spec")
    cols = [
        F.col(c).asc() if d == "asc" else F.col(c).desc() for c, d in order
    ]
    w = Window.partitionBy(F.col(dedup_col)).orderBy(*cols)
    out = (
        df.filter(F.col(dedup_col).isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_docs_per_value)
        .drop("_rn")
    )
    if shard_size is not None:
        out = out.orderBy(*cols).limit(shard_size)
    return out


def top_metrics(
    df: DataFrame,
    group_cols: list[str],
    sort: tuple[str, str],
    metric_cols: list[str],
    size: int = 1,
) -> DataFrame:
    """ES `top_metrics` aggregation: per bucket, the metric values from
    the row(s) ranked first by the sort field (e.g. "value at latest
    timestamp per user"). One row_number window partitioned on the
    bucket key — a single shuffle, no global sort; ties beyond the sort
    key break on the first metric column for determinism (ES leaves
    ties unspecified; a deterministic engine must not)."""
    if size < 1:
        raise ValueError("size must be >= 1")
    c, d = sort
    lead = F.col(c).asc() if d == "asc" else F.col(c).desc()
    tiebreak = [F.col(m).asc() for m in metric_cols]
    w = Window.partitionBy(*[F.col(g) for g in group_cols]).orderBy(lead, *tiebreak)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= size)
        .select(*group_cols, F.col("_rn").alias("rank"), F.col(c).alias("sort_value"), *metric_cols)
        .orderBy(*group_cols, "rank")
    )


def median_absolute_deviation(df: DataFrame, col: str) -> DataFrame:
    """ES `median_absolute_deviation` aggregation, EXACT (ES uses a
    TDigest approximation; at oracle scale the exact linear-interpolated
    median is the checkable contract): median(|x - median(x)|). Two agg
    passes with the scalar median broadcast between them — no shuffle of
    the data beyond the two partial-aggregable percentile passes."""
    c = F.col(col).cast("double")
    med = df.filter(c.isNotNull()).agg(
        F.expr(f"percentile({col}, 0.5)").alias("_med")
    )
    return (
        df.filter(c.isNotNull())
        .crossJoin(F.broadcast(med))
        .agg(
            F.round(F.max("_med"), 6).alias("median"),
            F.round(F.expr(f"percentile(abs({col} - _med), 0.5)"), 6).alias("mad"),
        )
    )


def boxplot(df: DataFrame, col: str) -> DataFrame:
    """ES `boxplot` aggregation: min / q1 / median (q2) / q3 / max, one
    partial-aggregable agg pass (Spark's exact linear-interpolation
    percentile; ES approximates with TDigest — exact is the small-scale
    oracle contract, and the percentile_approx twin is a one-word swap
    at cluster scale)."""
    c = F.col(col).cast("double")
    return df.filter(c.isNotNull()).agg(
        F.round(F.min(c), 6).alias("min"),
        F.round(F.expr(f"percentile({col}, 0.25)"), 6).alias("q1"),
        F.round(F.expr(f"percentile({col}, 0.5)"), 6).alias("q2"),
        F.round(F.expr(f"percentile({col}, 0.75)"), 6).alias("q3"),
        F.round(F.max(c), 6).alias("max"),
    )


def t_test(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """ES `t_test` aggregation (heteroscedastic / Welch flavor, the ES
    default): the t statistic and Welch–Satterthwaite degrees of freedom
    for value_col between two populations selected by group_col. Closed
    form over per-group (n, mean, sample variance) — ONE conditional agg
    pass, no shuffle of the data. ES reports the p-value; the CDF lookup
    is a client-side scipy one-liner on this row — the distributed part
    (the moments and the statistic) is what belongs in the engine."""
    v = F.col(value_col).cast("double")
    in_a = F.col(group_col) == F.lit(group_a)
    in_b = F.col(group_col) == F.lit(group_b)
    row = df.filter(v.isNotNull() & (in_a | in_b)).agg(
        F.count(F.when(in_a, 1)).alias("n_a"),
        F.avg(F.when(in_a, v)).alias("mean_a"),
        F.var_samp(F.when(in_a, v)).alias("var_a"),
        F.count(F.when(in_b, 1)).alias("n_b"),
        F.avg(F.when(in_b, v)).alias("mean_b"),
        F.var_samp(F.when(in_b, v)).alias("var_b"),
    )
    sa = F.col("var_a") / F.col("n_a")
    sb = F.col("var_b") / F.col("n_b")
    se = F.sqrt(sa + sb)
    dof = (
        (sa + sb) * (sa + sb)
        / (
            sa * sa / (F.col("n_a") - 1)
            + sb * sb / (F.col("n_b") - 1)
        )
    )
    return row.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round("mean_a", 6).alias("mean_a"),
        F.round("mean_b", 6).alias("mean_b"),
        F.round((F.col("mean_a") - F.col("mean_b")) / se, 6).alias("t_stat"),
        F.round(dof, 4).alias("welch_df"),
    )


_UNIT_STRIDE = {
    "year": "INTERVAL '1' YEAR",
    "month": "INTERVAL '1' MONTH",
    "week": "INTERVAL '7' DAY",
    "day": "INTERVAL '1' DAY",
    "hour": "INTERVAL '1' HOUR",
}


def zero_fill_buckets(
    buckets: DataFrame,
    interval,
    bucket_col: str = "bucket",
    count_col: str = "n_docs",
    bounds: tuple | None = None,
) -> DataFrame:
    """ES (date_)histogram `min_doc_count=0` + `extended_bounds`: emit
    EMPTY buckets between the observed (or forced) min and max so chart
    consumers see gaps as zeros — the part of the ES histogram contract
    `facet_df(interval=...)` (min_doc_count=1 shape) leaves out.

    `interval` must match the width the buckets were built with: a
    number for numeric histograms, a date unit string ('year', 'month',
    'week', 'day', 'hour') for date_histograms. `bounds=(lo, hi)` is ES
    extended_bounds — the grid covers it even where no data lands (lo/hi
    are truncated onto the grid by the caller's convention; pass bucket
    values). Count columns fill with 0; metric columns stay NULL in
    empty buckets (the ES response shape).

    Scale shape: the grid derives from ONE scalar min/max agg over the
    bucket list (aggregation output, tiny by construction) and explodes
    a sequence on the driver-free path; the fill join is grid ⋈ buckets
    on the bucket key — both sides bucket-sized, never raw rows."""
    other = [c for c in buckets.columns if c != bucket_col]
    lo, hi = F.min(F.col(bucket_col)), F.max(F.col(bucket_col))
    if bounds is not None:
        blo, bhi = bounds
        lo = F.least(lo, F.lit(blo)) if blo is not None else lo
        hi = F.greatest(hi, F.lit(bhi)) if bhi is not None else hi
    if isinstance(interval, (int, float)) and not isinstance(interval, bool):
        step = float(interval)
        if step <= 0:
            raise ValueError("numeric interval must be positive")
        span = buckets.agg(
            lo.cast("double").alias("_lo"), hi.cast("double").alias("_hi")
        )
        # the fill joins on an INTEGER grid index, never the float key:
        # the i-th grid value lo + i*step need not bit-match the bucket
        # key floor(v/step)*step, and the grid length (hi-lo)/step
        # truncates under FP noise (0.5/0.1 -> 4.999... -> 4, silently
        # dropping the last real bucket) — round() + index equi-join
        # make the fill exact
        n_col = F.round((F.col("_hi") - F.col("_lo")) / F.lit(step)).cast(
            "long"
        )
        keyed = (
            buckets.join(F.broadcast(span))
            .withColumn(
                "_i",
                F.round(
                    (F.col(bucket_col).cast("double") - F.col("_lo"))
                    / F.lit(step)
                ).cast("long"),
            )
            .drop("_lo", "_hi", bucket_col)
        )
        grid = (
            span.filter(F.col("_lo").isNotNull())
            .select(F.explode(F.sequence(F.lit(0), n_col)).alias("_i"), "_lo")
            .select(
                "_i",
                (F.col("_lo") + F.col("_i") * F.lit(step)).alias(bucket_col),
            )
        )
        out = grid.join(keyed, "_i", "left").drop("_i")
    else:
        stride = _UNIT_STRIDE.get(str(interval))
        if stride is None:
            raise ValueError(
                f"unknown date unit {interval!r} "
                f"(supported: {sorted(_UNIT_STRIDE)})"
            )
        span = buckets.agg(lo.alias("_lo"), hi.alias("_hi"))
        grid = span.filter(F.col("_lo").isNotNull()).select(
            F.explode(
                F.expr(f"sequence(_lo, _hi, {stride})")
            ).alias(bucket_col)
        )
        out = grid.join(buckets, bucket_col, "left")
    filled = out.select(
        bucket_col,
        *[
            F.coalesce(F.col(c), F.lit(0)).alias(c) if c == count_col else c
            for c in other
        ],
    )
    return filled.orderBy(bucket_col)


def auto_date_histogram(
    df: DataFrame,
    ts_col: str,
    target_buckets: int = 10,
) -> tuple[str, DataFrame]:
    """ES `auto_date_histogram`: pick the coarsest-necessary calendar
    interval so the bucket count stays <= target, then bucket. The
    interval choice reads ONE min/max row of aggregation output (a
    scalar collect — bounded, documented); the bucketing itself is the
    usual one-pass date_trunc groupBy. Returns (chosen_unit, buckets
    DataFrame ordered by bucket) — the ES response carries the interval
    it settled on the same way."""
    if target_buckets < 1:
        raise ValueError("target_buckets must be >= 1")
    row = df.agg(
        F.min(F.col(ts_col)).alias("lo"), F.max(F.col(ts_col)).alias("hi")
    ).collect()[0]
    if row.lo is None:
        unit = "year"
    else:
        span_s = (row.hi - row.lo).total_seconds()
        unit = "year"
        for u, width_s in (
            ("hour", 3600.0),
            ("day", 86400.0),
            ("week", 604800.0),
            ("month", 2629800.0),
        ):
            if span_s / width_s + 1 <= target_buckets:
                unit = u
                break
    out = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(F.date_trunc(unit, F.col(ts_col)).alias("bucket"))
        .agg(F.count("*").alias("n_docs"))
        .orderBy("bucket")
    )
    return unit, out


def approx_terms(
    df: DataFrame,
    col: str,
    size: int = 10,
    shard_size: int | None = None,
) -> DataFrame:
    """ES `terms` aggregation the way ES ACTUALLY computes it at scale:
    each shard returns only its local top `shard_size` terms, the
    coordinator merges them, and every reported count carries
    `doc_count_error_upper_bound` — the worst-case undercount from
    shards that didn't report the term (bounded by the count of the
    LAST term each non-reporting shard did return;
    reference-fed ES dashboards read this field on every terms panel).

    Spark partitions play the shards: a per-(partition, term) count
    (map-side combinable), a per-partition top-`shard_size` window cut,
    then one merge groupBy — fully declarative, and the full term
    cardinality never converges on one node, which is the whole point
    at 100 TB (an exact groupBy over a trillion-term column shuffles
    everything; this shuffles at most partitions × shard_size rows
    after the local cut). A partition that returned ALL its terms
    contributes zero error (the ES rule). shard_size defaults to
    ES's `size * 1.5 + 10`."""
    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    if shard_size is None:
        shard_size = int(size * 1.5) + 10
    if shard_size < size:
        raise ValueError("shard_size must be >= size")
    per = (
        df.filter(F.col(col).isNotNull())
        .select(F.col(col).alias("term"), F.spark_partition_id().alias("_pid"))
        .groupBy("_pid", "term")
        .agg(F.count("*").alias("_cnt"))
    )
    w = Window.partitionBy("_pid").orderBy(F.desc("_cnt"), F.asc("term"))
    ranked = per.withColumn("_rn", F.row_number().over(w))
    tops = ranked.filter(F.col("_rn") <= shard_size)
    # a shard's error floor is the count of the last term it returned —
    # unless it returned everything it had, in which case it hides nothing
    pstats = ranked.groupBy("_pid").agg(
        F.count("*").alias("_n_terms"),
        F.min(F.when(F.col("_rn") <= shard_size, F.col("_cnt"))).alias("_last"),
    ).select(
        "_pid",
        F.when(F.col("_n_terms") > shard_size, F.col("_last"))
        .otherwise(F.lit(0)).alias("_pmin"),
    )
    total = pstats.agg(F.sum("_pmin").alias("_total_min"))
    merged = (
        tops.join(pstats, "_pid")
        .groupBy("term")
        .agg(
            F.sum("_cnt").alias("doc_count"),
            F.sum("_pmin").alias("_rep_min"),
        )
    )
    return (
        merged.crossJoin(F.broadcast(total))
        .select(
            "term",
            F.col("doc_count").cast("long").alias("doc_count"),
            F.greatest(
                F.lit(0), F.col("_total_min") - F.col("_rep_min")
            ).cast("long").alias("doc_count_error_upper_bound"),
        )
        .orderBy(F.desc("doc_count"), F.asc("term"))
        .limit(size)
    )


def geohash_grid(
    df: DataFrame,
    lat_col: str = "lat",
    lon_col: str = "lon",
    precision: int = 5,
) -> DataFrame:
    """ES `geohash_grid` aggregation: bucket points into geohash cells
    at `precision` (1..12 base32 chars), the companion of geotile_grid.
    The encode is a vectorized Arrow-batched kernel (functions/geo.py
    geohash_np — whole-array bit interleave, no per-row Python); the
    bucketing is one groupBy keyed on the cell, ordered doc-count desc
    then key asc (the ES bucket order)."""
    from ..functions.geo import geohash_udf

    gh = geohash_udf(precision)
    return (
        df.filter(F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull())
        .groupBy(gh(F.col(lat_col), F.col(lon_col)).alias("key"))
        .agg(F.count("*").alias("doc_count"))
        .orderBy(F.desc("doc_count"), F.asc("key"))
    )


def rare_terms(
    df: DataFrame, col: str, max_doc_count: int = 1
) -> DataFrame:
    """ES `rare_terms` aggregation: the long-tail complement of `terms` —
    buckets whose doc_count is AT MOST max_doc_count, ordered doc_count
    asc then key asc (the ES rare-first contract; a terms agg sorted
    ascending is explicitly discouraged by ES because its per-shard
    top-N cut is unbounded-error in that direction — rare_terms is the
    supported shape, and this implementation is EXACT where ES's
    CuckooFilter pass is approximate).

    Scale shape: one map-side-combinable groupBy on the term; the
    max_doc_count filter is applied post-aggregation, so no correctness
    cut happens shard-side. Null keys are excluded (ES `missing` is a
    separate aggregation — see missing_agg)."""
    if max_doc_count < 1:
        raise ValueError("max_doc_count must be >= 1")
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("key"))
        .agg(F.count("*").alias("doc_count"))
        .filter(F.col("doc_count") <= max_doc_count)
        .orderBy(F.asc("doc_count"), F.asc("key"))
    )


def filters_agg(
    df: DataFrame,
    filters: dict[str, str],
    other_bucket: bool = False,
    other_bucket_key: str = "_other_",
) -> DataFrame:
    """ES `filters` aggregation: one named bucket per SQL predicate,
    counted in ONE partial-aggregable pass (every filter becomes a
    boolean projection — no per-filter scan, no shuffle of the data;
    adjacency_matrix without the pairwise intersections). Buckets that
    match nothing still appear with doc_count 0 (the ES keyed-response
    shape). other_bucket adds a bucket counting docs matching NO filter.
    Output ordered by key; a doc can land in several buckets."""
    if not filters:
        raise ValueError("filters_agg needs at least one named filter")
    if other_bucket_key in filters:
        raise ValueError(f"filter name {other_bucket_key!r} collides with other_bucket_key")
    names = sorted(filters)
    flagged = df.select(
        *[F.expr(filters[n]).cast("boolean").alias(f"_f_{i}")
          for i, n in enumerate(names)]
    )
    aggs = [
        F.sum(F.when(F.col(f"_f_{i}"), 1).otherwise(0)).alias(f"_c_{i}")
        for i in range(len(names))
    ]
    keys = list(names)
    if other_bucket:
        none_of = ~functools.reduce(
            lambda a, b: a | b,
            [F.coalesce(F.col(f"_f_{i}"), F.lit(False)) for i in range(len(names))],
        )
        aggs.append(F.sum(F.when(none_of, 1).otherwise(0)).alias(f"_c_{len(names)}"))
        keys.append(other_bucket_key)
    row = flagged.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(k).alias("key"),
                F.coalesce(F.col(f"_c_{i}"), F.lit(0)).cast("long").alias("doc_count"),
            )
            for i, k in enumerate(keys)
        ]
    )
    return (
        row.select(F.explode(pairs).alias("b"))
        .select("b.key", "b.doc_count")
        .orderBy("key")
    )


def missing_agg(df: DataFrame, col: str) -> DataFrame:
    """ES `missing` aggregation: how many docs lack a value for `col`
    (NULL; for array columns, NULL or empty). One partial-aggregable
    count — the bucket every mapping-migration checklist asks for."""
    c = F.col(col)
    dt = dict(df.dtypes).get(col, "")
    miss = c.isNull()
    if dt.startswith("array"):
        miss = miss | (F.size(c) == 0)
    return df.agg(
        F.sum(F.when(miss, 1).otherwise(0)).cast("long").alias("doc_count")
    )


def extended_stats(df: DataFrame, col: str, sigma: float = 2.0) -> DataFrame:
    """ES `extended_stats` aggregation: the stats superset — count / min /
    max / sum / avg plus sum_of_squares, population + sampling variance
    and std deviation, and the sigma-scaled std_deviation_bounds. ONE
    partial-aggregable pass (every moment is a sum shape), identical
    response fields to ES."""
    c = F.col(col).cast("double")
    d = df.filter(c.isNotNull())
    base = d.agg(
        F.count(c).alias("count"),
        F.round(F.min(c), 6).alias("min"),
        F.round(F.max(c), 6).alias("max"),
        F.round(F.sum(c), 6).alias("sum"),
        F.round(F.avg(c), 6).alias("avg"),
        F.round(F.sum(c * c), 6).alias("sum_of_squares"),
        F.var_pop(c).alias("_vp"),
        F.var_samp(c).alias("_vs"),
        F.stddev_pop(c).alias("_sp"),
        F.stddev_samp(c).alias("_ss"),
        F.avg(c).alias("_avg"),
    )
    return base.select(
        "count", "min", "max", "sum", "avg", "sum_of_squares",
        F.round("_vp", 6).alias("variance"),
        F.round("_vs", 6).alias("variance_sampling"),
        F.round("_sp", 6).alias("std_deviation"),
        F.round("_ss", 6).alias("std_deviation_sampling"),
        F.round(F.col("_avg") + F.lit(float(sigma)) * F.col("_sp"), 6).alias(
            "std_upper"
        ),
        F.round(F.col("_avg") - F.lit(float(sigma)) * F.col("_sp"), 6).alias(
            "std_lower"
        ),
    )


def string_stats(df: DataFrame, col: str) -> DataFrame:
    """ES `string_stats` aggregation: count / min_length / max_length /
    avg_length / Shannon entropy (base 2, over the CHARACTER distribution
    of all values — the ES show_distribution substrate).

    Scale shape: lengths are one JVM agg pass; the entropy side builds a
    per-batch character histogram in an Arrow kernel (map-side combine to
    <= alphabet-size rows per batch — the full character stream never
    shuffles), sums it in one tiny groupBy, and folds -sum(p log2 p) in a
    single-row agg. Both sides are broadcast-joined scalars."""
    import pandas as pd
    from pyspark.sql import types as T

    c = F.col(col)
    lens = df.filter(c.isNotNull()).agg(
        F.count(c).alias("count"),
        F.min(F.length(c)).alias("min_length"),
        F.max(F.length(c)).alias("max_length"),
        F.round(F.avg(F.length(c)), 6).alias("avg_length"),
    )

    def char_hist(batches):
        from collections import Counter

        for pdf in batches:
            cnt: Counter = Counter()
            for s in pdf[col]:
                if s is not None:
                    cnt.update(s)
            if cnt:
                yield pd.DataFrame(
                    {"ch": list(cnt.keys()), "n": list(cnt.values())}
                )

    hist = (
        df.select(col)
        .mapInPandas(
            char_hist,
            T.StructType(
                [
                    T.StructField("ch", T.StringType(), False),
                    T.StructField("n", T.LongType(), False),
                ]
            ),
        )
        .groupBy("ch")
        .agg(F.sum("n").alias("n"))
    )
    ent = hist.agg(
        F.round(
            (
                F.log2(F.sum("n"))
                - F.sum(F.col("n") * F.log2("n")) / F.sum("n")
            ),
            6,
        ).alias("entropy")
    )
    return lens.crossJoin(F.broadcast(ent))


def cardinality(
    df: DataFrame,
    col: str,
    precision_threshold: int = 3000,
    exact: bool = False,
) -> DataFrame:
    """ES `cardinality` aggregation. exact=False is the ES posture —
    HyperLogLog++ (Spark's approx_count_distinct IS HLL++), with
    precision_threshold mapped to the standard-error dial
    (rsd ~= 1.04/sqrt(m), floored at Spark's 0.01 minimum — more
    threshold, more registers, tighter estimate, exactly the ES memory
    trade). exact=True is the count-distinct contract small-scale oracles
    check (ES is near-exact below the threshold)."""
    c = F.col(col)
    d = df.filter(c.isNotNull())
    if exact:
        return d.agg(F.count_distinct(c).alias("value"))
    rsd = max(0.01, min(0.05, 1.04 / (float(precision_threshold) ** 0.5)))
    return d.agg(F.approx_count_distinct(c, rsd).alias("value"))


def percentiles(
    df: DataFrame,
    col: str,
    percents: tuple = (1.0, 5.0, 25.0, 50.0, 75.0, 95.0, 99.0),
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """ES `percentiles` aggregation: one (percent, value) row per
    requested percent (the keyed response shape). exact=True uses Spark's
    exact linear-interpolated percentile — the oracle contract (ES
    approximates with TDigest); exact=False swaps in percentile_approx
    for the cluster-scale single-pass sketch. Either way ONE
    partial-aggregable agg computes every percent."""
    ps = [float(p) for p in percents]
    arr = "array(" + ", ".join(str(p / 100.0) for p in ps) + ")"
    expr = (
        f"percentile({col}, {arr})" if exact
        else f"percentile_approx({col}, {arr}, {int(accuracy)})"
    )
    row = df.filter(F.col(col).isNotNull()).agg(F.expr(expr).alias("_vals"))
    pairs = F.arrays_zip(
        F.array(*[F.lit(p) for p in ps]).alias("percent"),
        F.expr("transform(_vals, v -> round(cast(v as double), 6))").alias(
            "value"
        ),
    )
    return (
        row.select(F.explode(pairs).alias("p"))
        .select(F.col("p.percent").alias("percent"), F.col("p.value").alias("value"))
        .orderBy("percent")
    )


def geo_bounds(df: DataFrame, lat_col: str, lon_col: str) -> DataFrame:
    """ES `geo_bounds` aggregation: the tightest bounding box — top_left
    (max lat, min lon) / bottom_right (min lat, max lon). One
    partial-aggregable pass; rows with either coordinate NULL are ignored
    (the ES missing-value rule)."""
    lat, lon = F.col(lat_col).cast("double"), F.col(lon_col).cast("double")
    return df.filter(lat.isNotNull() & lon.isNotNull()).agg(
        F.round(F.max(lat), 6).alias("top_left_lat"),
        F.round(F.min(lon), 6).alias("top_left_lon"),
        F.round(F.min(lat), 6).alias("bottom_right_lat"),
        F.round(F.max(lon), 6).alias("bottom_right_lon"),
    )


def geo_centroid(df: DataFrame, lat_col: str, lon_col: str) -> DataFrame:
    """ES `geo_centroid` aggregation: the arithmetic mean coordinate of
    all points plus the point count. One partial-aggregable pass."""
    lat, lon = F.col(lat_col).cast("double"), F.col(lon_col).cast("double")
    return df.filter(lat.isNotNull() & lon.isNotNull()).agg(
        F.round(F.avg(lat), 6).alias("lat"),
        F.round(F.avg(lon), 6).alias("lon"),
        F.count("*").cast("long").alias("count"),
    )


def cumulative_cardinality(
    df: DataFrame,
    bucket_col: str,
    key_col: str,
) -> DataFrame:
    """ES `cumulative_cardinality` pipeline aggregation, EXACT: per
    bucket, how many DISTINCT key_col values have appeared in any bucket
    up to and including it (the "total unique users to date" curve; ES
    accumulates HLL sketches — exact is the checkable contract at oracle
    scale, and the derivation is sketch-free).

    Plan: each key reduces to its FIRST bucket (one map-side-combinable
    min), the firsts roll up per bucket (tiny relation), and a running
    sum over the zero-filled bucket list yields the curve — the raw
    relation shuffles ONCE on the key, buckets never hold key sets.
    Returns (bucket_col, new_keys, value) ordered by bucket. Rows with
    a NULL bucket value are excluded up front (a date_histogram never
    emits them; left in, min() would drop their keys while the NULL
    bucket row never equi-joins — a leading zero bucket plus an
    undercounted curve)."""
    df = df.filter(F.col(bucket_col).isNotNull())
    firsts = df.groupBy(key_col).agg(F.min(bucket_col).alias("_fb"))
    per_b = firsts.groupBy(F.col("_fb").alias(bucket_col)).agg(
        F.count("*").alias("new_keys")
    )
    all_b = df.select(bucket_col).distinct()
    w = Window.orderBy(bucket_col).rowsBetween(Window.unboundedPreceding, 0)
    return (
        all_b.join(per_b, bucket_col, "left")
        .na.fill(0, ["new_keys"])
        .withColumn("value", F.sum("new_keys").over(w).cast("long"))
        .withColumn("new_keys", F.col("new_keys").cast("long"))
        .orderBy(bucket_col)
    )


def variable_width_histogram(
    df: DataFrame, col: str, buckets: int = 10
) -> DataFrame:
    """ES `variable_width_histogram` aggregation as a DETERMINISTIC
    two-pass variant: ES clusters values with an order-dependent
    streaming algorithm ("bucket bounds are approximate" per its docs);
    here the bucket boundaries are the exact (i/k)-quantiles — same
    adaptive-width behavior (dense regions get narrow buckets), but
    reproducible and partitioning-invariant, which is what a pipeline
    run at 100 TB must be. Response shape matches ES: per bucket
    (key = value mean, min, max, doc_count), ordered by key.

    Plan: one exact-percentile agg seeds the k-1 boundaries (scalar
    list), assignment is a codegen'd O(k) fold per row (boundaries
    inlined as a literal array), and one groupBy(bucket) computes the
    stats — two passes over the column, no driver-side data."""
    if buckets < 1:
        raise ValueError("buckets must be >= 1")
    c = F.col(col).cast("double")
    d = df.filter(c.isNotNull()).select(c.alias("_v"))
    if buckets == 1:
        bounds = []
    else:
        ps = [i / buckets for i in range(1, buckets)]
        arr = "array(" + ", ".join(str(p) for p in ps) + ")"
        row = d.agg(F.expr(f"percentile(_v, {arr})").alias("b")).collect()[0]
        if row["b"] is None:
            bounds = []
        else:
            # dedupe (heavy ties collapse adjacent quantiles)
            seen: list[float] = []
            for v in row["b"]:
                if not seen or v > seen[-1]:
                    seen.append(float(v))
            bounds = seen
    if bounds:
        blit = F.array(*[F.lit(b) for b in bounds])
        bucket = F.aggregate(
            blit,
            F.lit(0),
            lambda acc, b: acc
            + F.when(F.col("_v") > b, F.lit(1)).otherwise(F.lit(0)),
        )
    else:
        bucket = F.lit(0)
    return (
        d.withColumn("_b", bucket)
        .groupBy("_b")
        .agg(
            F.round(F.avg("_v"), 6).alias("key"),
            F.round(F.min("_v"), 6).alias("min"),
            F.round(F.max("_v"), 6).alias("max"),
            F.count("*").cast("long").alias("doc_count"),
        )
        .drop("_b")
        .orderBy("key")
    )


def geo_line(
    df: DataFrame,
    group_cols: list[str],
    lat_col: str,
    lon_col: str,
    sort_col: str,
    size: int = 10000,
) -> DataFrame:
    """ES `geo_line` aggregation: per group, the points stitched into an
    ordered track (ES emits a GeoJSON LineString; here the line comes
    back EXPLODED as (group..., seq, lon, lat) rows — trivially
    re-assemblable, joinable, and value-checkable — with `geojson(df)`
    below producing the ES shape). Points order by `sort_col` and
    truncate at `size` (the ES cap, default 10k — ES keeps the FIRST
    `size` by sort order).

    Plan: one map-side-combinable collect_list per group, sorted and
    sliced INSIDE the aggregation row (arrays bounded by `size`), then
    posexplode — one shuffle on the group key, no window over raw rows."""
    if size < 1:
        raise ValueError("size must be >= 1")
    lat, lon = F.col(lat_col).cast("double"), F.col(lon_col).cast("double")
    pts = F.slice(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(sort_col).alias("s"),
                    lon.alias("lon"),
                    lat.alias("lat"),
                )
            )
        ),
        1,
        int(size),
    )
    agg = (
        df.filter(lat.isNotNull() & lon.isNotNull() & F.col(sort_col).isNotNull())
        .groupBy(*group_cols)
        .agg(pts.alias("_pts"))
    )
    return agg.select(
        *group_cols,
        F.posexplode("_pts").alias("seq", "_p"),
    ).select(
        *group_cols,
        F.col("seq").cast("long").alias("seq"),
        F.round(F.col("_p.lon"), 6).alias("lon"),
        F.round(F.col("_p.lat"), 6).alias("lat"),
    )


def geo_line_geojson(line_df: DataFrame, group_cols: list[str]) -> DataFrame:
    """Fold geo_line's exploded rows back into the ES GeoJSON LineString
    response: (group..., geometry) with geometry = the JSON string."""
    pts = F.array_sort(
        F.collect_list(F.struct(F.col("seq"), F.col("lon"), F.col("lat")))
    )
    coords = F.transform(pts, lambda p: F.array(p["lon"], p["lat"]))
    return (
        line_df.groupBy(*group_cols)
        .agg(coords.alias("_c"))
        .select(
            *group_cols,
            F.to_json(
                F.struct(
                    F.lit("LineString").alias("type"),
                    F.col("_c").alias("coordinates"),
                )
            ).alias("geometry"),
        )
    )


def categorize_text(
    df: DataFrame,
    col: str,
    size: int = 10,
    min_doc_count: int = 1,
) -> DataFrame:
    """ES `categorize_text` aggregation (log-message categorization) as a
    DETERMINISTIC exact-pattern variant: ES clusters messages with an
    order-dependent streaming algorithm (a drain-style tree gated by
    `similarity_threshold`, "re-running can produce different categories"
    per its docs); here the category key IS the message's analyzed token
    sequence with number-bearing tokens dropped — ES's own
    category-defining-token rule (its categorization analyzer discards
    tokens containing digits: timestamps, ids, addresses vary per event
    and never define a category). Same collapse behavior on real log
    streams (messages differing only in their variable parts land in one
    bucket), but reproducible and partitioning-invariant, which is what a
    pipeline run at 100 TB must be — the variable_width_histogram
    precedent.

    Response shape follows ES: per bucket
      key                  space-joined category-defining tokens
      doc_count            messages in the category
      max_matching_length  longest raw message observed in the bucket
                           (ES's bound on what the regex should match)
      regex                '.*?tok1.+?tok2.*?' — the ES response regex,
                           derived from the key
    ordered by doc_count DESC with the key tie-break, top `size`.
    Messages with NO category-defining token (all-numeric lines, empty
    strings, NULLs) form no bucket, like ES.

    Plan: ONE whole-stage-codegen projection (split -> two array filters
    -> array_join) and ONE map-side-combinable groupBy on the category
    key — a single narrow shuffle at any corpus size; the regex derives
    from the key post-aggregation, never from row data."""
    if size < 1:
        raise ValueError("size must be >= 1")
    toks = F.filter(
        F.filter(
            F.split(F.lower(F.col(col)), r"[^a-z0-9]+"),
            lambda t: t != "",
        ),
        lambda t: ~t.rlike("[0-9]"),
    )
    return (
        df.select(
            F.array_join(toks, " ").alias("key"),
            F.length(F.col(col)).alias("_len"),
        )
        .filter(F.col("key") != "")
        .groupBy("key")
        .agg(
            F.count("*").cast("long").alias("doc_count"),
            F.max("_len").cast("long").alias("max_matching_length"),
        )
        .filter(F.col("doc_count") >= min_doc_count)
        .orderBy(F.desc("doc_count"), F.asc("key"))
        .limit(size)
        .select(
            "key",
            "doc_count",
            "max_matching_length",
            F.concat(
                F.lit(".*?"),
                F.regexp_replace("key", " ", r"\.\+\?"),
                F.lit(".*?"),
            ).alias("regex"),
        )
    )


def frequent_item_sets(
    df: DataFrame,
    items_col: str,
    min_support: float = 0.1,
    max_set_size: int = 2,
    size: int = 10,
) -> DataFrame:
    """ES `frequent_item_sets` aggregation (8.4+ market-basket analysis):
    item sets co-occurring in >= min_support of the docs. ES runs an
    approximate ECLAT whose results "may not be exact" per its docs; this
    is the DETERMINISTIC exact variant for bounded set sizes (<= 3, the
    practically-queried range — ES's own UI defaults to pairs), the
    variable_width_histogram precedent.

    Plan: per doc, the sorted DISTINCT item array generates its k-subsets
    INSIDE one codegen projection (nested sequence/transform/flatten — no
    self-joins, no per-size scans), one explode, ONE map-side-combinable
    groupBy on the subset key. Cost scales with docs x C(items_per_doc, k)
    — the realistic regime (small per-doc item arrays) at any corpus size;
    a doc repeating an item counts once per set, the ES doc_count rule.

    Output: (items '|'-joined from the sorted set, set_size, doc_count,
    support) ordered by doc_count DESC, items ASC, top `size`."""
    if not (1 <= max_set_size <= 3):
        raise ValueError("max_set_size must be 1..3 (exact-variant bound)")
    if not (0.0 < min_support <= 1.0):
        raise ValueError("min_support must be in (0, 1]")
    if size < 1:
        raise ValueError("size must be >= 1")
    items = F.array_sort(F.array_distinct(F.col(items_col)))
    n = F.size(items)
    subsets = [F.transform(items, lambda x: F.array(x))]  # k=1
    if max_set_size >= 2:
        subsets.append(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), n - 1),
                    lambda i: F.transform(
                        F.sequence(i + 1, n),
                        lambda j: F.array(
                            F.element_at(items, i), F.element_at(items, j)
                        ),
                    ),
                )
            )
        )
    if max_set_size >= 3:
        subsets.append(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), n - 2),
                    lambda i: F.flatten(
                        F.transform(
                            F.sequence(i + 1, n - 1),
                            lambda j: F.transform(
                                F.sequence(j + 1, n),
                                lambda k: F.array(
                                    F.element_at(items, i),
                                    F.element_at(items, j),
                                    F.element_at(items, k),
                                ),
                            ),
                        )
                    ),
                )
            )
        )
    # guard short arrays: sequence(1, 0)/(2, 1) would step DOWN (ANSI trap)
    per_k = []
    for k, sub in enumerate(subsets, start=1):
        per_k.append(F.when(n >= k, sub).otherwise(F.array().cast(
            "array<array<string>>"
        )))
    gen = F.concat(*per_k) if len(per_k) > 1 else per_k[0]
    total = df.count()
    if total == 0:
        return df.sparkSession.createDataFrame(
            [], "items string, set_size int, doc_count long, support double"
        )
    import math

    # round before ceil: 0.1 * 30 is 3.0000000000000004 in binary
    min_count = max(1, math.ceil(round(min_support * total, 9)))
    return (
        df.filter(n >= 1)
        .select(F.explode(gen).alias("s"))
        .groupBy(F.array_join("s", "|").alias("items"),
                 F.size("s").alias("set_size"))
        .agg(F.count("*").cast("long").alias("doc_count"))
        .filter(F.col("doc_count") >= min_count)
        .withColumn(
            "support", F.round(F.col("doc_count") / F.lit(float(total)), 6)
        )
        .orderBy(F.desc("doc_count"), F.asc("items"))
        .limit(size)
    )


def _ipv4_to_long(c):
    """Dotted-quad IPv4 -> unsigned 32-bit value as a bigint, one codegen
    fold (no UDF); NULL for malformed addresses."""
    parts = F.split(c, r"\.")
    ok = (F.size(parts) == 4) & ~F.exists(
        parts, lambda p: ~p.rlike("^[0-9]{1,3}$") | (p.cast("int") > 255)
    )
    val = F.aggregate(
        parts, F.lit(0).cast("bigint"),
        lambda acc, p: acc * 256 + p.cast("bigint"),
    )
    return F.when(ok, val)


def _cidr_bounds(mask: str) -> tuple[int, int]:
    """'10.0.0.0/8' -> [lo, hi) in unsigned-32 space (driver-side parse)."""
    import ipaddress

    net = ipaddress.ip_network(mask, strict=False)
    return int(net.network_address), int(net.broadcast_address) + 1


def ip_range(
    df: DataFrame,
    col: str,
    ranges: list[dict],
) -> DataFrame:
    """ES `ip_range` aggregation over an IPv4 string column: buckets by
    explicit bounds ({"from": ..., "to": ...} — from-inclusive,
    to-exclusive, the ES rule) and/or CIDR masks ({"mask": "10.0.0.0/8"});
    overlapping buckets each count the doc, like the numeric range agg.
    Malformed/NULL addresses land in no bucket.

    Plan: one codegen projection converts the address to its unsigned-32
    value and tags every matching bucket label (array_compact + explode),
    then ONE map-side-combinable groupBy — no UDF, no second scan."""
    if not ranges:
        raise ValueError("ip_range needs at least one range")
    v = _ipv4_to_long(F.col(col))
    labels = []
    for rg in ranges:
        if "mask" in rg:
            lo, hi = _cidr_bounds(rg["mask"])
            label = rg.get("key", rg["mask"])
        else:
            lo = (
                None if rg.get("from") is None
                else _cidr_bounds(rg["from"] + "/32")[0]
            )
            hi = (
                None if rg.get("to") is None
                else _cidr_bounds(rg["to"] + "/32")[0]
            )
            label = rg.get(
                "key",
                f"{rg.get('from', '')}-{rg.get('to', '')}",
            )
        cond = v.isNotNull()
        if lo is not None:
            cond = cond & (v >= F.lit(lo))
        if hi is not None:
            cond = cond & (v < F.lit(hi))
        labels.append(F.when(cond, F.lit(label)))
    return (
        df.select(F.explode(F.array_compact(F.array(*labels))).alias("key"))
        .groupBy("key")
        .agg(F.count("*").cast("long").alias("doc_count"))
        .orderBy("key")
    )


def geo_distance_agg(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    lat: float,
    lon: float,
    ranges: list[dict],
) -> DataFrame:
    """ES `geo_distance` aggregation (GeoDistanceAggregationBuilder):
    bucket docs into concentric distance rings around an origin point —
    {"from": km, "to": km, "key": label}, from-INCLUSIVE / to-EXCLUSIVE
    like the numeric range agg; either bound may be absent; overlapping
    rings each count the doc. NULL coordinates land in no bucket.

    Plan: ONE codegen projection computes the haversine distance (pure
    Column math, functions/geo.py — no UDF) and tags every matching ring
    label (array_compact + explode), then one map-side-combinable
    groupBy. Ring tagging is per-row arithmetic, so the plan is a single
    scan + single shuffle of (label) pairs at any corpus scale."""
    from ..functions.geo import haversine_km

    if not ranges:
        raise ValueError("geo_distance_agg needs at least one range")
    d = haversine_km(
        F.col(lat_col), F.col(lon_col), F.lit(float(lat)), F.lit(float(lon))
    )
    labels = []
    for rg in ranges:
        lo = rg.get("from")
        hi = rg.get("to")
        label = rg.get("key", f"{'' if lo is None else lo}-{'' if hi is None else hi}")
        cond = F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull()
        if lo is not None:
            cond = cond & (d >= F.lit(float(lo)))
        if hi is not None:
            cond = cond & (d < F.lit(float(hi)))
        labels.append(F.when(cond, F.lit(label)))
    return (
        df.select(F.explode(F.array_compact(F.array(*labels))).alias("key"))
        .groupBy("key")
        .agg(F.count("*").cast("long").alias("doc_count"))
        .orderBy("key")
    )


def change_point(
    buckets: DataFrame,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """ES `change_point` aggregation (8.x sibling pipeline agg): detect
    the step change in a metric series over the buckets another
    aggregation produced. ES fits several change types via ML heuristics;
    this is the DETERMINISTIC core — least-squares binary segmentation:
    choose the split maximizing the variance-reduction gain

        gain(k) = SS_total - SS_left(k) - SS_right(k)

    (the classic step-change / CUSUM-equivalent objective). Returns ONE
    row: `change_at` (the order key of the FIRST bucket of the right
    segment), the two segment means, and the gain.

    Plan: bucket counts are aggregation output — small by construction —
    so ONE window pass (running sum of x and x², the pipeline_aggs
    posture: the single WindowExec partition holds only the bucket list)
    computes every candidate split's gain in O(n), then one argmax row.
    Never touches raw rows; deterministic tie-break (gain DESC, order
    ASC)."""
    w = Window.orderBy(F.col("_ord"))
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    x = F.col(value_col).cast("double")
    c = (
        buckets.select(F.col(order_col).alias("_ord"), x.alias("_x"))
        .withColumn("_k", F.row_number().over(w))
        .withColumn("_cs", F.sum("_x").over(w))
        .withColumn("_cs2", F.sum(F.col("_x") * F.col("_x")).over(w))
        .withColumn("_n", F.count("*").over(full))
        .withColumn("_ts", F.sum("_x").over(full))
        .withColumn("_ts2", F.sum(F.col("_x") * F.col("_x")).over(full))
        .withColumn("_next", F.lead("_ord").over(w))
    )
    k = F.col("_k").cast("double")
    n = F.col("_n").cast("double")
    ss_tot = F.col("_ts2") - F.col("_ts") * F.col("_ts") / n
    ss_l = F.col("_cs2") - F.col("_cs") * F.col("_cs") / k
    ss_r = (F.col("_ts2") - F.col("_cs2")) - (
        (F.col("_ts") - F.col("_cs")) * (F.col("_ts") - F.col("_cs")) / (n - k)
    )
    scored = (
        c.filter(F.col("_k") < F.col("_n"))
        .select(
            F.col("_next").alias("change_at"),
            (F.col("_cs") / k).alias("before_mean"),
            ((F.col("_ts") - F.col("_cs")) / (n - k)).alias("after_mean"),
            (ss_tot - ss_l - ss_r).alias("gain"),
        )
        .orderBy(F.desc("gain"), F.asc("change_at"))
        .limit(1)
    )
    return scored.select(
        "change_at",
        F.round("before_mean", 6).alias("before_mean"),
        F.round("after_mean", 6).alias("after_mean"),
        F.round("gain", 6).alias("gain"),
    )


def bucket_correlation(
    buckets: DataFrame,
    order_col: str,
    count_col: str,
    indicator: list[float],
) -> DataFrame:
    """ES `bucket_correlation` pipeline aggregation (count_correlation
    function): Pearson correlation between the buckets' doc counts and a
    caller-supplied indicator vector, attached positionally by bucket
    order — the ES use case scores how well a terms/histogram bucketing
    tracks a known signal.

    Plan: the indicator is a tiny literal DataFrame broadcast-joined on
    the bucket rank (row_number over the bucket order — buckets are
    aggregation output, so the single window partition is the bucket
    list, the pipeline_aggs posture), then ONE corr() aggregate. Raises
    if the vector length doesn't match the bucket count (the ES 400)."""
    n_buckets = buckets.count()
    if n_buckets != len(indicator):
        raise ValueError(
            f"indicator has {len(indicator)} entries for {n_buckets} buckets"
        )
    spark = buckets.sparkSession
    ind = spark.createDataFrame(
        [(i + 1, float(v)) for i, v in enumerate(indicator)],
        "_rank int, _ind double",
    )
    w = Window.orderBy(F.col(order_col))
    ranked = buckets.select(
        F.col(count_col).cast("double").alias("_cnt"),
        F.row_number().over(w).alias("_rank"),
    )
    return ranked.join(F.broadcast(ind), "_rank").agg(
        F.round(F.corr("_cnt", "_ind"), 6).alias("correlation")
    )


def downsample(
    df: DataFrame,
    ts_col: str,
    interval: str,
    dims: list[str],
    metrics: list[str],
    last_value: list[str] | None = None,
) -> DataFrame:
    """ES TSDB `downsample` API (8.5+ DownsampleAction): roll a
    time-series table up to a coarser fixed interval — one output row
    per (dimensions, time bucket) carrying min/max/sum/value_count for
    every metric (the ES aggregate_metric_double shape) and, for
    `last_value` columns (ES last-value metrics / labels), the value at
    the bucket's latest timestamp (max_by: latest-wins, the TSDB rule).

    interval: a date_trunc unit ('hour', 'day', 'week', ...) — the ES
    fixed_interval calendar units.

    Plan: ONE map-side-combinable groupBy on (dims, date_trunc bucket) —
    partial aggregation runs scan-side, so the shuffle carries only
    per-bucket partials at any corpus scale; last_value folds as max_by
    in the same pass (no window, no second scan)."""
    if not metrics:
        raise ValueError("downsample needs at least one metric column")
    bucket = F.date_trunc(interval, F.col(ts_col)).alias("_tsbucket")
    aggs = [F.count("*").cast("long").alias("_doc_count")]
    for m in metrics:
        c = F.col(m).cast("double")
        aggs += [
            F.min(c).alias(f"{m}_min"),
            F.max(c).alias(f"{m}_max"),
            F.sum(c).alias(f"{m}_sum"),
            F.count(c).cast("long").alias(f"{m}_value_count"),
        ]
    for lv in last_value or []:
        aggs.append(F.max_by(F.col(lv), F.col(ts_col)).alias(f"{lv}_last"))
    return (
        df.groupBy(*[F.col(d) for d in dims], bucket)
        .agg(*aggs)
        .orderBy(*dims, "_tsbucket")
    )


def bucket_count_ks_test(
    buckets: DataFrame,
    order_col: str,
    count_col: str,
    fractions: list[float] | None = None,
) -> DataFrame:
    """ES `bucket_count_ks_test` pipeline aggregation: Kolmogorov-Smirnov
    statistic between the buckets' doc-count distribution and an expected
    one (`fractions`, positional by bucket order; uniform when omitted —
    the ES default). Returns ONE row with the two-sided D statistic
    (max |ECDF_obs - ECDF_exp|) plus the one-sided D+ / D- variants (the
    ES 'greater'/'less' alternatives). ES converts D to a p-value via ML
    heuristics; the statistic itself is the deterministic core.

    Plan: one window pass over the bucket list (the pipeline_aggs
    posture — aggregation output, single tiny partition), broadcast-
    joined to the literal fractions by bucket rank."""
    n = buckets.count()
    if n == 0:
        raise ValueError(
            "bucket_count_ks_test needs a non-empty bucket list (the "
            "parent aggregation matched nothing)"
        )
    if fractions is None:
        fractions = [1.0 / n] * n
    if len(fractions) != n:
        raise ValueError(f"fractions has {len(fractions)} entries for {n} buckets")
    tot = sum(fractions)
    if tot <= 0:
        raise ValueError("fractions must sum to a positive value")
    spark = buckets.sparkSession
    frac = spark.createDataFrame(
        [(i + 1, float(f) / tot) for i, f in enumerate(fractions)],
        "_rank int, _frac double",
    )
    w = Window.orderBy(F.col(order_col))
    ranked = buckets.select(
        F.col(count_col).cast("double").alias("_cnt"),
        F.row_number().over(w).alias("_rank"),
    ).join(F.broadcast(frac), "_rank")
    wr = Window.orderBy(F.col("_rank"))
    full = wr.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ecdf = (
        ranked.withColumn("_cobs", F.sum("_cnt").over(wr))
        .withColumn("_tobs", F.sum("_cnt").over(full))
        .withColumn("_cexp", F.sum("_frac").over(wr))
        .select(
            (F.col("_cobs") / F.col("_tobs") - F.col("_cexp")).alias("_d")
        )
    )
    # + 0.0 normalizes IEEE negative zero (GREATEST(-0.0, 0.0) may
    # return either representation; -0.0 + 0.0 = +0.0 canonically)
    return ecdf.agg(
        F.round(F.max(F.abs(F.col("_d"))) + F.lit(0.0), 6).alias("d_two_sided"),
        F.round(
            F.greatest(F.max(F.col("_d")), F.lit(0.0)) + F.lit(0.0), 6
        ).alias("d_greater"),
        F.round(
            F.greatest(F.max(-F.col("_d")), F.lit(0.0)) + F.lit(0.0), 6
        ).alias("d_less"),
    )


def ip_prefix(
    df: DataFrame,
    col: str,
    prefix_length: int,
    min_doc_count: int = 1,
) -> DataFrame:
    """ES `ip_prefix` aggregation (8.9+): bucket IPv4 addresses by their
    /prefix_length network — the subnet rollup ES uses for traffic
    summaries. Buckets are keyed by the canonical network address string
    ('10.42.0.0/16'); malformed/NULL addresses land in no bucket.

    Plan: the same single codegen projection as ip_range (parse to the
    unsigned-32 value, mask, format back) + ONE map-side-combinable
    groupBy."""
    if not 0 <= prefix_length <= 32:
        raise ValueError(f"prefix_length must be 0..32, got {prefix_length}")
    v = _ipv4_to_long(F.col(col))
    masked = (
        F.floor(v / F.lit(2 ** (32 - prefix_length)))
        * F.lit(2 ** (32 - prefix_length))
        if prefix_length < 32
        else v
    )
    key = F.concat_ws(
        ".",
        F.floor(masked / 16777216).cast("long"),
        (F.floor(masked / 65536) % 256).cast("long"),
        (F.floor(masked / 256) % 256).cast("long"),
        (masked % 256).cast("long"),
    )
    return (
        df.select(
            F.when(
                v.isNotNull(),
                F.concat(key, F.lit(f"/{prefix_length}")),
            ).alias("key")
        )
        .filter(F.col("key").isNotNull())
        .groupBy("key")
        .agg(F.count("*").cast("long").alias("doc_count"))
        .filter(F.col("doc_count") >= min_doc_count)
        .orderBy("key")
    )


def random_sampler(
    df: DataFrame,
    probability: float,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES `random_sampler` aggregation (8.2+): run sub-aggs over a
    deterministic pseudo-random subset of the docs. ES hashes doc ids
    against the probability; here the subset is md5(seed || id) — a
    cross-engine-reproducible hash (the sampling-split posture of
    operators/sampling.py), so any SQL engine derives the SAME subset.
    Compose sub-aggregations over the returned DataFrame.

    Plan: one codegen filter on the scan — no shuffle, no RNG state; at
    any scale the sample is a scan-side prune."""
    if not 0.0 < probability <= 1.0:
        raise ValueError(f"probability must be in (0, 1], got {probability}")
    # first 8 hex chars of md5 -> uniform 32-bit integer
    bucket = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.lit(str(seed)), F.col(id_col).cast("string"))), 1, 8),
        16, 10,
    ).cast("long")
    return df.filter(bucket < F.lit(int(probability * 2**32)))

