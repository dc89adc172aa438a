"""Deterministic hash-based splitting and stratified sampling.

Training-data pipelines need train/val/test assignment and per-stratum
downsampling that are (a) deterministic — the same row lands in the same
split on every run, at every cluster size, under every partitioning —
and (b) shuffle-free — assignment is a pure projection, never a sample()
whose outcome depends on partition iteration order. Both operators here
key on sha256 of the row's identity columns and compare the first 12 hex
chars against fraction thresholds: hex strings of equal length order
lexicographically exactly like the underlying integers, so a threshold
string encodes floor(fraction * 16^12) and the predicate stays a plain
string comparison — one JVM expression, pushdown-friendly, and
reproducible bit-for-bit in any engine with sha256 (the DuckDB oracle
uses the identical expression).

At 10^12 rows the 48-bit prefix gives per-split binomial deviation
~sqrt(p(1-p)/n) — far below any practical tolerance — with zero
coordination between tasks (contrast df.sample, which is seeded per
partition and reshuffles membership whenever the partitioning changes).

Reference parity note: the reference has no sampling story (it ships
whole result sets to ES); these operators are part of the
training-pipeline surface this engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_WIDTH = 12  # 48 bits: plenty below sha256, cheap to compare


def _bucket_hex(key_cols: list[str], salt: str) -> Column:
    """First 12 hex chars of sha256(salt \\x1f enc(key1) \\x1f enc(key2) ...)
    — the row's deterministic position in [0, 1) encoded as a hex string.

    Each key is null-marked before hashing: enc(x) = 'v'||x for values,
    'n' for NULL. Raw concat_ws would silently DROP null positions, which
    (a) collapses every null-keyed row into one bucket — the whole null
    cohort lands in a single split — and (b) aliases distinct multi-column
    keys like ('a', NULL) and (NULL, 'a'). The oracle SQL mirrors the same
    coalesce('v'||CAST(...), 'n') encoding."""
    enc = [
        F.coalesce(F.concat(F.lit("v"), F.col(c).cast("string")), F.lit("n"))
        for c in key_cols
    ]
    return F.substring(
        F.sha2(F.concat_ws("\x1f", F.lit(salt), *enc), 256),
        1,
        _HEX_WIDTH,
    )


def _threshold(fraction: float) -> str:
    """Hex threshold string: bucket < threshold(f) selects fraction f.
    fraction=1.0 returns 'g' — lexicographically above every hex string
    of any content, so the predicate is always-true (a 13-char '1000…'
    would compare FALSE against 12-char buckets starting >= '2')."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction {fraction} outside [0, 1]")
    n = int(fraction * (16 ** _HEX_WIDTH))
    if n >= 16 ** _HEX_WIDTH:
        return "g"
    return format(n, "x").zfill(_HEX_WIDTH)


def split_column(
    key_cols: list[str],
    weights: dict[str, float],
    salt: str = "",
) -> Column:
    """A deterministic split-assignment Column: each row maps to one
    split label with probability proportional to its weight, decided
    purely by sha256(salt, keys) — same row, same split, forever, on any
    cluster. Weights must sum to ~1 (validated); label order follows the
    dict (cumulative thresholds), so pass an ordered mapping like
    {"train": .98, "val": .01, "test": .01}."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights sum to {total}, expected 1.0")
    bucket = _bucket_hex(key_cols, salt)
    expr = None
    acc = 0.0
    labels = list(weights)
    for label in labels[:-1]:
        acc += weights[label]
        cond = bucket < F.lit(_threshold(acc))
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    last = labels[-1]
    return (F.lit(last) if expr is None else expr.otherwise(last)).alias("split")


def hash_split(
    df: DataFrame,
    key_cols: list[str],
    weights: dict[str, float],
    salt: str = "",
) -> DataFrame:
    """df + a `split` column (see split_column). Pure projection — no
    shuffle, no sample(), no nondeterminism."""
    return df.withColumn("split", split_column(key_cols, weights, salt))


def stratified_sample(
    df: DataFrame,
    key_cols: list[str],
    fraction,
    strata_col: str | None = None,
    salt: str = "",
) -> DataFrame:
    """Deterministic stratified downsampling: keep a row iff its hash
    bucket falls below the (per-stratum) fraction threshold. `fraction`
    is a float (uniform) or a {stratum_value: fraction} dict keyed on
    `strata_col` (strata absent from the dict default to 0.0 — dropped).
    The filter is one JVM string comparison; at scale it pushes into the
    scan like any predicate, and membership never changes across runs or
    repartitioning (unlike df.sampleBy)."""
    bucket = _bucket_hex(key_cols, salt)
    if isinstance(fraction, dict):
        if strata_col is None:
            raise ValueError("per-stratum fractions need strata_col=")
        expr = None
        for value, frac in fraction.items():
            cond = (F.col(strata_col) == F.lit(value)) & (
                bucket < F.lit(_threshold(frac))
            )
            expr = cond if expr is None else (expr | cond)
        if expr is None:
            raise ValueError("empty fraction dict")
        return df.filter(expr)
    return df.filter(bucket < F.lit(_threshold(float(fraction))))


def temperature_resample(
    df: DataFrame,
    domain_col: str,
    key_cols: list[str],
    alpha: float = 0.7,
    salt: str = "",
) -> DataFrame:
    """Temperature-based domain rebalancing — the multinomial mixing step
    skew-heavy pretraining corpora get before training (alpha-sampling in
    multilingual LM recipes: expected kept count of domain d ∝
    count_d^alpha, so alpha=1 keeps the corpus as-is and alpha->0 pushes
    toward uniform domain shares).

    Downsample-only (never duplicates): acceptance rate_d =
    count_d^(alpha-1) / max_e count_e^(alpha-1), which is 1.0 for the
    smallest domain and < 1 for larger ones. Each row accepts
    deterministically iff its sha256 position (see _bucket_hex) falls
    below rate_d's 48-bit hex threshold — same row, same outcome, on any
    cluster, reproducible in any engine with sha256/pow (the DuckDB
    oracle runs the identical algebra).

    Scale shape: ONE map-side-combinable groupBy builds the per-domain
    counts (output = #domains rows), rates ride back as a broadcast join,
    and acceptance is one string comparison — no shuffle of the data
    itself, no sample(), no driver-side row materialization."""
    if alpha <= 0 or alpha > 1:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    counts = df.groupBy(domain_col).agg(F.count("*").alias("_cnt"))
    factor = F.pow(F.col("_cnt").cast("double"), F.lit(alpha - 1.0))
    mx = counts.agg(F.max(factor).alias("_mx"))
    scale = 16 ** _HEX_WIDTH
    rates = (
        counts.crossJoin(F.broadcast(mx))
        .withColumn("_rate", factor / F.col("_mx"))
        .withColumn(
            "_thr",
            F.when(
                F.floor(F.col("_rate") * F.lit(float(scale))) >= F.lit(scale),
                F.lit("g"),
            ).otherwise(
                F.format_string(
                    f"%0{_HEX_WIDTH}x",
                    F.floor(F.col("_rate") * F.lit(float(scale))).cast("long"),
                )
            ),
        )
        .select(domain_col, "_thr")
    )
    bucket = _bucket_hex(key_cols, salt)
    # NULL-SAFE domain join: a plain equi-join drops the entire
    # NULL-domain cohort (NULL never equals NULL), silently deleting
    # rows even at alpha=1.0
    return (
        df.join(
            F.broadcast(rates),
            df[domain_col].eqNullSafe(rates[domain_col]),
        )
        .drop(rates[domain_col])
        .filter(bucket < F.col("_thr"))
        .drop("_thr")
    )
