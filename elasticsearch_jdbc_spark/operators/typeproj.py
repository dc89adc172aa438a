"""Type projection: the reference's JDBC-type -> document-value lattice
(StandardSource.parseType, StandardSource.java:1366-1867), re-expressed as
Catalyst column expressions.

Spark's reader already delivers typed columns (the lattice's left side), so
what remains is the reference's *value-shaping* rules:

  * DECIMAL/NUMERIC with configured scale: setScale(scale, rounding), then
    exact-long-if-integral else double (StandardSource.java:1624-1656);
    rounding mode names from the reference's fromString
    (StandardSource.java:266-285).
  * DECIMAL without scale: render as plain string (precision-preserving,
    no scientific notation — also ValueListenerTests.java:262-280).
  * DATE/TIME/TIMESTAMP: format to ISO-8601 text in a configured zone
    (formatDate, StandardSource.java:1957-1959; tz setters :195-219).
    Spark analogue: date_format + spark.sql.session.timeZone.
  * BINARY: bytes, or string when treat_binary_as_string
    (StandardSource.java:1392-1397).
  * locale-aware float parsing (StandardSource.java:1671-1753) is
    implemented for en-US only (documented limitation — the reference's
    NumberFormat localization is a JVM-locale concern, not a data one).

All expressions are JVM-side (whole-stage codegen); nothing here touches
Python at runtime.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ROUNDING_MODES = (
    "ceiling", "down", "floor", "halfdown", "halfeven", "halfup",
    "unnecessary", "up",
)


def project_decimal(col: str | Column, scale: int, rounding: str = "halfup") -> Column:
    """setScale(scale, rounding) over a numeric column, as exact decimal
    arithmetic (never float round-trips). Mirrors
    StandardSource.java:1624-1656 + :266-285.

    halfup   — round half away from zero (Spark's `round`)
    halfeven — banker's rounding (Spark's `bround`)
    floor    — toward negative infinity
    ceiling  — toward positive infinity
    down     — toward zero
    up       — away from zero
    halfdown — half toward zero
    unnecessary — assert no rounding needed (returns null when it would)
    """
    c = (F.col(col) if isinstance(col, str) else col).cast("decimal(38,18)")
    if rounding not in ROUNDING_MODES:
        raise ValueError(f"unknown rounding mode {rounding!r}")
    scaled = c * (10 ** scale)
    # a DECIMAL unscale literal, never float: dividing the exact scaled
    # integer by a float64 literal would squeeze it through a 53-bit
    # mantissa and silently corrupt the low digits of wide decimals —
    # exactly the float round-trip this function's contract forbids
    unscale = F.lit(10 ** scale).cast("decimal(38,0)")
    if rounding == "halfup":
        return F.round(c, scale)
    if rounding == "halfeven":
        return F.bround(c, scale)
    if rounding == "floor":
        return (F.floor(scaled) / unscale).cast(f"decimal(38,{scale})")
    if rounding == "ceiling":
        return (F.ceil(scaled) / unscale).cast(f"decimal(38,{scale})")
    if rounding == "down":
        mag = F.floor(F.abs(scaled))
        return (F.signum(c).cast("decimal(2,0)") * mag / unscale).cast(
            f"decimal(38,{scale})"
        )
    if rounding == "up":
        mag = F.ceil(F.abs(scaled))
        return (F.signum(c).cast("decimal(2,0)") * mag / unscale).cast(
            f"decimal(38,{scale})"
        )
    if rounding == "halfdown":
        # round half toward zero: ceil(|x|*10^s - 0.5) / 10^s
        mag = F.ceil(F.abs(scaled) - F.lit(0.5).cast("decimal(38,18)"))
        return (F.signum(c).cast("decimal(2,0)") * mag / unscale).cast(
            f"decimal(38,{scale})"
        )
    # unnecessary: null unless already at scale (caller treats null as error)
    exact = F.round(c, scale)
    return F.when(exact == c, exact)


def decimal_exact_number(col: str | Column, scale: int, rounding: str = "halfup") -> Column:
    """The reference's post-scale dispatch: exact long when integral, else
    double (StandardSource.java:1636-1650). Returned as double (Spark
    columns are monotyped); longs survive exactly below 2^53."""
    d = project_decimal(col, scale, rounding)
    return d.cast("double")


def decimal_plain_string(col: str | Column) -> Column:
    """No configured scale -> precision-preserving plain string
    (StandardSource.java:1652-1656). Decimal's string form never uses
    scientific notation."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(38,10)").cast("string")


def iso8601(col: str | Column, zone: str | None = None) -> Column:
    """Timestamp -> ISO-8601 text, the reference's formatDate
    (StandardSource.java:1957-1959). Zone defaults to the session zone
    (spark.sql.session.timeZone); pass e.g. 'UTC' to pin it."""
    c = F.col(col) if isinstance(col, str) else col
    ts = c.cast("timestamp")
    if zone:
        # session zone -> target zone (source defaults to the session zone)
        ts = F.convert_timezone(None, F.lit(zone), ts)
    return F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSS")


def binary_projection(col: str | Column, treat_binary_as_string: bool = False) -> Column:
    """BINARY family: opaque bytes, or UTF-8 text when configured
    (StandardSource.java:1392-1397)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("string") if treat_binary_as_string else c.cast("binary")


def int_with_long_fallback(col: str | Column) -> Column:
    """TINYINT/SMALLINT/INTEGER with long fallback on overflow
    (StandardSource.java:1792-1802): Spark reads the declared width; the
    safe projection is a long cast (no silent wrap)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("long")
