"""ES scoring-function expression builders: the `function_score` decay
functions (gauss / exp / linear) and the `distance_feature` query, over
numeric fields or geo points.

Each builder returns a Spark SQL expression STRING over docs-table
columns, composing with IndexReader.function_score_df /
IncrementalIndexReader.function_score_df (boost_mode multiply/sum) — the
expression evaluates in Catalyst over the match set's metadata join,
never in Python, so the scoring stays inside whole-stage codegen at any
corpus size.

Formula provenance (the ES decay contract,
org.elasticsearch.index.query.functionscore.DecayFunctionBuilder):
  dist  = max(0, |value - origin| - offset)
  gauss : exp(-dist^2 / (2 sigma^2)),  sigma^2 = -scale^2 / (2 ln decay)
  exp   : exp(ln(decay)/scale * dist)
  linear: max(0, (s - dist)/s),        s = scale / (1 - decay)
distance_feature (DistanceFeatureQueryBuilder):
  score = boost * pivot / (pivot + dist)
Date fields: pass a numeric projection (e.g. unix_timestamp(col)) and
origin/scale in the same unit.
"""

from __future__ import annotations

import math

from .geo import haversine_km_sql

_KINDS = ("gauss", "exp", "linear")


def _decay_of(kind: str, dist_sql: str, scale: float, decay: float) -> str:
    if kind not in _KINDS:
        raise ValueError(f"unknown decay kind {kind!r}; one of {_KINDS}")
    if not (0.0 < decay < 1.0):
        raise ValueError("decay must be in (0, 1)")
    if scale <= 0:
        raise ValueError("scale must be > 0")
    if kind == "gauss":
        sigma2 = -(float(scale) ** 2) / (2.0 * math.log(float(decay)))
        return f"exp(-pow({dist_sql}, 2) / {2.0 * sigma2!r})"
    if kind == "exp":
        lam = math.log(float(decay)) / float(scale)
        return f"exp({lam!r} * ({dist_sql}))"
    s = float(scale) / (1.0 - float(decay))
    return f"greatest(0.0d, ({s!r} - ({dist_sql})) / {s!r})"


def decay_expr(
    kind: str,
    field: str,
    origin: float,
    scale: float,
    offset: float = 0.0,
    decay: float = 0.5,
) -> str:
    """Numeric/date decay: 1.0 at |field - origin| <= offset, `decay` at
    offset + scale, falling per `kind`."""
    if offset < 0:
        raise ValueError("offset must be >= 0")
    dist = f"greatest(0.0d, abs(cast({field} as double) - {float(origin)!r}) - {float(offset)!r})"
    return _decay_of(kind, dist, scale, decay)


def decay_geo_expr(
    kind: str,
    lat_col: str,
    lon_col: str,
    origin_lat: float,
    origin_lon: float,
    scale_km: float,
    offset_km: float = 0.0,
    decay: float = 0.5,
) -> str:
    """Geo decay: great-circle km from the origin point, then the same
    decay curve."""
    if offset_km < 0:
        raise ValueError("offset_km must be >= 0")
    d = haversine_km_sql(lat_col, lon_col, float(origin_lat), float(origin_lon))
    dist = f"greatest(0.0d, ({d}) - {float(offset_km)!r})"
    return _decay_of(kind, dist, scale_km, decay)


def distance_feature_expr(
    field: str, origin: float, pivot: float, boost: float = 1.0
) -> str:
    """ES distance_feature over a numeric/date field: boost * pivot /
    (pivot + |field - origin|) — docs at the origin score `boost`, docs
    `pivot` away score boost/2."""
    if pivot <= 0:
        raise ValueError("pivot must be > 0")
    return (
        f"{float(boost)!r} * {float(pivot)!r} / "
        f"({float(pivot)!r} + abs(cast({field} as double) - {float(origin)!r}))"
    )


def distance_feature_geo_expr(
    lat_col: str,
    lon_col: str,
    origin_lat: float,
    origin_lon: float,
    pivot_km: float,
    boost: float = 1.0,
) -> str:
    """ES distance_feature over a geo point: boost * pivot / (pivot +
    great-circle-km)."""
    if pivot_km <= 0:
        raise ValueError("pivot_km must be > 0")
    d = haversine_km_sql(lat_col, lon_col, float(origin_lat), float(origin_lon))
    return f"{float(boost)!r} * {float(pivot_km)!r} / ({float(pivot_km)!r} + ({d}))"
