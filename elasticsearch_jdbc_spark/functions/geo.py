"""Content detectors: WKT -> GeoJSON and JSON-in-string inlining.

Reference: PlainKeyValueStreamListener.values detects WKT POINT/POLYGON
strings and embedded JSON in cells (PlainKeyValueStreamListener.java:166-196,
GeoJSONShapeSerializer.java:38-202; toggles detect_geo / detect_json,
README.md:247-249). Spark-native: JSON detection is `F.from_json` /
`F.get_json_object` (JVM); WKT parsing is a vectorized pandas UDF (regex —
shapely-free) covering every shape the reference serializes: Point,
LineString, Polygon, MultiPoint, MultiPolygon, Envelope/Rectangle.
"""

from __future__ import annotations

import json
import re

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_WKT_RE = re.compile(
    r"^\s*(POINT|LINESTRING|POLYGON|MULTIPOINT|MULTIPOLYGON|ENVELOPE)\s*\((.*)\)\s*$",
    re.IGNORECASE,
)


def _parse_coords(body: str) -> list[list[float]]:
    return [
        [float(x) for x in pair.strip().split()]
        for pair in body.split(",")
        if pair.strip()
    ]


def _split_top_level(body: str) -> list[str]:
    """Split on commas at parenthesis depth 0 (for nested WKT bodies like
    MULTIPOLYGON's '((...),(...)), ((...))')."""
    out, depth, cur = [], 0, []
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return [s.strip() for s in out if s.strip()]


def wkt_to_geojson_py(wkt: str) -> str | None:
    """One WKT literal -> GeoJSON string (None if not WKT).
    Mirrors GeoJSONShapeSerializer's coordinate layout for all six shapes
    the reference serializes (lon, lat order kept as written; Point/
    LineString/Polygon/MultiPoint: GeoJSONShapeSerializer.java:38-61;
    MultiPolygon :160-175; Rectangle -> type "Envelope" with
    [[minX, maxY], [maxX, minY]] i.e. upper-left, lower-right :70-77 —
    the ENVELOPE WKT order itself is spatial4j's (minX, maxX, maxY, minY))."""
    if not wkt:
        return None
    m = _WKT_RE.match(wkt)
    if not m:
        return None
    kind = m.group(1).upper()
    body = m.group(2)
    try:
        if kind == "POINT":
            xy = [float(x) for x in body.strip().split()]
            return json.dumps({"type": "Point", "coordinates": xy})
        if kind == "LINESTRING":
            return json.dumps({"type": "LineString", "coordinates": _parse_coords(body)})
        if kind == "MULTIPOINT":
            cleaned = body.replace("(", "").replace(")", "")
            return json.dumps({"type": "MultiPoint", "coordinates": _parse_coords(cleaned)})
        if kind == "POLYGON":
            rings = re.findall(r"\(([^()]*)\)", body)
            return json.dumps(
                {"type": "Polygon", "coordinates": [_parse_coords(r) for r in rings]}
            )
        if kind == "MULTIPOLYGON":
            polys = []
            for poly in _split_top_level(body):
                # each part is '((ring),(hole),...)': the innermost paren
                # groups are exactly the ring bodies
                rings = re.findall(r"\(([^()]*)\)", poly)
                polys.append([_parse_coords(r) for r in rings])
            return json.dumps({"type": "MultiPolygon", "coordinates": polys})
        if kind == "ENVELOPE":
            vals = [float(x) for x in body.replace(",", " ").split()]
            if len(vals) != 4:
                return None
            minx, maxx, maxy, miny = vals
            return json.dumps(
                {"type": "Envelope", "coordinates": [[minx, maxy], [maxx, miny]]}
            )
    except (ValueError, IndexError):
        return None
    return None


@F.pandas_udf(T.StringType())
def wkt_to_geojson(s: pd.Series) -> pd.Series:
    return s.map(wkt_to_geojson_py)


def detect_json(col: str | Column) -> Column:
    """Embedded-JSON detection: if a string cell parses as a JSON object or
    array, surface it (else null) — the detect_json inlining"""
    c = F.col(col) if isinstance(col, str) else col
    looks = c.rlike(r"^\s*[\[{].*[\]}]\s*$")
    # try_variant round-trips only valid JSON; invalid -> null
    parsed = F.try_parse_json(c)
    return F.when(looks & parsed.isNotNull(), F.to_json(parsed))


# =====================================================================
# Geo queries (ES geo_distance / geo_bounding_box / _geo_distance sort)
# =====================================================================
# The reference indexes WKT cells as ES geo_shape/geo_point fields
# (GeoJSONShapeSerializer.java:38-202) precisely so its consumers can run
# ES geo queries over them. The engine's analogue: lat/lon doc-metadata
# columns + predicate generators that compose with the filter-context
# plumbing (IndexReader.search_df(filter_sql=...)) — pure JVM trig, the
# predicate pushes into the docs parquet scan like any other filter. The
# SQL fragments use only ANSI math functions (radians/sin/cos/asin/sqrt)
# so the SAME string runs in Spark SQL and in the DuckDB oracle.

EARTH_RADIUS_KM = 6371.0088  # IUGG mean Earth radius


def haversine_km(lat1, lon1, lat2, lon2) -> Column:
    """Great-circle distance in km between two (lat, lon) pairs — Column
    expression (whole-stage codegen, no UDF). Args are Columns or column
    names; literals via F.lit."""
    a1, o1, a2, o2 = (
        F.radians(F.col(c) if isinstance(c, str) else c)
        for c in (lat1, lon1, lat2, lon2)
    )
    h = (
        F.sin((a2 - a1) / 2) ** 2
        + F.cos(a1) * F.cos(a2) * F.sin((o2 - o1) / 2) ** 2
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(h))


def haversine_km_sql(lat_col: str, lon_col: str, lat: float, lon: float) -> str:
    """The same great-circle distance as a SQL fragment over metadata
    columns — valid in Spark SQL AND DuckDB (oracle parity by
    construction). lat/lon are the fixed query point."""
    return (
        f"2.0 * {EARTH_RADIUS_KM} * asin(sqrt("
        f"power(sin((radians({lat_col}) - radians({lat})) / 2), 2) + "
        f"cos(radians({lat})) * cos(radians({lat_col})) * "
        f"power(sin((radians({lon_col}) - radians({lon})) / 2), 2)))"
    )


def geo_distance_sql(
    lat_col: str, lon_col: str, lat: float, lon: float, km: float
) -> str:
    """ES geo_distance query as a filter-context predicate: docs within
    `km` of the query point. Pass to any search surface's filter_sql."""
    return f"({haversine_km_sql(lat_col, lon_col, lat, lon)}) <= {float(km)}"


def geo_bbox_sql(
    lat_col: str,
    lon_col: str,
    top: float,
    left: float,
    bottom: float,
    right: float,
) -> str:
    """ES geo_bounding_box query as a filter-context predicate. Handles
    the antimeridian: left > right means the box crosses the dateline
    (ES's convention), so the longitude test becomes a disjunction."""
    if bottom > top:
        raise ValueError(f"bbox bottom {bottom} above top {top}")
    lat_ok = f"{lat_col} BETWEEN {float(bottom)} AND {float(top)}"
    if left <= right:
        lon_ok = f"{lon_col} BETWEEN {float(left)} AND {float(right)}"
    else:
        lon_ok = f"({lon_col} >= {float(left)} OR {lon_col} <= {float(right)})"
    return f"({lat_ok} AND {lon_ok})"


def point_in_rings_sql(
    lat_col: str, lon_col: str, rings: list[list[list[float]]]
) -> str:
    """Even-odd ray-casting point-in-polygon as ONE static boolean SQL
    expression over (lat_col, lon_col) — the geo_shape query's
    filter-context predicate (query-dsl-geo-shape-query.html). The
    polygon's vertices are query-time literals, so every edge folds to
    a constant-coefficient CASE term and the whole test stays inside
    whole-stage codegen: no UDF, no explode, no join (the ip_range /
    geotile precedent).

    `rings` are GeoJSON linear rings ([lon, lat] vertices, first ==
    last optional); crossing PARITY over all rings together implements
    holes (a point inside the outer ring and inside a hole crosses an
    even number of edges) and multi-polygons alike. Horizontal edges
    never cross the horizontal ray and are dropped (also avoiding the
    zero-slope division)."""
    terms: list[str] = []
    for ring in rings:
        pts = [(float(p[0]), float(p[1])) for p in ring]
        if len(pts) >= 2 and pts[0] == pts[-1]:
            pts = pts[:-1]
        if len(pts) < 3:
            raise ValueError(f"polygon ring needs >= 3 distinct points: {ring}")
        n = len(pts)
        for i in range(n):
            x1, y1 = pts[i]
            x2, y2 = pts[(i + 1) % n]
            if y1 == y2:
                continue
            slope = (x2 - x1) / (y2 - y1)
            terms.append(
                f"(CASE WHEN ({y1!r} > {lat_col}) != ({y2!r} > {lat_col}) "
                f"AND {lon_col} < {slope!r} * ({lat_col} - {y1!r}) + {x1!r} "
                "THEN 1 ELSE 0 END)"
            )
    if not terms:
        raise ValueError("polygon has no non-horizontal edges")
    return f"(({' + '.join(terms)}) % 2 = 1)"


def geo_shape_rings(shape) -> list[list[list[float]]]:
    """Normalize a geo_shape query shape — GeoJSON dict (Polygon /
    MultiPolygon / the ES `envelope`) or a WKT string — to a flat list
    of linear rings for point_in_rings_sql."""
    if isinstance(shape, str):
        gj = wkt_to_geojson_py(shape)
        if gj is None:
            raise ValueError(f"unparseable WKT shape {shape!r}")
        import json as _json

        shape = _json.loads(gj)
    if not isinstance(shape, dict) or "type" not in shape:
        raise ValueError("shape wants GeoJSON {'type', 'coordinates'} or WKT")
    kind = str(shape["type"]).lower()
    coords = shape.get("coordinates")
    if kind == "polygon":
        return list(coords)
    if kind == "multipolygon":
        return [ring for poly in coords for ring in poly]
    if kind == "envelope":
        # ES envelope: [[minLon, maxLat], [maxLon, minLat]]
        (x1, y2), (x2, y1) = coords
        return [[[x1, y1], [x2, y1], [x2, y2], [x1, y2], [x1, y1]]]
    raise ValueError(
        f"unsupported geo_shape type {shape['type']!r}; supported: "
        "Polygon, MultiPolygon, envelope (points are the indexed side)"
    )


_GEOHASH32 = np.frombuffer(b"0123456789bcdefghjkmnpqrstuvwxyz", dtype="S1")


def geohash_np(lat: "np.ndarray", lon: "np.ndarray", precision: int) -> "np.ndarray":
    """Vectorized geohash encode (the ES geohash_grid cell key): the
    classic bit-interleave — even bits halve the longitude range, odd
    bits the latitude — 5 bits per base32 character. The loop runs
    5 * precision (<= 60) iterations over WHOLE numpy arrays, so the
    per-row cost is pure C; no per-row Python anywhere."""
    if not 1 <= precision <= 12:
        raise ValueError(f"precision must be 1..12, got {precision}")
    n = len(lat)
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    lat_lo = np.full(n, -90.0)
    lat_hi = np.full(n, 90.0)
    lon_lo = np.full(n, -180.0)
    lon_hi = np.full(n, 180.0)
    nbits = 5 * precision
    bits = np.zeros((n, nbits), dtype=np.uint8)
    for i in range(nbits):
        if i % 2 == 0:  # even bit: longitude
            mid = (lon_lo + lon_hi) / 2.0
            hit = lon >= mid
            bits[:, i] = hit
            lon_lo = np.where(hit, mid, lon_lo)
            lon_hi = np.where(hit, lon_hi, mid)
        else:  # odd bit: latitude
            mid = (lat_lo + lat_hi) / 2.0
            hit = lat >= mid
            bits[:, i] = hit
            lat_lo = np.where(hit, mid, lat_lo)
            lat_hi = np.where(hit, lat_hi, mid)
    # 5 bits -> one base32 char
    groups = bits.reshape(n, precision, 5)
    idx = (
        groups[:, :, 0].astype(np.int32) * 16
        + groups[:, :, 1] * 8
        + groups[:, :, 2] * 4
        + groups[:, :, 3] * 2
        + groups[:, :, 4]
    )
    chars = _GEOHASH32[idx]  # (n, precision) of S1
    return chars.view(f"S{precision}").ravel().astype(str)


def geohash_udf(precision: int):
    """Arrow-batched geohash column: geohash_udf(7)(lat, lon)."""

    @F.pandas_udf(T.StringType())
    def gh(lat: pd.Series, lon: pd.Series) -> pd.Series:
        ok = lat.notna() & lon.notna()
        out = pd.Series([None] * len(lat), index=lat.index, dtype=object)
        if ok.any():
            out[ok] = geohash_np(
                lat[ok].to_numpy(), lon[ok].to_numpy(), precision
            )
        return out

    return gh
