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
