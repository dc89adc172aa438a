"""ES function_score decay functions (gauss/exp/linear, numeric + geo)
and the distance_feature query — expression builders composing with
function_score_df on both reader tiers."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.functions.scoring import (
    decay_expr,
    decay_geo_expr,
    distance_feature_expr,
    distance_feature_geo_expr,
)
from elasticsearch_jdbc_spark.index import IndexBuilder, IndexReader

KM_PER_DEG_LAT = 2.0 * math.pi * 6371.0088 / 360.0


def _eval(spark, expr: str, rows, schema):
    return [
        r["_x"]
        for r in spark.createDataFrame(rows, schema)
        .select(F.expr(expr).alias("_x"))
        .collect()
    ]


class TestDecayExpr:
    def test_gauss_contract_points(self, spark):
        # 1.0 at origin and anywhere inside offset; `decay` at offset+scale
        e = decay_expr("gauss", "v", origin=100.0, scale=10.0, offset=5.0, decay=0.3)
        vals = _eval(spark, e, [(100.0,), (103.0,), (115.0,), (85.0,)], "v double")
        assert vals[0] == pytest.approx(1.0)
        assert vals[1] == pytest.approx(1.0)  # inside offset
        assert vals[2] == pytest.approx(0.3, rel=1e-9)  # offset+scale above
        assert vals[3] == pytest.approx(0.3, rel=1e-9)  # symmetric below

    def test_exp_and_linear_contract_points(self, spark):
        e = decay_expr("exp", "v", 0.0, scale=20.0, decay=0.5)
        assert _eval(spark, e, [(0.0,), (20.0,), (40.0,)], "v double") == pytest.approx(
            [1.0, 0.5, 0.25], rel=1e-9
        )
        lin = decay_expr("linear", "v", 0.0, scale=10.0, decay=0.5)
        got = _eval(spark, lin, [(0.0,), (10.0,), (20.0,), (25.0,)], "v double")
        assert got == pytest.approx([1.0, 0.5, 0.0, 0.0], abs=1e-12)

    def test_geo_decay_and_distance_feature(self, spark):
        # two points one degree of latitude apart: ~111.195 km
        e = decay_geo_expr("exp", "lat", "lon", 0.0, 0.0, scale_km=KM_PER_DEG_LAT, decay=0.5)
        got = _eval(spark, e, [(0.0, 0.0), (1.0, 0.0)], "lat double, lon double")
        assert got[0] == pytest.approx(1.0)
        assert got[1] == pytest.approx(0.5, rel=1e-6)
        d = distance_feature_geo_expr("lat", "lon", 0.0, 0.0, pivot_km=KM_PER_DEG_LAT, boost=3.0)
        got = _eval(spark, d, [(0.0, 0.0), (1.0, 0.0)], "lat double, lon double")
        assert got[0] == pytest.approx(3.0)
        assert got[1] == pytest.approx(1.5, rel=1e-6)

    def test_distance_feature_numeric(self, spark):
        e = distance_feature_expr("v", origin=50.0, pivot=10.0, boost=2.0)
        got = _eval(spark, e, [(50.0,), (60.0,), (40.0,), (150.0,)], "v double")
        assert got == pytest.approx([2.0, 1.0, 1.0, 2.0 * 10.0 / 110.0], rel=1e-12)

    def test_validation(self):
        with pytest.raises(ValueError):
            decay_expr("cosine", "v", 0, 1)
        with pytest.raises(ValueError):
            decay_expr("gauss", "v", 0, scale=0)
        with pytest.raises(ValueError):
            decay_expr("gauss", "v", 0, 1, decay=1.0)
        with pytest.raises(ValueError):
            decay_expr("gauss", "v", 0, 1, offset=-1)
        with pytest.raises(ValueError):
            distance_feature_expr("v", 0, pivot=0)
        with pytest.raises(ValueError):
            distance_feature_geo_expr("a", "b", 0, 0, pivot_km=-1)


SCHEMA = "repo string, path string, commit string, lang string, content string, ts double"
DOCS = [
    ("r", "0", "c", "t", "merge sort quick", 100.0),
    ("r", "1", "c", "t", "merge merge merge", 180.0),
    ("r", "2", "c", "t", "sort of a merge", 100.5),
    ("r", "3", "c", "t", "nothing relevant", 100.0),
]


def test_compose_with_function_score(spark, tmp_path):
    idx = str(tmp_path / "idx")
    IndexBuilder(spark, idx, partitions=2).build(
        spark.createDataFrame(DOCS, SCHEMA), resume=False
    )
    r = IndexReader(spark, idx)
    base = {x["doc_id"]: x["score"] for x in r.search_df("merge", k=None).collect()}
    expr = decay_expr("gauss", "ts", origin=100.0, scale=50.0, decay=0.5)
    out = {
        x["doc_id"]: x["score"]
        for x in r.function_score_df("merge", expr, k=None).collect()
    }
    ts = {
        x["doc_id"]: x["ts"]
        for x in spark.read.parquet(f"{idx}/docs").select("doc_id", "ts").collect()
    }
    sigma2 = -(50.0**2) / (2.0 * math.log(0.5))
    assert set(out) == set(base)
    for d, s in out.items():
        want = base[d] * math.exp(-((abs(ts[d] - 100.0)) ** 2) / (2 * sigma2))
        assert s == pytest.approx(want, rel=1e-9)
