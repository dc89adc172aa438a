"""Round-4 late surfaces: geo_distance rings aggregation, change_point
(least-squares binary segmentation core), bucket_correlation
(count_correlation), and the pinned query — brute parity on small
frames, edge handling, guards."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.index import IndexBuilder, IndexReader
from elasticsearch_jdbc_spark.index.aggs import (
    bucket_correlation,
    change_point,
    geo_distance_agg,
)
from elasticsearch_jdbc_spark.sources import synthetic_corpus


# ------------------------------------------------------- geo_distance


def _hav_km(lat1, lon1, lat2, lon2):
    r = 6371.0088
    p1, p2 = math.radians(lat1), math.radians(lat2)
    h = (
        math.sin((p2 - p1) / 2) ** 2
        + math.cos(p1) * math.cos(p2)
        * math.sin((math.radians(lon2) - math.radians(lon1)) / 2) ** 2
    )
    return 2 * r * math.asin(math.sqrt(h))


def test_geo_distance_rings_brute(spark):
    pts = [(float(i % 7) * 10 - 30, float(i % 11) * 20 - 100) for i in range(40)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    rings = [
        {"to": 3000.0, "key": "a"},
        {"from": 3000.0, "to": 8000.0, "key": "b"},
        {"from": 8000.0, "key": "c"},
        {"from": 0.0, "to": 20037.6, "key": "all"},  # overlaps everything
    ]
    got = {
        r["key"]: r["doc_count"]
        for r in geo_distance_agg(df, "lat", "lon", 10.0, -40.0, rings).collect()
    }
    want = {"a": 0, "b": 0, "c": 0, "all": 0}
    for lat, lon in pts:
        d = _hav_km(lat, lon, 10.0, -40.0)
        if d < 3000:
            want["a"] += 1
        if 3000 <= d < 8000:
            want["b"] += 1
        if d >= 8000:
            want["c"] += 1
        want["all"] += 1
    assert got == {k: v for k, v in want.items() if v > 0}


def test_geo_distance_nulls_and_guard(spark):
    df = spark.createDataFrame(
        [(0.0, 0.0), (None, 5.0), (5.0, None)], "lat double, lon double"
    )
    out = geo_distance_agg(
        df, "lat", "lon", 0.0, 0.0, [{"key": "any", "to": 99999.0}]
    ).collect()
    assert [(r["key"], r["doc_count"]) for r in out] == [("any", 1)]
    with pytest.raises(ValueError, match="at least one"):
        geo_distance_agg(df, "lat", "lon", 0.0, 0.0, [])


# -------------------------------------------------------- change_point


def _brute_change_point(series):
    """O(n^2) reference: argmax of SS_total - SS_left - SS_right."""
    n = len(series)
    xs = [v for _, v in series]

    def ss(a):
        m = sum(a) / len(a)
        return sum((x - m) ** 2 for x in a)

    best = None
    for k in range(1, n):
        gain = ss(xs) - ss(xs[:k]) - ss(xs[k:])
        if best is None or gain > best[1] + 1e-9:
            best = (series[k][0], gain, sum(xs[:k]) / k, sum(xs[k:]) / (n - k))
    return best


def test_change_point_planted_step(spark):
    series = [(i, 10.0 + (3.0 if i % 3 == 0 else 0.0) + (200.0 if i >= 17 else 0.0))
              for i in range(30)]
    df = spark.createDataFrame(series, "ord int, value double")
    row = change_point(df, "ord", "value").collect()[0]
    at, gain, bm, am = _brute_change_point(series)
    assert row["change_at"] == at == 17
    assert row["before_mean"] == pytest.approx(bm, abs=1e-6)
    assert row["after_mean"] == pytest.approx(am, abs=1e-6)
    assert row["gain"] == pytest.approx(gain, rel=1e-6)


def test_change_point_tie_break_and_order_invariance(spark):
    # two identical candidate splits -> smallest change_at wins; input
    # partitioning/order must not matter (window re-sorts)
    series = [(0, 1.0), (1, 1.0), (2, 5.0), (3, 5.0)]
    df = spark.createDataFrame(series[::-1], "ord int, value double").repartition(3)
    row = change_point(df, "ord", "value").collect()[0]
    assert row["change_at"] == 2
    assert row["before_mean"] == 1.0 and row["after_mean"] == 5.0


# -------------------------------------------------- bucket_correlation


def test_bucket_correlation_exact_signs(spark):
    b = spark.createDataFrame(
        [(i, float(2 * i + 3)) for i in range(10)], "ord int, cnt double"
    )
    up = [float(i) for i in range(10)]
    down = [float(-i) for i in range(10)]
    assert bucket_correlation(b, "ord", "cnt", up).collect()[0][
        "correlation"
    ] == pytest.approx(1.0)
    assert bucket_correlation(b, "ord", "cnt", down).collect()[0][
        "correlation"
    ] == pytest.approx(-1.0)
    with pytest.raises(ValueError, match="10 buckets"):
        bucket_correlation(b, "ord", "cnt", [1.0, 2.0])


def test_bucket_correlation_brute_pearson(spark):
    vals = [float((i * 13) % 7) for i in range(12)]
    ind = [float((i * i) % 5) for i in range(12)]
    b = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "ord int, cnt double"
    )
    got = bucket_correlation(b, "ord", "cnt", ind).collect()[0]["correlation"]
    mx, my = sum(vals) / 12, sum(ind) / 12
    cov = sum((x - mx) * (y - my) for x, y in zip(vals, ind))
    sx = math.sqrt(sum((x - mx) ** 2 for x in vals))
    sy = math.sqrt(sum((y - my) ** 2 for y in ind))
    assert got == pytest.approx(cov / (sx * sy), abs=1e-6)


# --------------------------------------------------------- pinned query


@pytest.fixture(scope="module")
def pinned_setup(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pinned") / "idx")
    corpus = synthetic_corpus(spark, n_files=120, seed=31)
    IndexBuilder(spark, d, partitions=4).build(corpus, resume=False)
    return IndexReader(spark, d)


def test_pinned_order_and_organic_exclusion(spark, pinned_setup):
    r = pinned_setup
    organic = {"match": {"content": "merge buffer"}}
    base = {x["doc_id"]: x["score"] for x in r.search_dsl_df(organic, k=None).collect()}
    assert base, "organic query must match something"
    some = sorted(base)[:2]
    paths = {
        x["doc_id"]: x["path"]
        for x in r.spark.read.parquet(f"{r.index_dir}/docs").collect()
    }
    # pin one organic hit + one non-hit, reversed of natural order
    non_hit = next(i for i in sorted(paths) if i not in base)
    pins = [paths[some[1]], paths[non_hit], paths[some[0]]]
    out = r.search_dsl_df(
        {"pinned": {"ids": pins, "organic": organic}}, k=None
    ).orderBy(F.desc("score"), "doc_id").collect()
    got = [x["doc_id"] for x in out]
    # pinned first, in the GIVEN order
    assert got[:3] == [some[1], non_hit, some[0]]
    scores = [x["score"] for x in out[:3]]
    assert scores == [1.0e12 - 1, 1.0e12 - 2, 1.0e12 - 3]
    # organic tail: original set minus pins, original scores intact
    tail = {x["doc_id"]: x["score"] for x in out[3:]}
    assert tail == {k: v for k, v in base.items() if k not in (some[0], some[1])}


def test_pinned_missing_id_skipped_and_guards(spark, pinned_setup):
    r = pinned_setup
    out = r.search_dsl_df(
        {"pinned": {"ids": ["no/such.txt"], "organic": {"match": {"content": "merge"}}}},
        k=None,
    ).collect()
    assert all(x["score"] < 1.0e11 for x in out)  # no sentinel rows
    with pytest.raises(ValueError, match="at least one id"):
        r.search_dsl_df({"pinned": {"ids": [], "organic": {"match": {"content": "x"}}}})
    with pytest.raises(ValueError, match="organic"):
        r.search_dsl_df({"pinned": {"ids": ["a"]}})
    with pytest.raises(ValueError, match="unknown docs column"):
        r.search_dsl_df(
            {"pinned": {"ids": ["a"], "organic": {"match": {"content": "x"}},
                        "id_field": "nope"}}
        )


# ------------------------------------------------------------ downsample


def test_downsample_shape_and_last_value(spark):
    from elasticsearch_jdbc_spark.index.aggs import downsample

    rows = [
        ("a", "2024-01-01 01:00:00", 1.0, "x"),
        ("a", "2024-01-01 23:00:00", 5.0, "y"),  # latest on day 1
        ("a", "2024-01-02 03:00:00", 2.0, "z"),
        ("b", "2024-01-01 12:00:00", None, "w"),
    ]
    df = spark.createDataFrame(
        rows, "k string, ts string, v double, label string"
    ).selectExpr("k", "CAST(ts AS TIMESTAMP) AS ts", "v", "label")
    out = {
        (r["k"], str(r["_tsbucket"])): r
        for r in downsample(
            df, "ts", "day", ["k"], ["v"], last_value=["label"]
        ).collect()
    }
    d1 = out[("a", "2024-01-01 00:00:00")]
    assert (d1["_doc_count"], d1["v_min"], d1["v_max"], d1["v_sum"],
            d1["v_value_count"], d1["label_last"]) == (2, 1.0, 5.0, 6.0, 2, "y")
    d3 = out[("b", "2024-01-01 00:00:00")]
    assert d3["v_value_count"] == 0 and d3["v_sum"] is None  # null metric
    assert d3["label_last"] == "w"
    import pytest as _pt

    with _pt.raises(ValueError, match="at least one metric"):
        downsample(df, "ts", "day", ["k"], [])


# ------------------------------------------------- ks_test / ip_prefix /
# random_sampler


def test_ks_test_brute(spark):
    from elasticsearch_jdbc_spark.index.aggs import bucket_count_ks_test

    counts = [5.0, 1.0, 9.0, 5.0]
    b = spark.createDataFrame(
        [(i, c) for i, c in enumerate(counts)], "ord int, cnt double"
    )
    row = bucket_count_ks_test(b, "ord", "cnt").collect()[0]
    tot = sum(counts)
    ds = []
    run = 0.0
    for i, c in enumerate(counts):
        run += c
        ds.append(run / tot - (i + 1) / 4.0)
    assert row["d_two_sided"] == pytest.approx(max(abs(d) for d in ds), abs=1e-6)
    assert row["d_greater"] == pytest.approx(max(max(ds), 0.0), abs=1e-6)
    assert row["d_less"] == pytest.approx(max(max(-d for d in ds), 0.0), abs=1e-6)
    # perfect match against explicit fractions -> D == 0
    frac = [c / tot for c in counts]
    row2 = bucket_count_ks_test(b, "ord", "cnt", frac).collect()[0]
    assert row2["d_two_sided"] == 0.0
    with pytest.raises(ValueError, match="4 buckets"):
        bucket_count_ks_test(b, "ord", "cnt", [0.5, 0.5])


def test_ip_prefix_brute(spark):
    from elasticsearch_jdbc_spark.index.aggs import ip_prefix

    ips = ["10.1.2.3", "10.1.9.200", "10.2.0.1", "192.168.1.1", None, "bad"]
    df = spark.createDataFrame([(x,) for x in ips], "ip string")
    got = {
        r["key"]: r["doc_count"] for r in ip_prefix(df, "ip", 16).collect()
    }
    assert got == {"10.1.0.0/16": 2, "10.2.0.0/16": 1, "192.168.0.0/16": 1}
    got24 = {r["key"]: r["doc_count"] for r in ip_prefix(df, "ip", 32).collect()}
    assert got24["10.1.2.3/32"] == 1
    with pytest.raises(ValueError, match="0..32"):
        ip_prefix(df, "ip", 33)


def test_random_sampler_deterministic_and_unbiased(spark):
    from elasticsearch_jdbc_spark.index.aggs import random_sampler

    df = spark.range(0, 4000).withColumnRenamed("id", "doc_id")
    a = random_sampler(df, 0.25, seed=1).count()
    b = random_sampler(df, 0.25, seed=1).count()
    c = random_sampler(df, 0.25, seed=2).count()
    assert a == b            # deterministic under a fixed seed
    assert a != c            # seed changes the subset
    assert 800 < a < 1200    # ~1000 expected
    # p=1 keeps everything
    assert random_sampler(df, 1.0, seed=1).count() == 4000
    with pytest.raises(ValueError, match="probability"):
        random_sampler(df, 0.0)
